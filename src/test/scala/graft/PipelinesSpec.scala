package graft

import graft.pipelines.{CovidDataTransform, CovidSimulator, WeatherForecast}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end pipeline tests over the reference's own committed CSVs:
  * the transform reproduces the dataset_full contract, the simulator's
  * coefficient table matches the committed recover_coefs.csv golden in
  * shape and state coverage, and the forecaster honors the reference's
  * output contract (pred_actual / future_pred / rsme_score).
  */
class PipelinesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val refDir = "/root/reference/scripts"

  private lazy val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        System.getProperty("java.io.tmpdir") + "/graft_warehouse")
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", 8)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("pipelines-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private lazy val datasetFull = CovidDataTransform.run(spark).cache()

  test("transform emits the dataset_full contract") {
    assert(datasetFull.columns.toSeq == Seq("date", "country_region",
      "province_state", "confirmed", "recovered", "death", "population",
      "TAVG", "date_idx", "location_name"))
    val n = datasetFull.count()
    assert(n > 0)
    // every admitted location carries the full 180-day horizon and a
    // constant non-zero population
    val bad = datasetFull.groupBy("location_name")
      .agg(max("date_idx").as("mx"),
        countDistinct("population").as("npop"),
        min("population").as("minpop"))
      .filter(col("mx") =!= 179.0 || col("npop") =!= 1 ||
        col("minpop") <= 0)
      .count()
    assert(bad == 0)
  }

  private lazy val feats =
    CovidSimulator.features(spark, CovidSimulator.loadPopDataset(spark))
      .cache()

  test("simulator features carry both date encodings, bands and lags") {
    val cols = feats.columns.toSet
    assert(Set("dateval", "date", "is_freezing", "is_cold", "is_warm",
      "is_hot", "temp_th", "gov_action", "Intercept", "holdout",
      "lag_confirmed", "d_removed", "R_0").subsetOf(cols))
    // gov_action flips at 2020-03-20 (julianday threshold)
    val flips = feats.select("gov_action").distinct().count()
    assert(flips == 2)
    // R_0 imputation leaves no zeros
    assert(feats.filter(col("R_0") <= 0).count() == 0)
  }

  // ONE REML-EM fit shared by the shape/simulate/intervention tests
  private lazy val coefsShared = CovidSimulator.coefficients(feats).cache()

  test("coefficient table matches the committed recover_coefs.csv golden shape") {
    val coefs = coefsShared
    val golden = spark.read.option("header", true).option("inferSchema", true)
      .csv(s"$refDir/data/simulation_data/recover_coefs.csv")
    // same column contract (minus the pandas index column)
    assert(coefs.columns.toSeq ==
      golden.columns.filterNot(_.startsWith("_c0")).toSeq)
    // the committed golden covers the same US states our pop_dataset
    // run fits: every state we fit appears in the golden
    val ours = coefs.select("state").as[String](spark.implicits.newStringEncoder)
      .collect().toSet
    val theirs = golden.select("state")
      .as[String](spark.implicits.newStringEncoder).collect().toSet
    assert(ours.nonEmpty)
    // near-total overlap (the reference's run dropped DC)
    assert(ours.intersect(theirs).size >= ours.size - 1,
      s"states missing from golden: ${ours.diff(theirs).take(5)}")
    // negative-beta imputation holds (reference covid_simulator.py:502)
    assert(coefs.filter(col("lag_confirmed") < 0).count() == 0)
  }

  /** VALUE-level golden parity (round-9 ask): join our per-state β
    * (lag_confirmed, PRE-imputation — the committed recover_coefs.csv is
    * written at covid_simulator.py:497 BEFORE the mean_beta imputation
    * at :501-502) against the reference's committed numbers on the 50
    * shared US states.
    *
    * Expected residual discrepancy, explained: the golden was produced
    * by the reference's GLOBAL MixedLM run — 188 groups (138 countries +
    * 50 US states) with REAL GHCN TAVG — while the committed inputs only
    * let us refit the 49-state pop_dataset slice with TAVG≡0. The
    * per-state β of a mixed model is data-dominated wherever a state has
    * many observations, so the two fits agree closely there; the gap
    * concentrates in LOW-DATA states (AK/WY/ND), whose BLUPs shrink
    * toward different pooled means (our US-only fe_lag≈0.0100 vs the
    * global fe_lag≈0.0494) under different fitted Ψ. Measured with the
    * REML-EM fit: median |Δβ| = 0.0078, p90 ≈ 0.03, max = 0.067 (AK) on
    * 48 shared states — asserted below with headroom. The FIXED effects
    * cannot match (global-vs-US pooling; fe_Intercept 29.65 global vs
    * ≈0.51 US-only) and are deliberately not asserted.
    */
  test("per-state beta matches the committed recover_coefs.csv golden values") {
    import spark.implicits._
    val mine = CovidSimulator.coefficients(feats, imputeNegative = false)
      .select(col("state"), col("lag_confirmed").as("beta_mine"))
    val golden = spark.read.option("header", true).option("inferSchema", true)
      .csv(s"$refDir/data/simulation_data/recover_coefs.csv")
      .select(col("state"), col("lag_confirmed").cast("double").as("beta_gold"))
    val diffs = mine.join(golden, "state")
      .select(col("state"), abs(col("beta_mine") - col("beta_gold")).as("d"))
      .as[(String, Double)].collect().sortBy(_._2)
    assert(diffs.length >= 45, s"only ${diffs.length} shared states")
    val median = diffs(diffs.length / 2)._2
    val worst = diffs.last
    assert(median < 0.02, s"median |beta diff| $median vs golden")
    assert(worst._2 < 0.10, s"worst state ${worst._1} |beta diff| ${worst._2}")
    assert(diffs.count(_._2 > 0.05) <= 3,
      s"too many outlier states: ${diffs.filter(_._2 > 0.05).mkString(", ")}")
  }

  /** R₀ is model-free arithmetic (covid_simulator.py:393-410) but is not
    * part of any committed reference artifact (input_data.csv lives under
    * the uncommitted output/ tree) — so the strongest available check is
    * an INDEPENDENT replay: a straight-line Scala fold over the collected
    * pop_dataset rows (49 states × ≤60 days — bounded test-side collect)
    * implementing the reference's exact loop semantics (trim to first
    * confirmed≠0, first 30 confirmed>0 rows, positive-increment sums,
    * rho=(z1+z2+z3)/(z2+z3), zero→mean-of-positives imputation), compared
    * against the distributed window/agg computation in features().
    */
  test("R_0 matches an independent straight-line replay of the reference loop") {
    import spark.implicits._
    val raw = CovidSimulator.loadPopDataset(spark)
      .select(col("province_state"), col("date"), col("confirmed"),
        col("recovered"), col("death"))
      .as[(String, Int, Double, Double, Double)].collect()
    val perState = raw.groupBy(_._1).flatMap { case (st, rows) =>
      val sorted = rows.sortBy(_._2)
      val from = sorted.indexWhere(_._3 != 0.0)
      if (from < 0) None
      else {
        val dat = sorted.drop(from)
        val rho30 = dat.filter(_._3 > 0).take(30)
        var z1 = 0.0; var z2 = 0.0; var z3 = 0.0
        for (s <- 1 until rho30.length) {
          val dc = rho30(s)._3 - rho30(s - 1)._3
          val dr = rho30(s)._4 - rho30(s - 1)._4
          val dd = rho30(s)._5 - rho30(s - 1)._5
          if (dc > 0) z1 += dc
          if (dr > 0) z2 += dr
          if (dd > 0) z3 += dd
        }
        val rho = if (z2 + z3 > 0) (z1 + z2 + z3) / (z2 + z3) else 0.0
        Some(s"United States-$st" -> rho)
      }
    }.toMap
    val pos = perState.values.filter(_ > 0)
    val mu = pos.sum / pos.size
    val expected = perState.map { case (k, v) => k -> (if (v == 0) mu else v) }
    val got = feats.select(col("state"), col("R_0"))
      .distinct().as[(String, Double)].collect().toMap
    assert(got.keySet == expected.keySet,
      s"state sets differ: ${got.keySet.diff(expected.keySet).take(3)} / " +
        s"${expected.keySet.diff(got.keySet).take(3)}")
    val bad = expected.filter { case (st, e) =>
      math.abs(got(st) - e) > 1e-9 * (1.0 + math.abs(e)) }
    assert(bad.isEmpty, s"R_0 mismatch: ${bad.take(3)}")
  }

  test("simulation output is clamped and covers every fitted state") {
    val coefs = coefsShared
    val sim = CovidSimulator.simulate(feats, coefs)
    assert(sim.filter(col("pred_removed") < 0).count() == 0)
    assert(sim.select("state").distinct().count() == coefs.count())
  }

  test("intervention comparison diverges only where gov_action was zeroed") {
    val coefs = coefsShared
    val cmp = CovidSimulator.compareIntervention(feats, coefs)
    assert(cmp.count() > 0)
    // zeroing gov_action must change some predictions...
    assert(cmp.filter(abs(col("diff_removed")) > 1e-9).count() > 0)
    // ...but step 1 (the seeded initial state) is always identical
    assert(cmp.filter(col("rn") === 1 &&
      abs(col("diff_confirmed")) > 1e-12).count() == 0)
  }

  test("forecast pipeline honors the reference output contract") {
    val src = spark.read.option("header", true).option("inferSchema", true)
      .csv(s"$refDir/output/weather_output/future_pred.csv")
      .select(concat(col("country"), lit(" : "), col("state")).as("series"),
        col("date").cast("int").as("date"),
        col("TAVG_pred").cast("double").as("value"))
    val (pa, fp, rs) = WeatherForecast.run(spark, src,
      minRows = 60, nTest = 10, horizon = 30, model = "ar1")
    val nSeries = rs.count()
    assert(nSeries == 250) // the reference forecast 250 series
    assert(pa.count() == nSeries * 10)
    assert(fp.count() == nSeries * 30)
    // future dates advance from each series' max date
    assert(fp.filter(col("date_idx") < 0 || col("date_idx") > 29).count() == 0)
    assert(fp.filter(col("pred").isNull).count() == 0)
  }

  /** The REAL model path — and the pipeline's DEFAULT mode since round
    * 11: per-series LSTM training inside flatMapGroups through the
    * `run(model = "lstm")` dispatcher, same protocol and output
    * contract as the AR(1) flag. Window shape 120/16 because the
    * committed series are 180 days (the reference-scale 365/50/500
    * convergence proof is LstmTrainingSpec's); three real series keep
    * the test bounded. Epochs are the reference's own 500
    * (weather_pred.py:308 — full batch, `batch_size=train_x.shape[0]`,
    * exactly our adamTrain shape); patience is widened 25 → 50 because
    * the scaled-down 16-unit full-batch loss curve plateaus longer
    * than the reference's 50-unit net before descending: the round-17
    * M5Epochs probe measured 6 of the 9 round-16 band misses as
    * plateau EARLY-STOPS at epoch 38–47 (best=38–47, ran≤74 of 250)
    * whose RMSE collapses 3–10× with the plateau cleared
    * (e.g. Tajikistan 0.2513 → 0.0267, US:KS 0.3249 → 0.0390) —
    * an optimization artifact, not model capacity; multi-seed spreads
    * (M5Seeds, 5 seeds/series) had already shown those misses were
    * robust to seed choice, ruling out draw luck. Parity: per-series
    * normalized test RMSE is joined against the reference's COMMITTED
    * rsme_score.csv values for the SAME series (weather_pred.py:407-409
    * writes that artifact) and asserted comparable — committed:
    * El Salvador 0.0515, Mozambique 0.0257, Luxembourg 0.0660.
    */
  test("LSTM pipeline mode: trains per-series models, RMSE parity vs committed rsme_score.csv") {
    import spark.implicits._
    val picked = Seq("El Salvador : UNK", "Mozambique : UNK",
      "Luxembourg : UNK")
    val src = spark.read.option("header", true).option("inferSchema", true)
      .csv(s"$refDir/output/weather_output/future_pred.csv")
      .select(concat(col("country"), lit(" : "), col("state")).as("series"),
        col("date").cast("int").as("date"),
        col("TAVG_pred").cast("double").as("value"))
      .filter(col("series").isin(picked: _*))
    val (pa, fp, rs) = WeatherForecast.run(spark, src,
      minRows = 60, nTest = 10, horizon = 30,
      nSteps = 120, hidden = 16, epochs = 500, patience = 50)
    assert(rs.count() == 3)
    assert(pa.count() == 30 && fp.count() == 90)
    assert(fp.filter(col("pred").isNull).count() == 0)
    assert(fp.filter(col("date_idx") < 0 || col("date_idx") > 29).count() == 0)
    // every trained series produced a finite, sane normalized RMSE
    val scores = rs.select("series", "rmse").as[(String, Double)]
      .collect().toMap
    assert(scores.values.forall(r => r >= 0 && r < 1.0 && !r.isNaN),
      s"scores $scores")
    // committed rsme_score.csv parity for the same three series
    val committed = spark.read.option("header", true)
      .option("inferSchema", true)
      .csv(s"$refDir/output/weather_output/rsme_score.csv")
      .select(concat(col("country"), lit(" : "), col("state")).as("series"),
        col("TAVG_rmse").cast("double").as("rmse_gold"))
      .filter(col("series").isin(picked: _*))
      .as[(String, Double)].collect().toMap
    assert(committed.keySet == scores.keySet)
    scores.foreach { case (k, r) =>
      info(f"$k: ours $r%.4f vs committed ${committed(k)}%.4f")
    }
    // parity band: our seeded fit on 180-day series vs the reference's
    // unseeded Keras draw on multi-year GHCN — same order of magnitude,
    // each within 2.5x of its committed score and inside the committed
    // corpus IQR ceiling (p75 = 0.0829 across all 250 series)
    scores.foreach { case (k, r) =>
      assert(r <= committed(k) * 2.5 + 1e-9,
        f"$k: RMSE $r%.4f not comparable to committed ${committed(k)}%.4f")
      assert(r <= 0.083, f"$k: RMSE $r%.4f above committed corpus p75")
    }
    // predictions stay in the de-normalized value range (tanh head ×
    // maxabs bounds |pred| by each series' abs-max)
    val mx = src.agg(max(abs(col("value")))).first().getDouble(0)
    assert(fp.filter(abs(col("pred")) > mx * 1.01).count() == 0)
  }

  /** VALUE parity against the committed future_pred.csv is impossible
    * in principle — the golden is ONE DRAW of a nondeterministic
    * process (Keras GlorotUniform inits from an unseeded global RNG,
    * multi-threaded fit order, EarlyStopping on a nondeterministic
    * val-loss trajectory, one independent model per series ×250;
    * weather_pred.py:296-311 sets no seed anywhere). Re-running the
    * REFERENCE itself yields different numbers, so no engine can
    * hash-match the artifact. What IS deterministic — and therefore
    * what this test pins — is the artifact's CONTRACT, verified here
    * directly against the committed CSV: 250 series × 180 rows,
    * date_idx 0..179 dense per series, dates advancing by exactly one
    * calendar day, predictions present everywhere. The committed
    * values themselves show why range isn't pinnable tightly: the
    * un-normalized LSTM rollouts diverge to −196 K and +418 K on some
    * series — free extrapolation, faithfully recorded. See SURVEY
    * §7.4's documented-impossible note.
    */
  test("committed future_pred.csv contract: shape, density, date monotonicity") {
    import spark.implicits._
    val golden = spark.read.option("header", true).option("inferSchema", true)
      .csv(s"$refDir/output/weather_output/future_pred.csv")
      .select(concat(col("country"), lit(" : "), col("state")).as("series"),
        col("date").cast("int").as("date"),
        col("date_idx").cast("int").as("date_idx"),
        col("TAVG_pred").cast("double").as("pred"))
    assert(golden.count() == 45000)
    assert(golden.filter(col("pred").isNull).count() == 0)
    val perSeries = golden.groupBy("series")
      .agg(count(lit(1)).as("n"), countDistinct("date_idx").as("nd"),
        min("date_idx").as("lo"), max("date_idx").as("hi"))
    assert(perSeries.count() == 250)
    assert(perSeries.filter(col("n") =!= 180 || col("nd") =!= 180 ||
      col("lo") =!= 0 || col("hi") =!= 179).count() == 0)
    // consecutive date_idx steps are consecutive calendar days
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("series").orderBy("date_idx")
    val steps = golden
      .withColumn("d", to_date(col("date").cast("string"), "yyyyMMdd"))
      .withColumn("gap", datediff(col("d"), lag("d", 1).over(w)))
      .filter(col("gap").isNotNull)
    assert(steps.filter(col("gap") =!= 1).count() == 0)
  }

  /** FULL-POPULATION LSTM parity (round-16, upgrading the round-15
    * 25-of-250 md5 sample to all 250 series — the last sampled claim
    * in the reference-parity story): every series trained with the
    * identical 120/16/250/25 protocol in one flatMapGroups pass
    * (task-parallel — wall clock is series/threads, ~10 min at
    * local[8]), RMSE joined against the committed rsme_score.csv.
    * Per-series the committed golden is ONE unseeded Keras draw (see
    * the contract test above), so the parity claims are
    * DISTRIBUTIONAL, now over the whole population:
    *   - every score is finite and sane;
    *   - our population MEDIAN beats the committed corpus p75
    *     (0.0829) — "typically as good as the reference's typical
    *     fit";
    *   - our p75 beats the committed corpus p90 (computed from the
    *     same CSV, not hardcoded) — the upper tail is comparable too;
    *   - per-series, at most 5% of the 250 miss the
    *     max(2.5× committed, corpus p75) comparability band (the
    *     round-15 sample measured 0/25 misses; a handful of tail
    *     misses over 250 is the expected cost of comparing two
    *     unseeded draws, not a protocol drift).
    */
  test("LSTM full-population parity: all 250 series vs committed rsme_score.csv") {
    import spark.implicits._
    val all = spark.read.option("header", true).option("inferSchema", true)
      .csv(s"$refDir/output/weather_output/future_pred.csv")
      .select(concat(col("country"), lit(" : "), col("state")).as("series"),
        col("date").cast("int").as("date"),
        col("TAVG_pred").cast("double").as("value"))
    val (_, fp, rs) = WeatherForecast.run(spark, all,
      minRows = 60, nTest = 10, horizon = 30,
      nSteps = 120, hidden = 16, epochs = 500, patience = 50)
    val scores = rs.select("series", "rmse").as[(String, Double)]
      .collect().toMap
    assert(scores.size == 250)
    assert(scores.values.forall(r => r >= 0 && r < 1.0 && !r.isNaN),
      s"scores $scores")
    val committed = spark.read.option("header", true)
      .option("inferSchema", true)
      .csv(s"$refDir/output/weather_output/rsme_score.csv")
      .select(concat(col("country"), lit(" : "), col("state")).as("series"),
        col("TAVG_rmse").cast("double").as("rmse_gold"))
      .as[(String, Double)].collect().toMap
    assert(committed.keySet == scores.keySet)
    def quantile(xs: Seq[Double], q: Double): Double = {
      val s = xs.sorted
      s(math.min(s.size - 1, (q * s.size).toInt))
    }
    val goldP75 = quantile(committed.values.toSeq, 0.75)
    val goldP90 = quantile(committed.values.toSeq, 0.90)
    val misses = scores.toSeq.sortBy(_._1).filter { case (k, r) =>
      r > math.max(committed(k) * 2.5, goldP75) + 1e-9
    }
    misses.foreach { case (k, r) =>
      info(f"band miss $k: ours $r%.4f vs committed ${committed(k)}%.4f")
    }
    val ourMedian = quantile(scores.values.toSeq, 0.50)
    val ourP75 = quantile(scores.values.toSeq, 0.75)
    info(f"population: ours median $ourMedian%.4f p75 $ourP75%.4f vs " +
      f"committed p75 $goldP75%.4f p90 $goldP90%.4f; " +
      f"band misses ${misses.size}/250")
    assert(ourMedian <= goldP75 + 1e-9,
      f"population median $ourMedian%.4f above committed corpus p75")
    assert(ourP75 <= goldP90 + 1e-9,
      f"population p75 $ourP75%.4f above committed corpus p90")
    assert(misses.size <= 12,
      s"${misses.size}/250 series outside the comparability band")
    // rollouts stay in each series' de-normalized range
    val mx = all.agg(max(abs(col("value")))).first().getDouble(0)
    assert(fp.filter(abs(col("pred")) > mx * 1.01).count() == 0)
  }
}
