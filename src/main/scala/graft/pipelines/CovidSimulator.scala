package graft.pipelines

import graft.ops.MixedLm
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Per-state simulation row (top-level for Encoders). */
case class SimRow(state: String, rn: Int, confirmed: Double, removed: Double,
    population: Double, z1: Double, r0: Double, beta: Double)
case class SimOut(state: String, rn: Int, pred_confirmed: Double,
    pred_removed: Double, pred_susceptible: Double)

/** The reference's causal-simulation pipeline (covid_simulator.py
  * __main__ → causal_simulation, SURVEY.md §3.3) over the
  * `dataset_full` produced by [[CovidDataTransform]]:
  *
  *  1. [[features]] — the pandasql feature engineering (temperature
  *     bands, gov_action date threshold, compound state key) rewritten
  *     to Spark SQL, then the per-state window layer: trim to first
  *     confirmed>0 (W3), lag/diff columns (W1/W2), removed =
  *     death+recovered, R₀ from the first-30 positive increments (A9)
  *     with mean imputation (A10).
  *  2. [[coefficients]] — the real mixed model (round 9, closing SURVEY
  *     §7.3 #1): d_removed ~ Intercept + gov_action + TAVG +
  *     lag_confirmed with random (Intercept, lag_confirmed) per state,
  *     fit by REML-EM ([[graft.ops.MixedLm]] — statsmodels MixedLM's
  *     default flavor), emitted in the committed `recover_coefs.csv`
  *     column shape, with the reference's negative-β mean imputation.
  *  3. [[simulate]] — the discrete SIR recurrence (W6/M4) per state
  *     driven by the per-state coefficients, with the bias adjustment
  *     (M8: pred_removed -= |mean bias|, clamp at 0).
  */
object CovidSimulator {

  /** The committed per-state US time series (pop_dataset.csv,
    * 2020-02-28..04-19 — the reference simulator's committed
    * intermediate) reshaped to the dataset_full schema. TAVG is 0
    * (the raw GHCN weather blobs are not committed), which the model
    * carries as a zero-variance covariate absorbed by the ridge.
    */
  def loadPopDataset(spark: SparkSession,
      refDir: String = "/root/reference/scripts"): DataFrame = {
    spark.read.option("header", true).option("inferSchema", true)
      .csv(s"$refDir/data/simulation_data/pop_dataset.csv")
      .select(col("date").cast("int").as("date"),
        lit("United States").as("country_region"),
        col("state").as("province_state"),
        col("positive").cast("double").as("confirmed"),
        col("recovered").cast("double").as("recovered"),
        col("death").cast("double").as("death"),
        col("population").cast("double").as("population"),
        lit(0.0).as("TAVG"),
        lit(-1.0).as("date_idx"))
      .withColumn("location_name",
        concat(col("country_region"), lit(" : "), col("province_state")))
  }

  /** Stage 1-5 of §3.3 (covid_simulator.py:335-448). */
  def features(spark: SparkSession, datasetFull: DataFrame,
      startDate: String = "2020-02-22",
      holdoutDate: String = "2020-04-20"): DataFrame = {
    datasetFull.createOrReplaceTempView("dsf")
    // NB: like SQLite, Spark resolves TAVG in the CASEs to the RAW
    // input column, not the TAVG/10 alias — reproduced deliberately.
    val sql = spark.sql(
      s"""SELECT province_state, country_region AS country, date, confirmed,
         |       recovered, death, population, TAVG/10 AS TAVG,
         |       location_name,
         |       date_format(to_date(CAST(date AS STRING), 'yyyyMMdd'),
         |                   'yyyy-MM-dd') AS dateval,
         |       country_region || '-' || province_state AS state,
         |       CASE WHEN TAVG <= 0 THEN 1 ELSE 0 END AS is_freezing,
         |       CASE WHEN TAVG > 0 AND TAVG/10 < 20 THEN 1 ELSE 0 END AS is_cold,
         |       CASE WHEN TAVG >= 20 AND TAVG/10 < 35 THEN 1 ELSE 0 END AS is_warm,
         |       CASE WHEN TAVG >= 35 THEN 1 ELSE 0 END AS is_hot,
         |       CASE WHEN TAVG >= 20 THEN 1 ELSE 0 END AS temp_th,
         |       CASE WHEN to_date(date_format(to_date(CAST(date AS STRING),
         |                 'yyyyMMdd'), 'yyyy-MM-dd')) > DATE '2020-03-20'
         |            THEN 1 ELSE 0 END AS gov_action
         |FROM dsf""".stripMargin)
      .dropDuplicates()
      .withColumn("Intercept", lit(1.0))
      .filter(col("dateval") >= startDate)
      .withColumn("holdout",
        when(col("dateval") >= holdoutDate, 1).otherwise(0))
    val w = Window.partitionBy("state").orderBy("dateval")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val trimmed = sql
      .withColumn("seen",
        sum(when(col("confirmed") > 0, 1).otherwise(0)).over(wRun))
      .filter(col("seen") > 0).drop("seen")
      .withColumn("removed", col("death") + col("recovered"))
      // lag_* columns: the reference INITIALIZES them to 0.0 and its
      // fill loop starts at t=1 (covid_simulator.py:420-430), so the
      // first trimmed row keeps lag 0 → coalesce matches exactly...
      .withColumn("lag_confirmed", coalesce(lag("confirmed", 1).over(w), lit(0.0)))
      .withColumn("lag_death", coalesce(lag("death", 1).over(w), lit(0.0)))
      .withColumn("lag_recovered", coalesce(lag("recovered", 1).over(w), lit(0.0)))
      .withColumn("lag_removed", coalesce(lag("removed", 1).over(w), lit(0.0)))
      // ...but the d_* DIFFS stay 0.0 on that first row (not value−0):
      // diff against the RAW nullable lag, then coalesce the result.
      // (Round-9 fix, found by the R_0 replay test: diffing against the
      // coalesced lag leaked confirmed/removed_first into the first row.)
      .withColumn("d_death",
        coalesce(col("death") - lag("death", 1).over(w), lit(0.0)))
      .withColumn("d_recovered",
        coalesce(col("recovered") - lag("recovered", 1).over(w), lit(0.0)))
      .withColumn("d_removed",
        coalesce(col("removed") - lag("removed", 1).over(w), lit(0.0)))
    // R0 per state: the reference takes the first 30 rows of the
    // confirmed>0 SUBSET and sums positive increments of CONSECUTIVE
    // FILTERED rows, first row excluded (rho_data[0:30], loop s>0 —
    // covid_simulator.py:393-410). The lag therefore runs over the
    // filtered frame (not `trimmed`), and null first-row increments
    // fall to the otherwise(0) branch, excluding them like s>0 does.
    val diffs = trimmed.filter(col("confirmed") > 0)
      .withColumn("rrn", row_number().over(w))
      .filter(col("rrn") <= 30)
      .withColumn("dcc", col("confirmed") - lag("confirmed", 1).over(w))
      .withColumn("drr", col("recovered") - lag("recovered", 1).over(w))
      .withColumn("ddd", col("death") - lag("death", 1).over(w))
      .groupBy("state")
      .agg(
        sum(when(col("dcc") > 0, col("dcc")).otherwise(0.0)).as("z1"),
        sum(when(col("drr") > 0, col("drr")).otherwise(0.0)).as("z2"),
        sum(when(col("ddd") > 0, col("ddd")).otherwise(0.0)).as("z3"))
      .withColumn("R_0",
        when(col("z2") + col("z3") > 0,
          (col("z1") + col("z2") + col("z3")) / (col("z2") + col("z3")))
          .otherwise(lit(0.0)))
      .select("state", "R_0")
    val mu = diffs.filter(col("R_0") > 0).agg(avg("R_0").as("mu"))
    val r0 = diffs.crossJoin(broadcast(mu))
      .withColumn("R_0", when(col("R_0") === 0, col("mu")).otherwise(col("R_0")))
      .select("state", "R_0")
    trimmed.join(broadcast(r0), Seq("state"), "left")
  }

  /** Stage 6 of §3.3 — the per-state coefficient table in the
    * recover_coefs.csv shape, fit by the REML-EM mixed model
    * ([[graft.ops.MixedLm]]): random (Intercept, lag_confirmed) per
    * state, exactly the statsmodels `MixedLM(..., exog_re=[Intercept,
    * lag_confirmed], groups=state).fit()` surface the reference calls
    * (covid_simulator.py:456-460; `.fit()` defaults to REML). Until
    * round 9 this was a fixed-λ ridge approximation; the EM fit
    * estimates the actual variance components, and PipelinesSpec now
    * value-compares the per-state β against the reference's committed
    * recover_coefs.csv golden.
    *
    * `imputeNegative=false` yields the PRE-imputation table — the shape
    * the reference commits to recover_coefs.csv (the CSV is written
    * BEFORE the mean_beta imputation at covid_simulator.py:501-502), so
    * the golden-parity spec compares against that.
    */
  def coefficients(feats: DataFrame,
      imputeNegative: Boolean = true): DataFrame = {
    val xs = Seq("Intercept", "gov_action", "TAVG", "lag_confirmed")
    val train = feats.filter(col("removed") > 0 && col("holdout") === 0)
      .select((col("state") +: col("d_removed").cast("double").as("y") +:
        xs.map(c => col(c).cast("double").as(c))): _*)
      .na.drop()
    // ONE observation-level pass → group stats; EM iterates over the
    // state-cardinality frame only (driver holds β, Ψ, σ² — p²+q²
    // scalars, never per-state data)
    val stats = MixedLm.groupStats(train, "state", "y", xs).persist()
    val fit = MixedLm.fitEm(stats, p = 4, zIdx = Seq(0, 3))
    val beta = fit.beta
    val rc = MixedLm.blups(stats, fit, p = 4, zIdx = Seq(0, 3))
      .select(col("g").as("state"), lit("Intercept").as("coef_name"),
        col("b0").as("coef_value"), col("b1").as("re_lag_confirmed"))
      .withColumn("fe_Intercept", lit(beta(0)))
      .withColumn("Intercept", col("fe_Intercept") + col("coef_value"))
      .withColumn("lag_confirmed", lit(beta(3)) + col("re_lag_confirmed"))
      .withColumn("gov_action", lit(beta(1)))
      .withColumn("TAVG", lit(beta(2)))
    // negative-beta mean imputation (covid_simulator.py:501-502)
    val out =
      if (!imputeNegative) rc
      else {
        val mb = rc.filter(col("lag_confirmed") > 0)
          .agg(avg("lag_confirmed").as("mean_beta"))
        rc.crossJoin(broadcast(mb))
          .withColumn("lag_confirmed",
            when(col("lag_confirmed") < 0, col("mean_beta"))
              .otherwise(col("lag_confirmed")))
      }
    out.select("state", "coef_name", "coef_value", "re_lag_confirmed",
      "fe_Intercept", "Intercept", "lag_confirmed", "gov_action", "TAVG")
  }

  /** Stages 10-11 of §3.3 (covid_simulator.py:599-627) — the causal
    * question: simulate twice, once as-is and once with gov_action
    * zeroed from `pivotDate` on (covid_simulator.py:557-559), then
    * self-join the runs with _after/_before suffixes and emit
    * per-(state, step) differences.
    */
  def compareIntervention(feats: DataFrame, coefs: DataFrame,
      pivotDate: String = "2020-03-25"): DataFrame = {
    val after = simulate(feats, coefs)
    val zeroed = feats.withColumn("gov_action",
      when(col("dateval") > pivotDate, 0).otherwise(col("gov_action")))
    val before = simulate(zeroed, coefs)
    val a = after.select(col("state"), col("rn"),
      col("pred_confirmed").as("pred_confirmed_after"),
      col("pred_removed").as("pred_removed_after"),
      col("pred_susceptible").as("pred_susceptible_after"))
    val b = before.select(col("state"), col("rn"),
      col("pred_confirmed").as("pred_confirmed_before"),
      col("pred_removed").as("pred_removed_before"),
      col("pred_susceptible").as("pred_susceptible_before"))
    a.join(b, Seq("state", "rn"))
      .withColumn("diff_confirmed",
        col("pred_confirmed_after") - col("pred_confirmed_before"))
      .withColumn("diff_removed",
        col("pred_removed_after") - col("pred_removed_before"))
      .withColumn("diff_susceptible",
        col("pred_susceptible_after") - col("pred_susceptible_before"))
  }

  /** Stages 7-8 of §3.3 — per-state discrete SIR on the training rows
    * with alpha = beta*R0/N (generate_dataset, covid_simulator.py:39-58)
    * and z1(t) = cI + cGov*gov_action(t) + cT*TAVG(t), then the bias
    * adjustment on pred_removed and the final clamp at zero.
    */
  def simulate(feats: DataFrame, coefs: DataFrame): DataFrame = {
    val spark = feats.sparkSession
    import spark.implicits._
    val w = Window.partitionBy("state").orderBy("dateval")
    val joined = feats.filter(col("removed") > 0 && col("holdout") === 0)
      .join(broadcast(coefs.select(col("state"), col("Intercept").as("cI"),
        col("gov_action").as("cG"), col("TAVG").as("cT"),
        col("lag_confirmed").as("beta"))), Seq("state"))
      .withColumn("rn", row_number().over(w))
      .withColumn("z1cov",
        col("cI") + col("cG") * col("gov_action") + col("cT") * col("TAVG"))
    val sim = joined
      .select(col("state"), col("rn"), col("confirmed"), col("removed"),
        col("population"), col("z1cov").as("z1"), col("R_0").as("r0"),
        col("beta"))
      .as[SimRow]
      .groupByKey(_.state)
      .flatMapGroups { (state: String, it: Iterator[SimRow]) =>
        val rows = it.toIndexedSeq.sortBy(_.rn)
        val h = rows.head
        val n = h.population
        val alpha = h.beta * h.r0 / n
        var pc = h.confirmed; var pr = h.removed; var ps = n
        rows.iterator.map { r =>
          if (r.rn > 1) {
            val pcN = pc + alpha * ps * pc - h.beta * pc - r.z1
            val prN = pr + h.beta * pc + r.z1
            val psN = ps - alpha * ps * pc
            pc = pcN; pr = prN; ps = psN
          }
          SimOut(state, r.rn, pc, pr, ps)
        }
      }
      .toDF()
    // M8 bias adjust on pred_removed vs actual removed, then clamp
    val actual = joined.select(col("state"), col("rn"), col("removed"))
    val bias = sim.join(actual, Seq("state", "rn"))
      .groupBy("state")
      .agg(avg(col("pred_removed") - col("removed")).as("bias"))
    sim.join(broadcast(bias), Seq("state"))
      .withColumn("pred_removed",
        greatest(lit(0.0), col("pred_removed") - abs(col("bias"))))
      .select("state", "rn", "pred_confirmed", "pred_removed",
        "pred_susceptible")
  }

  /** Runnable: transform → features → coefficients → simulation. */
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        System.getProperty("java.io.tmpdir") + "/graft_warehouse")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // integration: the transform's dataset_full builds and is non-empty
    val dsf = CovidDataTransform.run(spark)
    println(s"PIPELINE transform rows=${dsf.count()}")
    // model fit + simulation on the committed per-state series (the
    // dates span the gov_action threshold, so the design has variance)
    val feats = features(spark, loadPopDataset(spark)).cache()
    val coefs = coefficients(feats)
    val sim = simulate(feats, coefs)
    println(s"PIPELINE simulator states=${coefs.count()} " +
      s"sim_rows=${sim.count()} " +
      s"neg_preds=${sim.filter(col("pred_removed") < 0).count()}")
    val cmp = compareIntervention(feats, coefs)
    println(s"PIPELINE intervention rows=${cmp.count()} " +
      s"affected=${cmp.filter(abs(col("diff_removed")) > 1e-9).count()}")
    spark.stop()
  }
}
