package graft.pipelines

import graft.ops.LinAlg
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
  *  2. [[coefficients]] — the MixedLM substitution (SURVEY §7.3 #1):
  *     pooled 4-covariate OLS (d_removed ~ Intercept + gov_action +
  *     TAVG + lag_confirmed) for the fixed effects, plus per-state
  *     ridge-shrunk random deviations for (Intercept, lag_confirmed),
  *     emitted in the committed `recover_coefs.csv` column shape, with
  *     the reference's negative-β mean imputation.
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
      .withColumn("lag_confirmed", coalesce(lag("confirmed", 1).over(w), lit(0.0)))
      .withColumn("lag_death", coalesce(lag("death", 1).over(w), lit(0.0)))
      .withColumn("lag_recovered", coalesce(lag("recovered", 1).over(w), lit(0.0)))
      .withColumn("lag_removed", coalesce(lag("removed", 1).over(w), lit(0.0)))
      .withColumn("d_death", col("death") - col("lag_death"))
      .withColumn("d_recovered", col("recovered") - col("lag_recovered"))
      .withColumn("d_removed", col("removed") - col("lag_removed"))
    // R0 per state from first-30 positive increments of confirmed,
    // recovered, death: rho = (z1+z2+z3)/(z2+z3), zero-imputed by the
    // mean of positive R0s (covid_simulator.py:393-446)
    val rn = trimmed.withColumn("rn", row_number().over(w))
    val diffs = rn.filter(col("rn") <= 30)
      .groupBy("state")
      .agg(
        sum(when(col("confirmed") - col("lag_confirmed") > 0,
          col("confirmed") - col("lag_confirmed")).otherwise(0.0)).as("z1"),
        sum(when(col("d_recovered") > 0, col("d_recovered")).otherwise(0.0)).as("z2"),
        sum(when(col("d_death") > 0, col("d_death")).otherwise(0.0)).as("z3"))
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
    * recover_coefs.csv shape. lambda is the ridge strength of the
    * random-effect shrinkage toward the pooled fit.
    */
  def coefficients(feats: DataFrame, lambda: Double = 50.0): DataFrame = {
    val spark = feats.sparkSession
    import spark.implicits._
    val xs = Seq("Intercept", "gov_action", "TAVG", "lag_confirmed")
    val train = feats.filter(col("removed") > 0 && col("holdout") === 0)
      .select((col("state") +: col("d_removed").as("y") +:
        xs.map(c => col(c).cast("double").as(c))): _*)
      .na.drop()
    // pooled normal equations from one aggregate pass
    val prods = (for (i <- xs.indices; j <- xs.indices if j >= i)
      yield sum(col(xs(i)) * col(xs(j))).as(s"xx_${i}_$j")) ++
      xs.indices.map(i => sum(col(xs(i)) * col("y")).as(s"xy_$i"))
    val g = train.agg(prods.head, prods.tail: _*).first()
    val a = Array.tabulate(4, 4)((i, j) =>
      g.getAs[Double](s"xx_${math.min(i, j)}_${math.max(i, j)}"))
    val b = Array.tabulate(4)(i => g.getAs[Double](s"xy_$i"))
    // tiny trace-scaled ridge keeps the solve defined when a covariate
    // is constant in the window (e.g. gov_action with post-threshold
    // data, TAVG when weather is absent)
    val eps = 1e-8 * (0 until 4).map(i => a(i)(i)).max.max(1.0)
    (0 until 4).foreach(i => a(i)(i) += eps)
    val beta = LinAlg.solve(a, b) // fixed effects
    // per-state shrunk deviations for (Intercept, lag_confirmed) on
    // the fixed-effect residuals: u_s = (Z'Z + lambda I)^-1 Z' r
    val resid = train.withColumn("r",
      col("y") - xs.zipWithIndex.map { case (c, i) => col(c) * lit(beta(i)) }
        .reduce(_ + _))
    // per-state 2×2 solves run DISTRIBUTED: the sufficient statistics
    // are one state-keyed aggregate shuffle, and the ridge solve is a
    // per-row typed map on the executors — no group-cardinality data
    // ever reaches the driver (only the p²-sized pooled fit above does)
    val rows = resid.groupBy("state").agg(
        count(lit(1)).cast("double").as("n"),
        sum("lag_confirmed").as("sz"),
        sum(col("lag_confirmed") * col("lag_confirmed")).as("szz"),
        sum("r").as("sr"),
        sum(col("lag_confirmed") * col("r")).as("szr"))
      .as[(String, Double, Double, Double, Double, Double)]
      .map { case (state, n, sz, szz, sr, szr) =>
        val u = LinAlg.solve(
          Array(Array(n + lambda, sz), Array(sz, szz + lambda)),
          Array(sr, szr))
        (state, "Intercept", u(0), u(1))
      }
    val rc = rows.toDF("state", "coef_name", "coef_value", "re_lag_confirmed")
      .withColumn("fe_Intercept", lit(beta(0)))
      .withColumn("Intercept", col("fe_Intercept") + col("coef_value"))
      .withColumn("lag_confirmed", lit(beta(3)) + col("re_lag_confirmed"))
      .withColumn("gov_action", lit(beta(1)))
      .withColumn("TAVG", lit(beta(2)))
    // negative-beta mean imputation (covid_simulator.py:501-502)
    val mb = rc.filter(col("lag_confirmed") > 0)
      .agg(avg("lag_confirmed").as("mean_beta"))
    rc.crossJoin(broadcast(mb))
      .withColumn("lag_confirmed",
        when(col("lag_confirmed") < 0, col("mean_beta"))
          .otherwise(col("lag_confirmed")))
      .select("state", "coef_name", "coef_value", "re_lag_confirmed",
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
