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

  test("coefficient table matches the committed recover_coefs.csv golden shape") {
    val coefs = CovidSimulator.coefficients(feats)
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

  test("simulation output is clamped and covers every fitted state") {
    val coefs = CovidSimulator.coefficients(feats)
    val sim = CovidSimulator.simulate(feats, coefs)
    assert(sim.filter(col("pred_removed") < 0).count() == 0)
    assert(sim.select("state").distinct().count() == coefs.count())
  }

  test("intervention comparison diverges only where gov_action was zeroed") {
    val coefs = CovidSimulator.coefficients(feats)
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
      minRows = 60, nTest = 10, horizon = 30)
    val nSeries = rs.count()
    assert(nSeries == 250) // the reference forecast 250 series
    assert(pa.count() == nSeries * 10)
    assert(fp.count() == nSeries * 30)
    // future dates advance from each series' max date
    assert(fp.filter(col("date_idx") < 0 || col("date_idx") > 29).count() == 0)
    assert(fp.filter(col("pred").isNull).count() == 0)
  }
}
