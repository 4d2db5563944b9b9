package graft.pipelines

import graft.ops.Sequential
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Row shape for the TAVG smoothing fold (top-level for Encoders). */
case class WxRow(country_region: String, province_state: String, date: Int,
    tavg: Option[Double], date_idx: Double)
case class WxOut(country_region: String, province_state: String, date: Int,
    TAVG: Double, date_idx: Double)

/** The reference's multi-source ETL (covid_data_transform.py __main__,
  * SURVEY.md §3.1) re-composed from the operator library as ONE lazy
  * Spark DAG over the reference's own committed CSVs: JHU wide tables
  * are unpivoted, 3-key-joined, location-canonicalized (lookup UPDATE →
  * broadcast join + coalesce), country-rolled-up and unioned with the
  * US daily table, population-joined, united with the weather forecast,
  * TAVG-smoothed per location (W5 fold), right-joined onto weather,
  * admission-filtered to full-horizon locations, population-broadcast,
  * and named. Output = the `dataset_full` shape (FIXTURES.md).
  *
  * The raw GHCN weather blobs are not committed in the reference repo,
  * so the weather frame is the committed forecast output
  * (`future_pred.csv`) alone — the historical-weather branch
  * (covid_data_transform.py:129-173) is exercised by the same operators
  * in the query library (A6 pivot, J3 station join, A1 mean roll-up).
  */
object CovidDataTransform {

  private val measures = Seq("confirmed", "recovered", "death")

  /** `_M_D_YY` wide-column name → yyyyMMdd int (the reference parses
    * dates out of COLUMN NAMES during melt, covid_data_transform.py:86). */
  private def colToYmd(c: String): Int = {
    val Array(m, d, y) = c.stripPrefix("_").split("_").map(_.toInt)
    (2000 + y) * 10000 + m * 100 + d
  }

  /** Unpivot one JHU wide table to (province_state, country_region,
    * date int, <measure> long). */
  private def meltJhu(df: DataFrame, measure: String): DataFrame = {
    val dateCols = df.columns.filter(_.matches("_\\d+_\\d+_\\d+"))
    val renamed = df.select(
      (Seq(col("province_state"), col("country_region")) ++
        dateCols.map(c => col(c).as(colToYmd(c).toString))): _*)
    renamed.unpivot(
        Array(col("province_state"), col("country_region")),
        dateCols.map(c => col(colToYmd(c).toString)),
        "date", measure)
      .withColumn("date", col("date").cast("int"))
  }

  /** rename_location (covid_data_transform.py:14-21): two sequential
    * lookup-UPDATEs per row of location_match. Rule 1 rewrites
    * province_state where (ps, cr) == (ps_old, cr_old); rule 2 then
    * rewrites country_region where (ps, cr) == (ps_NEW, cr_old) — note
    * rule 2 matches the ALREADY-UPDATED province_state.
    */
  private def renameLocation(df: DataFrame, lookup: DataFrame): DataFrame = {
    val r1 = lookup.select(col("province_state_old"), col("country_region_old"),
      col("province_state_new").as("ps_new1")).distinct()
    val r2 = lookup.select(col("province_state_new"), col("country_region_old"),
      col("country_region_new").as("cr_new2")).distinct()
    df.join(broadcast(r1),
        df("province_state") === r1("province_state_old") &&
          df("country_region") === r1("country_region_old"), "left")
      .withColumn("province_state", coalesce(col("ps_new1"), col("province_state")))
      .drop("province_state_old", "country_region_old", "ps_new1")
      .join(broadcast(r2),
        col("province_state") === r2("province_state_new") &&
          col("country_region") === r2("country_region_old"), "left")
      .withColumn("country_region", coalesce(col("cr_new2"), col("country_region")))
      .drop("province_state_new", "country_region_old", "cr_new2")
  }

  /** aggregate_loc_covid / aggregate_loc_weather
    * (covid_data_transform.py:24-52): non-US countries collapse to one
    * 'UNK' country-level row per date (sum for covid counts, mean for
    * weather); US keeps its per-state rows. pandas groupby silently
    * drops string columns — here the aggregated columns are explicit.
    */
  private def rollupNonUs(df: DataFrame, aggs: Seq[(String, String)]): DataFrame = {
    val us = df.filter(col("country_region") === "United States")
    val rest = df.filter(col("country_region") =!= "United States")
    val exprs = aggs.map { case (c, how) =>
      (if (how == "sum") sum(col(c)) else avg(col(c))).as(c)
    }
    val rolled = rest.groupBy("date", "country_region")
      .agg(exprs.head, exprs.tail: _*)
      .withColumn("province_state", lit("UNK"))
      .select(us.columns.map(col): _*)
    us.unionByName(rolled)
  }

  def run(spark: SparkSession,
      refDir: String = "/root/reference/scripts"): DataFrame = {
    import spark.implicits._
    def csv(path: String): DataFrame =
      spark.read.option("header", true).option("inferSchema", true)
        .csv(s"$refDir/$path")

    val exclude = Seq("latitude", "longitude", "location_geom")
    val lookup = csv("data/covid_data/location_match.csv")

    // stages 1+4-5: JHU wide scans -> drop geo -> melt -> 3-key joins
    val Seq(conf, reco, death) =
      Seq("confirmed", "recovered", "death").map { m =>
        meltJhu(csv(s"data/covid_data/jhu_${m}_covid.csv")
          .drop(exclude: _*), m)
      }
    val keys = Seq("province_state", "country_region", "date")
    var interCovid = conf.join(reco, keys, "inner").join(death, keys, "inner")
      .withColumn("country_region",
        when(col("country_region") === "US", "United States")
          .otherwise(col("country_region")))
    interCovid = renameLocation(interCovid, lookup)
    interCovid = rollupNonUs(interCovid, measures.map(_ -> "sum"))

    // stage 3+7: population dims and joins
    val jhuPop = csv("data/covid_data/jhu_countries_with_code.csv")
      .withColumn("country_region",
        regexp_replace(col("countries_and_territories"), "_", " "))
      .select(col("country_region"), col("pop_data_2018").as("population"))
      .dropDuplicates()
    interCovid = interCovid.join(broadcast(jhuPop), Seq("country_region"), "inner")

    val usCovid = csv("data/covid_data/daily_covid_usstates.csv")
      .select("date", "state", "positive", "recovered", "death")
      .withColumnRenamed("state", "province_state")
      .withColumnRenamed("positive", "confirmed")
      .withColumn("country_region", lit("United States"))
      .na.fill(0)
    val usPop = csv("data/covid_data/covid_county_population_usafacts.csv")
      .groupBy(col("State").as("province_state"))
      .agg(sum("population").as("population"))
    val usWithPop = usCovid.join(broadcast(usPop), Seq("province_state"), "inner")

    var covid = interCovid.unionByName(usWithPop, allowMissingColumns = true)
      .na.fill("UNK", Seq("province_state"))
      .na.fill(0)
      .withColumn("date", col("date").cast("int"))
      .withColumn("country_region", trim(col("country_region")))

    // stages 9-11: weather frame = committed forecast, canonicalized,
    // rolled up (mean), then the W5 smoothing recurrence per location
    var weather = csv("output/weather_output/future_pred.csv")
      .select(col("TAVG_pred").as("TAVG"),
        col("state").as("province_state"), col("date"),
        col("country").as("country_region"),
        col("date_idx").cast("double").as("date_idx"))
      .na.fill(-1.0, Seq("date_idx"))
    weather = renameLocation(weather, lookup)
    weather = rollupNonUs(weather,
      Seq("TAVG" -> "mean", "date_idx" -> "mean"))
    val smoothed = weather
      .select(col("country_region"), col("province_state"),
        col("date").cast("int").as("date"), col("TAVG").as("tavg"),
        col("date_idx"))
      .as[WxRow]
      .groupByKey(r => (r.country_region, r.province_state))
      .flatMapGroups { (key: (String, String), it: Iterator[WxRow]) =>
        val (cr, ps) = key
        val sorted = it.toIndexedSeq.sortBy(_.date)
        val filled = Sequential.smoothFill(sorted.map(_.tavg))
        sorted.iterator.zip(filled.iterator).map { case (r, t) =>
          WxOut(cr, ps, r.date, t, r.date_idx)
        }
      }
      .toDF()

    // stages 12-14: right join onto weather; keep locations with the
    // full 180-day horizon; broadcast first non-null population and
    // drop zero/absent-population locations
    val joined = covid.join(smoothed,
      Seq("date", "country_region", "province_state"), "right")
    val locKeys = Seq("country_region", "province_state")
    val hasHorizon = joined.groupBy(locKeys.map(col): _*)
      .agg(max("date_idx").as("mx")).filter(col("mx") === 179.0)
      .select(locKeys.map(col): _*)
    val admitted = joined.join(hasHorizon, locKeys, "left_semi")
    val firstPop = admitted.filter(col("population").isNotNull &&
        col("population") =!= 0)
      .groupBy(locKeys.map(col): _*)
      .agg(min_by(col("population"), col("date")).as("pop_broadcast"))
    admitted.drop("population")
      .join(firstPop, locKeys, "inner") // inner = drop no-population locs
      .withColumn("population", col("pop_broadcast").cast("double"))
      .withColumn("location_name",
        concat(col("country_region"), lit(" : "), col("province_state")))
      .select("date", "country_region", "province_state", "confirmed",
        "recovered", "death", "population", "TAVG", "date_idx",
        "location_name")
  }

  /** Runnable: writes the dataset_full parquet + prints summary. */
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/graft_pipelines/dataset_full")
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
    val ds = run(spark)
    ds.write.mode("overwrite").parquet(out)
    val locs = ds.select("location_name").distinct().count()
    println(s"PIPELINE dataset_full rows=${ds.count()} locations=$locs -> $out")
    spark.stop()
  }
}
