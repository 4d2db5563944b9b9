package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming surface. The reference is pure batch
  * (SURVEY.md §2.9), so streaming is an engine capability, not a parity
  * requirement: these transforms are written against an unbounded
  * DataFrame and run identically over `read` (batch) and `readStream`
  * (incremental) inputs — the Spark idiom for a unified engine.
  *
  * Scale notes: both aggregations are keyed by (window/session ×
  * event_type/user) so state is bounded by the watermark horizon, not
  * the stream length; late events beyond 1 hour are dropped instead of
  * growing state without bound.
  */
object EventStreams {

  /** Tumbling 1-hour window counts per event type, 1-hour watermark.
    * Streaming analogue of the batch `e1_tumbling_window` query.
    */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Native session windows (30-min gap) per user — the streaming
    * analogue of the batch `e2_sessionize` lag/running-sum query,
    * expressed with Spark's session_window so state expiry is handled
    * by the engine.
    */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("session_value"))
      .select(col("session_window.start").as("session_start"),
        col("user_id"), col("n_events"), col("session_value"))

  /** Streaming deduplication: drop repeated (user_id, event_type)
    * occurrences within the watermark horizon — the streaming analogue
    * of the batch exact-dedup family (X1), with state bounded by the
    * 1-hour watermark instead of the stream's full history.
    */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** Runnable demo: stream the events parquet through the tumbling
    * aggregation with an availableNow trigger (process-everything-
    * then-stop) into an in-memory table, and print the row count.
    * Usage: runMain graft.streaming.EventStreams <sfDir>
    */
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        System.getProperty("java.io.tmpdir") + "/graft_warehouse")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // file-source stream needs an explicit schema; reuse the batch
    // reader's (with the same nanos->micros ts normalization)
    val batch = graft.ops.Tables.load(spark, sfDir, "events")
    // file-source streams take a directory; select just the events
    // table out of the sf dir with a glob filter
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$sfDir/events.parquet").schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val q = tumblingCounts(stream).writeStream
      .format("memory").queryName("tumbling")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.sql("SELECT count(*) FROM tumbling").first().getLong(0)
    val batched = tumblingCounts(batch).count()
    println(s"STREAM tumbling_rows=$streamed batch_rows=$batched " +
      (if (streamed == batched) "OK" else "MISMATCH"))
    spark.stop()
  }
}
