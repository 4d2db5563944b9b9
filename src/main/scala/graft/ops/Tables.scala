package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Test-table catalog over the driver-generated parquet star schema
  * (TESTDATA.md). All `SparkEntry.queries` read through here so every
  * query gets the same scan path (parquet → Catalyst pushdown/pruning).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeTs(df) else df
  }

  /** Normalize `events.ts` to a session-zone TimestampType regardless of
    * how the generator encoded it in parquet. Dispatches on the SCANNED
    * type, because the testdata generator has shipped both encodings:
    *   - INT64 nanos (surfaced as BIGINT under
    *     spark.sql.legacy.parquet.nanosAsLong=true): exact integral
    *     `div 1000` → micros. `/` would promote the nanosecond longs
    *     (~1.7e18 > 2^53) to double and lose up to ±128 ns, making the
    *     truncated micros diverge from DuckDB's exact nanos→µs.
    *   - TIMESTAMP(µs, isAdjustedToUTC=false) (reads as TIMESTAMP_NTZ):
    *     cast to TimestampType. Every session here pins
    *     spark.sql.session.timeZone=UTC, so the cast re-tags the same
    *     wall-clock instant without shifting it — `unix_micros` and the
    *     DuckDB `epoch_us(ts)` oracles agree unchanged.
    * Works on batch and streaming frames alike (pure projection).
    */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case Some(TimestampNTZType) =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df // already TimestampType (or no ts column): no-op
    }

  /** Register every table as a temp view for spark.sql queries. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
