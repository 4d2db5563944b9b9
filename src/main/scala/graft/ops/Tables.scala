package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
    // events.ts is parquet TIMESTAMP(NANOS), which the Spark reader only
    // surfaces as a long (spark.sql.legacy.parquet.nanosAsLong=true, set
    // by every session builder here). Normalize to a microsecond
    // timestamp so downstream queries see a real TimestampType column.
    // Exact integral division (`div`): `/` would promote the nanosecond
    // longs (~1.7e18 > 2^53) to double and lose up to ±128 ns, making
    // the truncated microseconds diverge from DuckDB's exact nanos→µs.
    if (name == "events")
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** Register every table as a temp view for spark.sql queries. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
