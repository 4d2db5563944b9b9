package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the graft_shingles generator vs the retired mapPartitions
  * spelling: full shingle emission + one hash aggregate over it at
  * sf0.1 (5k docs), 3 timed reps each after a warmup. */
object ShingleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"

    def legacy() = graft.ops.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        val toks = text.split(" ").filter(_.nonEmpty)
        val shs =
          if (toks.length < 3) Set.empty[String]
          else toks.sliding(3).map(_.mkString(" ")).toSet
        shs.iterator.map(sh => graft.queries.ShingleRow(id, shs.size, sh))
      }).toDF()

    def gen() = graft.ops.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), expr("graft_shingles(text, 3)"))

    def time(label: String, f: () => org.apache.spark.sql.DataFrame): Unit = {
      def run(): Long = f().agg(count(lit(1)), min("sh"), sum("nsh")).collect()
        .head.getLong(0)
      run() // warmup
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = run()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"$label: ${ts.map(_._1).min}%.2f s (min of 3), " +
        f"rows=${ts.head._2}")
    }
    time("legacy mapPartitions", legacy _)
    time("graft_shingles gen  ", gen _)
    spark.stop()
  }
}
