package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: how many label-propagation rounds does d9 need at a given sf,
  * and what does each round cost? usage: Test/runMain graft.dev.CCProbe <sfDir>
  */
object CCProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val pairs = graft.SparkEntry.queries("d4_minhash_lsh")(spark, dir)
      .select("doc_a", "doc_b")
    val edges = pairs.union(
      pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .persist()
    var labels = edges.select(col("doc_a").as("doc_id")).distinct()
      .withColumn("lbl", col("doc_id")).persist()
    var prev = labels.agg(coalesce(sum("lbl"), lit(0L))).first().getLong(0)
    println(s"setup ${(System.nanoTime() - t0) / 1e9}s  nverts=${labels.count()}  nedges=${edges.count()}")
    var done = false
    var r = 0
    while (!done && r < 30) {
      val t1 = System.nanoTime()
      val nbrMin = edges
        .join(labels.withColumnRenamed("doc_id", "doc_b"), Seq("doc_b"))
        .groupBy(col("doc_a").as("doc_id"))
        .agg(min("lbl").as("nlbl"))
      val next = labels.join(nbrMin, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"))
        .persist()
      val cur = next.agg(coalesce(sum("lbl"), lit(0L))).first().getLong(0)
      labels.unpersist()
      labels = next
      done = cur == prev
      prev = cur
      r += 1
      println(f"round $r  sum=$cur  ${(System.nanoTime() - t1) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
