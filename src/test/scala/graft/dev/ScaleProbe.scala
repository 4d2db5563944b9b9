package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling-curve probe for the dedup family: replicate the sf0.1
  * documents table m× (fresh doc_ids) into /tmp parquet and time the
  * registry queries at each multiple. Linear growth in the signature
  * pass and candidate-bounded verify is the 100 TB design claim;
  * quadratic growth would falsify it.
  * usage: Test/runMain graft.dev.ScaleProbe [q1 q2 ...]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val queries =
      if (args.nonEmpty) args.toSeq
      else Seq("d2_exact_dedup", "d4_minhash_lsh", "d5_simhash",
        "t1_token_count", "pl4_corpus_prep")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = "/root/testdata/sf0.1"
    for (m <- Seq(1, 2, 4, 8)) {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft_scale_x$m"
      val docs = spark.read.parquet(s"$src/documents.parquet")
      val n = docs.count()
      (0 until m).map(i =>
          docs.withColumn("doc_id", col("doc_id") + lit(i * n))
            // perturb replica text so replicas are not exact dups of the
            // original (prefix a replica tag token)
            .withColumn("text",
              when(lit(i) === 0, col("text"))
                .otherwise(concat(lit(s"rep$i "), col("text")))))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      // embeddings/events/etc not needed by the doc-family queries, but
      // Tables.load resolves per table so only documents is read
      queries.foreach { q =>
        val fn = graft.SparkEntry.queries(q)
        fn(spark, dir).count() // warm
        val t0 = System.nanoTime()
        val rows = fn(spark, dir).count()
        spark.catalog.clearCache()
        println(f"SCALE x$m%-2d $q%-22s rows=$rows%-8d ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    }
    spark.stop()
  }
}
