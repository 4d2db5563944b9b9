package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: is `embedding.cast("array<double>")` bit-identical to the
  * interpreted `transform(embedding, _.cast("double"))`, and faster?
  */
object CastProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val a = e.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val b = e.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    val diff = a.withColumnRenamed("v", "va").join(b, Seq("vec_id"))
      .filter(col("va") =!= col("v")).count()
    println(s"DIFF rows=$diff")
    def time(name: String, f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name n=$n ${(System.nanoTime() - t0) / 1e9}%.3fs")
    }
    def dot(c1: org.apache.spark.sql.Column, c2: org.apache.spark.sql.Column) =
      call_function("graft_dot", c1, c2)
    for (_ <- 1 to 3) {
      time("transform", a.select(sum(dot(col("v"), col("v")))).first().getDouble(0).toLong)
      time("cast     ", b.select(sum(dot(col("v"), col("v")))).first().getDouble(0).toLong)
    }
    spark.stop()
  }
}
