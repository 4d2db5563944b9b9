package graft.dev
import org.apache.spark.sql.SparkSession
object Sk1Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries("sk1_approx_sketches")
    fn(spark, "/root/testdata/sf0.1").count()
    for (_ <- 1 to 2) {
      val t0 = System.nanoTime()
      fn(spark, "/root/testdata/sf0.1").count()
      println(f"sk1: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
