package graft.dev
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Scratch2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"TIMING $name rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    for (i <- 1 to 5) {
      time(s"datetrunc_$i") {
        li.withColumn("m", date_trunc("month", col("l_shipdate")))
          .groupBy("l_returnflag", "l_linestatus", "m").agg(sum("l_quantity")).count()
      }
    }
    for (i <- 1 to 3) {
      time(s"ym_int_$i") {
        li.withColumn("m", year(col("l_shipdate")) * 100 + month(col("l_shipdate")))
          .groupBy("l_returnflag", "l_linestatus", "m").agg(sum("l_quantity")).count()
      }
    }
  }
}
