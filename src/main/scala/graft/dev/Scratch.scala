package graft.dev
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Scratch {
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
    time("raw_count") { li.count() }
    time("groupby_nodate") {
      li.groupBy("l_returnflag", "l_linestatus").agg(sum("l_quantity")).count()
    }
    time("groupby_datetrunc") {
      li.withColumn("m", date_trunc("month", col("l_shipdate")))
        .groupBy("l_returnflag", "l_linestatus", "m").agg(sum("l_quantity")).count()
    }
    time("groupby_trunc_date") {
      li.withColumn("m", trunc(col("l_shipdate"), "month"))
        .groupBy("l_returnflag", "l_linestatus", "m").agg(sum("l_quantity")).count()
    }
    time("groupby_datetrunc2") {
      li.withColumn("m", date_trunc("month", col("l_shipdate")))
        .groupBy("l_returnflag", "l_linestatus", "m").agg(sum("l_quantity")).count()
    }
    spark.stop()
  }
}
