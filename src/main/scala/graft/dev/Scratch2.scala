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
    val dir = "/root/testdata/sf0.1"
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"TIMING $name rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    time("warmup-count")(li.count())
    val keys = Seq("l_returnflag", "l_linestatus", "l_shipmonth")
    def measure(c: String, alias: String) =
      li.withColumn("l_shipmonth", date_trunc("month", col("l_shipdate")))
        .groupBy(keys.map(col): _*)
        .agg(round(sum(col(c)), 4).as(alias))
    time("agg1")(measure("l_quantity", "qty").count())
    time("agg1-again")(measure("l_quantity", "qty").count())
    time("join2") {
      measure("l_quantity", "qty")
        .join(measure("l_extendedprice", "price"), keys, "inner").count()
    }
    time("join3") {
      measure("l_quantity", "qty")
        .join(measure("l_extendedprice", "price"), keys, "inner")
        .join(measure("l_discount", "disc"), keys, "inner")
        .count()
    }
    time("join3-sorted") {
      measure("l_quantity", "qty")
        .join(measure("l_extendedprice", "price"), keys, "inner")
        .join(measure("l_discount", "disc"), keys, "inner")
        .orderBy(keys.map(col): _*)
        .count()
    }
    spark.stop()
  }
}
