package graft.dev
import org.apache.spark.sql.SparkSession

object Scratch2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries("sql2_lateral_topk")(spark, "/root/testdata/sf0.01")
    println(df.queryExecution.executedPlan.toString.take(3000))
    spark.stop()
  }
}
