package graft.dev
import org.apache.spark.sql.SparkSession

object RcteProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.ops.Tables.registerAll(spark, "/root/testdata/sf0.001")
    val hier = """
      WITH RECURSIVE up(suppkey, anc, depth) AS (
        SELECT s_suppkey, s_suppkey + 1, 0 FROM supplier
        UNION ALL
        SELECT suppkey, CAST(FLOOR(anc / 2.0) AS BIGINT), depth + 1 FROM up WHERE anc > 1
      )
      SELECT suppkey, max(depth) AS depth, CAST(count(*) AS BIGINT) AS n_ancestors,
             CAST(sum(anc) AS BIGINT) AS anc_sum
      FROM up GROUP BY suppkey ORDER BY suppkey"""
    try {
      val df = spark.sql(hier)
      df.show(5)
      println("HIER_OK rows=" + df.count())
      df.printSchema()
    } catch { case e: Exception => println("HIER_FAIL: " + e.getMessage.take(500)) }
    val lat = """
      SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
      FROM customer c,
      LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
               WHERE o.o_custkey = c.c_custkey
               ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
      ORDER BY c.c_custkey, t.o_orderkey LIMIT 10"""
    try {
      val df2 = spark.sql(lat)
      df2.show(5)
      println("LATERAL_OK rows=" + df2.count())
    } catch { case e: Exception => println("LATERAL_FAIL: " + e.getMessage.take(500)) }
    spark.stop()
  }
}
