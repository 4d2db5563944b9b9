package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Tables

/** Stage timing for g5_link_prediction on the current host: kernel-only
  * vs shuffle+agg vs full query, plus an explode(Array[Long]) variant
  * of the wedge emission that avoids per-wedge Long boxing.
  * usage: Test/runMain graft.dev.G5Probe4
  */
object G5Probe4 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[g5probe4] $label%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    (1 to 2).foreach { pass =>
      println(s"--- pass $pass ---")
      val op = Tables.load(spark, dir, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val e0 = t("coEdges (checkpoint)") {
        op.as("a").join(op.as("b"), Seq("o"))
          .filter(col("a.p") < col("b.p"))
          .select(col("a.p").as("p1"), col("b.p").as("p2"))
          .distinct()
          .localCheckpoint()
      }
      val nbr = e0.select(col("p1").as("c"), col("p2").as("x"))
        .unionByName(e0.select(col("p2").as("c"), col("p1").as("x")))
      val adj = nbr
        .groupBy("c").agg(sort_array(collect_list(col("x"))).as("xs"))
        .select(col("xs"))

      // Current spelling: boxed Iterator[Long] through the encoder.
      val wedgeBoxed = adj.as[Seq[Long]]
        .mapPartitions(_.flatMap { xs =>
          val a = xs.toArray
          val out = new scala.collection.mutable.ArrayBuffer[Long](
            math.max(0, a.length * (a.length - 1) / 2))
          var i = 0
          while (i < a.length) {
            var j = i + 1
            while (j < a.length) {
              out += (a(i) << 32) | a(j)
              j += 1
            }
            i += 1
          }
          out
        })
        .toDF("pk")

      // Array-per-center spelling: one primitive Array[Long] row per
      // center, explode codegen'd to rows.
      val wedgeArr = adj.as[Seq[Long]]
        .mapPartitions(_.map { xs =>
          val a = xs.toArray
          val out = new Array[Long](math.max(0, a.length * (a.length - 1) / 2))
          var k = 0
          var i = 0
          while (i < a.length) {
            var j = i + 1
            while (j < a.length) {
              out(k) = (a(i) << 32) | a(j); k += 1
              j += 1
            }
            i += 1
          }
          out
        })
        .toDF("xs")
        .select(explode(col("xs")).as("pk"))

      t("kernel boxed count-only")(println("  n=" + wedgeBoxed.count()))
      t("kernel array count-only")(println("  n=" + wedgeArr.count()))
      t("boxed shuffle+agg cn>=2") {
        println("  n=" + wedgeBoxed
          .repartition(64, col("pk"))
          .groupBy("pk").agg(count(lit(1)).as("cn"))
          .filter(col("cn") >= 2).count())
      }
      t("array shuffle+agg cn>=2") {
        println("  n=" + wedgeArr
          .repartition(64, col("pk"))
          .groupBy("pk").agg(count(lit(1)).as("cn"))
          .filter(col("cn") >= 2).count())
      }
      t("array direct agg (no repart)") {
        println("  n=" + wedgeArr
          .groupBy("pk").agg(count(lit(1)).as("cn"))
          .filter(col("cn") >= 2).count())
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
