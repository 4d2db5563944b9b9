package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{LongBloom, Tables}

/** Stage-by-stage timing of g6_clustering_coefficient to locate the
  * round-11 regression (3.7 s -> ~16 s after the Bloom prefilter).
  * usage: Test/runMain graft.dev.G6Probe
  */
object G6Probe {
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
      println(f"[g6probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // 'g5first' arg: run the real g5 registry query before each pass to
    // reproduce the bench-sequence interference (g6 4.6 s alone vs ~20 s
    // after g5 in round-12 probes).
    val g5first = args.contains("g5first")
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass ---")
      if (g5first) t("g5 (registry query)") {
        graft.SparkEntry.queries("g5_link_prediction")(spark, dir).count()
      }
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
      val deg = t("degrees (checkpoint)") {
        e0.select(col("p1").as("node"))
          .unionByName(e0.select(col("p2").as("node")))
          .groupBy("node").agg(count(lit(1)).as("deg"))
          .localCheckpoint()
      }
      val nNodes = t("deg.count")(deg.count())
      val oriented = t("orientedEdges (checkpoint)") {
        val withDeg = e0
          .join(broadcast(deg.select(col("node").as("p1"), col("deg").as("d1"))), Seq("p1"))
          .join(broadcast(deg.select(col("node").as("p2"), col("deg").as("d2"))), Seq("p2"))
        def before(dA: org.apache.spark.sql.Column, a: org.apache.spark.sql.Column,
            dB: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
          dA < dB || (dA === dB && a < b)
        withDeg.select(
          when(before(col("d1"), col("p1"), col("d2"), col("p2")),
            col("p1")).otherwise(col("p2")).as("src"),
          when(before(col("d1"), col("p1"), col("d2"), col("p2")),
            col("p2")).otherwise(col("p1")).as("dst"),
          when(before(col("d1"), col("p1"), col("d2"), col("p2")),
            col("d2")).otherwise(col("d1")).as("ddst"))
          .localCheckpoint()
      }
      val nEdges = t("e0.count")(e0.count())
      val edgePk = oriented
        .select(shiftleft(col("src"), 32).bitwiseOR(col("dst")).as("pk"))
      val nWords = LongBloom.sizeBits(nEdges) >>> 6
      println(s"[g6probe] nEdges=$nEdges nWords=$nWords (${nWords * 8 / 1024} KB)")
      val bloomBc = t("bloom build (treeReduce)") {
        spark.sparkContext.broadcast(
          edgePk.as[Long].rdd
            .mapPartitions { it =>
              val w = new Array[Long](nWords)
              it.foreach(LongBloom.set(w, _))
              Iterator.single(w)
            }
            .treeReduce(LongBloom.or, depth = 2))
      }
      val wedgePk = oriented
        .groupBy("src")
        .agg(sort_array(collect_list(struct(col("ddst"), col("dst")))).as("xs"))
        .select(col("xs"))
        .as[Seq[(Long, Long)]]
        .mapPartitions { part =>
          val bloom = bloomBc.value
          part.flatMap { xs =>
            val a = xs.toArray
            val out = new scala.collection.mutable.ArrayBuffer[Long]()
            var i = 0
            while (i < a.length) {
              var j = i + 1
              while (j < a.length) {
                val pk = (a(i)._2 << 32) | a(j)._2
                if (LongBloom.test(bloom, pk)) out += pk
                j += 1
              }
              i += 1
            }
            out
          }
        }
        .toDF("pk")
      val surviving = t("wedge kernel + bloom count")(wedgePk.count())
      println(s"[g6probe] surviving wedges = $surviving")
      val tri = t("wedge-edge join count") {
        wedgePk.join(broadcast(edgePk), Seq("pk"), "inner")
          .agg(count(lit(1)).as("n_triangles"))
      }
      val wedgeCount = deg.agg(
        sum(expr("(deg * (deg - 1)) DIV 2")).as("n_wedges"))
      t("final crossJoin count") {
        tri.crossJoin(broadcast(wedgeCount))
          .select(col("n_wedges"), col("n_triangles"),
            ((lit(3L) * col("n_triangles")).cast("double") /
              col("n_wedges").cast("double")).as("global_cc"))
          .count()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
