package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Timing probe for g5_link_prediction variants at sf0.1 — the round-8
  * bench's most expensive row (38.9 s). The graph: 20k nodes, 1.196M
  * edges, near-regular (avg deg 120, max 222), 147.8M wedges collapsing
  * to 101M distinct pairs — endpoint-degree pruning is useless (top-20
  * cn is 9-11 but EVERY node has deg ≥ 32), so the shuffle of ~100M
  * pair keys is the irreducible exact cost and the question is only how
  * cheaply each variant moves it.
  */
object G5Probe {
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
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"

    def edges(): DataFrame = {
      val op = graft.ops.Tables.load(spark, dir, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      op.as("a").join(op.as("b"), Seq("o"))
        .filter(col("a.p") < col("b.p"))
        .select(col("a.p").as("p1"), col("b.p").as("p2"))
        .distinct()
        .localCheckpoint()
    }

    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$tag%-28s rows=$n%-12d ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }

    val e0 = edges()
    e0.count()

    // current registry shape: two-col groupBy over the wedge join
    time("baseline 2col groupBy") {
      val nbr = e0.select(col("p1").as("c"), col("p2").as("x"))
        .unionByName(e0.select(col("p2").as("c"), col("p1").as("x")))
      val pairs = nbr.as("l").join(nbr.as("r"), Seq("c"))
        .filter(col("l.x") < col("r.x"))
        .groupBy(col("l.x").as("p1"), col("r.x").as("p2"))
        .agg(count(lit(1)).as("common_neighbors"))
      pairs.join(e0, Seq("p1", "p2"), "left_anti")
        .orderBy(col("common_neighbors").desc, col("p1"), col("p2"))
        .limit(20).collect().length.toLong
    }

    // variant B: single-long pair key (p1*2^32 | p2) through the shuffle
    time("B long-key groupBy") {
      val nbr = e0.select(col("p1").as("c"), col("p2").as("x"))
        .unionByName(e0.select(col("p2").as("c"), col("p1").as("x")))
      val pairs = nbr.as("l").join(nbr.as("r"), Seq("c"))
        .filter(col("l.x") < col("r.x"))
        .select((shiftleft(col("l.x"), 32) + col("r.x")).as("pk"))
        .groupBy("pk").agg(count(lit(1)).as("common_neighbors"))
        .select((col("pk") / pow(lit(2), lit(32))).cast("long").as("p1"),
          (col("pk").bitwiseAND(lit(0xffffffffL))).as("p2"),
          col("common_neighbors"))
      pairs.join(e0, Seq("p1", "p2"), "left_anti")
        .orderBy(col("common_neighbors").desc, col("p1"), col("p2"))
        .limit(20).collect().length.toLong
    }

    // variant C: adjacency arrays + typed flatMap kernel emitting long keys
    time("C array flatMap kernel") {
      val nbr = e0.select(col("p1").as("c"), col("p2").as("x"))
        .unionByName(e0.select(col("p2").as("c"), col("p1").as("x")))
      val lists = nbr.groupBy("c")
        .agg(sort_array(collect_list(col("x"))).as("xs"))
        .select("xs").as[Seq[Long]]
      val keys = lists.mapPartitions { it =>
        it.flatMap { xs =>
          val a = xs.toArray
          val out = new scala.collection.mutable.ArrayBuffer[Long](
            a.length * (a.length - 1) / 2)
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
        }
      }
      val pairs = keys.toDF("pk")
        .groupBy("pk").agg(count(lit(1)).as("common_neighbors"))
        .select(shiftright(col("pk"), 32).as("p1"),
          col("pk").bitwiseAND(lit(0xffffffffL)).as("p2"),
          col("common_neighbors"))
      pairs.join(e0, Seq("p1", "p2"), "left_anti")
        .orderBy(col("common_neighbors").desc, col("p1"), col("p2"))
        .limit(20).collect().length.toLong
    }

    spark.stop()
  }
}
