package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing for the rewritten g5 at sf0.1. */
object G5Probe2 {
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

    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$tag%-30s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    val e0 = time("edges build+checkpoint") {
      val op = graft.ops.Tables.load(spark, dir, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val e = op.as("a").join(op.as("b"), Seq("o"))
        .filter(col("a.p") < col("b.p"))
        .select(col("a.p").as("p1"), col("b.p").as("p2"))
        .distinct()
        .localCheckpoint()
      e.count(); e
    }

    val nbr = e0.select(col("p1").as("c"), col("p2").as("x"))
      .unionByName(e0.select(col("p2").as("c"), col("p1").as("x")))

    val lists = nbr.groupBy("c")
      .agg(sort_array(collect_list(col("x"))).as("xs"))
      .select(col("xs")).as[Seq[Long]]

    time("adjacency lists count") { lists.count() }

    val pairPk = lists.mapPartitions(_.flatMap { xs =>
      val a = xs.toArray
      val out = new scala.collection.mutable.ArrayBuffer[Long](
        math.max(0, a.length * (a.length - 1) / 2))
      var i = 0
      while (i < a.length) {
        var j = i + 1
        while (j < a.length) { out += (a(i) << 32) | a(j); j += 1 }
        i += 1
      }
      out
    }).toDF("pk")

    time("wedge gen only (count)") { pairPk.count() }

    val agg = pairPk.groupBy("pk").agg(count(lit(1)).as("cn"))
    time("wedge gen + agg (count)") { agg.count() }

    val edgePk = e0.select(shiftleft(col("p1"), 32).bitwiseOR(col("p2")).as("pk"))
    val top = agg.filter(col("cn") >= 2)
      .join(broadcast(edgePk), Seq("pk"), "left_anti")
      .select(shiftright(col("pk"), 32).as("p1"),
        col("pk").bitwiseAND(lit(0xffffffffL)).as("p2"), col("cn"))
      .orderBy(col("cn").desc, col("p1"), col("p2")).limit(20)
    time("full pipeline (collect 20)") { top.collect().length }
    time("full pipeline again") { top.collect().length }
    spark.stop()
  }
}
// appended variants probe
object G5Probe3 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.1"
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag%-34s ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val op = graft.ops.Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val e0 = op.as("a").join(op.as("b"), Seq("o"))
      .filter(col("a.p") < col("b.p"))
      .select(col("a.p").as("p1"), col("b.p").as("p2"))
      .distinct().localCheckpoint()
    e0.count()
    val nbr = e0.select(col("p1").as("c"), col("p2").as("x"))
      .unionByName(e0.select(col("p2").as("c"), col("p1").as("x")))
    def pairPk = nbr.groupBy("c")
      .agg(sort_array(collect_list(col("x"))).as("xs"))
      .select(col("xs")).as[Seq[Long]]
      .mapPartitions(_.flatMap { xs =>
        val a = xs.toArray
        val out = new scala.collection.mutable.ArrayBuffer[Long](
          math.max(0, a.length * (a.length - 1) / 2))
        var i = 0
        while (i < a.length) {
          var j = i + 1
          while (j < a.length) { out += (a(i) << 32) | a(j); j += 1 }
          i += 1
        }
        out
      }).toDF("pk")
    for (np <- Seq(64, 128, 256)) {
      time(s"repartition($np,pk)+agg count") {
        pairPk.repartition(np, col("pk")).groupBy("pk")
          .agg(count(lit(1)).as("cn")).filter(col("cn") >= 2).count()
      }
    }
    // sort-based run-length inside kernel-partitioned stream
    time("repartition(128)+sortWithin+rle") {
      pairPk.repartition(128, col("pk"))
        .sortWithinPartitions("pk").as[Long]
        .mapPartitions { it =>
          var cur = Long.MinValue; var n = 0L
          val out = new scala.collection.mutable.ArrayBuffer[(Long, Long)]()
          while (it.hasNext) {
            val v = it.next()
            if (v == cur) n += 1
            else { if (n >= 2) out += ((cur, n)); cur = v; n = 1 }
          }
          if (n >= 2) out += ((cur, n))
          out.iterator
        }.count()
    }
    spark.stop()
  }
}
