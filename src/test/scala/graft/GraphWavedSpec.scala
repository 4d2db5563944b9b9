package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Wave-staged exact g5 (round 17): the K-wave driver loop must return
  * EXACTLY the one-shot plan's rows. pk = (p1<<32)|p2 is a total key
  * of the pair, so a residue class `pk % K = w` holds every wedge of
  * its pairs and none of any other pair's — per-wave counts are
  * complete and the global top-20 is the best 20 of the K disjoint
  * exact top-20s. Proven here on the real sf0.001 co-purchase graph
  * for K in {2, 3, 7} (including a K that does not divide the pair
  * count evenly), plus the co-edge MATERIALIZED-VIEW read path:
  * coEdges against a dir carrying co_edges.parquet must reproduce the
  * derived edge set exactly (the decade probe's g5b floor shave).
  */
class GraphWavedSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .appName("graph-waved-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val dir = "/root/testdata/sf0.001"

  test("waved g5 == one-shot g5 for K in {2, 3, 7}") {
    val oneShot = graft.queries.GraphQueries.g5Exact(spark, dir, 1)
      .collect().toSeq
    assert(oneShot.size == 20)
    for (k <- Seq(2, 3, 7)) {
      val waved = graft.queries.GraphQueries.g5Exact(spark, dir, k)
        .collect().toSeq
      assert(waved.size == oneShot.size, s"K=$k row count")
      oneShot.zip(waved).foreach { case (a, b) =>
        assert(a.getLong(0) == b.getLong(0) &&
          a.getLong(1) == b.getLong(1) &&
          a.getLong(2) == b.getLong(2), s"K=$k: $a != $b")
      }
    }
  }

  test("co-edge MV read path == derived edge set") {
    import org.apache.spark.sql.functions._
    val mvDir = java.nio.file.Files
      .createTempDirectory("graft_coedges_mv").toString
    // a dataset dir containing ONLY the MV: lineitem links to the real
    // testdata so the derivation baseline stays comparable
    java.nio.file.Files.createSymbolicLink(
      java.nio.file.Paths.get(s"$mvDir/lineitem.parquet"),
      java.nio.file.Paths.get(s"$dir/lineitem.parquet"))
    val derived = graft.queries.GraphQueries.coEdges(spark, mvDir)
    derived.write.parquet(s"$mvDir/co_edges.parquet")
    val viaMv = graft.queries.GraphQueries.coEdges(spark, mvDir)
      .orderBy("p1", "p2").collect().toSeq
    val direct = derived.orderBy("p1", "p2").collect().toSeq
    assert(viaMv.nonEmpty && viaMv == direct)
    // and the flagship consumer agrees end-to-end
    val g5Mv = graft.queries.GraphQueries.g5Exact(spark, mvDir, 1)
      .collect().toSeq
    val g5Plain = graft.queries.GraphQueries.g5Exact(spark, dir, 1)
      .collect().toSeq
    assert(g5Mv == g5Plain)
  }
}
