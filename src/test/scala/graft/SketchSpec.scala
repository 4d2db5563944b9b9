package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Error bounds for the sketch aggregates: no cross-engine oracle
  * exists for approximate results, so correctness here means "within
  * the sketch's advertised error of the exact answer".
  */
class SketchSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        System.getProperty("java.io.tmpdir") + "/graft_warehouse")
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .appName("sketch-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("sk1 approximations stay within error bounds of the exact answers") {
    // select by NAME: sk1 also carries exact/rel-err diagnostic columns
    val approx = SparkEntry.queries("sk1_approx_sketches")(spark, sfDir)
      .select("o_orderpriority", "approx_custs", "approx_median_price",
        "approx_p95_price")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val exact = graft.ops.Tables.load(spark, sfDir, "orders")
      .groupBy("o_orderpriority")
      .agg(countDistinct("o_custkey").as("custs"),
        expr("percentile(o_totalprice, 0.5)").as("median"),
        expr("percentile(o_totalprice, 0.95)").as("p95"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, (c, med, p95)) =>
      val (ac, amed, ap95) = approx(k)
      assert(math.abs(ac - c).toDouble / c < 0.05,
        s"$k: approx_count_distinct $ac vs exact $c")
      assert(math.abs(amed - med) / med < 0.05,
        s"$k: approx median $amed vs exact $med")
      assert(math.abs(ap95 - p95) / p95 < 0.05,
        s"$k: approx p95 $ap95 vs exact $p95")
    }
  }
}
