package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Smoke-level contract tests for the full query registry: every
  * registered query must build a plan and execute on the smallest
  * testdata without throwing; names must be unique; every oracle key
  * must have a query. (Value-level correctness is the driver's DuckDB
  * gate — dev/check.py — not this spec.)
  */
class RegistrySpec extends AnyFunSuite with BeforeAndAfterAll {

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
    .appName("registry-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("query names are unique and oracle keys all resolve") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size == names.size,
      s"duplicate names: ${names.diff(names.distinct)}")
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("no oracle is null or blank (object-init forward-reference trap)") {
    // a Q val referencing a shared SQL val declared LATER in its object
    // captures Some(null) at init time and kills the WHOLE round's
    // oracle_sql.json when Verify serializes it — fail here instead
    Registry.all.foreach { q =>
      q.oracle.foreach { o =>
        assert(o != null && o.trim.nonEmpty,
          s"${q.name}: null/blank oracle — move the shared SQL val above " +
            "its first use or make it a def")
      }
    }
  }

  test("entry returns rows on sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  Registry.all.foreach { q =>
    test(s"${q.name} executes on sf0.001") {
      val df = q.fn(spark, sfDir)
      val n = df.count()
      assert(n >= 0)
      // Blanket plan audit (round 9): NO query's final plan may contain
      // an unkeyed CartesianProduct — the quadratic-blowup operator a
      // dropped join key silently buys. (Deliberate 1-row scalar
      // crossJoins plan as BroadcastNestedLoopJoin over a broadcast
      // single row, not CartesianProduct, so they stay allowed.)
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"),
        s"${q.name} plans a CartesianProduct:\n" + p.take(1500))
    }
  }
}
