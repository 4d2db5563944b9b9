package graft

import java.sql.Timestamp
import graft.streaming.EventStreams
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        System.getProperty("java.io.tmpdir") + "/graft_warehouse")
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", 2)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("streaming-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def ts(s: String) = Timestamp.valueOf(s)

  private val events = Seq(
    Ev(1, ts("2024-01-01 00:05:00"), 1, "click", 1.0),
    Ev(2, ts("2024-01-01 00:45:00"), 1, "click", 2.0),
    Ev(3, ts("2024-01-01 01:05:00"), 2, "view", 3.0),
    Ev(4, ts("2024-01-01 01:15:00"), 1, "click", 4.0),
    Ev(5, ts("2024-01-01 02:30:00"), 2, "view", 5.0))

  test("tumblingCounts over a MemoryStream equals the batch run") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(events: _*)
    val q = EventStreams.tumblingCounts(mem.toDF()).writeStream
      .format("memory").queryName("t_spec")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.sql(
      "SELECT window_start, event_type, n, sum_value FROM t_spec " +
        "ORDER BY window_start, event_type")
      .collect().map(_.toSeq).toSeq
    val batched = EventStreams.tumblingCounts(events.toDF())
      .orderBy("window_start", "event_type")
      .collect().map(_.toSeq).toSeq
    assert(streamed == batched)
    // hour 00: 2 clicks; hour 01: 1 click + 1 view; hour 02: 1 view
    assert(batched.map(r => (r(1), r(2))) ==
      Seq(("click", 2L), ("click", 1L), ("view", 1L), ("view", 1L)))
  }

  test("dedupWithinWatermark keeps one row per key within the horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    // user 1 clicks twice within the hour -> 1 survivor; the view and
    // user 2's click are distinct keys
    mem.addData(
      Ev(1, ts("2024-01-01 00:05:00"), 1, "click", 1.0),
      Ev(2, ts("2024-01-01 00:25:00"), 1, "click", 2.0),
      Ev(3, ts("2024-01-01 00:30:00"), 1, "view", 3.0),
      Ev(4, ts("2024-01-01 00:40:00"), 2, "click", 4.0))
    val q = EventStreams.dedupWithinWatermark(mem.toDF()).writeStream
      .format("memory").queryName("dd_spec")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = spark.sql(
      "SELECT user_id, event_type, count(*) AS n FROM dd_spec GROUP BY 1, 2 " +
        "ORDER BY 1, 2")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, "click", 1L), (1L, "view", 1L), (2L, "click", 1L)))
  }

  test("slidingCounts puts each event in exactly two overlapping windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(events: _*)
    val q = EventStreams.slidingCounts(mem.toDF()).writeStream
      .format("memory").queryName("sl_spec")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.sql(
      "SELECT window_start, event_type, n, sum_value FROM sl_spec " +
        "ORDER BY window_start, event_type").collect().map(_.toSeq).toSeq
    val batched = EventStreams.slidingCounts(events.toDF())
      .orderBy("window_start", "event_type").collect().map(_.toSeq).toSeq
    assert(streamed == batched)
    // every event contributes to exactly 2 windows
    assert(batched.map(_(2).asInstanceOf[Long]).sum == 2L * events.size)
  }

  test("enrichWithDim attaches static dim rows without stream state") {
    import spark.implicits._
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("cust_id", "tier")
    val out = EventStreams.enrichWithDim(events.toDF(), dim, "user_id", "cust_id")
      .groupBy("tier").count().orderBy("tier")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("gold", 3L), ("silver", 2L)))
  }

  test("runningUserTotals accumulates state across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStreams.runningUserTotals(mem.toDF()).writeStream
      .format("memory").queryName("st_spec")
      .outputMode("update")
      .start()
    mem.addData(events.take(2): _*) // user 1: 2 events, 3.0 total
    q.processAllAvailable()
    mem.addData(events.drop(2): _*) // +1 user-1 event, 2 user-2 events
    q.processAllAvailable()
    q.stop()
    // the LAST update per user reflects state carried across batches
    val out = spark.sql(
      """SELECT user_id, n_events, total_value FROM (
           SELECT *, row_number() OVER (PARTITION BY user_id
             ORDER BY n_events DESC) AS rk FROM st_spec)
         WHERE rk = 1 ORDER BY user_id""")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(out == Seq((1L, 3L, 7.0), (2L, 2L, 8.0)))
  }

  test("runningUserTotalsTws (transformWithState) carries state like " +
      "flatMapGroupsWithState") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // transformWithState requires the RocksDB state store provider
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[Ev]
      val q = EventStreams.runningUserTotalsTws(mem.toDF()).writeStream
        .format("memory").queryName("tws_spec")
        .outputMode("update")
        .start()
      mem.addData(events.take(2): _*) // user 1: 2 events, 3.0 total
      q.processAllAvailable()
      mem.addData(events.drop(2): _*) // +1 user-1 event, 2 user-2 events
      q.processAllAvailable()
      q.stop()
      val out = spark.sql(
        """SELECT user_id, n_events, total_value FROM (
             SELECT *, row_number() OVER (PARTITION BY user_id
               ORDER BY n_events DESC) AS rk FROM tws_spec)
           WHERE rk = 1 ORDER BY user_id""")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(out == Seq((1L, 3L, 7.0), (2L, 2L, 8.0)))
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("foreachBatch sink lands every micro-batch in parquet with batch ids") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files
      .createTempDirectory("graft_fb").toString + "/agg"
    val mem = MemoryStream[Ev]
    val q = EventStreams.sinkViaForeachBatch(
      EventStreams.tumblingCounts(mem.toDF()), out).start()
    mem.addData(events.take(2): _*)
    q.processAllAvailable()
    mem.addData(events.drop(2): _*)
    q.processAllAvailable()
    q.stop()
    val landed = spark.read.parquet(out)
    // both micro-batches landed, tagged distinctly
    assert(landed.select("batch_id").distinct().count() == 2)
    // the LAST update per (window, type) equals the batch answer
    val last = landed
      .withColumn("rk", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("window_start", "event_type")
          .orderBy(org.apache.spark.sql.functions.col("batch_id").desc)))
      .filter($"rk" === 1)
      .select("window_start", "event_type", "n", "sum_value")
      .orderBy("window_start", "event_type")
      .collect().map(_.toSeq).toSeq
    val batched = EventStreams.tumblingCounts(events.toDF())
      .orderBy("window_start", "event_type")
      .collect().map(_.toSeq).toSeq
    assert(last == batched)
  }

  test("sessionCounts groups by 30-min gaps per user") {
    import spark.implicits._
    val out = EventStreams.sessionCounts(events.toDF())
      .orderBy("user_id", "session_start")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    // user 1: events at 00:05 | 00:45+01:15 (chained gap <30m) -> 2 sessions
    // user 2: 01:05 | 02:30 -> 2 sessions
    assert(out == Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 1L)))
  }

  test("watermark BOUNDS state-store size: rows plateau under the 1-hour " +
      "horizon and grow without end when no watermark is set") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    // 12 micro-batches, each one event in a NEW hour window — so a
    // stream that keeps every window accumulates 12 state rows, while
    // the 1-hour watermark (e17 proves its drop semantics; this proves
    // its STATE contract, the property that matters at 100 TB) retains
    // only the windows still inside the horizon.
    def run(withWm: Boolean): Seq[Long] = {
      val mem = MemoryStream[Ev]
      val agg =
        if (withWm) EventStreams.tumblingCounts(mem.toDF())
        else mem.toDF()
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"))
      val q = agg.writeStream.format("memory")
        .queryName(s"state_probe_$withWm")
        .outputMode(if (withWm) "update" else "complete")
        .start()
      val sizes = (0 until 12).map { h =>
        mem.addData(Ev(h, ts(f"2024-01-01 $h%02d:15:00"), h, "click", 1.0))
        q.processAllAvailable()
        q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      }
      q.stop()
      sizes
    }
    val bounded = run(withWm = true)
    val unbounded = run(withWm = false)
    info(s"state rows with 1h watermark: ${bounded.mkString(",")}")
    info(s"state rows without watermark: ${unbounded.mkString(",")}")
    // no watermark: every hour window stays in the store forever
    assert(unbounded.last >= 12L, unbounded.mkString(","))
    // watermark: eviction keeps only the horizon (plus the one-batch
    // lag with which the watermark trails event time)
    assert(bounded.max <= 4L, bounded.mkString(","))
    assert(bounded.last <= 4L, bounded.mkString(","))
  }

  test("data-derived state estimates reproduce the r13 hand estimates' " +
      "partition counts at proof scale") {
    import graft.streaming.{StateEstimates => SE, StatePartitioning => SP}
    // Each streaming proof row's StatePartitioning input is now computed
    // from the batch-side table (SURVEY §2.9 / EventQueries call-sites).
    // The round-13 hand estimates at proof scale were 0–7000 rows, all of
    // which the rule maps to its floor of 4 — the derived values must
    // land on the same pin, and each must be a sane non-degenerate count.
    val derived = Map(
      "hour_windows (e10/e17/e38)" -> SE.hourWindowKeys(spark, sfDir),
      "sessions (e11)" -> SE.sessionCount(spark, sfDir),
      "user keys (e14/e18)" -> SE.approxKeys(spark, sfDir, "user_id"),
      "dedup keys (e20)" ->
        SE.approxKeys(spark, sfDir, "concat(user_id, '|', event_type)"),
      "join buffer (e19/e24)" ->
        SE.joinBufferRows(spark, sfDir, Seq("click", "purchase")),
      "sketch keys (e39)" -> SE.approxKeys(spark, sfDir, "event_type"),
      "bloom keys (e40)" ->
        SE.approxKeys(spark, sfDir, "source", table = "documents"))
    derived.foreach { case (site, rows) =>
      info(f"$site%-28s -> $rows rows -> ${SP.forExpectedState(rows)} parts")
      assert(rows > 0L, s"$site derived a degenerate state estimate")
      assert(SP.forExpectedState(rows) == 4,
        s"$site: derived $rows rows no longer lands on the floor pin " +
          "the r13 hand estimates produced at proof scale")
    }
    // the estimates stay ordered the way the state shapes are nested:
    // per-(user,type) dedup keys >= per-user keys >= per-type sketch
    // keys. Assert the ordering on EXACT distinct counts — the
    // production estimators stay approximate (HLL++ ±2% is the right
    // trade there), but two approx counts of CLOSE cardinalities could
    // invert the ordering at proof scale and flake the test.
    def exactKeys(keyExpr: String): Long =
      graft.ops.Tables.load(spark, sfDir, "events")
        .selectExpr(s"count(DISTINCT $keyExpr) AS k").first().getLong(0)
    val exDedup = exactKeys("concat(user_id, '|', event_type)")
    val exUser = exactKeys("user_id")
    val exSketch = exactKeys("event_type")
    assert(exDedup >= exUser && exUser >= exSketch)
    // stateless passthroughs pin the floor by definition
    assert(SP.forExpectedState(0L) == 4)
  }
}
