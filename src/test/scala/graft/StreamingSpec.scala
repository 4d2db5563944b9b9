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

  test("sessionCounts groups by 30-min gaps per user") {
    import spark.implicits._
    val out = EventStreams.sessionCounts(events.toDF())
      .orderBy("user_id", "session_start")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    // user 1: events at 00:05 | 00:45+01:15 (chained gap <30m) -> 2 sessions
    // user 2: 01:05 | 02:30 -> 2 sessions
    assert(out == Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 1L)))
  }
}
