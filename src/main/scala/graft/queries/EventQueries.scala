package graft.queries

import graft.Q
import graft.ops.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Event-stream analytics over the `events` table (event_id, ts,
  * user_id, event_type, value, props). The reference is pure batch
  * (SURVEY.md §2.9), so these express the classic streaming shapes —
  * tumbling windows, sessionization, rates — as batch queries; the same
  * logic runs under Structured Streaming by swapping read→readStream
  * (see graft.streaming). At scale each query shuffles only on its
  * aggregation key (event_type / user_id), never the raw event rows
  * more than once.
  */
object EventQueries {

  /** Tumbling 1-hour window aggregation — Spark's native `window()`
    * operator; the batch analogue of a streaming windowed count.
    */
  private val e1 = Q(
    "e1_tumbling_window",
    (s, dir) => {
      Tables.load(s, dir, "events")
        .groupBy(col("event_type"),
          window(col("ts"), "1 hour").getField("start").as("hour_window"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
        .orderBy("event_type", "hour_window")
    },
    Some("""SELECT event_type, date_trunc('hour', ts) AS hour_window,
                   count(*) AS n, round(sum(value), 4) AS sum_value
            FROM events GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Sessionization: a new session starts after a >30-min silence per
    * user. lag-gap flag + running sum = session id — the batch analogue
    * of a streaming session window / mapGroupsWithState.
    */
  private val e2 = Q(
    "e2_sessionize",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.load(s, dir, "events")
        .withColumn("ts_us", unix_micros(col("ts")))
        .withColumn("gap", col("ts_us") - lag("ts_us", 1).over(w))
        .withColumn("new_sess",
          when(col("gap").isNull || col("gap") > 1800000000L, 1).otherwise(0))
        .withColumn("session_id", sum("new_sess").over(wRun))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          min("ts_us").as("session_start"),
          (max("ts_us") - min("ts_us")).as("duration_us"))
        .orderBy("user_id", "session_id")
    },
    Some("""WITH g AS (
              SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                       OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                     THEN 1 ELSE 0 END AS new_sess
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
            sess AS (
              SELECT user_id, ts_us,
                CAST(sum(new_sess) OVER (PARTITION BY user_id
                  ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
                  AS session_id
              FROM g)
            SELECT user_id, session_id, count(*) AS n_events,
                   min(ts_us) AS session_start,
                   max(ts_us) - min(ts_us) AS duration_us
            FROM sess GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Semi-structured props: JSON field extraction + typed aggregation
    * (get_json_object stays inside codegen — no UDF).
    */
  private val e3 = Q(
    "e3_json_props",
    (s, dir) => {
      Tables.load(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy("event_type")
        .agg(round(avg("k"), 4).as("avg_k"),
          max("k").as("max_k"), count(lit(1)).as("n"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type,
                   round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 4)
                     AS avg_k,
                   max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k,
                   count(*) AS n
            FROM events GROUP BY 1 ORDER BY 1"""))

  /** Per-user activity profile: pivot event_type counts to a wide
    * feature row (values pinned — no extra distinct job at scale).
    */
  private val e4 = Q(
    "e4_user_activity_pivot",
    (s, dir) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val piv = Tables.load(s, dir, "events")
        .groupBy("user_id")
        .pivot("event_type", types)
        .agg(count(lit(1)))
      types.foldLeft(piv)((df, t) =>
          df.withColumn(t, coalesce(col(t), lit(0L))))
        .orderBy("user_id")
    },
    Some("""SELECT user_id,
                   count(CASE WHEN event_type='click' THEN 1 END) AS click,
                   count(CASE WHEN event_type='error' THEN 1 END) AS error,
                   count(CASE WHEN event_type='purchase' THEN 1 END) AS purchase,
                   count(CASE WHEN event_type='signup' THEN 1 END) AS signup,
                   count(CASE WHEN event_type='view' THEN 1 END) AS view
            FROM events GROUP BY 1 ORDER BY 1"""))

  /** Daily event rate + 7-day trailing moving average per type — the
    * two-level (pre-aggregate, then window over the small rollup)
    * pattern that keeps the window cheap at 100 TB.
    */
  private val e5 = Q(
    "e5_daily_moving_avg",
    (s, dir) => {
      val w = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(-6, Window.currentRow)
      Tables.load(s, dir, "events")
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
        .withColumn("ma7", round(avg("n").over(w), 4))
        .orderBy("event_type", "day")
    },
    Some("""SELECT event_type, day, n,
                   round(avg(n) OVER (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS ma7
            FROM (
              SELECT event_type, date_trunc('day', ts) AS day, count(*) AS n
              FROM events GROUP BY 1, 2)
            ORDER BY 1, 2"""))

  def all: Seq[Q] = Seq(e1, e2, e3, e4, e5)
}
