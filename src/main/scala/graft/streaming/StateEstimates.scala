package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-derived inputs for [[StatePartitioning.forExpectedState]].
  *
  * Round 13 turned the streaming shuffle-partition pins into the
  * measured StatePartitioning rule, but every call-site still SUPPLIED
  * the rule's input — a hand-estimated expected-state row count. These
  * estimators close that last manual knob: each streaming proof row now
  * computes its expected state from the batch-side table it replays,
  * with the estimator chosen by the operator's state shape:
  *
  *  - keyed aggregate        → distinct live keys ([[approxKeys]],
  *                             [[hourWindowKeys]] for hour buckets)
  *  - session windows        → merged-session count ([[sessionCount]])
  *  - stream-stream join     → buffered rows on both sides
  *                             ([[joinBufferRows]])
  *  - stateless passthrough  → 0 (the rule floor; foreachBatch sinks,
  *                             checkpoint/offset proofs, broadcast
  *                             stream-static joins keep no keyed state)
  *
  * Every estimator is ONE cheap aggregate pass over the replayed
  * table — O(scan) with a scalar result, the same cost class as the
  * min/max bounds the proof rows already compute for staging — so at
  * 100 TB the sizing step is a footnote next to the stream itself, and
  * the partition count tracks the DATA (state volume) instead of a
  * comment that goes stale when the corpus grows.
  * approx_count_distinct (HLL++) is deliberate: ±2% error is free
  * precision for an input the rule only reads in powers of two.
  */
object StateEstimates {

  /** Distinct values of `keyExpr` over the table — the state row count
    * of a keyed aggregate / dedup whose live keys are the whole replay's
    * key universe (AvailableNow delivers everything as batch 0, so no
    * eviction shrinks the peak below this).
    */
  def approxKeys(s: SparkSession, dir: String, keyExpr: String,
      table: String = "events"): Long =
    graft.ops.Tables.load(s, dir, table)
      .selectExpr(s"approx_count_distinct($keyExpr) AS k")
      .first().getLong(0)

  /** Live tumbling-window keys for the hour-window aggregates
    * (tumblingCounts and its append/update variants): distinct
    * (event_type, hour-bucket) pairs — keys × windows-in-horizon where
    * the replay's horizon is the table's whole time span.
    */
  def hourWindowKeys(s: SparkSession, dir: String): Long =
    approxKeys(s, dir, "concat(event_type, '|', date_trunc('HOUR', ts))")

  /** Session-window state: one state row per merged session. The bound
    * is the batch sessionization's session-start count (first event per
    * user, or gap ≥ `gapMinutes`) — one window pass over events, and an
    * upper bound on live sessions at any point of the replay.
    */
  def sessionCount(s: SparkSession, dir: String, gapMinutes: Int = 30): Long = {
    val w = Window.partitionBy("user_id").orderBy("ts")
    graft.ops.Tables.load(s, dir, "events")
      .withColumn("prev", lag("ts", 1).over(w))
      .filter(col("prev").isNull ||
        unix_micros(col("ts")) - unix_micros(col("prev")) >=
          gapMinutes * 60L * 1000000L)
      .count()
  }

  /** Buffered stream-stream join rows: both sides hold every row until
    * the watermark passes its eviction deadline, and the AvailableNow
    * replay delivers the whole table as batch 0 — so peak state is the
    * combined row count of the filtered sides.
    */
  def joinBufferRows(s: SparkSession, dir: String,
      eventTypes: Seq[String]): Long =
    graft.ops.Tables.load(s, dir, "events")
      .filter(col("event_type").isin(eventTypes: _*))
      .count()
}
