package graft.streaming

/** Streaming shuffle-partition sizing rule, encoding the ScaleProbe
  * `streamparts` measurement (SURVEY §8): every stateful operator
  * loads+commits ONE state store per shuffle partition per micro-batch,
  * the per-store commit cost is ~fixed, and measured wall time is
  * ~LINEAR in partition count far past proof scale (e24-shaped join:
  * 9.6/12.6/27.6/52.4 s at parts 4/8/16/32 on 200k rows; still
  * 44.6/69.8/144.4/150.9 s at 1.6M rows). So streaming shuffle
  * partitions must track expected STATE volume — how many rows the
  * stores must hold within the watermark horizon — not batch-side CPU
  * width, and should be as FEW as state capacity allows.
  *
  * The capacity bound: the default HDFS-backed store keeps each
  * partition's state map on-heap and snapshots it per commit, so
  * per-store state is kept under ~2M rows (≈ low hundreds of MB for
  * typical key+agg rows); past that, more partitions are the fix the
  * rule prescribes. Lower clamp of 4 keeps minimal parallelism for the
  * batch-side compute attached to the shuffle; upper clamp is the
  * cluster's width budget (a 1000-executor job raises it — the rule
  * still holds because partitions scale with state, not data rate).
  */
object StatePartitioning {

  /** Measured amortization bound: rows one store carries comfortably. */
  val maxRowsPerStore: Long = 2000000L

  /** Floor: minimal batch-side parallelism even for tiny state. */
  val minPartitions: Int = 4

  /** Derive the shuffle-partition pin from expected state rows (keys ×
    * windows-in-horizon, or buffered join rows in the time-range bound).
    * Rounds up to a power of two so AQE-style coalescing and checkpoint
    * re-use behave predictably across estimate drift.
    */
  def forExpectedState(expectedStateRows: Long, maxPartitions: Int = 4096): Int = {
    val needed = math.max(1L,
      (expectedStateRows + maxRowsPerStore - 1) / maxRowsPerStore)
    var p = minPartitions
    while (p < needed && p < maxPartitions) p <<= 1
    math.min(p, maxPartitions)
  }
}
