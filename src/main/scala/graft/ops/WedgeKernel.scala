package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Chunked unordered-pair emission from a per-center adjacency — the
  * g5 common-neighbor kernel, made hub-safe (round-15 verdict ask #1).
  *
  * The round-13..15 kernel materialized ONE `Array[Long]` of
  * d(d−1)/2 packed pairs per center and `require`d degree < 46341: on
  * a power-law graph a single hub crashed the query (and even below
  * the bound, one task owned the whole hub's quadratic emission).
  * This kernel keeps the measured fast path for ordinary centers and
  * decomposes heavy ones:
  *
  *   - a cheap degree count-shuffle decides the shape first: a
  *     HUB-FREE graph (no degree > blockSize — every corpus this repo
  *     measures) keeps the round-15 ONE-PIPELINE plan verbatim, the
  *     aggregate streaming straight into the pair kernel and the
  *     explode with no checkpoint barrier (the barrier is not free:
  *     unconditional checkpointing cost the 30× decade core 884.6 s
  *     vs 337.7 s streaming, G5AB probe, identical output);
  *   - hub-free centers emit one primitive array per center, exploded
  *     by codegen, zero per-pair boxing, no new shuffle;
  *   - heavier centers slice their ASCENDING-sorted adjacency into
  *     contiguous blocks of `blockSize` and emit one row per block
  *     pair (bi ≤ bj): within-block rows carry (xs_i, ∅) and produce
  *     the i<j pairs, cross-block rows carry (xs_i, xs_j) and produce
  *     all |xs_i|·|xs_j| pairs — every element of block i is < every
  *     element of block j, so the (lo<<32)|hi packing stays canonical
  *     and the union over block pairs covers each unordered pair
  *     EXACTLY once (WedgeKernelSpec pins chunked == unchunked ==
  *     brute force). Block rows are round-robin-repartitioned to
  *     `pairs/pairsPerTask` tasks before the pair loop, so a hub of
  *     ANY degree spreads its d²/2 emission across the cluster
  *     instead of crashing (old) or serializing (one-task emission).
  *
  * Memory: per-row allocation is ≤ blockSize² packed longs (8 MB at
  * the default 1024) regardless of degree. Shuffle: the block-pair
  * decomposition moves adjacency CONTENT (2·d²/blockSize longs per
  * heavy center — 1/512 of the pair volume it unlocks at the default);
  * light centers move nothing beyond the one groupBy every adjacency
  * build pays. Degrees are bounded by `collect_list`'s 2³¹ array
  * limit long before any arithmetic here overflows (d(d−1)/2 is
  * computed in Long; per-block sizes fit Int by construction).
  */
object WedgeKernel {

  /** Default block edge: 1024² packed longs = 8 MB peak per row. */
  val DefaultBlock = 1024

  /** Per-key counts of a packed-long `pk` column, keeping keys seen at
    * least `minCount` times: hash-repartition by pk, then SORT each
    * partition's primitive longs and run-length scan — no per-key hash
    * map at all. Replaces `repartition.groupBy(pk).count()` in the g5
    * pair aggregate: with ~101M distinct keys out of 148M rows Spark's
    * HashAggregate builds a ~1.4M-entry UnsafeRow map per task and its
    * memory traffic dominated the whole query on the round-17 host
    * (G5Anatomy: 151.9 s cold / ~25 s warm for the aggregate alone vs
    * ~2 s for this kernel — the sort is a cache-friendly O(n log n)
    * over a 16 MB primitive array, the scan is sequential). Exactness:
    * hash partitioning is a TOTAL function of pk, so every copy of a
    * key lands in the same partition and each run-length is the exact
    * global count (WedgeKernelSpec pins equality with groupBy+count).
    * Partition sizing stays the caller's wedge-volume rule (~2M
    * rows/task at any scale), so the array is ~16 MB per task.
    */
  def countByKeyMin(pairs: DataFrame, nParts: Int,
      minCount: Long): DataFrame = {
    val s = pairs.sparkSession
    import s.implicits._
    pairs.repartition(nParts, col("pk"))
      .as[Long]
      .mapPartitions { it =>
        var a = new Array[Long](1 << 16)
        var n = 0
        while (it.hasNext) {
          if (n == a.length) a = java.util.Arrays.copyOf(a, a.length << 1)
          a(n) = it.next(); n += 1
        }
        java.util.Arrays.sort(a, 0, n)
        val arr = a
        val len = n
        new Iterator[(Long, Long)] {
          private var i = 0
          private var nextPair: (Long, Long) = _
          private def advance(): Unit = {
            nextPair = null
            while (i < len && nextPair == null) {
              val k = arr(i)
              var j = i + 1
              while (j < len && arr(j) == k) j += 1
              val c = (j - i).toLong
              if (c >= minCount) nextPair = (k, c)
              i = j
            }
          }
          advance()
          override def hasNext: Boolean = nextPair != null
          override def next(): (Long, Long) = {
            val r = nextPair; advance(); r
          }
        }
      }
      .toDF("pk", "common_neighbors")
  }

  /** All unordered neighbor pairs of each center in `nbr(c, x)`,
    * packed `(lo << 32) | hi` (requires non-negative ids < 2³²), one
    * row per pair in column `pk`, plus the total pair count Σd(d−1)/2
    * (callers size their downstream aggregate shuffle with it — the
    * same degree scan that makes the split decision, map-side
    * combined, so no extra adjacency-sized pass).
    */
  def pairPk(s: SparkSession, nbr: DataFrame,
      blockSize: Int = DefaultBlock,
      pairsPerTask: Long = 2000000L): (DataFrame, Long) = {
    require(blockSize >= 2 && blockSize <= 46340,
      s"blockSize $blockSize outside [2, 46340] (46341² overflows Int)")
    import s.implicits._
    // One count-shuffle prices both the total pair volume (downstream
    // shuffle sizing) and the heavy share (split decision + spread
    // sizing) BEFORE any adjacency materializes. DIV 2 is exact:
    // d(d−1) is even. coalesce: SUM/MIN/MAX over zero rows is SQL NULL.
    // count(col("x")) — not count(lit(1)) — so the priced degree drops
    // NULLs exactly like the collect_list the kernel consumes (a
    // nullable x must not misroute a light center to the heavy path).
    // min/max ride the same aggregate for free and enforce the
    // (lo<<32)|hi packing domain LOUDLY: an id outside [0, 2³²) would
    // otherwise silently collide packed keys and corrupt counts.
    val stats = nbr.groupBy("c").agg(
        count(col("x")).as("d"),
        min(col("x")).as("lo"), max(col("x")).as("hi"))
      .agg(
        coalesce(sum(expr("d * (d - 1) DIV 2")), lit(0L)).as("pairs"),
        coalesce(sum(when(col("d") > blockSize,
          expr("d * (d - 1) DIV 2")).otherwise(0L)), lit(0L)).as("heavy"),
        coalesce(min(col("lo")), lit(0L)).as("minx"),
        coalesce(max(col("hi")), lit(0L)).as("maxx"))
      .first()
    val totalPairs = stats.getLong(0)
    val heavyPairs = stats.getLong(1)
    require(stats.getLong(2) >= 0L && stats.getLong(3) < (1L << 32),
      s"pairPk ids must lie in [0, 2^32) for (lo<<32)|hi packing; " +
        s"saw [${stats.getLong(2)}, ${stats.getLong(3)}]")
    def kernel(in: DataFrame): DataFrame = in
      .as[Seq[Long]]
      .mapPartitions(_.map { xs =>
        val a = xs.toArray // sorted ascending -> packed key has lo < hi
        val out = new Array[Long](a.length * (a.length - 1) / 2)
        var k = 0
        var i = 0
        while (i < a.length) {
          var j = i + 1
          while (j < a.length) {
            out(k) = (a(i) << 32) | a(j); k += 1
            j += 1
          }
          i += 1
        }
        out
      })
      .toDF("xs")
      .select(explode(col("xs")).as("pk"))
    def adjacency(in: DataFrame): DataFrame = in.groupBy("c")
      .agg(sort_array(collect_list(col("x"))).as("xs"))
      .select(col("xs"))
    if (heavyPairs == 0L) {
      // Hub-free (every degree ≤ blockSize, and ≤ 46340 by the bound
      // above, so the single-array sizing can't overflow): keep the
      // ONE-PIPELINE plan — aggregate streams straight into the pair
      // kernel and the explode, no checkpoint barrier. The barrier is
      // not free: materializing the adjacency and re-reading it cost
      // the 30× decade core 884.6 s vs 337.7 s for this streaming
      // shape (G5AB probe, identical 4.43B-wedge output) — the
      // round-16 first cut checkpointed unconditionally and gave back
      // the whole kernel win at scale.
      (kernel(adjacency(nbr)), totalPairs)
    } else {
      // Hubs present: pay one checkpoint so the light/heavy split and
      // the block-row decomposition read a settled adjacency.
      val adj = adjacency(nbr).localCheckpoint()
      val light = kernel(adj.filter(size(col("xs")) <= blockSize))
      // Heavy centers: stream (block_i, block_j) rows, spread them,
      // then run the pair loop task-locally per block row.
      val blockRows = adj.filter(size(col("xs")) > blockSize)
        .as[Seq[Long]]
        .mapPartitions(_.flatMap { xs =>
          val a = xs.toArray
          val nb = (a.length + blockSize - 1) / blockSize
          def slice(b: Int): Array[Long] = java.util.Arrays.copyOfRange(
            a, b * blockSize, math.min((b + 1) * blockSize, a.length))
          Iterator.range(0, nb).flatMap { bi =>
            val xi = slice(bi)
            Iterator.single((xi, Array.empty[Long])) ++
              Iterator.range(bi + 1, nb).map(bj => (xi, slice(bj)))
          }
        })
      val nParts = math.max(s.sparkContext.defaultParallelism.toLong,
        math.min(4096L, heavyPairs / pairsPerTask)).toInt
      val heavy = blockRows
        .toDF("xi", "xj")
        .repartition(nParts) // round-robin: block rows are even-sized units
        .as[(Seq[Long], Seq[Long])]
        .mapPartitions(_.map { case (xiS, xjS) =>
          val xi = xiS.toArray
          if (xjS.isEmpty) {
            val out = new Array[Long](xi.length * (xi.length - 1) / 2)
            var k = 0
            var i = 0
            while (i < xi.length) {
              var j = i + 1
              while (j < xi.length) {
                out(k) = (xi(i) << 32) | xi(j); k += 1
                j += 1
              }
              i += 1
            }
            out
          } else {
            val xj = xjS.toArray
            val out = new Array[Long](xi.length * xj.length)
            var k = 0
            var i = 0
            while (i < xi.length) {
              var j = 0
              while (j < xj.length) {
                out(k) = (xi(i) << 32) | xj(j); k += 1
                j += 1
              }
              i += 1
            }
            out
          }
        })
        .toDF("xs")
        .select(explode(col("xs")).as("pk"))
      (light.unionByName(heavy), totalPairs)
    }
  }
}
