package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** FIXED-POINT PageRank — graph importance scoring (link-graph quality /
  * spam signals for web-scale corpus curation) with bit-deterministic
  * arithmetic at any parallelism.
  *
  * The usual PageRank is double-valued, and a distributed sum of doubles
  * depends on reduction order — two runs (or two engines) can disagree in
  * the last ulps, which poisons hash verification and makes regressions
  * undetectable. Here ranks are BIGINT micro-units (1.0 = [[Scale]]):
  *  - each node starts at `Scale`;
  *  - a node with out-degree d contributes floor(r · 85 / (d · 100))
  *    to each out-neighbour (damping 0.85 folded into the integer
  *    floor — all operands stay < 2^53, so the IEEE division is exact
  *    enough that floor is identical on every engine);
  *  - the new rank is 0.15 · Scale + the contribution sum — a sum of
  *    LONGS, exact and associative, so map-side combine, AQE
  *    re-partitioning, and any executor count give the SAME bits.
  *
  * Scale shape per iteration: one equi-join of the edge list against the
  * node-cardinality rank table (shuffle keyed on src — or a broadcast of
  * ranks when nodes ≪ edges) and one dst-keyed map-side-combined sum.
  * `localCheckpoint` truncates lineage per round (the d9 lesson:
  * re-analysis of a growing plan dwarfs execution otherwise). Driver
  * state: nothing — ranks stay distributed.
  */
object PageRank {
  /** Fixed-point unit: rank 1.0 ≡ 1e9 micro-units. */
  val Scale = 1000000000L
  /** Per-node teleport mass: 0.15 · Scale. */
  val Base = 150000000L

  /** Run `iters` rounds over a directed edge list (`src`, `dst`).
    * Every node is assumed to have at least one out-edge (callers
    * symmetrize bipartite graphs, which also removes dangling nodes);
    * nodes therefore all appear in the degree table, which doubles as
    * the rank-vector domain. Returns (`node`, `pr`) — micro-unit ranks.
    */
  def run(edges: DataFrame, iters: Int): DataFrame = {
    val withDeg = edges
      .join(edges.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
      .persist(StorageLevel.MEMORY_AND_DISK)
    var ranks = withDeg.select(col("src").as("node")).distinct()
      .withColumn("r", lit(Scale))
    for (_ <- 1 to iters) {
      ranks = withDeg
        .join(ranks, col("src") === col("node"))
        .select(col("dst"),
          floor(col("r") * lit(85L) / (col("outdeg") * lit(100.0)))
            .as("c"))
        .groupBy("dst")
        .agg((lit(Base) + sum("c")).as("r"))
        .select(col("dst").as("node"), col("r"))
        .localCheckpoint()
    }
    withDeg.unpersist()
    ranks.select(col("node"), col("r").as("pr"))
  }
}
