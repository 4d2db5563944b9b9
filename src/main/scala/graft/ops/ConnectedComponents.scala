package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over a symmetric edge list — the
  * clustering step of the dedup family (d9/d10 turn pairwise near-dup
  * matches into survivor groups).
  *
  * The algorithm is two-phase min-label propagation with per-round
  * POINTER JUMPING (the "shortcut" of large-star/small-star-style CC):
  * each round first takes the minimum label over the 1-hop
  * neighborhood (one equi-join shuffle + map-side-combined min), then
  * jumps every vertex to its label's OWN label (a second equi-join) —
  * so label chains halve every round and convergence is O(log d) in
  * the component diameter d instead of the O(d) of plain propagation.
  * Near-dup components are usually tiny cliques where both finish in
  * 2-3 rounds; the escalation matters for adversarially chain-shaped
  * graphs (A~B~C~…), where plain min-label needs d rounds — measured
  * in ConnectedComponentsSpec: a 4096-vertex chain converges in 13
  * rounds, not 4095.
  *
  * Scale shape: every round is two equi-join shuffles keyed on vertex
  * id, each `localCheckpoint`ed so Catalyst re-plans a constant-size
  * tree per round instead of the whole growing lineage (the d9
  * lesson). The label-sum fixpoint test is one partial-aggregable
  * scalar per round. A giant component's min label becomes a frequent
  * VALUE but never a join KEY hot spot: both joins key on doc_id,
  * whose distribution the graph fixes, and the min aggregate combines
  * map-side.
  */
object ConnectedComponents {

  /** Labels every vertex of `edgesSym` with its component's minimum
    * vertex id. `edgesSym` must be symmetric (both (a,b) and (b,a)
    * present) with columns (doc_a, doc_b); isolated vertices (no
    * edges) don't appear. Returns (labels(doc_id, lbl), rounds).
    */
  def minLabel(edgesSym: DataFrame, maxRounds: Int = 64)
      : (DataFrame, Int) = {
    val edges = edgesSym.select("doc_a", "doc_b").localCheckpoint()
    var labels = edges.select(col("doc_a").as("doc_id")).distinct()
      .withColumn("lbl", col("doc_id"))
      .localCheckpoint()
    // Convergence metric aggregated as DECIMAL(38,0): labels are vertex
    // ids, and at billion-scale 64-bit ids a Long sum can overflow and
    // wrap — two DISTINCT label states could then compare equal and
    // fake convergence. 38 decimal digits hold any sum of 2^63-sized
    // ids over < 10^19 vertices exactly.
    def lblSum(df: DataFrame): java.math.BigDecimal =
      df.agg(coalesce(sum(col("lbl").cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)"))).first().getDecimal(0)
    var prevSum = lblSum(labels)
    var converged = false
    var rounds = 0
    // with pointer jumping the round count is O(log d); the cap is a
    // bug guard only — hitting it means labels are NOT component
    // minima, which must fail loudly, not ship silently
    while (!converged && rounds < maxRounds) {
      val nbrMin = edges
        .join(labels.withColumnRenamed("doc_id", "doc_b"), Seq("doc_b"))
        .groupBy(col("doc_a").as("doc_id"))
        .agg(min("lbl").as("nlbl"))
      val cand = labels.join(nbrMin, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"))
      // pointer jump: lbl(v) <- lbl(lbl(v)). Every label value is a
      // vertex id (initialized to self, propagated as mins of vertex
      // ids), so it has a row in cand; labels only decrease, hence
      // the jump target is <= the current label.
      val jumped = cand.as("c")
        .join(cand.select(col("doc_id").as("lbl"),
          col("lbl").as("lbl2")).as("t"), Seq("lbl"), "left")
        .select(col("doc_id"),
          least(col("lbl"), coalesce(col("lbl2"), col("lbl"))).as("lbl"))
        .localCheckpoint()
      val curSum = lblSum(jumped)
      labels = jumped
      converged = curSum.compareTo(prevSum) == 0
      prevSum = curSum
      rounds += 1
    }
    require(converged,
      s"connected-components did not converge within $maxRounds rounds")
    (labels, rounds)
  }
}
