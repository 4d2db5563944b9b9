package graft.ops

import scala.collection.mutable

/** Task-local BPE trainer over a collected unit-frequency table — the
  * production-scale companion to the t28 distributed driver loop.
  *
  * Real tokenizer training (Sennrich et al. 2016; the HuggingFace /
  * SentencePiece trainers) is two-phase: ONE distributed pass counts
  * unit frequencies (the only part that touches the corpus), then the
  * merge loop iterates over that vocabulary-sized table in memory —
  * hundreds-to-thousands of merges in milliseconds, no per-merge
  * cluster jobs. This object is that second phase: the caller collects
  * the (unit, count) table (KB-sized by construction — it is a
  * vocabulary, not a corpus) and trains `maxMerges` merges with
  * incremental pair-count updates (only units whose segmentation
  * changed are re-counted).
  *
  * Merge semantics are STRING-level, deliberately identical to the t28
  * distributed loop and its DuckDB CTE replay: each merge applies a
  * leftmost non-overlapping literal replace of "l r" with "lr" on the
  * space-joined segmentation (`java.lang.String.replace` ≡ DuckDB
  * `replace` ≡ Spark `regexp_replace` of the quoted literal),
  * INCLUDING that device's boundary-substring behavior — so a prefix
  * of the learned trace is cross-engine hash-provable by the exact
  * same replay chain, and the fast path provably computes the same
  * function as the slow one. Argmax tie-break: highest weighted count,
  * then lexicographically smallest (l, r) — `ORDER BY n DESC, l, r`.
  */
object BpeTrainer {

  /** One learned merge: iteration (1-based), left/right symbol, and the
    * weighted pair count that won the argmax. */
  final case class Merge(iter: Int, l: String, r: String, n: Long)

  /** Train up to `maxMerges` merges; stops early only when no adjacent
    * pair remains (every unit fully merged to a single symbol).
    *
    * @param units distinct (unit, corpus frequency) rows
    * @return (merge trace, final space-joined segmentation per unit
    *         aligned with `units`)
    */
  def train(units: IndexedSeq[(String, Long)], maxMerges: Int)
      : (IndexedSeq[Merge], IndexedSeq[String]) = {
    val seg = Array.tabulate(units.length)(i =>
      units(i)._1.map(_.toString).mkString(" "))
    val cnt = Array.tabulate(units.length)(i => units(i)._2)
    // weighted adjacent-pair counts, maintained incrementally: a unit's
    // pairs are subtracted before and re-added after each rewrite, and
    // only units whose string actually contains the merged literal are
    // touched (everything else keeps its counts)
    val pc = mutable.HashMap.empty[(String, String), Long]
    def addPairs(s: String, c: Long, sign: Long): Unit = {
      val syms = s.split(' ')
      var j = 0
      while (j < syms.length - 1) {
        val k = (syms(j), syms(j + 1))
        val nv = pc.getOrElse(k, 0L) + sign * c
        if (nv == 0L) pc.remove(k) else pc.update(k, nv)
        j += 1
      }
    }
    var i = 0
    while (i < seg.length) { addPairs(seg(i), cnt(i), 1L); i += 1 }
    val out = mutable.ArrayBuffer.empty[Merge]
    var it = 1
    while (it <= maxMerges && pc.nonEmpty) {
      // deterministic argmax independent of map iteration order
      var bk: (String, String) = null
      var bn = Long.MinValue
      pc.foreach { case (k, v) =>
        if (v > bn || (v == bn && (k._1 < bk._1 ||
            (k._1 == bk._1 && k._2 < bk._2)))) { bk = k; bn = v }
      }
      out += Merge(it, bk._1, bk._2, bn)
      val pat = bk._1 + " " + bk._2
      val rep = bk._1 + bk._2
      var u = 0
      while (u < seg.length) {
        // string-semantics affected set: ANY substring occurrence of
        // the literal (exactly what the distributed replace rewrites)
        if (seg(u).contains(pat)) {
          addPairs(seg(u), cnt(u), -1L)
          seg(u) = seg(u).replace(pat, rep)
          addPairs(seg(u), cnt(u), 1L)
        }
        u += 1
      }
      it += 1
    }
    (out.toIndexedSeq, seg.toIndexedSeq)
  }
}
