package graft.ops

import scala.collection.mutable

/** Unigram-LM (SentencePiece-style) tokenizer training — BPE's sibling
  * (Kudo 2018, "Subword Regularization"): seed a substring vocabulary,
  * then EM — E-step segments every word with the current piece
  * probabilities (Viterbi over the piece lattice), M-step re-estimates
  * each piece's probability from its usage, and pieces that fall out of
  * every argmax decay to a floor probability (soft prune).
  *
  * Replayability design (the t32 oracle replays the trace in DuckDB):
  *   - scores are PRODUCTS of probabilities, multiplied LEFT-TO-RIGHT —
  *     no log/exp, so both engines' IEEE doubles are bit-identical
  *     (correctly-rounded mul/div only);
  *   - the E-step argmax is made a TOTAL order: score desc, then FEWER
  *     pieces, then smaller split-boundary bitmask. All three decompose
  *     prefix-monotonically (suffix multiplies the same positive factor,
  *     adds the same piece count, adds only higher mask bits), so the
  *     Viterbi winner provably equals the full-enumeration argmax the
  *     SQL replay computes — UnigramLmSpec checks that equivalence
  *     exhaustively on randomized vocabularies;
  *   - unused pieces keep a 1e-20 floor probability instead of 0, so no
  *     path scores to exact 0 (a 0 would collapse the score order and
  *     break the prefix decomposition).
  *
  * Scale: exactly t31's two-phase posture — the corpus is touched by
  * ONE distributed pass that builds the unit-frequency table
  * (vocabulary-sized shuffle); training runs task-local over the
  * collected KB-sized table (bounded driver state, documented at the
  * call-site).
  */
object UnigramLm {

  final case class TraceRow(iter: Int, piece: String, cnt: Long, prob: Double)

  /** The 1e-20 floor keeps every lattice edge strictly positive; 12
    * floored edges (the max word length the replay bounds) still sit at
    * 1e-240, far above double underflow.
    */
  val floorProb: Double = 1e-20

  /** Seed vocabulary: every substring occurrence of length 2..maxPieceLen
    * weighted by word count, kept top-`seedTopK` by (count desc, piece
    * asc) — plus ALL single characters (the segmentation fallback that
    * guarantees every word stays representable).
    */
  def seed(words: IndexedSeq[(String, Long)], maxPieceLen: Int,
      seedTopK: Int): IndexedSeq[(String, Long)] = {
    val sub = mutable.HashMap.empty[String, Long]
    for {
      (w, c) <- words
      s <- 0 until w.length
      e <- (s + 1) to math.min(w.length, s + maxPieceLen)
    } {
      val p = w.substring(s, e)
      sub.update(p, sub.getOrElse(p, 0L) + c)
    }
    val multi = sub.iterator.filter(_._1.length >= 2).toIndexedSeq
      .sortBy { case (p, c) => (-c, p) }.take(seedTopK)
    val chars = sub.iterator.filter(_._1.length == 1).toIndexedSeq
      .sortBy(_._1)
    multi ++ chars
  }

  /** E-step argmax segmentation: Viterbi DP over end positions with the
    * (score desc, pieces asc, mask asc) total order. Score multiplies
    * left-to-right, matching the replay's path-builder association.
    */
  def viterbi(w: String, pm: collection.Map[String, Double],
      maxPieceLen: Int): Seq[String] = {
    val n = w.length
    // The tie-break mask is one bit per split boundary in a Long;
    // `1L << e` wraps mod 64, so boundary 64+ would COLLIDE with
    // boundary 0+ and silently break the (score, pieces, mask) total
    // order that makes segmentation replayable. Fail loudly like the
    // unsegmentable case (t32's corpus cap is 12 chars; anything near
    // 64 is not a word, it's unsplit garbage the caller should chunk).
    require(n <= 64,
      s"viterbi: word of length $n exceeds the 64-boundary tie-break " +
        "mask — pre-chunk inputs longer than 64 chars")
    val score = Array.fill(n + 1)(-1.0) // -1 = unreachable
    val np = new Array[Int](n + 1)
    val mask = new Array[Long](n + 1)
    val back = new Array[Int](n + 1)
    score(0) = 1.0
    var e = 1
    while (e <= n) {
      var s = math.max(0, e - maxPieceLen)
      while (s < e) {
        if (score(s) >= 0) {
          pm.get(w.substring(s, e)) match {
            case Some(p) =>
              val sc = score(s) * p
              val m = mask(s) | (if (e < n) 1L << e else 0L)
              val k = np(s) + 1
              val better = score(e) < 0 || sc > score(e) ||
                (sc == score(e) &&
                  (k < np(e) || (k == np(e) && m < mask(e))))
              if (better) {
                score(e) = sc; np(e) = k; mask(e) = m; back(e) = s
              }
            case None => ()
          }
        }
        s += 1
      }
      e += 1
    }
    require(score(n) >= 0, s"unsegmentable word '$w' — seed chars missing")
    val out = mutable.ListBuffer.empty[String]
    var pos = n
    while (pos > 0) {
      val s = back(pos)
      w.substring(s, pos) +=: out
      pos = s
    }
    out.toSeq
  }

  /** Run `iters` EM rounds and return the top-`top` (count desc, piece
    * asc) rows of each round's re-estimated vocabulary — the
    * piece-probability trace the oracle replays.
    */
  def train(words: IndexedSeq[(String, Long)], maxPieceLen: Int = 6,
      seedTopK: Int = 500, iters: Int = 3, top: Int = 10): Seq[TraceRow] = {
    var vocab: IndexedSeq[(String, Long)] = seed(words, maxPieceLen, seedTopK)
    val out = Seq.newBuilder[TraceRow]
    for (it <- 1 to iters) {
      vocab = emStep(words, vocab, maxPieceLen)
      val newTotal = vocab.iterator.map(_._2).sum
      vocab.sortBy { case (p, c) => (-c, p) }.take(top).foreach {
        case (p, c) => out += TraceRow(it, p, c, c.toDouble / newTotal)
      }
    }
    out.result()
  }

  /** One EM round: build piece probabilities from the current counts
    * (floor for unused pieces), Viterbi-segment every word, recount.
    */
  private def emStep(words: IndexedSeq[(String, Long)],
      vocab: IndexedSeq[(String, Long)],
      maxPieceLen: Int): IndexedSeq[(String, Long)] = {
    val pm = probs(vocab)
    val usage = mutable.HashMap.empty[String, Long]
    for ((w, wc) <- words; p <- viterbi(w, pm, maxPieceLen))
      usage.update(p, usage.getOrElse(p, 0L) + wc)
    vocab.map { case (p, _) => p -> usage.getOrElse(p, 0L) }
  }

  /** Counts → segmentation probabilities, exactly as the E-step builds
    * them: c/total, with the strictly-positive floor for c = 0 (soft
    * prune). This is the map to broadcast when APPLYING a trained
    * table (t33's corpus encode).
    */
  def probs(vocab: IndexedSeq[(String, Long)]): Map[String, Double] = {
    val total = vocab.iterator.map(_._2).sum
    vocab.iterator.map { case (p, c) =>
      p -> (if (c == 0L) floorProb else c.toDouble / total)
    }.toMap
  }

  /** Train and return the FINAL vocabulary counts (the state after
    * `iters` M-steps — the same table whose per-round top rows `train`
    * traces; t33 broadcasts `probs(trainFinal(...))` to encode).
    */
  def trainFinal(words: IndexedSeq[(String, Long)], maxPieceLen: Int = 6,
      seedTopK: Int = 500, iters: Int = 3): IndexedSeq[(String, Long)] = {
    var vocab: IndexedSeq[(String, Long)] = seed(words, maxPieceLen, seedTopK)
    for (_ <- 1 to iters) vocab = emStep(words, vocab, maxPieceLen)
    vocab
  }
}
