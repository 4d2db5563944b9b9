package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.UnigramLm

/** Unit spec for the unigram-LM EM trainer — most importantly the
  * replayability theorem the t32 oracle rests on: the Viterbi DP winner
  * under the (score desc, pieces asc, boundary-mask asc) total order
  * equals the FULL-ENUMERATION argmax (what the DuckDB recursive CTE
  * computes), checked exhaustively on randomized vocabularies.
  */
class UnigramLmSpec extends AnyFunSuite {

  /** Brute-force: enumerate every segmentation (pieces in vocab, length
    * <= maxLen), score left-to-right, pick by the same total order.
    */
  private def enumerate(w: String, pm: Map[String, Double], maxLen: Int)
      : Seq[(Double, Int, Long, List[String])] = {
    def go(pos: Int, score: Double, np: Int, mask: Long,
        acc: List[String]): Seq[(Double, Int, Long, List[String])] =
      if (pos == w.length) Seq((score, np, mask, acc.reverse))
      else (1 to math.min(maxLen, w.length - pos)).flatMap { l =>
        val piece = w.substring(pos, pos + l)
        pm.get(piece).toSeq.flatMap { p =>
          val m = mask | (if (pos + l < w.length) 1L << (pos + l) else 0L)
          go(pos + l, score * p, np + 1, m, piece :: acc)
        }
      }
    go(0, 1.0, 0, 0L, Nil)
  }

  private def bestByOrder(all: Seq[(Double, Int, Long, List[String])])
      : List[String] =
    all.minBy { case (sc, np, m, _) => (-sc, np, m) }._4

  test("viterbi equals full-enumeration argmax on randomized vocabularies") {
    val rnd = new scala.util.Random(42)
    val alpha = "abc" // small alphabet forces heavy piece overlap + ties
    for (trial <- 1 to 300) {
      val len = 4 + rnd.nextInt(8) // words up to 11 chars
      val w = Seq.fill(len)(alpha(rnd.nextInt(alpha.length))).mkString
      // random vocab: all chars (guaranteed segmentable) + random pieces,
      // probabilities from a tiny discrete set so exact ties occur often
      val probs = Seq(0.1, 0.2, 0.2, 0.4) // duplicates on purpose
      val pieces = alpha.map(_.toString) ++
        Seq.fill(8) {
          val s = rnd.nextInt(len)
          val e = math.min(len, s + 1 + rnd.nextInt(4))
          w.substring(s, e)
        }.filter(_.nonEmpty)
      val pm = pieces.distinct
        .map(p => p -> probs(rnd.nextInt(probs.length))).toMap
      val viterbi = UnigramLm.viterbi(w, pm, maxPieceLen = 4).toList
      val brute = bestByOrder(enumerate(w, pm, maxLen = 4))
      assert(viterbi == brute,
        s"trial $trial: word=$w vocab=$pm viterbi=$viterbi brute=$brute")
    }
  }

  test("seed keeps every single char and ranks multi-char pieces by count") {
    val words = IndexedSeq(("abab", 10L), ("abba", 1L), ("zz", 1L))
    val s = UnigramLm.seed(words, maxPieceLen = 3, seedTopK = 2).toMap
    // all chars present regardless of topK
    assert(Set("a", "b", "z").subsetOf(s.keySet))
    // top-2 multi pieces by weighted count: 'ab' (10+10+1=21), 'ba' (10+1=11)
    assert(s.keySet.filter(_.length >= 2) == Set("ab", "ba"))
    assert(s("ab") == 21L && s("ba") == 11L)
  }

  test("EM re-estimates toward the dominant segmentation") {
    // corpus: 'abab' x100 — after seeding, 'abab'/'ab' should dominate
    // usage while never-used pieces decay to zero counts (soft prune)
    val words = IndexedSeq(("abab", 100L), ("aab", 1L))
    val trace = UnigramLm.train(words, maxPieceLen = 4, seedTopK = 50,
      iters = 3, top = 5)
    val it3 = trace.filter(_.iter == 3)
    assert(it3.nonEmpty)
    // the argmax piece of the dominant word carries the corpus weight
    assert(it3.head.piece == "abab" && it3.head.cnt == 100L,
      s"expected 'abab' to dominate, got ${it3.head}")
    // probabilities are exact count ratios; zero-count tail rows (soft
    // pruned pieces padding the top-5) carry prob 0
    it3.foreach { r =>
      assert(r.prob >= 0 && r.prob <= 1.0)
      assert((r.cnt == 0L) == (r.prob == 0.0))
    }
  }

  test("words longer than the oracle cap still train (trainer is unbounded)") {
    val long = "abcabcabcabcabcabcabc" // 21 chars, > the t32 replay cap
    val trace = UnigramLm.train(IndexedSeq((long, 5L), ("abc", 2L)),
      maxPieceLen = 6, seedTopK = 20, iters = 2, top = 3)
    assert(trace.nonEmpty)
    assert(trace.filter(_.iter == 2).head.cnt > 0)
  }

  test("trainFinal equals the traced final round (shared EM loop)") {
    val words = IndexedSeq(("abcab", 5L), ("bca", 3L), ("cab", 2L),
      ("aabb", 4L))
    val trace = UnigramLm.train(words, maxPieceLen = 4, seedTopK = 20,
      iters = 3, top = 10)
    val fin = UnigramLm.trainFinal(words, maxPieceLen = 4, seedTopK = 20,
      iters = 3)
    val total = fin.map(_._2).sum
    val top = fin.sortBy { case (p, c) => (-c, p) }.take(10)
    val t3 = trace.filter(_.iter == 3)
    assert(top.map(_._1) == t3.map(_.piece))
    assert(top.map(_._2) == t3.map(_.cnt))
    assert(t3.forall(r => r.prob == r.cnt.toDouble / total))
    // probs (the broadcast table t33 encodes with): floor iff count 0
    val pm = UnigramLm.probs(fin)
    fin.foreach { case (p, c) =>
      assert(pm(p) ==
        (if (c == 0L) UnigramLm.floorProb else c.toDouble / total))
    }
  }

  test("viterbi fails loudly past the 64-boundary tie-break mask") {
    // `1L << e` wraps mod 64: boundary 64 would collide with boundary 0
    // and silently break the replayable (score, pieces, mask) order —
    // the guard turns that into a loud require, like unsegmentable words
    val w64 = "ab" * 32 // exactly 64 chars: every boundary < 64, legal
    val pm = Map("a" -> 0.3, "b" -> 0.3, "ab" -> 0.4)
    assert(UnigramLm.viterbi(w64, pm, maxPieceLen = 2).mkString == w64)
    val w65 = w64 + "a"
    val e = intercept[IllegalArgumentException](
      UnigramLm.viterbi(w65, pm, maxPieceLen = 2))
    assert(e.getMessage.contains("64-boundary"))
  }
}
