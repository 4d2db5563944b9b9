package graft

import graft.ops.LongBloom
import org.scalatest.funsuite.AnyFunSuite

/** LongBloom (the wedge-prefilter bit set): the no-false-negative
  * guarantee that makes the g3/g6 triangle join exact, a measured
  * false-positive rate near the 16-bits/key k=3 theory, sizing bounds,
  * and merge (OR) soundness. */
class LongBloomSpec extends AnyFunSuite {

  test("sizing: >=16 bits/key, power of two, clamped to [2^20, 2^28]") {
    assert(LongBloom.sizeBits(10) == (1 << 20))
    assert(LongBloom.sizeBits(100000) == (1 << 21))
    val b = LongBloom.sizeBits(12000000L)
    assert(b >= 12000000L * 16 && Integer.bitCount(b) == 1)
    assert(LongBloom.sizeBits(1000000000L) == (1 << 28)) // clamp
  }

  test("no false negatives, and fpp near theory at 16 bits/key") {
    val rnd = new scala.util.Random(42)
    val n = 200000
    val keys = Array.fill(n)(rnd.nextLong())
    val words = new Array[Long](LongBloom.sizeBits(n) >>> 6)
    keys.foreach(LongBloom.set(words, _))
    assert(keys.forall(LongBloom.test(words, _)), "false negative!")
    val probes = Array.fill(500000)(rnd.nextLong())
    val keySet = keys.toSet
    val fp = probes.count(p => !keySet.contains(p) &&
      LongBloom.test(words, p))
    val fpp = fp.toDouble / probes.length
    // theory at m/n=~20.97 (2^22 bits / 200k keys), k=3: ~0.24%;
    // at the worst-case m/n=16 it is ~0.6% — gate at 1.5%
    assert(fpp < 0.015, f"fpp=$fpp%.4f")
  }

  test("OR-merge of partial bit sets equals the single-builder set") {
    val rnd = new scala.util.Random(7)
    val keys = Array.fill(10000)(rnd.nextLong())
    val whole = new Array[Long](LongBloom.sizeBits(keys.length) >>> 6)
    keys.foreach(LongBloom.set(whole, _))
    val parts = keys.grouped(1000).map { g =>
      val w = new Array[Long](whole.length)
      g.foreach(LongBloom.set(w, _))
      w
    }.reduce(LongBloom.or)
    assert(java.util.Arrays.equals(parts, whole))
  }
}
