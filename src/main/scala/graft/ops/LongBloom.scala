package graft.ops

/** Minimal Bloom filter over packed 64-bit keys, for broadcast
  * prefiltering of a huge probe side against a large-but-broadcastable
  * key set — the task-local, deterministic version of Spark's runtime
  * bloom-filter join pruning, used where the probe rows are GENERATED
  * inside a kernel (graph wedges) and must be dropped before they ever
  * reach an exchange.
  *
  * Found-by-measurement motivation (round 11 sf1wide probe): g3's
  * triangle count at 10× sf0.1 (12M oriented edges, ~350M wedges)
  * correctly falls back from the edge broadcast to the pk equi-join —
  * but shuffling 350M wedge longs spilled >60 GB and filled the disk.
  * With this filter built over the edge pks (16 bits/key, k=3 double
  * hashing → ~0.6% fpp) the kernel emits only triangles + fpp·wedges,
  * so the join's probe side shrinks ~100× while the final equi-join
  * still guarantees EXACTNESS (a Bloom has no false negatives; false
  * positives are discarded by the join).
  *
  * Layout: `words.length` is a power of two; bit count = words.length
  * × 64; probe positions via splitmix64 double hashing (h2 forced odd
  * so the stride is coprime with the power-of-two size). Purely
  * JVM-internal — never part of a cross-engine oracle, so the hash
  * needs no DuckDB twin.
  */
object LongBloom {

  /** Bit-array size for n keys: ≥16 bits/key, power of two, clamped to
    * [2^20, 2^28] (16 KB – 32 MB of words — always broadcastable). */
  def sizeBits(n: Long): Int = {
    var b = 1 << 20
    while (b.toLong < n * 16 && b < (1 << 28)) b <<= 1
    b
  }

  @inline private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def set(words: Array[Long], key: Long): Unit = {
    val mask = (words.length << 6) - 1
    val h1 = mix64(key)
    val h2 = mix64(h1) | 1L
    var i = 0
    while (i < 3) {
      val pos = ((h1 + i * h2) & mask).toInt
      words(pos >>> 6) |= 1L << (pos & 63)
      i += 1
    }
  }

  def test(words: Array[Long], key: Long): Boolean = {
    val mask = (words.length << 6) - 1
    val h1 = mix64(key)
    val h2 = mix64(h1) | 1L
    var i = 0
    while (i < 3) {
      val pos = ((h1 + i * h2) & mask).toInt
      if ((words(pos >>> 6) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def or(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }
}
