package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.sum

/** Accumulation-order-independent money sums.
  *
  * A double SUM is non-associative: Spark's partial-aggregate tree and
  * a single-threaded oracle accumulate in different orders and drift
  * ~1e-14 relative at millions of rows — enough for a value of ~1e10
  * magnitude to straddle the 4th decimal the oracles round to. The
  * round-14 sampled sf1 oracle audit measured exactly that on 10 rows
  * (a2/h1 first, then j2/j9/j11/src1/src2/src5/src8/src10 in the wider
  * sweep — every FRACTIONAL-valued price sum of ~1e10 magnitude;
  * integral-valued quantity sums are exact in double at any order
  * below 2⁵³ and never drift).
  *
  * The fix: cast each row's double ONCE to DECIMAL(30,6) — identical
  * in both engines, the per-row value is the same IEEE double — then
  * sum exactly (decimal addition is associative), and cast back to
  * double for the reported rounding. Deterministic at any row count,
  * partitioning, and parallelism: the actual 100 TB contract for a
  * money sum.
  */
object ExactNum {

  /** Exact decimal-backed sum of a double column, reported as double. */
  def dsum(c: Column): Column = sum(c.cast("decimal(30,6)")).cast("double")

  /** The identical DuckDB oracle spelling. */
  def dsumSql(e: String): String =
    s"CAST(sum(CAST($e AS DECIMAL(30,6))) AS DOUBLE)"

  /** 2⁶¹ − 1 (Mersenne prime) — the modulus for assignment checksums
    * whose raw Σ idᵢ·(binᵢ+1) could exceed 2⁶³ at scale (t34's bound
    * was ~1e9 docs × 1e6 bins; round-15 advice: Spark's fold wrapped
    * SILENTLY there while DuckDB's HUGEINT→BIGINT cast raised — the
    * two engines failed differently). Mod-P arithmetic is exact and
    * identical on both engines at ANY doc_id × bins product.
    */
  val MersenneP = 2305843009213693951L

  /** (a·b) mod 2⁶¹−1 for 0 ≤ a, b < 2⁶¹−1: split the 128-bit product
    * into 61-bit limbs (2⁶¹ ≡ 1 mod P, so limbs just add), reduce
    * once, one conditional subtract. Exact — no FP, no BigInt
    * allocation in the fold's hot loop. PropertySpec pins it against
    * BigInt on boundary and random operands.
    */
  def mulmodP(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    var s = (lo & MersenneP) +
      (((lo >>> 61) | (hi << 3)) & MersenneP) + (hi >>> 58)
    s = (s & MersenneP) + (s >>> 61)
    if (s >= MersenneP) s - MersenneP else s
  }

  /** (a + b) mod 2⁶¹−1 for 0 ≤ a, b < 2⁶¹−1 (sum < 2⁶², no wrap). */
  def addmodP(a: Long, b: Long): Long = {
    val s = a + b
    if (s >= MersenneP) s - MersenneP else s
  }

  /** The identical DuckDB spelling of one checksum TERM mod P — the
    * oracle SUMs these per-row residues in HUGEINT (each < P, so the
    * sum stays < 2¹²⁷ up to 2⁶⁶ rows) and takes the final mod once.
    * Each operand's residue is spelled `((x % P) + P) % P` because
    * SQL `%` follows the dividend's sign while the Spark side uses
    * `Math.floorMod` (always non-negative) — without the double-mod a
    * negative id would produce engine-divergent residues (round-16
    * advice; latent only because current corpora have non-negative
    * ids, now closed for ANY caller).
    */
  def mulmodPSql(a: String, b: String): String = {
    def res(e: String) = s"((($e) % $MersenneP) + $MersenneP) % $MersenneP"
    s"(CAST(${res(a)} AS HUGEINT) * (${res(b)})) % $MersenneP"
  }
}
