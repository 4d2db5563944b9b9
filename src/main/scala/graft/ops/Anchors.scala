package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic fixed-budget anchor sampling over an id column — the
  * shared device behind the sampled scale postures (d25/d26/d27, pl15):
  * a row is an "anchor" iff h(id) < (A·2³²) div n, giving
  * keep-probability ≈ min(1, A/n) with BOTH engines computing the
  * identical integer predicate (no RNG, no FP, reproducible across
  * runs, partitionings, and engines). Corpora with n ≤ A anchor every
  * row, so sampled rows EQUAL their exact counterparts there —
  * DedupTopkSpec proves those equalities at proof scale.
  *
  * The hash mixes the FULL 64-bit id in three 20-bit limbs with Knuth
  * multiplicative constants:
  *   h(x) = ((x & 2²⁰−1)·2654435761 + ((x≫20) & 2²⁰−1)·2246822519
  *          + ((x≫40) & 2²⁰−1)·3266489917) mod 2³²
  * Earlier rounds reduced x mod 2²⁰ BEFORE the single multiply, which
  * is overflow-safe but aliases ids ≥ 2²⁰: on a corpus past ~1M docs
  * whole residue classes share anchor status and the "uniform sample"
  * claim the recall/leak estimates rest on degrades to a clustered one
  * (round-14 advice). The limb form hashes every bit of ids up to 2⁶⁰
  * while staying exactly representable everywhere: each term
  * < 2²⁰·2³² = 2⁵², the three-term sum < 2⁵⁴ ≪ 2⁶³, so no engine
  * wraps, and the budget compare A·2³² ≤ 2⁴³ uses integer division
  * (never the h·n cross-multiply, which WOULD wrap at scale). Spark
  * `>>`/`&`/`%` and DuckDB `>>`/`&`/`%` agree on non-negative longs.
  *
  * ID DOMAIN BOUND (round-16, documenting the round-15 advice): three
  * 20-bit limbs cover id bits 0..59 only — ids ≥ 2⁶⁰ alias into the
  * residue class of (id mod 2⁶⁰), re-creating the clustering the limb
  * form fixed, at a 2⁶⁰ bound instead of 2²⁰. Every id family this
  * device samples (doc_id, part/node keys, synthetic row ids) is a
  * dense counter that reaches ~10¹²–10¹⁵ at 100 TB — five-plus
  * decades below 2⁶⁰ ≈ 1.15e18 — so a fourth limb would mix bits no
  * real id has; add one (constant 0x9e3779b9·…) only if ids ever
  * become hashes/UUIDs truncated to 63 bits. PORTING NOTE: keepSql's
  * `//` is DuckDB's integer division (a comment marker in several
  * other dialects) — spell it floor(a/b) or DIV if the oracle SQL is
  * ever ported off DuckDB.
  */
object Anchors {

  /** The uniform anchor budget the sampled rows share. */
  val Budget = 2000L

  private val M = 4294967296L // 2^32
  private val Mask = 1048575L // 2^20 - 1

  /** h(id) ∈ [0, 2³²) — full-64-bit limb-mixed multiplicative hash. */
  def hash(c: Column): Column =
    pmod(
      c.bitwiseAND(lit(Mask)) * lit(2654435761L)
        + shiftright(c, 20).bitwiseAND(lit(Mask)) * lit(2246822519L)
        + shiftright(c, 40).bitwiseAND(lit(Mask)) * lit(3266489917L),
      lit(M))

  /** The budget threshold: ids with h(id) < threshold are anchors. */
  def threshold(n: Long, budget: Long = Budget): Long =
    (budget * M) / math.max(n, 1L)

  /** Anchor predicate for a non-negative long id column, given the
    * driver-side row count `n` (one count() the caller already pays).
    */
  def keep(c: Column, n: Long, budget: Long = Budget): Column =
    hash(c) < lit(threshold(n, budget))

  /** The identical DuckDB hash spelling over an id expression. */
  def hashSql(x: String): String =
    s"""((($x) & 1048575) * 2654435761
       | + ((($x) >> 20) & 1048575) * 2246822519
       | + ((($x) >> 40) & 1048575) * 3266489917) % 4294967296""".stripMargin

  /** The identical DuckDB anchor predicate, with the row count inlined
    * as a scalar subquery (`nSql`, e.g. `SELECT count(*) FROM docs`).
    */
  def keepSql(x: String, nSql: String, budget: Long = Budget): String =
    s"""(${hashSql(x)})
       | < ($budget * $M) // greatest(($nSql), 1)""".stripMargin
}
