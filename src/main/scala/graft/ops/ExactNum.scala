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
}
