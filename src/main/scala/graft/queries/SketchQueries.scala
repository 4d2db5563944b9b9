package graft.queries

import graft.Q
import graft.ops.Tables
import org.apache.spark.sql.functions._

/** Approximate/sketch aggregates — the 100 TB substitutes for exact
  * distinct counts and exact percentiles (exact versions shuffle every
  * distinct value; sketches shuffle fixed-size state). Approximate
  * results are implementation-defined, so there is no cross-engine
  * oracle; the driver records rows-only and SketchSpec bounds the
  * relative error against the exact answers.
  */
object SketchQueries {

  /** HyperLogLog++ distinct counts + approximate quantiles per
    * order-priority (fixed-size sketch state per group). */
  private val sk1 = Q(
    "sk1_approx_sketches",
    (s, dir) => {
      Tables.load(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
          approx_count_distinct(col("o_custkey"), 0.02).as("approx_custs"),
          percentile_approx(col("o_totalprice"), lit(0.5), lit(10000))
            .as("approx_median_price"),
          percentile_approx(col("o_totalprice"), lit(0.95), lit(10000))
            .as("approx_p95_price"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    },
    None) // sketches are engine-specific; bounded by SketchSpec instead

  def all: Seq[Q] = Seq(sk1)
}
