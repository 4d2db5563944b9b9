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
    * order-priority (fixed-size sketch state per group), WITH their
    * absolute relative errors vs the exact answers as diagnostic
    * columns. This is the rows-only row, so the engine-specific error
    * values are free to drift — and that is the point: if a Spark
    * upgrade shifts HLL++/t-digest enough to flip one of sk2's
    * hash-checked verdict bits, these columns report BY HOW MUCH
    * instead of leaving a bare hash mismatch to decode. */
  private val sk1 = Q(
    "sk1_approx_sketches",
    (s, dir) => {
      Tables.load(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
          approx_count_distinct(col("o_custkey"), 0.02).as("approx_custs"),
          countDistinct(col("o_custkey")).as("exact_custs"),
          percentile_approx(col("o_totalprice"), lit(0.5), lit(10000))
            .as("approx_median_price"),
          expr("percentile(o_totalprice, 0.5)").as("exact_median_price"),
          percentile_approx(col("o_totalprice"), lit(0.95), lit(10000))
            .as("approx_p95_price"),
          count(lit(1)).as("n"))
        .withColumn("rel_err_custs",
          round(abs(col("approx_custs") - col("exact_custs"))
            / col("exact_custs"), 6))
        .withColumn("rel_err_median",
          round(abs(col("approx_median_price") - col("exact_median_price"))
            / abs(col("exact_median_price")), 6))
        .orderBy("o_orderpriority")
    },
    None) // sketches are engine-specific; bounded by SketchSpec instead

  /** Cross-engine sketch ERROR-BOUND check: approximate values are
    * implementation-defined (sk1 stays rows-only), but the property a
    * production rollout actually needs — "the sketch is within
    * tolerance of the exact answer" — IS engine-checkable: both
    * engines compute their own sketch, their own exact answer, and the
    * same tolerance predicate, and the hash compares the exact values
    * plus the boolean verdicts. Spark's HLL++ at 2% target and
    * percentile_approx at 10k accuracy sit far inside the 5% gate, as
    * do DuckDB's HLL/t-digest — so the row is deterministic even
    * though the underlying sketches never agree. At 100 TB the sketch
    * side shuffles fixed-size state per group while the exact side
    * shuffles every distinct value: this query IS the measured
    * justification for shipping sketches.
    *
    * Gate margin, pinned (sf0.01, Spark 4.1.2): max relative error
    * across groups is 0.85% for HLL++ distinct counts and 0.063% for
    * the approximate median — 6× / 80× inside the 5% gate. If a future
    * Spark or DuckDB bump flips a verdict bit here, sk1's rows-only
    * rel_err_custs / rel_err_median diagnostic columns report the new
    * error directly instead of leaving a bare hash mismatch.
    */
  private val sk2 = Q(
    "sk2_sketch_error_bounds",
    (s, dir) => {
      Tables.load(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
          countDistinct(col("o_custkey")).as("exact_custs"),
          approx_count_distinct(col("o_custkey"), 0.02).as("ac"),
          expr("percentile(o_totalprice, 0.5)").as("exact_median"),
          percentile_approx(col("o_totalprice"), lit(0.5), lit(10000))
            .as("am"))
        .select(col("o_orderpriority"), col("exact_custs"),
          round(col("exact_median"), 4).as("exact_median"),
          (abs(col("ac") - col("exact_custs"))
            <= col("exact_custs") * 0.05).cast("int").as("custs_within_5pct"),
          (abs(col("am") - col("exact_median"))
            <= abs(col("exact_median")) * 0.05).cast("int")
            .as("median_within_5pct"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority,
                   CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_custs,
                   round(median(o_totalprice), 4) AS exact_median,
                   CAST(abs(approx_count_distinct(o_custkey)
                          - count(DISTINCT o_custkey))
                     <= count(DISTINCT o_custkey) * 0.05 AS INT)
                     AS custs_within_5pct,
                   CAST(abs(approx_quantile(o_totalprice, 0.5)
                          - median(o_totalprice))
                     <= abs(median(o_totalprice)) * 0.05 AS INT)
                     AS median_within_5pct
            FROM orders GROUP BY 1 ORDER BY 1"""))

  /** SK3 (X133, beyond the reference): COUNT-MIN SKETCH heavy hitters —
    * unlike HLL/t-digest (sk1/sk2), a count-min sketch is DETERMINISTIC
    * integer arithmetic once the hash family is fixed, so both engines
    * build the IDENTICAL d=3 × w=256 sketch from md5-derived bucket
    * hashes and the row is fully hash-verified: estimates, per-item
    * overestimate, and the CMS guarantee bit (est ≥ exact, provable —
    * every cell counts a superset of the item's occurrences). At 100 TB
    * the sketch build is ONE map-side-combined pass whose shuffle is
    * the 768 fixed cells — independent of data size — versus the exact
    * top-k's user-cardinality shuffle; this row measures exactly what
    * that buys (the overestimate column) and what it risks (nothing:
    * the guarantee bit). Hash pairing per the repo playbook: Spark
    * `conv(substr(md5(...),1,15),16,10)` ≡ DuckDB
    * `('0x'||substr(md5(...),1,15))::BIGINT` (60-bit positive, % w).
    */
  private val sk3 = Q(
    "sk3_countmin_heavy_hitters",
    (s, dir) => {
      val W = 256
      def bucket(row: Int, item: org.apache.spark.sql.Column) =
        conv(substring(md5(concat(lit(row.toString), lit(":"),
          item.cast("string"))), 1, 15), 16, 10).cast("long") % W
      val ev = Tables.load(s, dir, "events").select("user_id")
      // sketch build: one scan, one shuffle of d*w=768 cells
      val cells = ev
        .select(posexplode(array((0 to 2).map(i =>
          bucket(i, col("user_id"))): _*)).as(Seq("row", "bucket")))
        .groupBy("row", "bucket").agg(count(lit(1)).as("cell"))
      // exact top-10 candidates (the truth being estimated)
      val top = ev.groupBy("user_id").agg(count(lit(1)).as("exact_cnt"))
        .orderBy(col("exact_cnt").desc, col("user_id")).limit(10)
      // probe: each candidate reads its d cells, estimate = min
      top
        .select(col("user_id"), col("exact_cnt"),
          posexplode(array((0 to 2).map(i =>
            bucket(i, col("user_id"))): _*)).as(Seq("row2", "bucket2")))
        .join(broadcast(cells),
          col("row") === col("row2") && col("bucket") === col("bucket2"))
        .groupBy("user_id", "exact_cnt")
        .agg(min("cell").as("est_cnt"))
        .select(col("user_id"), col("exact_cnt"), col("est_cnt"),
          (col("est_cnt") - col("exact_cnt")).as("overest"),
          (col("est_cnt") >= col("exact_cnt")).as("cms_ok"))
        .orderBy(col("exact_cnt").desc, col("user_id"))
    },
    Some("""WITH ev AS (SELECT user_id FROM events),
                 rows3 AS (SELECT unnest([0, 1, 2]) AS r),
                 hashes AS (
                   SELECT user_id, r,
                          ('0x' || substr(md5(CAST(r AS VARCHAR) || ':' ||
                            CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 256
                            AS bucket
                   FROM ev, rows3),
                 cells AS (SELECT r, bucket,
                                  CAST(count(*) AS BIGINT) AS cell
                           FROM hashes GROUP BY 1, 2),
                 top AS (SELECT user_id,
                                CAST(count(*) AS BIGINT) AS exact_cnt
                         FROM ev GROUP BY 1
                         ORDER BY exact_cnt DESC, user_id LIMIT 10),
                 probe AS (
                   SELECT t.user_id, t.exact_cnt, r,
                          ('0x' || substr(md5(CAST(r AS VARCHAR) || ':' ||
                            CAST(t.user_id AS VARCHAR)), 1, 15))::BIGINT
                            % 256 AS bucket
                   FROM top t, rows3)
            SELECT p.user_id, p.exact_cnt, min(c.cell) AS est_cnt,
                   min(c.cell) - p.exact_cnt AS overest,
                   min(c.cell) >= p.exact_cnt AS cms_ok
            FROM probe p JOIN cells c
              ON p.r = c.r AND p.bucket = c.bucket
            GROUP BY p.user_id, p.exact_cnt
            ORDER BY exact_cnt DESC, user_id"""))

  def all: Seq[Q] = Seq(sk1, sk2, sk3)
}
