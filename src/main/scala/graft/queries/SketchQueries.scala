package graft.queries

import graft.Q
import graft.ops.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate/sketch aggregates — the 100 TB substitutes for exact
  * distinct counts and exact percentiles (exact versions shuffle every
  * distinct value; sketches shuffle fixed-size state). Approximate
  * values are implementation-defined, so the cross-engine oracle uses
  * the VERDICT-BIT posture throughout: hash the deterministic parts
  * (group, n, exact answers) plus boolean bound-check bits each engine
  * computes on its OWN sketch through the identical predicate. Every
  * row in this family is fully hash-checked; SketchSpec additionally
  * bounds the raw relative errors against the exact answers.
  */
object SketchQueries {

  /** HyperLogLog++ distinct counts + approximate median/p95 per
    * order-priority (fixed-size sketch state per group), emitted in the
    * VERDICT-BIT posture (the sk2/sk7 device): each engine computes its
    * OWN sketch, its OWN exact answer, and the IDENTICAL shared
    * predicate, and the hash compares the exact values plus the boolean
    * verdicts — so the row is fully hash-checked even though the
    * underlying HLL++/t-digest states never agree across engines.
    * Predicates: distinct counts use the sk2 5% relative-value gate
    * (Spark HLL++ at rsd 0.02 and DuckDB's HLL both sit >5× inside);
    * the quantile estimates use the sk7 RANK-interval gate — the
    * estimate's feasible rank interval [#{v<est}+1, #{v≤est}] must
    * intersect ⌈φn⌉ ± ⌈0.02n⌉ (Spark percentile_approx at accuracy
    * 10000 guarantees rank error ≤ n/10000, 200× inside; DuckDB's
    * t-digest measured ≤0.2% here). Both sides cast the DECIMAL price
    * to DOUBLE before any quantile math (the m13 double-rounding
    * lesson). At 100 TB the sketch side shuffles fixed-size state per
    * group; the rank-probe join that powers the verdict is a
    * 5-row broadcast against one more scan — test-only scaffolding,
    * not part of the production sketch plan. */
  private val sk1 = Q(
    "sk1_approx_sketches",
    (s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderpriority").as("grp"), col("o_custkey"),
          col("o_totalprice").cast("double").as("v"))
      // Two aggregates, NOT one: count(DISTINCT) rewrites the whole
      // aggregate through the distinct-expand two-phase plan, which
      // re-serializes every OTHER buffer (the exact-percentile value
      // maps especially) across the extra level — measured 7.6 s fused
      // vs 2.3 s split at sf0.1. The join reassembling them is 5 rows.
      val aggP = o.groupBy("grp").agg(
        count(lit(1)).as("n"),
        expr("percentile(v, 0.5d)").as("exact_med"),
        percentile_approx(col("v"), lit(0.5), lit(10000)).as("am"),
        expr("percentile(v, 0.95d)").as("exact_p95v"),
        percentile_approx(col("v"), lit(0.95), lit(10000)).as("a95"))
      val aggD = o.groupBy("grp").agg(
        countDistinct(col("o_custkey")).as("exact_custs"),
        approx_count_distinct(col("o_custkey"), 0.02).as("ac"))
      val agg = aggP.join(aggD, "grp")
      o.join(broadcast(agg), "grp") // 5 estimate rows probe the scan
        .groupBy("grp", "n", "exact_custs", "ac", "exact_med", "am",
          "exact_p95v", "a95")
        .agg(
          sum(when(col("v") < col("am"), 1L).otherwise(0L)).as("mlo"),
          sum(when(col("v") <= col("am"), 1L).otherwise(0L)).as("mhi"),
          sum(when(col("v") < col("a95"), 1L).otherwise(0L)).as("plo"),
          sum(when(col("v") <= col("a95"), 1L).otherwise(0L)).as("phi"))
        .select(col("grp").as("o_orderpriority"), col("n"),
          col("exact_custs"),
          round(col("exact_med"), 4).as("exact_median"),
          round(col("exact_p95v"), 4).as("exact_p95"),
          (abs(col("ac") - col("exact_custs"))
            <= col("exact_custs") * 0.05).cast("int").as("custs_within_5pct"),
          (col("mlo") + 1 <= ceil(lit(0.5) * col("n"))
              + ceil(lit(0.02) * col("n"))
            && col("mhi") >= ceil(lit(0.5) * col("n"))
              - ceil(lit(0.02) * col("n")))
            .cast("int").as("median_rank_ok"),
          (col("plo") + 1 <= ceil(lit(0.95) * col("n"))
              + ceil(lit(0.02) * col("n"))
            && col("phi") >= ceil(lit(0.95) * col("n"))
              - ceil(lit(0.02) * col("n")))
            .cast("int").as("p95_rank_ok"))
        .orderBy("o_orderpriority")
    },
    Some("""WITH o AS (SELECT o_orderpriority AS grp, o_custkey,
                              CAST(o_totalprice AS DOUBLE) AS v
                       FROM orders),
            agg AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
                           CAST(count(DISTINCT o_custkey) AS BIGINT)
                             AS exact_custs,
                           approx_count_distinct(o_custkey) AS ac,
                           quantile_cont(v, 0.5) AS exact_med,
                           approx_quantile(v, 0.5) AS am,
                           quantile_cont(v, 0.95) AS exact_p95v,
                           approx_quantile(v, 0.95) AS a95
                    FROM o GROUP BY grp),
            rk AS (SELECT a.grp, a.n, a.exact_custs, a.ac, a.exact_med,
                          a.exact_p95v,
                          sum(CASE WHEN o.v < a.am THEN 1 ELSE 0 END) AS mlo,
                          sum(CASE WHEN o.v <= a.am THEN 1 ELSE 0 END) AS mhi,
                          sum(CASE WHEN o.v < a.a95 THEN 1 ELSE 0 END) AS plo,
                          sum(CASE WHEN o.v <= a.a95 THEN 1 ELSE 0 END) AS phi
                   FROM agg a JOIN o ON o.grp = a.grp
                   GROUP BY a.grp, a.n, a.exact_custs, a.ac, a.exact_med,
                            a.exact_p95v)
            SELECT grp AS o_orderpriority, n, exact_custs,
                   round(exact_med, 4) AS exact_median,
                   round(exact_p95v, 4) AS exact_p95,
                   CAST(abs(ac - exact_custs) <= exact_custs * 0.05 AS INT)
                     AS custs_within_5pct,
                   CAST(CASE WHEN mlo + 1 <= ceil(0.5 * n) + ceil(0.02 * n)
                              AND mhi >= ceil(0.5 * n) - ceil(0.02 * n)
                        THEN 1 ELSE 0 END AS INT) AS median_rank_ok,
                   CAST(CASE WHEN plo + 1 <= ceil(0.95 * n) + ceil(0.02 * n)
                              AND phi >= ceil(0.95 * n) - ceil(0.02 * n)
                        THEN 1 ELSE 0 END AS INT) AS p95_rank_ok
            FROM rk ORDER BY 1"""))

  /** Cross-engine sketch ERROR-BOUND check: approximate values are
    * implementation-defined (sk1 hashes verdict bits, not them), but the property a
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
    * Spark or DuckDB bump flips a verdict bit here, SketchSpec's sk1
    * error-bound assertions report the new relative error directly
    * instead of leaving a bare hash mismatch to decode.
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

  /** SK4 (X196, beyond the reference): BLOOM FILTER membership — the
    * other deterministic sketch (with sk3's count-min): once the hash
    * family is fixed, the bit set is exact integer arithmetic, so both
    * engines build the IDENTICAL m=8192 / k=3 filter from md5-derived
    * positions and every output bit is hash-verified. The filter is
    * built over the customers who placed orders and probed with ALL
    * customers: false positives are expected and REPORTED per probe
    * (~3% at these fill levels), false negatives are provably
    * impossible — the `false_negative` column is the per-row guarantee
    * bit, pinned all-zero by the oracle.
    *
    * 100 TB role: membership pre-filtering (decontamination, blocklist
    * joins) without shuffling the big side — the bit set is ≤ m
    * distinct positions REGARDLESS of member count, so it broadcasts
    * where the exact semi-join (d12's plan) shuffles both sides; the
    * false-positive columns here measure exactly what that saving
    * costs. Same md5 pairing as sk3: Spark
    * `conv(substr(md5(...),1,15),16,10)` ≡ DuckDB
    * `('0x'||substr(md5(...),1,15))::BIGINT` (60-bit positive, % m).
    */
  private val sk4 = Q(
    "sk4_bloom_filter",
    (s, dir) => {
      val M = 8192
      def pos(i: Int, key: org.apache.spark.sql.Column) =
        conv(substring(md5(concat(lit(i.toString), lit(":"),
          key.cast("string"))), 1, 15), 16, 10).cast("long") % M
      val members = Tables.load(s, dir, "orders")
        .select(col("o_custkey").as("k")).distinct()
      val bits = members
        .select(explode(array((0 to 2).map(i => pos(i, col("k"))): _*))
          .as("pos"))
        .distinct()
      val probes = Tables.load(s, dir, "customer").select("c_custkey")
      // distinct per-probe positions: two of a key's k hashes may
      // collide on one position, so membership is "every DISTINCT
      // position set", not "k positions matched"
      val ppos = probes
        .select(col("c_custkey"),
          explode(array((0 to 2).map(i => pos(i, col("c_custkey"))): _*))
            .as("pp"))
        .distinct()
      val est = ppos
        .join(broadcast(bits), col("pp") === col("pos"), "left")
        .groupBy("c_custkey")
        .agg(count(lit(1)).as("npos"), count(col("pos")).as("nhit"))
      val exact = probes
        .join(members, col("c_custkey") === col("k"), "left")
        .select(col("c_custkey"),
          col("k").isNotNull.cast("int").as("exact_member"))
      est.join(exact, "c_custkey")
        .select(col("c_custkey"),
          (col("nhit") === col("npos")).cast("int").as("bloom_member"),
          col("exact_member"),
          ((col("nhit") === col("npos")) && col("exact_member") === 0)
            .cast("int").as("false_positive"),
          (col("exact_member") === 1 && col("nhit") < col("npos"))
            .cast("int").as("false_negative"))
        .orderBy("c_custkey")
    },
    Some("""WITH members AS (SELECT DISTINCT o_custkey AS k FROM orders),
                 ks AS (SELECT unnest([0, 1, 2]) AS i),
                 bits AS (
                   SELECT DISTINCT
                     ('0x' || substr(md5(CAST(i AS VARCHAR) || ':' ||
                       CAST(k AS VARCHAR)), 1, 15))::BIGINT % 8192 AS pos
                   FROM members, ks),
                 ppos AS (
                   SELECT DISTINCT c_custkey,
                     ('0x' || substr(md5(CAST(i AS VARCHAR) || ':' ||
                       CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT % 8192
                       AS pp
                   FROM customer, ks),
                 est AS (
                   SELECT c_custkey, count(*) AS npos, count(b.pos) AS nhit
                   FROM ppos p LEFT JOIN bits b ON p.pp = b.pos
                   GROUP BY 1),
                 exact AS (
                   SELECT c_custkey,
                          CAST(m.k IS NOT NULL AS INT) AS exact_member
                   FROM customer LEFT JOIN members m ON c_custkey = m.k)
            SELECT e.c_custkey,
                   CAST(nhit = npos AS INT) AS bloom_member,
                   x.exact_member,
                   CAST(nhit = npos AND x.exact_member = 0 AS INT)
                     AS false_positive,
                   CAST(x.exact_member = 1 AND nhit < npos AS INT)
                     AS false_negative
            FROM est e JOIN exact x USING (c_custkey)
            ORDER BY 1"""))

  /** X221 sk5: KMV (k-minimum-values) distinct-count sketch — the
    * THIRD deterministic sketch (after sk3 count-min, sk4 Bloom), and
    * the one whose merge is trivially a k-min of unions, proven here
    * by the `__all__` row. Each user hashes to a 60-bit integer via
    * the established md5 device (identical on both engines); the
    * k=64th smallest hash h_k yields the classic estimator
    * n̂ = (k−1)·2⁶⁰/h_k. 63·2⁶⁰ is EXACTLY representable as a double
    * (6 significand bits × a power of two) and the estimate is one
    * multiply + one division of identically-rounded doubles, so even
    * the ESTIMATE hash-matches — with exact counts and relative error
    * reported alongside (the sk2 diagnostic-columns posture). Scale:
    * at 100 TB the rank becomes a per-partition k-min heap partial
    * aggregate merged associatively; this row proves the estimator
    * math and the merge law on the same data.
    */
  private val sk5 = Q(
    "sk5_kmv_distinct",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .select(col("event_type"), col("user_id"))
      val tagged = ev.unionByName(
        ev.select(lit("__all__").as("event_type"), col("user_id")))
      val hashes = tagged.distinct()
        .withColumn("h",
          conv(substring(md5(concat(lit("u:"),
            col("user_id").cast("string"))), 1, 15), 16, 10).cast("long"))
        .select(col("event_type"), col("h"))
      val w = Window.partitionBy("event_type").orderBy("h")
      hashes
        .withColumn("rk", row_number().over(w))
        .groupBy("event_type")
        .agg(count(lit(1)).as("exact_distinct"),
          max(when(col("rk") === 64, col("h"))).as("h_k"))
        .withColumn("estimate",
          lit(63.0) * lit(1152921504606846976L).cast("double")
            / col("h_k").cast("double"))
        .withColumn("rel_err",
          (col("estimate") - col("exact_distinct").cast("double"))
            / col("exact_distinct").cast("double"))
        .orderBy("event_type")
    },
    Some("""WITH tagged AS (
              SELECT event_type, user_id FROM events
              UNION ALL
              SELECT '__all__' AS event_type, user_id FROM events),
            hashes AS (
              SELECT DISTINCT event_type,
                ('0x' || substr(md5('u:' || CAST(user_id AS VARCHAR)),
                  1, 15))::BIGINT AS h
              FROM tagged),
            rk AS (
              SELECT event_type, h,
                     row_number() OVER (PARTITION BY event_type
                       ORDER BY h) AS rk
              FROM hashes)
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS exact_distinct,
                   max(CASE WHEN rk = 64 THEN h END) AS h_k,
                   63.0 * CAST(1152921504606846976 AS DOUBLE)
                     / CAST(max(CASE WHEN rk = 64 THEN h END) AS DOUBLE)
                     AS estimate,
                   (63.0 * CAST(1152921504606846976 AS DOUBLE)
                     / CAST(max(CASE WHEN rk = 64 THEN h END) AS DOUBLE)
                    - CAST(count(*) AS DOUBLE)) / CAST(count(*) AS DOUBLE)
                     AS rel_err
            FROM rk GROUP BY event_type ORDER BY event_type"""))

  /** X274 sk6: KMV MERGEABILITY — the property that makes sketches
    * distributed-at-all: the bottom-k hash set of a UNION equals the
    * bottom-k of the union of the per-partition bottom-k sets, so
    * partial sketches combine WITHOUT revisiting raw data (the
    * sketch-algebra contract every 1000-executor count-distinct rides
    * on). Proven exactly, in integers: per-event-type KMV sketches
    * (bottom-64 md5-derived BIGINT hashes — sk5's device) are merged
    * sketch-to-sketch and the k-th minimum of the merge is compared
    * 1:1 against the k-th minimum computed directly over all types;
    * `merge_law_ok` is the integer equality of the two k-th minima
    * (and of the resulting estimates, by construction). Scale: the
    * merge input is (#partitions × k) rows — constant per partition —
    * exactly how a real combiner tree aggregates; nothing rescans the
    * raw table.
    */
  private val sk6 = Q(
    "sk6_kmv_merge",
    (s, dir) => {
      val hashes = Tables.load(s, dir, "events")
        .select(col("event_type"), col("event_id")).distinct()
        .withColumn("h",
          conv(substring(md5(concat(lit("e:"),
            col("event_id").cast("string"))), 1, 15), 16, 10).cast("long"))
      // Per-type bottom-64 sketches (the partials).
      val perType = hashes
        .withColumn("rk", row_number().over(
          Window.partitionBy("event_type").orderBy("h")))
        .filter(col("rk") <= 64)
      // Merge: union the partial sketches, dedupe hashes, re-rank.
      val merged = perType.select(col("h")).distinct()
        .withColumn("rk", row_number().over(Window.orderBy("h")))
        .filter(col("rk") === 64).select(col("h").as("merged_hk"))
      // Direct: bottom-64 over the full distinct-hash set.
      val direct = hashes.select(col("h")).distinct()
        .withColumn("rk", row_number().over(Window.orderBy("h")))
        .filter(col("rk") === 64).select(col("h").as("direct_hk"))
      val nTypes = perType.agg(
        countDistinct(col("event_type")).as("n_partial_sketches"))
      merged.crossJoin(direct).crossJoin(nTypes)
        .select(col("n_partial_sketches"), col("merged_hk"),
          col("direct_hk"),
          when(col("merged_hk") === col("direct_hk"), 1L).otherwise(0L)
            .as("merge_law_ok"),
          (lit(63.0) * lit(1152921504606846976L).cast("double")
            / col("merged_hk").cast("double")).as("estimate"))
    },
    Some("""WITH hashes AS (
              SELECT DISTINCT event_type,
                ('0x' || substr(md5('e:' || CAST(event_id AS VARCHAR)),
                  1, 15))::BIGINT AS h
              FROM events),
            per_type AS (
              SELECT event_type, h,
                     row_number() OVER (PARTITION BY event_type
                       ORDER BY h) AS rk
              FROM hashes),
            partials AS (
              SELECT event_type, h FROM per_type WHERE rk <= 64),
            merged AS (
              SELECT h, row_number() OVER (ORDER BY h) AS rk
              FROM (SELECT DISTINCT h FROM partials)),
            direct AS (
              SELECT h, row_number() OVER (ORDER BY h) AS rk
              FROM (SELECT DISTINCT h FROM hashes))
            SELECT (SELECT CAST(count(DISTINCT event_type) AS BIGINT)
                      FROM partials) AS n_partial_sketches,
                   m.h AS merged_hk,
                   d.h AS direct_hk,
                   CAST(CASE WHEN m.h = d.h THEN 1 ELSE 0 END AS BIGINT)
                     AS merge_law_ok,
                   63.0 * CAST(1152921504606846976 AS DOUBLE)
                     / CAST(m.h AS DOUBLE) AS estimate
            FROM (SELECT h FROM merged WHERE rk = 64) m
            CROSS JOIN (SELECT h FROM direct WHERE rk = 64) d"""))

  /** X298 sk7: GREENWALD–KHANNA ε-quantile sketch — the repo's own
    * quantile summary ([[graft.ops.GkSketch]]) run as a native
    * `TypedImperativeAggregate` (`graft_gk_quantile`, injected via
    * `GraftExtensions`): Spark plans a real two-level aggregate, so
    * each partition builds a local sketch, the shuffle carries only
    * O((1/ε)·log(εn))-tuple serialized sketches, and the final merge
    * combines partials with a rank-bracket merge whose `g+Δ ≤ 2εn`
    * invariant survives ANY merge topology (GkSketchSpec proves the
    * bound under left-deep, bushy, and persisted-partial merges).
    * That is the 100 TB percentile: the exact `percentile` collects
    * every value per group on one reducer; the sketch shuffles
    * fixed-size state and GUARANTEES rank error ≤ ⌈εn⌉.
    *
    * Oracle posture (the sk2 device, rank-strengthened): GK witnesses
    * are within-bound but merge-order-dependent, so the row hashes
    * the deterministic parts — group, φ, n, the exact quantile — plus
    * a VERDICT bit computed from exact ranks: the estimate's feasible
    * rank interval [#\{v<est\}+1, #\{v≤est\}] must intersect
    * ⌈φn⌉ ± ⌈0.02n⌉. Our side runs GK at ε=0.005 (guaranteed 4×
    * inside the 2% gate); DuckDB checks its own t-digest
    * `approx_quantile` against the same gate (measured ≤0.2% rank
    * error here) — both engines pass their own sketch through the
    * identical predicate, so the bits agree without the sketches
    * agreeing. Both sides cast DECIMAL prices to DOUBLE before any
    * quantile math (the m13 double-rounding lesson).
    */
  private val sk7 = Q(
    "sk7_gk_quantile_mergeable",
    (s, dir) => {
      val phiArr = "array(0.25d, 0.5d, 0.75d, 0.95d)"
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderpriority").as("grp"),
          col("o_totalprice").cast("double").as("v"))
      val agg = o.groupBy("grp").agg(
        expr(s"graft_gk_quantile(v, 0.005d, $phiArr)").as("est"),
        expr(s"percentile(v, $phiArr)").as("ex"),
        count(lit(1)).as("n"))
      val est = agg
        .select(col("grp"), col("n"),
          posexplode(arrays_zip(col("est"), col("ex"))))
        .select(col("grp"), col("n"),
          element_at(expr(phiArr), col("pos") + 1).as("phi"),
          col("col.est").as("e"), col("col.ex").as("exact_v"))
      o.join(broadcast(est), "grp") // 20 estimate rows probe the scan
        .groupBy("grp", "phi", "n", "e", "exact_v")
        .agg(
          sum(when(col("v") < col("e"), 1L).otherwise(0L)).as("rank_lo"),
          sum(when(col("v") <= col("e"), 1L).otherwise(0L)).as("rank_hi"))
        .select(col("grp"), col("phi"), col("n"),
          round(col("exact_v"), 4).as("exact_q"),
          (col("rank_lo") + 1 <= ceil(col("phi") * col("n"))
              + ceil(lit(0.02) * col("n"))
            && col("rank_hi") >= ceil(col("phi") * col("n"))
              - ceil(lit(0.02) * col("n")))
            .cast("int").as("gk_within_eps"))
        .orderBy("grp", "phi")
    },
    Some("""WITH o AS (SELECT o_orderpriority AS grp,
                              CAST(o_totalprice AS DOUBLE) AS v
                       FROM orders),
            est AS (
              SELECT grp, CAST(count(*) AS BIGINT) AS n,
                     CAST(phi AS DOUBLE) AS phi,
                     CASE phi WHEN 0.25 THEN approx_quantile(v, 0.25)
                              WHEN 0.5  THEN approx_quantile(v, 0.5)
                              WHEN 0.75 THEN approx_quantile(v, 0.75)
                              ELSE approx_quantile(v, 0.95) END AS e,
                     CASE phi WHEN 0.25 THEN quantile_cont(v, 0.25)
                              WHEN 0.5  THEN quantile_cont(v, 0.5)
                              WHEN 0.75 THEN quantile_cont(v, 0.75)
                              ELSE quantile_cont(v, 0.95) END AS exact_v
              FROM o CROSS JOIN (VALUES (0.25), (0.5), (0.75), (0.95))
                AS p(phi)
              GROUP BY grp, phi),
            rk AS (
              SELECT e.grp, e.phi, e.n, e.exact_v,
                     sum(CASE WHEN o.v < e.e THEN 1 ELSE 0 END) AS rank_lo,
                     sum(CASE WHEN o.v <= e.e THEN 1 ELSE 0 END) AS rank_hi
              FROM est e JOIN o ON o.grp = e.grp
              GROUP BY e.grp, e.phi, e.n, e.exact_v)
            SELECT grp, phi, n, round(exact_v, 4) AS exact_q,
                   CAST(CASE WHEN rank_lo + 1 <= ceil(phi * n)
                                                 + ceil(0.02 * n)
                              AND rank_hi >= ceil(phi * n)
                                             - ceil(0.02 * n)
                        THEN 1 ELSE 0 END AS INT) AS gk_within_eps
            FROM rk ORDER BY grp, phi"""))

  /** X308 sk8: KMV SET-OPERATION ALGEBRA — the reason sketch indexes
    * replace exact audience joins: UNION and INTERSECTION cardinality
    * of every event-type pair estimated purely from the per-type
    * bottom-64 KMV sketches (sk5's md5-derived 60-bit device, so both
    * engines build IDENTICAL sketches and even the estimates
    * hash-match). Union: k-th minimum of the merged bottom-64 →
    * n̂ = 63·2⁶⁰/h_k. Intersection: the Jaccard estimator ρ̂ = |{merged
    * bottom-k} ∩ A ∩ B| / 64, scaled by the union estimate — one
    * integer count, one exactly-representable division, one multiply,
    * identical op order on both engines. Exact union/intersection
    * distinct counts ride along as the diagnostic columns. Scale: the
    * pairwise audience-overlap matrix costs |types|²·k sketch rows
    * (KBs) instead of re-shuffling the corpus per pair — the sketch
    * index answers every future set question without touching data.
    */
  private val sk8 = Q(
    "sk8_kmv_set_ops",
    (s, dir) => {
      val hashes = Tables.load(s, dir, "events")
        .select(col("event_type"), col("user_id")).distinct()
        .withColumn("h",
          conv(substring(md5(concat(lit("u:"),
            col("user_id").cast("string"))), 1, 15), 16, 10).cast("long"))
        .persist()
      val w = Window.partitionBy("event_type").orderBy("h")
      val sketch = hashes.select(col("event_type"), col("h"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 64)
        .drop("rk")
        .persist()
      val types = sketch.select(col("event_type").as("t")).distinct()
      val tpairs = types.as("l").join(
        broadcast(types.select(col("t").as("t2")).as("r")),
        col("t") < col("t2"))
      // merged bottom-64 per pair, from the two sketches only (the
      // |types|²-row pair table broadcasts against the KB-sized sketch)
      val merged = broadcast(tpairs)
        .join(sketch, col("event_type") === col("t") ||
          col("event_type") === col("t2"))
        .select(col("t"), col("t2"), col("h")).distinct()
      val wm = Window.partitionBy("t", "t2").orderBy("h")
      val mk = merged.withColumn("rk", row_number().over(wm))
        .filter(col("rk") <= 64)
      val inA = sketch.select(col("event_type").as("t"), col("h"),
        lit(1).as("in_a"))
      val inB = sketch.select(col("event_type").as("t2"), col("h"),
        lit(1).as("in_b"))
      val est = mk
        .join(inA, Seq("t", "h"), "left")
        .join(inB, Seq("t2", "h"), "left")
        .groupBy("t", "t2")
        .agg(max(when(col("rk") === 64, col("h"))).as("h_k"),
          sum(when(col("in_a") === 1 && col("in_b") === 1, 1L)
            .otherwise(0L)).as("n_both"))
        .withColumn("est_union",
          lit(63.0) * lit(1152921504606846976L).cast("double")
            / col("h_k").cast("double"))
        .withColumn("jaccard_est",
          col("n_both").cast("double") / lit(64.0))
        .withColumn("est_intersect", col("jaccard_est") * col("est_union"))
      val users = hashes.select(col("event_type"), col("user_id"))
      val ua = users.select(col("event_type").as("t"),
        col("user_id").as("u"))
      val ub = users.select(col("event_type").as("t2"),
        col("user_id").as("u"))
      val exact = broadcast(tpairs)
        .join(ua.unionByName(
          ub.select(col("t2").as("t"), col("u"))).distinct()
            .select(col("t").as("et"), col("u")),
          col("et") === col("t") || col("et") === col("t2"))
        .select(col("t"), col("t2"), col("u")).distinct()
        .groupBy("t", "t2").agg(count(lit(1)).as("exact_union"))
        .join(ua.join(ub, Seq("u"))
          .groupBy("t", "t2").agg(count(lit(1)).as("exact_intersect")),
          Seq("t", "t2"), "left")
        .withColumn("exact_intersect",
          coalesce(col("exact_intersect"), lit(0L)))
      est.join(exact, Seq("t", "t2"))
        .select(col("t").as("type_a"), col("t2").as("type_b"),
          col("exact_union"), col("exact_intersect"),
          col("h_k"), col("n_both"),
          col("est_union"), col("jaccard_est"), col("est_intersect"))
        .orderBy("type_a", "type_b")
    },
    Some("""WITH hashes AS (
              SELECT DISTINCT event_type,
                user_id AS u,
                ('0x' || substr(md5('u:' || CAST(user_id AS VARCHAR)),
                  1, 15))::BIGINT AS h
              FROM events),
            sk AS (
              SELECT event_type, h FROM (
                SELECT event_type, h,
                  row_number() OVER (PARTITION BY event_type
                    ORDER BY h) AS rk
                FROM (SELECT DISTINCT event_type, h FROM hashes))
              WHERE rk <= 64),
            tpairs AS (
              SELECT a.event_type AS t, b.event_type AS t2
              FROM (SELECT DISTINCT event_type FROM sk) a
              JOIN (SELECT DISTINCT event_type FROM sk) b
                ON a.event_type < b.event_type),
            mk AS (
              SELECT t, t2, h, rk FROM (
                SELECT p.t, p.t2, s.h,
                  row_number() OVER (PARTITION BY p.t, p.t2
                    ORDER BY s.h) AS rk
                FROM tpairs p
                JOIN (SELECT DISTINCT p2.t, p2.t2, s2.h
                      FROM tpairs p2 JOIN sk s2
                        ON s2.event_type IN (p2.t, p2.t2)) s
                  ON s.t = p.t AND s.t2 = p.t2)
              WHERE rk <= 64),
            est AS (
              SELECT m.t, m.t2,
                max(CASE WHEN m.rk = 64 THEN m.h END) AS h_k,
                CAST(sum(CASE WHEN a.h IS NOT NULL AND b.h IS NOT NULL
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_both
              FROM mk m
              LEFT JOIN sk a ON a.event_type = m.t AND a.h = m.h
              LEFT JOIN sk b ON b.event_type = m.t2 AND b.h = m.h
              GROUP BY 1, 2),
            exact_u AS (
              SELECT p.t, p.t2, CAST(count(DISTINCT hs.u) AS BIGINT)
                AS exact_union
              FROM tpairs p JOIN hashes hs
                ON hs.event_type IN (p.t, p.t2)
              GROUP BY 1, 2),
            exact_i AS (
              SELECT a.event_type AS t, b.event_type AS t2,
                CAST(count(DISTINCT a.u) AS BIGINT) AS exact_intersect
              FROM hashes a JOIN hashes b
                ON a.u = b.u AND a.event_type < b.event_type
              GROUP BY 1, 2)
            SELECT e.t AS type_a, e.t2 AS type_b,
                   u.exact_union,
                   coalesce(i.exact_intersect, 0) AS exact_intersect,
                   e.h_k, e.n_both,
                   63.0 * CAST(1152921504606846976 AS DOUBLE)
                     / CAST(e.h_k AS DOUBLE) AS est_union,
                   CAST(e.n_both AS DOUBLE) / 64.0 AS jaccard_est,
                   (CAST(e.n_both AS DOUBLE) / 64.0)
                     * (63.0 * CAST(1152921504606846976 AS DOUBLE)
                        / CAST(e.h_k AS DOUBLE)) AS est_intersect
            FROM est e
            JOIN exact_u u ON e.t = u.t AND e.t2 = u.t2
            LEFT JOIN exact_i i ON e.t = i.t AND e.t2 = i.t2
            ORDER BY type_a, type_b"""))

  def all: Seq[Q] = Seq(sk1, sk2, sk3, sk4, sk5, sk6, sk7, sk8)
}
