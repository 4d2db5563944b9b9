package graft.queries

import graft.Q
import graft.ops.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Projection / filter / column-transform / distinct / union / sort
  * operators (SURVEY.md §2.2, §2.5, §2.6), re-expressed over the
  * testdata star schema. Reference instances cited per query.
  */
object RelationalQueries {

  /** P1 include-list projection + P3 predicate filter.
    * Ref: covid_data_transform.py:70 (projection),
    * covid_simulator.py:62 (confirmed>0 filter).
    */
  private val p1p3 = Q(
    "p1_project_filter",
    (s, dir) => {
      Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .filter(col("l_quantity") > 45)
        // (l_orderkey, l_linenumber) is not unique in the testdata —
        // add the emitted measures as tiebreakers for a total order.
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    },
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
            FROM lineitem WHERE l_quantity > 45
            ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice""".stripMargin))

  /** P2 exclude-list projection (drop) + P4 conjunctive predicate.
    * Ref: covid_data_transform.py:58-59 (EXCLUDE_COL drop),
    * covid_simulator.py:450 ((removed>0)&(holdout==0)).
    */
  private val p2p4 = Q(
    "p2_drop_conj_filter",
    (s, dir) => {
      Tables.load(s, dir, "orders")
        .drop("o_orderpriority", "o_orderdate")
        .filter(col("o_orderstatus") === "F" && col("o_totalprice") > 100000.0)
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
            FROM orders WHERE o_orderstatus = 'F' AND o_totalprice > 100000.0
            ORDER BY o_orderkey"""))

  /** P5 conditional in-place update (UPDATE ... WHERE) + P6 rename + P7
    * literal column.
    * Ref: covid_data_transform.py:16-22 (per-row rewrite), :71 (rename),
    * covid_simulator.py:375 (Intercept literal).
    */
  private val p5p6p7 = Q(
    "p5_cond_update_rename_lit",
    (s, dir) => {
      Tables.load(s, dir, "customer")
        .withColumn("c_mktsegment",
          when(col("c_acctbal") < 0, lit("DELINQUENT"))
            .otherwise(col("c_mktsegment")))
        .withColumnRenamed("c_acctbal", "balance")
        .withColumn("intercept", lit(1.0))
        .select("c_custkey", "c_name", "c_mktsegment", "balance", "intercept")
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_name,
              CASE WHEN c_acctbal < 0 THEN 'DELINQUENT' ELSE c_mktsegment END
                AS c_mktsegment,
              c_acctbal AS balance, 1.0 AS intercept
            FROM customer ORDER BY c_custkey"""))

  /** P8/O2 head-N per sorted group via row_number (rho_data[0:30]).
    * Ref: covid_simulator.py:394.
    */
  private val p8 = Q(
    "p8_topn_per_group",
    (s, dir) => {
      val w = Window.partitionBy("l_suppkey")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      Tables.load(s, dir, "lineitem")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice", "rn")
        .orderBy("l_suppkey", "rn")
    },
    Some("""SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice, rn
            FROM (
              SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
                row_number() OVER (PARTITION BY l_suppkey
                  ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
              FROM lineitem)
            WHERE rn <= 3 ORDER BY l_suppkey, rn"""))

  /** D1 distinct rows + D2 distinct single column.
    * Ref: covid_data_transform.py:110 (dedupe dim),
    * covid_simulator.py:35 (distinct states).
    */
  private val d1d2 = Q(
    "d1_distinct",
    (s, dir) => {
      Tables.load(s, dir, "orders")
        .select("o_orderstatus", "o_orderpriority")
        .distinct()
        .orderBy("o_orderstatus", "o_orderpriority")
    },
    Some("""SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
            ORDER BY o_orderstatus, o_orderpriority"""))

  /** U1 union by name with missing columns NaN/NULL-filled (pandas
    * concat semantics). Ref: covid_data_transform.py:117.
    */
  private val u1 = Q(
    "u1_union_missing_cols",
    (s, dir) => {
      val cust = Tables.load(s, dir, "customer")
        .select(col("c_name").as("name"), col("c_nationkey").as("nationkey"),
          col("c_acctbal").as("acctbal"), col("c_mktsegment").as("segment"))
      val supp = Tables.load(s, dir, "supplier")
        .select(col("s_name").as("name"), col("s_nationkey").as("nationkey"),
          col("s_acctbal").as("acctbal"))
      cust.unionByName(supp, allowMissingColumns = true)
        .orderBy("name")
    },
    Some("""SELECT * FROM (
              SELECT c_name AS name, c_nationkey AS nationkey,
                     c_acctbal AS acctbal, c_mktsegment AS segment
              FROM customer
              UNION ALL BY NAME
              SELECT s_name AS name, s_nationkey AS nationkey,
                     s_acctbal AS acctbal
              FROM supplier)
            ORDER BY name"""))

  /** O1 global sort + O3 tail-N per group (last-30 test split).
    * Ref: weather_pred.py:291-294.
    */
  private val o3 = Q(
    "o3_tail_n_per_group",
    (s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      Tables.load(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
        .select("o_custkey", "o_orderkey", "o_orderdate", "rn")
        .orderBy("o_custkey", "rn")
    },
    Some("""SELECT o_custkey, o_orderkey, o_orderdate, rn FROM (
              SELECT o_custkey, o_orderkey, o_orderdate,
                row_number() OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
              FROM orders)
            WHERE rn <= 2 ORDER BY o_custkey, rn"""))

  /** P9 (beyond the reference): correlated EXISTS / NOT EXISTS
    * subqueries — Catalyst decorrelates both into semi/anti joins, so
    * the physical plan is joins, not per-row subquery execution.
    */
  private val p9 = Q(
    "p9_exists_subquery",
    (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""SELECT c_custkey, c_mktsegment
               FROM customer c
               WHERE EXISTS (SELECT 1 FROM orders o
                             WHERE o.o_custkey = c.c_custkey
                               AND o.o_totalprice > 300000)
                 AND NOT EXISTS (SELECT 1 FROM orders o
                                 WHERE o.o_custkey = c.c_custkey
                                   AND o.o_orderstatus = 'F')
               ORDER BY c_custkey""")
    },
    Some("""SELECT c_custkey, c_mktsegment
            FROM customer c
            WHERE EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_totalprice > 300000)
              AND NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_orderstatus = 'F')
            ORDER BY c_custkey"""))

  /** P10 (beyond the reference): deterministic hash sampling — keep
    * documents whose content md5 starts with one of 2/16 hex digits, a
    * reproducible ~1/8 systematic sample. Unlike TABLESAMPLE/rand(),
    * the sample is stable across engines, runs, and partitionings —
    * the property a training-data pipeline needs for holdout splits.
    * The filter is a codegen'd scan predicate: no shuffle at all.
    */
  private val p10 = Q(
    "p10_hash_sample",
    (s, dir) => {
      Tables.load(s, dir, "documents")
        .withColumn("hx", substring(md5(col("text")), 1, 1))
        .filter(col("hx").isin("0", "1"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_sampled"),
          round(avg("n_chars"), 4).as("avg_chars"))
        .orderBy("source")
    },
    Some("""SELECT source, count(*) AS n_sampled,
                   round(avg(n_chars), 4) AS avg_chars
            FROM documents
            WHERE substr(md5(text), 1, 1) IN ('0', '1')
            GROUP BY 1 ORDER BY 1"""))

  /** P11 (beyond the reference): stratified deterministic sampling —
    * the data-mixing step of a training pipeline: each source stratum
    * keeps a different fraction (1, 1/2, 1/4, 1/8), selected by
    * comparing a 2-hex-digit md5 prefix against a per-stratum
    * threshold (fixed-width lowercase hex compares lexicographically
    * in numeric order, so the thresholds are plain string literals in
    * both engines). Like p10 the keep-predicate is a codegen'd scan
    * filter — stable across engines, runs, and partitionings, with no
    * shuffle before the per-source rollup.
    */
  private val p11 = Q(
    "p11_stratified_sample",
    (s, dir) => {
      Tables.load(s, dir, "documents")
        .withColumn("kept",
          graft.ops.Corpus.sampleKeep(col("text"), col("source")).cast("int"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_total"),
          sum("kept").as("n_kept"),
          round(sum("kept").cast("double") / count(lit(1)), 4)
            .as("kept_frac"))
        .orderBy("source")
    },
    Some("""WITH d AS (
              SELECT source,
                CASE WHEN CAST(regexp_extract(source, '(\d+)', 1) AS INT) < 5
                       THEN 'zz'
                     WHEN CAST(regexp_extract(source, '(\d+)', 1) AS INT) < 10
                       THEN '80'
                     WHEN CAST(regexp_extract(source, '(\d+)', 1) AS INT) < 15
                       THEN '40'
                     ELSE '20' END AS thr,
                CASE WHEN substr(md5(text), 1, 2) <
                  CASE WHEN CAST(regexp_extract(source, '(\d+)', 1) AS INT) < 5
                         THEN 'zz'
                       WHEN CAST(regexp_extract(source, '(\d+)', 1) AS INT) < 10
                         THEN '80'
                       WHEN CAST(regexp_extract(source, '(\d+)', 1) AS INT) < 15
                         THEN '40'
                       ELSE '20' END
                  THEN 1 ELSE 0 END AS kept
              FROM documents)
            SELECT source, count(*) AS n_total,
                   CAST(sum(kept) AS BIGINT) AS n_kept,
                   round(sum(kept) * 1.0 / count(*), 4) AS kept_frac
            FROM d GROUP BY 1 ORDER BY 1"""))

  /** Data-quality constraint report — the validation pass a pipeline
    * runs before promoting a dataset: null keys, duplicate primary
    * keys, referential integrity (orders→customer), and domain ranges
    * (non-negative quantity, discount ∈ [0,1]). One
    * scan per table + one anti-join; emits a fixed rule × count
    * table, where zero is the passing value. At scale each check is a
    * partial-aggregable count — the report costs one pass, not one
    * job per rule.
    */
  private val dq1 = Q(
    "dq1_constraint_report",
    (s, dir) => {
      import s.implicits._
      val li = Tables.load(s, dir, "lineitem")
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer")
      val liChecks = li.agg(
        sum(when(col("l_orderkey").isNull, 1L).otherwise(0L)).as("null_key"),
        sum(when(col("l_quantity") < 0, 1L).otherwise(0L)).as("neg_qty"),
        sum(when(col("l_discount") < 0 || col("l_discount") > 1, 1L)
          .otherwise(0L)).as("bad_discount")).first()
      val dupPk = li.groupBy("l_orderkey", "l_linenumber")
        .agg(count(lit(1)).as("n")).filter(col("n") > 1).count()
      val orphanOrders = o.join(c,
          o("o_custkey") === c("c_custkey"), "left_anti").count()
      Seq(
        ("lineitem.null_orderkey", liChecks.getLong(0)),
        ("lineitem.negative_quantity", liChecks.getLong(1)),
        ("lineitem.discount_out_of_range", liChecks.getLong(2)),
        ("lineitem.duplicate_pk", dupPk),
        ("orders.orphan_custkey", orphanOrders))
        .toDF("rule", "violations")
        .orderBy("rule")
    },
    Some("""SELECT * FROM (
              SELECT 'lineitem.null_orderkey' AS rule,
                CAST((SELECT count(*) FROM lineitem
                      WHERE l_orderkey IS NULL) AS BIGINT) AS violations
              UNION ALL
              SELECT 'lineitem.negative_quantity',
                (SELECT count(*) FROM lineitem WHERE l_quantity < 0)
              UNION ALL
              SELECT 'lineitem.discount_out_of_range',
                (SELECT count(*) FROM lineitem
                 WHERE l_discount < 0 OR l_discount > 1)
              UNION ALL
              SELECT 'lineitem.duplicate_pk',
                (SELECT count(*) FROM (
                   SELECT l_orderkey, l_linenumber FROM lineitem
                   GROUP BY 1, 2 HAVING count(*) > 1))
              UNION ALL
              SELECT 'orders.orphan_custkey',
                (SELECT count(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey)))
            ORDER BY rule"""))

  /** In-flight observed metrics (X85 promoted into the verified
    * surface): `df.observe` accumulates audit counters DURING the job
    * that computes the business answer — no second scan of the input.
    * The query runs one filtered count over lineitem; the Observation
    * rides that same job and yields total rows, total quantity, and
    * return-row count, which are emitted as a one-row table the DuckDB
    * oracle recomputes with plain aggregates. At 100 TB this is the
    * difference between auditing for free and paying a second full
    * pass. (ObservationSpec proves the same equality in-process;
    * this row puts it under the driver's hash gate.)
    */
  private val obs1 = Q(
    "obs1_inflight_metrics",
    (s, dir) => {
      import s.implicits._
      val obs = org.apache.spark.sql.Observation()
      val li = Tables.load(s, dir, "lineitem")
      val nHi = li
        .observe(obs,
          count(lit(1)).as("n_rows"),
          round(sum("l_quantity"), 4).as("sum_qty"),
          sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
            .as("n_returns"))
        .filter(col("l_quantity") > 25)
        .count() // the ONE job; the observation fires with it
      val m = obs.get
      Seq((m("n_rows").asInstanceOf[Long],
        m("sum_qty").asInstanceOf[Double],
        m("n_returns").asInstanceOf[Long],
        nHi))
        .toDF("n_rows", "sum_qty", "n_returns", "n_hi_qty")
    },
    Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
                   round(sum(l_quantity), 4) AS sum_qty,
                   CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_returns,
                   (SELECT CAST(count(*) AS BIGINT) FROM lineitem
                    WHERE l_quantity > 25) AS n_hi_qty
            FROM lineitem"""))

  /** P12 (beyond the reference): SCD type-2 dimension merge — the
    * upsert-with-history pattern every warehouse dimension needs and
    * plain Spark (no table format) must express relationally. The
    * current snapshot (customer, one open version per key, valid_from
    * 1995-01-01) merges a deterministic change set (every 7th customer
    * re-rated +100.0 acctbal, effective 1997-01-01): changed keys
    * CLOSE their old version (valid_to = effective date) and open a
    * new current one; untouched keys pass through. One broadcast join
    * (the change set is always ≪ the dimension) + a union — at scale,
    * with the dimension bucketed by key, neither side shuffles and
    * unmatched partitions are never rewritten. A MERGE INTO engine
    * (Delta/Iceberg) runs this same plan under the hood; here the
    * logic is explicit and oracle-checked.
    */
  private val p12 = Q(
    "p12_scd2_merge",
    (s, dir) => {
      // change rule is EXACT double arithmetic (+100.0, no rounding):
      // a 2-decimal balance times 1.1 rounds at a systematic .xx5 tie,
      // where Spark (BigDecimal HALF_UP) and DuckDB (C round) disagree
      val base = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"),
          col("c_acctbal").as("acctbal"))
      val upd = base.filter(col("c_custkey") % 7 === 0)
        .select(col("c_custkey"),
          (col("acctbal") + lit(100.0)).as("new_acctbal"))
      val merged = base.join(broadcast(upd), Seq("c_custkey"), "left")
      val closedOld = merged.filter(col("new_acctbal").isNotNull)
        .select(col("c_custkey"), col("c_name"), col("acctbal"),
          lit("1995-01-01").as("valid_from"),
          lit("1997-01-01").as("valid_to"), lit(0).as("is_current"))
      val openNew = merged.filter(col("new_acctbal").isNotNull)
        .select(col("c_custkey"), col("c_name"),
          col("new_acctbal").as("acctbal"),
          lit("1997-01-01").as("valid_from"),
          lit(null).cast("string").as("valid_to"), lit(1).as("is_current"))
      val untouched = merged.filter(col("new_acctbal").isNull)
        .select(col("c_custkey"), col("c_name"), col("acctbal"),
          lit("1995-01-01").as("valid_from"),
          lit(null).cast("string").as("valid_to"), lit(1).as("is_current"))
      closedOld.unionByName(openNew).unionByName(untouched)
        .orderBy("c_custkey", "valid_from")
    },
    Some("""WITH base AS (
              SELECT c_custkey, c_name, c_acctbal AS acctbal
              FROM customer),
            upd AS (
              SELECT c_custkey, acctbal + 100.0 AS new_acctbal
              FROM base WHERE c_custkey % 7 = 0)
            SELECT * FROM (
              SELECT b.c_custkey, b.c_name, b.acctbal,
                     '1995-01-01' AS valid_from, '1997-01-01' AS valid_to,
                     0 AS is_current
              FROM base b JOIN upd u USING (c_custkey)
              UNION ALL
              SELECT b.c_custkey, b.c_name, u.new_acctbal AS acctbal,
                     '1997-01-01' AS valid_from, NULL AS valid_to,
                     1 AS is_current
              FROM base b JOIN upd u USING (c_custkey)
              UNION ALL
              SELECT b.c_custkey, b.c_name, b.acctbal,
                     '1995-01-01' AS valid_from, NULL AS valid_to,
                     1 AS is_current
              FROM base b ANTI JOIN upd u USING (c_custkey))
            ORDER BY c_custkey, valid_from"""))

  /** P13 (X116, beyond the reference): INCREMENTAL AGGREGATE
    * MAINTENANCE — the partial-aggregate merge law that underlies
    * every incremental view / summary-table refresh at scale. The
    * orders table is split into a "base" snapshot (orderdate <
    * 1999-01-01) and a "delta" batch (the rest); each side aggregates
    * INDEPENDENTLY to per-priority partials (count, sum), and the
    * maintained view is produced ONLY by merging the two partial
    * tables (union → re-aggregate: counts add, sums add) — the base
    * data is never rescanned, which is the entire point: refreshing a
    * 100 TB rollup costs O(|delta| + |view|), not O(|base|). The
    * DuckDB oracle recomputes from the FULL table, so the driver
    * hash-proves merge(partial(base), partial(delta)) ==
    * aggregate(base ∪ delta) exactly — the algebraic property that
    * makes the maintenance valid.
    */
  private val p13 = Q(
    "p13_incremental_agg_maintenance",
    (s, dir) => {
      val orders = Tables.load(s, dir, "orders")
      // money sums in exact DECIMAL, not DOUBLE: decimal addition is
      // associative, so merge-order vs single-pass order cannot differ
      // by even an ulp — the merge law verifies bit-exactly with no
      // rounding tolerance hiding a real defect
      def partial(side: org.apache.spark.sql.DataFrame) = side
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).as("sum_price"))
      val base = partial(orders.filter(col("o_orderdate") < "1999-01-01"))
      val delta = partial(orders.filter(col("o_orderdate") >= "1999-01-01"))
      base.unionByName(delta)
        .groupBy("o_orderpriority")
        .agg(sum("n_orders").as("n_orders"),
          sum("sum_price").cast("double").as("sum_price"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority,
                   CAST(count(*) AS BIGINT) AS n_orders,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                     AS DOUBLE) AS sum_price
            FROM orders
            GROUP BY o_orderpriority
            ORDER BY o_orderpriority"""))

  /** P14 (X122, beyond the reference): WEIGHTED deterministic sampling
    * — corpus mixing where longer/higher-quality documents get
    * proportionally higher selection odds (the data-mixture step of a
    * training pipeline, weighted flavor of p10/p11). Priority =
    * hash_uniform / weight, reservoir-style: a doc's md5-derived
    * 32-bit integer (deterministic "uniform") divided by its weight
    * (n_chars here) — IEEE division is correctly rounded, so the
    * priority is bit-identical on every engine and run, unlike the
    * textbook u^(1/w) key whose `pow` can differ by an ulp across
    * libm implementations (documented approximation: selection odds
    * are monotone in weight, not exactly ∝ weight). Top-20 per source
    * stratum by (priority, doc_id) — a per-stratum TakeOrdered, one
    * shuffle on the stratum key, scan-local priorities.
    */
  private val p14 = Q(
    "p14_weighted_sample",
    (s, dir) => {
      val w = Window.partitionBy("source")
        .orderBy(col("priority"), col("doc_id"))
      Tables.load(s, dir, "documents")
        .select(col("source"), col("doc_id"),
          (conv(substring(md5(col("text")), 1, 8), 16, 10).cast("double") /
            col("n_chars")).as("priority"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 20)
        .select(col("source"), col("rk"), col("doc_id"), col("priority"))
        .orderBy("source", "rk")
    },
    Some("""WITH pri AS (
              SELECT source, doc_id,
                     CAST(CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT)
                       AS DOUBLE) / n_chars AS priority
              FROM documents),
            rk AS (
              SELECT source, doc_id, priority,
                     row_number() OVER (PARTITION BY source
                       ORDER BY priority, doc_id) AS rk
              FROM pri)
            SELECT source, CAST(rk AS BIGINT) AS rk, doc_id, priority
            FROM rk WHERE rk <= 20 ORDER BY source, rk"""))

  /** DQ2 (X128, beyond the reference): K-ANONYMITY audit — the
    * governance gate run before releasing or training on
    * user-adjacent data: every quasi-identifier combination
    * (nationkey × market segment here) must describe at least k
    * individuals, else those rows are re-identifiable and must be
    * suppressed or generalized. One map-side-combined aggregate over
    * the QI tuple (shuffle = QI-combination cardinality, independent
    * of table size) emitting the per-group verdict and the suppression
    * impact — plus the headline numbers a privacy review asks for,
    * via a grouping-sets-free rollup pattern (verdict column + global
    * window) that keeps it a single pass.
    */
  private val dq2 = Q(
    "dq2_k_anonymity",
    (s, dir) => {
      val k = 40
      Tables.load(s, dir, "customer")
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(count(lit(1)).as("group_size"))
        .withColumn("anonymous", col("group_size") >= k)
        .withColumn("suppressed_rows",
          when(!col("anonymous"), col("group_size")).otherwise(0L))
        .orderBy("c_nationkey", "c_mktsegment")
    },
    Some("""SELECT c_nationkey, c_mktsegment,
                   count(*) AS group_size,
                   count(*) >= 40 AS anonymous,
                   CAST(CASE WHEN count(*) >= 40 THEN 0
                        ELSE count(*) END AS BIGINT) AS suppressed_rows
            FROM customer
            GROUP BY c_nationkey, c_mktsegment
            ORDER BY c_nationkey, c_mktsegment"""))

  /** P15 (X135, beyond the reference): TIME-BASED train/test split
    * with a LEAKAGE audit — the split every forecasting/training
    * pipeline needs (random splits leak future into past; entity
    * overlap across the cutoff is what a dedup/decontamination gate
    * must know about). One scan assigns the split by cutoff; ONE
    * user-keyed map-side-combined aggregate derives per-user
    * presence on each side; the audit row (counts, overlap, leak
    * rate) is a tiny rollup of that. Leak rate = IEEE division of
    * two exact BIGINTs (<2^53) — cross-engine deterministic per the
    * repo playbook. At 100 TB: shuffle = user cardinality, never
    * events; no second scan for the audit.
    */
  private val p15 = Q(
    "p15_time_split_leakage",
    (s, dir) => {
      val cutoff = "2024-01-24"
      val perUser = Tables.load(s, dir, "events")
        .select(col("user_id"),
          (col("ts") < lit(cutoff).cast("timestamp")).as("is_train"))
        .groupBy("user_id")
        .agg(
          sum(when(col("is_train"), 1L).otherwise(0L)).as("n_train_ev"),
          sum(when(col("is_train"), 0L).otherwise(1L)).as("n_test_ev"))
      perUser.agg(
          sum("n_train_ev").as("train_events"),
          sum("n_test_ev").as("test_events"),
          sum(when(col("n_train_ev") > 0, 1L).otherwise(0L))
            .as("train_users"),
          sum(when(col("n_test_ev") > 0, 1L).otherwise(0L))
            .as("test_users"),
          sum(when(col("n_train_ev") > 0 && col("n_test_ev") > 0, 1L)
            .otherwise(0L)).as("leaked_users"))
        .withColumn("leak_rate",
          round(col("leaked_users").cast("double") /
            col("test_users"), 4))
    },
    Some("""WITH per_user AS (
              SELECT user_id,
                     sum(CASE WHEN ts < TIMESTAMP '2024-01-24'
                         THEN 1 ELSE 0 END) AS n_train_ev,
                     sum(CASE WHEN ts < TIMESTAMP '2024-01-24'
                         THEN 0 ELSE 1 END) AS n_test_ev
              FROM events GROUP BY user_id)
            SELECT CAST(sum(n_train_ev) AS BIGINT) AS train_events,
                   CAST(sum(n_test_ev) AS BIGINT) AS test_events,
                   CAST(sum(CASE WHEN n_train_ev > 0 THEN 1 ELSE 0 END)
                     AS BIGINT) AS train_users,
                   CAST(sum(CASE WHEN n_test_ev > 0 THEN 1 ELSE 0 END)
                     AS BIGINT) AS test_users,
                   CAST(sum(CASE WHEN n_train_ev > 0 AND n_test_ev > 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS leaked_users,
                   round(CAST(sum(CASE WHEN n_train_ev > 0
                       AND n_test_ev > 0 THEN 1 ELSE 0 END) AS DOUBLE)
                     / sum(CASE WHEN n_test_ev > 0 THEN 1 ELSE 0 END), 4)
                     AS leak_rate
            FROM per_user"""))

  /** DQ3 (X139, beyond the reference): REFERENTIAL-INTEGRITY audit —
    * every foreign-key edge of the star schema checked for orphans in
    * one result table (the lake-ingest gate that catches partial
    * loads and broken upstream joins before training reads the data).
    * Each edge is one LEFT join against the DISTINCT parent keyset
    * with a null-count — the dim edges broadcast; the two fact→fact
    * edges shuffle on their shared key, which is the honest shape at
    * 100 TB (you cannot audit lineitem→orders without touching both).
    * All counts BIGINT, zero FP.
    */
  private val dq3 = Q(
    "dq3_fk_orphans",
    (s, dir) => {
      def audit(edge: String, child: org.apache.spark.sql.DataFrame,
          key: String, parent: org.apache.spark.sql.DataFrame,
          pkey: String, bcast: Boolean) = {
        val pk = parent.select(col(pkey).as("__pk")).distinct()
        child.select(col(key).cast("long").as("__k"))
          .join(if (bcast) broadcast(pk) else pk,
            col("__k") === col("__pk"), "left")
          .agg(lit(edge).as("fk_edge"), count(lit(1)).as("n_child"),
            sum(when(col("__pk").isNull, 1L).otherwise(0L))
              .as("n_orphans"))
      }
      val li = Tables.load(s, dir, "lineitem")
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer")
      val su = Tables.load(s, dir, "supplier")
      val n = Tables.load(s, dir, "nation")
      val r = Tables.load(s, dir, "region")
      val p = Tables.load(s, dir, "part")
      audit("customer.c_nationkey->nation", c, "c_nationkey", n,
          "n_nationkey", bcast = true)
        .unionByName(audit("lineitem.l_orderkey->orders", li,
          "l_orderkey", o, "o_orderkey", bcast = false))
        .unionByName(audit("lineitem.l_partkey->part", li, "l_partkey",
          p, "p_partkey", bcast = true))
        .unionByName(audit("lineitem.l_suppkey->supplier", li,
          "l_suppkey", su, "s_suppkey", bcast = true))
        .unionByName(audit("nation.n_regionkey->region", n,
          "n_regionkey", r, "r_regionkey", bcast = true))
        .unionByName(audit("orders.o_custkey->customer", o, "o_custkey",
          c, "c_custkey", bcast = true))
        .unionByName(audit("supplier.s_nationkey->nation", su,
          "s_nationkey", n, "n_nationkey", bcast = true))
        .orderBy("fk_edge")
    },
    Some("""WITH a AS (
              SELECT 'customer.c_nationkey->nation' AS fk_edge,
                     CAST(count(*) AS BIGINT) AS n_child,
                     CAST(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_orphans
              FROM customer LEFT JOIN
                (SELECT DISTINCT n_nationkey AS k FROM nation) p
                ON c_nationkey = p.k),
            b AS (
              SELECT 'lineitem.l_orderkey->orders',
                     CAST(count(*) AS BIGINT),
                     CAST(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END)
                       AS BIGINT)
              FROM lineitem LEFT JOIN
                (SELECT DISTINCT o_orderkey AS k FROM orders) p
                ON l_orderkey = p.k),
            c2 AS (
              SELECT 'lineitem.l_partkey->part',
                     CAST(count(*) AS BIGINT),
                     CAST(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END)
                       AS BIGINT)
              FROM lineitem LEFT JOIN
                (SELECT DISTINCT p_partkey AS k FROM part) p
                ON l_partkey = p.k),
            d AS (
              SELECT 'lineitem.l_suppkey->supplier',
                     CAST(count(*) AS BIGINT),
                     CAST(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END)
                       AS BIGINT)
              FROM lineitem LEFT JOIN
                (SELECT DISTINCT s_suppkey AS k FROM supplier) p
                ON l_suppkey = p.k),
            e AS (
              SELECT 'nation.n_regionkey->region',
                     CAST(count(*) AS BIGINT),
                     CAST(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END)
                       AS BIGINT)
              FROM nation LEFT JOIN
                (SELECT DISTINCT r_regionkey AS k FROM region) p
                ON n_regionkey = p.k),
            f AS (
              SELECT 'orders.o_custkey->customer',
                     CAST(count(*) AS BIGINT),
                     CAST(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END)
                       AS BIGINT)
              FROM orders LEFT JOIN
                (SELECT DISTINCT c_custkey AS k FROM customer) p
                ON o_custkey = p.k),
            g AS (
              SELECT 'supplier.s_nationkey->nation',
                     CAST(count(*) AS BIGINT),
                     CAST(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END)
                       AS BIGINT)
              FROM supplier LEFT JOIN
                (SELECT DISTINCT n_nationkey AS k FROM nation) p
                ON s_nationkey = p.k)
            SELECT * FROM a UNION ALL SELECT * FROM b
            UNION ALL SELECT * FROM c2 UNION ALL SELECT * FROM d
            UNION ALL SELECT * FROM e UNION ALL SELECT * FROM f
            UNION ALL SELECT * FROM g
            ORDER BY fk_edge"""))

  /** DQ4 (X146, beyond the reference): SNAPSHOT-DIFF RECONCILIATION —
    * the table-to-table audit every lake migration / replication
    * pipeline runs ("did v2 faithfully apply the changes?"). A v2
    * snapshot is derived deterministically from orders (keys %17
    * deleted, %13 status rewritten, %11 price shifted +100.0, %19
    * re-inserted under key+10^8), then ONE full-outer join on the
    * primary key classifies every key as insert / delete / update /
    * unchanged and counts per-column mismatches inline — no second
    * pass. Null-safe <=> comparison so NULL columns never misclassify.
    * Determinism: classification is pure column logic; the only FP op
    * is one double +100.0, bit-identical cross-engine. Scale: the diff
    * is a single PK-keyed sort-merge join (two scans + one shuffle
    * each); per-column masks ride the same pass, so auditing a 100 TB
    * table costs one join, not one job per column.
    */
  private val dq4 = Q(
    "dq4_snapshot_diff",
    (s, dir) => {
      val v1 = Tables.load(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      val v2base = v1.filter(col("o_orderkey") % 17 =!= 0)
        .withColumn("o_orderstatus",
          when(col("o_orderkey") % 13 === 0, lit("X"))
            .otherwise(col("o_orderstatus")))
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 11 === 0, col("o_totalprice") + 100.0)
            .otherwise(col("o_totalprice")))
      val inserts = v1.filter(col("o_orderkey") % 19 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + 100000000L)
      val v2 = v2base.unionByName(inserts)
      val l = v1.select(col("o_orderkey").as("k"),
        col("o_orderstatus").as("st1"), col("o_totalprice").as("pr1"))
      val r = v2.select(col("o_orderkey").as("k2"),
        col("o_orderstatus").as("st2"), col("o_totalprice").as("pr2"))
      l.join(r, col("k") === col("k2"), "full_outer")
        .withColumn("diff_class",
          when(col("k").isNull, lit("insert"))
            .when(col("k2").isNull, lit("delete"))
            .when(!(col("st1") <=> col("st2")) ||
              !(col("pr1") <=> col("pr2")), lit("update"))
            .otherwise(lit("unchanged")))
        .groupBy("diff_class")
        .agg(count(lit(1)).as("n_keys"),
          sum(when(col("k").isNotNull && col("k2").isNotNull &&
            !(col("st1") <=> col("st2")), 1L).otherwise(0L))
            .as("n_status_diff"),
          sum(when(col("k").isNotNull && col("k2").isNotNull &&
            !(col("pr1") <=> col("pr2")), 1L).otherwise(0L))
            .as("n_price_diff"))
        .orderBy("diff_class")
    },
    Some("""WITH v1 AS (
              SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
            v2 AS (
              SELECT o_orderkey,
                     CASE WHEN o_orderkey % 13 = 0 THEN 'X'
                          ELSE o_orderstatus END AS o_orderstatus,
                     CASE WHEN o_orderkey % 11 = 0
                          THEN o_totalprice + 100.0
                          ELSE o_totalprice END AS o_totalprice
              FROM v1 WHERE o_orderkey % 17 <> 0
              UNION ALL
              SELECT o_orderkey + 100000000, o_orderstatus, o_totalprice
              FROM v1 WHERE o_orderkey % 19 = 0),
            joined AS (
              SELECT v1.o_orderkey AS k, v2.o_orderkey AS k2,
                     v1.o_orderstatus AS st1, v2.o_orderstatus AS st2,
                     v1.o_totalprice AS pr1, v2.o_totalprice AS pr2
              FROM v1 FULL OUTER JOIN v2
                ON v1.o_orderkey = v2.o_orderkey),
            classed AS (
              SELECT *,
                     CASE WHEN k IS NULL THEN 'insert'
                          WHEN k2 IS NULL THEN 'delete'
                          WHEN st1 IS DISTINCT FROM st2
                            OR pr1 IS DISTINCT FROM pr2 THEN 'update'
                          ELSE 'unchanged' END AS diff_class
              FROM joined)
            SELECT diff_class,
                   CAST(count(*) AS BIGINT) AS n_keys,
                   CAST(sum(CASE WHEN k IS NOT NULL AND k2 IS NOT NULL
                     AND st1 IS DISTINCT FROM st2 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_status_diff,
                   CAST(sum(CASE WHEN k IS NOT NULL AND k2 IS NOT NULL
                     AND pr1 IS DISTINCT FROM pr2 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_price_diff
            FROM classed GROUP BY diff_class ORDER BY diff_class"""))

  /** P16 (X154, beyond the reference): DISTRIBUTION-MATCHING rejection
    * resampling — re-balance a skewed corpus to a target mix (uniform
    * across languages here) by per-group acceptance sampling, the op
    * behind "cap English at X%" in every pretraining data recipe.
    * Acceptance is deterministic: u = md5(doc_id)-uniform, accept iff
    * u·n_lang < min_lang_count (ONE double multiply per row against
    * exact BIGINT counts — no RNG, reproducible at any parallelism and
    * bit-identical cross-engine). The audit row per language reports
    * before/after counts and the achieved rate. Scale: group counts
    * are a tiny broadcast; the accept test is a pure map over the
    * corpus — one aggregate pass plus one scan, no shuffle of the data
    * itself.
    */
  private val p16 = Q(
    "p16_distribution_matching",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("lang"))
      val counts = docs.groupBy("lang").agg(count(lit(1)).as("n_lang"))
      val minN = counts.agg(min("n_lang")).first().getLong(0)
      docs.join(broadcast(counts), Seq("lang"))
        .withColumn("u",
          conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("double") / lit(4294967296.0))
        .withColumn("accept",
          col("u") * col("n_lang").cast("double") < lit(minN.toDouble))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_before"),
          sum(when(col("accept"), 1L).otherwise(0L)).as("n_after"))
        .withColumn("achieved_rate",
          col("n_after").cast("double") / col("n_before").cast("double"))
        .orderBy("lang")
    },
    Some("""WITH counts AS (
              SELECT lang, CAST(count(*) AS BIGINT) AS n_lang
              FROM documents GROUP BY lang),
            m AS (SELECT min(n_lang) AS min_n FROM counts),
            acc AS (
              SELECT d.lang,
                     CASE WHEN CAST(CAST(('0x' || substr(md5(
                         CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                         AS DOUBLE) / 4294967296.0
                       * CAST(c.n_lang AS DOUBLE)
                       < CAST(m.min_n AS DOUBLE)
                     THEN 1 ELSE 0 END AS accept
              FROM documents d
              JOIN counts c ON d.lang = c.lang
              CROSS JOIN m)
            SELECT lang, CAST(count(*) AS BIGINT) AS n_before,
                   CAST(sum(accept) AS BIGINT) AS n_after,
                   CAST(sum(accept) AS DOUBLE) /
                     CAST(count(*) AS DOUBLE) AS achieved_rate
            FROM acc GROUP BY lang ORDER BY lang"""))

  /** DQ5 (X159, beyond the reference): BENFORD'S-LAW first-digit audit
    * — the forensic data-quality screen for fabricated or truncated
    * numeric columns (real multiplicative data follows P(d) =
    * log10(1+1/d); synthetic/uniform data does not — and the testdata
    * prices indeed fail it, which is the point of the audit column).
    * First digits are extracted WITHOUT log10 or string formatting
    * (neither is cross-engine safe): exact integer cents, then a
    * FLOOR-division CASE ladder. The Benford reference probabilities
    * are compile-time double literals embedded in BOTH plans. The
    * oracle embeds new BigDecimal(v).toPlainString — the EXACT decimal
    * expansion of the double — because JDK 17's Double.toString (and
    * %.Ng, which zero-pads it) can emit a string whose correctly-
    * rounded parse lands 1 ulp away from the Java value; the exact
    * expansion parses back to the identical bits in any engine. A 1..9 digit
    * spine left-join keeps absent digits as explicit zero rows.
    * Scale: one map-side-combined 9-group aggregate — audit cost is a
    * scan, independent of table size.
    */
  private val dq5 = Q(
    "dq5_benford_audit",
    (s, dir) => {
      val benford = (1 to 9)
        .map(d => d -> math.log10(1.0 + 1.0 / d)).toMap
      val digits = s.range(1, 10).select(col("id").as("digit"))
      val obs = Tables.load(s, dir, "orders")
        .withColumn("c",
          expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)"))
        .withColumn("digit", expr(
          """CASE WHEN c >= 1000000000 THEN CAST(FLOOR(c / 1000000000.0) AS BIGINT)
                  WHEN c >= 100000000 THEN CAST(FLOOR(c / 100000000.0) AS BIGINT)
                  WHEN c >= 10000000 THEN CAST(FLOOR(c / 10000000.0) AS BIGINT)
                  WHEN c >= 1000000 THEN CAST(FLOOR(c / 1000000.0) AS BIGINT)
                  WHEN c >= 100000 THEN CAST(FLOOR(c / 100000.0) AS BIGINT)
                  WHEN c >= 10000 THEN CAST(FLOOR(c / 10000.0) AS BIGINT)
                  WHEN c >= 1000 THEN CAST(FLOOR(c / 1000.0) AS BIGINT)
                  WHEN c >= 100 THEN CAST(FLOOR(c / 100.0) AS BIGINT)
                  WHEN c >= 10 THEN CAST(FLOOR(c / 10.0) AS BIGINT)
                  ELSE c END"""))
        .groupBy("digit").agg(count(lit(1)).as("n"))
      val total = Tables.load(s, dir, "orders").count()
      digits.join(obs, Seq("digit"), "left")
        .withColumn("n", coalesce(col("n"), lit(0L)))
        .withColumn("freq",
          col("n").cast("double") / lit(total.toDouble))
        .withColumn("benford_p",
          (2 to 9).foldLeft(when(col("digit") === 1, lit(benford(1)))) {
            (acc, d) => acc.when(col("digit") === d, lit(benford(d)))
          })
        .withColumn("abs_dev", abs(col("freq") - col("benford_p")))
        .orderBy("digit")
    },
    Some {
      val benford = (1 to 9)
        .map(d => d -> math.log10(1.0 + 1.0 / d)).toMap
      val cases = (1 to 9)
        .map(d => s"WHEN s.digit = $d THEN CAST(" +
          new java.math.BigDecimal(benford(d)).toPlainString +
          " AS DOUBLE)")
        .mkString(" ")
      s"""WITH obs AS (
            SELECT CASE WHEN c >= 1000000000 THEN CAST(FLOOR(c / 1000000000.0) AS BIGINT)
                        WHEN c >= 100000000 THEN CAST(FLOOR(c / 100000000.0) AS BIGINT)
                        WHEN c >= 10000000 THEN CAST(FLOOR(c / 10000000.0) AS BIGINT)
                        WHEN c >= 1000000 THEN CAST(FLOOR(c / 1000000.0) AS BIGINT)
                        WHEN c >= 100000 THEN CAST(FLOOR(c / 100000.0) AS BIGINT)
                        WHEN c >= 10000 THEN CAST(FLOOR(c / 10000.0) AS BIGINT)
                        WHEN c >= 1000 THEN CAST(FLOOR(c / 1000.0) AS BIGINT)
                        WHEN c >= 100 THEN CAST(FLOOR(c / 100.0) AS BIGINT)
                        WHEN c >= 10 THEN CAST(FLOOR(c / 10.0) AS BIGINT)
                        ELSE c END AS digit
            FROM (SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
                  FROM orders)),
          counts AS (
            SELECT digit, CAST(count(*) AS BIGINT) AS n
            FROM obs GROUP BY digit),
          spine AS (SELECT unnest(range(1, 10)) AS digit),
          tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM orders)
          SELECT s.digit, coalesce(c.n, 0) AS n,
                 CAST(coalesce(c.n, 0) AS DOUBLE) / CAST(tot.t AS DOUBLE)
                   AS freq,
                 CASE $cases END AS benford_p,
                 abs(CAST(coalesce(c.n, 0) AS DOUBLE) /
                   CAST(tot.t AS DOUBLE) - CASE $cases END) AS abs_dev
          FROM spine s LEFT JOIN counts c ON s.digit = c.digit
          CROSS JOIN tot
          ORDER BY s.digit"""
    })

  /** P17 (beyond the reference): 2-D Pareto frontier (skyline) — parts
    * not dominated on (minimize p_retailprice, maximize p_size). The
    * naive spelling is an O(n²) NOT EXISTS self-join; the scalable one
    * is a price-level reduction: per distinct price keep max(size) (one
    * shuffle on a bounded-cardinality price domain), then a single
    * window over the PRICE levels (not the rows) computes the running
    * strict-prefix max. A part survives iff no strictly-cheaper level
    * reaches its size and no same-price part strictly exceeds it. The
    * global window sorts only distinct prices — bounded by the price
    * domain, not the row count, at any scale.
    */
  private val p17 = Q(
    "p17_pareto_frontier",
    (s, dir) => {
      val part = Tables.load(s, dir, "part")
      val lvl = part.groupBy(col("p_retailprice").as("price"))
        .agg(max("p_size").as("mx"))
      val w = Window.orderBy("price")
        .rowsBetween(Window.unboundedPreceding, -1)
      val ranked = lvl.withColumn("run_strict", max("mx").over(w))
      part.join(ranked, part("p_retailprice") === ranked("price"))
        .filter((col("run_strict").isNull ||
          col("run_strict") < col("p_size")) &&
          col("mx") === col("p_size"))
        .select("p_partkey", "p_retailprice", "p_size")
        .orderBy("p_partkey")
    },
    Some("""WITH lvl AS (
              SELECT p_retailprice AS price, max(p_size) AS mx
              FROM part GROUP BY 1),
            ranked AS (
              SELECT price, mx,
                max(mx) OVER (ORDER BY price
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  AS run_strict
              FROM lvl)
            SELECT p.p_partkey, p.p_retailprice, p.p_size
            FROM part p JOIN ranked r ON p.p_retailprice = r.price
            WHERE (r.run_strict IS NULL OR r.run_strict < p.p_size)
              AND r.mx = p.p_size
            ORDER BY p.p_partkey"""))

  /** DQ6 (beyond the reference): Tukey IQR outlier fencing per group,
    * entirely in integers — prices in cents, DISCRETE quantiles
    * (q1 at rank ceil(n/4), q3 at ceil(3n/4); tied values make any
    * rank choice among ties value-identical), and fences carried at
    * 2× scale so 1.5·IQR stays integral: low fence 2q1−3(q3−q1), high
    * 2q3+3(q3−q1) against 2·cents. Zero floating point anywhere. Per
    * group one sort of that group's rows — the same shuffle any
    * quantile needs — then a broadcast-sized fence join back.
    */
  private val dq6 = Q(
    "dq6_iqr_outliers",
    (s, dir) => {
      val cents = Tables.load(s, dir, "lineitem")
        .select(col("l_returnflag").as("flag"),
          round(col("l_extendedprice") * 100).cast("long").as("c"))
      val w = Window.partitionBy("flag").orderBy("c")
      val ranked = cents
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("flag")))
      val fences = ranked
        .filter(col("rn") === expr("(n + 3) DIV 4") ||
          col("rn") === expr("(n * 3 + 3) DIV 4"))
        .groupBy("flag")
        .agg(min("c").as("q1_cents"), max("c").as("q3_cents"),
          max("n").as("n"))
      cents.join(broadcast(fences), Seq("flag"))
        .groupBy("flag")
        .agg(max("n").as("n"),
          max("q1_cents").as("q1_cents"),
          max("q3_cents").as("q3_cents"),
          count(when(lit(2L) * col("c") <
            lit(2L) * col("q1_cents") -
              lit(3L) * (col("q3_cents") - col("q1_cents")), 1))
            .as("n_low"),
          count(when(lit(2L) * col("c") >
            lit(2L) * col("q3_cents") +
              lit(3L) * (col("q3_cents") - col("q1_cents")), 1))
            .as("n_high"))
        .orderBy("flag")
    },
    Some("""WITH cents AS (
              SELECT l_returnflag AS flag,
                     CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS c
              FROM lineitem),
            ranked AS (
              SELECT flag, c,
                row_number() OVER (PARTITION BY flag ORDER BY c) AS rn,
                CAST(count(*) OVER (PARTITION BY flag) AS BIGINT) AS n
              FROM cents),
            fences AS (
              SELECT flag, min(c) AS q1_cents, max(c) AS q3_cents,
                     max(n) AS n
              FROM ranked
              WHERE rn = (n + 3) // 4 OR rn = (n * 3 + 3) // 4
              GROUP BY flag)
            SELECT c.flag, max(f.n) AS n,
                   max(f.q1_cents) AS q1_cents,
                   max(f.q3_cents) AS q3_cents,
                   CAST(count(*) FILTER (WHERE 2 * c.c <
                     2 * f.q1_cents - 3 * (f.q3_cents - f.q1_cents))
                     AS BIGINT) AS n_low,
                   CAST(count(*) FILTER (WHERE 2 * c.c >
                     2 * f.q3_cents + 3 * (f.q3_cents - f.q1_cents))
                     AS BIGINT) AS n_high
            FROM cents c JOIN fences f ON c.flag = f.flag
            GROUP BY c.flag
            ORDER BY c.flag"""))

  /** DQ7 (X207, beyond the reference): CROSS-TABLE AGGREGATE
    * RECONCILIATION — does each order header's o_totalprice agree with
    * the sum of its line items' discounted+taxed extended prices? The
    * classic warehouse audit ("do the fact and the rollup still tie
    * out?"), reported per order priority: order count, headers with NO
    * lines at all, headers within 1% of their recomputed total, and
    * the max/total absolute discrepancy. All money in exact integer
    * cents; the 1% gate compared in INTEGERS (100·|diff| ≤ total — the
    * dq6 device) so the boundary can't wobble in FP. This synthetic
    * fixture is deliberately unreconciled — the report QUANTIFIES that
    * (which is exactly what the audit is for); on a consistent TPC-H
    * load the same query returns all-green. One lineitem rollup
    * shuffle + one header join, both on o_orderkey.
    */
  private val dq7 = Q(
    "dq7_total_reconciliation",
    (s, dir) => {
      // floor(x+0.5), not round(): the recomputed line total is an
      // arbitrary-decimal double product, and Spark round (HALF_UP)
      // vs DuckDB round (half-even) could split on an exact half —
      // floor(+0.5) is the same HALF_UP on both engines
      val li = Tables.load(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax")) * 100 + lit(0.5)).cast("long"))
          .as("line_cents"))
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          round(col("o_totalprice") * 100).cast("long").as("hdr_cents"))
      o.join(li, col("o_orderkey") === col("l_orderkey"), "left")
        .withColumn("diff",
          when(col("line_cents").isNotNull,
            abs(col("hdr_cents") - col("line_cents"))))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
          sum(when(col("line_cents").isNull, 1L).otherwise(0L))
            .as("n_no_lines"),
          sum(when(col("diff") * 100 <= col("hdr_cents"), 1L)
            .otherwise(0L)).as("n_within_1pct"),
          coalesce(max("diff"), lit(0L)).as("max_abs_diff_cents"),
          coalesce(sum("diff"), lit(0L)).as("sum_abs_diff_cents"))
        .orderBy("o_orderpriority")
    },
    Some("""WITH li AS (
              SELECT l_orderkey,
                     CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
                       * (1.0 + l_tax) * 100 + 0.5) AS BIGINT)) AS BIGINT)
                       AS line_cents
              FROM lineitem GROUP BY 1),
            o AS (
              SELECT o_orderkey, o_orderpriority,
                     CAST(round(o_totalprice * 100) AS BIGINT) AS hdr_cents
              FROM orders),
            j AS (
              SELECT o.o_orderpriority, o.hdr_cents, li.line_cents,
                     CASE WHEN li.line_cents IS NOT NULL
                          THEN abs(o.hdr_cents - li.line_cents) END AS diff
              FROM o LEFT JOIN li ON o.o_orderkey = li.l_orderkey)
            SELECT o_orderpriority,
                   CAST(count(*) AS BIGINT) AS n_orders,
                   CAST(sum(CASE WHEN line_cents IS NULL THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_no_lines,
                   CAST(sum(CASE WHEN diff * 100 <= hdr_cents THEN 1
                            ELSE 0 END) AS BIGINT) AS n_within_1pct,
                   CAST(coalesce(max(diff), 0) AS BIGINT)
                     AS max_abs_diff_cents,
                   CAST(coalesce(sum(diff), 0) AS BIGINT)
                     AS sum_abs_diff_cents
            FROM j GROUP BY 1 ORDER BY 1"""))

  /** X217 dq8: FUNCTIONAL-DEPENDENCY discovery (level-1 TANE): for five
    * candidate A→B dependencies across four tables, compare
    * |distinct A| against |distinct (A,B)| — equal counts mean every
    * key maps to exactly one value and the FD HOLDS; the ratio is the
    * standard FD-strength score (1.0 = exact). The testdata splits the
    * verdicts (c_name→c_nationkey holds; the rest are violated to
    * different degrees), so the query proves both branches. Scale:
    * each candidate is ONE distinct-shuffle bounded by its pair
    * cardinality (never the raw table), and the five probes are
    * independent branches of one union — they parallelize as separate
    * stages of the same job.
    */
  private val dq8 = Q(
    "dq8_fd_discovery",
    (s, dir) => {
      def probe(table: String, fdName: String, a: String, b: String) =
        Tables.load(s, dir, table)
          .select(col(a).as("k"), col(b).as("v")).distinct()
          .agg(countDistinct(col("k")).as("n_keys"),
            count(lit(1)).as("n_pairs"))
          .select(lit(fdName).as("fd"), col("n_keys"), col("n_pairs"),
            (col("n_keys") === col("n_pairs")).as("holds"),
            (col("n_keys").cast("double") / col("n_pairs").cast("double"))
              .as("strength"))
      probe("part", "part_brand_to_type", "p_brand", "p_type")
        .unionByName(probe("part", "part_name_to_brand", "p_name", "p_brand"))
        .unionByName(probe("documents", "doc_lang_to_source",
          "lang", "source"))
        .unionByName(probe("customer", "cust_name_to_nation",
          "c_name", "c_nationkey"))
        .unionByName(probe("orders", "orders_cust_to_priority",
          "o_custkey", "o_orderpriority"))
        .orderBy("fd")
    },
    Some("""WITH probes AS (
              SELECT 'part_brand_to_type' AS fd,
                     CAST(count(DISTINCT k) AS BIGINT) AS n_keys,
                     CAST(count(*) AS BIGINT) AS n_pairs
              FROM (SELECT DISTINCT p_brand AS k, p_type AS v FROM part)
              UNION ALL
              SELECT 'part_name_to_brand',
                     CAST(count(DISTINCT k) AS BIGINT),
                     CAST(count(*) AS BIGINT)
              FROM (SELECT DISTINCT p_name AS k, p_brand AS v FROM part)
              UNION ALL
              SELECT 'doc_lang_to_source',
                     CAST(count(DISTINCT k) AS BIGINT),
                     CAST(count(*) AS BIGINT)
              FROM (SELECT DISTINCT lang AS k, source AS v FROM documents)
              UNION ALL
              SELECT 'cust_name_to_nation',
                     CAST(count(DISTINCT k) AS BIGINT),
                     CAST(count(*) AS BIGINT)
              FROM (SELECT DISTINCT c_name AS k, c_nationkey AS v
                    FROM customer)
              UNION ALL
              SELECT 'orders_cust_to_priority',
                     CAST(count(DISTINCT k) AS BIGINT),
                     CAST(count(*) AS BIGINT)
              FROM (SELECT DISTINCT o_custkey AS k, o_orderpriority AS v
                    FROM orders))
            SELECT fd, n_keys, n_pairs, n_keys = n_pairs AS holds,
                   CAST(n_keys AS DOUBLE) / CAST(n_pairs AS DOUBLE)
                     AS strength
            FROM probes ORDER BY fd"""))

  /** X237 dq9: COLUMN-PROFILE table (the pandas-profiling / Deequ
    * "describe" every ingestion run opens with): one output row per
    * orders column — row count, null count, distinct count, min/max
    * rendered as strings — where dq1 ASSERTS known constraints, this
    * row DISCOVERS the shape. Six fixed per-column branches union
    * together; doubles are profiled as exact floor()'d cents and dates
    * as ISO strings so every rendered value is cross-engine stable
    * (raw double→string formatting is NOT — '900.0' vs '900'). Scale:
    * each branch is one map-side-combined aggregate over a single
    * column (count-distinct shuffles that column's values only);
    * branches parallelize independently, nothing is row-wise.
    */
  private val dq9 = Q(
    "dq9_column_profile",
    (s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .withColumn("cents",
          floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
        .withColumn("odate",
          date_format(col("o_orderdate").cast("date"), "yyyy-MM-dd"))
      def profile(label: String, c: org.apache.spark.sql.Column) =
        o.agg(count(lit(1)).as("n_rows"),
          (count(lit(1)) - count(c)).as("n_null"),
          countDistinct(c).as("n_distinct"),
          min(c).cast("string").as("min_str"),
          max(c).cast("string").as("max_str"))
          .select(lit(label).as("col_name"), col("n_rows"), col("n_null"),
            col("n_distinct"), col("min_str"), col("max_str"))
      profile("o_orderkey", col("o_orderkey"))
        .unionAll(profile("o_custkey", col("o_custkey")))
        .unionAll(profile("o_orderstatus", col("o_orderstatus")))
        .unionAll(profile("o_totalprice_cents", col("cents")))
        .unionAll(profile("o_orderdate", col("odate")))
        .unionAll(profile("o_orderpriority", col("o_orderpriority")))
        .orderBy("col_name")
    },
    Some("""WITH o AS (
              SELECT *,
                     CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                       AS cents,
                     strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d')
                       AS odate
              FROM orders)
            SELECT 'o_orderkey' AS col_name,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(count(*) - count(o_orderkey) AS BIGINT) AS n_null,
                   CAST(count(DISTINCT o_orderkey) AS BIGINT)
                     AS n_distinct,
                   CAST(min(o_orderkey) AS VARCHAR) AS min_str,
                   CAST(max(o_orderkey) AS VARCHAR) AS max_str
            FROM o
            UNION ALL
            SELECT 'o_custkey', CAST(count(*) AS BIGINT),
                   CAST(count(*) - count(o_custkey) AS BIGINT),
                   CAST(count(DISTINCT o_custkey) AS BIGINT),
                   CAST(min(o_custkey) AS VARCHAR),
                   CAST(max(o_custkey) AS VARCHAR)
            FROM o
            UNION ALL
            SELECT 'o_orderstatus', CAST(count(*) AS BIGINT),
                   CAST(count(*) - count(o_orderstatus) AS BIGINT),
                   CAST(count(DISTINCT o_orderstatus) AS BIGINT),
                   min(o_orderstatus), max(o_orderstatus)
            FROM o
            UNION ALL
            SELECT 'o_totalprice_cents', CAST(count(*) AS BIGINT),
                   CAST(count(*) - count(cents) AS BIGINT),
                   CAST(count(DISTINCT cents) AS BIGINT),
                   CAST(min(cents) AS VARCHAR), CAST(max(cents) AS VARCHAR)
            FROM o
            UNION ALL
            SELECT 'o_orderdate', CAST(count(*) AS BIGINT),
                   CAST(count(*) - count(odate) AS BIGINT),
                   CAST(count(DISTINCT odate) AS BIGINT),
                   min(odate), max(odate)
            FROM o
            UNION ALL
            SELECT 'o_orderpriority', CAST(count(*) AS BIGINT),
                   CAST(count(*) - count(o_orderpriority) AS BIGINT),
                   CAST(count(DISTINCT o_orderpriority) AS BIGINT),
                   min(o_orderpriority), max(o_orderpriority)
            FROM o
            ORDER BY col_name"""))

  /** X251 dq10: DETERMINISTIC DATA MASKING — the share-with-vendors
    * transform (and the complement of dq2's k-anonymity AUDIT: dq2
    * measures re-identification risk, this APPLIES the protection):
    * names keep one character + a keyed md5 pseudonym tail (stable →
    * still joinable across datasets, which is the whole point of
    * pseudonymization over redaction), balances generalize to
    * 500-cent bands IN INTEGERS, and the row proves three properties
    * a masking job must certify — row count preserved, pseudonyms
    * COLLISION-FREE (distinct count unchanged), and no raw name
    * substring surviving. Scale: masking is a pure scan-local
    * projection; the certification aggregate is one pass.
    */
  private val dq10 = Q(
    "dq10_data_masking",
    (s, dir) => {
      val masked = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
          floor(col("c_acctbal") * 100 + lit(0.5)).cast("long")
            .as("bal_cents"))
        .withColumn("name_masked",
          concat(substring(col("c_name"), 1, 1), lit("***"),
            substring(md5(concat(lit("pepper:"), col("c_name"))), 1, 8)))
        // explicit floor division: `div` truncates toward zero while
        // DuckDB's `//` floors — they disagree on negative balances
        .withColumn("bal_band",
          floor(col("bal_cents") / lit(500.0)).cast("long") * lit(500L))
      masked.groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("c_name")).as("n_names"),
          countDistinct(col("name_masked")).as("n_pseudonyms"),
          sum(when(col("name_masked")
            .contains(substring(col("c_name"), 2, 6)), 1L).otherwise(0L))
            .as("n_leaks"),
          countDistinct(col("bal_band")).as("n_bands"),
          min("bal_band").as("min_band"), max("bal_band").as("max_band"))
        .orderBy("c_mktsegment")
    },
    Some("""WITH masked AS (
              SELECT c_custkey, c_name, c_mktsegment,
                     CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
                       AS bal_cents,
                     substring(c_name, 1, 1) || '***' ||
                       substring(md5('pepper:' || c_name), 1, 8)
                       AS name_masked,
                     CAST(floor(CAST(floor(c_acctbal * 100 + 0.5)
                         AS BIGINT) / 500.0) AS BIGINT) * 500 AS bal_band
              FROM customer)
            SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(count(DISTINCT c_name) AS BIGINT) AS n_names,
                   CAST(count(DISTINCT name_masked) AS BIGINT)
                     AS n_pseudonyms,
                   CAST(sum(CASE WHEN contains(name_masked,
                       substring(c_name, 2, 6)) THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_leaks,
                   CAST(count(DISTINCT bal_band) AS BIGINT) AS n_bands,
                   min(bal_band) AS min_band, max(bal_band) AS max_band
            FROM masked GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** X259 p19: POINT-IN-TIME JOIN (feature-store correctness): every
    * order joined to the dimension version valid AT ITS OWN DATE — the
    * leakage-proof enrichment rule training pipelines must enforce
    * (using today's balance for a 1994 order is exactly the
    * target-leakage p15 audits for). Versions are p12's SCD2 output
    * (v1 effective 1995-01-01 for everyone, v2 1997-01-01 for the
    * updated keys); the join is the j15 NO-JOIN device: tag versions
    * and facts into ONE union, forward-fill version attributes over
    * one (key, date, tag)-sorted window — orders BEFORE any version
    * get NULL (feature-not-yet-available is the CORRECT answer, and
    * the row reports it, not hides it). Null sort keys are pinned via
    * coalesce(-1) because Spark asc = NULLS FIRST while DuckDB asc =
    * NULLS LAST. Scale: one custkey shuffle; versions ride the same
    * sort as facts — no interval join, no per-fact probe.
    */
  private val p19 = Q(
    "p19_point_in_time_join",
    (s, dir) => {
      val base = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_acctbal").as("acctbal"))
      val upd = base.filter(col("c_custkey") % 7 === 0)
        .select(col("c_custkey"),
          (col("acctbal") + lit(100.0)).as("new_acctbal"))
      val versions = base
        .select(col("c_custkey").as("k"), lit("1995-01-01").as("d"),
          col("acctbal").as("bal"))
        .unionByName(upd.select(col("c_custkey").as("k"),
          lit("1997-01-01").as("d"), col("new_acctbal").as("bal")))
        .withColumn("tag", lit(0))
        .withColumn("ok", lit(null).cast("long"))
      val facts = Tables.load(s, dir, "orders")
        .select(col("o_custkey").as("k"),
          date_format(col("o_orderdate").cast("date"), "yyyy-MM-dd")
            .as("d"),
          lit(null).cast("double").as("bal"), lit(1).as("tag"),
          col("o_orderkey").as("ok"))
      val w = Window.partitionBy("k")
        .orderBy(col("d"), col("tag"), coalesce(col("ok"), lit(-1L)))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      versions.unionByName(facts)
        .withColumn("bal_asof", last(col("bal"), ignoreNulls = true).over(w))
        .withColumn("version_from",
          last(when(col("tag") === 0, col("d")), ignoreNulls = true)
            .over(w))
        .filter(col("tag") === 1)
        .select(col("ok").as("o_orderkey"), col("k").as("c_custkey"),
          col("d").as("order_date"), col("bal_asof"),
          coalesce(col("version_from"), lit("none")).as("version_from"))
        .orderBy("o_orderkey")
    },
    Some("""WITH base AS (
              SELECT c_custkey, c_acctbal AS acctbal FROM customer),
            upd AS (
              SELECT c_custkey, acctbal + 100.0 AS new_acctbal
              FROM base WHERE c_custkey % 7 = 0),
            tagged AS (
              SELECT c_custkey AS k, '1995-01-01' AS d, acctbal AS bal,
                     0 AS tag, CAST(NULL AS BIGINT) AS ok
              FROM base
              UNION ALL
              SELECT c_custkey, '1997-01-01', new_acctbal, 0,
                     CAST(NULL AS BIGINT)
              FROM upd
              UNION ALL
              SELECT o_custkey,
                     strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d'),
                     CAST(NULL AS DOUBLE), 1, o_orderkey
              FROM orders),
            ff AS (
              SELECT k, d, tag, ok,
                     last_value(bal IGNORE NULLS) OVER w AS bal_asof,
                     last_value(CASE WHEN tag = 0 THEN d END IGNORE NULLS)
                       OVER w AS version_from
              FROM tagged
              WINDOW w AS (PARTITION BY k
                           ORDER BY d, tag, coalesce(ok, -1)
                           ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW))
            SELECT ok AS o_orderkey, k AS c_custkey, d AS order_date,
                   bal_asof, coalesce(version_from, 'none')
                     AS version_from
            FROM ff WHERE tag = 1 ORDER BY o_orderkey"""))

  /** X281 p20: CDC APPLY — the lakehouse changelog-materialization op
    * (Debezium/Delta-CDF shape): a base snapshot plus an ordered
    * change stream of upserts and DELETE TOMBSTONES collapses to the
    * final state by LAST-WRITER-WINS per key under a TOTAL event
    * order. The three-way branch is fully exercised: keys with no
    * events keep their base row, keys whose last event is U carry the
    * event's value, keys whose last event is D vanish (tombstone) —
    * including tombstones for keys later re-upserted (only the LAST op
    * matters, which is exactly what makes the apply idempotent and
    * restartable). Determinism: seq is a total order (date, orderkey);
    * the per-key pick is rank-1 by seq DESC; money in exact cents.
    * Scale: one shuffle ranks the changelog per key (map-side
    * WindowGroupLimit keeps ≤1 row/key crossing), one equi-join
    * applies it to the base — the same two-exchange envelope as a
    * groupBy+join, no iteration.
    */
  private val p20 = Q(
    "p20_cdc_apply",
    (s, dir) => {
      val base = Tables.load(s, dir, "customer")
        .select(col("c_custkey").as("k"),
          expr("cast(floor(c_acctbal * 100 + 0.5) as bigint)").as("cents"))
      val changelog = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1998-01-01"))
        .select(col("o_custkey").as("k"),
          when(col("o_orderkey") % 10 < 2, "D").otherwise("U").as("op"),
          expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)")
            .as("ev_cents"),
          row_number().over(
            Window.orderBy("o_orderdate", "o_orderkey")).as("seq"))
      val lastChange = changelog
        .withColumn("rn", row_number().over(
          Window.partitionBy("k").orderBy(col("seq").desc)))
        .filter(col("rn") === 1)
        .select(col("k"), col("op"), col("ev_cents"))
      base.join(lastChange, Seq("k"), "left")
        .filter(col("op").isNull || col("op") =!= "D")
        .select(col("k").as("custkey"),
          when(col("op").isNull, "base").otherwise("updated").as("state"),
          coalesce(col("ev_cents"), col("cents")).as("cents"))
        .orderBy("custkey")
    },
    Some("""WITH base AS (
              SELECT c_custkey AS k,
                     CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
              FROM customer),
            changelog AS (
              SELECT o_custkey AS k,
                     CASE WHEN o_orderkey % 10 < 2 THEN 'D' ELSE 'U' END
                       AS op,
                     CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                       AS ev_cents,
                     row_number() OVER (ORDER BY o_orderdate, o_orderkey)
                       AS seq
              FROM orders WHERE o_orderdate >= DATE '1998-01-01'),
            last_change AS (
              SELECT k, op, ev_cents FROM (
                SELECT k, op, ev_cents,
                       row_number() OVER (PARTITION BY k
                         ORDER BY seq DESC) AS rn
                FROM changelog) WHERE rn = 1)
            SELECT b.k AS custkey,
                   CASE WHEN c.k IS NULL THEN 'base' ELSE 'updated' END
                     AS state,
                   coalesce(c.ev_cents, b.cents) AS cents
            FROM base b LEFT JOIN last_change c ON b.k = c.k
            WHERE c.op IS NULL OR c.op <> 'D'
            ORDER BY custkey"""))

  def all: Seq[Q] =
    Seq(p1p3, p2p4, p5p6p7, p8, d1d2, u1, o3, p9, p10, p11, dq1, obs1,
      p12, p13, p14, dq2, p15, dq3, dq4, p16, dq5, p17, dq6, dq7, dq8,
      dq9, dq10, p19, p20)
}
