package graft.queries

import graft.Q
import graft.ops.Tables
import org.apache.spark.sql.functions._

/** The remaining 15 TPC-H query patterns (Q2,4,7,8,9,11,12,13,15,16,17,
  * 19,20,21,22), completing the full 22-query suite together with
  * HeadlineQueries (Q1,3,5,6,10,14,18). The testdata schema (TESTDATA.md)
  * has no partsupp table and no l_commitdate / l_receiptdate /
  * l_shipmode / p_container / c_phone columns, so the queries that
  * depend on those are ADAPTED — same join/subquery/aggregation
  * pattern, substituted columns, each substitution documented on the
  * query. Adaptations used:
  *  - partsupp → the DISTINCT (l_partkey, l_suppkey) bridge derived
  *    from lineitem (h2, h16), or per-(part,supplier) shipped-quantity
  *    rollups (h11, h20);
  *  - "late delivery" (commit < receipt) → l_returnflag = 'R' (h4, h21);
  *  - l_shipmode → l_linestatus (h12); p_container bands → p_size
  *    bands (h19); c_phone country code → c_nationkey (h22).
  * Determinism rules follow the repo playbook: money sums rounded to 4
  * decimals (or carried in exact DECIMAL where a comparison hangs off
  * them — h11, h22), thresholds derived from integer-exact averages
  * (l_quantity is integer-valued, so sum/count is order-independent —
  * h17), ratios computed from ALREADY-ROUNDED sums with one IEEE
  * division (h8), and integer cross-multiplication instead of fraction
  * comparison (h11, h20, h22).
  * Ref: the reference's pandasql joins/roll-ups (covid_simulator.py:63-69,
  * covid_data_transform.py:95-120) are the same scan→join→agg shapes;
  * these are the standard-benchmark formulations at scale.
  */
object TpchQueries {

  private val Disc = lit(1.0) - col("l_discount")

  /** TPC-H Q2 (adapted): min-cost supplier per part. No partsupp /
    * ps_supplycost here, so the part↔supplier bridge is DISTINCT
    * (l_partkey, l_suppkey) from lineitem and "best" = MAX s_acctbal
    * (equality on a stored double — no arithmetic, so cross-engine
    * safe). Scale shape: the bridge DISTINCT is the only data-sized
    * shuffle; part (filtered), supplier, nation, and the per-part
    * best table are all broadcast dims, and the decorrelated
    * max-per-group + join-back replaces the spec's correlated
    * subquery exactly like Catalyst's own subquery decorrelation.
    */
  private val h2 = Q(
    "h2_min_cost_supplier",
    (s, dir) => {
      val bridge = Tables.load(s, dir, "lineitem")
        .select("l_partkey", "l_suppkey").distinct()
      val p = Tables.load(s, dir, "part")
        .filter(col("p_size").between(1, 15) && col("p_type") === "LARGE")
      val cand = bridge
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(Tables.load(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.load(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .select("p_partkey", "p_name", "s_suppkey", "s_name",
          "s_acctbal", "n_name")
      val best = cand.groupBy(col("p_partkey").as("pk"))
        .agg(max("s_acctbal").as("max_bal"))
      cand.join(broadcast(best),
        col("p_partkey") === col("pk") &&
          col("s_acctbal") === col("max_bal"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
          "s_suppkey")
        .orderBy(col("s_acctbal").desc, col("p_partkey"), col("s_suppkey"))
        .limit(100)
    },
    Some("""WITH bridge AS (SELECT DISTINCT l_partkey, l_suppkey
                            FROM lineitem),
                 cand AS (SELECT p_partkey, p_name, s_suppkey, s_name,
                                 s_acctbal, n_name
                          FROM bridge
                          JOIN part ON l_partkey = p_partkey
                          JOIN supplier ON l_suppkey = s_suppkey
                          JOIN nation ON s_nationkey = n_nationkey
                          WHERE p_size BETWEEN 1 AND 15
                            AND p_type = 'LARGE'),
                 best AS (SELECT p_partkey AS pk,
                                 max(s_acctbal) AS max_bal
                          FROM cand GROUP BY 1)
            SELECT s_acctbal, s_name, n_name, p_partkey, p_name, s_suppkey
            FROM cand JOIN best
              ON p_partkey = pk AND s_acctbal = max_bal
            ORDER BY s_acctbal DESC, p_partkey, s_suppkey
            LIMIT 100"""))

  /** TPC-H Q4 (adapted): order-priority checking. "Some lineitem was
    * late" (l_commitdate < l_receiptdate, columns absent) → "some
    * lineitem was returned" (l_returnflag = 'R'): identical EXISTS
    * semi-join shape, quarter window on orders. Scale shape: both
    * filters push to the scans; the LEFT SEMI join shuffles on
    * orderkey only (no lineitem payload survives it); the priority
    * rollup is map-side combined to 5 groups.
    */
  private val h4 = Q(
    "h4_order_priority",
    (s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= "1996-07-01" &&
          col("o_orderdate") < "1996-10-01")
      val ret = Tables.load(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select("l_orderkey")
      o.join(ret, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority,
                   CAST(count(*) AS BIGINT) AS order_count
            FROM orders
            WHERE o_orderdate >= DATE '1996-07-01'
              AND o_orderdate < DATE '1996-10-01'
              AND EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey
                            AND l_returnflag = 'R')
            GROUP BY o_orderpriority
            ORDER BY o_orderpriority"""))

  /** TPC-H Q7: volume shipping between two nations (NATION_1 ↔
    * NATION_2), by supplier-nation / customer-nation / ship year.
    * Scale shape: nation filters reduce supplier and customer to tiny
    * broadcast sides BEFORE touching the facts (the classic
    * dim-first star reduction); lineitem ⋈ orders is the one
    * data-sized shuffle (shared orderkey); the asymmetric-pair
    * predicate rides the already-joined row. Year via year() — exact
    * integer extraction, no FP.
    */
  private val h7 = Q(
    "h7_volume_shipping",
    (s, dir) => {
      val nat = Tables.load(s, dir, "nation")
        .filter(col("n_name").isin("NATION_1", "NATION_2"))
      val sup = Tables.load(s, dir, "supplier")
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cust = Tables.load(s, dir, "customer")
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      val l = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= "1996-01-01" &&
          col("l_shipdate") < "1998-01-01")
      l.join(Tables.load(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(round(sum(col("l_extendedprice") * Disc), 4).as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },
    Some("""SELECT supp_nation, cust_nation, l_year,
                   round(sum(volume), 4) AS revenue
            FROM (SELECT n1.n_name AS supp_nation,
                         n2.n_name AS cust_nation,
                         CAST(EXTRACT(year FROM l_shipdate) AS INTEGER)
                           AS l_year,
                         l_extendedprice * (1 - l_discount) AS volume
                  FROM supplier
                  JOIN lineitem ON s_suppkey = l_suppkey
                  JOIN orders ON o_orderkey = l_orderkey
                  JOIN customer ON c_custkey = o_custkey
                  JOIN nation n1 ON s_nationkey = n1.n_nationkey
                  JOIN nation n2 ON c_nationkey = n2.n_nationkey
                  WHERE n1.n_name IN ('NATION_1', 'NATION_2')
                    AND n2.n_name IN ('NATION_1', 'NATION_2')
                    AND n1.n_name <> n2.n_name
                    AND l_shipdate >= DATE '1996-01-01'
                    AND l_shipdate < DATE '1998-01-01') shipping
            GROUP BY supp_nation, cust_nation, l_year
            ORDER BY supp_nation, cust_nation, l_year"""))

  /** TPC-H Q8: national market share — NATION_6's share of AMERICA's
    * ECONOMY-part order revenue per year. Scale shape: part (type
    * filter) broadcasts into lineitem FIRST (the most selective
    * reduction), orders' date filter pushes to its scan, l ⋈ o is
    * the one shuffle, region→nation→customer collapses to a
    * broadcast keyset, supplier broadcasts with its nation name.
    * Determinism: share = one IEEE division of two ALREADY-ROUNDED
    * sums (the h14 pattern), so the only FP step after the stable
    * 4-decimal sums is deterministic.
    */
  private val h8 = Q(
    "h8_market_share",
    (s, dir) => {
      val america = Tables.load(s, dir, "region")
        .filter(col("r_name") === "AMERICA")
      val natA = Tables.load(s, dir, "nation")
        .join(broadcast(america), col("n_regionkey") === col("r_regionkey"))
      val cust = Tables.load(s, dir, "customer")
        .join(broadcast(natA), col("c_nationkey") === col("n_nationkey"))
        .select("c_custkey")
      val sup = Tables.load(s, dir, "supplier")
        .join(broadcast(Tables.load(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val p = Tables.load(s, dir, "part")
        .filter(col("p_type") === "ECONOMY").select("p_partkey")
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= "1996-01-01" &&
          col("o_orderdate") < "1998-01-01")
      Tables.load(s, dir, "lineitem")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"),
          "left_semi")
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(
          round(sum(when(col("supp_nation") === "NATION_6",
            col("l_extendedprice") * Disc).otherwise(0.0)), 4)
            .as("nation_volume"),
          round(sum(col("l_extendedprice") * Disc), 4).as("total_volume"))
        .withColumn("mkt_share",
          round(lit(100.0) * col("nation_volume") / col("total_volume"), 4))
        .orderBy("o_year")
    },
    Some("""WITH sums AS (
              SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER)
                       AS o_year,
                     round(sum(CASE WHEN n1.n_name = 'NATION_6'
                       THEN l_extendedprice * (1 - l_discount)
                       ELSE 0.0 END), 4) AS nation_volume,
                     round(sum(l_extendedprice * (1 - l_discount)), 4)
                       AS total_volume
              FROM lineitem
              JOIN part ON l_partkey = p_partkey
              JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation n2 ON c_nationkey = n2.n_nationkey
              JOIN region ON n2.n_regionkey = r_regionkey
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation n1 ON s_nationkey = n1.n_nationkey
              WHERE p_type = 'ECONOMY' AND r_name = 'AMERICA'
                AND o_orderdate >= DATE '1996-01-01'
                AND o_orderdate < DATE '1998-01-01'
              GROUP BY 1)
            SELECT o_year, nation_volume, total_volume,
                   round(100.0 * nation_volume / total_volume, 4)
                     AS mkt_share
            FROM sums ORDER BY o_year"""))

  /** TPC-H Q9 (adapted): product-type profit by supplier nation and
    * year. No ps_supplycost, so cost is the DOCUMENTED synthetic
    * 10% of p_retailprice per unit: amount = extprice*(1-disc) −
    * 0.1 * p_retailprice * l_quantity. Name filter '%red%' plays the
    * spec's '%green%'. Scale shape: part's LIKE filter broadcasts
    * into lineitem first, supplier+nation broadcast, l ⋈ o the one
    * shuffle, map-side-combined (nation, year) rollup.
    */
  private val h9 = Q(
    "h9_product_type_profit",
    (s, dir) => {
      val p = Tables.load(s, dir, "part")
        .filter(col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
      val sup = Tables.load(s, dir, "supplier")
        .join(broadcast(Tables.load(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("nation"))
      Tables.load(s, dir, "lineitem")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(Tables.load(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("nation"), year(col("o_orderdate")).as("o_year"))
        .agg(round(sum(col("l_extendedprice") * Disc -
          lit(0.1) * col("p_retailprice") * col("l_quantity")), 4)
          .as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },
    Some("""SELECT n_name AS nation,
                   CAST(EXTRACT(year FROM o_orderdate) AS INTEGER)
                     AS o_year,
                   round(sum(l_extendedprice * (1 - l_discount)
                     - 0.1 * p_retailprice * l_quantity), 4)
                     AS sum_profit
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE p_name LIKE '%red%'
            GROUP BY 1, 2
            ORDER BY nation, o_year DESC"""))

  /** TPC-H Q11 (adapted): important stock. No partsupp availqty, so a
    * part's "stock value" = Σ shipped l_quantity × p_retailprice,
    * carried in EXACT DECIMAL (quantity is integer-valued, retail
    * price 2-decimal → every product and sum is exact, so the
    * threshold comparison cannot ulp-flip). The spec's scalar
    * fraction subquery becomes integer cross-multiplication:
    * keep parts with value × 1250 > Σ value (share > 0.08% — the
    * measured share ceiling at sf0.01 is 0.089%, so this keeps the
    * top ~0.5% of parts, matching the spec's rare-survivors
    * selectivity). Scale
    * shape: one map-side-combined rollup to part cardinality, the
    * global total is a broadcast scalar, no second fact pass.
    */
  private val h11 = Q(
    "h11_important_stock",
    (s, dir) => {
      val p = Tables.load(s, dir, "part")
        .select(col("p_partkey"),
          col("p_retailprice").cast("decimal(12,2)").as("rp"))
      val value = Tables.load(s, dir, "lineitem")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy("p_partkey")
        .agg(sum(col("l_quantity").cast("decimal(12,0)") * col("rp"))
          .as("value"))
      val total = value.agg(sum("value").as("total"))
      value.crossJoin(broadcast(total))
        .filter(col("value") * 1250 > col("total"))
        .select(col("p_partkey"),
          col("value").cast("double").as("stock_value"))
        .orderBy(col("stock_value").desc, col("p_partkey"))
    },
    Some("""WITH value AS (
              SELECT p_partkey,
                     sum(CAST(l_quantity AS DECIMAL(12,0))
                         * CAST(p_retailprice AS DECIMAL(12,2))) AS value
              FROM lineitem JOIN part ON l_partkey = p_partkey
              GROUP BY 1),
            tot AS (SELECT sum(value) AS total FROM value)
            SELECT p_partkey, CAST(value AS DOUBLE) AS stock_value
            FROM value, tot
            WHERE value * 1250 > total
            ORDER BY stock_value DESC, p_partkey"""))

  /** TPC-H Q12 (adapted): shipping modes and priority. No l_shipmode
    * → group by l_linestatus; no l_commitdate/l_receiptdate → "late"
    * = shipped ≥ 90 days after order date (exact timestamp interval
    * arithmetic, no FP). Scale shape: the non-equi lateness
    * predicate rides the orderkey equi-join (never a theta join);
    * high/low CASE counts fold into ONE map-side-combined aggregate.
    */
  private val h12 = Q(
    "h12_priority_shipping",
    (s, dir) => {
      val l = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= "1996-01-01" &&
          col("l_shipdate") < "1997-01-01")
      l.join(Tables.load(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") >= col("o_orderdate") + expr("INTERVAL 90 DAYS"))
        .groupBy("l_linestatus")
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
            .otherwise(1L)).as("low_line_count"))
        .orderBy("l_linestatus")
    },
    Some("""SELECT l_linestatus,
                   CAST(sum(CASE WHEN o_orderpriority
                         IN ('1-URGENT', '2-HIGH')
                       THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                   CAST(sum(CASE WHEN o_orderpriority
                         IN ('1-URGENT', '2-HIGH')
                       THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
            WHERE l_shipdate >= o_orderdate + INTERVAL 90 DAY
              AND l_shipdate >= DATE '1996-01-01'
              AND l_shipdate < DATE '1997-01-01'
            GROUP BY l_linestatus
            ORDER BY l_linestatus"""))

  /** TPC-H Q13 (adapted): customer order-count distribution. The
    * spec's o_comment NOT LIKE filter (column absent) → exclude
    * '4-NOT SPECIFIED' priority; same OUTER-join-with-ON-predicate
    * pattern. Scale shape: orders pre-aggregate to per-custkey
    * counts (map-side combine at fact scale) BEFORE the join, so the
    * custkey shuffle carries counts, not order rows; customers with
    * no qualifying orders survive via the LEFT join + coalesce(0);
    * the distribution rollup is tiny.
    */
  private val h13 = Q(
    "h13_customer_distribution",
    (s, dir) => {
      val perCust = Tables.load(s, dir, "orders")
        .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("cnt"))
      Tables.load(s, dir, "customer")
        .join(perCust, col("c_custkey") === col("o_custkey"), "left")
        .select(coalesce(col("cnt"), lit(0L)).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },
    Some("""SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
            FROM (SELECT c_custkey,
                         CAST(count(o_orderkey) AS BIGINT) AS c_count
                  FROM customer LEFT OUTER JOIN orders
                    ON c_custkey = o_custkey
                   AND o_orderpriority <> '4-NOT SPECIFIED'
                  GROUP BY c_custkey) c_orders
            GROUP BY c_count
            ORDER BY custdist DESC, c_count DESC"""))

  /** TPC-H Q15: top supplier by quarterly revenue. The spec's
    * CREATE VIEW + scalar MAX subquery, decorrelated in-plan: the
    * per-supplier revenue rollup (rounded to 4 decimals BEFORE the
    * max/equality, so the tie test is on identical stable values in
    * both engines) feeds a broadcast scalar max + equality filter —
    * no collect, no single-partition window. Scale shape: one
    * map-side-combined rollup to supplier cardinality; everything
    * after is dim-sized.
    */
  private val h15 = Q(
    "h15_top_supplier",
    (s, dir) => {
      val revenue = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= "1996-01-01" &&
          col("l_shipdate") < "1996-04-01")
        .groupBy("l_suppkey")
        .agg(round(sum(col("l_extendedprice") * Disc), 4)
          .as("total_revenue"))
      val mx = revenue.agg(max("total_revenue").as("max_revenue"))
      revenue.crossJoin(broadcast(mx))
        .filter(col("total_revenue") === col("max_revenue"))
        .join(broadcast(Tables.load(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    },
    Some("""WITH revenue AS (
              SELECT l_suppkey,
                     round(sum(l_extendedprice * (1 - l_discount)), 4)
                       AS total_revenue
              FROM lineitem
              WHERE l_shipdate >= DATE '1996-01-01'
                AND l_shipdate < DATE '1996-04-01'
              GROUP BY l_suppkey)
            SELECT s_suppkey, s_name, total_revenue
            FROM supplier JOIN revenue ON s_suppkey = l_suppkey
            WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
            ORDER BY s_suppkey"""))

  /** TPC-H Q16 (adapted): parts/supplier relationship count. partsupp
    * → the DISTINCT supplier set observed in lineitem per part; the
    * spec's complaints anti-join → suppliers with negative acctbal.
    * Scale shape: part's attribute filters broadcast into lineitem,
    * the tiny excluded-supplier set anti-joins broadcast, and
    * COUNT(DISTINCT) runs as Spark's two-phase distinct aggregate
    * (partial dedup before the shuffle).
    */
  private val h16 = Q(
    "h16_parts_supplier_cnt",
    (s, dir) => {
      val p = Tables.load(s, dir, "part")
        .filter(col("p_brand") =!= "Brand#4" &&
          col("p_type") =!= "ECONOMY" &&
          col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34))
        .select("p_partkey", "p_brand", "p_type", "p_size")
      val bad = Tables.load(s, dir, "supplier")
        .filter(col("s_acctbal") < 0).select("s_suppkey")
      Tables.load(s, dir, "lineitem")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(bad), col("l_suppkey") === col("s_suppkey"),
          "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct("l_suppkey").as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    },
    Some("""SELECT p_brand, p_type, p_size,
                   CAST(count(DISTINCT l_suppkey) AS BIGINT)
                     AS supplier_cnt
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_brand <> 'Brand#4' AND p_type <> 'ECONOMY'
              AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
              AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                    WHERE s_acctbal < 0)
            GROUP BY p_brand, p_type, p_size
            ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""))

  /** TPC-H Q17: small-quantity-order revenue. The correlated
    * 0.2×avg(quantity) subquery, decorrelated: per-part averages
    * computed once and joined back. Determinism: l_quantity is
    * integer-valued, so sum/count (and hence the threshold) is
    * EXACT regardless of aggregation order — the strict < can't
    * ulp-flip. Scale shape: the Brand#4 filter broadcasts into
    * lineitem FIRST, so the per-part average is computed only over
    * the ~3% of the fact that can ever match; both rollups are
    * map-side combined; the avg table broadcasts back.
    */
  private val h17 = Q(
    "h17_small_qty_revenue",
    (s, dir) => {
      val pb = Tables.load(s, dir, "part")
        .filter(col("p_brand") === "Brand#4").select("p_partkey")
      val lf = Tables.load(s, dir, "lineitem")
        .join(broadcast(pb), col("l_partkey") === col("p_partkey"))
        .select("l_partkey", "l_quantity", "l_extendedprice")
      val thresh = lf.groupBy(col("l_partkey").as("pk"))
        .agg((lit(0.2) * avg("l_quantity")).as("thresh"))
      lf.join(broadcast(thresh), col("l_partkey") === col("pk"))
        .filter(col("l_quantity") < col("thresh"))
        .agg(
          round(round(sum("l_extendedprice"), 4) / 7.0, 4)
            .as("avg_yearly"),
          count(lit(1)).as("n_small"))
    },
    Some("""WITH pb AS (SELECT p_partkey FROM part
                        WHERE p_brand = 'Brand#4'),
                 lf AS (SELECT l_partkey, l_quantity, l_extendedprice
                        FROM lineitem JOIN pb ON l_partkey = p_partkey),
                 pa AS (SELECT l_partkey AS pk,
                               0.2 * avg(l_quantity) AS thresh
                        FROM lf GROUP BY 1)
            SELECT round(round(sum(l_extendedprice), 4) / 7.0, 4)
                     AS avg_yearly,
                   CAST(count(*) AS BIGINT) AS n_small
            FROM lf JOIN pa ON l_partkey = pk
            WHERE l_quantity < thresh"""))

  /** TPC-H Q19 (adapted): discounted revenue over DISJUNCTIVE
    * brand/size/quantity bands (p_container absent → p_size bands).
    * The OR-of-ANDs is the pattern under test: Catalyst extracts the
    * common conjuncts it can (join key, the size/quantity upper
    * bounds implied by the union of bands) and leaves the residual
    * disjunction as a post-join filter — part still broadcasts, so
    * no band ever causes a second fact pass.
    */
  private val h19 = Q(
    "h19_disjunctive_revenue",
    (s, dir) => {
      val p = Tables.load(s, dir, "part")
        .select("p_partkey", "p_brand", "p_size")
      Tables.load(s, dir, "lineitem")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" &&
            col("p_size").between(1, 10) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#2" &&
            col("p_size").between(1, 20) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#3" &&
            col("p_size").between(1, 30) &&
            col("l_quantity").between(20, 30)))
        .agg(
          round(sum(col("l_extendedprice") * Disc), 4).as("revenue"),
          count(lit(1)).as("n_lines"))
    },
    Some("""SELECT round(sum(l_extendedprice * (1 - l_discount)), 4)
                     AS revenue,
                   CAST(count(*) AS BIGINT) AS n_lines
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE (p_brand = 'Brand#1'
                   AND p_size BETWEEN 1 AND 10
                   AND l_quantity BETWEEN 1 AND 11)
               OR (p_brand = 'Brand#2'
                   AND p_size BETWEEN 1 AND 20
                   AND l_quantity BETWEEN 10 AND 20)
               OR (p_brand = 'Brand#3'
                   AND p_size BETWEEN 1 AND 30
                   AND l_quantity BETWEEN 20 AND 30)"""))

  /** TPC-H Q20 (adapted): potential part promotion. The spec's
    * "supplier holds > 50% of a part's qty" (partsupp availqty
    * absent) → "supplier SHIPPED > 20% of a PROMO part's total
    * shipped quantity" (measured dominant-share ceiling at sf0.01 is
    * 20.8%, so >50% would be vacuous here; the >20% bar keeps the
    * spec's rare-qualifiers selectivity) — the same nested
    * IN-subquery-with-per-group-threshold shape. All-integer
    * arithmetic (quantities cast to BIGINT, cross-multiplied ×5
    * instead of a fraction) → exact.
    * Scale shape: PROMO filter broadcasts into lineitem; ONE
    * map-side-combined (part, supplier) rollup; the part totals
    * derive from that rollup (never a second fact pass); the
    * qualifying supplier keyset semi-joins broadcast.
    */
  private val h20 = Q(
    "h20_potential_promotion",
    (s, dir) => {
      val promo = Tables.load(s, dir, "part")
        .filter(col("p_type") === "PROMO").select("p_partkey")
      val ps = Tables.load(s, dir, "lineitem")
        .join(broadcast(promo), col("l_partkey") === col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(sum(col("l_quantity").cast("long")).as("qty"))
      val tot = ps.groupBy(col("l_partkey").as("pk"))
        .agg(sum("qty").as("total"))
      val dominant = ps.join(tot, col("l_partkey") === col("pk"))
        .filter(col("qty") * 5 > col("total"))
        .select("l_suppkey")
      Tables.load(s, dir, "supplier")
        .join(broadcast(dominant),
          col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy("s_suppkey")
    },
    Some("""WITH promo AS (SELECT p_partkey FROM part
                           WHERE p_type = 'PROMO'),
                 ps AS (SELECT l_partkey, l_suppkey,
                               sum(CAST(l_quantity AS BIGINT)) AS qty
                        FROM lineitem JOIN promo ON l_partkey = p_partkey
                        GROUP BY 1, 2),
                 tot AS (SELECT l_partkey AS pk, sum(qty) AS total
                         FROM ps GROUP BY 1)
            SELECT s_suppkey, s_name, s_acctbal
            FROM supplier
            WHERE s_suppkey IN (SELECT l_suppkey
                                FROM ps JOIN tot ON l_partkey = pk
                                WHERE qty * 5 > total)
            ORDER BY s_suppkey"""))

  /** TPC-H Q21 (adapted): suppliers who kept orders waiting. "Only
    * supplier whose lineitem was late" (commit/receipt dates absent)
    * → "only supplier whose lineitem was RETURNED in a finished,
    * multi-supplier order": identical EXISTS (another supplier
    * shipped in the order) + NOT EXISTS (another supplier was also
    * at fault) double self-join shape. Scale shape: the R-filter
    * and status filter push to the scans; all three lineitem sides
    * shuffle on the SAME orderkey (one exchange reused across the
    * semi and anti joins); supplier broadcasts; top-25 via
    * TakeOrderedAndProject.
    */
  private val h21 = Q(
    "h21_waiting_suppliers",
    (s, dir) => {
      val l = Tables.load(s, dir, "lineitem")
      val l1 = l.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_suppkey"))
      val ord = Tables.load(s, dir, "orders")
        .filter(col("o_orderstatus") === "F").select("o_orderkey")
      val l2 = l.select(col("l_orderkey").as("k2"),
        col("l_suppkey").as("s2"))
      val l3 = l.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("k3"), col("l_suppkey").as("s3"))
      l1.join(ord, col("l_orderkey") === col("o_orderkey"), "left_semi")
        .join(l2, col("l_orderkey") === col("k2") &&
          col("l_suppkey") =!= col("s2"), "left_semi")
        .join(l3, col("l_orderkey") === col("k3") &&
          col("l_suppkey") =!= col("s3"), "left_anti")
        .join(broadcast(Tables.load(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(25)
    },
    Some("""SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
            FROM supplier, lineitem l1, orders
            WHERE s_suppkey = l1.l_suppkey
              AND o_orderkey = l1.l_orderkey
              AND o_orderstatus = 'F'
              AND l1.l_returnflag = 'R'
              AND EXISTS (SELECT 1 FROM lineitem l2
                          WHERE l2.l_orderkey = l1.l_orderkey
                            AND l2.l_suppkey <> l1.l_suppkey)
              AND NOT EXISTS (SELECT 1 FROM lineitem l3
                              WHERE l3.l_orderkey = l1.l_orderkey
                                AND l3.l_suppkey <> l1.l_suppkey
                                AND l3.l_returnflag = 'R')
            GROUP BY s_name
            ORDER BY numwait DESC, s_name
            LIMIT 25"""))

  /** TPC-H Q22 (adapted): global sales opportunity. c_phone country
    * codes (absent) → odd c_nationkey ∈ {1..13}; "no orders in 7
    * years" → no orders since 2000-01-01. Determinism: the
    * above-average-balance test runs in EXACT DECIMAL via integer
    * cross-multiplication — c_acctbal×count > Σ acctbal — instead of
    * comparing against a double average (double→decimal(18,6) casts
    * are correctly rounded in both engines and scale-6 halves are
    * not dyadic, so the cast itself cannot diverge). Scale shape:
    * the positive-balance stats collapse to ONE broadcast scalar
    * row; the inactivity test is a broadcast-able anti join on the
    * date-filtered orders keyset; the final rollup is map-side
    * combined at nation cardinality.
    */
  private val h22 = Q(
    "h22_global_sales_opportunity",
    (s, dir) => {
      val target = Tables.load(s, dir, "customer")
        .filter(col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13))
        .withColumn("bal", col("c_acctbal").cast("decimal(18,6)"))
      val stats = target.filter(col("bal") > 0)
        .agg(sum("bal").as("sum_bal"), count(lit(1)).as("n_pos"))
      val recent = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= "2000-01-01")
        .select("o_custkey")
      target.crossJoin(broadcast(stats))
        .filter(col("bal") * col("n_pos") > col("sum_bal"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey").as("cntrycode"))
        .agg(count(lit(1)).as("numcust"),
          round(sum("bal").cast("double"), 2).as("totacctbal"))
        .orderBy("cntrycode")
    },
    Some("""WITH target AS (
              SELECT c_custkey, c_nationkey,
                     CAST(c_acctbal AS DECIMAL(18,6)) AS bal
              FROM customer
              WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)),
            stats AS (SELECT sum(bal) AS sum_bal,
                             CAST(count(*) AS BIGINT) AS n_pos
                      FROM target WHERE bal > 0)
            SELECT c_nationkey AS cntrycode,
                   CAST(count(*) AS BIGINT) AS numcust,
                   round(CAST(sum(bal) AS DOUBLE), 2) AS totacctbal
            FROM target, stats
            WHERE bal * n_pos > sum_bal
              AND NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey
                                AND o_orderdate >= DATE '2000-01-01')
            GROUP BY c_nationkey
            ORDER BY cntrycode"""))

  val all: Seq[Q] =
    Seq(h2, h4, h7, h8, h9, h11, h12, h13, h15, h16, h17, h19, h20, h21,
      h22)
}
