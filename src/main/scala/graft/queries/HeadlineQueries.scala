package graft.queries

import graft.Q
import graft.ops.Tables
import org.apache.spark.sql.functions._

/** TPC-H headline queries over the TPC-H-shaped testdata (TESTDATA.md) —
  * the industry-comparable wall-time anchors (Q1 pricing summary, Q3
  * shipping priority, Q18 large-order customers), parameterized to this
  * data's date range (1995-01 .. 2001-11) and per-order quantity
  * distribution (p99 = 262, max = 458). Each composes already-proven
  * operators (scan-pruned filter → partial agg; broadcast dim ⋈
  * co-partitioned fact ⋈ fact → TakeOrdered; having-filtered agg
  * re-joined) — the value of the rows is the benchmark anchor, so the
  * plans are deliberately the canonical at-scale shapes:
  *  - h1: one scan, filter + projection pushed to parquet, 6-group
  *    map-side-combined aggregate — no shuffle grows with data.
  *  - h3: customer is the small dim (broadcast, no shuffle); orders ⋈
  *    lineitem shuffles on the shared orderkey; top-10 via
  *    TakeOrderedAndProject (per-partition heaps, never a full sort).
  *  - h18: lineitem self-aggregates to per-order totals (map-side
  *    combine), the >300 HAVING filter reduces to dozens of rows which
  *    then join orders and broadcast customer.
  * Ref: the reference's pandasql roll-ups (covid_simulator.py:63-69)
  * are the same scan→join→agg shapes; these are the standard-benchmark
  * formulations at scale.
  */
object HeadlineQueries {

  /** TPC-H Q1: pricing summary report. Cutoff 1998-09-02 keeps ~54% of
    * lineitem, matching the spec's intent (bulk-of-table scan+agg).
    *
    * Money/quantity aggregates sum DECIMAL(30,6)
    * ([[graft.ops.ExactNum]]), not DOUBLE: a double
    * SUM is accumulation-order-dependent, and the round-14 sampled sf1
    * oracle audit caught exactly that — at 6M rows Spark's partial-agg
    * tree and DuckDB's accumulator drifted 1e-14 relative on
    * sum_disc_price, enough for the rounded 4th decimal to straddle
    * (…16.25 vs …16.2499). The per-row product stays IEEE double
    * (identical in both engines), is cast once to DECIMAL(30,6)
    * (exact at 6M × 1e5 magnitude), summed exactly/associatively, and
    * cast back to double for the reported rounding — deterministic at
    * ANY row count and parallelism, which is the 100 TB contract.
    * Averages divide the same exact sum by the group count.
    */
  private val h1 = Q(
    "h1_pricing_summary",
    (s, dir) => {
      import graft.ops.ExactNum.dsum
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(dsum(col("l_quantity")), 4).as("sum_qty"),
          round(dsum(col("l_extendedprice")), 4).as("sum_base_price"),
          round(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
            .as("sum_disc_price"),
          round(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * (lit(1.0) + col("l_tax"))), 4).as("sum_charge"),
          round(dsum(col("l_quantity")) / count(lit(1)), 4).as("avg_qty"),
          round(dsum(col("l_extendedprice")) / count(lit(1)), 4)
            .as("avg_price"),
          round(dsum(col("l_discount")) / count(lit(1)), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some {
      import graft.ops.ExactNum.dsumSql
      s"""SELECT l_returnflag, l_linestatus,
            round(${dsumSql("l_quantity")}, 4) AS sum_qty,
            round(${dsumSql("l_extendedprice")}, 4) AS sum_base_price,
            round(${dsumSql("l_extendedprice * (1 - l_discount)")}, 4)
              AS sum_disc_price,
            round(${dsumSql(
              "l_extendedprice * (1 - l_discount) * (1 + l_tax)")}, 4)
              AS sum_charge,
            round(${dsumSql("l_quantity")} / count(*), 4) AS avg_qty,
            round(${dsumSql("l_extendedprice")} / count(*), 4) AS avg_price,
            round(${dsumSql("l_discount")} / count(*), 4) AS avg_disc,
            CAST(count(*) AS BIGINT) AS count_order
          FROM lineitem
          WHERE l_shipdate <= '1998-09-02'
          GROUP BY l_returnflag, l_linestatus
          ORDER BY l_returnflag, l_linestatus"""
    })

  /** TPC-H Q3: shipping priority — top 10 unshipped BUILDING-segment
    * orders by potential revenue as of 1998-03-15. (The testdata has no
    * o_shippriority column; o_orderpriority carries the same role.)
    * Deterministic top-10: tie-break on o_orderdate then l_orderkey.
    */
  private val h3 = Q(
    "h3_shipping_priority",
    (s, dir) => {
      val c = Tables.load(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") < "1998-03-15")
      val l = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") > "1998-03-15")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"),
          col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    },
    Some("""SELECT l_orderkey,
              round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
              o_orderdate, o_orderpriority
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < '1998-03-15'
              AND l_shipdate > '1998-03-15'
            GROUP BY l_orderkey, o_orderdate, o_orderpriority
            ORDER BY revenue DESC, o_orderdate, l_orderkey
            LIMIT 10"""))

  /** TPC-H Q18: large-order customers — orders whose total quantity
    * exceeds 300 (46 of 15k orders at sf0.01; p99 is 262, so this is
    * the spec's rare-giants selectivity), joined back to orders and the
    * broadcast customer dim. LIMIT 100 per the spec, deterministic via
    * the o_totalprice DESC / o_orderdate / o_orderkey sort.
    */
  private val h18 = Q(
    "h18_large_orders",
    (s, dir) => {
      val bigOrders = Tables.load(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(round(sum("l_quantity"), 4).as("total_qty"))
        .filter(col("total_qty") > 300.0)
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer")
      bigOrders.join(o, bigOrders("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderdate"),
          col("o_orderkey"))
        .limit(100)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
          "o_totalprice", "total_qty")
    },
    Some("""SELECT c_name, c_custkey, o_orderkey, o_orderdate,
              o_totalprice, total_qty
            FROM (SELECT l_orderkey,
                         round(sum(l_quantity), 4) AS total_qty
                  FROM lineitem GROUP BY l_orderkey
                  HAVING round(sum(l_quantity), 4) > 300.0) big
            JOIN orders ON big.l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
            LIMIT 100"""))

  /** TPC-H Q5: local-supplier volume — revenue per nation from orders
    * where customer and supplier sit in the same ASIA nation, order
    * year 1996. The full star-join shape: region and nation broadcast
    * (tiny dims), customer broadcast after its region semi-filter,
    * lineitem ⋈ orders shuffles once on orderkey, and the
    * same-nation predicate rides the supplier join. Exercises every
    * dim tier of the schema in one plan.
    */
  private val h5 = Q(
    "h5_local_supplier_volume",
    (s, dir) => {
      val asia = Tables.load(s, dir, "region")
        .filter(col("r_name") === "ASIA")
      val nat = Tables.load(s, dir, "nation")
        .join(broadcast(asia), col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")
      val cust = Tables.load(s, dir, "customer")
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .select("c_custkey", "c_nationkey", "n_name")
      val ord = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= "1996-01-01" &&
          col("o_orderdate") < "1997-01-01")
      val sup = Tables.load(s, dir, "supplier")
        .select("s_suppkey", "s_nationkey")
      Tables.load(s, dir, "lineitem")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .groupBy("n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    Some("""SELECT n_name,
              round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
                         AND c_nationkey = s_nationkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND o_orderdate >= '1996-01-01'
              AND o_orderdate < '1997-01-01'
            GROUP BY n_name
            ORDER BY revenue DESC, n_name"""))

  /** TPC-H Q10: returned-item reporting — top 20 customers by revenue
    * lost to returns in a quarter (1996-Q4 here; the testdata has no
    * address/phone/comment columns, so c_mktsegment stands in for the
    * contact detail). Canonical at-scale shape: both fact filters
    * (date range on orders, returnflag on lineitem) push to the
    * parquet scans; orders ⋈ lineitem shuffles on the shared orderkey
    * and aggregates to customer cardinality BEFORE the dimension
    * joins (revenue first, then decorate — the agg-then-join order
    * is what keeps the wide customer row out of the big shuffle);
    * nation broadcasts; top-20 via TakeOrderedAndProject.
    */
  private val h10 = Q(
    "h10_returned_item_ranking",
    (s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= "1996-10-01" &&
          col("o_orderdate") < "1997-01-01")
      val l = Tables.load(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
      val rev = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_custkey")
        .agg(round(sum(col("l_extendedprice") *
          (lit(1.0) - col("l_discount"))), 4).as("revenue"))
      rev
        .join(Tables.load(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.load(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_name"), col("revenue"),
          col("c_acctbal"), col("n_name"), col("c_mktsegment"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },
    Some("""SELECT c_custkey, c_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 4)
                     AS revenue,
                   c_acctbal, n_name, c_mktsegment
            FROM customer, orders, lineitem, nation
            WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
              AND o_orderdate >= DATE '1996-10-01'
              AND o_orderdate < DATE '1997-01-01'
              AND l_returnflag = 'R'
              AND c_nationkey = n_nationkey
            GROUP BY c_custkey, c_name, c_acctbal, n_name, c_mktsegment
            ORDER BY revenue DESC, c_custkey
            LIMIT 20"""))

  /** TPC-H Q6: forecast revenue change — the pure-scan benchmark (no
    * join at all): one filtered pass over lineitem, three predicates
    * all pushed to parquet, one scalar sum. At 100 TB this is the
    * query whose cost IS the scan — any shuffle or join in its plan
    * would be a bug, and PlanSpec-style inspection shows none.
    * Discount band widened to this data's 0.00-0.10 distribution.
    */
  private val h6 = Q(
    "h6_forecast_revenue",
    (s, dir) => {
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= "1996-01-01" &&
          col("l_shipdate") < "1997-01-01" &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 4)
          .as("revenue"),
          count(lit(1)).as("n_lines"))
    },
    Some("""SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
                   CAST(count(*) AS BIGINT) AS n_lines
            FROM lineitem
            WHERE l_shipdate >= DATE '1996-01-01'
              AND l_shipdate < DATE '1997-01-01'
              AND l_discount >= 0.05 AND l_discount <= 0.07
              AND l_quantity < 24"""))

  /** TPC-H Q14: promotion effect — what fraction of a month's revenue
    * came from PROMO parts. Lineitem's month slice (pushed to the
    * scan) joins part on partkey; the conditional/total revenue pair
    * is ONE map-side-combined aggregate and the percentage is computed
    * from the two ALREADY-ROUNDED sums, so the only cross-engine FP
    * step after the (4-decimal-stable) sums is one deterministic IEEE
    * division. part joins broadcast at dim scale.
    */
  private val h14 = Q(
    "h14_promo_effect",
    (s, dir) => {
      val l = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= "1996-09-01" &&
          col("l_shipdate") < "1996-10-01")
      val p = Tables.load(s, dir, "part")
      l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .agg(
          round(sum(when(col("p_type") === "PROMO",
            col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .otherwise(0.0)), 4).as("promo_revenue"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))),
            4).as("total_revenue"))
        .withColumn("promo_pct",
          round(lit(100.0) * col("promo_revenue") / col("total_revenue"), 4))
    },
    Some("""WITH sums AS (
              SELECT round(sum(CASE WHEN p_type = 'PROMO'
                       THEN l_extendedprice * (1 - l_discount)
                       ELSE 0.0 END), 4) AS promo_revenue,
                     round(sum(l_extendedprice * (1 - l_discount)), 4)
                       AS total_revenue
              FROM lineitem, part
              WHERE l_partkey = p_partkey
                AND l_shipdate >= DATE '1996-09-01'
                AND l_shipdate < DATE '1996-10-01')
            SELECT promo_revenue, total_revenue,
                   round(100.0 * promo_revenue / total_revenue, 4)
                     AS promo_pct
            FROM sums"""))

  val all: Seq[Q] = Seq(h1, h3, h5, h18, h10, h6, h14)
}
