package graft.queries

import graft.Q
import graft.ops.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Aggregation operators (SURVEY.md §2.4) + the embedded SQL surface
  * (§2.11). All aggregates are hash aggregations with partial (map-side)
  * combine — Catalyst's default physical plan — so at 100 TB each
  * groupBy shuffles only the partially-aggregated keyspace, not rows.
  * Double-valued aggregates are rounded to 4 decimals on BOTH the Spark
  * and DuckDB side so summation-order ULP drift cannot break the hash
  * compare.
  */
object AggQueries {

  /** A1 group-by mean. Ref: covid_data_transform.py:28,167 (weather
    * mean per (date, country, state)). */
  private val a1 = Q(
    "a1_group_avg",
    (s, dir) => {
      Tables.load(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_extendedprice"), 4).as("avg_price"),
          round(avg("l_discount"), 4).as("avg_disc"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some("""SELECT l_returnflag, l_linestatus,
                   round(avg(l_quantity), 4) AS avg_qty,
                   round(avg(l_extendedprice), 4) AS avg_price,
                   round(avg(l_discount), 4) AS avg_disc
            FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** A2 group-by sum + A3 group-by max (country roll-up; max date_idx).
    * Ref: covid_data_transform.py:43,77,241. */
  private val a2a3 = Q(
    "a2_group_sum_max",
    (s, dir) => {
      // DECIMAL-backed sum (graft.ops.ExactNum): a double SUM is
      // accumulation-order-dependent and the sf1 oracle audit measured
      // Spark/DuckDB drifting 1e-14 relative at 1.5M rows — enough to
      // straddle the rounded 4th decimal.
      Tables.load(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(round(graft.ops.ExactNum.dsum(col("o_totalprice")), 4)
            .as("sum_price"),
          max("o_orderdate").as("max_date"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    },
    Some(s"""SELECT o_orderpriority,
                    round(${graft.ops.ExactNum.dsumSql("o_totalprice")}, 4)
                      AS sum_price,
                    max(o_orderdate) AS max_date, count(*) AS n
             FROM orders GROUP BY 1 ORDER BY 1"""))

  /** A4 global scalar aggregates (min/mean/std/max pulled to driver).
    * Ref: covid_data_transform.py:127; covid_simulator.py:72,102. */
  private val a4 = Q(
    "a4_global_scalars",
    (s, dir) => {
      Tables.load(s, dir, "lineitem")
        .agg(min("l_shipdate").as("min_ship"),
          max("l_shipdate").as("max_ship"),
          round(avg("l_quantity"), 4).as("mean_qty"),
          round(stddev("l_quantity"), 4).as("std_qty"),
          count(lit(1)).as("n"))
    },
    Some("""SELECT min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship,
                   round(avg(l_quantity), 4) AS mean_qty,
                   round(stddev_samp(l_quantity), 4) AS std_qty,
                   count(*) AS n
            FROM lineitem"""))

  /** A5 SQL aggregate with NULL-default + positional GROUP BY — the
    * pandasql surface rewritten to Spark SQL (ifnull → coalesce).
    * Ref: covid_simulator.py:63-69.
    */
  private val a5 = Q(
    "a5_sql_positional_groupby",
    (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""SELECT o_orderstatus, o_orderpriority,
                      round(avg(coalesce(o_totalprice, 0)), 4) AS avg_price,
                      count(*) AS n
               FROM orders GROUP BY 1, 2 ORDER BY 1, 2""")
    },
    Some("""SELECT o_orderstatus, o_orderpriority,
                   round(avg(coalesce(o_totalprice, 0)), 4) AS avg_price,
                   count(*) AS n
            FROM orders GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** A6 pivot long→wide with mean agg (weather element → TAVG column).
    * Pivot values pinned explicitly — at scale this avoids the extra
    * distinct-values job Spark otherwise runs.
    * Ref: covid_data_transform.py:160-162.
    */
  private val a6 = Q(
    "a6_pivot",
    (s, dir) => {
      Tables.load(s, dir, "lineitem")
        .groupBy("l_suppkey")
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(round(avg("l_quantity"), 4))
        .orderBy("l_suppkey")
    },
    Some("""SELECT l_suppkey,
                   round(avg(CASE WHEN l_returnflag='A' THEN l_quantity END), 4) AS "A",
                   round(avg(CASE WHEN l_returnflag='N' THEN l_quantity END), 4) AS "N",
                   round(avg(CASE WHEN l_returnflag='R' THEN l_quantity END), 4) AS "R"
            FROM lineitem GROUP BY 1 ORDER BY 1"""))

  /** A7 unpivot wide→long (the ~96 JHU date columns → rows).
    * Ref: covid_data_transform.py:80-92.
    */
  private val a7 = Q(
    "a7_unpivot",
    (s, dir) => {
      Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
          "l_discount", "l_tax")
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"),
            col("l_tax")),
          "measure", "value")
        // (l_orderkey, l_linenumber, measure) is not unique — add value
        // as tiebreaker for a deterministic total order on both engines.
        .orderBy("l_orderkey", "l_linenumber", "measure", "value")
    },
    Some("""SELECT l_orderkey, l_linenumber, measure, value FROM (
              SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
                     l_quantity AS value FROM lineitem
              UNION ALL
              SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
              FROM lineitem
              UNION ALL
              SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
              FROM lineitem
              UNION ALL
              SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem)
            ORDER BY l_orderkey, l_linenumber, measure, value"""))

  /** A8 grouped HAVING-style admission filter, detail rows kept via
    * semi-join back (series with ≥730 rows and fresh max date).
    * Ref: weather_pred.py:179-194.
    */
  private val a8 = Q(
    "a8_having_semi_back",
    (s, dir) => {
      val o = Tables.load(s, dir, "orders")
      val admitted = o.groupBy("o_custkey")
        .agg(count(lit(1)).as("cnt"), max("o_totalprice").as("mx"))
        .filter(col("cnt") >= 15 && col("mx") > 150000)
        .select("o_custkey")
      o.join(admitted, Seq("o_custkey"), "left_semi")
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey, o_totalprice FROM orders
            WHERE o_custkey IN (
              SELECT o_custkey FROM orders GROUP BY 1
              HAVING count(*) >= 15 AND max(o_totalprice) > 150000)
            ORDER BY o_custkey, o_orderkey"""))

  /** A9 conditional sum over a per-group window slice — the R₀
    * estimator: sum of positive day-over-day increments within the
    * first 30 ordered rows of each group.
    * Ref: covid_simulator.py:393-410.
    */
  private val a9 = Q(
    "a9_conditional_windowed_sum",
    (s, dir) => {
      val w = Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
      Tables.load(s, dir, "lineitem")
        .withColumn("rn", row_number().over(w))
        .withColumn("d", col("l_extendedprice") - lag("l_extendedprice", 1).over(w))
        .filter(col("rn") <= 30)
        .groupBy("l_suppkey")
        .agg(round(sum(when(col("d") > 0, col("d")).otherwise(lit(0.0))), 4)
          .as("pos_increments"))
        .orderBy("l_suppkey")
    },
    Some("""SELECT l_suppkey,
                   round(sum(CASE WHEN d > 0 THEN d ELSE 0 END), 4)
                     AS pos_increments
            FROM (
              SELECT l_suppkey,
                row_number() OVER w AS rn,
                l_extendedprice - lag(l_extendedprice, 1) OVER w AS d
              FROM lineitem
              WINDOW w AS (PARTITION BY l_suppkey
                           ORDER BY l_shipdate, l_orderkey, l_linenumber))
            WHERE rn <= 30 GROUP BY 1 ORDER BY 1"""))

  /** A10 mean-imputation of out-of-range values (R_0==0 → mean of
    * positive R_0). Ref: covid_simulator.py:445-446.
    */
  private val a10 = Q(
    "a10_mean_impute",
    (s, dir) => {
      val c = Tables.load(s, dir, "customer")
      val posMean = c.filter(col("c_acctbal") > 0)
        .agg(avg("c_acctbal").as("mu"))
      c.crossJoin(broadcast(posMean))
        .withColumn("acctbal_imputed",
          round(when(col("c_acctbal") < 0, col("mu"))
            .otherwise(col("c_acctbal")), 4))
        .select("c_custkey", "acctbal_imputed")
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey,
                   round(CASE WHEN c_acctbal < 0
                         THEN (SELECT avg(c_acctbal) FROM customer
                               WHERE c_acctbal > 0)
                         ELSE c_acctbal END, 4) AS acctbal_imputed
            FROM customer ORDER BY c_custkey"""))

  /** A11 (beyond the reference): ROLLUP hierarchy totals — flag,
    * (flag, status), and grand total in one aggregation pass.
    */
  private val a11 = Q(
    "a11_rollup",
    (s, dir) => {
      Tables.load(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(round(sum("l_quantity"), 4).as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    },
    Some("""SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 4) AS sum_qty, count(*) AS n
            FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
            ORDER BY l_returnflag ASC NULLS FIRST,
                     l_linestatus ASC NULLS FIRST"""))

  /** U2 (beyond the reference): INTERSECT / EXCEPT — customers with
    * orders in both halves of the date range vs only the first half.
    */
  private val u2 = Q(
    "u2_intersect_except",
    (s, dir) => {
      val o = Tables.load(s, dir, "orders")
      val early = o.filter(col("o_orderdate") < "1998-01-01")
        .select("o_custkey")
      val late = o.filter(col("o_orderdate") >= "1998-01-01")
        .select("o_custkey")
      early.intersect(late).withColumn("cohort", lit("both"))
        .unionByName(early.except(late).withColumn("cohort", lit("early_only")))
        .orderBy("cohort", "o_custkey")
    },
    Some("""SELECT o_custkey, 'both' AS cohort FROM (
              SELECT o_custkey FROM orders WHERE o_orderdate < '1998-01-01'
              INTERSECT
              SELECT o_custkey FROM orders WHERE o_orderdate >= '1998-01-01')
            UNION ALL
            SELECT o_custkey, 'early_only' AS cohort FROM (
              SELECT o_custkey FROM orders WHERE o_orderdate < '1998-01-01'
              EXCEPT
              SELECT o_custkey FROM orders WHERE o_orderdate >= '1998-01-01')
            ORDER BY cohort, o_custkey"""))

  /** U3 (beyond the reference): BAG-semantics set operations —
    * INTERSECT ALL / EXCEPT ALL preserve multiplicities (a customer
    * with 3 early and 2 late orders appears twice in the intersection
    * and once in the early-only difference), where u2's set variants
    * collapse them. The distinction matters whenever row counts carry
    * meaning (per-order rows, not per-customer membership).
    */
  private val u3 = Q(
    "u3_bag_setops",
    (s, dir) => {
      val o = Tables.load(s, dir, "orders")
      val early = o.filter(col("o_orderdate") < "1998-01-01")
        .select("o_custkey")
      val late = o.filter(col("o_orderdate") >= "1998-01-01")
        .select("o_custkey")
      early.intersectAll(late).withColumn("cohort", lit("both_bag"))
        .unionByName(early.exceptAll(late)
          .withColumn("cohort", lit("early_excess")))
        .groupBy("o_custkey", "cohort")
        .agg(count(lit(1)).as("multiplicity"))
        .orderBy("cohort", "o_custkey")
    },
    Some("""SELECT o_custkey, cohort, count(*) AS multiplicity FROM (
              SELECT o_custkey, 'both_bag' AS cohort FROM (
                SELECT o_custkey FROM orders WHERE o_orderdate < '1998-01-01'
                INTERSECT ALL
                SELECT o_custkey FROM orders WHERE o_orderdate >= '1998-01-01')
              UNION ALL
              SELECT o_custkey, 'early_excess' FROM (
                SELECT o_custkey FROM orders WHERE o_orderdate < '1998-01-01'
                EXCEPT ALL
                SELECT o_custkey FROM orders WHERE o_orderdate >= '1998-01-01'))
            GROUP BY 1, 2 ORDER BY cohort, o_custkey"""))

  /** A12 (beyond the reference): CUBE over two dimensions with
    * GROUPING() disambiguation — all four grouping strata in one pass.
    * At scale this is one shuffle; Spark expands the cube map-side and
    * partial-aggregates every stratum before exchange.
    */
  private val a12 = Q(
    "a12_cube",
    (s, dir) => {
      Tables.load(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(grouping("l_returnflag").cast("long").as("g_rf"),
          grouping("l_linestatus").cast("long").as("g_ls"),
          round(sum("l_quantity"), 4).as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy("g_rf", "g_ls", "l_returnflag", "l_linestatus")
    },
    Some("""SELECT l_returnflag, l_linestatus,
                   CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
                   CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
                   round(sum(l_quantity), 4) AS sum_qty,
                   count(*) AS n
            FROM lineitem
            GROUP BY CUBE(l_returnflag, l_linestatus)
            ORDER BY g_rf, g_ls, l_returnflag, l_linestatus"""))

  /** A13 (beyond the reference): second-moment statistics — Pearson
    * correlation, sample/population covariance, population stddev and
    * variance, and the closed-form OLS regression aggregates. All are
    * single-pass partial-aggregable sums, so one shuffle at any scale.
    */
  private val a13 = Q(
    "a13_stats_moments",
    (s, dir) => {
      Tables.load(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(corr("l_quantity", "l_extendedprice"), 4).as("corr_qp"),
          round(covar_samp("l_quantity", "l_extendedprice"), 4).as("covs_qp"),
          round(covar_pop("l_quantity", "l_extendedprice"), 4).as("covp_qp"),
          round(stddev_pop("l_quantity"), 4).as("sd_qty"),
          round(var_pop("l_quantity"), 4).as("var_qty"),
          round(regr_slope(col("l_extendedprice"), col("l_quantity")), 4)
            .as("slope"),
          round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 4)
            .as("icept"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag,
                   round(corr(l_quantity, l_extendedprice), 4) AS corr_qp,
                   round(covar_samp(l_quantity, l_extendedprice), 4) AS covs_qp,
                   round(covar_pop(l_quantity, l_extendedprice), 4) AS covp_qp,
                   round(stddev_pop(l_quantity), 4) AS sd_qty,
                   round(var_pop(l_quantity), 4) AS var_qty,
                   round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
                   round(regr_intercept(l_extendedprice, l_quantity), 4)
                     AS icept
            FROM lineitem GROUP BY 1 ORDER BY 1"""))

  /** A14 (beyond the reference): exact percentiles (linear
    * interpolation) per group — quartiles + median + IQR. Exact
    * percentile requires the group's values sorted (Spark collects the
    * per-group value multiset); the approx scale path for wide groups is
    * sk1's approx_percentile sketch.
    */
  private val a14 = Q(
    "a14_percentile",
    (s, dir) => {
      Tables.load(s, dir, "lineitem")
        .groupBy("l_linestatus")
        .agg(
          round(percentile(col("l_quantity"), lit(0.25)), 4).as("q25"),
          round(percentile(col("l_quantity"), lit(0.5)), 4).as("median_qty"),
          round(percentile(col("l_quantity"), lit(0.75)), 4).as("q75"),
          round(percentile(col("l_extendedprice"), lit(0.9)), 4).as("p90_price"),
          count(lit(1)).as("n"))
        .withColumn("iqr", round(col("q75") - col("q25"), 4))
        .orderBy("l_linestatus")
    },
    Some("""SELECT l_linestatus,
                   round(quantile_cont(l_quantity, 0.25), 4) AS q25,
                   round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
                   round(quantile_cont(l_quantity, 0.75), 4) AS q75,
                   round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
                   count(*) AS n,
                   round(round(quantile_cont(l_quantity, 0.75), 4)
                     - round(quantile_cont(l_quantity, 0.25), 4), 4) AS iqr
            FROM lineitem GROUP BY 1 ORDER BY 1"""))

  /** A15 (beyond the reference): custom typed `Aggregator` — top-3
    * orders per customer via [[graft.functions.TopKAggregator]], whose
    * k-bounded buffer replaces sort-then-row_number: map-side partials
    * ship k rows per group per task through the shuffle instead of the
    * group's full row set, and merge is an O(k) list merge. The oracle
    * is the row_number spelling with the identical total order, so the
    * hash proves the bounded-state path returns exactly the sort path's
    * answer.
    */
  private val a15 = Q(
    "a15_topk_aggregator",
    (s, dir) => {
      import s.implicits._
      val topk = new graft.functions.TopKAggregator(3).toColumn
      Tables.load(s, dir, "orders")
        .filter(col("o_custkey") <= 200)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .as[(Long, Long, Double)]
        .groupByKey(_._1)
        .mapValues(r => (r._2, r._3))
        .agg(topk.name("top"))
        .toDF("o_custkey", "top")
        .select(col("o_custkey"), posexplode(col("top")).as(Seq("i", "t")))
        .select(col("o_custkey"), (col("i") + 1).as("rank"),
          col("t._1").as("o_orderkey"), col("t._2").as("o_totalprice"))
        .orderBy("o_custkey", "rank")
    },
    Some("""SELECT o_custkey, CAST(rank AS INT) AS rank, o_orderkey,
                   o_totalprice
            FROM (
              SELECT o_custkey, o_orderkey, o_totalprice,
                row_number() OVER (PARTITION BY o_custkey
                  ORDER BY o_totalprice DESC, o_orderkey) AS rank
              FROM orders WHERE o_custkey <= 200)
            WHERE rank <= 3 ORDER BY o_custkey, rank"""))

  /** A16 (beyond the reference): argmin/argmax aggregates — the value
    * of one column at another column's extreme, the single-pass
    * alternative to a self-join or window for "the order key of the
    * cheapest/priciest order per customer". Spelled as min/max over
    * (price, orderkey) STRUCTS rather than min_by/max_by: Spark's
    * min_by tie behavior is non-deterministic, while struct ordering
    * makes the tie-break explicit (cheapest tie → smallest orderkey,
    * priciest tie → largest), so the hash check cannot go flaky if a
    * fixture regeneration introduces duplicate prices.
    */
  private val a16 = Q(
    "a16_argminmax",
    (s, dir) => {
      Tables.load(s, dir, "orders")
        .filter(col("o_custkey") <= 300)
        .groupBy("o_custkey")
        .agg(
          min(struct(col("o_totalprice"), col("o_orderkey")))
            .getField("o_orderkey").as("cheapest_order"),
          max(struct(col("o_totalprice"), col("o_orderkey")))
            .getField("o_orderkey").as("priciest_order"),
          round(min("o_totalprice"), 4).as("min_price"),
          round(max("o_totalprice"), 4).as("max_price"))
        .orderBy("o_custkey")
    },
    Some("""WITH r AS (
              SELECT o_custkey, o_orderkey, o_totalprice,
                row_number() OVER (PARTITION BY o_custkey
                  ORDER BY o_totalprice, o_orderkey) AS rmin,
                row_number() OVER (PARTITION BY o_custkey
                  ORDER BY o_totalprice DESC, o_orderkey DESC) AS rmax
              FROM orders WHERE o_custkey <= 300)
            SELECT o_custkey,
                   min(CASE WHEN rmin = 1 THEN o_orderkey END)
                     AS cheapest_order,
                   min(CASE WHEN rmax = 1 THEN o_orderkey END)
                     AS priciest_order,
                   round(min(o_totalprice), 4) AS min_price,
                   round(max(o_totalprice), 4) AS max_price
            FROM r GROUP BY 1 ORDER BY 1"""))

  /** A17 (beyond the reference): explicit GROUPING SETS — exactly the
    * strata you ask for (unlike ROLLUP/CUBE's fixed lattices), one
    * shuffle for all of them with map-side partial aggregation per
    * stratum. pl1 uses this internally for its roll-up union; this is
    * the visible, SQL-level form.
    */
  private val a17 = Q(
    "a17_grouping_sets",
    (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""SELECT l_returnflag, l_linestatus,
                      CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
                      CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
                      round(sum(l_quantity), 4) AS sum_qty,
                      count(*) AS n
               FROM lineitem
               GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                       (l_returnflag), ())
               ORDER BY g_rf, g_ls, l_returnflag, l_linestatus""")
    },
    Some("""SELECT l_returnflag, l_linestatus,
                   CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
                   CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
                   round(sum(l_quantity), 4) AS sum_qty,
                   count(*) AS n
            FROM lineitem
            GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                    (l_returnflag), ())
            ORDER BY g_rf, g_ls, l_returnflag, l_linestatus"""))

  /** A18 (beyond the reference): fixed-bin histogram — the
    * distribution-profiling pass a data-quality/EDA stage runs before
    * choosing filters. 20 equal-width bins over o_totalprice with
    * explicit bounds; the bin id is pure floor arithmetic
    * (`least(floor((x−lo)/w), n−1)`, identical double ops on both
    * engines → identical bins), so the whole histogram is ONE
    * map-side-combined aggregate — shuffle carries 20 rows regardless
    * of data size, the property that makes profiling free at 100 TB.
    */
  private val a18 = Q(
    "a18_histogram",
    (s, dir) => {
      val lo = 0.0; val hi = 600000.0; val nBins = 20
      val w = (hi - lo) / nBins
      Tables.load(s, dir, "orders")
        .withColumn("bin",
          least(floor((col("o_totalprice") - lit(lo)) / lit(w)),
            lit(nBins - 1.0)).cast("long"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"),
          round(min("o_totalprice"), 4).as("bin_min"),
          round(max("o_totalprice"), 4).as("bin_max"))
        .withColumn("bin_lo", round(col("bin") * w, 4))
        .select("bin", "bin_lo", "n", "bin_min", "bin_max")
        .orderBy("bin")
    },
    Some("""SELECT bin, round(bin * 30000.0, 4) AS bin_lo,
                   count(*) AS n,
                   round(min(o_totalprice), 4) AS bin_min,
                   round(max(o_totalprice), 4) AS bin_max
            FROM (
              SELECT o_totalprice,
                     CAST(least(floor((o_totalprice - 0.0) / 30000.0),
                                19.0) AS BIGINT) AS bin
              FROM orders)
            GROUP BY bin ORDER BY bin"""))

  /** A19 (X137, beyond the reference): EXACT WEIGHTED MEDIAN per
    * group — the robust location statistic when rows carry unequal
    * mass (price-weighted, token-weighted, duplicate-count-weighted
    * after dedup). Definition: smallest value v with
    * 2·Σweight(≤v) ≥ Σweight. Determinism: weights are BIGINT
    * (l_quantity is integer-valued), the cumulative window uses the
    * default RANGE frame so ties in the order key accumulate
    * identically in both engines, and the threshold is integer
    * cross-multiplication (2·cum ≥ total) — no FP anywhere in the
    * selection. Scale shape: ONE window pass partitioned on the
    * HIGH-cardinality supplier key (never the 3-value returnflag —
    * the low-cardinality-window pitfall measured in round 2), one
    * broadcastable per-group total, min-aggregate of the qualifying
    * values.
    */
  private val a19 = Q(
    "a19_weighted_median",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_extendedprice").as("v"),
          col("l_quantity").cast("long").as("wt"))
      val w = Window.partitionBy("l_suppkey").orderBy("v")
      val cum = li.withColumn("cum", sum("wt").over(w))
      val tot = li.groupBy(col("l_suppkey").as("sk"))
        .agg(sum("wt").as("total"))
      cum.join(broadcast(tot), col("l_suppkey") === col("sk"))
        .filter(col("cum") * 2 >= col("total"))
        .groupBy("l_suppkey")
        .agg(min("v").as("weighted_median"),
          max("total").as("total_weight"))
        .orderBy("l_suppkey")
    },
    Some("""WITH cum AS (
              SELECT l_suppkey, l_extendedprice AS v,
                     sum(CAST(l_quantity AS BIGINT)) OVER (
                       PARTITION BY l_suppkey ORDER BY l_extendedprice)
                       AS cum,
                     sum(CAST(l_quantity AS BIGINT)) OVER (
                       PARTITION BY l_suppkey) AS total
              FROM lineitem)
            SELECT l_suppkey, min(v) AS weighted_median,
                   CAST(max(total) AS BIGINT) AS total_weight
            FROM cum WHERE cum * 2 >= total
            GROUP BY l_suppkey
            ORDER BY l_suppkey"""))

  /** A20 (beyond the reference): per-group mode with a deterministic
    * tie-break — the modal order priority per nation of the ordering
    * customer, smallest priority string winning ties. Two bounded
    * shuffles: count per (nation, priority), then a per-nation window
    * over the ~5 priority levels. No row-level window anywhere.
    */
  private val a20 = Q(
    "a20_mode_per_group",
    (s, dir) => {
      val counts = Tables.load(s, dir, "orders")
        .join(Tables.load(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_nationkey", "o_orderpriority")
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("c_nationkey")
        .orderBy(col("n").desc, col("o_orderpriority").asc)
      counts.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("c_nationkey"),
          col("o_orderpriority").as("modal_priority"),
          col("n").as("mode_count"))
        .orderBy("c_nationkey")
    },
    Some("""WITH counts AS (
              SELECT c_nationkey, o_orderpriority,
                     CAST(count(*) AS BIGINT) AS n
              FROM orders JOIN customer ON o_custkey = c_custkey
              GROUP BY 1, 2),
            ranked AS (
              SELECT c_nationkey, o_orderpriority, n,
                row_number() OVER (PARTITION BY c_nationkey
                  ORDER BY n DESC, o_orderpriority ASC) AS rn
              FROM counts)
            SELECT c_nationkey, o_orderpriority AS modal_priority,
                   n AS mode_count
            FROM ranked WHERE rn = 1
            ORDER BY c_nationkey"""))

  /** X279 a21: CONDITIONAL/BOOLEAN aggregate surface — count_if and
    * the SQL:2023 boolean aggregates (bool_and / bool_or and the ANSI
    * `every` spelling), the idioms data-quality SQL is written in
    * ("every order this priority has a positive price", "any order
    * shipped urgent"). All four are single-pass map-side-combinable
    * aggregates (boolean state merges like MIN/MAX — the cheapest
    * distributed aggregate there is); results cast to BIGINT for the
    * cross-engine hash. Completes the aggregate-function matrix next
    * to a16's deterministic argmin/argmax (max_by/min_by are NOT here:
    * under ties their pick is engine-dependent, a16's struct-ordering
    * spelling is the deterministic form).
    */
  private val a21 = Q(
    "a21_conditional_bool_aggs",
    (s, dir) => {
      Tables.load(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
          expr("count_if(o_totalprice > 200000)").as("n_big"),
          expr("cast(bool_and(o_totalprice > 0) as bigint)")
            .as("all_positive"),
          expr("cast(bool_or(o_orderstatus = 'P') as bigint)")
            .as("any_pending"),
          expr("cast(every(o_custkey >= 0) as bigint)")
            .as("every_cust_valid"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority,
                   CAST(count_if(o_totalprice > 200000) AS BIGINT)
                     AS n_big,
                   CAST(bool_and(o_totalprice > 0) AS BIGINT)
                     AS all_positive,
                   CAST(bool_or(o_orderstatus = 'P') AS BIGINT)
                     AS any_pending,
                   CAST(bool_and(o_custkey >= 0) AS BIGINT)
                     AS every_cust_valid
            FROM orders GROUP BY o_orderpriority
            ORDER BY o_orderpriority"""))

  def all: Seq[Q] =
    Seq(a1, a2a3, a4, a5, a6, a7, a8, a9, a10, a11, u2, u3, a12, a13, a14,
      a15, a16, a17, a18, a19, a20, a21)
}
