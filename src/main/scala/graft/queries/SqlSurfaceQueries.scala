package graft.queries

import graft.Q
import graft.ops.Tables

/** Spark 4 SQL-surface capabilities beyond the pandasql rewrites (§2.11):
  * recursive CTEs (`WITH RECURSIVE`, new in Spark 4.0) and correlated
  * LATERAL subquery joins. Both queries share ONE SQL string between the
  * Spark side and the DuckDB oracle — the row proves the engines execute
  * the identical ANSI text to the identical result, so the surface itself
  * (not a re-formulation) is what's verified.
  *
  * Ref: the reference's pandasql surface (analysis_utils.py:34-60) stops
  * at flat SELECT/GROUP BY; these rows extend it with the two constructs
  * large pipelines ask for next (hierarchy walks, per-row top-k pullups).
  */
object SqlSurfaceQueries {

  /** X144: RECURSIVE CTE — org-style hierarchy rollup. Suppliers form a
    * binary tree (node = s_suppkey+1, parent = floor(node/2), root 1);
    * the recursion walks every node up to the root and rolls up depth,
    * ancestor count, ancestor-key sum (BIGINT-exact) and ancestor
    * account-balance sum in exact integer cents — the bill-of-materials /
    * management-chain pattern. (Cents, not DECIMAL(18,2): the values
    * hash-matched either way, but Spark's parquet DECIMAL surfaces as
    * decimal.Decimal while DuckDB fetchdf yields float64, and the
    * driver's hash distinguishes the dtypes — same gotcha as dq7/X155,
    * same fix: money stays BIGINT end to end.)
    *
    * Determinism: integer tree arithmetic (FLOOR of IEEE division of
    * <2^53 ints is cross-engine exact), BIGINT sums only.
    * Scale: Spark executes each recursive step as one self-join pass
    * over the frontier; depth is log2(N) (~27 rounds at 100M suppliers),
    * and each round shuffles only (node, anc) pairs — the same bounded-
    * round discipline as g1/g2. The recursion-depth guard
    * (spark.sql.cteRecursionLevelLimit, default 100) loud-fails runaway
    * recursion instead of spinning.
    */
  private val hierSql = """
    WITH RECURSIVE up(suppkey, anc, depth) AS (
      SELECT s_suppkey, s_suppkey + 1, 0 FROM supplier
      UNION ALL
      SELECT suppkey, CAST(FLOOR(anc / 2.0) AS BIGINT), depth + 1
      FROM up WHERE anc > 1
    )
    SELECT u.suppkey,
           max(u.depth) AS depth,
           CAST(count(*) AS BIGINT) AS n_ancestors,
           CAST(sum(u.anc) AS BIGINT) AS anc_key_sum,
           CAST(sum(a.bal_cents) AS BIGINT) AS anc_bal_cents
    FROM up u
    JOIN (SELECT s_suppkey,
                 CAST(round(CAST(s_acctbal AS DECIMAL(18,2)) * 100) AS BIGINT) AS bal_cents
          FROM supplier) a
      ON u.anc - 1 = a.s_suppkey
    GROUP BY u.suppkey ORDER BY u.suppkey"""

  private val sql1 = Q(
    "sql1_recursive_hierarchy",
    (s, dir) => { Tables.registerAll(s, dir); s.sql(hierSql) },
    Some(hierSql))

  /** X145: LATERAL correlated subquery join — per-customer top-2 orders
    * pulled up by an ORDER BY ... LIMIT subquery that references the
    * outer row (the "top-k rows of B for every row of A" idiom SQL users
    * reach for before window functions). Deterministic: the per-customer
    * LIMIT is tie-broken by o_orderkey; values flow straight from
    * parquet with zero arithmetic. Scale: Catalyst rewrites the lateral
    * into a ranked window join (no per-row re-execution) — the executed
    * plan is a Partial WindowGroupLimit (map-side top-2 per customer
    * BEFORE the shuffle, so the exchange carries ≤2 rows/key) → one
    * hash exchange on o_custkey → Final WindowGroupLimit →
    * BroadcastHashJoin against customer. Same cost class as p8's
    * window top-N; nothing nested-loops.
    */
  private val latSql = """
    SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey, t.o_totalprice
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
             WHERE o.o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
    ORDER BY c.c_custkey, t.o_orderkey"""

  private val sql2 = Q(
    "sql2_lateral_topk",
    (s, dir) => { Tables.registerAll(s, dir); s.sql(latSql) },
    Some(latSql))

  /** X209: SQL-STANDARD PIVOT clause — the third shared-string surface
    * row (after recursion and LATERAL): `FROM ... PIVOT (agg [AS a]...
    * FOR col IN (v AS alias, ...))` with TWO aggregates per cell, the
    * spreadsheet-shaped rollup analysts write directly in SQL (a6
    * proves the DataFrame pivot; this proves the SQL spelling parses
    * and executes identically on both engines, including the
    * `{value}_{aggAlias}` output-column naming convention). Money in
    * exact integer cents; the outer SELECT pins every aggregate to
    * BIGINT because DuckDB's sum(BIGINT) widens to HUGEINT (the
    * check.py dtype gotcha) while Spark stays long.
    */
  private val pivotSql = """
    SELECT o_orderpriority,
           CAST(o_n AS BIGINT) AS o_n,
           CAST(o_sum_cents AS BIGINT) AS o_sum_cents,
           CAST(f_n AS BIGINT) AS f_n,
           CAST(f_sum_cents AS BIGINT) AS f_sum_cents,
           CAST(p_n AS BIGINT) AS p_n,
           CAST(p_sum_cents AS BIGINT) AS p_sum_cents
    FROM (
      SELECT * FROM (
        SELECT o_orderpriority, o_orderstatus,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders)
      PIVOT (
        count(*) AS n, sum(cents) AS sum_cents
        FOR o_orderstatus IN ('O' AS o, 'F' AS f, 'P' AS p)))
    ORDER BY o_orderpriority"""

  private val sql3 = Q(
    "sql3_pivot_clause",
    (s, dir) => { Tables.registerAll(s, dir); s.sql(pivotSql) },
    Some(pivotSql))

  /** X216: GROUPING SETS with GROUPING() disambiguation as the FOURTH
    * shared-string SQL-surface row (after WITH RECURSIVE, LATERAL, and
    * PIVOT): the identical ANSI text — three explicit grouping sets
    * (detail, per-priority subtotal, grand total), GROUPING() flags
    * cast to BIGINT, exact-cents measures, and the ORDER BY spelled
    * `ASC NULLS FIRST` because the engines' bare-ASC null placement
    * DIFFERS (Spark NULLS FIRST, DuckDB NULLS LAST) while the explicit
    * spelling parses and means the same thing on both. a17 proves the
    * operator through the DataFrame API; this row proves the SQL
    * surface itself.
    */
  private val gsetsSql = """
    SELECT o_orderpriority, o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
             AS BIGINT) AS cents,
           CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_pri,
           CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_st
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                            (o_orderpriority), ())
    ORDER BY g_pri ASC, g_st ASC,
             o_orderpriority ASC NULLS FIRST,
             o_orderstatus ASC NULLS FIRST"""

  private val sql4 = Q(
    "sql4_grouping_sets_clause",
    (s, dir) => { Tables.registerAll(s, dir); s.sql(gsetsSql) },
    Some(gsetsSql))

  /** X227: INTERSECT ALL / EXCEPT ALL as the FIFTH shared-string
    * SQL-surface row — the MULTISET set operations (SQL:1999 bag
    * semantics: min(multiplicity) for intersect, multiplicity
    * difference for except), summarized per operation as exact-BIGINT
    * cardinality/distinct/key-sum so the bag semantics themselves are
    * what the hash checks (u3 proves the same operators through the
    * DataFrame API; this row proves the ANSI text). Scale: both set
    * ops hash-partition on the full row — one shuffle each, same cost
    * envelope as a groupBy on the compared columns.
    */
  private val setopsSql = """
    WITH a AS (SELECT o_custkey AS k FROM orders
               WHERE o_orderstatus = 'O'),
         b AS (SELECT o_custkey AS k FROM orders
               WHERE o_orderstatus = 'F'),
         i AS (SELECT k FROM a INTERSECT ALL SELECT k FROM b),
         x AS (SELECT k FROM a EXCEPT ALL SELECT k FROM b)
    SELECT 'except_all' AS op, CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT k) AS BIGINT) AS n_distinct,
           CAST(sum(k) AS BIGINT) AS key_sum
    FROM x
    UNION ALL
    SELECT 'intersect_all' AS op, CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT k) AS BIGINT) AS n_distinct,
           CAST(sum(k) AS BIGINT) AS key_sum
    FROM i
    ORDER BY op"""

  private val sql5 = Q(
    "sql5_setops_clause",
    (s, dir) => { Tables.registerAll(s, dir); s.sql(setopsSql) },
    Some(setopsSql))

  /** X231: aggregate FILTER clause (SQL:2003 T612) as the SIXTH
    * shared-string SQL-surface row — per-aggregate predicates without
    * the CASE-WHEN contortion, the idiom conditional-metric dashboards
    * are written in. One pass computes four differently-filtered
    * aggregates per group; measures stay exact (counts BIGINT, cents
    * floor()'d to BIGINT before summing — the dq7 device — with
    * DuckDB's HUGEINT sum pinned back to BIGINT). Scale: all four
    * FILTERed aggregates fold into the SAME map-side partial aggregate
    * — one shuffle on l_returnflag, no extra passes.
    */
  private val filterSql = """
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_all,
           CAST(count(*) FILTER (WHERE l_discount > 0.05) AS BIGINT)
             AS n_deep_discount,
           CAST(count(*) FILTER (WHERE l_quantity >= 25) AS BIGINT)
             AS n_bulk,
           CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                FILTER (WHERE l_tax > 0.04) AS BIGINT)
             AS cents_high_tax,
           CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                FILTER (WHERE l_linestatus = 'F') AS BIGINT)
             AS cents_finished
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag"""

  private val sql6 = Q(
    "sql6_filter_clause",
    (s, dir) => { Tables.registerAll(s, dir); s.sql(filterSql) },
    Some(filterSql))

  /** X232: CORRELATED SCALAR SUBQUERIES (in both SELECT-list and WHERE)
    * as the SEVENTH shared-string SQL-surface row — the "inline lookup
    * per outer row" construct Catalyst decorrelates into aggregate +
    * left outer join (RewriteCorrelatedScalarSubquery), proven against
    * DuckDB's own decorrelation on the identical text. Customers with
    * ≥8 orders, each row carrying two independently-correlated scalars
    * (open-order count, max order cents). All-integer measures;
    * COALESCE pins the no-match scalar to 0 on both engines. Scale:
    * each decorrelated subquery is one aggregate on o_custkey + one
    * equi-join — no per-row re-execution survives optimization, which
    * is exactly what the row certifies.
    */
  private val corrSql = """
    SELECT c.c_custkey, c.c_mktsegment,
           (SELECT COALESCE(CAST(count(*) AS BIGINT), 0)
            FROM orders o WHERE o.o_custkey = c.c_custkey
              AND o.o_orderstatus = 'O') AS n_open_orders,
           (SELECT COALESCE(max(CAST(floor(o.o_totalprice * 100 + 0.5)
                                     AS BIGINT)), 0)
            FROM orders o WHERE o.o_custkey = c.c_custkey)
             AS max_order_cents
    FROM customer c
    WHERE (SELECT count(*) FROM orders o
           WHERE o.o_custkey = c.c_custkey) >= 8
    ORDER BY c.c_custkey"""

  private val sql7 = Q(
    "sql7_correlated_scalar_subquery",
    (s, dir) => { Tables.registerAll(s, dir); s.sql(corrSql) },
    Some(corrSql))

  /** X240: GROUP BY ALL (the modern infer-the-grouping-keys shorthand
    * both engines adopted — Spark 3.4+, DuckDB 0.6+) as the EIGHTH
    * shared-string SQL-surface row: every non-aggregate SELECT item
    * becomes a grouping key, including a COMPUTED one (the order-date
    * year), which is where hand-maintained GROUP BY lists rot. Exact
    * measures (counts, floor()'d cents with DuckDB's HUGEINT pinned
    * back to BIGINT); ORDER BY positional, common ground for the
    * inferred columns. Scale: identical plan to the explicit GROUP BY
    * — one map-side-combined aggregate, the sugar is analysis-time.
    */
  private val groupAllSql = """
    SELECT o_orderstatus,
           CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS order_year,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
             AS BIGINT) AS revenue_cents
    FROM orders
    GROUP BY ALL
    ORDER BY 1, 2"""

  private val sql8 = Q(
    "sql8_group_by_all",
    (s, dir) => { Tables.registerAll(s, dir); s.sql(groupAllSql) },
    Some(groupAllSql))

  /** X250: named WINDOW clause (SQL:2003) as the NINTH shared-string
    * SQL-surface row — one window definition referenced by FOUR
    * functions, the de-duplication every analyst query over windows
    * wants (and the text where a drifted copy-pasted frame hides
    * bugs). Mixed function classes over the same named window: rank
    * (integer), lag (offset), and a framed BIGINT running sum; all
    * measures exact integers. Scale: the named window is sugar — one
    * sort per distinct (partition, order, frame), exactly as if
    * written out. */
  private val namedWinSql = """
    SELECT o_custkey, o_orderkey,
           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
           CAST(rank() OVER w AS BIGINT) AS rk,
           lag(o_orderkey, 1) OVER w AS prev_order,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
             OVER wf AS BIGINT) AS run_cents,
           CAST(count(*) OVER (PARTITION BY o_custkey) AS BIGINT)
             AS n_orders
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY CAST(o_orderdate AS DATE), o_orderkey),
           wf AS (PARTITION BY o_custkey
                  ORDER BY CAST(o_orderdate AS DATE), o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY o_custkey, rk, o_orderkey"""

  private val sql9 = Q(
    "sql9_named_window",
    (s, dir) => { Tables.registerAll(s, dir); s.sql(namedWinSql) },
    Some(namedWinSql))

  /** X270: UNPIVOT clause + ORDER BY ALL as the TENTH shared-string
    * SQL-surface row: the identical ANSI text parses and runs on both
    * engines — SQL-standard `UNPIVOT (val FOR name IN (...))` (Spark
    * 3.4+/DuckDB both accept it) over three BIGINT-exact order metrics,
    * totally ordered by the engines' shared `ORDER BY ALL` shorthand
    * (order by every output column left-to-right), so the row proves
    * BOTH surfaces at once. a7 proves wide→long through the DataFrame
    * `unpivot` API; this row proves the SQL clause itself. Scale:
    * UNPIVOT is a zero-shuffle row-local explode (3 rows out per row
    * in); the only exchange is the final global sort.
    */
  private val unpivotSql = """
    SELECT o_orderkey, metric, val
    FROM (SELECT o_orderkey,
                 CAST(o_custkey AS BIGINT) AS m_custkey,
                 CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                   AS m_cents,
                 CAST(year(o_orderdate) AS BIGINT) AS m_year
          FROM orders) base
    UNPIVOT (val FOR metric IN (m_custkey, m_cents, m_year))
    ORDER BY ALL"""

  private val sql10 = Q(
    "sql10_unpivot_clause",
    (s, dir) => { Tables.registerAll(s, dir); s.sql(unpivotSql) },
    Some(unpivotSql))

  /** X288: NULL-SEMANTICS conformance as the ELEVENTH shared-string
    * SQL-surface row — the three-valued-logic corners every migrated
    * SQL estate silently depends on, probed by the IDENTICAL ANSI text
    * on both engines: count(*) vs count(col) (NULL-skipping
    * aggregates), sum/min over a nullable column, `NULL = NULL`
    * evaluating to UNKNOWN (CASE falls through), the ANSI
    * `IS [NOT] DISTINCT FROM` spellings (the null-safe comparator j11
    * proves through the DataFrame `<=>`), NULLIF round-trips and
    * COALESCE defaults. Every probe lands in a BIGINT column of ONE
    * summary row, so a single engine divergence on any corner flips
    * the hash. Zero-shuffle scan + one global aggregate.
    */
  private val nullSemSql = """
    WITH t AS (
      SELECT o_orderkey AS k,
             CASE WHEN o_orderkey % 3 = 0 THEN NULL
                  ELSE CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
             END AS v
      FROM orders)
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(v) AS BIGINT) AS n_nonnull,
           CAST(sum(v) AS BIGINT) AS sum_nonnull,
           CAST(min(v) AS BIGINT) AS min_nonnull,
           CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_null,
           CAST(sum(CASE WHEN v IS DISTINCT FROM NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_distinct_from_null,
           CAST(sum(CASE WHEN NULLIF(k % 5, 0) IS NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_nullif_hits,
           CAST(sum(CASE WHEN coalesce(v, 0) = 0 AND v IS NULL
             THEN 1 ELSE 0 END) AS BIGINT) AS n_coalesce_defaults,
           CAST(CASE WHEN NULL = NULL THEN 1 ELSE 0 END AS BIGINT)
             AS null_eq_null_is_unknown,
           CAST(CASE WHEN NULL IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END
             AS BIGINT) AS null_not_distinct_true
    FROM t"""

  private val sql11 = Q(
    "sql11_null_semantics",
    (s, dir) => { Tables.registerAll(s, dir); s.sql(nullSemSql) },
    Some(nullSemSql))


  /** X289: TRY_CAST conformance as the TWELFTH shared-string
    * SQL-surface row — safe ingestion casting (the dirty-feed idiom:
    * cast what parses, NULL what doesn't, never abort the scan),
    * probed by the identical ANSI text over four string shapes both
    * engines agree on: clean integers, trailing-garbage ('<n>x'),
    * empty strings, and whitespace-padded integers (both engines trim
    * for numeric casts). Decimal strings are deliberately EXCLUDED —
    * a documented divergence found while authoring this row: DuckDB
    * TRY_CAST('1.5' AS BIGINT) ROUNDS to 2 while Spark yields NULL,
    * so portable safe-cast code must pre-normalize decimals. All
    * counters BIGINT in one summary row.
    */
  private val tryCastSql = """
    WITH raws AS (
      SELECT o_orderkey AS k,
             CASE WHEN o_orderkey % 4 = 0
                    THEN CAST(o_orderkey AS VARCHAR(20))
                  WHEN o_orderkey % 4 = 1
                    THEN CAST(o_orderkey AS VARCHAR(20)) || 'x'
                  WHEN o_orderkey % 4 = 2 THEN ''
                  ELSE '  ' || CAST(o_orderkey AS VARCHAR(20)) || '  '
             END AS sv
      FROM orders)
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(TRY_CAST(sv AS BIGINT)) AS BIGINT) AS n_casted,
           CAST(sum(TRY_CAST(sv AS BIGINT)) AS BIGINT) AS sum_casted,
           CAST(sum(CASE WHEN TRY_CAST(sv AS BIGINT) IS NULL
             THEN 1 ELSE 0 END) AS BIGINT) AS n_rejected,
           CAST(sum(CASE WHEN sv = '' AND TRY_CAST(sv AS BIGINT) IS NULL
             THEN 1 ELSE 0 END) AS BIGINT) AS n_empty_rejected,
           CAST(sum(CASE WHEN TRY_CAST(sv AS BIGINT) = k
             THEN 1 ELSE 0 END) AS BIGINT) AS n_roundtrip_exact
    FROM raws"""

  private val sql12 = Q(
    "sql12_try_cast",
    (s, dir) => { Tables.registerAll(s, dir); s.sql(tryCastSql) },
    Some(tryCastSql))

  // Probed and REJECTED this round: WITH RECURSIVE ... UNION (dedup /
  // cycle-safe fixpoint recursion). Spark 4.1.2 raises
  // UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE — only UNION ALL recursion
  // (sql1) exists on the Spark side, so the cycle-terminating variant
  // cannot be a shared-string row yet. The library covers the same
  // capability Spark-first instead: ops/ConnectedComponents (pointer-
  // jumping fixpoint, d9/g8) and the frontier BFS loops (g2/g9) are
  // the engine-native cycle-safe closures.

  /** X296: SQL PIPE SYNTAX (`|>`, new in Spark 4.0 — SPARK-49555, the
    * GoogleSQL pipe-operator surface): the same relational program
    * written as a top-to-bottom pipeline — FROM |> WHERE |> AGGREGATE
    * … GROUP BY |> ORDER BY — instead of inside-out ANSI nesting.
    * DuckDB has no pipe syntax, so this is not a shared-string row:
    * the oracle is the ANSI spelling of the identical program, proving
    * the two SURFACES execute to the identical result on Spark vs the
    * ANSI text on DuckDB. Pipe AGGREGATE emits grouping columns first,
    * then aggregates — pinned by the value compare. Money in exact
    * integer cents; one scan + one hash aggregate, same plan class as
    * the ANSI spelling (Catalyst parses pipes into the same logical
    * plan).
    */
  private val pipeSql = """
    FROM orders
    |> WHERE o_totalprice > 100000
    |> AGGREGATE CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                   AS BIGINT) AS cents
       GROUP BY o_orderpriority
    |> ORDER BY o_orderpriority"""

  private val sql13 = Q(
    "sql13_pipe_syntax",
    (s, dir) => { Tables.registerAll(s, dir); s.sql(pipeSql) },
    Some("""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                     AS BIGINT) AS cents
            FROM orders WHERE o_totalprice > 100000
            GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** X297: LATERAL COLUMN ALIAS as the 13th shared-string surface row —
    * a SELECT item referencing an alias defined EARLIER in the same
    * list (Spark 3.4+'s implicit lateral alias resolution; DuckDB
    * supports the same GoogleSQL-ism), chained THREE levels deep
    * (cents → after_fee → bucket) so one engine falling back to the
    * underlying column instead of the alias chain flips the values.
    * The idiom matters for migrations: pandas/dbt-generated SQL leans
    * on it heavily, and the classic ANSI workaround is a nested
    * subquery per level. All-integer outputs; zero-shuffle scan +
    * one rangepartition for the total order.
    */
  private val lcaSql = """
    SELECT o_orderkey,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
           cents - 500 AS after_fee,
           after_fee % 97 AS bucket
    FROM orders
    ORDER BY o_orderkey"""

  private val sql14 = Q(
    "sql14_lateral_column_alias",
    (s, dir) => { Tables.registerAll(s, dir); s.sql(lcaSql) },
    Some(lcaSql))

  def all: Seq[Q] =
    Seq(sql1, sql2, sql3, sql4, sql5, sql6, sql7, sql8, sql9, sql10,
      sql11, sql12, sql13, sql14)
}
