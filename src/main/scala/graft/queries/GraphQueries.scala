package graft.queries

import graft.Q
import graft.ops.Tables
import org.apache.spark.sql.functions._

/** Graph analytics over the testdata (SURVEY.md §2.8b): PageRank on the
  * supplier–part supply graph. Component clustering (the other core
  * graph op) lives with the dedup family — `ops/ConnectedComponents`
  * under d9/d10.
  */
object GraphQueries {

  /** G1 (X119, beyond the reference): PAGERANK over the bipartite
    * supplier→part graph (distinct (l_suppkey, l_partkey) pairs,
    * symmetrized so the walk is well-defined and no node dangles),
    * 3 fixed rounds of [[graft.ops.PageRank]] fixed-point arithmetic.
    * Ranks are BIGINT micro-units, so the driver hash-compare is exact
    * — no rounding tolerance — against a DuckDB oracle that unrolls
    * the same three rounds as chained CTEs (the m1b/m1d technique).
    * Part nodes are offset by 10^6 to share one id space.
    */
  private val g1 = Q(
    "g1_pagerank",
    (s, dir) => {
      val pairs = Tables.load(s, dir, "lineitem")
        .select(col("l_suppkey").as("s"),
          (col("l_partkey") + 1000000L).as("p"))
        .distinct()
      val edges = pairs.select(col("s").as("src"), col("p").as("dst"))
        .unionByName(pairs.select(col("p").as("src"), col("s").as("dst")))
      graft.ops.PageRank.run(edges, 3)
        .select(col("node").as("node_id"), col("pr"))
        .orderBy("node_id")
    },
    Some("""WITH e0 AS (
              SELECT DISTINCT l_suppkey AS src, l_partkey + 1000000 AS dst
              FROM lineitem),
            edges AS (
              SELECT src, dst FROM e0
              UNION ALL
              SELECT dst AS src, src AS dst FROM e0),
            deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
            ed AS (SELECT e.src, e.dst, d.outdeg
                   FROM edges e JOIN deg d ON e.src = d.src),
            r0 AS (SELECT src AS node, CAST(1000000000 AS BIGINT) AS r
                   FROM deg),
            i1 AS (SELECT ed.dst AS node,
                          150000000 + CAST(sum(floor(r.r * 85 /
                            (ed.outdeg * 100.0))) AS BIGINT) AS r
                   FROM ed JOIN r0 r ON ed.src = r.node GROUP BY ed.dst),
            i2 AS (SELECT ed.dst AS node,
                          150000000 + CAST(sum(floor(r.r * 85 /
                            (ed.outdeg * 100.0))) AS BIGINT) AS r
                   FROM ed JOIN i1 r ON ed.src = r.node GROUP BY ed.dst),
            i3 AS (SELECT ed.dst AS node,
                          150000000 + CAST(sum(floor(r.r * 85 /
                            (ed.outdeg * 100.0))) AS BIGINT) AS r
                   FROM ed JOIN i2 r ON ed.src = r.node GROUP BY ed.dst)
            SELECT node AS node_id, r AS pr FROM i3 ORDER BY node_id"""))

  def all: Seq[Q] = Seq(g1)
}
