package graft.queries

import graft.Q
import graft.ops.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators for a training-data pipeline over the
  * `documents` table: exact (fingerprint groupBy), inverted-index
  * n-gram Jaccard, MinHash+LSH banding, SimHash, and embedding-cosine
  * near-dup. All hashing is md5-based so Spark and the DuckDB oracle
  * compute identical values (Spark's hash()/xxhash64 have no DuckDB
  * twin); MinHash takes the lexicographic min of fixed-width hex
  * strings, which is order-isomorphic to the usual integer min.
  *
  * Scale notes: the inverted-index join (d2) shuffles on shingle — the
  * standard exact-Jaccard plan; MinHash/LSH (d3) is the 100 TB path:
  * per-doc signatures reduce each doc to 8 hashes, candidates come from
  * equi-joins on band keys, and only candidates pay the exact-verify
  * cost. The testdata plants ~25 near-dup pairs (Jaccard ≈ 0.99).
  */
object DedupQueries {

  /** Word 3-gram shingle set (distinct), built with higher-order array
    * functions — stays in codegen, no UDF. Docs with <3 tokens get an
    * empty set (mirrors DuckDB's empty range()).
    */
  private def shingleCol(text: Column): Column = {
    val toks = filter(split(text, " "), x => x =!= "")
    array_distinct(
      when(size(toks) >= 3,
        transform(sequence(lit(0), size(toks) - 3),
          j => concat_ws(" ", element_at(toks, j + 1),
            element_at(toks, j + 2), element_at(toks, j + 3))))
        .otherwise(array().cast("array<string>")))
  }

  /** (doc_id, shingle, n_shingles) exploded view. */
  private def shingled(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), shingleCol(col("text")).as("shs"))
      .select(col("doc_id"), size(col("shs")).as("nsh"),
        explode(col("shs")).as("sh"))

  private val duckShingles =
    """list_distinct(list_transform(
      |  range(0, len(list_filter(string_split(text, ' '), x -> x <> '')) - 2),
      |  j -> list_filter(string_split(text, ' '), x -> x <> '')[j+1] || ' ' ||
      |       list_filter(string_split(text, ' '), x -> x <> '')[j+2] || ' ' ||
      |       list_filter(string_split(text, ' '), x -> x <> '')[j+3]))""".stripMargin

  /** Exact dedup: md5 fingerprint of normalized text, canonical row =
    * min doc_id per fingerprint, per-source survivor counts.
    * The 100 TB plan: one shuffle on the 16-byte fingerprint.
    */
  private val d1 = Q(
    "d2_exact_dedup",
    (s, dir) => {
      val w = Window.partitionBy("fp").orderBy("doc_id")
      Tables.load(s, dir, "documents")
        .withColumn("fp",
          md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")))
        .withColumn("rn", row_number().over(w))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_survivors"))
        .orderBy("source")
    },
    Some("""SELECT source, count(*) AS n_docs,
                   sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS n_survivors
            FROM (
              SELECT source,
                row_number() OVER (
                  PARTITION BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
                  ORDER BY doc_id) AS rn
              FROM documents)
            GROUP BY 1 ORDER BY 1"""))

  /** Exact n-gram Jaccard near-dup via inverted index: explode shingle
    * sets, self-join on shingle, count shared per pair, Jaccard =
    * |A∩B| / (|A|+|B|-|A∩B|). No O(n²) pair enumeration — only pairs
    * sharing ≥1 shingle are materialized.
    */
  private val d2 = Q(
    "d3_ngram_jaccard",
    (s, dir) => {
      val ex = shingled(s, dir)
      val a = ex.select(col("doc_id").as("doc_a"), col("nsh").as("na"), col("sh"))
      val b = ex.select(col("doc_id").as("doc_b"), col("nsh").as("nb"), col("sh"))
      a.join(b, Seq("sh")).filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b", "na", "nb")
        .agg(count(lit(1)).as("shared"))
        .withColumn("jaccard", round(col("shared").cast("double")
          / (col("na") + col("nb") - col("shared")), 4))
        .filter(col("jaccard") >= 0.5)
        .select("doc_a", "doc_b", "shared", "jaccard")
        .orderBy("doc_a", "doc_b")
    },
    Some(s"""WITH sets AS (
               SELECT doc_id, $duckShingles AS shs FROM documents),
             ex AS (
               SELECT doc_id, len(shs) AS nsh, unnest(shs) AS sh FROM sets)
             SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                    count(*) AS shared,
                    round(count(*) * 1.0
                      / (a.nsh + b.nsh - count(*)), 4) AS jaccard
             FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
             GROUP BY a.doc_id, b.doc_id, a.nsh, b.nsh
             HAVING round(count(*) * 1.0 / (a.nsh + b.nsh - count(*)), 4) >= 0.5
             ORDER BY 1, 2"""))

  /** MinHash + LSH: 8 permutations (min of md5(shingle||seed)), banded
    * 2-per-band into 4 LSH keys; docs sharing a band become candidates;
    * candidates are exactly verified with the d3 Jaccard. This is the
    * scale path: signature build is one pass over shingles, candidate
    * generation is an equi-join on (band_idx, band_key).
    */
  private val d3 = Q(
    "d4_minhash_lsh",
    (s, dir) => {
      val nPerm = 8
      val ex = shingled(s, dir)
      val aggs = (0 until nPerm).map(i =>
        min(md5(concat(col("sh"), lit(s"|$i")))).as(s"mh$i"))
      val sigs = ex.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      val bands = sigs.select(col("doc_id"),
        explode(array((0 until nPerm / 2).map(j =>
          struct(lit(j).as("band_idx"),
            md5(concat(col(s"mh${2 * j}"), col(s"mh${2 * j + 1}")))
              .as("band_key"))): _*)).as("b"))
        .select(col("doc_id"), col("b.band_idx"), col("b.band_key"))
      val cand = bands.as("x").join(bands.as("y"),
          col("x.band_idx") === col("y.band_idx") &&
            col("x.band_key") === col("y.band_key") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct()
      // Exact verify restricted to candidates: fan the candidate pairs
      // into the exploded shingle sets — only candidate pairs pay the
      // set-intersection cost.
      val a = ex.select(col("doc_id").as("doc_a"), col("nsh").as("na"), col("sh"))
      val b = ex.select(col("doc_id").as("doc_b"), col("nsh").as("nb"), col("sh"))
      cand.join(a, Seq("doc_a")).join(b, Seq("doc_b", "sh"))
        .groupBy("doc_a", "doc_b", "na", "nb")
        .agg(count(lit(1)).as("shared"))
        .withColumn("jaccard", round(col("shared").cast("double")
          / (col("na") + col("nb") - col("shared")), 4))
        .filter(col("jaccard") >= 0.5)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    },
    Some(s"""WITH sets AS (
               SELECT doc_id, $duckShingles AS shs FROM documents),
             ex AS (
               SELECT doc_id, len(shs) AS nsh, unnest(shs) AS sh FROM sets),
             sigs AS (
               SELECT doc_id,
                 ${(0 until 8).map(i =>
                   s"min(md5(sh || '|$i')) AS mh$i").mkString(", ")}
               FROM ex GROUP BY 1),
             bands AS (
               ${(0 until 4).map(j =>
                 s"SELECT doc_id, $j AS band_idx, md5(mh${2 * j} || mh${2 * j + 1}) AS band_key FROM sigs")
                 .mkString(" UNION ALL ")}),
             cand AS (
               SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
               FROM bands x JOIN bands y
                 ON x.band_idx = y.band_idx AND x.band_key = y.band_key
                AND x.doc_id < y.doc_id),
             stats AS (
               SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                      a.nsh AS na, b.nsh AS nb, count(*) AS shared
               FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
               GROUP BY 1, 2, 3, 4)
             SELECT c.doc_a, c.doc_b,
                    round(shared * 1.0 / (na + nb - shared), 4) AS jaccard
             FROM cand c JOIN stats st
               ON c.doc_a = st.doc_a AND c.doc_b = st.doc_b
             WHERE round(shared * 1.0 / (na + nb - shared), 4) >= 0.5
             ORDER BY 1, 2"""))

  /** SimHash: 16-bit signature from per-shingle md5 hex digits — bit k
    * is the sign of Σ±1 over shingles (digit k ≥ 8 → +1). Pairs with
    * identical signatures are near-dup candidates. One pass + one
    * equi-join on the signature; the cheapest near-dup screen at scale.
    */
  private val d4 = Q(
    "d5_simhash",
    (s, dir) => {
      val ex = shingled(s, dir).withColumn("h", md5(col("sh")))
      val bitSums = (1 to 16).map(k =>
        sum(when(conv(substring(col("h"), k, 1), 16, 10).cast("int") >= 8, 1)
          .otherwise(-1)).as(s"s$k"))
      val sig = ex.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
        .withColumn("simhash",
          (1 to 16).map(k =>
            when(col(s"s$k") > 0, lit(1L << (k - 1))).otherwise(lit(0L)))
            .reduce(_ + _))
        .select("doc_id", "simhash")
      sig.as("x").join(sig.as("y"),
          col("x.simhash") === col("y.simhash") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
          col("x.simhash"))
        .orderBy("doc_a", "doc_b")
    },
    Some(s"""WITH sets AS (
               SELECT doc_id, $duckShingles AS shs FROM documents),
             ex AS (
               SELECT doc_id, md5(unnest(shs)) AS h FROM sets),
             bits AS (
               SELECT doc_id,
                 ${(1 to 16).map(k =>
                   s"sum(CASE WHEN strpos('0123456789abcdef', substr(h, $k, 1)) - 1 >= 8 THEN 1 ELSE -1 END) AS s$k")
                   .mkString(", ")}
               FROM ex GROUP BY 1),
             sig AS (
               SELECT doc_id,
                 ${(1 to 16).map(k =>
                   s"(CASE WHEN s$k > 0 THEN ${1L << (k - 1)} ELSE 0 END)")
                   .mkString(" + ")} AS simhash
               FROM bits)
             SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, x.simhash
             FROM sig x JOIN sig y
               ON x.simhash = y.simhash AND x.doc_id < y.doc_id
             ORDER BY 1, 2"""))

  /** Embedding-cosine near-dup: brute-force pairwise cosine over the
    * embeddings table (double-cast, zip_with dot product), pairs above
    * threshold. The brute-force O(n²) baseline — the LSH-bucketed scale
    * path lives in SimilarityQueries.
    */
  private val d5 = Q(
    "d6_embedding_neardup",
    (s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("v"))
        .withColumn("nrm",
          sqrt(aggregate(col("v"), lit(0.0), (a, x) => a + x * x)))
      val a = e.select(col("vec_id").as("vec_a"), col("v").as("va"),
        col("nrm").as("na"))
      val b = e.select(col("vec_id").as("vec_b"), col("v").as("vb"),
        col("nrm").as("nb"))
      a.crossJoin(b).filter(col("vec_a") < col("vec_b"))
        .withColumn("cosine",
          round(aggregate(zip_with(col("va"), col("vb"), (x, y) => x * y),
            lit(0.0), (acc, x) => acc + x) / (col("na") * col("nb")), 4))
        .filter(col("cosine") >= 0.45)
        .select("vec_a", "vec_b", "cosine")
        .orderBy("vec_a", "vec_b")
    },
    Some("""WITH e AS (
              SELECT vec_id,
                list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              FROM embeddings),
            n AS (
              SELECT vec_id, v,
                sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
              FROM e)
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   round(list_sum(list_transform(list_zip(a.v, b.v),
                       s -> s[1] * s[2])) / (a.nrm * b.nrm), 4) AS cosine
            FROM n a JOIN n b ON a.vec_id < b.vec_id
            WHERE round(list_sum(list_transform(list_zip(a.v, b.v),
                s -> s[1] * s[2])) / (a.nrm * b.nrm), 4) >= 0.45
            ORDER BY 1, 2"""))

  def all: Seq[Q] = Seq(d1, d2, d3, d4, d5)
}
