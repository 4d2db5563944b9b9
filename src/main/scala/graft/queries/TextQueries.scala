package graft.queries

import graft.Q
import graft.ops.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Text-analysis operators for a training-data pipeline over the
  * `documents` table (doc_id, text, lang, source, n_chars): token
  * counting, quality scoring, marker-based language ID, content
  * fingerprinting, and n-gram frequency. Everything is built from
  * codegen'd `functions._` (regexp_*, higher-order array functions,
  * md5) — no UDFs — so the scan stays in one whole-stage-codegen pass
  * per document at 100 TB.
  */
object TextQueries {

  private val stopEn = Seq("the", "a", "and", "of", "to", "in")

  /** Token counting: whitespace tokens + word-regex tokens (the BPE-ish
    * pre-tokenizer count) + char len, per doc, rolled up per source.
    */
  private val t1 = Q(
    "t1_token_count",
    (s, dir) => {
      Tables.load(s, dir, "documents")
        .withColumn("n_ws_tokens", size(regexp_extract_all(col("text"), lit("\\S+"), lit(0))))
        .withColumn("n_word_tokens",
          size(regexp_extract_all(col("text"), lit("[A-Za-z0-9]+"), lit(0))))
        .withColumn("n_chars_calc", length(col("text")))
        .select("doc_id", "n_ws_tokens", "n_word_tokens", "n_chars_calc")
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
                   len(regexp_extract_all(text, '\S+')) AS n_ws_tokens,
                   len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS n_word_tokens,
                   length(text) AS n_chars_calc
            FROM documents ORDER BY doc_id"""))

  /** Quality scoring: stopword ratio, punctuation ratio, mean token
    * length, and a graded quality band — the usual cheap pre-filter
    * before expensive dedup/training steps.
    */
  private val t2 = Q(
    "t2_quality_score",
    (s, dir) => {
      val toks = regexp_extract_all(col("text"), lit("\\S+"), lit(0))
      val nTok = size(toks)
      val nStop = size(filter(toks, x => x.isInCollection(stopEn)))
      Tables.load(s, dir, "documents")
        .withColumn("n_tokens", nTok)
        .withColumn("stop_ratio", round(nStop.cast("double") / nTok, 4))
        .withColumn("punct_ratio",
          round(regexp_count(col("text"), lit("[^A-Za-z0-9\\s]")).cast("double")
            / length(col("text")), 4))
        .withColumn("mean_tok_len",
          round(length(regexp_replace(col("text"), "\\s+", "")).cast("double")
            / nTok, 4))
        .withColumn("quality_band",
          when(col("n_tokens") < 20, "short")
            .when(col("stop_ratio") > 0.12, "stopword_heavy")
            .otherwise("ok"))
        .select("doc_id", "n_tokens", "stop_ratio", "punct_ratio",
          "mean_tok_len", "quality_band")
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
                   len(regexp_extract_all(text, '\S+')) AS n_tokens,
                   round(len(list_filter(regexp_extract_all(text, '\S+'),
                       x -> x IN ('the','a','and','of','to','in'))) * 1.0
                     / len(regexp_extract_all(text, '\S+')), 4) AS stop_ratio,
                   round(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) * 1.0
                     / length(text), 4) AS punct_ratio,
                   round(length(regexp_replace(text, '\s+', '', 'g')) * 1.0
                     / len(regexp_extract_all(text, '\S+')), 4) AS mean_tok_len,
                   CASE WHEN len(regexp_extract_all(text, '\S+')) < 20
                          THEN 'short'
                        WHEN round(len(list_filter(regexp_extract_all(text, '\S+'),
                            x -> x IN ('the','a','and','of','to','in'))) * 1.0
                          / len(regexp_extract_all(text, '\S+')), 4) > 0.12
                          THEN 'stopword_heavy'
                        ELSE 'ok' END AS quality_band
            FROM documents ORDER BY doc_id"""))

  /** Marker-word language ID (n-gram heuristic): score each doc against
    * per-language marker sets, argmax with a fixed tie order; rolled up
    * as a lang × predicted confusion count.
    */
  private val t3 = Q(
    "t3_lang_id",
    (s, dir) => {
      val toks = filter(split(lower(col("text")), " "), x => x =!= "")
      def score(markers: Seq[String]) =
        size(filter(toks, x => x.isInCollection(markers)))
      Tables.load(s, dir, "documents")
        .withColumn("s_en", score(graft.ops.Corpus.langMarkers(0)._2))
        .withColumn("s_es", score(graft.ops.Corpus.langMarkers(1)._2))
        .withColumn("s_fr", score(graft.ops.Corpus.langMarkers(2)._2))
        .withColumn("pred_lang",
          when(col("s_en") >= col("s_es") && col("s_en") >= col("s_fr"), "en")
            .when(col("s_es") >= col("s_fr"), "es")
            .otherwise("fr"))
        .groupBy("lang", "pred_lang")
        .agg(count(lit(1)).as("n"),
          round(avg("s_en"), 4).as("avg_s_en"))
        .orderBy("lang", "pred_lang")
    },
    Some("""WITH scored AS (
              SELECT lang,
                len(list_filter(list_filter(string_split(lower(text), ' '),
                  x -> x <> ''), x -> x IN ('the','a','and','of'))) AS s_en,
                len(list_filter(list_filter(string_split(lower(text), ' '),
                  x -> x <> ''), x -> x IN ('el','la','de','que'))) AS s_es,
                len(list_filter(list_filter(string_split(lower(text), ' '),
                  x -> x <> ''), x -> x IN ('le','les','et','de'))) AS s_fr
              FROM documents)
            SELECT lang,
                   CASE WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
                        WHEN s_es >= s_fr THEN 'es'
                        ELSE 'fr' END AS pred_lang,
                   count(*) AS n, round(avg(s_en), 4) AS avg_s_en
            FROM scored GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Content fingerprinting: md5 over whitespace-normalized lowercased
    * text — the exact-dedup key — plus per-source uniqueness stats.
    */
  private val t4 = Q(
    "t4_fingerprint",
    (s, dir) => {
      Tables.load(s, dir, "documents")
        .withColumn("fp", graft.ops.Corpus.fingerprint(col("text")))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct("fp").as("n_unique"),
          max("fp").as("max_fp"))
        .orderBy("source")
    },
    Some("""SELECT source, count(*) AS n_docs,
                   count(DISTINCT md5(regexp_replace(lower(trim(text)),
                     '\s+', ' ', 'g'))) AS n_unique,
                   max(md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')))
                     AS max_fp
            FROM documents GROUP BY 1 ORDER BY 1"""))

  /** Word-frequency top-k per language: explode → count → windowed
    * rank. The explode multiplies rows ~60×, but the groupBy shuffles
    * only (lang, word) partial counts — map-side combine keeps the
    * shuffle proportional to the vocabulary, not the corpus.
    */
  private val t5 = Q(
    "t5_word_topk",
    (s, dir) => {
      val w = Window.partitionBy("lang").orderBy(col("n").desc, col("word"))
      Tables.load(s, dir, "documents")
        .select(col("lang"), explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "")
        .groupBy("lang", "word")
        .agg(count(lit(1)).as("n"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .orderBy("lang", "rk")
    },
    Some("""SELECT lang, word, n, rk FROM (
              SELECT lang, word, count(*) AS n,
                row_number() OVER (PARTITION BY lang
                  ORDER BY count(*) DESC, word) AS rk
              FROM (SELECT lang, unnest(string_split(text, ' ')) AS word
                    FROM documents)
              WHERE word <> '' GROUP BY 1, 2)
            WHERE rk <= 5 ORDER BY lang, rk"""))

  /** Bigram conditional-probability table — the n-gram LM statistic a
    * corpus pipeline extracts: P(w2|w1) = c(w1 w2)/c(w1 ·) for the
    * most frequent head words, top-3 successors each. Bigrams are
    * emitted SCAN-LOCALLY in a mapPartitions pass (a posexplode +
    * per-doc lead window would shuffle the exploded corpus — millions
    * of token rows — on doc_id first); the only corpus-sized work is
    * the map-side partial count, so shuffles carry the VOCABULARY.
    */
  private val t6 = Q(
    "t6_bigram_lm",
    (s, dir) => {
      import s.implicits._
      val bigrams = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions(_.flatMap { case (_, text) =>
          val toks = text.toLowerCase(java.util.Locale.ROOT)
            .split(" ").filter(_.nonEmpty)
          if (toks.length < 2) Iterator.empty
          else toks.sliding(2).map(a => (a(0), a(1)))
        })
        .toDF("w1", "w2")
      val counts = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      val wHead = Window.partitionBy("w1")
      val wRank = Window.partitionBy("w1")
        .orderBy(col("c12").desc, col("w2"))
      counts
        .withColumn("c1", sum("c12").over(wHead))
        .withColumn("p", round(col("c12").cast("double") / col("c1"), 4))
        .withColumn("rk", row_number().over(wRank))
        .filter(col("rk") <= 3 && col("c1") >= 500)
        .select("w1", "w2", "c12", "c1", "p", "rk")
        .orderBy("w1", "rk")
    },
    Some("""WITH toks AS (
              SELECT doc_id, t.pos, t.w1 FROM documents,
                LATERAL (SELECT unnest(list_filter(
                  string_split(lower(text), ' '), x -> x <> '')) AS w1,
                  generate_subscripts(list_filter(
                    string_split(lower(text), ' '), x -> x <> ''), 1) AS pos)
                  t),
            bigrams AS (
              SELECT w1, lead(w1) OVER (PARTITION BY doc_id ORDER BY pos)
                AS w2
              FROM toks),
            counts AS (
              SELECT w1, w2, count(*) AS c12 FROM bigrams
              WHERE w2 IS NOT NULL GROUP BY 1, 2),
            ranked AS (
              SELECT w1, w2, c12,
                CAST(sum(c12) OVER (PARTITION BY w1) AS BIGINT) AS c1,
                row_number() OVER (PARTITION BY w1
                  ORDER BY c12 DESC, w2) AS rk
              FROM counts)
            SELECT w1, w2, c12, c1,
                   round(c12 * 1.0 / c1, 4) AS p, rk
            FROM ranked WHERE rk <= 3 AND c1 >= 500
            ORDER BY w1, rk"""))

  /** TF-IDF term ranking: top-3 terms per document (first 50 docs) by
    * tf·ln(N/df), with document frequency computed over the WHOLE
    * corpus — the shuffle carries (word, df) vocabulary rows and the
    * per-doc term counts of the ranked subset only. At 100 TB the df
    * side is a map-side-combined vocabulary aggregate (bounded by
    * vocabulary, not corpus) broadcast back onto the per-doc counts.
    */
  private val t7 = Q(
    "t7_tfidf",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val nDocs = docs.count()
      val toks = docs
        .select(col("doc_id"),
          explode(filter(split(lower(col("text")), " "), x => x =!= ""))
            .as("word"))
      val tf = toks.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("word").agg(count(lit(1)).as("df"))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("score").desc, col("word"))
      tf.filter(col("doc_id") < 50)
        .join(dfreq, Seq("word"))
        .withColumn("score",
          round(col("tf") * log(lit(nDocs.toDouble) / col("df")), 4))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select("doc_id", "word", "tf", "df", "score", "rk")
        .orderBy("doc_id", "rk")
    },
    Some("""WITH toks AS (
              SELECT doc_id, unnest(list_filter(
                string_split(lower(text), ' '), x -> x <> '')) AS word
              FROM documents),
            tf AS (
              SELECT doc_id, word, count(*) AS tf FROM toks GROUP BY 1, 2),
            dfreq AS (
              SELECT word, count(*) AS df FROM tf GROUP BY 1),
            n AS (SELECT count(*) AS n_docs FROM documents),
            scored AS (
              SELECT t.doc_id, t.word, t.tf, d.df,
                round(t.tf * ln(CAST(n.n_docs AS DOUBLE) / d.df), 4)
                  AS score
              FROM tf t JOIN dfreq d USING (word) CROSS JOIN n
              WHERE t.doc_id < 50),
            ranked AS (
              SELECT doc_id, word, tf, df, score,
                row_number() OVER (PARTITION BY doc_id
                  ORDER BY score DESC, word) AS rk
              FROM scored)
            SELECT doc_id, word, tf, df, score, rk FROM ranked
            WHERE rk <= 3 ORDER BY doc_id, rk"""))

  /** Token-window chunking — the training-data prep step that splits
    * each document into fixed-size token chunks (40 tokens, stride 30,
    * 10-token overlap) with a content fingerprint per chunk. Emitted
    * SCAN-LOCALLY in one mapPartitions pass (chunking is per-document
    * work; nothing shuffles until a consumer aggregates), the same
    * shape a 100 TB tokenize-and-pack pipeline uses.
    */
  private val t8 = Q(
    "t8_token_chunks",
    (s, dir) => {
      import s.implicits._
      import graft.ops.Corpus
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions { it =>
          val md5 = graft.ops.Hashing.newMd5()
          it.flatMap { case (id, text) =>
            val toks = text.split(" ").filter(_.nonEmpty)
            Corpus.chunkStarts(toks.length).zipWithIndex.map { case (st, i) =>
              val chunk = toks.slice(st, st + Corpus.chunkSize)
              (id, i, st, chunk.length, md5.hex(chunk.mkString(" ")))
            }
          }
        }
        .toDF("doc_id", "chunk_idx", "start_tok", "n_tok", "fp")
        .orderBy("doc_id", "chunk_idx")
    },
    Some("""WITH toks AS (
              SELECT doc_id, list_filter(string_split(text, ' '),
                x -> x <> '') AS ts
              FROM documents),
            st AS (
              SELECT doc_id, ts,
                unnest(range(0, greatest(len(ts), 1), 30)) AS start_tok
              FROM toks)
            SELECT doc_id,
                   CAST(start_tok / 30 AS INT) AS chunk_idx,
                   CAST(start_tok AS INT) AS start_tok,
                   CAST(least(40, len(ts) - start_tok) AS INT) AS n_tok,
                   md5(array_to_string(
                     list_slice(ts, start_tok + 1, start_tok + 40), ' '))
                     AS fp
            FROM st ORDER BY doc_id, chunk_idx"""))

  /** PII scrubbing: regex-redact email-shaped and long-digit-run
    * (phone/id) spans, count redactions per doc, roll up per source —
    * the compliance pass every training corpus goes through. Pure
    * codegen'd regexp_replace/regexp_count in one scan pass; the
    * synthetic corpus contains few real hits, which is itself the
    * assertion (the pass must be a near-no-op on clean text).
    */
  private val t9 = Q(
    "t9_pii_redact",
    (s, dir) => {
      import graft.ops.Corpus
      Tables.load(s, dir, "documents")
        .withColumn("n_email", regexp_count(col("text"), lit(Corpus.emailRe)))
        .withColumn("n_digit", regexp_count(col("text"), lit(Corpus.digitRe)))
        .withColumn("clean", Corpus.redact(col("text")))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_email").as("n_email_hits"),
          sum("n_digit").as("n_digit_hits"),
          sum(length(col("text")) - length(col("clean"))).as("chars_delta"))
        .orderBy("source")
    },
    Some("""SELECT source, count(*) AS n_docs,
                   CAST(sum(len(regexp_extract_all(text,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')))
                     AS BIGINT) AS n_email_hits,
                   CAST(sum(len(regexp_extract_all(text, '[0-9]{7,}')))
                     AS BIGINT) AS n_digit_hits,
                   CAST(sum(length(text) - length(
                     regexp_replace(regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                       '<EMAIL>', 'g'),
                       '[0-9]{7,}', '<NUM>', 'g'))) AS BIGINT)
                     AS chars_delta
            FROM documents GROUP BY 1 ORDER BY 1"""))

  /** Multinomial naive Bayes language classifier, trained and scored
    * entirely in SQL-expressible aggregates: even doc_ids train
    * (per-lang word counts with add-1 smoothing over the training
    * vocabulary), odd doc_ids test; a test doc's score per language is
    * Σ_w log P(w|lang) + log P(lang), OOV words get the smoothing
    * floor. Output = the lang × predicted confusion matrix. At scale:
    * the model is a vocabulary-sized aggregate joined (broadcast) onto
    * the exploded test corpus — two shuffles total, both map-side
    * combined.
    */
  private val t10 = Q(
    "t10_naive_bayes",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val words = docs
        .select(col("doc_id"), col("lang"),
          explode(filter(split(lower(col("text")), " "), x => x =!= ""))
            .as("word"))
      val train = words.filter(col("doc_id") % 2 === 0)
      val langTotals = train.groupBy("lang")
        .agg(count(lit(1)).as("n_tok"))
      val vocabSize = train.select("word").distinct().count()
      val nTrainDocs = docs.filter(col("doc_id") % 2 === 0).count()
      val priors = docs.filter(col("doc_id") % 2 === 0)
        .groupBy("lang").agg(count(lit(1)).as("n_docs"))
        .withColumn("log_prior",
          log(col("n_docs").cast("double") / lit(nTrainDocs.toDouble)))
      val wordProbs = train.groupBy(col("lang").as("m_lang"), col("word"))
        .agg(count(lit(1)).as("c"))
        .join(langTotals.withColumnRenamed("lang", "m_lang"), Seq("m_lang"))
        .withColumn("log_p",
          log((col("c") + lit(1.0)) / (col("n_tok") + lit(vocabSize.toDouble))))
        .select("m_lang", "word", "log_p")
      val floors = langTotals
        .withColumn("log_floor",
          log(lit(1.0) / (col("n_tok") + lit(vocabSize.toDouble))))
        .select(col("lang").as("m_lang"), col("log_floor"))
      val test = words.filter(col("doc_id") % 2 === 1)
      val scored = test
        .crossJoin(broadcast(floors))
        .join(broadcast(wordProbs), Seq("m_lang", "word"), "left")
        .withColumn("lp", coalesce(col("log_p"), col("log_floor")))
        .groupBy("doc_id", "lang", "m_lang")
        .agg(sum("lp").as("ll"))
        .join(broadcast(priors.select(col("lang").as("m_lang"),
          col("log_prior"))), Seq("m_lang"))
        .withColumn("score", round(col("ll") + col("log_prior"), 4))
      val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("m_lang"))
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .groupBy(col("lang"), col("m_lang").as("pred_lang"))
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "pred_lang")
    },
    Some("""WITH words AS (
              SELECT doc_id, lang, unnest(list_filter(
                string_split(lower(text), ' '), x -> x <> '')) AS word
              FROM documents),
            train AS (SELECT * FROM words WHERE doc_id % 2 = 0),
            lang_totals AS (
              SELECT lang AS m_lang, count(*) AS n_tok
              FROM train GROUP BY 1),
            vocab AS (SELECT count(DISTINCT word) AS v FROM train),
            train_docs AS (
              SELECT lang, count(*) AS n_docs
              FROM documents WHERE doc_id % 2 = 0 GROUP BY 1),
            n_train AS (
              SELECT count(*) AS n FROM documents WHERE doc_id % 2 = 0),
            priors AS (
              SELECT lang AS m_lang,
                ln(n_docs * 1.0 / (SELECT n FROM n_train)) AS log_prior
              FROM train_docs),
            word_probs AS (
              SELECT t.lang AS m_lang, t.word,
                ln((count(*) + 1.0)
                  / (any_value(lt.n_tok) + (SELECT v FROM vocab)))
                  AS log_p
              FROM train t JOIN lang_totals lt ON lt.m_lang = t.lang
              GROUP BY 1, 2),
            floors AS (
              SELECT m_lang,
                ln(1.0 / (n_tok + (SELECT v FROM vocab))) AS log_floor
              FROM lang_totals),
            test AS (SELECT * FROM words WHERE doc_id % 2 = 1),
            scored AS (
              SELECT te.doc_id, te.lang, f.m_lang,
                sum(coalesce(wp.log_p, f.log_floor)) AS ll
              FROM test te CROSS JOIN floors f
              LEFT JOIN word_probs wp
                ON wp.m_lang = f.m_lang AND wp.word = te.word
              GROUP BY 1, 2, 3),
            final AS (
              SELECT s.doc_id, s.lang, s.m_lang,
                round(s.ll + p.log_prior, 4) AS score
              FROM scored s JOIN priors p ON p.m_lang = s.m_lang),
            pred AS (
              SELECT doc_id, lang, m_lang AS pred_lang FROM (
                SELECT *, row_number() OVER (PARTITION BY doc_id
                  ORDER BY score DESC, m_lang) AS rk
                FROM final) WHERE rk = 1)
            SELECT lang, pred_lang, count(*) AS n
            FROM pred GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Repetition-based quality filter (the Gopher/C4 rule family): per
    * document, the distinct-word fraction and the fraction of words
    * covered by the single most frequent bigram — the cheap structural
    * signals that catch boilerplate and degenerate repetition before
    * any model-based scoring. All metrics are computed SCAN-LOCALLY in
    * one typed mapPartitions pass (per-doc token array never leaves
    * the task; the only shuffle is the final order), so the filter
    * costs one corpus pass at any scale. The oracle recomputes the
    * same metrics through a completely different construction (SQL
    * unnest + group-by), cross-checking the per-doc combinatorics.
    */
  private val t11 = Q(
    "t11_repetition_filter",
    (s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          val toks = text.toLowerCase(java.util.Locale.ROOT)
            .split(" ").filter(_.nonEmpty)
          val n = toks.length
          val nDistinct = toks.distinct.length
          val topBigram =
            if (n < 2) 0L
            else toks.sliding(2).map(a => (a(0), a(1))).toSeq
              .groupBy(identity).valuesIterator.map(_.size).max.toLong
          (id, n.toLong, nDistinct.toLong, topBigram)
        })
        .toDF("doc_id", "n_words", "n_distinct", "top_bigram_n")
        .filter(col("n_words") > 0)
        .withColumn("distinct_frac",
          round(col("n_distinct") / col("n_words"), 4))
        .withColumn("top_bigram_frac",
          round(col("top_bigram_n") * lit(2.0) / col("n_words"), 4))
        .withColumn("keep",
          (col("distinct_frac") >= 0.3 && col("top_bigram_frac") <= 0.2)
            .cast("int"))
        .select("doc_id", "n_words", "distinct_frac", "top_bigram_frac",
          "keep")
        .orderBy("doc_id")
    },
    Some("""WITH w AS (
              SELECT doc_id, list_filter(string_split(lower(text), ' '),
                x -> x <> '') AS ws
              FROM documents),
            base AS (
              SELECT doc_id, len(ws) AS n_words,
                     len(list_distinct(ws)) AS n_distinct, ws
              FROM w WHERE len(ws) > 0),
            bg AS (
              SELECT doc_id, ws[i] || ' ' || ws[i + 1] AS b
              FROM base, LATERAL (SELECT unnest(range(1, len(ws))) AS i) t),
            bgc AS (
              SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2),
            topb AS (
              SELECT doc_id, max(c) AS top_c FROM bgc GROUP BY 1),
            m AS (
              SELECT b.doc_id, CAST(b.n_words AS BIGINT) AS n_words,
                     round(b.n_distinct * 1.0 / b.n_words, 4)
                       AS distinct_frac,
                     round(coalesce(t.top_c, 0) * 2.0 / b.n_words, 4)
                       AS top_bigram_frac
              FROM base b LEFT JOIN topb t USING (doc_id))
            SELECT doc_id, n_words, distinct_frac, top_bigram_frac,
                   CAST(CASE WHEN distinct_frac >= 0.3
                          AND top_bigram_frac <= 0.2
                        THEN 1 ELSE 0 END AS INT) AS keep
            FROM m ORDER BY doc_id"""))

  /** Model-based quality scoring (the KenLM-filter shape): train the
    * add-1-smoothed bigram LM on the WHOLE corpus, then score the
    * first 20 documents by average bigram log-probability
    * ln((c12+1)/(c1+V)) — low scores flag out-of-distribution or
    * degenerate text. Scale shape: the model is two
    * vocabulary-bounded aggregates (bigram counts + unigram
    * continuations) joined back onto the scored docs' bigrams — at
    * 100 TB the model tables broadcast and scoring is one pass over
    * the docs to score; nothing corpus-sized shuffles twice.
    */
  private val t12 = Q(
    "t12_lm_quality_score",
    (s, dir) => {
      import s.implicits._
      val toks = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions(_.flatMap { case (id, text) =>
          text.toLowerCase(java.util.Locale.ROOT)
            .split(" ").filter(_.nonEmpty).iterator.map((id, _))
        })
        .toDF("doc_id", "w")
      val bigrams = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions(_.flatMap { case (id, text) =>
          val ts = text.toLowerCase(java.util.Locale.ROOT)
            .split(" ").filter(_.nonEmpty)
          if (ts.length < 2) Iterator.empty
          else ts.sliding(2).map(a => (id, a(0), a(1)))
        })
        .toDF("doc_id", "w1", "w2")
      val counts = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      val c1s = counts.groupBy("w1").agg(sum("c12").as("c1"))
      val vocab = toks.select(countDistinct("w").as("v"))
      bigrams.filter(col("doc_id") < 20)
        .join(counts, Seq("w1", "w2"))
        .join(c1s, Seq("w1"))
        .crossJoin(broadcast(vocab))
        .withColumn("lp",
          log((col("c12") + lit(1.0)) / (col("c1") + col("v"))))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          round(avg("lp"), 4).as("avg_logprob"))
        .orderBy("doc_id")
    },
    Some("""WITH toks AS (
              SELECT doc_id, t.pos, t.w1 FROM documents,
                LATERAL (SELECT unnest(list_filter(
                  string_split(lower(text), ' '), x -> x <> '')) AS w1,
                  generate_subscripts(list_filter(
                    string_split(lower(text), ' '), x -> x <> ''), 1) AS pos)
                  t),
            bigrams AS (
              SELECT doc_id, w1,
                lead(w1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
              FROM toks),
            bg AS (SELECT * FROM bigrams WHERE w2 IS NOT NULL),
            counts AS (
              SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
            c1s AS (SELECT w1, sum(c12) AS c1 FROM counts GROUP BY 1),
            vocab AS (SELECT count(DISTINCT w1) AS v FROM toks)
            SELECT b.doc_id, count(*) AS n_bigrams,
                   round(avg(ln((c.c12 + 1.0)
                     / (h.c1 + (SELECT v FROM vocab)))), 4) AS avg_logprob
            FROM bg b
            JOIN counts c ON b.w1 = c.w1 AND b.w2 = c.w2
            JOIN c1s h ON b.w1 = h.w1
            WHERE b.doc_id < 20
            GROUP BY 1 ORDER BY 1"""))

  /** T13 (beyond the reference): corpus token-distribution profile —
    * the one-pass vocabulary health check run before tokenizer/vocab
    * decisions: total tokens, distinct vocabulary, hapax count (words
    * seen once — vocabulary tail mass), max term frequency, and
    * top-term coverage. Two-level aggregate: the word-keyed frequency
    * table combines map-side (shuffle = vocabulary, never corpus),
    * then five scalars reduce it. All integer-exact except the final
    * coverage ratio.
    */
  private val t13 = Q(
    "t13_token_distribution",
    (s, dir) => {
      val freq = Tables.load(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
        .groupBy("w").agg(count(lit(1)).as("n"))
      freq.agg(
        sum("n").as("total_tokens"),
        count(lit(1)).as("vocab_size"),
        sum(when(col("n") === 1, 1L).otherwise(0L)).as("hapax_count"),
        max("n").as("max_term_freq"))
        .withColumn("top_term_coverage",
          round(col("max_term_freq") / col("total_tokens"), 6))
    },
    Some("""WITH freq AS (
              SELECT w, count(*) AS n FROM (
                SELECT unnest(list_filter(string_split(text, ' '),
                  x -> x <> '')) AS w
                FROM documents)
              GROUP BY w)
            SELECT CAST(sum(n) AS BIGINT) AS total_tokens,
                   count(*) AS vocab_size,
                   CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
                     AS hapax_count,
                   CAST(max(n) AS BIGINT) AS max_term_freq,
                   round(CAST(max(n) AS DOUBLE) / sum(n), 6)
                     AS top_term_coverage
            FROM freq"""))

  /** T14 (X117, beyond the reference): BPE FIRST-MERGE profile — the
    * character-pair frequency table that seeds byte-pair-encoding
    * tokenizer training: every adjacent character pair in every
    * corpus word, counted, top 20 by frequency (the first 20 merge
    * candidates). All codegen'd: split → explode words → explode a
    * position sequence → 2-char substr → one pair-keyed
    * map-side-combined count. The shuffle carries (pair, partial
    * count) — pair cardinality is bounded by alphabet², independent
    * of corpus size — and top-20 is TakeOrdered, never a full sort.
    */
  private val t14 = Q(
    "t14_bpe_first_merges",
    (s, dir) => {
      Tables.load(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) >= 2)
        .select(col("w"),
          explode(sequence(lit(1), length(col("w")) - 1)).as("i"))
        .select(col("w").substr(col("i"), lit(2)).as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("pair"))
        .limit(20)
    },
    Some("""WITH words AS (
              SELECT unnest(string_split(text, ' ')) AS w
              FROM documents),
            pairs AS (
              SELECT substr(w, CAST(i AS INTEGER), 2) AS pair
              FROM (SELECT w, unnest(range(1, len(w))) AS i
                    FROM words WHERE len(w) >= 2))
            SELECT pair, count(*) AS n
            FROM pairs GROUP BY pair
            ORDER BY n DESC, pair LIMIT 20"""))

  /** T15 (X125, beyond the reference): per-source LANGUAGE-MIX report
    * — the corpus-composition dashboard behind data-mixture decisions:
    * docs per source, languages present, dominant language, and a
    * concentration score. Concentration is GINI IMPURITY computed the
    * determinism-safe way: 1 − (Σ nᵢ²)/n² — the numerator is an exact
    * INTEGER sum (associative, any reduction order), so the only
    * floating-point step is ONE IEEE division, bit-identical on every
    * engine; the naive Σ(nᵢ/n)² form sums doubles in engine-dependent
    * order. Two-level aggregate: (source, lang) counts first (shuffle
    * = mix cardinality), then a source-keyed rollup with a window pick
    * of the dominant language (ties break lexicographically).
    */
  private val t15 = Q(
    "t15_language_mix",
    (s, dir) => {
      val counts = Tables.load(s, dir, "documents")
        .groupBy("source", "lang")
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("source")
        .orderBy(col("n").desc, col("lang"))
      counts
        .withColumn("rk", row_number().over(w))
        .groupBy("source")
        .agg(sum("n").as("n_docs"),
          count(lit(1)).as("n_langs"),
          max(when(col("rk") === 1, col("lang"))).as("top_lang"),
          sum(col("n") * col("n")).as("sq"))
        .withColumn("gini",
          lit(1.0) - col("sq") / (col("n_docs") * col("n_docs")))
        .select(col("source"), col("n_docs"), col("n_langs"),
          col("top_lang"), col("gini"))
        .orderBy("source")
    },
    Some("""WITH counts AS (
              SELECT source, lang, count(*) AS n
              FROM documents GROUP BY 1, 2),
            rk AS (
              SELECT source, lang, n,
                     row_number() OVER (PARTITION BY source
                       ORDER BY n DESC, lang) AS rk
              FROM counts)
            SELECT source,
                   CAST(sum(n) AS BIGINT) AS n_docs,
                   count(*) AS n_langs,
                   max(CASE WHEN rk = 1 THEN lang END) AS top_lang,
                   1.0 - CAST(sum(n * n) AS DOUBLE) /
                     (CAST(sum(n) AS DOUBLE) * sum(n)) AS gini
            FROM rk GROUP BY source ORDER BY source"""))

  /** T16 (X138, beyond the reference): VOCABULARY COVERAGE / OOV-rate
    * audit — before freezing a tokenizer vocabulary, measure what a
    * top-K vocab misses per language (the signal that decides vocab
    * size and language up/down-sampling). Same [a-z0-9]+ tokenizer as
    * t1/t5/t13. Scale shape: vocab = one map-side-combined word count
    * + TakeOrdered K (per-partition heaps); the coverage pass re-reads
    * the corpus ONCE with the vocab broadcast as a left join — in-vocab
    * is a null test, the per-language rollup is map-side combined;
    * shuffle = vocabulary + language cardinality, never tokens.
    * OOV rate = one IEEE division of exact BIGINTs, rounded.
    */
  private val t16 = Q(
    "t16_vocab_oov",
    (s, dir) => {
      val toks = Tables.load(s, dir, "documents")
        .select(col("lang"), explode(regexp_extract_all(lower(col("text")),
          lit("[a-z0-9]+"), lit(0))).as("w"))
      val vocab = toks.groupBy("w").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("w")).limit(500)
        .select(col("w").as("vw"))
      toks.join(broadcast(vocab), col("w") === col("vw"), "left")
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_tokens"),
          sum(when(col("vw").isNull, 1L).otherwise(0L)).as("n_oov"))
        .withColumn("oov_rate",
          round(col("n_oov").cast("double") / col("n_tokens"), 4))
        .orderBy("lang")
    },
    Some("""WITH toks AS (
              SELECT lang,
                     unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                       AS w
              FROM documents),
            vocab AS (
              SELECT w FROM (
                SELECT w, count(*) AS c FROM toks GROUP BY w
                ORDER BY c DESC, w LIMIT 500)),
            flagged AS (
              SELECT t.lang, v.w AS vw
              FROM toks t LEFT JOIN vocab v ON t.w = v.w)
            SELECT lang, CAST(count(*) AS BIGINT) AS n_tokens,
                   CAST(sum(CASE WHEN vw IS NULL THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_oov,
                   round(CAST(sum(CASE WHEN vw IS NULL THEN 1 ELSE 0 END)
                       AS DOUBLE) / count(*), 4) AS oov_rate
            FROM flagged
            GROUP BY lang ORDER BY lang"""))

  /** T17 (X153, beyond the reference): PMI COLLOCATION mining — the
    * corpus-linguistics op that surfaces multiword expressions
    * ("fixed phrases") for tokenizer/vocab decisions. PMI is
    * log(p(xy)/(p(x)p(y))), but log is NOT cross-engine
    * bit-deterministic — so the row ranks by the RATIO itself
    * (monotone in PMI): cxy·Nu²/(cx·cy·Nb), computed as doubles in
    * ONE parenthesized op order (each IEEE mul/div correctly rounded →
    * bit-identical on both engines). min-support cxy ≥ 5, global
    * top-20 via TakeOrdered (no single-partition window). Scale:
    * unigram and bigram counts are map-side-combined vocabulary-sized
    * aggregates; the join back is vocabulary-keyed, never
    * corpus-keyed.
    */
  private val t17 = Q(
    "t17_pmi_collocations",
    (s, dir) => {
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text"))
      val toks = docs.select(col("doc_id"),
        filter(split(lower(col("text")), " "), x => x =!= "").as("toks"))
        .localCheckpoint()
      val uni = toks.select(explode(col("toks")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c"))
        .localCheckpoint()
      val nu = uni.agg(sum("c")).first().getLong(0)
      val bi = toks.as[(Long, Seq[String])]
        .mapPartitions(_.flatMap { case (_, ts) =>
          if (ts.length < 2) Iterator.empty
          else ts.sliding(2).map(a => (a(0), a(1)))
        })
        .toDF("w1", "w2")
        .groupBy("w1", "w2").agg(count(lit(1)).as("cxy"))
        .localCheckpoint()
      val nb = bi.agg(sum("cxy")).first().getLong(0)
      bi.filter(col("cxy") >= 5)
        .join(uni.select(col("w").as("w1"), col("c").as("cx")), Seq("w1"))
        .join(uni.select(col("w").as("w2"), col("c").as("cy")), Seq("w2"))
        .withColumn("pmi_ratio",
          col("cxy").cast("double") * lit(nu.toDouble) * lit(nu.toDouble) /
            (col("cx").cast("double") * col("cy").cast("double") *
              lit(nb.toDouble)))
        .select(col("w1"), col("w2"), col("cxy"), col("cx"), col("cy"),
          col("pmi_ratio"))
        .orderBy(col("pmi_ratio").desc, col("w1"), col("w2"))
        .limit(20)
    },
    Some("""WITH toks AS (
              SELECT doc_id, t.pos, t.w FROM documents,
                LATERAL (SELECT unnest(list_filter(
                  string_split(lower(text), ' '), x -> x <> '')) AS w,
                  generate_subscripts(list_filter(
                    string_split(lower(text), ' '), x -> x <> ''), 1) AS pos)
                  t),
            uni AS (SELECT w, CAST(count(*) AS BIGINT) AS c
                    FROM toks GROUP BY w),
            nu AS (SELECT CAST(sum(c) AS BIGINT) AS nu FROM uni),
            bigrams AS (
              SELECT w AS w1, lead(w) OVER (PARTITION BY doc_id
                ORDER BY pos) AS w2
              FROM toks),
            bi AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS cxy
                   FROM bigrams WHERE w2 IS NOT NULL GROUP BY 1, 2),
            nb AS (SELECT CAST(sum(cxy) AS BIGINT) AS nb FROM bi)
            SELECT b.w1, b.w2, b.cxy, u1.c AS cx, u2.c AS cy,
                   CAST(b.cxy AS DOUBLE) * CAST(nu.nu AS DOUBLE) *
                     CAST(nu.nu AS DOUBLE) /
                     (CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE) *
                       CAST(nb.nb AS DOUBLE)) AS pmi_ratio
            FROM bi b
            JOIN uni u1 ON b.w1 = u1.w
            JOIN uni u2 ON b.w2 = u2.w
            CROSS JOIN nu CROSS JOIN nb
            WHERE b.cxy >= 5
            ORDER BY pmi_ratio DESC, b.w1, b.w2
            LIMIT 20"""))

  /** T18 (beyond the reference): RAKE-style keyword scoring — word
    * degree (participations in adjacent-bigram slots) over word
    * frequency, the classic co-occurrence keyword extractor. Degree
    * and frequency are pure integer counts off one bigram explode and
    * one token explode; score = ONE division; top-20 under the total
    * order (score desc, word asc). Per-doc array transforms stay
    * task-local; only (word, count) pairs shuffle.
    */
  private val t18 = Q(
    "t18_rake_keywords",
    (s, dir) => {
      val sets = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          expr("filter(split(text, ' '), x -> x != '')").as("l"))
      val bg = sets.filter(size(col("l")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(l) - 2), " +
            "j -> concat(element_at(l, j + 1), ' ', " +
            "element_at(l, j + 2)))")).as("big"))
      val deg = bg.select(substring_index(col("big"), " ", 1).as("w"))
        .unionByName(
          bg.select(substring_index(col("big"), " ", -1).as("w")))
        .groupBy("w").agg(count(lit(1)).as("deg"))
      val freq = sets.select(explode(col("l")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("freq"))
      deg.join(freq, Seq("w"))
        .select(col("w").as("word"), col("deg"), col("freq"),
          (col("deg").cast("double") / col("freq").cast("double"))
            .as("score"))
        .orderBy(col("score").desc, col("word").asc)
        .limit(20)
    },
    Some("""WITH sets AS (
              SELECT doc_id,
                     list_filter(string_split(text, ' '), x -> x <> '')
                       AS l
              FROM documents),
            bg AS (
              SELECT unnest(list_transform(range(0, len(l) - 1),
                       j -> l[j + 1] || ' ' || l[j + 2])) AS big
              FROM sets WHERE len(l) >= 2),
            deg AS (
              SELECT w, CAST(count(*) AS BIGINT) AS deg FROM (
                SELECT string_split(big, ' ')[1] AS w FROM bg
                UNION ALL
                SELECT string_split(big, ' ')[2] AS w FROM bg)
              GROUP BY w),
            freq AS (
              SELECT w, CAST(count(*) AS BIGINT) AS freq
              FROM (SELECT unnest(l) AS w FROM sets) GROUP BY w)
            SELECT deg.w AS word, deg.deg, freq.freq,
                   CAST(deg.deg AS DOUBLE) / CAST(freq.freq AS DOUBLE)
                     AS score
            FROM deg JOIN freq ON deg.w = freq.w
            ORDER BY score DESC, word ASC
            LIMIT 20"""))

  /** X212 t19: lexical-diversity profile per source — type-token ratio
    * and hapax-legomenon rate, the standard corpus-health numbers a
    * data pipeline tracks to catch template/boilerplate sources (low
    * TTR) and OCR/noise sources (high hapax rate). All counts are
    * exact integers off ONE (source, word) aggregate; the two ratios
    * are single IEEE divisions. Scale: the shuffle carries the
    * per-source VOCABULARY (map-side partial count collapses repeated
    * tokens), never the exploded corpus.
    */
  private val t19 = Q(
    "t19_lexical_diversity",
    (s, dir) => {
      Tables.load(s, dir, "documents")
        .select(col("source"),
          explode(split(lower(col("text")), " ")).as("word"))
        .filter(col("word") =!= "")
        .groupBy("source", "word")
        .agg(count(lit(1)).as("cnt"))
        .groupBy("source")
        .agg(count(lit(1)).as("types"),
          sum("cnt").as("tokens"),
          sum(when(col("cnt") === 1L, 1L).otherwise(0L)).as("hapax"))
        .select(col("source"), col("types"), col("tokens"), col("hapax"),
          (col("types").cast("double") / col("tokens").cast("double"))
            .as("ttr"),
          (col("hapax").cast("double") / col("types").cast("double"))
            .as("hapax_rate"))
        .orderBy("source")
    },
    Some("""WITH wc AS (
              SELECT source, word, count(*) AS cnt
              FROM (SELECT source,
                      unnest(string_split(lower(text), ' ')) AS word
                    FROM documents)
              WHERE word <> '' GROUP BY 1, 2)
            SELECT source,
                   CAST(count(*) AS BIGINT) AS types,
                   CAST(sum(cnt) AS BIGINT) AS tokens,
                   CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
                     AS hapax,
                   CAST(count(*) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE)
                     AS ttr,
                   CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                     / CAST(count(*) AS DOUBLE) AS hapax_rate
            FROM wc GROUP BY source ORDER BY source"""))

  /** X226 t20: CORPUS NOVELTY/SATURATION curve — the Heaps-law
    * diagnostic a data pipeline watches while ingesting: per 100-doc
    * bucket (in doc_id order), what fraction of shingle instances are
    * NEW (first occurrence in the whole corpus lands in this doc)?
    * A healthy diverse corpus stays high; a saturating or duplicated
    * feed decays fast. First-occurrence is min(doc_id) per shingle —
    * one inverted-index shuffle (the d3 plan) — and everything else is
    * exact integers plus a single novelty-rate division; the running
    * distinct-shingle total is a window cumsum of EXACT BIGINTs over
    * the tiny bucket table.
    */
  private val t20 = Q(
    "t20_novelty_curve",
    (s, dir) => {
      val ex = DedupQueries.shingled(s, dir).select("doc_id", "sh")
      val firsts = ex.groupBy("sh").agg(min("doc_id").as("first_doc"))
      val j = ex.join(firsts, Seq("sh"))
        .withColumn("bucket", expr("doc_id div 100"))
        .withColumn("is_new",
          when(col("doc_id") === col("first_doc"), 1L).otherwise(0L))
      val b = j.groupBy("bucket")
        .agg(countDistinct("doc_id").as("n_docs"),
          count(lit(1)).as("n_inst"),
          sum("is_new").as("n_new"))
      b.select(col("bucket"), col("n_docs"), col("n_inst"), col("n_new"),
        (col("n_new").cast("double") / col("n_inst").cast("double"))
          .as("novelty_rate"),
        sum("n_new").over(Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("cum_distinct"))
        .orderBy("bucket")
    },
    Some(s"""WITH sets AS (
               SELECT doc_id, ${DedupQueries.duckShingles} AS shs
               FROM documents),
             ex AS (SELECT doc_id, unnest(shs) AS sh FROM sets),
             firsts AS (
               SELECT sh, min(doc_id) AS first_doc FROM ex GROUP BY 1),
             j AS (
               SELECT e.doc_id, e.doc_id // 100 AS bucket,
                      CASE WHEN e.doc_id = f.first_doc THEN 1 ELSE 0 END
                        AS is_new
               FROM ex e JOIN firsts f USING (sh)),
             b AS (
               SELECT bucket,
                      CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
                      CAST(count(*) AS BIGINT) AS n_inst,
                      CAST(sum(is_new) AS BIGINT) AS n_new
               FROM j GROUP BY 1)
             SELECT bucket, n_docs, n_inst, n_new,
                    CAST(n_new AS DOUBLE) / CAST(n_inst AS DOUBLE)
                      AS novelty_rate,
                    CAST(sum(n_new) OVER (ORDER BY bucket
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS cum_distinct
             FROM b ORDER BY bucket"""))

  /** X234 t21: CORPUS DIVERGENCE via total-variation distance — "how
    * different is the English sub-corpus's unigram distribution from
    * the rest?", the drift/contamination number behind mixture
    * rebalancing and domain-shift alarms. TV = ½·Σ_w |p_w − q_w| is
    * computed EXACTLY: with c1/c2 the per-word counts and n1/n2 the
    * corpus totals, Σ|c1·n2 − c2·n1| is an exact-BIGINT aggregate over
    * the FULL vocabulary (bounded by 2·n1·n2 ≈ 2e12 at sf0.1 — no
    * truncation, no float-sum order hazard, unlike KL/JS whose log is
    * not cross-engine deterministic, the t17 lesson), and TV is ONE
    * final division. The top-10 divergence contributors rank by the
    * same exact integer. Scale: one vocabulary-keyed aggregate (map-
    * side combined), a 2-row totals broadcast, a 10-row TakeOrdered.
    */
  private val t21 = Q(
    "t21_corpus_tv_distance",
    (s, dir) => {
      val words = Tables.load(s, dir, "documents")
        .select(col("lang"),
          explode(regexp_extract_all(lower(col("text")),
            lit("[a-z0-9]+"), lit(0))).as("word"))
        .withColumn("is_en",
          when(col("lang") === "en", 1L).otherwise(0L))
      val counts = words.groupBy("word")
        .agg(sum(col("is_en")).as("c1"),
          sum(lit(1L) - col("is_en")).as("c2"))
        .localCheckpoint()
      val totals = counts.agg(sum("c1").as("n1"), sum("c2").as("n2"))
      val scored = counts.crossJoin(broadcast(totals))
        .withColumn("num", abs(col("c1") * col("n2")
          - col("c2") * col("n1")))
      val tv = scored.agg(sum("num").as("num_total"),
        min("n1").as("n1"), min("n2").as("n2"))
      // orderBy+limit compiles to TakeOrderedAndProject: per-partition
      // top-10 heaps + a 10-row driver merge, never a global sort.
      val topDf = scored.select(col("word"), col("c1"), col("c2"),
        col("num"))
        .orderBy(col("num").desc, col("word")).limit(10)
      topDf.crossJoin(broadcast(tv))
        .select(col("word"), col("c1"), col("c2"), col("num"),
          col("n1"), col("n2"), col("num_total"),
          (col("num_total").cast("double")
            / (lit(2.0) * col("n1").cast("double")
              * col("n2").cast("double"))).as("tv_distance"))
        .orderBy(col("num").desc, col("word"))
    },
    Some("""WITH words AS (
              SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_en,
                     unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                       AS word
              FROM documents),
            counts AS (
              SELECT word, CAST(sum(is_en) AS BIGINT) AS c1,
                     CAST(sum(1 - is_en) AS BIGINT) AS c2
              FROM words GROUP BY word),
            totals AS (
              SELECT CAST(sum(c1) AS BIGINT) AS n1,
                     CAST(sum(c2) AS BIGINT) AS n2
              FROM counts),
            scored AS (
              SELECT word, c1, c2, abs(c1 * n2 - c2 * n1) AS num, n1, n2
              FROM counts CROSS JOIN totals),
            tv AS (
              SELECT CAST(sum(num) AS BIGINT) AS num_total,
                     min(n1) AS n1, min(n2) AS n2
              FROM scored)
            SELECT s.word, s.c1, s.c2, s.num, t.n1, t.n2, t.num_total,
                   CAST(t.num_total AS DOUBLE)
                     / (2.0 * CAST(t.n1 AS DOUBLE) * CAST(t.n2 AS DOUBLE))
                     AS tv_distance
            FROM scored s CROSS JOIN tv t
            ORDER BY s.num DESC, s.word LIMIT 10"""))

  /** X248 t22: READABILITY scoring (Coleman–Liau index — chosen over
    * Flesch precisely because it needs NO syllable counting: letters,
    * words, and sentences are all exact regex-count integers, so the
    * index is a pinned three-term IEEE chain per doc with zero
    * linguistic heuristics to drift cross-engine). The grade-level
    * number is the classic curriculum/complexity filter for training-
    * mix construction. Sentence count is floored at 1 (fragments)
    * IN INTEGERS before any division. Scale: one codegen'd scan pass,
    * map-side banded rollup — no shuffle carries text.
    */
  private val t22 = Q(
    "t22_readability_cli",
    (s, dir) => {
      val letters =
        length(regexp_replace(col("text"), "[^A-Za-z]", "")).cast("long")
      val words =
        size(regexp_extract_all(col("text"), lit("\\S+"), lit(0)))
          .cast("long")
      val sents = greatest(
        size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0)))
          .cast("long"), lit(1L))
      val cli = lit(0.0588) *
        (lit(100.0) * col("letters").cast("double")
          / col("words").cast("double")) -
        lit(0.296) * (lit(100.0) * col("sents").cast("double")
          / col("words").cast("double")) - lit(15.8)
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), letters.as("letters"), words.as("words"),
          sents.as("sents"))
        .filter(col("words") >= 1L)
        .withColumn("cli", cli)
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
                   CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                     AS BIGINT) AS letters,
                   CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)
                     AS words,
                   greatest(CAST(len(regexp_extract_all(text, '[.!?]+'))
                     AS BIGINT), 1) AS sents,
                   CAST(0.0588 AS DOUBLE) * (CAST(100.0 AS DOUBLE)
                       * CAST(length(regexp_replace(text, '[^A-Za-z]', '',
                           'g')) AS DOUBLE)
                       / CAST(len(regexp_extract_all(text, '\S+'))
                           AS DOUBLE))
                   - CAST(0.296 AS DOUBLE) * (CAST(100.0 AS DOUBLE)
                       * CAST(greatest(CAST(len(regexp_extract_all(text,
                           '[.!?]+')) AS BIGINT), 1) AS DOUBLE)
                       / CAST(len(regexp_extract_all(text, '\S+'))
                           AS DOUBLE))
                   - CAST(15.8 AS DOUBLE) AS cli
            FROM documents
            WHERE len(regexp_extract_all(text, '\S+')) >= 1
            ORDER BY doc_id"""))

  /** X252 t23: KWIC CONCORDANCE (keyword-in-context — the corpus-
    * linguistics view behind every "show me how this term is used"
    * tool, and the context-window extraction step of targeted corpus
    * audits): every occurrence of the keyword with its ±3-token
    * context, by position. Pure integer/string ops: positions from
    * posexplode, context via 1-based slice arithmetic (clamped in
    * INTEGERS at both document edges — the empty-left-context first
    * token is proven, not special-cased). Scale: one codegen'd scan,
    * occurrence rows ∝ term frequency (never the corpus), total order
    * (doc_id, position).
    */
  private val t23 = Q(
    "t23_kwic_concordance",
    (s, dir) => {
      val base = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          filter(split(lower(col("text")), " "), x => x =!= "")
            .as("toks"))
        .select(col("doc_id"), col("toks"),
          posexplode(col("toks")).as(Seq("pos0", "tok")))
        .filter(col("tok") === "merge")
        .withColumn("p1", col("pos0") + 1)
      base.select(col("doc_id"), col("p1").cast("long").as("pos"),
        array_join(slice(col("toks"),
          greatest(lit(1), col("p1") - 3),
          least(lit(3), col("p1") - 1)), " ").as("left_ctx"),
        col("tok").as("keyword"),
        array_join(slice(col("toks"), col("p1") + 1,
          least(lit(3), size(col("toks")) - col("p1"))), " ")
          .as("right_ctx"))
        .orderBy("doc_id", "pos")
    },
    Some("""WITH sets AS (
              SELECT doc_id,
                     list_filter(string_split(lower(text), ' '),
                       x -> x <> '') AS toks
              FROM documents),
            hits AS (
              SELECT doc_id, toks, unnest(
                list_filter(list_transform(range(1, len(toks) + 1),
                  i -> CASE WHEN toks[i] = 'merge' THEN i END),
                  x -> x IS NOT NULL)) AS p1
              FROM sets)
            SELECT doc_id, CAST(p1 AS BIGINT) AS pos,
                   coalesce(array_to_string(
                     toks[greatest(1, p1 - 3):p1 - 1], ' '), '')
                     AS left_ctx,
                   'merge' AS keyword,
                   coalesce(array_to_string(
                     toks[p1 + 1:least(len(toks), p1 + 3)], ' '), '')
                     AS right_ctx
            FROM hits ORDER BY doc_id, pos"""))

  /** X264 t24: BLOCKLIST SAFETY FILTER with obfuscation normalization
    * — the moderation pre-filter every corpus intake runs: text is
    * canonicalized (lowercase + the classic leetspeak map 0→o 1→l 3→e
    * 4→a 5→s 7→t @→a $→s) BEFORE matching, so "sl0w" and "sl@w"-style
    * evasions of a blocked term still hit. Fixed 4-term blocklist
    * (neutral engine words stand in for a real deny list); per
    * (source) report = docs flagged, clean docs, per-term hit counts
    * as fixed columns. translate() is a codegen'd char map — one scan
    * pass, no shuffle carries text. The row proves normalize-then-
    * match ordering: a doc planted as obfuscated only in this
    * fixture's vocabulary would be MISSED by match-then-normalize.
    */
  private val t24 = Q(
    "t24_blocklist_filter",
    (s, dir) => {
      val norm = translate(lower(col("text")), "013457@$", "oleastas")
      def hit(term: String) =
        when(norm.contains(term), 1L).otherwise(0L)
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          hit("deadlock").as("h_deadlock"),
          hit("corrupt").as("h_corrupt"),
          hit("orphan").as("h_orphan"),
          hit("fatal").as("h_fatal"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(greatest(col("h_deadlock"), col("h_corrupt"),
            col("h_orphan"), col("h_fatal"))).as("n_flagged"),
          sum("h_deadlock").as("n_deadlock"),
          sum("h_corrupt").as("n_corrupt"),
          sum("h_orphan").as("n_orphan"),
          sum("h_fatal").as("n_fatal"))
        .withColumn("n_clean", col("n_docs") - col("n_flagged"))
        .orderBy("source")
    },
    Some("""WITH normed AS (
              SELECT doc_id, source,
                     translate(lower(text), '013457@$', 'oleastas')
                       AS nt
              FROM documents),
            hits AS (
              SELECT source,
                     CASE WHEN contains(nt, 'deadlock') THEN 1 ELSE 0 END
                       AS h_deadlock,
                     CASE WHEN contains(nt, 'corrupt') THEN 1 ELSE 0 END
                       AS h_corrupt,
                     CASE WHEN contains(nt, 'orphan') THEN 1 ELSE 0 END
                       AS h_orphan,
                     CASE WHEN contains(nt, 'fatal') THEN 1 ELSE 0 END
                       AS h_fatal
              FROM normed)
            SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(greatest(h_deadlock, h_corrupt, h_orphan,
                     h_fatal)) AS BIGINT) AS n_flagged,
                   CAST(sum(h_deadlock) AS BIGINT) AS n_deadlock,
                   CAST(sum(h_corrupt) AS BIGINT) AS n_corrupt,
                   CAST(sum(h_orphan) AS BIGINT) AS n_orphan,
                   CAST(sum(h_fatal) AS BIGINT) AS n_fatal,
                   CAST(count(*) - sum(greatest(h_deadlock, h_corrupt,
                     h_orphan, h_fatal)) AS BIGINT) AS n_clean
            FROM hits GROUP BY source ORDER BY source"""))

  /** X266 t25: CANARY-STRING contamination scan — the substring-level
    * complement of d12's fingerprint decontamination: benchmark
    * answers, secret markers, and eval prompts leak as VERBATIM
    * SUBSTRINGS inside larger documents, which doc-level fingerprints
    * never see. Six fixed canaries (some present in this corpus, some
    * absent — both branches proven) scanned with codegen'd contains();
    * per canary: docs hit, first hit (min doc_id), hit mass. At real
    * scale the per-pattern contains() chain becomes one Aho–Corasick
    * automaton pass (documented trade: N patterns in one scan vs N
    * codegen'd scans — same shuffle shape, both scan-local). Absent
    * canaries REPORT a zero row rather than vanishing (left join
    * against the literal canary table).
    */
  private val t25 = Q(
    "t25_canary_scan",
    (s, dir) => {
      import s.implicits._
      val canaries = Seq("slow hash join", "deadlock", "xyzzy-canary-1",
        "customer batch", "plugh-canary-2", "scan")
        .toDF("canary")
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), lower(col("text")).as("lt"))
      val hits = docs.crossJoin(broadcast(canaries))
        .filter(col("lt").contains(col("canary")))
        .groupBy("canary")
        .agg(count(lit(1)).as("n_docs_hit"),
          min("doc_id").as("first_hit_doc"),
          sum("doc_id").as("hit_doc_id_sum"))
      canaries.join(hits, Seq("canary"), "left")
        .select(col("canary"),
          coalesce(col("n_docs_hit"), lit(0L)).as("n_docs_hit"),
          coalesce(col("first_hit_doc"), lit(-1L)).as("first_hit_doc"),
          coalesce(col("hit_doc_id_sum"), lit(0L)).as("hit_doc_id_sum"))
        .orderBy("canary")
    },
    Some("""WITH canaries AS (
              SELECT unnest(['slow hash join', 'deadlock',
                'xyzzy-canary-1', 'customer batch', 'plugh-canary-2',
                'scan']) AS canary),
            hits AS (
              SELECT c.canary,
                     CAST(count(*) AS BIGINT) AS n_docs_hit,
                     CAST(min(d.doc_id) AS BIGINT) AS first_hit_doc,
                     CAST(sum(d.doc_id) AS BIGINT) AS hit_doc_id_sum
              FROM canaries c
              JOIN documents d ON contains(lower(d.text), c.canary)
              GROUP BY c.canary)
            SELECT c.canary,
                   coalesce(h.n_docs_hit, 0) AS n_docs_hit,
                   coalesce(h.first_hit_doc, -1) AS first_hit_doc,
                   coalesce(h.hit_doc_id_sum, 0) AS hit_doc_id_sum
            FROM canaries c LEFT JOIN hits h USING (canary)
            ORDER BY c.canary"""))

  /** X269 t26: RARITY-RANK quality filter — an integer-exact surrogate
    * for perplexity-based filtering (the production pattern: score docs
    * with a cheap LM, drop the tail). A real LM score is a chained
    * float log-sum whose cross-engine hash is fragile; ranking tokens
    * by corpus frequency and scoring a doc by its MEAN TOKEN RANK is
    * monotone-equivalent for a unigram model (rank = order statistic of
    * -log p) and stays in BIGINT end-to-end. A doc is `rare_heavy` when
    * its mean rank exceeds the corpus mean rank — compared by integer
    * cross-multiplication (rank_sum·Σn > Σrank_sum·n), the playbook's
    * never-divide-at-a-gate rule. At 100 TB the products need
    * DECIMAL(38,0) (rank_sum ~1e10 × Σn ~1e13 overflows int64); at test
    * SF they fit int64 and the BIGINT spelling keeps the hash simple.
    * Scale: the rank table is VOCAB-sized (Heaps' law: ~1M tokens at
    * 100 TB), so the unpartitioned dense_rank window sorts the
    * vocabulary, not the corpus, and the per-token join broadcasts.
    */
  private val t26 = Q(
    "t26_rarity_rank_filter",
    (s, dir) => {
      val toks = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          explode(regexp_extract_all(col("text"), lit("[A-Za-z0-9]+"),
            lit(0))).as("tok"))
      val ranked = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
        .withColumn("rnk", dense_rank()
          .over(Window.orderBy(col("cnt").desc, col("tok")))
          .cast("long"))
      val perDoc = toks.join(broadcast(ranked), "tok")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_toks"), sum("rnk").as("rank_sum"))
      val tot = perDoc.agg(sum("n_toks").as("tn"),
        sum("rank_sum").as("trs"))
      perDoc.crossJoin(broadcast(tot))
        .select(col("doc_id"), col("n_toks"), col("rank_sum"),
          when(col("rank_sum") * col("tn") > col("trs") * col("n_toks"),
            lit(1L)).otherwise(lit(0L)).as("rare_heavy"))
        .orderBy("doc_id")
    },
    Some("""WITH toks AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(text, '[A-Za-z0-9]+'))
                       AS tok
              FROM documents),
            counts AS (
              SELECT tok, CAST(count(*) AS BIGINT) AS cnt
              FROM toks GROUP BY tok),
            ranked AS (
              SELECT tok, CAST(dense_rank()
                OVER (ORDER BY cnt DESC, tok) AS BIGINT) AS rnk
              FROM counts),
            per_doc AS (
              SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_toks,
                     CAST(sum(r.rnk) AS BIGINT) AS rank_sum
              FROM toks t JOIN ranked r ON t.tok = r.tok
              GROUP BY t.doc_id),
            tot AS (
              SELECT CAST(sum(n_toks) AS BIGINT) AS tn,
                     CAST(sum(rank_sum) AS BIGINT) AS trs
              FROM per_doc)
            SELECT d.doc_id, d.n_toks, d.rank_sum,
                   CAST(CASE WHEN d.rank_sum * t.tn > t.trs * d.n_toks
                     THEN 1 ELSE 0 END AS BIGINT) AS rare_heavy
            FROM per_doc d CROSS JOIN tot t
            ORDER BY d.doc_id"""))

  /** X273 t27: MARKUP STRIP + ENTITY ROUNDTRIP — the web-corpus
    * boilerplate-removal kernel (the step before every quality gate on
    * crawled data), proven by construction: a payload WITH specials
    * (&, <, >, ") is entity-escaped, wrapped in real markup (tags, a
    * script block whose BODY contains bare < and >, a comment), then
    * stripped back — script/comment blocks FIRST (non-greedy spans;
    * naive tag-stripping would sever the script's `1 < 2 && x > 0` in
    * the middle), then tags, then entity-unescape in the REVERSE order
    * of escaping (&amp; last — unescaping it first would double-decode
    * &amp;lt;). roundtrip_ok==1 for every doc is the proof; lengths and
    * tag counts pin the intermediate states. All codegen'd
    * replace/regexp_replace — one scan pass, zero shuffles before the
    * final sort, same single-pass cost as t9's PII redaction at 100 TB.
    */
  private val t27 = Q(
    "t27_markup_strip",
    (s, dir) => {
      val payload = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          expr("replace(text, 'table', 'a<b & \"c\">d')").as("p"))
      val esc = payload.withColumn("e",
        expr("""replace(replace(replace(replace(p, '&', '&amp;'),
          '<', '&lt;'), '>', '&gt;'), '"', '&quot;')"""))
      val html = esc.withColumn("h",
        concat(lit("""<html><body><p id="d"""),
          col("doc_id").cast("string"),
          lit("""" class="main">"""), col("e"),
          lit("</p><script>track(1 < 2 && x > 0);</script>" +
            "<!-- generated --></body></html>")))
      val stripped = html.withColumn("s0",
        regexp_replace(regexp_replace(regexp_replace(col("h"),
          lit("<script>.*?</script>"), lit("")),
          lit("<!--.*?-->"), lit("")),
          lit("<[^>]*>"), lit("")))
      stripped
        .withColumn("c",
          expr("""replace(replace(replace(replace(s0, '&quot;', '"'),
            '&gt;', '>'), '&lt;', '<'), '&amp;', '&')"""))
        .select(col("doc_id"),
          length(col("p")).cast("long").as("n_chars_payload"),
          length(col("h")).cast("long").as("n_chars_html"),
          size(regexp_extract_all(col("h"), lit("<[^>]*>"), lit(0)))
            .cast("long").as("n_tags_stripped"),
          when(col("c") === col("p"), 1L).otherwise(0L)
            .as("roundtrip_ok"))
        .orderBy("doc_id")
    },
    Some("""WITH payload AS (
              SELECT doc_id,
                     replace(text, 'table', 'a<b & "c">d') AS p
              FROM documents),
            esc AS (
              SELECT doc_id, p,
                     replace(replace(replace(replace(p, '&', '&amp;'),
                       '<', '&lt;'), '>', '&gt;'), '"', '&quot;') AS e
              FROM payload),
            html AS (
              SELECT doc_id, p,
                     '<html><body><p id="d' || CAST(doc_id AS VARCHAR) ||
                     '" class="main">' || e ||
                     '</p><script>track(1 < 2 && x > 0);</script>' ||
                     '<!-- generated --></body></html>' AS h
              FROM esc),
            stripped AS (
              SELECT doc_id, p, h,
                     regexp_replace(regexp_replace(regexp_replace(h,
                       '<script>.*?</script>', '', 'g'),
                       '<!--.*?-->', '', 'g'),
                       '<[^>]*>', '', 'g') AS s0
              FROM html),
            clean AS (
              SELECT doc_id, p, h,
                     replace(replace(replace(replace(s0, '&quot;', '"'),
                       '&gt;', '>'), '&lt;', '<'), '&amp;', '&') AS c,
                     len(regexp_extract_all(h, '<[^>]*>')) AS n_tags
              FROM stripped)
            SELECT doc_id,
                   CAST(length(p) AS BIGINT) AS n_chars_payload,
                   CAST(length(h) AS BIGINT) AS n_chars_html,
                   CAST(n_tags AS BIGINT) AS n_tags_stripped,
                   CAST(CASE WHEN c = p THEN 1 ELSE 0 END AS BIGINT)
                     AS roundtrip_ok
            FROM clean ORDER BY doc_id"""))

  // ---- t28/t29: full BPE train + encode --------------------------

  private val bpeMerges = 10

  /** Clean training vocabulary: lowercase all-alpha words ≥2 chars with
    * corpus frequencies (BPE trains on the WORD-FREQUENCY table, so
    * every iteration's pair count is a vocabulary-sized aggregate, not
    * a corpus scan — the property that keeps tokenizer training cheap
    * at 100 TB). The alpha-only gate also removes every quoting/regex
    * hazard from the merge-application literals on both engines. */
  private def bpeWords(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    Tables.load(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("w0"))
      .select(lower(col("w0")).as("w"))
      .filter(col("w").rlike("^[a-z]+$") && length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("cnt"))

  /** Driver-loop BPE training: `bpeMerges` iterations of (count all
    * adjacent symbol pairs weighted by word frequency → argmax with
    * lexicographic tie-break → merge that pair everywhere via leftmost
    * non-overlapping replace). Driver state = the merge list (10
    * strings); each iteration is one vocabulary-sized aggregate plus
    * one collect of a single row — the k-means collect-and-reembed
    * shape. Returns (merge list, final segmented vocabulary). */
  /** Returns (merge list, final segmented vocabulary, persisted BASE
    * vocab handle — callers unpersist it when done). Round-17 opt:
    * only the base word-frequency table (the one real corpus scan) is
    * persisted; each iteration's segmentation is the lineage chain of
    * i regexp_replaces over it, recomputed inside that iteration's
    * single argmax-collect job. The former per-iteration
    * persist+count forced 10 extra materialization jobs per training
    * run to cache a ~vocab-sized table whose recompute is a few
    * string replaces — job count per train drops from ~21 to ~11
    * with identical merges (t28/t29/t33 hashes unchanged).
    */
  private def bpeTrain(s: org.apache.spark.sql.SparkSession, dir: String)
      : (Seq[(Int, String, String, Long)], org.apache.spark.sql.DataFrame,
         org.apache.spark.sql.DataFrame) = {
    val base = bpeWords(s, dir)
      .withColumn("s", concat_ws(" ", split(col("w"), "")))
      .persist()
    var df = base
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    for (it <- 1 to bpeMerges) {
      val top = df
        .select(col("cnt"), split(col("s"), " ").as("syms"))
        .select(col("cnt"), col("syms"),
          explode(sequence(lit(1), size(col("syms")) - 1)).as("j"))
        .select(col("cnt"),
          element_at(col("syms"), col("j")).as("l"),
          element_at(col("syms"), col("j") + 1).as("r"))
        .groupBy("l", "r").agg(sum("cnt").as("n"))
        .orderBy(col("n").desc, col("l"), col("r"))
        .limit(1).collect()(0)
      val (l, r) = (top.getString(0), top.getString(1))
      merges += ((it, l, r, top.getLong(2)))
      df = df.withColumn("s", regexp_replace(col("s"),
        lit(java.util.regex.Pattern.quote(l + " " + r)),
        lit(java.util.regex.Matcher.quoteReplacement(l + r))))
    }
    (merges.toSeq, df, base)
  }

  /** Shared DuckDB replay of the whole training loop: w0 (char-split
    * vocabulary) then per iteration p$i (weighted pair argmax) and
    * w$i (merge applied via leftmost non-overlapping replace — same
    * semantics as Spark's regexp_replace of the quoted literal).
    * Compose with a merge-table select (t28) or an encode join (t29). */
  private def bpeDuckCtes: String =
    bpeChainCtes(
      """words AS MATERIALIZED (
        |  SELECT lower(w0) AS w, count(*) AS cnt FROM (
        |    SELECT unnest(string_split(text, ' ')) AS w0
        |    FROM documents) t
        |  WHERE regexp_matches(lower(w0), '^[a-z]+$')
        |    AND len(w0) >= 2
        |  GROUP BY 1)""".stripMargin, bpeMerges)

  /** The same replay chain over ANY `words(w, cnt)` unit table and
    * iteration count — t28/t29 ride the unigram vocabulary; t31's
    * prefix proof rides the cross-word bigram units. */
  private def bpeChainCtes(wordsCte: String, n: Int): String = {
    val sb = new StringBuilder
    // MATERIALIZED is load-bearing: w$i references w${i-1} twice (once
    // directly, once through p$i), so inlined CTEs re-evaluate the base
    // 2^n times — at 12 levels over the sf0.01 bigram words table that
    // is 4096 re-runs of the wpos self-join (>10 min); materialized,
    // each level runs once (<1 s).
    sb ++= s"""WITH $wordsCte,
             |w0 AS MATERIALIZED (
             |  SELECT w, cnt,
             |         array_to_string(string_split(w, ''), ' ') AS s
             |  FROM words)""".stripMargin
    for (i <- 1 to n) {
      sb ++= s""",
                |p$i AS MATERIALIZED (
                |  SELECT l, r, n FROM (
                |    SELECT syms[j] AS l, syms[j + 1] AS r,
                |           CAST(sum(cnt) AS BIGINT) AS n
                |    FROM (SELECT cnt, string_split(s, ' ') AS syms
                |          FROM w${i - 1}),
                |         unnest(range(1, len(syms))) AS u(j)
                |    GROUP BY 1, 2) t
                |  ORDER BY n DESC, l, r LIMIT 1),
                |w$i AS MATERIALIZED (
                |  SELECT w, cnt,
                |         replace(s, p.l || ' ' || p.r, p.l || p.r) AS s
                |  FROM w${i - 1}, p$i p)""".stripMargin
    }
    sb.toString
  }

  /** X302 t28: BPE TOKENIZER TRAINING — the full iterative loop t14
    * only seeds: 10 byte-pair merges learned from the word-frequency
    * table (count every adjacent symbol pair weighted by word count →
    * argmax, ties lexicographic → merge everywhere, leftmost
    * non-overlapping), exactly the Sennrich et al. BPE algorithm.
    * Learned symbols grow beyond characters ("th"+"e" → "the") because
    * each iteration pairs over the PREVIOUS iteration's segmentation.
    * Scale: training never touches the corpus after the first word
    * count — every iteration is a vocabulary-sized aggregate (pair
    * cardinality ≤ running-vocab², in practice tiny) plus a one-row
    * collect; the driver holds 10 merge strings. The oracle replays
    * all 10 iterations from parquet (argmax chain included), so the
    * hash proves the exact learned merge TABLE, not a property.
    */
  private val t28 = Q(
    "t28_bpe_train",
    (s, dir) => {
      val (merges, _, base) = bpeTrain(s, dir)
      base.unpersist()
      import s.implicits._
      merges.toDF("iter", "l_sym", "r_sym", "n")
        .orderBy("iter")
    },
    Some(bpeDuckCtes + s"""
         |SELECT * FROM (
         |${(1 to bpeMerges).map(i =>
             s"  SELECT $i AS iter, l AS l_sym, r AS r_sym, n FROM p$i")
             .mkString(" UNION ALL\n")}
         |) ORDER BY iter""".stripMargin))

  /** X303 t29: BPE ENCODE — applying the learned tokenizer to the
    * corpus (the op every training run executes billions of times):
    * each document's clean words join the trained segmentation table,
    * so per-source token accounting (chars vs BPE tokens, compression
    * ratio) comes from ONE vocabulary-keyed equi-join against the
    * corpus scan — no per-document merge replay. The ratio is one IEEE
    * division of two exact integer sums (order-free, cross-engine
    * deterministic). At 100 TB: the segmentation table is
    * vocabulary-sized (broadcastable), the corpus never shuffles.
    */
  private val t29 = Q(
    "t29_bpe_encode",
    (s, dir) => {
      val (_, fin, base) = bpeTrain(s, dir)
      val seg = fin.select(col("w"),
        size(split(col("s"), " ")).as("n_tokens"))
      val docw = Tables.load(s, dir, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("w0"))
        .select(col("source"), lower(col("w0")).as("w"))
        .filter(col("w").rlike("^[a-z]+$") && length(col("w")) >= 2)
      val out = docw.join(broadcast(seg), Seq("w"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_words"),
          sum(length(col("w"))).as("sum_chars"),
          sum(col("n_tokens")).as("sum_tokens"))
        .select(col("source"), col("n_words"), col("sum_chars"),
          col("sum_tokens"),
          round(col("sum_chars").cast("double")
            / col("sum_tokens").cast("double"), 4).as("chars_per_token"))
        .orderBy("source")
      base.unpersist()
      out
    },
    Some(bpeDuckCtes + s""",
         |seg AS (
         |  SELECT w, len(string_split(s, ' ')) AS n_tokens
         |  FROM w$bpeMerges),
         |docw AS (
         |  SELECT source, lower(w0) AS w FROM (
         |    SELECT source, unnest(string_split(text, ' ')) AS w0
         |    FROM documents) t
         |  WHERE regexp_matches(lower(w0), '^[a-z]+$$')
         |    AND len(w0) >= 2)
         |SELECT source,
         |       CAST(count(*) AS BIGINT) AS n_words,
         |       CAST(sum(len(d.w)) AS BIGINT) AS sum_chars,
         |       CAST(sum(g.n_tokens) AS BIGINT) AS sum_tokens,
         |       round(CAST(sum(len(d.w)) AS DOUBLE)
         |         / CAST(sum(g.n_tokens) AS DOUBLE), 4) AS chars_per_token
         |FROM docw d JOIN seg g USING (w)
         |GROUP BY source ORDER BY source""".stripMargin))

  /** X304 t30: BM25 RETRIEVAL — the canonical lexical ranking function
    * (Robertson–Spärck Jones; the Lucene `ln(1 + (N−df+0.5)/(df+0.5))`
    * IDF variant, k1=1.2 b=0.75) that t7's raw TF-IDF feeds in every
    * search/dedup/quality pipeline: three fixed queries scored against
    * the corpus, top-5 docs each. Plan shape at 100 TB: the query-term
    * set broadcasts against ONE tokenization pass (an inverted-index
    * equi-join whose fanout is term document-frequency), doc lengths
    * are a one-pass aggregate, and nothing corpus-sized shuffles.
    * Determinism: per-(query,term,doc) contributions are computed with
    * identical IEEE op order on both engines, floored once to integer
    * 1e-4 units, and summed as exact BIGINTs (the s12 posture) — so
    * the cross-term sum is order-free and the ranking ties break on
    * doc_id. All constants are written as decimal literals (2.2, not
    * k1+1.0) so both engines parse the identical double.
    */
  private val t30 = Q(
    "t30_bm25_retrieval",
    (s, dir) => {
      import s.implicits._
      val qterms = Seq((1, "hash"), (1, "join"), (2, "window"),
        (2, "agg"), (2, "stream"), (3, "vector"), (3, "scan"))
        .toDF("query_id", "w")
      val toks = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          explode(filter(split(lower(col("text")), " "), x => x =!= ""))
            .as("w"))
      val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      val st = dl.agg(count(lit(1)).as("n"), sum("dl").as("sd")).first()
      val nDocs = st.getLong(0)
      val avgdl = st.getLong(1).toDouble / nDocs.toDouble
      val tf = toks.join(broadcast(qterms), Seq("w"))
        .groupBy("query_id", "w", "doc_id").agg(count(lit(1)).as("tf"))
      val dfw = toks
        .join(broadcast(qterms.select("w").distinct()), Seq("w"))
        .groupBy("w").agg(countDistinct("doc_id").as("df"))
      val contrib = tf.join(broadcast(dfw), Seq("w")).join(dl, Seq("doc_id"))
        .withColumn("idf",
          log((lit(nDocs.toDouble) - col("df") + lit(0.5))
            / (col("df") + lit(0.5)) + lit(1.0)))
        .withColumn("ci", floor(
          col("idf") * (col("tf") * lit(2.2))
            / (col("tf") + lit(1.2)
              * (lit(0.25) + lit(0.75) * col("dl") / lit(avgdl)))
            * lit(10000.0) + lit(0.5)).cast("long"))
      val w = Window.partitionBy("query_id")
        .orderBy(col("score_m").desc, col("doc_id"))
      contrib.groupBy("query_id", "doc_id")
        .agg(sum("ci").as("score_m"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("rank"), col("doc_id"),
          col("score_m"))
        .orderBy("query_id", "rank")
    },
    Some("""WITH toks AS (
              SELECT doc_id, w FROM (
                SELECT doc_id,
                       unnest(string_split(lower(text), ' ')) AS w
                FROM documents) t
              WHERE w <> ''),
            qt AS (
              SELECT * FROM (VALUES (1, 'hash'), (1, 'join'),
                (2, 'window'), (2, 'agg'), (2, 'stream'),
                (3, 'vector'), (3, 'scan')) v(query_id, w)),
            dl AS (
              SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
              FROM toks GROUP BY 1),
            st AS (
              SELECT CAST(count(*) AS BIGINT) AS n_docs,
                     CAST(sum(dl) AS BIGINT) AS sum_dl FROM dl),
            tf AS (
              SELECT q.query_id, q.w, t.doc_id,
                     CAST(count(*) AS BIGINT) AS tf
              FROM toks t JOIN qt q ON q.w = t.w GROUP BY 1, 2, 3),
            dfw AS (
              SELECT w, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
              FROM toks WHERE w IN (SELECT w FROM qt) GROUP BY 1),
            contrib AS (
              SELECT tf.query_id, tf.doc_id,
                CAST(floor(
                  ln((CAST(st.n_docs AS DOUBLE) - df + 0.5)
                      / (df + 0.5) + 1.0)
                  * (tf * 2.2)
                  / (tf + 1.2 * (0.25 + 0.75 * dl
                      / (CAST(st.sum_dl AS DOUBLE)
                         / CAST(st.n_docs AS DOUBLE))))
                  * 10000.0 + 0.5) AS BIGINT) AS ci
              FROM tf JOIN dfw USING (w) JOIN dl USING (doc_id)
              CROSS JOIN st),
            sc AS (
              SELECT query_id, doc_id, CAST(sum(ci) AS BIGINT) AS score_m
              FROM contrib GROUP BY 1, 2),
            ranked AS (
              SELECT query_id, doc_id, score_m,
                row_number() OVER (PARTITION BY query_id
                  ORDER BY score_m DESC, doc_id) AS rank
              FROM sc)
            SELECT query_id, rank, doc_id, score_m
            FROM ranked WHERE rank <= 5
            ORDER BY query_id, rank"""))

  /** The words(w, cnt) unit table for t31: SentencePiece-style
    * cross-word units — adjacent clean-word bigrams joined with '_'
    * (the printable stand-in for the '▁' boundary marker), adjacency
    * taken on RAW token positions so both engines pair exactly the
    * same neighbors. The synthetic corpus has a ~31-word vocabulary
    * (unigram BPE exhausts at ~107 merges), while real tokenizers
    * learn thousands of merges — cross-boundary units restore that
    * scale honestly: ~857 distinct units, ≥856 merges available. */
  private val bpeBigramCte =
    """wpos AS MATERIALIZED (
      |  SELECT doc_id, j, lower(ws[j]) AS w
      |  FROM (SELECT doc_id, string_split(text, ' ') AS ws
      |        FROM documents) t,
      |       unnest(range(1, len(ws) + 1)) AS u(j)
      |  WHERE regexp_matches(lower(ws[j]), '^[a-z]+$')
      |    AND len(ws[j]) >= 2),
      |words AS MATERIALIZED (
      |  SELECT a.w || '_' || b.w AS w, count(*) AS cnt
      |  FROM wpos a JOIN wpos b
      |    ON a.doc_id = b.doc_id AND b.j = a.j + 1
      |  GROUP BY 1)""".stripMargin

  private val t31Prefix = 12

  /** X305 t31: BPE AT A REAL MERGE COUNT — the production trainer.
    * t28's driver loop is the cross-engine replay device (2 Spark jobs
    * per merge ≈ 0.32 s/merge — right for proving 10 merges, wrong for
    * the 32k a real tokenizer needs). This row runs the two-phase plan
    * every real BPE trainer uses: ONE distributed pass builds the
    * unit-frequency table (the only corpus touch; vocabulary-sized
    * shuffle), then [[graft.ops.BpeTrainer]] trains up to 1000 merges
    * task-locally over the collected table (~857 rows — bounded driver
    * state, documented) with incremental pair-count updates — measured
    * 810 merges (pair exhaustion) in 24 ms, ~0.03 ms/merge vs the
    * driver loop's ~320 ms/merge: a ~10,000× rounds-per-merge win
    * (BpeTrainerSpec pins the timing; SURVEY §8 the table). Training units are SentencePiece-style
    * cross-word bigrams (see [[bpeBigramCte]]) because real merge
    * counts need real symbol diversity. The row loud-fails below 500
    * merges, and hashes the first 12 learned merges against the same
    * DuckDB CTE replay chain that proves t28 — the fast trainer and
    * the from-scratch replay provably compute the same function on the
    * shared prefix (BpeTrainerSpec extends the agreement to all 1000
    * vs a naive recount trainer). */
  private val t31 = Q(
    "t31_bpe_train_full",
    (s, dir) => {
      import s.implicits._
      val toks = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("j0", "w0")))
        .select(col("doc_id"), (col("j0") + 1).as("j"),
          lower(col("w0")).as("w"))
        .filter(col("w").rlike("^[a-z]+$") && length(col("w")) >= 2)
      val wnd = Window.partitionBy("doc_id").orderBy("j")
      val units = toks
        .withColumn("nj", lead("j", 1).over(wnd))
        .withColumn("nw", lead("w", 1).over(wnd))
        .filter(col("nj") === col("j") + 1)
        .select(concat(col("w"), lit("_"), col("nw")).as("u"))
        .groupBy("u").agg(count(lit(1)).as("cnt"))
        .as[(String, Long)].collect().sortBy(_._1)
      val (merges, _) = graft.ops.BpeTrainer.train(units.toIndexedSeq, 1000)
      require(merges.length >= 500,
        s"BPE exhausted at ${merges.length} merges — unit table too small")
      merges.take(t31Prefix).map(m => (m.iter, m.l, m.r, m.n))
        .toDF("iter", "l_sym", "r_sym", "n").orderBy("iter")
    },
    Some(bpeChainCtes(bpeBigramCte, t31Prefix) + s"""
         |SELECT * FROM (
         |${(1 to t31Prefix).map(i =>
             s"  SELECT $i AS iter, l AS l_sym, r AS r_sym, n FROM p$i")
             .mkString(" UNION ALL\n")}
         |) ORDER BY iter""".stripMargin))

  /** One EM-iteration block of the t32 oracle: candidate lattice edges
    * precomputed OUTSIDE the recursion (hash-joinable on (word, pos) —
    * joining vocab inside the recursive term was measured minutes, this
    * shape 4 s), full path enumeration left-to-right (score multiplies
    * in the same association as the trainer's Viterbi), winner per word
    * by the (score desc, pieces asc, boundary-mask asc) total order,
    * then the M-step recount. MATERIALIZED throughout — each m{i} is
    * referenced by the next iteration AND the trace, and re-evaluating
    * it would nest the whole recursion exponentially.
    */
  private def t32IterBlock(i: Int, prevVocab: String, prevTotal: String,
      wordsName: String = "words") =
    s"""cand$i AS MATERIALIZED (
       |  SELECT w.w AS cw, CAST(ts.s - 1 AS BIGINT) AS cpos,
       |         CAST(tl.l AS BIGINT) AS cl, v.piece AS cpiece,
       |         (CASE WHEN v.c = 0 THEN CAST(1e-20 AS DOUBLE)
       |          ELSE CAST(v.c AS DOUBLE) / CAST(t.total AS DOUBLE) END) AS cp
       |  FROM $wordsName w, range(1, 13) ts(s), range(1, 7) tl(l),
       |       $prevVocab v, $prevTotal t
       |  WHERE ts.s + tl.l <= len(w.w) + 1
       |    AND v.piece = substring(w.w, CAST(ts.s AS INT), CAST(tl.l AS INT))),
       |paths$i AS (
       |  SELECT w.w, w.cnt, CAST(0 AS BIGINT) AS pos,
       |         CAST(1.0 AS DOUBLE) AS score, 0 AS np,
       |         CAST(0 AS BIGINT) AS mask, CAST([] AS VARCHAR[]) AS pieces
       |  FROM $wordsName w
       |  UNION ALL
       |  SELECT p.w, p.cnt, p.pos + c.cl, p.score * c.cp, p.np + 1,
       |         p.mask + (CASE WHEN p.pos + c.cl < len(p.w)
       |                   THEN (CAST(1 AS BIGINT) << CAST(p.pos + c.cl AS INT))
       |                   ELSE 0 END),
       |         list_append(p.pieces, c.cpiece)
       |  FROM paths$i p JOIN cand$i c ON c.cw = p.w AND c.cpos = p.pos),
       |win$i AS MATERIALIZED (
       |  SELECT w, cnt, pieces FROM (
       |    SELECT *, row_number() OVER (PARTITION BY w
       |      ORDER BY score DESC, np, mask) AS rk
       |    FROM paths$i WHERE pos = len(w)) WHERE rk = 1),
       |use$i AS MATERIALIZED (
       |  SELECT unnest(pieces) AS piece, cnt FROM win$i),
       |m$i AS MATERIALIZED (
       |  SELECT v.piece, CAST(coalesce(sum(u.cnt), 0) AS BIGINT) AS c
       |  FROM $prevVocab v LEFT JOIN use$i u ON v.piece = u.piece
       |  GROUP BY 1),
       |t$i AS MATERIALIZED (
       |  SELECT CAST(sum(c) AS BIGINT) AS total FROM m$i),
       |tr$i AS MATERIALIZED (
       |  SELECT $i AS iter, piece, c AS cnt,
       |         CAST(c AS DOUBLE)
       |           / CAST((SELECT total FROM t$i) AS DOUBLE) AS prob
       |  FROM (SELECT *, row_number() OVER (ORDER BY c DESC, piece) AS rk
       |        FROM m$i)
       |  WHERE rk <= 10)""".stripMargin

  private val t32Oracle =
    s"""WITH RECURSIVE
       |wpos AS MATERIALIZED (
       |  SELECT doc_id, j, lower(ws[j]) AS w
       |  FROM (SELECT doc_id, string_split(text, ' ') AS ws
       |        FROM documents) t,
       |       unnest(range(1, len(ws) + 1)) AS u(j)
       |  WHERE regexp_matches(lower(ws[j]), '^[a-z]+$$')
       |    AND len(ws[j]) >= 2),
       |words AS MATERIALIZED (
       |  SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM (
       |    SELECT a.w || '_' || b.w AS w
       |    FROM wpos a JOIN wpos b
       |      ON a.doc_id = b.doc_id AND b.j = a.j + 1)
       |  WHERE len(w) <= 12 GROUP BY 1),
       |subs AS MATERIALIZED (
       |  SELECT substring(w.w, CAST(ts.s AS INT), CAST(tl.l AS INT)) AS piece,
       |         CAST(sum(w.cnt) AS BIGINT) AS c
       |  FROM words w, range(1, 13) ts(s), range(1, 7) tl(l)
       |  WHERE ts.s + tl.l <= len(w.w) + 1
       |  GROUP BY 1),
       |vocab0 AS MATERIALIZED (
       |  SELECT piece, c FROM (
       |    SELECT piece, c, row_number() OVER (ORDER BY c DESC, piece) AS rk
       |    FROM subs WHERE len(piece) >= 2) WHERE rk <= 500
       |  UNION ALL
       |  SELECT piece, c FROM subs WHERE len(piece) = 1),
       |t0 AS MATERIALIZED (SELECT CAST(sum(c) AS BIGINT) AS total FROM vocab0),
       |${t32IterBlock(1, "vocab0", "t0")},
       |${t32IterBlock(2, "m1", "t1")},
       |${t32IterBlock(3, "m2", "t2")}
       |SELECT * FROM (SELECT * FROM tr1 UNION ALL SELECT * FROM tr2
       |               UNION ALL SELECT * FROM tr3)
       |ORDER BY iter, cnt DESC, piece""".stripMargin

  /** X312 t32: UNIGRAM-LM (SentencePiece-EM) TOKENIZER TRAINING — the
    * other tokenizer family real pipelines train (Kudo 2018), as BPE's
    * sibling: seed substring vocabulary (top-500 multi-char pieces by
    * weighted occurrence + all single chars), then 3 EM rounds — E-step
    * Viterbi segmentation over the vocab lattice, M-step probability
    * re-estimation, unused pieces decaying to a floor (soft prune) —
    * over t31's SentencePiece-style cross-word unit table, length-capped
    * at 12 chars so the oracle's lattice REPLAY (full segmentation
    * enumeration per word, ≤ 2^11 paths) stays tractable; the trainer
    * itself has no such limit ([[graft.ops.UnigramLm]], spec-covered on
    * longer words). Emits each round's top-10 (count desc, piece asc)
    * rows with EXACT integer usage counts and bit-identical probability
    * doubles (products/divisions only — no transcendentals; the E-step
    * argmax is a total order both engines compute identically, see the
    * UnigramLm scaladoc). Two-phase scale posture like t31: one
    * distributed pass builds the unit table (the only corpus touch),
    * EM runs task-local over the collected ~800-row table (bounded
    * driver state).
    */
  /** The t32 unit-frequency table: ONE distributed corpus pass building
    * the SentencePiece-style cross-word bigram units (≤ 12 chars so the
    * oracle lattice replay stays ≤ 2¹¹ paths/unit), collected
    * KB-sized and sorted for deterministic trainer input. Shared by
    * the trainer row (t32) and the encoder row (t33).
    */
  private def unigramUnits(s: org.apache.spark.sql.SparkSession,
      dir: String): IndexedSeq[(String, Long)] = {
    import s.implicits._
    val toks = Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("j0", "w0")))
      .select(col("doc_id"), (col("j0") + 1).as("j"),
        lower(col("w0")).as("w"))
      .filter(col("w").rlike("^[a-z]+$") && length(col("w")) >= 2)
    val wnd = Window.partitionBy("doc_id").orderBy("j")
    toks
      .withColumn("nj", lead("j", 1).over(wnd))
      .withColumn("nw", lead("w", 1).over(wnd))
      .filter(col("nj") === col("j") + 1)
      .select(concat(col("w"), lit("_"), col("nw")).as("u"))
      .filter(length(col("u")) <= 12)
      .groupBy("u").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)].collect().sortBy(_._1).toIndexedSeq
  }

  private val t32 = Q(
    "t32_unigram_lm_train",
    (s, dir) => {
      import s.implicits._
      val trace = graft.ops.UnigramLm.train(unigramUnits(s, dir),
        maxPieceLen = 6, seedTopK = 500, iters = 3, top = 10)
      trace.map(r => (r.iter, r.piece, r.cnt, r.prob))
        .toDF("iter", "piece", "cnt", "prob")
        .orderBy(col("iter"), col("cnt").desc, col("piece"))
    },
    Some(t32Oracle))

  /** The t33 oracle: the full t32 3-round EM replay (over `units`, the
    * renamed cross-word table so it can coexist with the BPE chain's
    * plain-word `words` CTE), the BPE merge chain (bseg), then ONE more
    * lattice sweep — this time over the corpus's distinct clean WORDS,
    * scored with the TRAINED table m3/t3 — and the per-source encode
    * join both segmentations feed.
    */
  private val t33Oracle =
    s"""WITH RECURSIVE
       |${bpeDuckCtes.stripPrefix("WITH ")},
       |bseg AS MATERIALIZED (
       |  SELECT w, CAST(len(string_split(s, ' ')) AS BIGINT) AS bpe_tokens
       |  FROM w$bpeMerges),
       |wpos AS MATERIALIZED (
       |  SELECT doc_id, j, lower(ws[j]) AS w
       |  FROM (SELECT doc_id, string_split(text, ' ') AS ws
       |        FROM documents) t,
       |       unnest(range(1, len(ws) + 1)) AS u(j)
       |  WHERE regexp_matches(lower(ws[j]), '^[a-z]+$$')
       |    AND len(ws[j]) >= 2),
       |units AS MATERIALIZED (
       |  SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM (
       |    SELECT a.w || '_' || b.w AS w
       |    FROM wpos a JOIN wpos b
       |      ON a.doc_id = b.doc_id AND b.j = a.j + 1)
       |  WHERE len(w) <= 12 GROUP BY 1),
       |subs AS MATERIALIZED (
       |  SELECT substring(w.w, CAST(ts.s AS INT), CAST(tl.l AS INT)) AS piece,
       |         CAST(sum(w.cnt) AS BIGINT) AS c
       |  FROM units w, range(1, 13) ts(s), range(1, 7) tl(l)
       |  WHERE ts.s + tl.l <= len(w.w) + 1
       |  GROUP BY 1),
       |vocab0 AS MATERIALIZED (
       |  SELECT piece, c FROM (
       |    SELECT piece, c, row_number() OVER (ORDER BY c DESC, piece) AS rk
       |    FROM subs WHERE len(piece) >= 2) WHERE rk <= 500
       |  UNION ALL
       |  SELECT piece, c FROM subs WHERE len(piece) = 1),
       |t0 AS MATERIALIZED (SELECT CAST(sum(c) AS BIGINT) AS total FROM vocab0),
       |${t32IterBlock(1, "vocab0", "t0", "units")},
       |${t32IterBlock(2, "m1", "t1", "units")},
       |${t32IterBlock(3, "m2", "t2", "units")},
       |candw AS MATERIALIZED (
       |  SELECT w.w AS cw, CAST(ts.s - 1 AS BIGINT) AS cpos,
       |         CAST(tl.l AS BIGINT) AS cl,
       |         (CASE WHEN v.c = 0 THEN CAST(1e-20 AS DOUBLE)
       |          ELSE CAST(v.c AS DOUBLE) / CAST(t.total AS DOUBLE) END) AS cp
       |  FROM words w, range(1, 13) ts(s), range(1, 7) tl(l), m3 v, t3 t
       |  WHERE ts.s + tl.l <= len(w.w) + 1
       |    AND v.piece = substring(w.w, CAST(ts.s AS INT), CAST(tl.l AS INT))),
       |pathsw AS (
       |  SELECT w.w, CAST(0 AS BIGINT) AS pos, CAST(1.0 AS DOUBLE) AS score,
       |         0 AS np, CAST(0 AS BIGINT) AS mask
       |  FROM words w
       |  UNION ALL
       |  SELECT p.w, p.pos + c.cl, p.score * c.cp, p.np + 1,
       |         p.mask + (CASE WHEN p.pos + c.cl < len(p.w)
       |                   THEN (CAST(1 AS BIGINT) << CAST(p.pos + c.cl AS INT))
       |                   ELSE 0 END)
       |  FROM pathsw p JOIN candw c ON c.cw = p.w AND c.cpos = p.pos),
       |useg AS MATERIALIZED (
       |  SELECT w, CAST(np AS BIGINT) AS uni_tokens FROM (
       |    SELECT *, row_number() OVER (PARTITION BY w
       |      ORDER BY score DESC, np, mask) AS rk
       |    FROM pathsw WHERE pos = len(w)) WHERE rk = 1),
       |docw AS (
       |  SELECT source, lower(w0) AS w FROM (
       |    SELECT source, unnest(string_split(text, ' ')) AS w0
       |    FROM documents) t
       |  WHERE regexp_matches(lower(w0), '^[a-z]+$$')
       |    AND len(w0) BETWEEN 2 AND 12)
       |SELECT source,
       |       CAST(count(*) AS BIGINT) AS n_words,
       |       CAST(sum(len(d.w)) AS BIGINT) AS sum_chars,
       |       CAST(sum(u.uni_tokens) AS BIGINT) AS sum_uni_tokens,
       |       CAST(sum(b.bpe_tokens) AS BIGINT) AS sum_bpe_tokens,
       |       round(CAST(sum(len(d.w)) AS DOUBLE)
       |         / CAST(sum(u.uni_tokens) AS DOUBLE), 4)
       |         AS uni_chars_per_token,
       |       round(CAST(sum(len(d.w)) AS DOUBLE)
       |         / CAST(sum(b.bpe_tokens) AS DOUBLE), 4)
       |         AS bpe_chars_per_token
       |FROM docw d JOIN useg u USING (w) JOIN bseg b USING (w)
       |GROUP BY source ORDER BY source""".stripMargin

  /** X315 t33: UNIGRAM-LM ENCODE — the apply half of t32 (and the
    * direct tokenizer-choice measurement a data lead wants next to
    * t29's BPE encode): broadcast the TRAINED piece table (t32's final
    * EM counts → probabilities, floor for soft-pruned pieces), Viterbi-
    * segment the corpus's distinct clean words DISTRIBUTED (each task
    * holds only the KB-sized table; the corpus itself never carries
    * segmentation state), then one vocabulary-keyed broadcast join back
    * to the word occurrences — the t29 shape — reporting per-source
    * token counts and chars-per-token compression for BOTH tokenizer
    * families side by side. At 100 TB: the piece table is KB-sized
    * (broadcast), distinct-word segmentation is embarrassingly parallel
    * over a vocabulary-sized frame, and the corpus is touched by
    * exactly two scans (unit table + encode) with no corpus-sized
    * shuffle — per-source totals are one partial-aggregated groupBy.
    * Word length capped at 12 (= the unit cap) so the oracle's lattice
    * sweep over distinct words stays ≤ 2¹¹ paths/word; unsegmentable
    * words (char never seen in any unit) fail LOUDLY in viterbi rather
    * than skewing counts silently.
    */
  private val t33 = Q(
    "t33_unigram_encode",
    (s, dir) => {
      import s.implicits._
      val pm = graft.ops.UnigramLm.probs(graft.ops.UnigramLm.trainFinal(
        unigramUnits(s, dir), maxPieceLen = 6, seedTopK = 500, iters = 3))
      val pmB = s.sparkContext.broadcast(pm)
      val (_, fin, base) = bpeTrain(s, dir)
      val bseg = fin.select(col("w"),
        size(split(col("s"), " ")).cast("long").as("bpe_tokens"))
      val docw = Tables.load(s, dir, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("w0"))
        .select(col("source"), lower(col("w0")).as("w"))
        .filter(col("w").rlike("^[a-z]+$") &&
          length(col("w")).between(2, 12))
      val useg = docw.select("w").distinct().as[String]
        .mapPartitions { it =>
          it.map(w => (w,
            graft.ops.UnigramLm.viterbi(w, pmB.value, 6).length.toLong))
        }.toDF("w", "uni_tokens")
      val out = docw
        .join(broadcast(useg), Seq("w"))
        .join(broadcast(bseg), Seq("w"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_words"),
          sum(length(col("w"))).as("sum_chars"),
          sum("uni_tokens").as("sum_uni_tokens"),
          sum("bpe_tokens").as("sum_bpe_tokens"))
        .select(col("source"), col("n_words"), col("sum_chars"),
          col("sum_uni_tokens"), col("sum_bpe_tokens"),
          round(col("sum_chars").cast("double")
            / col("sum_uni_tokens").cast("double"), 4)
            .as("uni_chars_per_token"),
          round(col("sum_chars").cast("double")
            / col("sum_bpe_tokens").cast("double"), 4)
            .as("bpe_chars_per_token"))
        .orderBy("source")
      base.unpersist() // lineage recomputes if the action lands later (t29)
      out
    },
    Some(t33Oracle))

  /** X321 t34: SEQUENCE PACKING — the step between a cleaned corpus
    * and an LLM training run: pack documents into fixed-capacity
    * training sequences (C = 512 whitespace tokens, the T5/GPT
    * "concatenate docs in corpus order, cut a new sequence when the
    * budget would overflow" discipline), whole docs only (no
    * mid-document splits; docs longer than C get a bin of their own
    * and are counted as oversize). Packing is inherently SEQUENTIAL
    * per stream (each doc's bin depends on everything before it), so
    * the plan is the W5–W7 fold shape: token counts computed in the
    * codegen'd scan pass (t1's regexp spelling — only (source,
    * doc_id, ntok) ever shuffles, never text), ONE shuffle on source,
    * then a task-local O(group) fold per source emitting the packing
    * summary: bins used, fill rate vs the C·bins budget, oversize
    * count, and an assignment CHECKSUM (Σ doc_id·(bin+1)) that pins
    * every doc's bin against the oracle without emitting per-doc
    * rows. 100 TB posture: parallelism = stream (source) count by
    * definition; an industrial packer shards each stream into bounded
    * chunks at pre-agreed doc-id cuts (each chunk packs
    * independently, chunk boundary = sequence boundary) — the fold
    * here is that per-chunk kernel. The checksum is Σ (doc_id mod P)·
    * ((bin+1) mod P) mod P with P = 2⁶¹−1 (round 16, closing the
    * round-15 overflow advice): exact and engine-identical at ANY
    * doc_id × bins product — Spark folds `ExactNum.mulmodP/addmodP`
    * (128-bit limb arithmetic, no BigInt in the loop), the oracle
    * sums the same per-row residues in HUGEINT and mods once.
    * ORACLE SCALE NOTE (round-15 advice, documented trade): the
    * recursive CTE advances one doc per source per iteration and
    * re-joins toks each step — O(max docs-per-source) iterations, so
    * the DuckDB replay is PROOF-SCALE-ONLY (sf0.01 ≈ seconds; sf1+
    * impractical). The O(n) alternative (DuckDB list_reduce over a
    * struct accumulator) was probed and REJECTED: DuckDB 1.0's
    * list_reduce returns inconsistent cross-field accumulator state
    * (later-step field values leak into earlier steps' reads), so the
    * fold miscomputes dependent fields. At sf1+ the Spark side is
    * instead pinned by SequencePackingSpec's independent per-doc
    * replay, which is scale-free.
    */
  private val t34 = Q(
    "t34_sequence_packing",
    (s, dir) => {
      import s.implicits._
      val C = 512L
      Tables.load(s, dir, "documents")
        .select(col("source"), col("doc_id"),
          size(regexp_extract_all(col("text"), lit("\\S+"), lit(0)))
            .cast("long").as("ntok"))
        .as[(String, Long, Long)]
        .groupByKey(_._1)
        .flatMapGroups { (src, it) =>
          val docs = it.map { case (_, id, nt) => (id, nt) }
            .toIndexedSeq.sortBy(_._1)
          var bin = 0L; var fill = 0L; var first = true
          var nDocs = 0L; var sumTok = 0L; var nOver = 0L; var ck = 0L
          docs.foreach { case (id, nt) =>
            if (first) { fill = nt; first = false }
            else if (fill + nt > C) { bin += 1; fill = nt }
            else fill += nt
            nDocs += 1; sumTok += nt
            if (nt > C) nOver += 1
            ck = graft.ops.ExactNum.addmodP(ck,
              graft.ops.ExactNum.mulmodP(
                java.lang.Math.floorMod(id, graft.ops.ExactNum.MersenneP),
                (bin + 1) % graft.ops.ExactNum.MersenneP))
          }
          if (nDocs == 0) Iterator.empty
          else Iterator((src, nDocs, bin + 1, sumTok, nOver,
            sumTok.toDouble / ((bin + 1).toDouble * C), ck))
        }
        .toDF("source", "n_docs", "n_bins", "sum_tokens", "n_oversize",
          "fill_rate", "assign_checksum")
        .orderBy("source")
    },
    Some("""WITH RECURSIVE toks AS (
              SELECT source, doc_id,
                CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)
                  AS ntok,
                row_number() OVER (PARTITION BY source ORDER BY doc_id)
                  AS rn,
                count(*) OVER (PARTITION BY source) AS cnt
              FROM documents),
            pack AS (
              SELECT source, doc_id, ntok, rn,
                     CAST(0 AS BIGINT) AS bin, ntok AS fill
              FROM toks WHERE rn = 1
              UNION ALL
              SELECT t.source, t.doc_id, t.ntok, t.rn,
                CASE WHEN p.fill + t.ntok > 512
                     THEN p.bin + 1 ELSE p.bin END,
                CASE WHEN p.fill + t.ntok > 512
                     THEN t.ntok ELSE p.fill + t.ntok END
              FROM pack p JOIN toks t
                ON t.source = p.source AND t.rn = p.rn + 1)
            SELECT source,
              CAST(count(*) AS BIGINT) AS n_docs,
              CAST(max(bin) + 1 AS BIGINT) AS n_bins,
              CAST(sum(ntok) AS BIGINT) AS sum_tokens,
              CAST(sum(CASE WHEN ntok > 512 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_oversize,
              CAST(sum(ntok) AS DOUBLE)
                / (CAST(max(bin) + 1 AS DOUBLE) * 512) AS fill_rate,
              CAST(sum(""" +
      graft.ops.ExactNum.mulmodPSql("doc_id", "bin + 1") + """)
                % """ + graft.ops.ExactNum.MersenneP + """ AS BIGINT)
                AS assign_checksum
            FROM pack GROUP BY source ORDER BY source"""))

  def all: Seq[Q] =
    Seq(t1, t2, t3, t4, t5, t6, t7, t8, t9, t10, t11, t12, t13, t14, t15,
      t16, t17, t18, t19, t20, t21, t22, t23, t24, t25, t26, t27, t28,
      t29, t30, t31, t32, t33, t34)
}
