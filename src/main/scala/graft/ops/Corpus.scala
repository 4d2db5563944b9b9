package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared corpus-prep building blocks — single source of truth for the
  * PII regexes (t9), the stratified sampling thresholds (p11), and the
  * chunk geometry (t8), so the composed pl4 pipeline provably applies
  * the same operators it claims to compose.
  */
object Corpus {

  /** Exact-dedup content fingerprint: md5 over whitespace-normalized
    * lowercased text (t4 / d2 / pl3 / pl4 — one spelling, one key).
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Marker-word sets of the heuristic language ID (t3 / pl3), in the
    * fixed en/es/fr tie order.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of"),
    "es" -> Seq("el", "la", "de", "que"),
    "fr" -> Seq("le", "les", "et", "de"))

  /** Email-shaped spans (t9 / pl4 redaction). */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Long digit runs — phone/id-shaped spans. */
  val digitRe = "[0-9]{7,}"

  /** Redact both PII span classes. */
  def redact(text: Column): Column =
    regexp_replace(regexp_replace(text, emailRe, "<EMAIL>"),
      digitRe, "<NUM>")

  /** Per-source keep-threshold (2-hex-digit md5 prefix compares
    * lexicographically in numeric order): sources 0-4 keep all, 5-9
    * one half, 10-14 one quarter, 15+ one eighth.
    */
  def sourceThreshold(source: Column): Column = {
    // Loud-fail on a source with no numeric stratum: Spark's
    // regexp_extract yields '' (→ NULL int) where DuckDB's
    // CAST('' AS INT) raises — align on the DuckDB behavior (error)
    // instead of silently routing unknown sources to the 1/8 bucket.
    val parsed = regexp_extract(source, "(\\d+)", 1)
    val srcNum = when(parsed === "",
      raise_error(concat(
        lit("sourceThreshold: source without numeric stratum: "), source)))
      .otherwise(parsed.cast("int"))
    when(srcNum < 5, lit("zz"))
      .when(srcNum < 10, lit("80"))
      .when(srcNum < 15, lit("40"))
      .otherwise(lit("20"))
  }

  /** True when `source` carries no numeric stratum — the rows
    * [[sourceThreshold]] refuses. Exposed so lenient-mode callers can
    * count or quarantine them (e.g. `df.observe("quarantine",
    * sum(Corpus.stratumUnparseable(col("source")).cast("long")))`).
    */
  def stratumUnparseable(source: Column): Column =
    regexp_extract(source, "(\\d+)", 1) === ""

  /** Opt-in LENIENT stratum threshold for production ingest: malformed
    * sources route to the most-conservative 1/8 keep-bucket instead of
    * aborting the whole corpus pass, and callers count/quarantine them
    * via [[stratumUnparseable]]. Verification runs keep the strict
    * [[sourceThreshold]] (raise_error) so the oracle comparison can
    * never silently diverge on poison rows — that strictness is
    * deliberate, not an oversight, and this is its documented escape
    * hatch at scale.
    */
  def sourceThresholdLenient(source: Column): Column = {
    val parsed = regexp_extract(source, "(\\d+)", 1)
    // guard BEFORE the cast: under ANSI mode (Spark 4 default) casting
    // the '' of a non-match throws — exactly the abort this mode avoids
    val srcNum = when(parsed === "", lit(null)).otherwise(parsed)
      .cast("int")
    when(srcNum.isNull, lit("20"))
      .when(srcNum < 5, lit("zz"))
      .when(srcNum < 10, lit("80"))
      .when(srcNum < 15, lit("40"))
      .otherwise(lit("20"))
  }

  /** Keep-predicate of the stratified sample. */
  def sampleKeep(text: Column, source: Column): Column =
    substring(md5(text), 1, 2) < sourceThreshold(source)

  /** Token-window chunk geometry (t8 / pl4). */
  val chunkSize = 40
  val chunkStride = 30

  /** Chunk start offsets for a document of `nToks` tokens (empty docs
    * still emit one empty chunk). */
  def chunkStarts(nToks: Int): Range =
    0 until math.max(nToks, 1) by chunkStride
}
