package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines.
  * Everything here is built from codegen'd `org.apache.spark.sql.functions`
  * (no UDFs): at 100 TB these run inside whole-stage codegen directly over
  * the parquet scan, with no serialization boundary.
  */
object Text {

  /** Normalized form used for fingerprinting/dedup: lowercase, whitespace
    * collapsed, trimmed.
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Whitespace tokens of the normalized text. */
  def tokens(text: Column): Column = split(normalize(text), " ")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword token count: alphabetic runs, digit runs, and single
    * punctuation marks each count as one token — the cheap deterministic
    * stand-in for a real BPE vocab (same regex is expressible in DuckDB for
    * the oracle).
    */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Exact-dedup document fingerprint: md5 of the normalized text. */
  def fingerprint(text: Column): Column = md5(normalize(text))

  /** 64-bit rolling (polynomial) hash of the normalized text — the
    * streaming-friendly fingerprint variant (base-31 Horner, wrapping in
    * Long). Native single-pass expression; the HOF form
    * (`aggregate(transform(split(...)))`) ran an interpreted lambda per
    * character — see [[graft.functions.expressions.RollingHash64]].
    */
  def rollingHash(text: Column): Column =
    graft.functions.expressions.TextExpressions.rolling_hash64(normalize(text))

  /** Word k-shingles (n-grams of tokens joined by space) of the normalized
    * text — the unit set for Jaccard/MinHash dedup. Returns a SORTED,
    * deduplicated array (native expression; see WordShingles for why the
    * HOF form was replaced).
    */
  def shingles(text: Column, k: Int): Column =
    graft.functions.expressions.HashExpressions.word_shingles(tokens(text), k)

  private val stopwordList = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "for", "on",
    "with", "as", "at", "by", "from", "that", "this")

  def stopwords: Seq[String] = stopwordList

  /** Single-pass struct of (n_chars, punct_ratio, stopword_ratio, quality) —
    * the form to use when selecting more than one of these stats: the
    * composed columns below each re-derive the token array per use site
    * (CollapseProject), which cost 6x recompute at bench. See
    * [[graft.functions.expressions.TextStats]].
    */
  def stats(text: Column): Column =
    graft.functions.expressions.TextExpressions.text_stats(text)

  /** Stopword ratio over whitespace tokens (0 when no tokens). */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, lit(0.0)).otherwise(
      size(filter(toks, t => t.isin(stopwordList.map(lit): _*)))
        .cast("double") / size(toks))
  }

  /** Punctuation-to-character ratio (period/comma/bang/question/semi/colon). */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      (length(text) - length(regexp_replace(text, "[.,!?;:]", "")))
        .cast("double") / length(text))

  /** Composite quality score in [0,1]: rewards mid-length documents with a
    * healthy stopword share and low punctuation noise — the usual cheap
    * pre-filter before expensive model-based quality scoring.
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 500.0, lit(1.0))
    val stopScore = least(stopwordRatio(text) * 4.0, lit(1.0))
    val punctPenalty = greatest(lit(1.0) - punctRatio(text) * 5.0, lit(0.0))
    round((lenScore + stopScore + punctPenalty) / 3.0, 6)
  }

  /** Language-ID by marker-stopword scoring: counts hits from a per-language
    * marker set over the token array and picks the best score (ties resolve
    * by fixed language order). N-gram-heuristic class, deterministic, no UDF.
    */
  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "to"),
    "es" -> Seq("el", "la", "de", "y", "que"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "zh" -> Seq.empty) // zh detected by CJK characters, not tokens

  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scores = langMarkers.collect { case (lang, ms) if ms.nonEmpty =>
      lang -> size(filter(toks, t => t.isin(ms.map(lit): _*)))
    }
    val hasCjk = text.rlike("[\\u4e00-\\u9fff]")
    // argmax with deterministic priority = langMarkers order
    val maxScore = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val pick = scores.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s === maxScore && maxScore > 0, lit(lang)).otherwise(acc)
    }
    when(hasCjk, lit("zh")).otherwise(pick)
  }
}
