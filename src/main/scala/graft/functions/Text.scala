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
    * collapsed, trimmed. One native pass
    * ([[graft.functions.expressions.NormalizeWs]]) — bit-identical to
    * `trim(regexp_replace(lower(text), "\\s+", " "))` (the form the
    * DuckDB oracles replay) without running a regex engine over every
    * document; this is the prefix of nearly every text operator's hot
    * path.
    */
  def normalize(text: Column): Column =
    graft.functions.expressions.TextExpressions.normalize_ws(text)

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

  /** Marker keywords for [[codeScore]] — a fixed cross-language set
    * (Python/JS/Java/C-family), matched against normalized tokens.
    */
  private val codeKeywordList = Seq(
    "def", "return", "if", "else", "for", "while", "import", "class",
    "function", "var", "let", "const", "int", "void", "public", "static",
    "new", "null", "true", "false")

  def codeKeywords: Seq[String] = codeKeywordList

  /** Ratio of code-structural symbols (braces/brackets/parens/semicolons/
    * operators) to characters — prose sits near 0, source code well above.
    */
  def symbolRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      (length(text) - length(regexp_replace(text, "[{}\\[\\]();=<>#_]", "")))
        .cast("double") / length(text))

  /** Fraction of normalized tokens that are cross-language code keywords. */
  def codeKeywordRatio(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, lit(0.0)).otherwise(
      size(filter(toks, t => t.isin(codeKeywordList.map(lit): _*)))
        .cast("double") / size(toks))
  }

  /** Fraction of raw (case-preserving) whitespace tokens containing a
    * lower→upper camelCase transition, over the normalized token count —
    * identifier-shaped tokens are a code signal prose lacks.
    */
  def camelRatio(text: Column): Column = {
    val n = size(tokens(text))
    when(n === 0, lit(0.0)).otherwise(
      size(filter(split(text, "\\s+"), t => t.rlike("[a-z][A-Z]")))
        .cast("double") / n)
  }

  /** Fraction of non-empty lines that LOOK like statements: ending in
    * `;`/`{`/`}`/`:` (modulo trailing spaces) or starting with an indent
    * (4 spaces or a tab). Single-line text degenerates gracefully (one
    * line, scored by its ending alone).
    */
  def structuredLineRatio(text: Column): Column = {
    val lines = filter(split(text, "\n"), l => length(trim(l)) > 0)
    when(size(lines) === 0, lit(0.0)).otherwise(
      size(filter(lines, l =>
        l.rlike("[;{}:] *$") || l.rlike("^(    |\t)")))
        .cast("double") / size(lines))
  }

  /** Code-vs-prose score in [0,1] — the routing signal a pretraining
    * pipeline uses to send documents to a code-specific cleaning path
    * (or to weight the code share of a training mix) before any
    * model-based classifier runs. Four independent cheap signals, each
    * saturated then averaged, so no single feature can dominate:
    * symbols, keywords, camelCase identifiers, statement-shaped lines.
    * Built from codegen'd functions only (the [[qualityScore]]
    * discipline) and exactly replayable in SQL: every feature is a
    * character/token count both engines derive identically, and the
    * composite keeps one fixed parenthesization.
    */
  def codeScore(text: Column): Column =
    round((least(symbolRatio(text) * 8.0, lit(1.0)) +
      least(codeKeywordRatio(text) * 10.0, lit(1.0)) +
      least(camelRatio(text) * 5.0, lit(1.0)) +
      least(structuredLineRatio(text) * 2.0, lit(1.0))) / 4.0, 6)

  /** Append the four code-routing features (6dp) AND `code_score` with
    * SINGLE evaluation of every regex/token scan. Emitting
    * [[codeScore]] next to its component features in one projection
    * evaluates each feature expression twice per row: the shared
    * subtrees sit inside CASE branches (the empty-input guards), and
    * Spark's subexpression elimination — codegen and interpreted alike
    * — only extracts ALWAYS-evaluated subtrees, so conditional
    * positions never collapse (verified against
    * `EquivalentExpressions.getCommonSubexpressions` on the fused
    * plan: only the guard predicates dedup, not the scans). This
    * builder instead layers the projection — shared scans once (the
    * strip/tokenize/split/line arrays), raw ratios from those, rounded
    * features + composite from the raw ratios — and the layering
    * survives the optimizer because CollapseProject refuses to inline
    * a non-cheap alias referenced more than once. Every value is the
    * SAME IEEE operation sequence as the standalone functions (the
    * scans feed identical subtrees), so results are bit-equal to
    * [[codeScore]]/[[symbolRatio]]/etc. and the text_codeid oracle
    * replays unchanged; PlanShapeSpec pins one scan per regex in the
    * optimized plan.
    */
  def withCodeFeatures(df: org.apache.spark.sql.DataFrame,
      text: Column): org.apache.spark.sql.DataFrame = {
    val scans = df
      .withColumn("__cid_len", length(text))
      .withColumn("__cid_stripped",
        length(regexp_replace(text, "[{}\\[\\]();=<>#_]", "")))
      .withColumn("__cid_toks", tokens(text))
      .withColumn("__cid_camel_hits",
        size(filter(split(text, "\\s+"), t => t.rlike("[a-z][A-Z]"))))
      .withColumn("__cid_lines",
        filter(split(text, "\n"), l => length(trim(l)) > 0))
    val raw = scans
      .withColumn("__cid_sym",
        when(col("__cid_len") === 0, lit(0.0)).otherwise(
          (col("__cid_len") - col("__cid_stripped")).cast("double") /
            col("__cid_len")))
      .withColumn("__cid_kw",
        when(size(col("__cid_toks")) === 0, lit(0.0)).otherwise(
          size(filter(col("__cid_toks"),
              t => t.isin(codeKeywordList.map(lit): _*)))
            .cast("double") / size(col("__cid_toks"))))
      .withColumn("__cid_cam",
        when(size(col("__cid_toks")) === 0, lit(0.0)).otherwise(
          col("__cid_camel_hits").cast("double") / size(col("__cid_toks"))))
      .withColumn("__cid_ln",
        when(size(col("__cid_lines")) === 0, lit(0.0)).otherwise(
          size(filter(col("__cid_lines"),
              l => l.rlike("[;{}:] *$") || l.rlike("^(    |\t)")))
            .cast("double") / size(col("__cid_lines"))))
    raw
      .withColumn("symbol_ratio", round(col("__cid_sym"), 6))
      .withColumn("keyword_ratio", round(col("__cid_kw"), 6))
      .withColumn("camel_ratio", round(col("__cid_cam"), 6))
      .withColumn("line_ratio", round(col("__cid_ln"), 6))
      .withColumn("code_score",
        round((least(col("__cid_sym") * 8.0, lit(1.0)) +
          least(col("__cid_kw") * 10.0, lit(1.0)) +
          least(col("__cid_cam") * 5.0, lit(1.0)) +
          least(col("__cid_ln") * 2.0, lit(1.0))) / 4.0, 6))
      .drop("__cid_len", "__cid_stripped", "__cid_toks", "__cid_camel_hits",
        "__cid_lines", "__cid_sym", "__cid_kw", "__cid_cam", "__cid_ln")
  }

  /** Append encoding-quality signals — the cheap structural filter a
    * pretraining pipeline runs BEFORE language-ID or quality scoring
    * (CCNet/Gopher-style: a crawl shard with broken transcoding reads
    * as fluent tokens but is unrecoverable garbage):
    *   - `n_cp`      — code-point count (NOT UTF-16 units: counted via a
    *                   DOTALL single-char regex, which Java's code-point-
    *                   aware engine and the oracle's RE2 agree on, where
    *                   `length()` diverges above the BMP),
    *   - `repl_ratio`— fraction of U+FFFD replacement characters (the
    *                   tombstone a lossy decode leaves behind),
    *   - `ctrl_ratio`— fraction of C0 control chars (minus \t \n \r) and
    *                   DEL — binary-in-text contamination,
    *   - `enc_score` — `max(0, 1 − (repl + ctrl) · 25)`: 4% garbage
    *                   zeroes the score; clean text scores 1.
    * Ratios 6dp; the composite uses the UNROUNDED ratios in one fixed
    * parenthesization (the codeScore contract). Layered projection =
    * each regex scan once per row ([[withCodeFeatures]]); pure narrow
    * map, no UDF, fully SQL-replayable (text_encoding oracle).
    */
  def withEncodingQuality(df: org.apache.spark.sql.DataFrame,
      text: Column): org.apache.spark.sql.DataFrame = {
    val scans = df
      .withColumn("__enc_ncp", regexp_count(text, lit("(?s).")).cast("long"))
      .withColumn("__enc_repl", regexp_count(text, lit("\uFFFD")).cast("long"))
      .withColumn("__enc_ctrl", regexp_count(text,
        lit("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]")).cast("long"))
    val raw = scans
      .withColumn("__enc_rr",
        when(col("__enc_ncp") === 0, lit(0.0)).otherwise(
          col("__enc_repl").cast("double") / col("__enc_ncp")))
      .withColumn("__enc_cr",
        when(col("__enc_ncp") === 0, lit(0.0)).otherwise(
          col("__enc_ctrl").cast("double") / col("__enc_ncp")))
    raw
      .withColumn("n_cp", col("__enc_ncp"))
      .withColumn("repl_ratio", round(col("__enc_rr"), 6))
      .withColumn("ctrl_ratio", round(col("__enc_cr"), 6))
      .withColumn("enc_score",
        round(greatest(lit(0.0),
          lit(1.0) - (col("__enc_rr") * 25.0 + col("__enc_cr") * 25.0)), 6))
      .drop("__enc_ncp", "__enc_repl", "__enc_ctrl", "__enc_rr", "__enc_cr")
  }

  /** Append a Unicode-script profile — the wrong-script filter a
    * multilingual pipeline applies per language bucket (a "zh" document
    * that is 90% Latin is mislabeled or transliterated; script ratios
    * catch it where stopword language-ID can't). Emits
    * `script_latin/_han/_cyrillic/_arabic` (fraction of ALL code points
    * in that script, 6dp), `script_other` (everything else — spaces,
    * digits, punctuation, unlisted scripts), and `script_pred` (argmax
    * with the fixed tie order latin > han > cyrillic > arabic on
    * integer counts; `und` when no listed script appears). Java's
    * `\p{IsX}` script classes and the oracle's RE2 `\p{X}` agree on the
    * assignments; counts are code points on both engines. Narrow map,
    * layered for single evaluation, fully SQL-replayable (text_script
    * oracle).
    */
  def withScriptProfile(df: org.apache.spark.sql.DataFrame,
      text: Column): org.apache.spark.sql.DataFrame = {
    val scans = df
      .withColumn("__scr_ncp", regexp_count(text, lit("(?s).")).cast("long"))
      .withColumn("__scr_lat", regexp_count(text, lit("\\p{IsLatin}")).cast("long"))
      .withColumn("__scr_han", regexp_count(text, lit("\\p{IsHan}")).cast("long"))
      .withColumn("__scr_cyr", regexp_count(text, lit("\\p{IsCyrillic}")).cast("long"))
      .withColumn("__scr_ara", regexp_count(text, lit("\\p{IsArabic}")).cast("long"))
    def ratio(c: Column): Column =
      when(col("__scr_ncp") === 0, lit(0.0))
        .otherwise(round(c.cast("double") / col("__scr_ncp"), 6))
    scans
      .withColumn("script_latin", ratio(col("__scr_lat")))
      .withColumn("script_han", ratio(col("__scr_han")))
      .withColumn("script_cyrillic", ratio(col("__scr_cyr")))
      .withColumn("script_arabic", ratio(col("__scr_ara")))
      .withColumn("script_other", ratio(col("__scr_ncp") - col("__scr_lat") -
        col("__scr_han") - col("__scr_cyr") - col("__scr_ara")))
      .withColumn("script_pred",
        when(col("__scr_lat") >= col("__scr_han") &&
            col("__scr_lat") >= col("__scr_cyr") &&
            col("__scr_lat") >= col("__scr_ara") &&
            col("__scr_lat") > 0, lit("latin"))
          .when(col("__scr_han") >= col("__scr_cyr") &&
            col("__scr_han") >= col("__scr_ara") &&
            col("__scr_han") > 0, lit("han"))
          .when(col("__scr_cyr") >= col("__scr_ara") &&
            col("__scr_cyr") > 0, lit("cyrillic"))
          .when(col("__scr_ara") > 0, lit("arabic"))
          .otherwise(lit("und")))
      .drop("__scr_ncp", "__scr_lat", "__scr_han", "__scr_cyr", "__scr_ara")
  }

  /** Append C4-INSPIRED line-level cleaning (cf. Raffel et al. 2020's
    * C4 filters; deliberately NOT a verbatim replay — the paper keeps
    * lines of >= 5 words and removes whole PAGES containing `{` or
    * fewer than 3 sentences, where this builder uses a 3-token minimum
    * and applies every rule per LINE so one bad line never discards a
    * good document): a line survives iff it is non-empty, has at
    * least 3 whitespace tokens, ends in terminal punctuation
    * (`.` `!` `?` `"` `”`, modulo trailing spaces), does not mention
    * "javascript" (case-insensitive — the boilerplate "enable
    * JavaScript" banner), and contains no curly brace (leaked
    * code/markup). Emits `clean_text` (surviving lines
    * re-joined with newlines), `n_lines`, `n_kept`, `n_dropped`. All
    * builtin HOFs over per-row line arrays (cost bounded by document
    * length, never corpus size), layered for single evaluation of the
    * split ([[withCodeFeatures]]); stateless narrow map, fully
    * SQL-replayable (pipeline_c4_clean oracle).
    */
  def withC4LineClean(df: org.apache.spark.sql.DataFrame,
      text: Column): org.apache.spark.sql.DataFrame = {
    val scans = df.withColumn("__c4_lines", split(text, "\n"))
    val raw = scans.withColumn("__c4_kept",
      filter(col("__c4_lines"), l =>
        length(trim(l)) > 0 &&
          size(split(trim(l), "\\s+")) >= 3 &&
          l.rlike("[.!?\"”] *$") &&
          !lower(l).contains("javascript") &&
          !l.contains("{") && !l.contains("}")))
    raw
      .withColumn("clean_text", array_join(col("__c4_kept"), "\n"))
      .withColumn("n_lines", size(col("__c4_lines")).cast("long"))
      .withColumn("n_kept", size(col("__c4_kept")).cast("long"))
      .withColumn("n_dropped",
        (size(col("__c4_lines")) - size(col("__c4_kept"))).cast("long"))
      .drop("__c4_lines", "__c4_kept")
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
