package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Intra-document repetition signals — the Gopher-style quality filters
  * (Rae et al. 2021, "Scaling Language Models", §A1.1) a training-data
  * pipeline runs BEFORE cross-document dedup: documents dominated by one
  * repeated word or phrase are low-quality regardless of whether any
  * other document duplicates them. Complements [[Dedup]] (cross-doc) and
  * `Text.qualityScore` (length/punct/stopword heuristics).
  *
  * Per document, over the whitespace-normalized token stream:
  *   - `dup_word_frac`     — fraction of token INSTANCES that are repeats
  *                           of an earlier token: `(n - distinct) / n`;
  *   - `top_word_cov`      — characters covered by the single
  *                           most-covering token (`count * length`, the
  *                           token maximizing that product) over the
  *                           normalized char count;
  *   - `top_bigram_cov`    — same for word 2-grams (gram length includes
  *                           its single joining space — gram chars are
  *                           measured against the same normalized text
  *                           they came from);
  *   - `dup_trigram_frac`  — characters in word 3-grams occurring MORE
  *                           THAN ONCE (`count * length`, summed over
  *                           such grams) over the normalized char count.
  *                           Overlapping occurrences each count — the
  *                           standard published simplification of
  *                           Gopher's overlap-free variant; values can
  *                           exceed 1 for pathologically loopy text,
  *                           which is exactly the signal.
  *
  * Scale shape: ZERO exchanges. Every signal is intra-document, so the
  * gram counting never leaves the row: sort the gram array, turn it
  * into (count, length) runs with higher-order array functions, and
  * fold the runs — a per-row O(L log L) pass instead of shuffling every
  * gram STRING (plus per-gram metadata) through a doc-id exchange and
  * aggregating twice (the explode formulation this replaced benched
  * 10.9 s at sf0.1; the run-length form is pure map work). No corpus-
  * wide state, no skew beyond a single document's own length:
  * embarrassingly parallel in the corpus.
  *
  * Documents with fewer than 3 tokens are dropped (no trigram exists;
  * the signals are meaningless below that).
  */
object Repetition {

  /** Per-document repetition signals: `(docId, n_tokens, dup_word_frac,
    * top_word_cov, top_bigram_cov, dup_trigram_frac)`, ratios 6dp.
    */
  def signals(
      docs: DataFrame,
      docIdCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val norm = trim(regexp_replace(lower(col(textCol)), "\\s+", " "))
    val base = docs
      .select(col(docIdCol), norm.as("__norm"))
      .withColumn("__toks",
        filter(split(col("__norm"), " "), t => length(t) > lit(0)))
      .withColumn("__nchars", length(col("__norm")))
      .withColumn("__ntok", size(col("__toks")))
      .filter(col("__ntok") >= 3)
      .withColumn("__ndistinct", size(array_distinct(col("__toks"))))
    val g2 = zip_with(
      slice(col("__toks"), lit(1), col("__ntok") - lit(1)),
      slice(col("__toks"), lit(2), col("__ntok") - lit(1)),
      (a, b) => concat(a, lit(" "), b))
    val g3 = zip_with(
      slice(g2, lit(1), col("__ntok") - lit(2)),
      slice(col("__toks"), lit(3), col("__ntok") - lit(2)),
      (a, b) => concat(a, lit(" "), b))
    // Run-length decomposition of a SORTED gram array: one struct
    // (cnt, len) per distinct gram — 1-based run starts are the indices
    // where the sorted array changes value; each run's count is the gap
    // to the next start. Equivalent to groupBy(doc, gram).count without
    // the gram strings ever leaving the row.
    //
    // CRITICAL: every array a lambda touches is MATERIALIZED as a
    // projected column first. Interpreted higher-order functions do no
    // common-subexpression elimination, so `element_at(array_sort(x), i)`
    // inside a per-element lambda re-sorts the whole array on EVERY
    // call — O(L² log L) per document (benched 367 s vs 1.6 s at sf0.1
    // before this materialization). Column references are O(1) inside
    // the lambdas.
    def starts(ws: Column): Column =
      filter(sequence(lit(1), size(ws)),
        i => (i === lit(1)) || element_at(ws, i) =!= element_at(ws, i - lit(1)))
    def runs(ws: Column, st: Column): Column = {
      val nexts = concat(slice(st, lit(2), size(st) - lit(1)),
        array(size(ws) + lit(1)))
      zip_with(st, nexts, (a, b) =>
        struct((b - a).as("cnt"), length(element_at(ws, a)).as("len")))
    }
    val sorted = base
      .withColumn("__ws1", array_sort(col("__toks")))
      .withColumn("__ws2", array_sort(g2))
      .withColumn("__ws3", array_sort(g3))
      .withColumn("__st1", starts(col("__ws1")))
      .withColumn("__st2", starts(col("__ws2")))
      .withColumn("__st3", starts(col("__ws3")))
    // max over distinct grams of count * gramLength; chars inside grams
    // occurring MORE than once as sum of count * length
    def maxCov(ws: String, st: String): Column =
      array_max(transform(runs(col(ws), col(st)), r => r("cnt") * r("len")))
    def dupChars(ws: String, st: String): Column =
      aggregate(
        transform(runs(col(ws), col(st)), r =>
          when(r("cnt") > 1, (r("cnt") * r("len")).cast("long")).otherwise(lit(0L))),
        lit(0L), (acc, x) => acc + x)
    sorted
      .select(col(docIdCol),
        col("__nchars"), col("__ntok"), col("__ndistinct"),
        maxCov("__ws1", "__st1").as("__w1"),
        maxCov("__ws2", "__st2").as("__w2"),
        dupChars("__ws3", "__st3").as("__d3"))
      .select(
        col(docIdCol),
        col("__ntok").cast("long").as("n_tokens"),
        round((col("__ntok") - col("__ndistinct")).cast("double") / col("__ntok"), 6)
          .as("dup_word_frac"),
        round(col("__w1").cast("double") / col("__nchars"), 6).as("top_word_cov"),
        round(col("__w2").cast("double") / col("__nchars"), 6).as("top_bigram_cov"),
        round(col("__d3").cast("double") / col("__nchars"), 6).as("dup_trigram_frac"))
  }
}
