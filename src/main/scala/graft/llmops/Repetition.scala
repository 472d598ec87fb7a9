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
  * gram counting never leaves the row: one native codegen'd pass
  * (TextExpressions.repetition_stats) interns tokens/bigrams/trigrams
  * into per-row hash maps — O(L) amortized. History: the explode
  * formulation shuffled every gram string and benched 10.9 s at sf0.1;
  * the sorted-run HOF rewrite made it pure map work (2.9 s) but paid
  * three per-row array sorts plus interpreted lambda calls per element
  * (higher-order functions are CodegenFallback); the native kernel is
  * 0.9 s, value-identical (differential spec pins it against the HOF
  * formula). No corpus-wide state, no skew beyond a single document's
  * own length: embarrassingly parallel in the corpus.
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
    // All gram counting runs in ONE native pass per row
    // (TextExpressions.repetition_stats — see RepetitionStats): the HOF
    // formulation materialized and SORTED three gram arrays per row and
    // walked them with interpreted lambdas (higher-order functions are
    // CodegenFallback — every call crosses the interpreted boundary per
    // element); the kernel interns grams into per-row hash maps in one
    // byte walk, inside whole-stage codegen. Values are identical: same
    // tokens (non-empty single-space splits of the normalized text),
    // same exact per-gram counts, same code-point gram lengths.
    val norm = graft.functions.Text.normalize(col(textCol))
    docs
      .select(col(docIdCol), norm.as("__norm"))
      .select(col(docIdCol), length(col("__norm")).as("__nchars"),
        graft.functions.expressions.TextExpressions
          .repetition_stats(col("__norm")).as("__r"))
      .filter(col("__r.n_tokens") >= 3)
      .select(
        col(docIdCol),
        col("__r.n_tokens").as("n_tokens"),
        round((col("__r.n_tokens") - col("__r.n_distinct")).cast("double")
          / col("__r.n_tokens"), 6).as("dup_word_frac"),
        round(col("__r.top_word").cast("double") / col("__nchars"), 6)
          .as("top_word_cov"),
        round(col("__r.top_bigram").cast("double") / col("__nchars"), 6)
          .as("top_bigram_cov"),
        round(col("__r.dup_trigram").cast("double") / col("__nchars"), 6)
          .as("dup_trigram_frac"))
  }
}
