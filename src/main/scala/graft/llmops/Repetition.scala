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
  * Scale shape: the word/gram counting is an EXPLODE + two aggregations
  * that both ride ONE exchange on the document id — `repartition(doc)`
  * then `groupBy(doc, n, gram)` (superset of the partition key — no
  * second exchange) then `groupBy(doc)`. Per-doc scalars (token counts,
  * char counts) ride the shuffle on every gram row (a few ints — noise
  * against the gram strings) and collapse via `first`. No per-doc
  * quadratic lambda scans, no corpus-wide state, no skew beyond a single
  * document's own length: embarrassingly parallel in the corpus.
  * A doc-id-salted variant is unnecessary — one document's grams are
  * bounded by its length, and documents are the unit of work.
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
    def tag(n: Int, grams: Column): Column =
      transform(grams, g => struct(lit(n).as("n"), g.as("g")))
    val exploded = base
      .select(col(docIdCol), col("__nchars"), col("__ntok"), col("__ndistinct"),
        explode(concat(tag(1, col("__toks")), tag(2, g2), tag(3, g3))).as("__gr"))
      .select(col(docIdCol), col("__nchars"), col("__ntok"), col("__ndistinct"),
        col("__gr.n").as("__n"), col("__gr.g").as("__g"))
    exploded
      .repartition(col(docIdCol))
      .groupBy(col(docIdCol), col("__n"), col("__g"))
      .agg(count(lit(1)).as("__cnt"),
        first(col("__nchars")).as("__nchars"),
        first(col("__ntok")).as("__ntok"),
        first(col("__ndistinct")).as("__ndistinct"))
      .groupBy(col(docIdCol))
      .agg(
        first(col("__nchars")).as("__nchars"),
        first(col("__ntok")).as("__ntok"),
        first(col("__ndistinct")).as("__ndistinct"),
        max(when(col("__n") === 1, col("__cnt") * length(col("__g"))))
          .as("__w1"),
        max(when(col("__n") === 2, col("__cnt") * length(col("__g"))))
          .as("__w2"),
        coalesce(sum(when(col("__n") === 3 && col("__cnt") > 1,
          col("__cnt") * length(col("__g")))), lit(0L)).as("__d3"))
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
