package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Text

/** N-gram language-model scoring — the KenLM-perplexity quality filter of
  * CCNet-style curation pipelines (train a small LM on trusted text, cut
  * documents whose perplexity says "not natural language"), as dataframe
  * algebra. [[Catalog]]'s `text_unigram_ll` is the self-scored unigram
  * form; this is the held-out BIGRAM form with stupid backoff: documents
  * score under a model fit on a DIFFERENT (trusted) corpus, so unseen
  * bigrams actually occur and the backoff path is exercised.
  *
  * Model: p(w2|w1) = c(w1 w2) / c(w1) when the bigram was seen in
  * training; alpha * (c(w2)+1) / (N+V) otherwise (stupid backoff to the
  * add-one unigram — no discount mass bookkeeping, the standard
  * web-scale choice precisely because it keeps the model two count
  * tables).
  *
  * Scale shape: bigram extraction is NARROW (zip_with over each doc's own
  * token array — no self-join, no window); training is two hash aggs; the
  * unigram/total tables are vocabulary-bounded and BROADCAST; the bigram
  * count table is the one unbounded model piece, so the score stream
  * equi-joins it on (w1, w2) — a plain keyed shuffle, AQE-eligible. At
  * open-web scale, cap training to top-B bigrams before the join (the
  * backoff absorbs the tail by design); the scoring plan is unchanged.
  *
  * Determinism: per-bigram log-probs round to 6dp and sum as decimals
  * (the BM25/unigram-LL discipline) — the whole train→score pipeline
  * replays exactly in SQL, so the Catalog row is FULLY oracled.
  */
object LanguageModel {

  /** Per-document bigram LM score under a model trained on `train`:
    * `(idCol, n_bigrams, avg_ll, ppl)` — avg log-likelihood (6dp) and
    * perplexity exp(-avg_ll) (4dp). Documents with fewer than two tokens
    * have no bigrams and drop out (nothing to score).
    */
  def bigramScore(
      train: DataFrame,
      score: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      alpha: Double = 0.4): DataFrame = {
    def bigrams(docs: DataFrame): DataFrame = {
      val t = docs.select(col(idCol), Text.tokens(col(textCol)).as("__toks"))
      t.select(col(idCol), explode(zip_with(
          slice(col("__toks"), lit(1), greatest(size(col("__toks")) - 1, lit(0))),
          slice(col("__toks"), lit(2), greatest(size(col("__toks")) - 1, lit(0))),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("__bg"))
        .select(col(idCol), col("__bg.w1"), col("__bg.w2"))
    }
    val trainToks = train.select(explode(Text.tokens(col(textCol))).as("w"))
    val uni = trainToks.groupBy(col("w")).agg(count(lit(1)).as("c1"))
    val totals = uni.agg(sum(col("c1")).as("n_total"), count(lit(1)).as("v"))
    val bi = bigrams(train).groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c2"))
    bigrams(score)
      .join(bi, Seq("w1", "w2"), "left")
      .join(broadcast(uni.select(col("w").as("w1"), col("c1").as("c1w1"))),
        Seq("w1"), "left")
      .join(broadcast(uni.select(col("w").as("w2"), col("c1").as("c1w2"))),
        Seq("w2"), "left")
      .crossJoin(broadcast(totals))
      .withColumn("__ll", round(
          when(col("c2").isNotNull, log(col("c2") / col("c1w1")))
            .otherwise(log(lit(alpha) * (coalesce(col("c1w2"), lit(0L)) + lit(1.0)) /
              (col("n_total") + col("v")))), 6)
        .cast("decimal(18,6)"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__ll")).as("__sll"))
      .select(col(idCol), col("n_bigrams"),
        round(col("__sll").cast("double") / col("n_bigrams"), 6).as("avg_ll"),
        round(exp(-col("__sll").cast("double") / col("n_bigrams")), 4).as("ppl"))
  }
}
