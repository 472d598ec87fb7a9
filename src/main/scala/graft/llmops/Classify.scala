package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Supervised text classification for corpus curation: a multinomial
  * naive-Bayes model trained and applied entirely as dataframe algebra —
  * the deterministic stand-in for the fastText-style domain/quality
  * classifiers every LLM data pipeline runs (CCNet's wiki-vs-crawl filter,
  * quality classifiers scoring "looks like reference text"). Where
  * [[graft.functions.Text]]'s `unigram LL` scores text against ONE
  * background distribution, this scores against per-label distributions
  * and picks the argmax — a trainable filter, not just a perplexity gate.
  *
  * Determinism discipline (same as BM25/unigram-LL): every per-token
  * log-probability is 6dp-rounded and summed as DECIMAL, so scores are
  * exact at any partitioning and the full (train → score → argmax)
  * pipeline replays bit-for-bit in plain SQL — the Catalog row
  * `text_nb_classify` is FULLY oracled, ties broken by label order.
  *
  * Scale notes (100 TB discipline):
  *  - training is two hash aggs over the token stream ((label, tok)
  *    counts, then per-label totals) — map-side combine on both, no
  *    row-level shuffle of the corpus beyond the token agg;
  *  - the model is vocabulary x labels — bounded by VOCAB, not corpus.
  *    At open-web scale, cap to the top-V tokens (the `maxVocab` knob)
  *    and the grid stays broadcastable exactly like the unigram-LL vocab;
  *  - scoring is one narrow scan + explode, a broadcast join against the
  *    model, and one (doc, label) hash agg — label cardinality is small
  *    (domains/languages/quality buckets), so the explode factor is L.
  */
object Classify {

  /** A trained NB model: `weights` is the dense (tok, label, w) grid with
    * add-one smoothing (w = ln((c+1)/(n_label+V)), 6dp decimal); `priors`
    * is one row per label carrying the log prior AND the label's OOV
    * weight (the smoothed probability of a token never seen under that
    * label) so scoring handles unseen tokens without a special case.
    *
    * Both sides come back PERSISTED and materialized from
    * [[trainNaiveBayes]]: scoring broadcasts the model in several places
    * (per-token join, sentinels, final prior add), and without
    * materialization every broadcast would re-run the full training
    * aggregation over the corpus. Call [[NbModel.free]] when done.
    */
  final case class NbModel(weights: DataFrame, priors: DataFrame) {
    def free(): Unit = { weights.unpersist(); priors.unpersist(); () }
  }

  private val DEC = "decimal(18,6)"

  /** Train a multinomial naive-Bayes classifier from labeled documents.
    * Tokens are [[Text.tokens]] (the corpus-wide normalization every text
    * operator here shares). With `maxVocab > 0` only the top-V tokens by
    * corpus frequency (ties broken by token order) enter the vocabulary;
    * everything else scores as OOV — the standard trick that keeps the
    * model broadcastable at any corpus size.
    */
  def trainNaiveBayes(
      docs: DataFrame,
      labelCol: String = "source",
      textCol: String = "text",
      idCol: String = "doc_id",
      maxVocab: Int = 0): NbModel = {
    // the exploded token stream feeds four aggregations (vocab, counts,
    // label totals, vocab size) — cache it for the duration of training
    // so the corpus is tokenized once, not once per aggregate
    val toks = docs.select(
      col(idCol).as("__id"), col(labelCol).as("label"),
      explode(Text.tokens(col(textCol))).as("tok"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val vocabAll = toks.groupBy(col("tok")).agg(count(lit(1)).as("__cf"))
    // orderBy+limit (TakeOrderedAndProject, map-side top-K) — a global
    // row_number window here would single-partition the whole vocabulary
    val vocab =
      if (maxVocab <= 0) vocabAll.select("tok")
      else vocabAll.orderBy(col("__cf").desc, col("tok"))
        .limit(maxVocab).select("tok")

    // (label, tok) counts restricted to the vocabulary; per-label token
    // totals ALSO restricted (an out-of-vocab token is invisible to the
    // model on both sides — that is what makes capped and uncapped
    // training the same formula). Uncapped training skips the vocab
    // semi-join outright: vocab = ALL distinct tokens by construction,
    // so the join is an identity — building and broadcasting the entire
    // corpus vocabulary just to keep every row was a full wasted pass.
    val cnt = (if (maxVocab <= 0) toks
               else toks.join(broadcast(vocab), Seq("tok")))
      .groupBy(col("label"), col("tok")).agg(count(lit(1)).as("c"))
    val ltot = cnt.groupBy(col("label")).agg(sum(col("c")).as("n_lab"))
    val vSize = vocab.agg(count(lit(1)).as("vs"))

    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val priors = docs.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("n_lab_docs"))
      .crossJoin(broadcast(nDocs))
      // left: a label whose docs carry NO in-vocabulary tokens still
      // exists (prior-only, every token OOV) — n_lab defaults to 0
      .join(broadcast(ltot), Seq("label"), "left")
      .withColumn("n_lab", coalesce(col("n_lab"), lit(0L)))
      .crossJoin(broadcast(vSize))
      .select(
        col("label"),
        round(log(col("n_lab_docs").cast("double") / col("n_docs")), 6)
          .cast(DEC).as("prior"),
        round(log(lit(1.0) / (col("n_lab") + col("vs"))), 6)
          .cast(DEC).as("oov_w"))

    // dense vocab x labels grid: absent (tok, label) pairs get the
    // smoothed zero-count weight, so scoring never needs a per-pair miss
    // path — only the per-TOKEN miss path (OOV) remains
    val weights = vocab
      .crossJoin(broadcast(ltot))
      .join(cnt, Seq("tok", "label"), "left")
      .crossJoin(broadcast(vSize))
      .select(
        col("tok"), col("label"),
        round(log((coalesce(col("c"), lit(0L)) + lit(1.0)) / (col("n_lab") + col("vs"))), 6)
          .cast(DEC).as("w"))
    // train ONCE: the model is bounded (vocab x labels), scoring
    // broadcasts it repeatedly — materialize so each broadcast reads the
    // cached aggregate instead of re-scanning the corpus
    val model = NbModel(
      weights.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK),
      priors.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    model.priors.count(); model.weights.count()
    toks.unpersist() // model is materialized; the training stream can go
    model
  }

  /** Score documents under a trained model: per-doc argmax label over
    * `prior + sum(token log-probs)`, unseen tokens scored with the
    * label's OOV weight. Returns one row per input document:
    * `(idCol, predicted, score)` — score is the winning label's total
    * log-likelihood (6dp double). Ties break toward the smaller label,
    * so the argmax is engine-portable.
    */
  def scoreNaiveBayes(
      docs: DataFrame,
      model: NbModel,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    // term-frequency compression BEFORE the label fan-out: a doc's k
    // copies of one token score as tf * w — decimal multiplication IS
    // exact repeated addition, so the result is bit-identical to
    // per-instance summing while the x-labels blowup applies to the
    // (doc, term) table, not the raw token stream
    val DECW = "decimal(38,6)"
    val tf = docs.select(col(idCol).as("__id"),
        explode(Text.tokens(col(textCol))).as("tok"))
      .groupBy(col("__id"), col("tok")).agg(count(lit(1)).as("__tf"))
    // OOV accounting is folded into the SEEN terms algebraically:
    //   Σ_vocab tf·w + Σ_oov tf·oov_w
    //     = Σ_vocab tf·(w − oov_w) + (Σ_all tf)·oov_w
    // so in-vocabulary rows score tf·(w − oov_w) and one sentinel row
    // per (doc, label) carries total_tokens·oov_w. Every step is exact
    // decimal arithmetic (subtract, multiply by a long, sum), so scores
    // are bit-identical to the separate-OOV-branch form — and the
    // tokenize→explode→tf pipeline now evaluates ONCE instead of twice
    // (the old OOV branch re-derived `tf` for its anti-join; nothing is
    // cached here — see the minhashLshPairs no-cache note), with the
    // per-doc token total coming from a NARROW size() pass, no shuffle.
    // The dense grid already carries one row per label, so the broadcast
    // join IS the fan-out — no cross join.
    val wAdj = broadcast(model.weights
      .join(model.priors.select(col("label"), col("oov_w")), Seq("label"))
      .select(col("tok"), col("label"), (col("w") - col("oov_w")).as("__wa")))
    val seen = tf.join(wAdj, Seq("tok"))
      .select(col("__id"), col("label"),
        (col("__tf") * col("__wa")).cast(DECW).as("w"))
    // the sentinel doubles as the OOV mass AND the zero-token guard: a
    // doc with no in-vocab terms (or no terms at all — total 0) still
    // gets one row per label, so every doc classifies (prior-only when
    // total is 0). Union into the SAME hash agg — no corpus-sized
    // join-back (a base-vs-sums left join here would sort-merge two
    // corpus-sized sides; the union costs one extra row per doc per label)
    // null-test the RAW text column, not the token array: the array
    // expression appearing under both `when` branches would evaluate the
    // normalize regex twice per row (split of a non-null text is never
    // null, so the tests are equivalent)
    val sentinels = docs.select(col(idCol).as("__id"),
        when(col(textCol).isNull, lit(0L))
          .otherwise(size(Text.tokens(col(textCol))).cast("long")).as("__total"))
      .crossJoin(broadcast(model.priors.select("label", "oov_w")))
      .select(col("__id"), col("label"),
        (col("__total") * col("oov_w")).cast(DECW).as("w"))
    val totals = seen.unionByName(sentinels)
      .groupBy(col("__id"), col("label"))
      .agg(sum(col("w")).as("__sll"))
      .join(broadcast(model.priors.select("label", "prior")), Seq("label"))
      .select(col("__id"), col("label"),
        (col("prior") + col("__sll")).as("__tot"))
    totals
      .withColumn("__r", row_number().over(
        Window.partitionBy(col("__id"))
          .orderBy(col("__tot").desc, col("label"))))
      .filter(col("__r") === 1)
      .select(col("__id").as(idCol), col("label").as("predicted"),
        round(col("__tot").cast("double"), 6).as("score"))
  }

  /** Train-and-score in one call (the self-fit diagnostic a curation run
    * uses to check label separability before trusting the filter).
    */
  def classifySelf(
      docs: DataFrame,
      labelCol: String = "source",
      textCol: String = "text",
      idCol: String = "doc_id",
      maxVocab: Int = 0): DataFrame =
    scoreNaiveBayes(
      docs, trainNaiveBayes(docs, labelCol, textCol, idCol, maxVocab),
      textCol, idCol)
}
