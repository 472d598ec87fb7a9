package graft.llmops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Text

/** DSIR-style data selection — importance resampling over hashed n-gram
  * features (Xie et al., "Data Selection for Language Models via
  * Importance Resampling", NeurIPS 2023): fit bag-of-hashed-ngram
  * unigram+bigram distributions on a small TARGET corpus (the
  * distribution you want — e.g. curated English) and on the RAW pool,
  * score every raw document with its log importance weight
  * `log p_target(x) - log p_raw(x)`, and resample the pool
  * weight-proportionally. The public-recipe alternative to a trained
  * quality classifier: no model, one pass per corpus, and the weight is
  * a pure function of the document text.
  *
  * Exactness discipline (the engine convention): every per-bucket log
  * ratio is rounded to 6dp and carried as INTEGER MICROS, so a
  * document's weight is an integer sum — exact under any partitioning,
  * any arrival order, and bit-identical between the relational apply
  * ([[dsirWeights]]), the stateless narrow-map apply ([[dsirScore]]),
  * and the DuckDB oracle replay.
  *
  * Scale shape (100 TB discipline): the FIT is two hash aggregates
  * bounded by `buckets` cells each (hashing makes the feature space
  * fixed-width regardless of corpus vocabulary) producing a
  * `buckets`-row model — always broadcastable, persistable via
  * [[saveDsirModel]]. The relational APPLY is one narrow gram explode +
  * a broadcast join + one hash aggregate; the narrow-map apply is ZERO
  * exchanges (the model rides the plan as an array literal, one lookup
  * per gram via builtin HOFs — stream-safe, batch/stream identical by
  * construction). The RESAMPLE is a TakeOrdered(k) on an integer key —
  * never a global sort, never a window.
  */
object Importance {

  /** Unigrams ++ bigrams of the normalized whitespace tokens,
    * NON-distinct (counts are the feature, unlike the sorted-distinct
    * [[Text.shingles]]). NULL text is an empty-gram document — the
    * corpusReport convention: the row surfaces with zero features
    * rather than vanishing or poisoning an aggregate with NULL.
    */
  private[graft] def grams(text: Column): Column = {
    val toks = filter(Text.tokens(coalesce(text, lit(""))),
      t => length(t) > 0)
    val n = size(toks)
    val bigrams = when(n >= 2,
      zip_with(slice(toks, lit(1), n - 1), slice(toks, lit(2), n - 1),
        (a, b) => concat(a, lit(" "), b)))
      .otherwise(array().cast("array<string>"))
    concat(toks, bigrams)
  }

  /** Hash a gram to a bucket in [0, buckets): first 8 hex chars of md5
    * (an exact 32-bit integer) mod `buckets` — the engine's md5-bucket
    * convention, replayable in any SQL engine
    * (`('0x' || substr(md5(g), 1, 8))::BIGINT % B`). Computed by the
    * native [[graft.functions.expressions.Md5Prefix8]] kernel —
    * bit-identical to `conv(substring(md5(g), 1, 8), 16, 10)` without
    * materializing and re-parsing the hex string per gram (this runs
    * once per gram of every fitted/applied corpus — the hot inner loop
    * of both DSIR passes).
    */
  private[graft] def bucketOf(gram: Column, buckets: Int): Column =
    pmod(graft.functions.expressions.HashExpressions.md5_prefix8(gram),
      lit(buckets.toLong))

  private def requireBuckets(buckets: Int, op: String): Unit =
    require(buckets > 0 && buckets <= (1 << 18),
      s"$op: buckets must be in [1, 2^18] (the model is inherently " +
        "driver-sized — it rides every apply as a broadcast or an " +
        s"array literal), got $buckets")

  /** FIT: the complete `buckets`-row model `(bucket, logw, logw_micros)`
    * where `logw = round(ln p_target(b) - ln p_raw(b), 6)` under
    * add-one smoothing over hashed unigram+bigram counts, and
    * `logw_micros` is the same value as exact integer micros (the form
    * every apply sums). The model covers EVERY bucket in [0, buckets) —
    * absent buckets get the smoothing-floor ratio — so no apply can
    * ever miss a lookup.
    *
    * The fit is EAGER (the [[Curation.temperatureRates]] discipline):
    * each corpus pays exactly ONE scan+explode+aggregate pass into at
    * most `buckets` cells, which collect driver-side (bounded by the
    * same cap that keeps the model broadcastable — a lazy plan-side
    * total would re-aggregate the full gram stream a second time per
    * corpus, doubling the expensive pass at 100 TB for a sum over ≤2^18
    * cells). An EMPTY target or raw corpus raises loudly — a model fit
    * on nothing would silently score everything with the vacuous
    * smoothing-floor ratio.
    */
  def dsirFit(
      target: DataFrame,
      raw: DataFrame,
      buckets: Int = 8192,
      textCol: String = "text"): DataFrame = {
    requireBuckets(buckets, "dsirFit")
    def cells(df: DataFrame, side: String): Map[Long, Long] = {
      val rows = df
        .select(explode(grams(col(textCol))).as("__g"))
        .groupBy(bucketOf(col("__g"), buckets).as("bucket"))
        .agg(count(lit(1)).as("__c"))
        .collect()
      require(rows.nonEmpty,
        s"dsirFit: the $side corpus has zero n-grams — a model fit on " +
          "an empty corpus would score every document with the vacuous " +
          "smoothing-floor ratio")
      rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    modelFromCells(cells(target, "target"), cells(raw, "raw"), buckets,
      target.sparkSession)
  }

  /** ONE-PASS fit for the dominant case where the target is a PREDICATE
    * over the raw pool itself (e.g. `col("lang") === "en"`): a single
    * scan+explode+aggregate computes both distributions as conditional
    * counts — half the corpus passes of [[dsirFit]]'s two-frame form,
    * which cannot know its target is a subset of its raw. Same model,
    * bit-for-bit (the counts are identical by construction; a spec pins
    * it). Rows where the predicate evaluates NULL count toward the raw
    * pool only (NULL is not target membership).
    */
  def dsirFitWhere(
      docs: DataFrame,
      targetPred: Column,
      buckets: Int = 8192,
      textCol: String = "text"): DataFrame = {
    requireBuckets(buckets, "dsirFitWhere")
    val rows = docs
      .select(targetPred.cast("boolean").as("__t"),
        explode(grams(col(textCol))).as("__g"))
      .groupBy(bucketOf(col("__g"), buckets).as("bucket"))
      .agg(count(when(col("__t"), 1)).as("__ct"), count(lit(1)).as("__cr"))
      .collect()
    val tCells = rows.map(r => r.getLong(0) -> r.getLong(1))
      .filter(_._2 > 0).toMap
    val rCells = rows.map(r => r.getLong(0) -> r.getLong(2)).toMap
    require(rCells.values.sum > 0,
      "dsirFitWhere: the raw corpus has zero n-grams — a model fit on " +
        "an empty corpus would score every document with the vacuous " +
        "smoothing-floor ratio")
    require(tCells.values.sum > 0,
      "dsirFitWhere: no n-grams matched the target predicate — a model " +
        "fit on an empty target would score every document with the " +
        "vacuous smoothing-floor ratio")
    modelFromCells(tCells, rCells, buckets, docs.sparkSession)
  }

  private def modelFromCells(
      tCells: Map[Long, Long],
      rCells: Map[Long, Long],
      buckets: Int,
      spark: SparkSession): DataFrame = {
    val nt = tCells.values.sum.toDouble + buckets
    val nr = rCells.values.sum.toDouble + buckets
    val rowsOut = (0 until buckets).map { bk =>
      val lw = BigDecimal(
        math.log((tCells.getOrElse(bk.toLong, 0L) + 1.0) / nt) -
          math.log((rCells.getOrElse(bk.toLong, 0L) + 1.0) / nr))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (bk.toLong, lw, math.round(lw * 1e6))
    }
    import spark.implicits._
    rowsOut.toDF("bucket", "logw", "logw_micros")
  }

  /** Persist a [[dsirFit]] model at `dir` — the
    * [[Tokenize.saveVocabModel]] convention: fit once, serve any number
    * of later jobs (including streaming applies). One small parquet of
    * `(bucket, logw_micros)` rows, mode=overwrite for atomic re-fit
    * replacement.
    */
  def saveDsirModel(model: DataFrame, dir: String): Unit =
    model.select(col("bucket").cast("long"), col("logw_micros").cast("long"))
      .repartition(1)
      .write.mode("overwrite").parquet(s"$dir/model")

  /** Load a [[saveDsirModel]]-persisted model as the bucket-indexed
    * micros array (the form [[dsirScore]] rides the plan with). Raises
    * loudly on a missing/mis-shaped model or an INCOMPLETE bucket range
    * — a gap would silently score its grams with a wrong weight, the
    * exact silent-bias class the loud-guard discipline exists for.
    */
  def loadDsirModel(spark: SparkSession, dir: String): Array[Long] = {
    val rows =
      try spark.read.parquet(s"$dir/model")
        .select(col("bucket").cast("long"), col("logw_micros").cast("long"))
        .collect()
      catch { case e: Exception => throw new IllegalStateException(
        s"loadDsirModel: corrupt or missing model at $dir — " +
          s"expected (bucket, logw_micros) parquet: ${e.getMessage}", e) }
    require(rows.nonEmpty, s"loadDsirModel: empty model at $dir")
    require(rows.forall(r => !r.isNullAt(0) && !r.isNullAt(1)),
      s"loadDsirModel: corrupt model at $dir — NULL bucket or weight")
    val byBucket = rows.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val n = byBucket.length
    require(byBucket.map(_._1).sameElements(0L until n map (_.toLong)),
      s"loadDsirModel: model at $dir does not cover the contiguous " +
        s"bucket range [0, $n) exactly — a gap or duplicate would " +
        "silently mis-score every gram hashing into it")
    byBucket.map(_._2)
  }

  /** The relational APPLY: per-document gram count and total log
    * importance weight against a [[dsirFit]] model frame. One narrow
    * gram explode, one broadcast model join, one hash aggregate, and a
    * left join back so zero-gram documents (empty/NULL text) surface
    * with `n_grams = 0, logw = 0.0` instead of vanishing. `buckets`
    * must match the fit's — a gram hashing outside the model raises
    * loudly (the mismatch would otherwise silently drop grams from the
    * inner join). Output: (idCol, n_grams, logw 6dp).
    */
  def dsirWeights(
      docs: DataFrame,
      model: DataFrame,
      buckets: Int = 8192,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    requireBuckets(buckets, "dsirWeights")
    val perDoc = docs
      .select(col(idCol).as("__id"), explode(grams(col(textCol))).as("__g"))
      .select(col("__id"), bucketOf(col("__g"), buckets).as("bucket"))
      .join(broadcast(model.select(col("bucket"),
        col("logw_micros").as("__lw"))), Seq("bucket"), "left")
      .withColumn("__lw", when(col("__lw").isNull,
        raise_error(concat(lit("dsirWeights: bucket "), col("bucket"),
          lit(" is missing from the model — was the model fit with a " +
            "different `buckets` than this apply?"))).cast("long"))
        .otherwise(col("__lw")))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_grams"), sum(col("__lw")).as("__slw"))
    docs.select(col(idCol).as("__id"))
      .join(perDoc, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        round(coalesce(col("__slw"), lit(0L)).cast("double") / lit(1e6), 6)
          .as("logw"))
  }

  /** The stateless narrow-map APPLY: identical output to
    * [[dsirWeights]] (bit-for-bit — both sum the same integer micros),
    * but the model rides the plan as a bucket-indexed array literal and
    * each document folds its own grams with builtin HOFs — ZERO
    * exchanges, no join, so it applies unchanged to a streaming
    * DataFrame and is batch/stream identical by construction (the
    * [[Tokenize.oovAgainstVocab]] shape).
    */
  def dsirScore(
      docs: DataFrame,
      logwMicros: Array[Long],
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(logwMicros.nonEmpty,
      "dsirScore: empty model — fit with dsirFit / load with loadDsirModel")
    val lut = typedlit(logwMicros.toSeq)
    docs
      .withColumn("__gs", grams(col(textCol)))
      .withColumn("n_grams", size(col("__gs")).cast("long"))
      .withColumn("__slw", aggregate(col("__gs"), lit(0L),
        (acc, g) => acc +
          element_at(lut,
            (bucketOf(g, logwMicros.length) + lit(1L)).cast("int"))))
      .select(col(idCol), col("n_grams"),
        round(col("__slw").cast("double") / lit(1e6), 6).as("logw"))
  }

  /** RESAMPLE: a deterministic Gumbel-top-k draw of `k` documents with
    * inclusion preference proportional to the length-normalized
    * importance weight — the selection step of the DSIR recipe. Key
    * construction (all integer micros, so the comparison — and
    * therefore the EXACT sample — replays in SQL):
    *
    *   - per-doc score = round(logw_micros_total / n_grams): the
    *     AVERAGE per-gram log weight in micros (length-normalized on
    *     purpose: the paper's raw total makes long documents win on
    *     length alone, and its exp() overflows a double past ~709);
    *     zero-gram documents score 0;
    *   - Gumbel noise g = round(-ln(-ln(u)), 6) in micros, with
    *     `u = (U+1)/2^52` from the first 13 md5 hex chars of the id —
    *     the [[Curation.prioritySample]] uniform: exact integer
    *     numerator, power-of-two divisor, one correctly-rounded IEEE
    *     division (u == 1, a 2^-52 event where Spark's ln(0) yields
    *     NULL but other engines -inf, is pinned to the constant 37.0 ≈
    *     -ln(-ln(1 - 2^-52)) on BOTH sides);
    *   - key = score + gumbel, winners = TakeOrdered(k) by
    *     (key DESC, id ASC) — never a global sort.
    *
    * The k winners broadcast-join back for their full rows plus
    * (n_grams, logw, key 6dp). Ids must be long-castable, INTEGRAL,
    * and unique (the priority-sampler contract): the md5 draw and the
    * join-back key on them, so the id is PLAN-GUARDED — a NULL or
    * non-long-castable id would draw a NULL Gumbel key and the row
    * would silently vanish from the sample, and a fractional id would
    * truncate in the draw (3.2 and 3.9 sharing one fate) — both raise
    * loudly instead (the [[Curation]] knuthDraw discipline; the
    * double-space roundtrip compare is exact below 2^52, where every
    * fractional double lives).
    */
  def dsirSample(
      docs: DataFrame,
      model: DataFrame,
      k: Int,
      buckets: Int = 8192,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(k > 0, "dsirSample: k must be positive")
    requireBuckets(buckets, "dsirSample")
    val w = dsirWeights(docs, model, buckets, idCol, textCol)
    val rawId = col(idCol)
    val asLong = rawId.try_cast("long")
    val idL = when(asLong.isNull,
      raise_error(concat(
        lit("dsirSample: the id column must be a long-castable unique " +
          "id (it seeds the Gumbel draw and keys the winner join-back), " +
          "got "),
        coalesce(rawId.cast("string"), lit("NULL")))).cast("long"))
      .when(!(asLong.cast("double") <=> rawId.try_cast("double")),
        raise_error(concat(
          lit("dsirSample: the id column must be INTEGRAL — a " +
            "fractional id would silently truncate in the draw, got "),
          rawId.cast("string"))).cast("long"))
      .otherwise(asLong)
    val u = (conv(substring(md5(idL.cast("string")), 1, 13), 16, 10)
      .cast("long") + lit(1L)).cast("double") / lit(4503599627370496.0)
    val gumbel = when(u >= 1.0, lit(37.0)).otherwise(-log(-log(u)))
    // total micros reconstructs exactly from the 6dp logw (it IS
    // micros/1e6); the average is one correctly-rounded IEEE division
    val totalMicros = round(col("logw") * lit(1e6), 0)
    val winners = w
      .withColumn("__score",
        when(col("n_grams") === 0, lit(0L))
          .otherwise(round(totalMicros / col("n_grams"), 0).cast("long")))
      .withColumn("__gm", round(round(gumbel, 6) * lit(1e6), 0).cast("long"))
      .withColumn("__key", col("__score") + col("__gm"))
      .orderBy(col("__key").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol).as("__sel_id"), col("n_grams"), col("logw"),
        round(col("__key").cast("double") / lit(1e6), 6).as("key"))
    docs.join(broadcast(winners), col(idCol) === col("__sel_id"))
      .drop("__sel_id")
  }
}
