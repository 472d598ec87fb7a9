package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Text
import graft.functions.expressions.TextExpressions

/** Learned subword tokenization — the step every LLM-training pipeline
  * runs between curation and batching, as dataframe algebra plus one
  * native segmentation kernel. Two halves:
  *
  *  - [[learnSubwordVocab]]: a DETERMINISTIC one-shot frequent-substring
  *    vocabulary (all substrings up to `maxPieceLen` of every distinct
  *    word, weighted by word frequency, top-K by score with total
  *    tie-breaks). This is the closed-form stand-in for iterative BPE
  *    merge learning: the iterative merge order is data-dependent state
  *    that no external engine can replay, while the frequent-substring
  *    rule is pure aggregation — same spirit (frequent fragments become
  *    units), fully SQL-replayable, so the Catalog row is FULLY oracled
  *    end to end including the learned vocabulary.
  *  - [[encodeSubwords]]: greedy longest-match-first segmentation
  *    (WordPiece's inference rule, marker-free) with single-character
  *    fallback — lossless by construction (pieces concatenate back to
  *    the word; no UNK sink), via the codegen'd
  *    [[graft.functions.expressions.SubwordSplit]] kernel.
  *
  * Scale shape (100 TB discipline): the vocabulary learn aggregates the
  * (bounded) distinct-word table, never the corpus; encoding segments
  * each DISTINCT word once and joins the pieces back to the token
  * stream — the corpus pays one narrow explode and one broadcast-join
  * (the distinct-word table is the broadcast side at query scale; at
  * open-web scale it shuffle-joins on the word key, still never
  * re-segmenting per instance).
  */
object Tokenize {

  /** Top-`vocabSize` substrings (length <= `maxPieceLen`, in code points)
    * of the corpus's distinct words, scored by sum over words of
    * `wordFreq x occurrencePositions`, ties broken by piece order.
    * Returns `(piece, score, rank)`.
    */
  def learnSubwordVocab(
      docs: DataFrame,
      vocabSize: Int = 256,
      maxPieceLen: Int = 6,
      textCol: String = "text"): DataFrame = {
    val words = docs
      .select(explode(Text.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("wf"))
    val pieces = words
      .select(col("word"), col("wf"),
        explode(sequence(lit(1), length(col("word")))).as("pos"))
      .select(col("wf"), col("word"), col("pos"),
        explode(sequence(lit(1),
          least(lit(maxPieceLen), length(col("word")) - col("pos") + 1))).as("len"))
      .select(expr("substring(word, pos, len)").as("piece"), col("wf"))
    // top-K via orderBy+limit, NOT a global row_number window: Spark
    // plans this as TakeOrderedAndProject (map-side partial top-K per
    // task), while the window form funnels the ENTIRE substring space
    // through one partition — the difference between a bounded reduce
    // and a single-task sort at open-web scale. The rank column is
    // reattached over the K survivors only (a K-row window is free).
    pieces.groupBy(col("piece")).agg(sum(col("wf")).as("score"))
      .orderBy(col("score").desc, col("piece"))
      .limit(vocabSize)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score").desc, col("piece"))))
  }

  /** Segment every document into subword pieces under `vocab` (a
    * `piece`-column dataframe, e.g. [[learnSubwordVocab]]'s output).
    * Returns one row per doc: `(idCol, n_words, n_pieces, n_fallback,
    * pieces_fp)` — `n_fallback` counts emitted pieces that are NOT in
    * the vocabulary (single-char fallbacks), `pieces_fp` is the md5 of
    * the doc's full space-joined piece stream in word order (the
    * strongest cheap certificate that two engines produced the identical
    * segmentation).
    *
    * The vocabulary is collected driver-side — it is a learned top-K
    * artifact (bounded by `vocabSize`), the same class of bounded model
    * state as IVF centroids or the NB model.
    */
  def encodeSubwords(
      docs: DataFrame,
      vocab: DataFrame,
      maxPieceLen: Int = 6,
      idCol: String = "doc_id",
      textCol: String = "text",
      broadcastWords: Boolean = true): DataFrame = {
    val vocabSeq = vocab.select(col("piece")).collect()
      .map(_.getString(0)).toSeq
    val toks = docs.select(col(idCol).as("__id"),
        posexplode(Text.tokens(col(textCol))).as(Seq("pos", "word")))
      .filter(length(col("word")) > 0)
    // segment each DISTINCT word once; corpus instances join the result
    val split = toks.select(col("word")).distinct()
      .select(col("word"),
        TextExpressions.subword_split(col("word"), vocabSeq, maxPieceLen).as("pieces"))
    // fallback pieces = emitted pieces outside the vocabulary, counted
    // relationally (an IN-list of the whole vocab per element would fight
    // codegen at real vocab sizes)
    val fb = split.select(col("word"), explode(col("pieces")).as("piece"))
      .join(broadcast(vocab.select("piece")), Seq("piece"), "left_anti")
      .groupBy(col("word")).agg(count(lit(1)).as("n_fb"))
    val wordPieces = split.join(fb, Seq("word"), "left")
      .withColumn("n_fb", coalesce(col("n_fb"), lit(0L)))
    // broadcastWords = false is the open-web path: a distinct-word table
    // past broadcast size shuffle-joins on the word key instead (the
    // forced hint would otherwise OOM the driver at that scale)
    val joinSide = if (broadcastWords) broadcast(wordPieces) else wordPieces
    val joined = toks.join(joinSide, Seq("word"))
    joined.groupBy(col("__id"))
      .agg(count(lit(1)).as("n_words"),
        sum(size(col("pieces"))).as("n_pieces"),
        sum(col("n_fb")).as("n_fallback"),
        md5(concat_ws(" ",
          flatten(array_sort(collect_list(struct(col("pos"), col("pieces"))))
            .getField("pieces")))).as("pieces_fp"))
      .select(col("__id").as(idCol), col("n_words"), col("n_pieces"),
        col("n_fallback"), col("pieces_fp"))
  }
}
