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
  *  - [[bpeMerges]]: TRUE iterative BPE merge learning over the distinct-
  *    word frequency table — most frequent adjacent pair fuses each
  *    round; the space-separated symbol-string encoding makes every
  *    round one aggregate + one `replace`, so the full merge trajectory
  *    is SQL-replayable (text_bpe_merges oracles the chosen pairs and
  *    counts round for round).
  *  - [[learnSubwordVocab]]: the DETERMINISTIC one-shot frequent-substring
  *    vocabulary (all substrings up to `maxPieceLen` of every distinct
  *    word, weighted by word frequency, top-K by score with total
  *    tie-breaks) — the closed-form alternative when a single
  *    aggregation pass must produce the vocabulary (no training loop),
  *    also fully oracled.
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

  /** TRUE iterative BPE merge learning — the canonical tokenizer
    * trainer: starting from characters (+ the `</w>` end-of-word mark),
    * repeatedly find the most frequent adjacent symbol pair across the
    * corpus and fuse it, `numMerges` times. Returns the learned merge
    * table `(merge_rank, pair, pair_count)` — the artifact a tokenizer
    * ships (apply merges in rank order to encode).
    *
    * Spark-first shape, the industry trainer's: ONE corpus-scale pass
    * folds the corpus to the distinct-WORD frequency table (capped at
    * `maxWords` by frequency via TakeOrdered — the standard trainer
    * cap); every merge round then runs on that vocabulary-sized frame:
    * a pair-count aggregate (map-side partials), a 1-row deterministic
    * argmax (`count DESC, pair` — collected: one bounded row per
    * round), and a string `replace` fusing the pair. Words are held as
    * DOUBLE-SPACE-separated symbol strings, so "merge every
    * non-overlapping occurrence left-to-right" — exactly BPE's
    * application rule, self-chains included — is plain
    * `replace(sym, ' l  r ', ' lr ')` (see the encoding-invariant
    * comment in the body), an expression ANY SQL engine evaluates
    * identically. That makes the full iterative
    * trajectory externally replayable: the text_bpe_merges oracle
    * unrolls the rounds in DuckDB (MATERIALIZED per round, the
    * graph_kcore discipline) and must reproduce every chosen pair and
    * count — not a gate, the merges themselves. ([[learnSubwordVocab]]
    * remains the closed-form one-shot alternative; its scaladoc's old
    * claim that the merge order is not replayable is retired by this
    * encoding.)
    *
    * Stops early (fewer rows) if the vocabulary runs out of adjacent
    * pairs. The per-round state persists vocabulary-sized only.
    *
    * Cost model: each merge round is ONE pair-count aggregate over the
    * capped word table plus a one-row argmax collect and a
    * localCheckpoint — `numMerges` SEQUENTIAL Spark jobs by definition
    * (merge r+1's counts depend on merge r's rewrite; no trainer
    * parallelizes across rounds). That is the offline-training shape:
    * fine for a vocabulary build, not a per-query operator. The
    * `maxWords` cap (top by frequency, default 1M) bounds every round
    * to a vocabulary-sized frame regardless of corpus size — the corpus
    * is touched exactly once, in the initial word count.
    */
  def bpeMerges(
      docs: DataFrame,
      numMerges: Int,
      textCol: String = "text",
      maxWords: Int = 1000000): DataFrame = {
    require(numMerges > 0, "bpeMerges: numMerges must be positive")
    val spark = docs.sparkSession
    val words = docs
      .select(explode(Text.tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w")).limit(maxWords)
    // Encoding invariant: symbols are separated (and bounded) by
    // exactly TWO spaces. The merge needle is ' l  r ' — one space of
    // the left boundary, both inner, one of the right — so two
    // occurrences SHARING a boundary (self-chains: 'a a a' under merge
    // (a,a), 'banana' under (an,an)…) each take a different half of
    // the shared boundary and BOTH merge; a single-space encoding
    // consumes the shared delimiter with the first match and silently
    // skips the second (caught by the sequential-reference spec on
    // 'banana'). The replacement ' lr ' restores both boundaries to
    // two spaces, so the invariant holds round over round, and
    // left-to-right non-overlapping replace() — identical semantics in
    // the JVM and DuckDB — walks exactly the symbol-level greedy scan.
    //
    // Eager localCheckpoint per round (NOT persist): the replace-chain
    // grows the LOGICAL plan every round and AQE re-renders the full
    // explain string per job — 30 rounds of accumulated projections
    // OOM'd the driver in explainString; the checkpoint pins each
    // round to a vocabulary-sized LogicalRDD so the plan stays O(1)
    var tbl = words.select(
      concat(lit("  "),
        regexp_replace(col("w"), "(.)", "$1  "), lit("</w>  ")).as("sym"),
      col("n")).localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
    var exhausted = false
    for (r <- 1 to numMerges if !exhausted) {
      val best = tbl
        .select(col("n"), split(trim(col("sym")), "  ").as("a"))
        .select(col("n"), explode(zip_with(
          slice(col("a"), lit(1), size(col("a")) - 1),
          slice(col("a"), lit(2), size(col("a")) - 1),
          (l, rr) => concat(l, lit(" "), rr))).as("pair"))
        .groupBy(col("pair")).agg(sum(col("n")).as("c"))
        .orderBy(col("c").desc, col("pair")).limit(1)
        .collect()
      if (best.isEmpty) exhausted = true
      else {
        val pair = best(0).getString(0)
        merges += ((r.toLong, pair, best(0).getLong(1)))
        val fused = pair.replace(" ", "")
        val needle = " " + pair.replace(" ", "  ") + " "
        tbl = tbl.withColumn("sym",
          org.apache.spark.sql.functions.replace(col("sym"),
            lit(needle), lit(s" $fused "))).localCheckpoint(true)
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("merge_rank", "pair", "pair_count")
  }

  /** Apply a learned [[bpeMerges]] table: encode every document's token
    * stream into BPE pieces by replaying the merges IN RANK ORDER over
    * each distinct word (the tokenizer's inference rule — merge
    * priority is training order, not greedy length). Returns one row
    * per document: `(idCol, n_pieces, pieces_md5)` where the md5
    * fingerprints the full space-joined piece stream in token order —
    * the same certify-the-whole-segmentation contract text_subword
    * uses.
    *
    * Scale shape (the [[encodeSubwords]] discipline): the merge chain
    * — a bounded, collected list, one `replace` per merge — evaluates
    * once per DISTINCT word inside a single projection; the corpus
    * pays one explode and one join on the word key (broadcast at
    * query scale, shuffle at open-web scale), never re-encoding per
    * instance. Every step is engine-portable string algebra, so the
    * text_bpe_encode oracle replays training AND encoding end to end.
    */
  def encodeBpe(
      docs: DataFrame,
      merges: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val ms = merges.orderBy("merge_rank")
      .select("pair").collect().map(_.getString(0)).toSeq
    val toks = docs
      .select(col(idCol), posexplode(Text.tokens(col(textCol))).as(Seq("pos", "w")))
      .filter(col("w") =!= "")
    val words = toks.select(col("w")).distinct()
    val sym0: org.apache.spark.sql.Column = concat(lit("  "),
      regexp_replace(col("w"), "(.)", "$1  "), lit("</w>  "))
    val symN = ms.foldLeft(sym0) { (c, pair) =>
      org.apache.spark.sql.functions.replace(c,
        lit(" " + pair.replace(" ", "  ") + " "),
        lit(" " + pair.replace(" ", "") + " "))
    }
    val enc = words.select(col("w"),
      org.apache.spark.sql.functions.replace(trim(symN), lit("  "), lit(" "))
        .as("pieces"),
      size(split(trim(symN), "  ")).cast("long").as("np"))
    toks.join(enc, Seq("w"))
      .groupBy(col(idCol))
      .agg(sum(col("np")).as("n_pieces"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("pieces")))),
          x => x.getField("pieces")), " ")).as("pieces_md5"))
  }

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

  /** Per-document vocabulary coverage / OOV rate against the corpus's
    * own top-`vocabSize` terms — the tokenizer-fertility signal a
    * pipeline tracks per source/shard (a shard whose OOV rate spikes is
    * drifting away from the tokenizer's training distribution and will
    * fragment into fallback pieces). Fit: exact top-K terms by
    * (count DESC, term ASC — a total order, so the vocabulary is
    * deterministic and SQL-replayable), which plans as a map-side
    * partial count + TakeOrdered(K) — never a full sort. Apply: the
    * token stream LEFT-joins the broadcast vocabulary and one aggregate
    * counts misses per document (the [[encodeSubwords]] relational
    * discipline — an IN-list of the whole vocabulary per token would
    * fight codegen at real vocab sizes). Zero-token documents surface
    * with `n_tokens = 0, oov_rate = 0.0` (a left join back to the
    * corpus — rows must not silently vanish). Output: (idCol, n_tokens,
    * n_oov, oov_rate 6dp).
    */
  def vocabCoverage(
      docs: DataFrame,
      vocabSize: Int = 50,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(vocabSize > 0, "vocabCoverage: vocabSize must be positive")
    val toks = docs.select(col(idCol).as("__id"),
        explode(Text.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
    val vocab = toks.groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term").asc)
      .limit(vocabSize)
      .select(col("term"), lit(1).as("__v"))
    val perDoc = toks
      .join(broadcast(vocab), Seq("term"), "left")
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_tokens"),
        count(when(col("__v").isNull, 1)).as("n_oov"))
    docs.select(col(idCol).as("__id"))
      .join(perDoc, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        when(coalesce(col("n_tokens"), lit(0L)) === 0, lit(0.0))
          .otherwise(round(col("n_oov").cast("double") / col("n_tokens"), 6))
          .as("oov_rate"))
  }
  /** The FIT half of the persisted-vocabulary OOV signal: the corpus's
    * exact top-`vocabSize` terms by (count DESC, term ASC — a total
    * order, so the vocabulary is deterministic and replayable), as a
    * (term, cnt) DataFrame. Plans as map-side partial counts +
    * TakeOrdered(K) — never a full sort. Fit once on a STATIC reference
    * corpus, persist with [[saveVocabModel]], and apply anywhere —
    * most usefully against a FIXED tokenizer vocabulary across shards
    * and streams, which a per-call refit ([[vocabCoverage]]) cannot
    * track drift against.
    */
  def vocabFit(
      docs: DataFrame,
      vocabSize: Int = 50,
      textCol: String = "text"): DataFrame = {
    require(vocabSize > 0, "vocabFit: vocabSize must be positive")
    docs.select(explode(Text.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term").asc)
      .limit(vocabSize)
  }

  /** Persist a [[vocabFit]] vocabulary at `dir` — the
    * [[Similarity.saveSqModel]] convention: a model fits once and
    * serves any number of later jobs. One small parquet of (term, cnt)
    * rows, mode=overwrite for atomic re-fit replacement.
    */
  def saveVocabModel(vocab: DataFrame, dir: String): Unit =
    vocab.select(col("term").cast("string"), col("cnt").cast("long"))
      .repartition(1)
      .write.mode("overwrite").parquet(s"$dir/model")

  /** Load a [[saveVocabModel]]-persisted vocabulary as the ordered term
    * list (count DESC, term ASC — the fit's total order, so the reload
    * is byte-identical to the fit's collect). Raises loudly on a
    * missing/empty/mis-shaped model rather than applying an empty
    * vocabulary (which would silently score EVERYTHING as OOV).
    */
  def loadVocabModel(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): Seq[String] = {
    val rows =
      try spark.read.parquet(s"$dir/model")
        .select(col("term").cast("string"), col("cnt").cast("long"))
        .collect()
      catch { case e: Exception => throw new IllegalStateException(
        s"loadVocabModel: corrupt or missing model at $dir — " +
          s"expected (term, cnt) parquet: ${e.getMessage}", e) }
    require(rows.nonEmpty,
      s"loadVocabModel: empty model at $dir — an empty vocabulary would " +
        "silently score every token as OOV; refit with vocabFit")
    require(rows.forall(r => !r.isNullAt(0) && !r.isNullAt(1)),
      s"loadVocabModel: corrupt model at $dir — NULL term or count")
    rows.map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (t, c) => (-c, t) }
      .map(_._1).toSeq
  }

  /** The APPLY half: per-document token and OOV counts against a FIXED
    * vocabulary — a STATELESS narrow map (one codegen'd hash-set probe
    * per token via [[graft.functions.expressions.OovCount]], the
    * vocabulary riding the plan as a driver parameter), so unlike the
    * relational [[vocabCoverage]] plan (explode + join + re-aggregate)
    * it applies unchanged to a streaming DataFrame and is batch/stream
    * identical by construction (spec-proved through MemoryStream).
    * NULL text counts as a zero-token document (`n_tokens = 0,
    * oov_rate = 0.0` — the vocabCoverage contract). Output matches
    * [[vocabCoverage]] column-for-column: (idCol, n_tokens, n_oov,
    * oov_rate 6dp).
    */
  def oovAgainstVocab(
      docs: DataFrame,
      vocab: Seq[String],
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(vocab.nonEmpty,
      "oovAgainstVocab: empty vocabulary — every token would score OOV; " +
        "fit with vocabFit / load with loadVocabModel")
    docs
      .withColumn("__oov_toks",
        filter(Text.tokens(coalesce(col(textCol), lit(""))),
          t => length(t) > 0))
      .withColumn("n_tokens", size(col("__oov_toks")).cast("long"))
      .withColumn("n_oov",
        TextExpressions.oov_count(col("__oov_toks"), vocab))
      .withColumn("oov_rate",
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise(round(col("n_oov").cast("double") / col("n_tokens"), 6)))
      .select(col(idCol), col("n_tokens"), col("n_oov"), col("oov_rate"))
  }
}
