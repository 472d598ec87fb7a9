package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Text
import graft.functions.expressions.TopKExpressions

/** Keyword and hybrid retrieval over a document corpus — the lookup side of
  * a training-data pipeline (find documents for a probe set, attribute a
  * benchmark answer to its source, build retrieval eval sets).
  *
  * Scale notes (100 TB discipline):
  *  - BM25 never builds a full inverted index as a shuffled intermediate:
  *    postings are FILTERED TO THE QUERY TERMS at the exploded scan (a
  *    broadcast semi-join), so the only wide shuffle is the per-(doc, term)
  *    frequency aggregation over matching postings.
  *  - Document length and corpus stats ride along as narrow columns /
  *    one-row broadcasts — no extra join against the corpus.
  *  - Top-k uses the TopKBy aggregate (map-side k-truncation), never a
  *    window: a common query term can match the whole corpus, and a window
  *    would funnel every candidate's score through one reducer per query.
  *  - Scores are 6dp-rounded per-term contributions summed as DECIMAL, so
  *    the total is exact and association-order-independent — the ranking
  *    (and an external SQL oracle recomputing it) cannot flip on fp
  *    reassociation across partitionings.
  */
object Search {

  /** BM25 top-k keyword retrieval. `queries` is a small table of
    * `(query_id long, qtext string)` (broadcast everywhere — the corpus is
    * the big side). Returns `(query_id, rank, doc_id, score)`, rank 1..k by
    * (score desc, doc_id asc).
    *
    * `excludeSelf` drops the `doc_id == query_id` hit — for related-document
    * retrieval where each query is built from a corpus document.
    */
  def bm25TopK(
      docs: DataFrame,
      queries: DataFrame,
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75,
      excludeSelf: Boolean = false,
      idCol: String = "doc_id",
      textCol: String = "text",
      queryIdCol: String = "query_id",
      queryTextCol: String = "qtext"): DataFrame = {
    val qterms = queries.select(col(queryIdCol).as("query_id"),
      explode(array_distinct(Text.tokens(col(queryTextCol)))).as("tok"))
    // one narrow pass over the corpus: tokenize once, carry the document
    // length on every posting row (no later join back against the corpus),
    // keep only postings matching some query term
    val postings = docs
      .select(col(idCol).as("doc_id"), Text.tokens(col(textCol)).as("__toks"))
      .select(col("doc_id"), size(col("__toks")).cast("double").as("dl"),
        explode(col("__toks")).as("tok"))
      .join(broadcast(qterms.select(col("tok")).distinct()), Seq("tok"), "left_semi")
    val tf = postings.groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).cast("double").as("tf"), first(col("dl")).as("dl"))
    // document frequency over the query terms only — tiny, broadcast back
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).cast("double").as("df"))
    // corpus-level stats are over ALL documents (not just candidates)
    val corpus = docs.select(size(Text.tokens(col(textCol))).cast("double").as("__dl"))
      .agg(count(lit(1)).cast("double").as("n_docs"), avg(col("__dl")).as("avgdl"))
    // per-(query, doc, term) contribution, rounded then summed as decimal —
    // exact, order-independent (see the object scaladoc)
    val contrib = tf
      .join(broadcast(dfreq), Seq("tok"))
      .crossJoin(broadcast(corpus))
      .join(broadcast(qterms), Seq("tok"))
      .withColumn("__w", round(
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))), 6)
        .cast("decimal(18,6)"))
    val perDoc = contrib.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("__w")).as("__dec"))
    val scoped =
      if (excludeSelf) perDoc.filter(col("query_id") =!= col("doc_id")) else perDoc
    topKScored(scoped.select(col("query_id"), col("doc_id"),
      col("__dec").cast("double").as("score")), k)
  }

  /** Reciprocal-rank fusion of ranked runs (each `(query_id, doc_id, rank)`,
    * rank 1-based): fused score = sum over runs of 1/(kRrf + rank), top-k
    * per query. The standard way to combine keyword (BM25) and vector (ANN)
    * retrieval without score calibration — only ranks enter the fusion.
    * Weights are 9dp-rounded and summed as decimal (exact, see scaladoc).
    */
  def rrfFuse(runs: Seq[DataFrame], k: Int, kRrf: Int = 60): DataFrame = {
    require(runs.nonEmpty, "rrfFuse: need at least one run")
    val unioned = runs
      .map(_.select(col("query_id"), col("doc_id"), col("rank")))
      .reduce(_ unionByName _)
    val fused = unioned
      .withColumn("__w",
        round(lit(1.0) / (lit(kRrf.toDouble) + col("rank")), 9).cast("decimal(12,9)"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("__w")).as("__dec"))
      .select(col("query_id"), col("doc_id"), col("__dec").cast("double").as("score"))
    topKScored(fused, k)
  }

  /** Map-side-truncated top-k over `(query_id, doc_id, score)` →
    * `(query_id, rank, doc_id, score)`, rank 1..k by (score desc, doc_id asc).
    */
  private def topKScored(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy(col("query_id"))
      .agg(TopKExpressions.topk_by_scored(col("score"), col("doc_id"), k).as("__top"))
      .select(col("query_id"), posexplode(col("__top")).as(Seq("__pos", "__e")))
      .select(col("query_id"), (col("__pos") + 1).cast("long").as("rank"),
        col("__e.id").as("doc_id"), col("__e.score").as("score"))

  // ===================================================== persisted index ==

  private implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats

  /** Build a PERSISTED inverted index for [[bm25TopKIndexed]] — the text
    * analog of the persisted IVF index: pay the corpus scan once, then
    * every query reads only the index partitions its terms hash to.
    *
    * Layout under `indexDir`:
    *   postings/bucket=N/  parquet (tok, doc_id, tf, dl, df) — partitioned
    *                       by `bucket = xxhash64(tok) % numBuckets`, so a
    *                       query's terms prune to their buckets at planning
    *                       time (PlanShapeSpec pins the PartitionFilters)
    *   stats.json          {nDocs, avgdl, numBuckets} — written LAST via
    *                       atomic rename; its presence seals the index
    *
    * tf/df/dl are integer-valued doubles and avgdl is an exact integer sum
    * over a long count, so indexed scores are BIT-IDENTICAL to
    * [[bm25TopK]]'s — the indexed query stays fully oracled, not
    * rows-only. Pick `numBuckets` for the target corpus: buckets are the
    * probe read granularity (a few hundred at 100 TB keeps each bucket a
    * manageable scan while a 3-term query still reads <= 3/numBuckets of
    * the index).
    */
  def buildTextIndex(
      docs: DataFrame,
      indexDir: String,
      numBuckets: Int = 64,
      idCol: String = "doc_id",
      textCol: String = "text"): Unit = {
    require(numBuckets > 0, "buildTextIndex: numBuckets must be positive")
    val spark = docs.sparkSession
    val base = docs.select(col(idCol).as("doc_id"), Text.tokens(col(textCol)).as("__toks"))
    val postings = base
      .select(col("doc_id"), size(col("__toks")).cast("double").as("dl"),
        explode(col("__toks")).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).cast("double").as("tf"), first(col("dl")).as("dl"))
    val dfreq = postings.groupBy(col("tok")).agg(count(lit(1)).cast("double").as("df"))
    postings.join(dfreq, Seq("tok")) // build-time shuffle on tok, paid once
      .withColumn("bucket", pmod(xxhash64(col("tok")), lit(numBuckets.toLong)).cast("int"))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$indexDir/postings")
    val stats = base.agg(count(lit(1)).as("n"),
      avg(size(col("__toks")).cast("double")).as("avgdl")).head()
    writeStatsJson(spark, s"$indexDir/stats.json",
      s"""{"nDocs": ${stats.getLong(0)}, "avgdl": ${stats.getDouble(1)}, "numBuckets": $numBuckets}""")
  }

  /** BM25 top-k through a [[buildTextIndex]] index: query terms hash to
    * their buckets driver-side (bounded metadata, like the IVF centroid
    * rank) and the postings scan PRUNES to those partitions — each query
    * touches ~|terms|/numBuckets of the index instead of the corpus.
    * Same output contract and BIT-IDENTICAL scores to [[bm25TopK]].
    */
  def bm25TopKIndexed(
      spark: org.apache.spark.sql.SparkSession,
      indexDir: String,
      queries: DataFrame,
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75,
      excludeSelf: Boolean = false,
      queryIdCol: String = "query_id",
      queryTextCol: String = "qtext"): DataFrame = {
    val j = org.json4s.jackson.JsonMethods.parse(
      readStatsJson(spark, s"$indexDir/stats.json"))
    val (nDocs, avgdl, numBuckets) = (for {
      n <- (j \ "nDocs").extractOpt[Long]
      a <- (j \ "avgdl").extractOpt[Double]
      nb <- (j \ "numBuckets").extractOpt[Int]
    } yield (n, a, nb)).getOrElse(throw new IllegalStateException(
      s"unreadable text-index stats at $indexDir/stats.json"))
    val qterms = queries.select(col(queryIdCol).as("query_id"),
      explode(array_distinct(Text.tokens(col(queryTextCol)))).as("tok"))
    // the probe buckets, hashed by the same Spark expression the build
    // used (never a hand-rolled reimplementation of xxhash64)
    val buckets = qterms.select(
        pmod(xxhash64(col("tok")), lit(numBuckets.toLong)).cast("int").as("b"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val postings = spark.read.parquet(s"$indexDir/postings")
      .filter(col("bucket").isin(buckets: _*))
    val contrib = postings
      .join(broadcast(qterms), Seq("tok"))
      .withColumn("__w", round(
        log(lit(1.0) + (lit(nDocs.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(avgdl))), 6)
        .cast("decimal(18,6)"))
    val perDoc = contrib.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("__w")).as("__dec"))
    val scoped =
      if (excludeSelf) perDoc.filter(col("query_id") =!= col("doc_id")) else perDoc
    topKScored(scoped.select(col("query_id"), col("doc_id"),
      col("__dec").cast("double").as("score")), k)
  }

  private def readStatsJson(
      spark: org.apache.spark.sql.SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  private def writeStatsJson(spark: org.apache.spark.sql.SparkSession,
      path: String, json: String): Unit = {
    val dst = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(path + ".tmp")
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(tmp, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    org.apache.hadoop.fs.FileContext
      .getFileContext(dst.toUri, spark.sparkContext.hadoopConfiguration)
      .rename(tmp, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }
}
