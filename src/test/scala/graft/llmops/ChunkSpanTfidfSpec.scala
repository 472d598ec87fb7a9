package graft.llmops

import graft.core.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-checkable semantics for the round's pipeline additions: sliding-
  * window chunking, cross-doc duplicated-span stats, per-doc TF-IDF
  * keywords.
  */
class ChunkSpanTfidfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("chunkDocuments: windows cover every token, overlap by chunk-stride, clip at the end") {
    // 10 tokens, chunk 4, stride 2 -> starts 0,2,4,6 (6+4 >= 10 stops it)
    val docs = Seq((1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9")).toDF("doc_id", "text")
    val out = Curation.chunkDocuments(docs, chunkTokens = 4, strideTokens = 2)
      .orderBy("chunk_id").collect()
    assert(out.map(_.getAs[Long]("chunk_id")).toSeq === Seq(0L, 1L, 2L, 3L))
    assert(out.map(_.getAs[String]("chunk_text")).toSeq === Seq(
      "t0 t1 t2 t3", "t2 t3 t4 t5", "t4 t5 t6 t7", "t6 t7 t8 t9"))
    assert(out.map(_.getAs[Long]("chunk_tokens")).forall(_ === 4L))
    // ragged end: 9 tokens -> last chunk starts at 6 with 3 tokens
    val ragged = Curation.chunkDocuments(
        Seq((2L, "t0 t1 t2 t3 t4 t5 t6 t7 t8")).toDF("doc_id", "text"),
        chunkTokens = 4, strideTokens = 3)
      .orderBy("chunk_id").collect()
    assert(ragged.map(r => (r.getAs[String]("chunk_text"), r.getAs[Long]("chunk_tokens"))).toSeq
      === Seq(("t0 t1 t2 t3", 4L), ("t3 t4 t5 t6", 4L), ("t6 t7 t8", 3L)))
    // a doc shorter than one chunk is exactly one (clipped) chunk
    val short = Curation.chunkDocuments(
        Seq((3L, "a b")).toDF("doc_id", "text"), chunkTokens = 8, strideTokens = 8)
      .collect()
    assert(short.length === 1 &&
      short.head.getAs[String]("chunk_text") === "a b" &&
      short.head.getAs[Long]("chunk_tokens") === 2L)
  }

  test("dupSpanStats: shared spans count once per doc, unshared docs report zero") {
    val docs = Seq(
      (1L, "alpha beta gamma delta one two"),   // shares "alpha beta gamma delta" with 2
      (2L, "alpha beta gamma delta three four"),
      (3L, "five six seven eight nine ten"),    // nothing shared
      (4L, "x y"),                              // short doc: whole-doc span
      (5L, "x y")                               // identical short doc: shared
    ).toDF("doc_id", "text")
    val out = Dedup.dupSpanStats(docs, width = 4).orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_spans"),
        r.getAs[Long]("n_dup_spans"), r.getAs[Double]("dup_frac"))).toSeq
    // docs 1/2: 3 distinct spans each, exactly one shared ("alpha beta
    // gamma delta"); doc 3: 3 spans none shared; docs 4/5 are shorter
    // than the width, so each contributes its WHOLE text as one span
    // (WordShingles' short-doc fallback) — identical short docs still
    // register as duplicated
    assert(out === Seq(
      (1L, 3L, 1L, 0.333333),
      (2L, 3L, 1L, 0.333333),
      (3L, 3L, 0L, 0.0),
      (4L, 1L, 1L, 1.0),
      (5L, 1L, 1L, 1.0)))
  }

  test("dupSpanStats: within-doc repetition alone is not cross-doc duplication") {
    // the repeated span sits twice in ONE doc only — distinct-per-doc
    // shingling must not call it duplicated
    val docs = Seq(
      (1L, "a b c d a b c d"),
      (2L, "e f g h i j")).toDF("doc_id", "text")
    val out = Dedup.dupSpanStats(docs, width = 4).orderBy("doc_id").collect()
    assert(out.map(_.getAs[Long]("n_dup_spans")).toSeq === Seq(0L, 0L))
  }

  test("tfidfTopTerms: rare distinguishing terms outrank ubiquitous ones") {
    val docs = Seq(
      (1L, "apple apple common"),
      (2L, "banana common common"),
      (3L, "cherry common fig")).toDF("doc_id", "text")
    val out = Search.tfidfTopTerms(docs, k = 2).orderBy("doc_id", "rank").collect()
    // "common" is in all 3 docs (idf = ln(4/4) = 0) — it can never beat a
    // doc-unique term (idf = ln(4/2) > 0)
    val top1 = out.filter(_.getAs[Long]("rank") == 1L)
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("tok")).toMap
    assert(top1 === Map(1L -> "apple", 2L -> "banana", 3L -> "cherry"))
    // ranks are 1..k, scores non-increasing within a doc
    val doc1 = out.filter(_.getAs[Long]("doc_id") == 1L)
    assert(doc1.map(_.getAs[Long]("rank")).toSeq === Seq(1L, 2L))
    val s = doc1.map(_.getAs[Double]("score"))
    assert(s.zip(s.tail).forall { case (a, b) => a >= b })
  }

  test("tfidfTopTerms: ties break by term for a deterministic ranking") {
    val docs = Seq((1L, "zeta alpha"), (2L, "other text")).toDF("doc_id", "text")
    // both terms of doc 1: tf=1, df=1 -> equal scores; alpha must rank 1
    val out = Search.tfidfTopTerms(docs, k = 2)
      .filter(col("doc_id") === 1L).orderBy("rank").collect()
    assert(out.map(_.getAs[String]("tok")).toSeq === Seq("alpha", "zeta"))
  }
}
