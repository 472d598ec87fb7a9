package graft.llmops

import graft.core.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Tombstone deletes on the persisted text index — the reference's
  * Del→tombstone→compaction-purge lifecycle (delete marks at write time,
  * queries subtract at read time, only the bottom-level compaction drops
  * the rows physically). The invariant throughout: indexed BM25 over an
  * index with deletes is BIT-IDENTICAL to the scan form over the
  * remaining corpus.
  */
class TextDeleteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private def queries(rows: (Long, String)*): DataFrame =
    rows.toDF("query_id", "qtext")

  private def rows(df: DataFrame) =
    df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
      r.getAs[Long]("doc_id"), r.getAs[Double]("score"))).toSet

  private val docs = corpus(
    1L -> "apple banana cherry apple",
    2L -> "apple dog echo",
    3L -> "banana fig grape banana banana",
    4L -> "dog echo fig grape",
    5L -> "cherry cherry dog apple fig")
  private val qs = queries(0L -> "apple banana", 1L -> "fig dog", 7L -> "cherry")

  test("delete: indexed scores bit-identical to the scan form over the remaining corpus") {
    val idx = java.nio.file.Files.createTempDirectory("graft-textdel").toString
    Search.buildTextIndex(docs, idx, numBuckets = 8)
    val m0 = Search.readTextManifest(spark, idx).get
    // the sidecar is id-hash partitioned (ps=N dirs) so deletes prune
    // their read instead of scanning the corpus-sized sidecar
    assert(new java.io.File(s"$idx/${m0.docLens.head}").listFiles()
      .exists(_.getName.startsWith("ps=")), "doc-length sidecar lost its ps partitioning")
    assert(Search.deleteFromTextIndex(idx, Seq(2L, 5L).toDF("doc_id")) === 2L)
    val m = Search.readTextManifest(spark, idx).get
    assert(m.nDeleted === 2L && m.tombs.size === 1)
    // deleting changes EVERY doc's score (nDocs and avgdl shift), so the
    // identity below exercises the full stats correction, not just the
    // dropped rows
    val remaining = docs.filter(!col("doc_id").isin(2L, 5L))
    assert(rows(Search.bm25TopKIndexed(spark, idx, qs, k = 5)) ===
      rows(Search.bm25TopK(remaining, qs, k = 5)))
  }

  test("delete: idempotent replays and unknown ids change nothing and write nothing") {
    val idx = java.nio.file.Files.createTempDirectory("graft-textdel-idem").toString
    Search.buildTextIndex(docs, idx, numBuckets = 8)
    assert(Search.deleteFromTextIndex(idx, Seq(3L).toDF("doc_id")) === 1L)
    val m1 = Search.readTextManifest(spark, idx).get
    // replayed delete and never-indexed ids: 0 newly deleted, no new
    // tombstone root, stats untouched
    assert(Search.deleteFromTextIndex(idx, Seq(3L).toDF("doc_id")) === 0L)
    assert(Search.deleteFromTextIndex(idx, Seq(99L, -1L).toDF("doc_id")) === 0L)
    assert(Search.readTextManifest(spark, idx).get === m1)
    // a mixed batch counts only the genuinely new victim
    assert(Search.deleteFromTextIndex(idx, Seq(3L, 4L, 99L).toDF("doc_id")) === 1L)
    val m2 = Search.readTextManifest(spark, idx).get
    assert(m2.nDeleted === 2L && m2.tombs.size === 2)
    assert(rows(Search.bm25TopKIndexed(spark, idx, qs, k = 5)) ===
      rows(Search.bm25TopK(docs.filter(!col("doc_id").isin(3L, 4L)), qs, k = 5)))
  }

  test("delete: an empty-text doc still corrects nDocs exactly (idf shifts for every query)") {
    val withEmpty = docs.unionByName(corpus(6L -> ""))
    val idx = java.nio.file.Files.createTempDirectory("graft-textdel-empty").toString
    Search.buildTextIndex(withEmpty, idx, numBuckets = 8)
    // the tokenizer maps "" to a single empty token (dl = 1, one postings
    // row for tok "") — what matters is that BOTH forms see the same
    // corpus stats, so deleting the doc shifts nDocs/avgdl (idf) for
    // every scored document identically on each side
    assert(Search.deleteFromTextIndex(idx, Seq(6L).toDF("doc_id")) === 1L)
    val m = Search.readTextManifest(spark, idx).get
    assert(m.nDeleted === 1L && m.sumDlDeleted === 1L)
    assert(rows(Search.bm25TopKIndexed(spark, idx, qs, k = 5)) ===
      rows(Search.bm25TopK(docs, qs, k = 5)))
  }

  test("delete survives minor folds verbatim; the major fold purges physically") {
    val idx = java.nio.file.Files.createTempDirectory("graft-textdel-fold").toString
    Search.buildTextIndex(corpus(1L -> "apple banana cherry apple",
      2L -> "apple dog echo"), idx, numBuckets = 8)
    assert(Search.appendToTextIndex(idx,
      corpus(3L -> "banana fig grape banana banana"), batchTag = Some("0")))
    assert(Search.appendToTextIndex(idx,
      corpus(4L -> "dog echo fig grape"), batchTag = Some("1")))
    assert(Search.appendToTextIndex(idx,
      corpus(5L -> "cherry cherry dog apple fig"), batchTag = Some("2")))
    assert(Search.deleteFromTextIndex(idx, Seq(1L, 4L).toDF("doc_id")) === 2L)
    val remaining = docs.filter(!col("doc_id").isin(1L, 4L))
    val expected = rows(Search.bm25TopK(remaining, qs, k = 5))
    assert(rows(Search.bm25TopKIndexed(spark, idx, qs, k = 5)) === expected)
    // minor fold: L0s fold, dead rows carried VERBATIM (tombstones drop
    // only at the bottom level), scores unchanged
    assert(Search.compactTextIndex(spark, idx, includeBase = false))
    val mMinor = Search.readTextManifest(spark, idx).get
    assert(mMinor.tombs.size === 1 && mMinor.nDeleted === 2L)
    assert(rows(Search.bm25TopKIndexed(spark, idx, qs, k = 5)) === expected)
    // major fold: tombstoned postings physically dropped, dict recomputed,
    // sidecar folded, stats absorbed, tombstones cleared
    assert(Search.compactTextIndex(spark, idx))
    val mMajor = Search.readTextManifest(spark, idx).get
    assert(mMajor.tombs.isEmpty && mMajor.nDeleted === 0L && mMajor.sumDlDeleted === 0L)
    assert(mMajor.nDocs === 3L && mMajor.docLens.size === 1)
    assert(rows(Search.bm25TopKIndexed(spark, idx, qs, k = 5)) === expected)
    // the purge is physical: no postings row carries a dead id, and the
    // sidecar no longer lists them
    val deadInPostings = Search.readTextManifest(spark, idx).get.postings
      .map(p => spark.read.parquet(s"$idx/$p"))
      .reduce(_ unionByName _).filter(col("doc_id").isin(1L, 4L)).count()
    assert(deadInPostings === 0L)
    // deleted ids may re-enter the corpus once the tombstone is purged
    assert(Search.appendToTextIndex(idx, corpus(1L -> "apple kiwi"), batchTag = Some("9")))
    assert(rows(Search.bm25TopKIndexed(spark, idx, qs, k = 5)) ===
      rows(Search.bm25TopK(remaining.unionByName(corpus(1L -> "apple kiwi")), qs, k = 5)))
  }

  test("delete then append of OTHER docs: identities hold across the interleave") {
    val idx = java.nio.file.Files.createTempDirectory("graft-textdel-mix").toString
    Search.buildTextIndex(docs, idx, numBuckets = 8)
    assert(Search.deleteFromTextIndex(idx, Seq(2L).toDF("doc_id")) === 1L)
    assert(Search.appendToTextIndex(idx, corpus(6L -> "apple zebra dog"), batchTag = Some("0")))
    val live = docs.filter(col("doc_id") =!= 2L)
      .unionByName(corpus(6L -> "apple zebra dog"))
    assert(rows(Search.bm25TopKIndexed(spark, idx, qs, k = 5)) ===
      rows(Search.bm25TopK(live, qs, k = 5)))
    // a tombstoned id appended again BEFORE the purge stays dead at read
    // (the documented LSM contract: the tombstone wins until a major fold)
    assert(Search.appendToTextIndex(idx, corpus(2L -> "apple apple apple"), batchTag = Some("1")))
    val hits = Search.bm25TopKIndexed(spark, idx, queries(0L -> "apple"), k = 10)
      .collect().map(_.getAs[Long]("doc_id"))
    assert(!hits.contains(2L))
  }

  test("deleting every document leaves a queryable empty index") {
    val idx = java.nio.file.Files.createTempDirectory("graft-textdel-all").toString
    Search.buildTextIndex(docs, idx, numBuckets = 8)
    assert(Search.deleteFromTextIndex(idx, docs.select("doc_id")) === 5L)
    assert(Search.bm25TopKIndexed(spark, idx, qs, k = 5).count() === 0L)
    assert(Search.compactTextIndex(spark, idx)) // purge runs clean
    val m = Search.readTextManifest(spark, idx).get
    assert(m.nDocs === 0L && m.sumDl === 0L && m.tombs.isEmpty)
    assert(Search.bm25TopKIndexed(spark, idx, qs, k = 5).count() === 0L)
  }

  test("cross-process guard: a delete staged against a stale manifest aborts and cleans up") {
    val idx = java.nio.file.Files.createTempDirectory("graft-textdel-xproc").toString
    Search.buildTextIndex(docs, idx, numBuckets = 8)
    val stale = Search.readTextManifest(spark, idx).get
    // a "foreign" writer moves the manifest after our snapshot
    assert(Search.appendToTextIndex(idx, corpus(6L -> "apple zebra"), batchTag = Some("f0")))
    // replaying the foreign state behind deleteFromTextIndex's back:
    // fabricate the race by restoring the stale manifest read — instead,
    // drive the real path: monkey-level interleaving isn't reachable
    // through the public API in-process (the lock serializes), so assert
    // the guard through the commit primitive the delete uses
    val e = intercept[IllegalStateException] {
      Search.commitTextIfUnchanged(spark, idx, Some(stale),
        stale.copy(nDeleted = 1L))
    }
    assert(e.getMessage.contains("concurrent"))
    // the index remains exactly the foreign writer's state
    val m = Search.readTextManifest(spark, idx).get
    assert(m.nDocs === 6L && m.nDeleted === 0L)
    // no tombs- orphans linger after a real delete on the CURRENT state
    assert(Search.deleteFromTextIndex(idx, Seq(6L).toDF("doc_id")) === 1L)
    assert(Search.vacuumTextIndex(spark, idx, minAgeMs = 0L) === 0)
  }

  test("delete refuses an index without full doc-length coverage (legacy base)") {
    val idx = java.nio.file.Files.createTempDirectory("graft-textdel-legacy").toString
    Search.buildTextIndex(docs, idx, numBuckets = 8)
    val m = Search.readTextManifest(spark, idx).get
    // simulate a pre-sidecar manifest: coverage flag off
    Search.commitTextIfUnchanged(spark, idx, Some(m), m.copy(docLensFull = false))
    val e = intercept[IllegalStateException] {
      Search.deleteFromTextIndex(idx, Seq(1L).toDF("doc_id"))
    }
    assert(e.getMessage.contains("docLensFull"))
  }

  test("maintainTextIndex purges once the dead fraction crosses deadRatio") {
    val idx = java.nio.file.Files.createTempDirectory("graft-textdel-maint").toString
    Search.buildTextIndex(docs, idx, numBuckets = 8)
    // 1 of 5 dead: below the 0.25 default, no fold of any kind runs
    assert(Search.deleteFromTextIndex(idx, Seq(2L).toDF("doc_id")) === 1L)
    assert(!Search.maintainTextIndex(spark, idx))
    assert(Search.readTextManifest(spark, idx).get.tombs.nonEmpty)
    // 2 of 5 dead: the dead-ratio trigger fires a major fold (no appends
    // ever happened, so the size-ratio trigger alone would never purge)
    assert(Search.deleteFromTextIndex(idx, Seq(5L).toDF("doc_id")) === 1L)
    assert(Search.maintainTextIndex(spark, idx))
    val m = Search.readTextManifest(spark, idx).get
    assert(m.tombs.isEmpty && m.nDeleted === 0L && m.nDocs === 3L)
    assert(rows(Search.bm25TopKIndexed(spark, idx, qs, k = 5)) ===
      rows(Search.bm25TopK(docs.filter(!col("doc_id").isin(2L, 5L)), qs, k = 5)))
  }

  test("CDC stream: interleaved set/del micro-batches replay into an exact index") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val idx = java.nio.file.Files.createTempDirectory("graft-textdel-cdc").toString
    Search.buildTextIndex(corpus(), idx, numBuckets = 8) // empty start state
    val mem = MemoryStream[(String, Long, String)]
    val ops = mem.toDF().select(col("_1").as("op"), col("_2").as("doc_id"), col("_3").as("text"))
    val q = graft.streaming.EventStream.ingestCdcToTextIndex(ops, idx,
      java.nio.file.Files.createTempDirectory("graft-textdel-cdc-ckpt").toString)
    try {
      // batch 0: three adds
      mem.addData(("set", 1L, "apple banana cherry"), ("set", 2L, "apple dog echo"),
        ("set", 3L, "banana fig grape"))
      q.processAllAvailable()
      // batch 1: one add, one delete of a prior doc
      mem.addData(("set", 4L, "dog cherry fig"), ("del", 2L, ""))
      q.processAllAvailable()
      // batch 2: a doc set and deleted in the SAME batch — del wins
      mem.addData(("set", 5L, "apple zebra"), ("del", 5L, ""), ("del", 99L, ""))
      q.processAllAvailable()
    } finally q.stop()
    val net = corpus(1L -> "apple banana cherry", 3L -> "banana fig grape",
      4L -> "dog cherry fig")
    // net-effect identity... but note nDocs counts doc 5 as added+deleted,
    // which the stats correction handles exactly (append then tombstone)
    assert(rows(Search.bm25TopKIndexed(spark, idx, qs, k = 5)) ===
      rows(Search.bm25TopK(net, qs, k = 5)))
    val m = Search.readTextManifest(spark, idx).get
    assert(m.nDeleted === 2L && m.tagHighWater === 2L)
    // the purge converges to the same answers
    assert(Search.compactTextIndex(spark, idx))
    assert(rows(Search.bm25TopKIndexed(spark, idx, qs, k = 5)) ===
      rows(Search.bm25TopK(net, qs, k = 5)))
  }

  test("randomized append/delete/fold/vacuum interleavings stay bit-identical (seeded fuzz)") {
    // the delete lifecycle's strongest evidence: ANY interleaving of
    // appends, deletes (of live, dead, and unknown ids), minor folds,
    // major folds (the purge), and vacuums must keep indexed BM25
    // bit-identical to the scan form over the model's live corpus
    val rnd = new scala.util.Random(4242)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa")
    def randText() = Seq.fill(3 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val idx = java.nio.file.Files.createTempDirectory("graft-textdel-fuzz").toString
    var model = Map.empty[Long, String] // the live corpus a scan would see
    var everLive = Set.empty[Long]      // ids whose re-add would violate the contract
    var nextId = 0L
    Search.buildTextIndex(corpus(), idx, numBuckets = 8)
    val qs = queries(0L -> "alpha beta", 1L -> "kappa gamma delta", 2L -> "theta")
    (0 until 14).foreach { step =>
      rnd.nextInt(5) match {
        case 0 | 1 => // append a fresh batch of brand-new ids
          val docs = (0 until 1 + rnd.nextInt(4)).map { _ =>
            val id = nextId; nextId += 1; id -> randText()
          }
          model ++= docs; everLive ++= docs.map(_._1)
          assert(Search.appendToTextIndex(idx, corpus(docs: _*), batchTag = Some(s"fz-$step")))
        case 2 => // delete a mix of live, already-dead, and unknown ids
          val live = model.keys.toVector
          val victims = (rnd.shuffle(live).take(rnd.nextInt(3)) ++
            rnd.shuffle(everLive.toVector).take(rnd.nextInt(2)) :+ (9000L + step)).distinct
          val expectNew = victims.count(model.contains)
          assert(Search.deleteFromTextIndex(idx, victims.toDF("doc_id")) === expectNew.toLong)
          model --= victims
        case 3 =>
          Search.compactTextIndex(spark, idx, includeBase = rnd.nextBoolean())
        case 4 =>
          Search.vacuumTextIndex(spark, idx, minAgeMs = 0L)
      }
      assert(rows(Search.bm25TopKIndexed(spark, idx, qs, k = 8)) ===
        rows(Search.bm25TopK(corpus(model.toSeq: _*), qs, k = 8)),
        s"diverged from the scan form after step $step")
    }
    // final manifest sanity: totals reconcile with the model
    val m = Search.readTextManifest(spark, idx).get
    assert(m.nDocs - m.nDeleted === model.size.toLong)
  }

  test("vacuum spares live tombstones/sidecars and reclaims them after the purge") {
    val idx = java.nio.file.Files.createTempDirectory("graft-textdel-vac").toString
    Search.buildTextIndex(docs, idx, numBuckets = 8)
    assert(Search.deleteFromTextIndex(idx, Seq(2L).toDF("doc_id")) === 1L)
    // everything referenced: nothing to reclaim even with no age grace
    assert(Search.vacuumTextIndex(spark, idx, minAgeMs = 0L) === 0)
    val expected = rows(Search.bm25TopKIndexed(spark, idx, qs, k = 5))
    // the major fold supersedes the old roots AND the tombstone/sidecar
    assert(Search.compactTextIndex(spark, idx))
    assert(Search.vacuumTextIndex(spark, idx, minAgeMs = 0L) > 0)
    assert(rows(Search.bm25TopKIndexed(spark, idx, qs, k = 5)) === expected)
  }
}
