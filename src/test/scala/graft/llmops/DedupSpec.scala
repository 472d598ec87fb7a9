package graft.llmops

import graft.core.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Direct operator tests for the skew guards — the Catalog recall gates
  * certify end-to-end recall, but the guard-tripping path (over-full
  * buckets dropped) only fires on degenerate corpora the test data
  * doesn't contain, so it needs purpose-built inputs.
  */
class DedupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // 12 identical documents: every signature identical, so every band
  // bucket holds all 12 docs — the degenerate corpus the caps exist for
  private def identicalDocs = (0L until 12L)
    .map(i => (i, "the quick brown fox jumps over the lazy dog again and again"))
    .toDF("doc_id", "text")

  test("simhashOverflowBands surfaces exactly the buckets the guard would drop") {
    // cap below the bucket size: all 4 bands of the shared signature overflow
    val over = Dedup.simhashOverflowBands(identicalDocs, maxBucketSize = 5).collect()
    assert(over.length == 4, s"expected 4 over-full bands, got ${over.length}")
    assert(over.forall(_.getLong(1) == 12L))
    // cap above: no overflow, the exactness claim holds unconditionally
    assert(Dedup.simhashOverflowBands(identicalDocs, maxBucketSize = 50).isEmpty)
  }

  test("simhashPairs skew cap drops over-full buckets; uncapped finds all pairs") {
    // capped: every band bucket is over-full and dropped -> no candidates.
    // This is the documented recall loss simhashOverflowBands warns about.
    assert(Dedup.simhashPairs(identicalDocs, maxHamming = 3, maxBucketSize = 5).count() == 0L)
    // uncapped: all 12*11/2 identical pairs at hamming 0
    val pairs = Dedup.simhashPairs(identicalDocs, maxHamming = 3, maxBucketSize = 50).collect()
    assert(pairs.length == 66)
    assert(pairs.forall(r => r.getAs[Number]("hamming").longValue == 0L))
  }

  test("minhashLshPairs skew cap drops over-full band buckets; uncapped verifies all pairs") {
    assert(Dedup.minhashLshPairs(identicalDocs, threshold = 0.8, maxBucketSize = 5).count() == 0L)
    val pairs = Dedup.minhashLshPairs(identicalDocs, threshold = 0.8, maxBucketSize = 50).collect()
    assert(pairs.length == 66)
    assert(pairs.forall(_.getAs[Double]("jaccard") == 1.0))
  }

  test("exactSetJaccardPairs candidate aggregation equals the declared pair semantics") {
    // mixed corpus: two near-dup clusters + singletons, one group
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon eta"),    // ~0.71 vs 1 — below 0.8
      (3L, "alpha beta gamma delta epsilon zeta"),   // exact dup of 1
      (4L, "one two three four five six seven"),
      (5L, "one two three four five six seven"),     // exact dup of 4
      (6L, "totally unrelated words here entirely")
    ).toDF("doc_id", "text")
    val got = Dedup.jaccardPairsWithin(docs.withColumn("source", lit("g")), "source", 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 3L), (4L, 5L)), s"unexpected pair set: $got")
  }

  test("jaccardJoin pairs cross-table only and matches the brute-force truth") {
    val rnd = new scala.util.Random(13)
    val vocab = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    def corpus(n: Int) = Seq.tabulate(n) { i =>
      (i.toLong, Seq.fill(5 + rnd.nextInt(4))(vocab(rnd.nextInt(vocab.length)))
        .mkString(" "))
    }
    val lRows = corpus(40); val rRows = corpus(35)
    val l = lRows.toDF("doc_id", "text"); val r = rRows.toDF("doc_id", "text")
    val got = Dedup.jaccardJoin(l, r, threshold = 0.6)
      .select("left_id", "right_id").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    def toks(t: String) = t.split("\\s+").toSet
    val want = (for {
      (li, lt) <- lRows; (ri, rt) <- rRows
      inter = (toks(lt) & toks(rt)).size.toDouble
      j = inter / (toks(lt).size + toks(rt).size - inter)
      if j >= 0.6
    } yield (li, ri)).toSet
    assert(want.nonEmpty, "fixture produced no qualifying pairs")
    assert(got == want, s"join diverged:\ngot:  $got\nwant: $want")
    // ids overlap between the tables; no within-side pair may leak
    assert(got.forall { case (a, b) => lRows.exists(_._1 == a) && rRows.exists(_._1 == b) })
  }

  test("jaccardJoin decodes doc ids exactly above 2^52 (integer, not double, arithmetic)") {
    // double division loses exactness past 2^52; the decode must use
    // shiftright so ids up to the documented 2^62 round-trip bit-exact
    val big = (1L << 60) + 12345L
    val l = Seq((big, "alpha beta gamma delta")).toDF("doc_id", "text")
    val r = Seq((big + 1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val got = Dedup.jaccardJoin(l, r, threshold = 0.9)
      .select("left_id", "right_id").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(got == Seq((big, big + 1L)), s"large ids corrupted in decode: $got")
  }

  test("exactSetJaccardPairs sub-partitions hot buckets without losing a pair") {
    // degenerate corpus: 60 exact near-dup survivors of one text — every
    // prefix token lands all 60 ids in the SAME (g, tok) bucket, the B^2
    // hazard the chunk split exists for. Unlike the minhash/simhash DROP
    // caps, exactness must survive: a tiny cap (forcing many chunks) and a
    // huge cap (single-group fast path) must produce the IDENTICAL
    // all-pairs answer.
    val hot = (0L until 60L)
      .map(i => (1, i, Seq("aardvark", "quetzal", "xylophone", "zephyr")))
      .toDF("g", "id", "ts")
    val expected = (for {
      a <- 0L until 60L; b <- (a + 1) until 60L
    } yield (a, b)).toSet
    for (cap <- Seq(7, 100000)) {
      val got = Dedup.exactSetJaccardPairs(hot, threshold = 0.8, maxBucketSize = cap)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected, s"cap=$cap: ${got.size} pairs, expected ${expected.size}")
    }
    // and a mixed corpus (hot cluster + normal rows) keeps exactness across
    // the chunked and unchunked paths too
    val mixed = hot.unionByName(Seq(
      (1, 100L, Seq("alpha", "beta", "delta", "gamma")),    // sorted-distinct,
      (1, 101L, Seq("alpha", "beta", "delta", "gamma")),    // as the contract
      (1, 102L, Seq("entirely", "other", "unrelated", "words")) // requires
    ).toDF("g", "id", "ts"))
    val gotSmall = Dedup.exactSetJaccardPairs(mixed, 0.8, maxBucketSize = 7)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val gotBig = Dedup.exactSetJaccardPairs(mixed, 0.8, maxBucketSize = 100000)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotSmall == gotBig && gotSmall == expected + ((100L, 101L)),
      s"mixed: small=${gotSmall.size} big=${gotBig.size}")
  }

  test("paragraphDedup keeps first occurrence corpus-wide and reassembles in order") {
    val docs = Seq(
      (1L, "alpha one\nshared boiler\nalpha two"),
      (2L, "shared boiler\nbeta one"),          // loses its copy to doc 1
      (3L, "shared boiler"),                    // every unit lost -> empty
      (4L, ""),                                 // no units at all
      (5L, "gamma\ngamma\ngamma only here")     // intra-doc dup: keep pos 0
    ).toDF("doc_id", "text")
    val got = Dedup.paragraphDedup(docs).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got === Array(
      (1L, 3L, 3L, "alpha one\nshared boiler\nalpha two"),
      (2L, 2L, 1L, "beta one"),
      (3L, 1L, 0L, ""),
      (4L, 0L, 0L, ""),
      (5L, 3L, 2L, "gamma\ngamma only here")))
  }

  test("splitUnits trims, drops empty segments, and renumbers positions") {
    val docs = Seq((7L, "  a  \n\n\n b \nc  ")).toDF("doc_id", "text")
    val got = Dedup.splitUnits(docs).orderBy("pos")
      .collect().map(r => (r.getLong(1), r.getString(2)))
    assert(got === Array((0L, "a"), (1L, "b"), (2L, "c")))
  }

  test("unitDedupKeepFirst winner is min (id, pos) lexicographic") {
    val units = Seq(
      (9L, 0L, "u"), (2L, 5L, "u"), (2L, 1L, "u"), (9L, 1L, "v")
    ).toDF("doc_id", "pos", "unit")
    val got = Dedup.unitDedupKeepFirst(units)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got === Set((2L, 1L, "u"), (9L, 1L, "v")))
  }

  // two tight, well-separated direction groups: k-means k=2 must split
  // them, and the within-group cosines all clear 0.95 while cross-group
  // cosines are near 0
  private def semanticEmb = Seq(
    (1L, Array(1.00f, 0.010f)),
    (2L, Array(0.99f, 0.012f)),
    (3L, Array(0.90f, 0.150f)),   // least prototypical of group X
    (10L, Array(0.01f, 1.00f)),
    (11L, Array(0.15f, 0.95f))    // least prototypical of group Y
  ).toDF("vec_id", "embedding")

  test("semanticDedup: one survivor per cluster, low-centroid-sim keep rule, min-id labels") {
    val out = Dedup.semanticDedup(semanticEmb, threshold = 0.95, numCells = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    // cluster_id = lowest member id; keep = member farthest (in cosine)
    // from its cell centroid: x3 for group X, y2 for group Y
    assert(out == Set(
      (1L, 1L, false), (2L, 1L, false), (3L, 1L, true),
      (10L, 10L, false), (11L, 10L, true)), s"unexpected: $out")
  }

  test("semanticDedup: a singleton keeps itself and labels itself") {
    val emb = semanticEmb.union(Seq((20L, Array(-1.0f, -1.0f))).toDF("vec_id", "embedding"))
    val row = Dedup.semanticDedup(emb, threshold = 0.95, numCells = 3)
      .filter(col("vec_id") === 20L).collect()
    assert(row.length == 1 && row(0).getLong(1) == 20L && row(0).getBoolean(2))
  }

  test("semanticPairs chunk-split equals the plain within-cell join") {
    // 40 vectors in 2 direction groups with jittered components so cells
    // are over-full at cap 3: the chunk-split construction must produce
    // EXACTLY the plain join's pair set (exactness-preserving skew guard)
    val rnd = new scala.util.Random(7)
    val emb = (0L until 40L).map { i =>
      val base = if (i % 2 == 0) Array(1.0f, 0.0f, 0.2f) else Array(0.0f, 1.0f, 0.2f)
      (i, base.map(v => v + rnd.nextFloat() * 0.2f))
    }.toDF("vec_id", "embedding")
    def pairs(cap: Int) = Dedup.semanticPairs(emb, threshold = 0.9,
        numCells = 2, maxCellSize = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val split = pairs(3)
    val plain = pairs(1000)
    assert(split == plain, s"chunk-split changed the pair set: " +
      s"missing=${plain -- split} extra=${split -- plain}")
    assert(plain.nonEmpty && plain.forall { case (a, b) => a < b })
  }

  test("semanticPairs plan has no cartesian product at any cap") {
    for (cap <- Seq(2, 1000)) {
      val p = Dedup.semanticPairs(semanticEmb, threshold = 0.95,
        numCells = 2, maxCellSize = cap).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
        s"cap=$cap plan went all-pairs:\n${p.take(1200)}")
    }
  }

  // ---- removeDupSpans -------------------------------------------------

  /** Sequential model of removeDupSpans: positioned width-spans, global
    * keep-first by (doc, pos), overlapping duplicate spans mark token
    * positions, survivors reassemble in order.
    */
  private def spanModel(docs: Seq[(Long, String)], width: Int)
      : Seq[(Long, Long, Long, String)] = {
    val toks = docs.map { case (id, tx) =>
      id -> tx.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq
    }
    val occ = for {
      (id, ts) <- toks; p <- 0 to ts.length - width
    } yield (ts.slice(p, p + width).mkString(" "), id, p)
    val bypos = occ.groupBy(_._1).values.flatMap { os =>
      if (os.size < 2) Nil
      else os.sortBy(o => (o._2, o._3)).tail // all but the first occurrence
    }
    val removed = bypos.flatMap { case (_, id, p) =>
      (p until p + width).map(i => (id, i)) }.toSet
    toks.map { case (id, ts) =>
      val kept = ts.zipWithIndex.collect {
        case (t, i) if !removed((id, i)) => t }
      (id, ts.length.toLong, (ts.length - kept.length).toLong,
        kept.mkString(" "))
    }.sortBy(_._1)
  }

  test("removeDupSpans cuts repeated spans everywhere but their first occurrence") {
    val docs = Seq(
      (1L, "a b c d e"),      // first occurrence of "a b c d": kept whole
      (2L, "x a b c d"),      // repeat -> loses positions 1..4, keeps "x"
      (3L, "a b c"),          // shorter than width: untouched
      (4L, ""))               // empty doc: zero tokens
    val got = Dedup.removeDupSpans(docs.toDF("doc_id", "text"), width = 4)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 5L, 0L, "a b c d e"),
      (2L, 5L, 4L, "x"),
      (3L, 3L, 0L, "a b c"),
      (4L, 0L, 0L, "")))
    assert(got == spanModel(docs, 4))
  }

  test("removeDupSpans: overlapping duplicate spans merge into one removed range") {
    // "p q p q p q" repeats "p q p q" at positions 0 and 2 of doc 6;
    // doc 5 holds the first occurrence. Overlap must not double-count.
    val docs = Seq((5L, "p q p q"), (6L, "p q p q p q"))
    val got = Dedup.removeDupSpans(docs.toDF("doc_id", "text"), width = 4)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == spanModel(docs, 4))
    assert(got(1)._3 == 6L && got(1)._4 == "") // doc 6 fully covered
  }

  test("removeDupSpans matches the sequential model on random corpora") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 8) {
      val width = 2 + rnd.nextInt(2)
      val docs = (1L to 12L).map { id =>
        val n = rnd.nextInt(12)
        (id, (1 to n).map(_ => ('a' + rnd.nextInt(4)).toChar.toString)
          .mkString(" "))
      }
      val got = Dedup.removeDupSpans(
          docs.toDF("doc_id", "text").repartition(5), width = width)
        .orderBy("doc_id")
        .as[(Long, Long, Long, String)].collect().toSeq
      assert(got == spanModel(docs, width),
        s"trial $trial (width=$width) diverged from the model")
    }
  }

  // --- boilerplate removal (CCNet-style document-frequency threshold) ---

  private def unitRows(rows: (Long, Long, String)*) =
    rows.toDF("doc_id", "pos", "unit")

  test("boilerplateUnits: absolute and fractional thresholds compose as max") {
    val ids = (0L until 10L).toDF("doc_id")
    // "banner" in 4 docs (twice in doc 0 — per-doc repeats must not
    // inflate doc_freq), "rare" in 2, "once" in 1
    val units = unitRows(
      (0L, 0L, "banner"), (0L, 1L, "banner"), (1L, 0L, "banner"),
      (2L, 0L, "banner"), (3L, 0L, "banner"),
      (4L, 0L, "rare"), (5L, 0L, "rare"), (6L, 0L, "once"))
    // frac 0.35 of 10 docs -> ceil(3.5) = 4 beats minDocs=2
    val bp = Dedup.boilerplateUnits(ids, units, minDocFrac = 0.35, minDocs = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(bp.toSeq == Seq(("banner", 4L)))
    // minDocs=2 with a vacuous frac: "rare" joins the set
    val bp2 = Dedup.boilerplateUnits(ids, units, minDocFrac = 0.0, minDocs = 2)
      .collect().map(_.getString(0)).sorted
    assert(bp2.toSeq == Seq("banner", "rare"))
  }

  test("removeBoilerplate strips EVERY occurrence (keep-first would spare the first)") {
    val ids = (0L until 4L).toDF("doc_id")
    val units = unitRows(
      (0L, 0L, "banner"), (0L, 1L, "body zero"),
      (1L, 0L, "banner"), (1L, 1L, "body one"),
      (2L, 0L, "banner"),
      (3L, 0L, "body three"))
    val got = Dedup.removeBoilerplate(ids, units,
        minDocFrac = 0.0, minDocs = 3, joinSep = " | ")
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (0L, 2L, 1L, "body zero"),
      (1L, 2L, 1L, "body one"),
      (2L, 1L, 0L, ""), // ALL boilerplate: cleans to empty, still present
      (3L, 1L, 1L, "body three")))
  }

  test("removeBoilerplate reassembles surviving units in position order") {
    val ids = Seq(7L).toDF("doc_id")
    val units = unitRows(
      (7L, 2L, "c"), (7L, 0L, "a"), (7L, 1L, "b"))
    val got = Dedup.removeBoilerplate(ids, units,
        minDocFrac = 0.0, minDocs = 2, joinSep = " ")
      .collect().head
    assert(got.getString(3) == "a b c")
  }

  test("boilerplateUnits rejects the corpus-emptying minDocs=1") {
    val ids = Seq(0L).toDF("doc_id")
    val e = intercept[IllegalArgumentException] {
      Dedup.boilerplateUnits(ids, unitRows((0L, 0L, "x")), minDocs = 1)
    }
    assert(e.getMessage.contains("minDocs"))
  }
}
