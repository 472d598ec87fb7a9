package graft.llmops

import graft.core.TestSpark
import graft.functions.expressions.TextExpressions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TokenizeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def split(word: String, vocab: Seq[String], maxLen: Int = 6): Seq[String] =
    Seq(word).toDF("w")
      .select(TextExpressions.subword_split(col("w"), vocab, maxLen).as("p"))
      .collect().head.getSeq[String](0)

  test("greedy longest-match-first with single-char fallback") {
    val vocab = Seq("un", "believ", "able", "a", "b", "le")
    assert(split("unbelievable", vocab) == Seq("un", "believ", "able"))
    // greedy, not optimal: "ab" absent -> "a" + "b" + "le"
    assert(split("able", Seq("a", "b", "le")) == Seq("a", "b", "le"))
    // nothing matches: every char falls back, still lossless
    assert(split("xyz", Seq("un")) == Seq("x", "y", "z"))
  }

  test("segmentation is lossless for arbitrary text (roundtrip property)") {
    val vocab = Seq("ing", "th", "er", "qu", "ck")
    val words = Seq("the", "quick", "jumping", "x", "a~b!c", "ü-mläut")
    words.foreach { w =>
      assert(split(w, vocab).mkString("") == w, s"roundtrip broke for '$w'")
    }
  }

  test("maxPieceLen caps the match window") {
    // "abcdef" in vocab but window is 3: must match "abc" then "def"
    assert(split("abcdef", Seq("abcdef", "abc", "def"), maxLen = 3)
      == Seq("abc", "def"))
  }

  test("learnSubwordVocab ranks frequent substrings deterministically") {
    val docs = Seq((0L, "aaa aaa aaa bb"), (1L, "aaa bb cc")).toDF("doc_id", "text")
    val v = Tokenize.learnSubwordVocab(docs, vocabSize = 4, maxPieceLen = 3)
      .orderBy("rank").collect().map(r => (r.getString(0), r.getLong(1)))
    // "a" occurs 3x per "aaa" word-occurrence (4 occurrences) = 12;
    // "aa" 2x4 = 8; "aaa" 1x4 = 4; "b" 2x2 = 4 -> tie broken by piece
    assert(v.map(_._1).toSeq == Seq("a", "aa", "aaa", "b"))
    assert(v.head._2 == 12L)
  }

  test("encodeSubwords: per-doc counts, fallbacks, and order-exact fingerprint") {
    val docs = Seq(
      (0L, "abab xy"),
      (1L, "abab abab")).toDF("doc_id", "text")
    val vocab = Seq("ab").toDF("piece")
    val out = Tokenize.encodeSubwords(docs, vocab, maxPieceLen = 4)
      .orderBy("doc_id").collect()
    val r0 = out(0)
    assert(r0.getLong(1) == 2L) // words
    assert(r0.getLong(2) == 4L) // ab ab x y
    assert(r0.getLong(3) == 2L) // x, y fall back
    val r1 = out(1)
    assert(r1.getLong(2) == 4L && r1.getLong(3) == 0L)
    // fingerprint is the md5 of the space-joined piece stream in order
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("ab ab x y".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r0.getString(4) == expected)
  }

  test("kernel matches an independent greedy reference on random words/vocabs (seeded fuzz)") {
    // slow reference: straight-line greedy longest-match, written
    // independently of the kernel's byte/code-point machinery
    def reference(word: String, vocab: Set[String], maxLen: Int): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer[String]()
      var i = 0
      while (i < word.length) {
        val piece = (math.min(maxLen, word.length - i) to 2 by -1)
          .map(l => word.substring(i, i + l)).find(vocab.contains)
          .getOrElse(word.substring(i, i + 1))
        out += piece
        i += piece.length
      }
      out.toSeq
    }
    val rnd = new scala.util.Random(77)
    val alphabet = "abcde"
    for (trial <- 1 to 30) {
      val vocab = (0 until 12).map(_ =>
        (0 until (1 + rnd.nextInt(4))).map(_ => alphabet(rnd.nextInt(5))).mkString).distinct
      val words = (0 until 20).map(_ =>
        (1 to (1 + rnd.nextInt(12))).map(_ => alphabet(rnd.nextInt(5))).mkString)
      val maxLen = 1 + rnd.nextInt(5)
      val got = words.toDF("w")
        .select(col("w"), TextExpressions.subword_split(col("w"), vocab, maxLen).as("p"))
        .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
      words.foreach { w =>
        val want = reference(w, vocab.toSet, maxLen)
        assert(got(w) == want,
          s"trial $trial: '$w' vocab=$vocab maxLen=$maxLen: ${got(w)} vs $want")
        assert(got(w).mkString("") == w, s"roundtrip broke for '$w'")
      }
    }
  }

  test("encode equals per-instance splitting at any partitioning") {
    val docs = (0L until 300L)
      .map(i => (i, s"token$i shared${i % 7} shared${i % 7}"))
      .toDF("doc_id", "text")
    val vocab = Tokenize.learnSubwordVocab(docs, vocabSize = 64, maxPieceLen = 4)
    val a = Tokenize.encodeSubwords(docs.repartition(1), vocab)
      .orderBy("doc_id").collect().map(_.toSeq)
    val b = Tokenize.encodeSubwords(docs.repartition(13), vocab)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  // sequential reference BPE: word-frequency table, most frequent
  // adjacent pair (ties → lexicographically smallest pair string),
  // merge every non-overlapping occurrence left-to-right
  private def refBpe(words: Map[String, Long], rounds: Int): Seq[(Long, String, Long)] = {
    var tbl = words.map { case (w, n) => (w.map(_.toString) :+ "</w>", n) }.toSeq
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
    for (r <- 1 to rounds) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, n) <- tbl; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + n
      if (counts.nonEmpty) {
        val ((l, rr), c) = counts.minBy { case ((l, rr), c) => (-c, s"$l $rr") }
        out += ((r.toLong, s"$l $rr", c))
        tbl = tbl.map { case (syms, n) =>
          val b = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == rr) {
              b += l + rr; i += 2
            } else { b += syms(i); i += 1 }
          }
          (b.toIndexedSeq, n)
        }
      }
    }
    out.toSeq
  }

  test("bpeMerges equals the sequential reference trainer, any partitioning") {
    val rnd = new scala.util.Random(31)
    val lexicon = Seq("alpha", "beta", "gamma", "delta", "scan", "merge",
      "banana", "bandana", "abcabc", "zz")
    val docs = (0 until 200).map { i =>
      (i.toLong, Seq.fill(5 + rnd.nextInt(10))(
        lexicon(rnd.nextInt(lexicon.length))).mkString(" "))
    }.toDF("doc_id", "text")
    val words = docs.as[(Long, String)].collect()
      .flatMap(_._2.split(" ")).groupBy(identity)
      .view.mapValues(_.length.toLong).toMap
    val want = refBpe(words, 30)
    val got = Tokenize.bpeMerges(docs, numMerges = 30)
      .orderBy("merge_rank")
      .as[(Long, String, Long)].collect().toSeq
    assert(got == want, s"got:  $got\nwant: $want")
    val again = Tokenize.bpeMerges(docs.repartition(13), numMerges = 30)
      .orderBy("merge_rank")
      .as[(Long, String, Long)].collect().toSeq
    assert(again == want)
    // self-chaining pair: 'zzzz' = z,z,z,z counts THREE (z,z)
    // adjacencies (x2 words = 6), and the greedy merge fuses TWO
    // non-overlapping occurrences per word → zz,zz,</w>. Round 2 then
    // sees (zz,zz)=2 and (zz,</w>)=2 — the '<' tie-break picks
    // "zz </w>". A shared-boundary encoding bug would instead leave
    // z,z unmerged mid-word and surface (zz,z)/(z,</w>) pairs here.
    val zz = Seq((0L, "zzzz zzzz")).toDF("doc_id", "text")
    val m2 = Tokenize.bpeMerges(zz, numMerges = 2)
      .orderBy("merge_rank").as[(Long, String, Long)].collect().toSeq
    assert(m2 == Seq((1L, "z z", 6L), (2L, "zz </w>", 2L)), s"got $m2")
  }

  test("encodeBpe: pieces are lossless and rank-order replay, counts sum per doc") {
    val docs = Seq((0L, "banana band banana"), (1L, "band banana")).toDF("doc_id", "text")
    val merges = Tokenize.bpeMerges(docs, numMerges = 4)
    val got = Tokenize.encodeBpe(docs, merges)
      .orderBy("doc_id")
      .as[(Long, Long, String)].collect().toSeq
    // reconstruct the expected segmentation with the reference trainer
    val words = Map("banana" -> 3L, "band" -> 2L)
    val ms = refBpe(words, 4).map(_._2)
    def encode(w: String): Seq[String] = {
      var syms: Seq[String] = w.map(_.toString) :+ "</w>"
      for (m <- ms) {
        val Array(l, r) = m.split(" ", 2)
        val b = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
            b += l + r; i += 2
          } else { b += syms(i); i += 1 }
        }
        syms = b.toSeq
      }
      syms
    }
    // losslessness: pieces concatenate back to word + </w>
    for (w <- words.keys)
      assert(encode(w).mkString("") == w + "</w>")
    val expect = Seq(
      (0L, Seq("banana", "band", "banana").map(encode(_).length.toLong).sum),
      (1L, Seq("band", "banana").map(encode(_).length.toLong).sum))
    assert(got.map(g => (g._1, g._2)) == expect, s"got $got")
    // fingerprint changes iff segmentation changes: zero merges ≠ four
    val got0 = Tokenize.encodeBpe(docs,
        Tokenize.bpeMerges(docs, numMerges = 4).limit(0))
      .orderBy("doc_id").as[(Long, Long, String)].collect().toSeq
    assert(got0.head._2 > got.head._2 && got0.head._3 != got.head._3)
  }

  test("bpeMerges stops early when no adjacent pairs remain") {
    val tiny = Seq((0L, "a a a")).toDF("doc_id", "text")
    // 'a</w>' fuses in round 1; after that the single-symbol word has no
    // pairs — rounds 2+ must not emit
    val m = Tokenize.bpeMerges(tiny, numMerges = 5)
      .as[(Long, String, Long)].collect().toSeq
    assert(m == Seq((1L, "a </w>", 3L)), s"got $m")
  }

  test("vocabCoverage: deterministic top-K vocabulary, exact per-doc OOV counts, zero-token docs surface") {
    // corpus counts: the=6, cat=3, sat=2, qq=2, xylophone=1 — the top-3
    // vocabulary exercises the TIE-BREAK: sat and qq tie at 2 and the
    // term-ascending order picks 'qq', so vocab = {the, cat, qq} and
    // 'sat' is OOV; doc 4 is whitespace-only and must surface with 0.0
    val docs = Seq(
      (1L, "the cat sat the cat"),                  // 5 tokens, sat oov
      (2L, "the cat sat qq"),                       // 4 tokens, sat oov
      (3L, "the the the xylophone qq"),             // 5 tokens, xylophone oov
      (4L, "   ")                                   // zero tokens
    ).toDF("doc_id", "text")
    val got = Tokenize.vocabCoverage(docs, vocabSize = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 5L, 1L, 0.2),
      (2L, 4L, 1L, 0.25),
      (3L, 5L, 1L, 0.2),
      (4L, 0L, 0L, 0.0)), s"got $got")
    // with K >= |distinct terms| every token is in-vocab
    val all = Tokenize.vocabCoverage(docs, vocabSize = 5)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect()
    assert(all.forall(_._3 == 0L), s"K >= |terms| must cover all: ${all.toSeq}")
  }
  test("vocabFit/save/load roundtrip: byte-identical term order; corrupt/empty models raise loudly") {
    val docs = Seq(
      (1L, "the cat sat the cat"),
      (2L, "the cat sat qq"),
      (3L, "the the the xylophone qq")
    ).toDF("doc_id", "text")
    val fitTerms = Tokenize.vocabFit(docs, vocabSize = 3)
      .collect().map(_.getString(0)).toSeq
    assert(fitTerms == Seq("the", "cat", "qq"),
      s"fit order must be (count DESC, term ASC): $fitTerms") // sat|qq tie -> qq
    val dir = java.nio.file.Files.createTempDirectory("vocab-rt").toString
    Tokenize.saveVocabModel(Tokenize.vocabFit(docs, vocabSize = 3), dir)
    assert(Tokenize.loadVocabModel(spark, dir) == fitTerms,
      "reload must be byte-identical to the fit's collect")
    // refit-overwrite replaces atomically
    Tokenize.saveVocabModel(Tokenize.vocabFit(docs, vocabSize = 2), dir)
    assert(Tokenize.loadVocabModel(spark, dir) == Seq("the", "cat"))
    // missing model raises loudly
    val eMissing = intercept[IllegalStateException](
      Tokenize.loadVocabModel(spark, dir + "-nope"))
    assert(eMissing.getMessage.contains("corrupt or missing model"))
    // mis-shaped model (wrong columns) raises loudly
    val badDir = java.nio.file.Files.createTempDirectory("vocab-bad").toString
    Seq((1L, "x")).toDF("a", "b")
      .write.mode("overwrite").parquet(s"$badDir/model")
    val eBad = intercept[IllegalStateException](
      Tokenize.loadVocabModel(spark, badDir))
    assert(eBad.getMessage.contains("corrupt or missing model"))
    // an EMPTY vocabulary must refuse to load (it would silently score
    // everything OOV) and refuse to apply
    val emptyDir = java.nio.file.Files.createTempDirectory("vocab-empty").toString
    docs.filter(col("doc_id") < 0L)
      .select(col("text").as("term"), col("doc_id").as("cnt"))
      .write.mode("overwrite").parquet(s"$emptyDir/model")
    val eEmpty = intercept[IllegalArgumentException](
      Tokenize.loadVocabModel(spark, emptyDir))
    assert(eEmpty.getMessage.contains("empty model"))
    val eApply = intercept[IllegalArgumentException](
      Tokenize.oovAgainstVocab(docs, Seq.empty))
    assert(eApply.getMessage.contains("empty vocabulary"))
  }

  test("oovAgainstVocab: the narrow-map apply matches the relational vocabCoverage bit-for-bit (NULL + zero-token docs included)") {
    val docs = Seq(
      (1L, Some("the cat sat the cat")),
      (2L, Some("the cat sat qq")),
      (3L, Some("the the the xylophone qq")),
      (4L, Some("   ")),
      (5L, Option.empty[String])
    ).toDF("doc_id", "text")
    val vocab = Tokenize.vocabFit(docs, vocabSize = 3)
      .collect().map(_.getString(0)).toSeq
    val viaMap = Tokenize.oovAgainstVocab(docs, vocab)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq
    val viaRel = Tokenize.vocabCoverage(docs, vocabSize = 3)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq
    assert(viaMap == viaRel, s"narrow map $viaMap vs relational $viaRel")
    assert(viaMap.find(_._1 == 5L).get == ((5L, 0L, 0L, 0.0)),
      "NULL text must surface as a zero-token doc")
    assert(viaMap.exists(_._3 > 0L), "test corpus must have real OOV mass")
  }

  test("oovAgainstVocab: a static vocabulary applies to a STREAM batch-identically") {
    // the split's purpose: the fit runs on a static reference corpus,
    // the apply is a stateless narrow map — so a live ingest stream
    // scores OOV against the SAME fixed tokenizer vocabulary
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows: Seq[(Long, String)] = Seq(
      (1L, "the cat sat the cat"), (2L, "the cat sat qq"),
      (3L, "the the the xylophone qq"), (4L, "   "))
    val batch = rows.toDF("doc_id", "text")
    val vocab = Tokenize.vocabFit(batch, vocabSize = 3)
      .collect().map(_.getString(0)).toSeq
    val input = MemoryStream[(Long, String)]
    val q = Tokenize.oovAgainstVocab(
        input.toDF().toDF("doc_id", "text"), vocab)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("oov_stream").start()
    try {
      input.addData(rows: _*); q.processAllAvailable()
      val got = spark.table("oov_stream")
        .orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq
      val exp = Tokenize.oovAgainstVocab(batch, vocab)
        .orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq
      assert(got == exp && got.nonEmpty,
        s"stream OOV diverged from batch: $got vs $exp")
    } finally q.stop()
  }
}
