package graft.functions

import graft.core.TestSpark
import graft.functions.expressions.HashExpressions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FunctionsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import org.apache.spark.sql.Row

  private def one(colExpr: org.apache.spark.sql.Column, text: String): Any = {
    import spark.implicits._
    Seq(text).toDF("text").select(colExpr.as("v")).head().get(0)
  }

  test("normalize/tokens/fingerprint") {
    assert(one(Text.normalize(col("text")), "  Hello\t WORLD  ") == "hello world")
    assert(one(Text.tokenCount(col("text")), "a b  c").asInstanceOf[Int] == 3)
    assert(one(Text.bpeTokenCount(col("text")), "ab12,cd").asInstanceOf[Int] == 4) // ab|12|,|cd
    // md5 of normalized text, stable
    assert(one(Text.fingerprint(col("text")), "A  b") ==
      one(Text.fingerprint(col("text")), "a b"))
  }

  test("shingles produce distinct k-grams") {
    val sh = one(Text.shingles(col("text"), 3), "a b c d").asInstanceOf[scala.collection.Seq[String]]
    assert(sh.toSet == Set("a b c", "b c d"))
  }

  test("quality ratios bounded and deterministic") {
    val p = one(Text.punctRatio(col("text")), "a,b.c!").asInstanceOf[Double]
    assert(p == 3.0 / 6.0)
    val s = one(Text.stopwordRatio(col("text")), "the cat and dog").asInstanceOf[Double]
    assert(s == 2.0 / 4.0)
  }

  test("TextStats matches the composed column forms") {
    import spark.implicits._
    val nul = "\u0000"
    val texts = Seq(
      "The quick brown fox, with a vengeance!? And so it goes; on and on.",
      "", "   ", "a", "no stop words here whatsoever",
      "the the the the", ".,!?;:", "多字节 文本 the cat", "x" * 600,
      // NUL-containing tokens: "to<NUL>" must NOT count as the stopword
      // "to" (zero bytes pack as zero bits; the length baked into the
      // packed key rejects them — ADVICE r2)
      "to" + nul + " the cat", "a" + nul * 3 + " and", nul + "the is")
    val df = texts.toDF("text")
    val st = Text.stats(col("text"))
    val got = df.select(
      st.getField("n_chars"), st.getField("punct_ratio"),
      st.getField("stopword_ratio"), st.getField("quality")).collect()
    val want = df.select(
      length(col("text")).cast("long"), Text.punctRatio(col("text")),
      Text.stopwordRatio(col("text")),
      // qualityScore rounds internally; compare unrounded composition
      (least(length(col("text")).cast("double") / 500.0, lit(1.0)) +
        least(Text.stopwordRatio(col("text")) * 4.0, lit(1.0)) +
        greatest(lit(1.0) - Text.punctRatio(col("text")) * 5.0, lit(0.0))) / 3.0).collect()
    got.zip(want).zip(texts).foreach { case ((g, w), t) =>
      assert(g.getLong(0) == w.getLong(0), s"n_chars for '$t'")
      assert(math.abs(g.getDouble(1) - w.getDouble(1)) < 1e-12, s"punct for '$t'")
      assert(math.abs(g.getDouble(2) - w.getDouble(2)) < 1e-12, s"stop for '$t'")
      assert(math.abs(g.getDouble(3) - w.getDouble(3)) < 1e-12, s"quality for '$t'")
    }
  }

  test("langId picks marker language; CJK wins") {
    assert(one(Text.langId(col("text")), "the cat is on the mat and happy") == "en")
    assert(one(Text.langId(col("text")), "el perro y la casa de madrid que") == "es")
    assert(one(Text.langId(col("text")), "der hund und die katze ist gut") == "de")
    assert(one(Text.langId(col("text")), "你好 world") == "zh")
    assert(one(Text.langId(col("text")), "zzz qqq") == "und")
  }

  test("codeScore separates code from prose; features bounded and degenerate-safe") {
    val code =
      "def countItems(itemList):\n    totalCount = 0\n    for x in itemList:\n" +
        "        if x != null:\n            totalCount = totalCount + 1;\n    return totalCount;"
    val prose = "The quick brown fox jumps over the lazy dog and then " +
      "it rests in the shade of an old oak tree for the afternoon."
    val cs = one(Text.codeScore(col("text")), code).asInstanceOf[Double]
    val ps = one(Text.codeScore(col("text")), prose).asInstanceOf[Double]
    assert(cs > 0.5, s"code snippet scored $cs")
    assert(ps < 0.2, s"prose scored $ps")
    assert(cs > ps + 0.4, s"separation too weak: code=$cs prose=$ps")
    // features individually bounded in [0,1] and empty-safe
    for (f <- Seq(Text.symbolRatio _, Text.codeKeywordRatio _,
        Text.camelRatio _, Text.structuredLineRatio _)) {
      val v = one(f(col("text")), code).asInstanceOf[Double]
      assert(v >= 0.0 && v <= 1.0)
      assert(one(f(col("text")), "").asInstanceOf[Double] == 0.0)
    }
    // the statement-line signal sees indents AND terminators
    val lr = one(Text.structuredLineRatio(col("text")), code).asInstanceOf[Double]
    assert(lr == 1.0, s"every line of the snippet is statement-shaped, got $lr")
    // camelCase counts case transitions, not lowercase words
    assert(one(Text.camelRatio(col("text")), "itemList totalCount plain")
      .asInstanceOf[Double] > 0.5)
    assert(one(Text.camelRatio(col("text")), "plain words only")
      .asInstanceOf[Double] == 0.0)
  }

  test("withCodeFeatures is bit-equal to the standalone feature/score functions") {
    import spark.implicits._
    val texts = Seq(
      "def countItems(itemList):\n    return len(itemList);",
      "The quick brown fox jumps over the lazy dog.",
      "", "   \n  \n", "x = 1; y = 2;\nif (x) { y++; }")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val layered = Text.withCodeFeatures(df, col("text")).orderBy("id")
      .select("symbol_ratio", "keyword_ratio", "camel_ratio", "line_ratio",
        "code_score").collect()
    val fused = df.orderBy("id").select(
        round(Text.symbolRatio(col("text")), 6),
        round(Text.codeKeywordRatio(col("text")), 6),
        round(Text.camelRatio(col("text")), 6),
        round(Text.structuredLineRatio(col("text")), 6),
        Text.codeScore(col("text"))).collect()
    layered.zip(fused).zip(texts).foreach { case ((l, f), t) =>
      for (i <- 0 until 5)
        assert(l.getDouble(i) == f.getDouble(i),
          s"column $i diverges for '$t': ${l.getDouble(i)} vs ${f.getDouble(i)}")
    }
  }

  test("withEncodingQuality: replacement/control chars counted per CODE POINT; clean text scores 1") {
    import spark.implicits._
    val texts = Seq(
      "clean plain text",
      "bad � te�xt here",
      "ctl ok\nnewline\tand\rcr",
      "",
      "emoji 😀 pair")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val got = Text.withEncodingQuality(df, col("text")).orderBy("id")
      .select("n_cp", "repl_ratio", "ctrl_ratio", "enc_score").collect()
    // independent reference over code points
    def ref(s: String): (Long, Double, Double, Double) = {
      val cps = s.codePoints().toArray
      val n = cps.length.toLong
      val repl = cps.count(_ == 0xFFFD)
      val ctrl = cps.count(c => (c <= 0x08) || c == 0x0B || c == 0x0C ||
        (c >= 0x0E && c <= 0x1F) || c == 0x7F)
      val rr = if (n == 0) 0.0 else repl.toDouble / n
      val cr = if (n == 0) 0.0 else ctrl.toDouble / n
      (n, rr, cr, math.max(0.0, 1.0 - (rr * 25.0 + cr * 25.0)))
    }
    got.zip(texts).foreach { case (g, t) =>
      val (n, rr, cr, sc) = ref(t)
      assert(g.getLong(0) == n,
        s"n_cp for '$t': ${g.getLong(0)} vs $n (code points, NOT UTF-16 units)")
      assert(math.abs(g.getDouble(1) - rr) < 1e-6, s"repl for '$t'")
      assert(math.abs(g.getDouble(2) - cr) < 1e-6, s"ctrl for '$t'")
      assert(math.abs(g.getDouble(3) - sc) < 1e-6, s"score for '$t'")
    }
    // the supplementary-plane row is the load-bearing case: one emoji is
    // ONE code point (Java length() would say two)
    assert(got(4).getLong(0) == texts(4).codePointCount(0, texts(4).length))
    assert(got(0).getDouble(3) == 1.0 && got(1).getDouble(3) < 1.0)
  }

  test("withScriptProfile: mixed-script rows route by the argmax; ratios partition the code points") {
    import spark.implicits._
    val texts = Seq(
      "hello world",
      "你好世界",                    // Chinese: all Han
      "привет мир", // Russian
      "مرحبا",              // Arabic
      "123 !!! ...",                                 // no letters: und
      "hello 世界 big world")                // mixed, Latin wins
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val got = Text.withScriptProfile(df, col("text")).orderBy("id")
      .select("script_latin", "script_han", "script_cyrillic",
        "script_arabic", "script_other", "script_pred").collect()
    val preds = got.map(_.getString(5)).toSeq
    assert(preds == Seq("latin", "han", "cyrillic", "arabic", "und", "latin"),
      s"predictions: $preds")
    // the five ratios partition the code points (up to 6dp rounding)
    got.zip(texts).foreach { case (g, t) =>
      if (t.nonEmpty) {
        val sum = (0 until 5).map(g.getDouble).sum
        assert(math.abs(sum - 1.0) < 5e-6, s"ratios for '$t' sum to $sum")
      }
    }
    // all-Han row: script_han exactly 1
    assert(got(1).getDouble(1) == 1.0)
    // the mixed row counts 2 Han of 18 code points
    assert(math.abs(got(5).getDouble(1) - 2.0 / 18.0) < 1e-6,
      s"mixed han ${got(5)}")
  }

  test("withC4LineClean: each C4 rule drops its line; survivors rejoin in order") {
    import spark.implicits._
    val doc = Seq(
      "This line survives the filter intact.",   // kept
      "",                                          // empty -> dropped
      "   ",                                       // blank -> dropped
      "Too short.",                                // 2 tokens -> dropped
      "no terminal punctuation at all",            // no punct -> dropped
      "Please enable JavaScript to continue.",     // javascript -> dropped
      "object literal { key: value } here.",       // braces -> dropped
      "Ends with a question mark?",                // kept
      "Quoted ending stays in too.\"",             // kept (")
      "Trailing spaces are fine.   "               // kept
    ).mkString("\n")
    val df = Seq((1L, doc), (2L, ""), (3L, "single unterminated line"))
      .toDF("doc_id", "text")
    val got = Text.withC4LineClean(df, col("text")).orderBy("doc_id")
      .select("clean_text", "n_lines", "n_kept", "n_dropped").collect()
    val kept = got(0).getString(0).split("\n").toSeq
    assert(kept == Seq(
      "This line survives the filter intact.",
      "Ends with a question mark?",
      "Quoted ending stays in too.\"",
      "Trailing spaces are fine.   "),
      s"kept lines: $kept")
    assert(got(0).getLong(1) == 10 && got(0).getLong(2) == 4 &&
      got(0).getLong(3) == 6, s"counts: ${got(0)}")
    // empty doc: one empty line, nothing kept
    assert(got(1).getString(0) == "" && got(1).getLong(2) == 0)
    // unterminated single line drops; counts stay consistent
    assert(got(2).getLong(1) == 1 && got(2).getLong(2) == 0 &&
      got(2).getLong(3) == 1)
  }

  test("encoding/script audits are stream-safe: stateless narrow maps give batch-identical output on a stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val rows = Seq(
      (1L, "clean latin text"),
      (2L, "bro�ken byte soup"),
      (3L, "你好世界好 mixed"),
      (4L, ""))
    val batch = rows.toDF("doc_id", "text")
    val input = MemoryStream[(Long, String)]
    val streamed = Text.withScriptProfile(
      Text.withEncodingQuality(input.toDF().toDF("doc_id", "text"),
        col("text")), col("text"))
    val q = streamed.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("encscr_stream").start()
    try {
      input.addData(rows: _*); q.processAllAvailable()
      def snap(df: org.apache.spark.sql.DataFrame) = df
        .select("doc_id", "n_cp", "repl_ratio", "ctrl_ratio", "enc_score",
          "script_latin", "script_han", "script_other", "script_pred")
        .collect().map(r => r.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
      val got = snap(spark.table("encscr_stream"))
      val exp = snap(Text.withScriptProfile(
        Text.withEncodingQuality(batch, col("text")), col("text")))
      assert(got.toSeq.map(_.toList) == exp.toSeq.map(_.toList),
        "streaming audit diverged from batch")
    } finally q.stop()
  }

  test("cosine/jaccard basics") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 0.0f), Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)))
      .toDF("a", "b", "c")
    val r = df.select(
      Vectors.cosine(col("a"), col("b")).as("same"),
      Vectors.cosine(col("a"), col("c")).as("orth")).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12 && math.abs(r.getDouble(1)) < 1e-12)
    val j = Seq((Seq("a", "b", "c"), Seq("b", "c", "d")))
      .toDF("x", "y").select(Vectors.jaccard(col("x"), col("y"))).head().getDouble(0)
    assert(j == 2.0 / 4.0)
  }

  test("MinHashBands: identical inputs collide on every band, disjoint rarely") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("a b c", "b c d", "c d e")),
      (2L, Seq("a b c", "b c d", "c d e")),
      (3L, Seq("x y z", "y z w", "z w v"))).toDF("id", "sh")
    val bands = df.select(col("id"), HashExpressions.minhash_bands(col("sh"), 4, 2).as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(bands(1L) == bands(2L))
    assert(bands(1L) != bands(3L))
    assert(bands(1L).length == 4)
  }

  test("SimHash64: near-identical token sets within small Hamming distance") {
    import spark.implicits._
    val df = Seq(
      (1L, (1 to 50).map(i => s"tok$i")),
      (2L, (1 to 50).map(i => s"tok$i") :+ "extra"),
      (3L, (100 to 150).map(i => s"zz$i"))).toDF("id", "toks")
    val sigs = df.select(col("id"), HashExpressions.simhash64(col("toks")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(1L), sigs(2L)) <= 8)
    assert(ham(sigs(1L), sigs(3L)) > 8)
  }

  test("rollingHash is order-sensitive") {
    assert(one(Text.rollingHash(col("text")), "ab") != one(Text.rollingHash(col("text")), "ba"))
  }

  test("rolling_hash64 native expression matches the HOF Horner form on real documents") {
    // the superseded per-character HOF chain, kept here as the reference
    // semantics the native expression must reproduce bit-for-bit. Under
    // Spark 4's default ANSI mode the HOF form THROWS on any text long
    // enough for the Horner product to wrap (a latent bug the native
    // expression fixes — Java arithmetic wraps silently, which is the
    // intended fingerprint semantics), so the reference values are
    // computed with ANSI off.
    def hofForm(text: org.apache.spark.sql.Column) =
      aggregate(
        transform(split(Text.normalize(text), ""), ch => ascii(ch).cast("long")),
        lit(0L),
        (acc, b) => acc * lit(31L) + b)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(200)
    val native = docs.select(col("doc_id"), Text.rollingHash(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val prevAnsi = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    val hof =
      try docs.select(col("doc_id"), hofForm(col("text")).as("h"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      finally spark.conf.set("spark.sql.ansi.enabled", prevAnsi)
    assert(native == hof, "native rolling hash diverged from the Horner reference")
    // empty string folds to the HOF's zero seed
    assert(one(Text.rollingHash(col("text")), "") == 0L)
    // non-BMP parity: Java's zero-width split keeps surrogate PAIRS whole
    // and Spark's ascii yields the code point, so the native expression
    // must fold one value per CODE POINT, not per UTF-16 unit
    import spark.implicits._
    val emoji = "a 😀 b" // a 😀 b
    val nh = Seq(emoji).toDF("text").select(Text.rollingHash(col("text"))).head().getLong(0)
    spark.conf.set("spark.sql.ansi.enabled", "false")
    val hh =
      try Seq(emoji).toDF("text").select(hofForm(col("text"))).head().getLong(0)
      finally spark.conf.set("spark.sql.ansi.enabled", prevAnsi)
    assert(nh == hh, s"non-BMP divergence: native=$nh hof=$hh")
  }

  test("hyperplaneBucket is bit-compatible with the xxhash64 sign formula") {
    import spark.implicits._
    val dim = 8; val bits = 5
    val vecs = (0 until 6).map(i => (i.toLong, (0 until dim).map(d =>
      math.sin(i * 31 + d * 7).toFloat)))
    val df = vecs.toDF("id", "v")
    // the reference formula, spelled out with public Spark functions
    val planes = (0 until bits).map { b =>
      (0 until dim).map { d =>
        val h = xxhash64(lit(b.toLong * 10007L + d))
        element_at(col("v"), d + 1).cast("double") *
          when(h.bitwiseAND(1L) === 1L, 1.0).otherwise(-1.0)
      }.reduce(_ + _)
    }
    val expected = planes.zipWithIndex.map { case (p, i) =>
      when(p > 0.0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    val rows = df.select(
      Vectors.hyperplaneBucket(col("v"), bits).as("got"),
      expected.as("want")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("hyperplaneBucket survives production dims (768) and splits opposites") {
    import spark.implicits._
    val dim = 768
    val v = (0 until dim).map(d => (math.cos(d * 0.37) + 0.1).toFloat)
    val df = Seq((1L, v), (2L, v.map(x => -x))).toDF("id", "v")
    val out = df.select(col("id"), Vectors.hyperplaneBucket(col("v"), 8).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every dot product flips sign, so the buckets are bitwise complements
    assert((out(1L) ^ out(2L)) == 0xffL)
  }

  test("topk_by matches the row_number window form exactly") {
    import graft.functions.expressions.TopKExpressions
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val scored = (1 to 500).map { i =>
      (i % 7L, i.toLong, math.floor(rnd.nextDouble() * 20) / 20) // duplicate scores → tie-breaks exercised
    }.toDF("query_id", "neighbor_id", "cos").repartition(8)
    val viaAgg = scored.groupBy(col("query_id"))
      .agg(TopKExpressions.topk_by(col("cos"), col("neighbor_id"), 5).as("nb"))
      .select(col("query_id"), posexplode(col("nb")).as(Seq("pos", "neighbor_id")))
      .select(col("query_id"), col("neighbor_id"), (col("pos") + 1).cast("long").as("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    val viaWindow = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3).toLong)).toSet
    assert(viaAgg == viaWindow)
  }

  test("grid_bucket: binary search matches the strictly-below-count contract") {
    import graft.functions.expressions.{GridBucket, VectorExpressions}
    import spark.implicits._
    // bounds are INCLUSIVE upper bounds of their bucket
    val bounds = Seq("41", "4142", "62") // "A", "AB", "b"
    val keys = Seq("0", "A", "AA", "AB", "ABC", "b", "z", "")
    val out = keys.map(_.getBytes("UTF-8")).toDF("key")
      .select(VectorExpressions.grid_bucket(col("key"), bounds).as("b"))
      .collect().map(_.getInt(0)).toSeq
    //          "0" "A" "AA" "AB" "ABC" "b" "z" ""
    assert(out == Seq(0, 0, 1, 1, 2, 2, 3, 0))
    // direct compute agrees with a linear count at every probe
    val bs = bounds.map(GridBucket.decodeHex).toArray
    for (k <- keys) {
      val kb = k.getBytes("UTF-8")
      val linear = bounds.count(b =>
        java.util.Arrays.compareUnsigned(GridBucket.decodeHex(b), kb) < 0)
      assert(GridBucket.compute(kb, bs) == linear, s"key=$k")
    }
  }

  test("jaro_winkler matches the canonical record-linkage values") {
    import graft.functions.expressions.JaroWinkler.compute
    def u(s: String) = org.apache.spark.unsafe.types.UTF8String.fromString(s)
    def jw(a: String, b: String) = compute(u(a), u(b), winkler = true)
    def j(a: String, b: String) = compute(u(a), u(b), winkler = false)
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.84) < 1e-12)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-3)
    assert(math.abs(j("MARTHA", "MARHTA") - 0.9444444444444444) < 1e-12)
    // DuckDB convention: any empty side scores 0, even empty==empty
    assert(jw("", "") == 0.0 && jw("abc", "") == 0.0)
    assert(jw("a", "b") == 0.0)
    assert(jw("AB", "AB") == 1.0)
    // boost only above 0.7: disjoint tails with shared prefix stay raw
    assert(math.abs(jw("ABCVWXYZ", "ABCDEFGH") - 0.5833333333333334) < 1e-12)
    // prefix cap 4: 6 shared chars boost like 4
    assert(math.abs(jw("PREFIXaaaa", "PREFIXbbbb") - 0.84) < 1e-12)
  }

  test("jaro_winkler codegen path equals interpreted and handles non-BMP") {
    import graft.functions.expressions.TextExpressions.{jaro, jaro_winkler}
    import spark.implicits._
    val df = Seq(("MARTHA", "MARHTA"), ("h😀x", "h😀y"),
      ("", ""), ("CRATE", "TRACE")).toDF("a", "b")
    val rows = df.select(round(jaro_winkler(col("a"), col("b")), 6).as("jw"),
      round(jaro(col("a"), col("b")), 6).as("j")).collect()
    assert(rows(0).getDouble(0) == 0.961111)
    // surrogate pair counts as ONE code point: 2/3 matched of 3
    assert(rows(1).getDouble(1) == 0.777778)
    assert(rows(2).getDouble(0) == 0.0)
    assert(rows(3).getDouble(0) == 0.733333)
    val withNull = Seq((Some("x"), Option.empty[String])).toDF("a", "b")
      .select(jaro_winkler(col("a"), col("b"))).collect()
    assert(withNull.head.isNullAt(0))
  }

  test("md5_prefix8 equals the conv(substring(md5)) convention bit-for-bit") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.expressions.HashExpressions
    val rnd = new scala.util.Random(77)
    val strs = Seq("", "a", "hello world", "\u00e9\u00e9 \u4e2d\u6587 \ud83d\ude00",
      "the quick brown fox") ++
      (0 until 200).map(_ => rnd.alphanumeric.take(rnd.nextInt(30)).mkString)
    val df = strs.toDF("s")
    val bad = df.select(
        HashExpressions.md5_prefix8(col("s")).as("fast"),
        conv(substring(md5(col("s")), 1, 8), 16, 10).cast("long").as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(bad.count() == 0)
    // null stays null
    val n = Seq(Option.empty[String]).toDF("s")
      .select(HashExpressions.md5_prefix8(col("s"))).collect()
    assert(n.head.isNullAt(0))
  }

  test("normalize_ws equals trim(regexp_replace(lower)) bit-for-bit") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.expressions.TextExpressions
    val rnd = new scala.util.Random(99)
    val wsChars = " \t\n\u000b\f\r"
    val alphabet = "aA zZ.09\u00c9\u00e9\u4e2d\ud83d\ude00\u0130\u00df" + wsChars
    val strs = Seq("", " ", "   ", "a", " a ", "\t\n x \r\n y\f ",
      "HeLLo   WoRLD", "\u00c9T\u00c9  \u4e2d \u6587", "\u0130stanbul \u00dfharp",
      "no_ws_at_all", "trailing ", " leading") ++
      (0 until 300).map(_ => (0 until rnd.nextInt(40))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val df = strs.toDF("s")
    val bad = df.select(col("s"),
        TextExpressions.normalize_ws(col("s")).as("fast"),
        trim(regexp_replace(lower(col("s")), "\\s+", " ")).as("ref"))
      .filter(!(col("fast") <=> col("ref")))
    assert(bad.count() == 0, bad.collect().take(5).mkString("; "))
    val n = Seq(Option.empty[String]).toDF("s")
      .select(TextExpressions.normalize_ws(col("s"))).collect()
    assert(n.head.isNullAt(0))
  }
}
