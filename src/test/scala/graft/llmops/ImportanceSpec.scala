package graft.llmops

import graft.core.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ImportanceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val B = 64

  // independent reference: grams + md5 bucket + add-one log ratio, written
  // against java.security directly (no Spark expressions)
  private def refGrams(text: String): Seq[String] = {
    val toks = text.toLowerCase.trim.replaceAll("\\s+", " ")
      .split(" ").toSeq.filter(_.nonEmpty)
    toks ++ toks.sliding(2).filter(_.size == 2).map(_.mkString(" "))
  }

  private def refBucket(g: String, b: Int): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
    java.lang.Long.parseLong(hex, 16) % b
  }

  test("grams: unigrams ++ ordered bigrams; NULL/empty text is zero-gram") {
    val out = Seq((0L, "a b c"), (1L, "solo"), (2L, ""), (3L, null))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Importance.grams(col("text")).as("g"))
      .orderBy("doc_id").collect()
    assert(out(0).getSeq[String](1) == Seq("a", "b", "c", "a b", "b c"))
    assert(out(1).getSeq[String](1) == Seq("solo"))
    assert(out(2).getSeq[String](1).isEmpty)
    assert(out(3).getSeq[String](1).isEmpty)
  }

  test("bucketOf matches the independent md5 reference") {
    val grams = Seq("the", "quick fox", "ümläut", "数据")
    val got = grams.toDF("g")
      .select(col("g"), Importance.bucketOf(col("g"), B).as("b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    grams.foreach { g => assert(got(g) == refBucket(g, B), s"gram '$g'") }
  }

  test("dsirFit: complete bucket range, add-one log ratios match a direct replay") {
    val target = Seq((0L, "the cat sat"), (1L, "the cat")).toDF("doc_id", "text")
    val raw = Seq((0L, "the cat sat"), (1L, "the cat"), (2L, "dog runs far"),
      (3L, "noise noise noise")).toDF("doc_id", "text")
    val m = Importance.dsirFit(target, raw, buckets = B)
      .orderBy("bucket").collect()
    assert(m.length == B)
    assert(m.map(_.getLong(0)).toSeq == (0L until B).toSeq)
    // direct reference fit
    val tCounts = Seq("the cat sat", "the cat").flatMap(refGrams)
      .groupBy(refBucket(_, B)).view.mapValues(_.size.toLong).toMap
    val rCounts = Seq("the cat sat", "the cat", "dog runs far",
      "noise noise noise").flatMap(refGrams)
      .groupBy(refBucket(_, B)).view.mapValues(_.size.toLong).toMap
    val nt = tCounts.values.sum.toDouble
    val nr = rCounts.values.sum.toDouble
    m.foreach { r =>
      val bk = r.getLong(0)
      val expected = BigDecimal(
        math.log((tCounts.getOrElse(bk, 0L) + 1.0) / (nt + B)) -
          math.log((rCounts.getOrElse(bk, 0L) + 1.0) / (nr + B)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(1) == expected, s"bucket $bk")
      assert(r.getLong(2) == math.round(expected * 1e6), s"micros $bk")
    }
  }

  test("dsirFitWhere (one-pass predicate fit) is bit-identical to the two-frame fit") {
    val raw = Seq((0L, "the cat sat", "en"), (1L, "the cat", "en"),
      (2L, "dog runs far", "de"), (3L, "noise noise noise", "de"),
      (4L, null.asInstanceOf[String], null.asInstanceOf[String]))
      .toDF("doc_id", "text", "lang")
    val twoFrame = Importance.dsirFit(raw.filter(col("lang") === "en"),
        raw, buckets = B).orderBy("bucket")
      .collect().map(_.toSeq).toSeq
    // NULL-lang row: predicate evaluates NULL -> raw pool only, exactly
    // like the filter() on the two-frame side drops it from the target
    val onePass = Importance.dsirFitWhere(raw, col("lang") === "en",
        buckets = B).orderBy("bucket")
      .collect().map(_.toSeq).toSeq
    assert(onePass == twoFrame)
  }

  test("dsirFitWhere raises loudly when no grams match the predicate") {
    val raw = Seq((0L, "a b", "de")).toDF("doc_id", "text", "lang")
    val e = intercept[IllegalArgumentException] {
      Importance.dsirFitWhere(raw, col("lang") === "en", buckets = B)
    }
    assert(e.getMessage.contains("target predicate"))
  }

  test("dsirFit raises loudly on an empty target corpus") {
    val raw = Seq((0L, "a b")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Importance.dsirFit(raw.filter(col("doc_id") < 0), raw, buckets = B)
        .collect()
    }
    assert(e.getMessage.contains("zero n-grams"))
  }

  test("dsirWeights: per-doc integer-micros sums; zero-gram docs surface as 0.0") {
    val target = Seq((0L, "the cat")).toDF("doc_id", "text")
    val raw = Seq((0L, "the cat"), (1L, "dog runs"), (2L, ""),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val m = Importance.dsirFit(target, raw, buckets = B)
    val micros = m.orderBy("bucket").collect().map(_.getLong(2))
    val w = Importance.dsirWeights(raw, m, buckets = B)
      .orderBy("doc_id").collect()
    // independent replay per doc
    val texts = Map(0L -> "the cat", 1L -> "dog runs", 2L -> "", 3L -> "")
    w.foreach { r =>
      val gs = refGrams(texts(r.getLong(0)))
      assert(r.getLong(1) == gs.size, s"n_grams doc ${r.getLong(0)}")
      val slw = gs.map(g => micros(refBucket(g, B).toInt)).sum
      val expected = BigDecimal(slw.toDouble / 1e6)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(2) == expected, s"logw doc ${r.getLong(0)}")
    }
    assert(w.filter(r => r.getLong(0) >= 2).forall(r =>
      r.getLong(1) == 0L && r.getDouble(2) == 0.0))
  }

  test("weights rank target-like docs above off-target docs") {
    val target = Seq((0L, "the cat sat on the mat"),
      (1L, "the dog sat on the rug")).toDF("doc_id", "text")
    val raw = Seq((0L, "the cat sat on the mat"),
      (1L, "the dog sat on the rug"),
      (2L, "zz qq vv xx ww yy"),
      (3L, "kk jj hh gg ff ee")).toDF("doc_id", "text")
    val m = Importance.dsirFit(target, raw, buckets = 256)
    val w = Importance.dsirWeights(raw, m, buckets = 256)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(0L) > w(2L) && w(0L) > w(3L))
    assert(w(1L) > w(2L) && w(1L) > w(3L))
  }

  test("dsirScore (narrow map) is bit-identical to the relational apply") {
    val target = Seq((0L, "the cat sat")).toDF("doc_id", "text")
    val raw = Seq((0L, "the cat sat"), (1L, "dog runs far away now"),
      (2L, "the the the"), (3L, ""), (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val m = Importance.dsirFit(target, raw, buckets = B)
    val lut = m.orderBy("bucket").collect().map(_.getLong(2))
    val rel = Importance.dsirWeights(raw, m, buckets = B)
      .orderBy("doc_id").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val nar = Importance.dsirScore(raw, lut)
      .orderBy("doc_id").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rel.toSeq == nar.toSeq)
  }

  test("model roundtrip: save/load byte-identical; loud on gap and on missing dir") {
    val target = Seq((0L, "a b c")).toDF("doc_id", "text")
    val raw = Seq((0L, "a b c"), (1L, "d e f")).toDF("doc_id", "text")
    val m = Importance.dsirFit(target, raw, buckets = B)
    val dir = java.nio.file.Files.createTempDirectory("graft-dsir").toString
    Importance.saveDsirModel(m, dir)
    val lut = Importance.loadDsirModel(spark, dir)
    assert(lut.sameElements(m.orderBy("bucket").collect().map(_.getLong(2))))
    // a model with a hole must raise, not silently mis-score
    Importance.saveDsirModel(m.filter(col("bucket") =!= 7), dir)
    val e = intercept[IllegalArgumentException] {
      Importance.loadDsirModel(spark, dir)
    }
    assert(e.getMessage.contains("contiguous"))
    assert(intercept[IllegalStateException] {
      Importance.loadDsirModel(spark, dir + "/nope")
    }.getMessage.contains("corrupt or missing"))
  }

  test("dsirWeights raises loudly on a fit/apply buckets mismatch") {
    val target = Seq((0L, "a b")).toDF("doc_id", "text")
    val raw = Seq((0L, "a b"), (1L, "c d")).toDF("doc_id", "text")
    val m = Importance.dsirFit(target, raw, buckets = 16)
    val e = intercept[Exception] {
      Importance.dsirWeights(raw, m, buckets = 4096).collect()
    }
    assert(e.getMessage.contains("missing from the model"))
  }

  test("dsirSample: exactly k rows, a subset of docs, deterministic, key replays") {
    // raw pool: a quarter on-target, the rest copies of one raw-typical
    // noise text — the shape DSIR discriminates (common-in-target up,
    // common-in-raw down; with singleton noise grams the add-one
    // smoothing floor would dominate at test-sized corpora)
    val target = (100L until 104L)
      .map(i => (i, "the cat sat on the mat")).toDF("doc_id", "text")
    val raw = (0L until 40L).map(i =>
      (i, if (i % 4 == 0) "the cat sat on the mat"
          else "zz qq vv ww xx yy")).toDF("doc_id", "text")
    val m = Importance.dsirFit(target, raw, buckets = 256)
    val s1 = Importance.dsirSample(raw, m, k = 10, buckets = 256)
      .orderBy("doc_id").collect()
    val s2 = Importance.dsirSample(raw, m, k = 10, buckets = 256)
      .orderBy("doc_id").collect()
    assert(s1.length == 10)
    assert(s1.map(_.getLong(0)).toSeq == s2.map(_.getLong(0)).toSeq)
    // replay one winner's key: avg micros + gumbel micros
    val w = Importance.dsirWeights(raw, m, buckets = 256).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    s1.foreach { r =>
      val id = r.getLong(0)
      val (ng, logw) = w(id)
      val score = if (ng == 0) 0L
        else math.round(math.round(logw * 1e6).toDouble / ng)
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(13)
      val u = (java.lang.Long.parseLong(hex, 16) + 1).toDouble / 4503599627370496.0
      val g = if (u >= 1.0) 37.0 else -math.log(-math.log(u))
      val g6 = BigDecimal(g).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val key = (score + math.round(g6 * 1e6)).toDouble / 1e6
      assert(math.abs(r.getAs[Double]("key") - key) < 1e-9, s"key doc $id")
    }
    // weight-proportional preference: the on-target quarter of the pool
    // (10 of 40 docs) must be over-represented in the k=10 sample
    val onTarget = s1.count(_.getLong(0) % 4 == 0)
    assert(onTarget > 5, s"expected on-target docs to dominate, got $onTarget/10")
  }

  test("dsirSample raises loudly on NULL and fractional ids (no silent draw loss)") {
    val target = Seq((0L, "a b")).toDF("doc_id", "text")
    val raw = Seq((0L, "a b"), (1L, "c d")).toDF("doc_id", "text")
    val m = Importance.dsirFit(target, raw, buckets = B)
    // a NULL id would draw a NULL Gumbel key and silently vanish
    val withNull = raw.withColumn("doc_id",
      when(col("doc_id") === 1L, lit(null).cast("long"))
        .otherwise(col("doc_id")))
    val eNull = intercept[Exception] {
      Importance.dsirSample(withNull, m, k = 1, buckets = B).collect()
    }
    assert(eNull.getMessage.contains("long-castable"), eNull.getMessage)
    // a fractional id truncates in the draw: 3.2 and 3.9 would collide
    val frac = Seq((3.2, "a b"), (3.9, "c d")).toDF("doc_id", "text")
    val eFrac = intercept[Exception] {
      Importance.dsirSample(frac, m, k = 1, buckets = B).collect()
    }
    assert(eFrac.getMessage.contains("INTEGRAL"), eFrac.getMessage)
  }

  test("dsirScore applies unchanged to a stream and is batch-identical") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows: Seq[(Long, String)] = Seq(
      (1L, "the cat sat on the mat"), (2L, "dog runs far"),
      (3L, "the the the"), (4L, "   "))
    val batch = rows.toDF("doc_id", "text")
    val lut = Importance
      .dsirFit(batch.filter(col("doc_id") <= 2), batch, buckets = B)
      .orderBy("bucket").collect().map(_.getLong(2))
    val input = MemoryStream[(Long, String)]
    val q = Importance.dsirScore(input.toDF().toDF("doc_id", "text"), lut)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("dsir_stream").start()
    try {
      input.addData(rows.take(2): _*); q.processAllAvailable()
      input.addData(rows.drop(2): _*); q.processAllAvailable()
      val got = spark.table("dsir_stream")
        .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
      val exp = Importance.dsirScore(batch, lut)
        .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
      assert(got == exp && got.nonEmpty,
        s"stream DSIR score diverged from batch: $got vs $exp")
    } finally q.stop()
  }
}
