package graft.llmops

import graft.core.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurationSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("decontaminate flags an eval doc copied into the train corpus") {
    val train = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta"),
      (1L, "one two three four five six seven eight nine"),
      (2L, "completely unrelated training text about spark engines")
    ).toDF("doc_id", "text")
    val eval = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta"), // verbatim leak
      (101L, "totally novel held out evaluation sentence here")
    ).toDF("doc_id", "text")
    val rows = Curation.decontaminate(train, eval, shingleK = 3, minOverlap = 0.5)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(100L).getAs[Boolean]("contaminated"))
    assert(rows(100L).getAs[Double]("overlap_frac") == 1.0)
    assert(!rows(101L).getAs[Boolean]("contaminated"))
    assert(rows(101L).getAs[Long]("n_hit") == 0L)
  }

  test("decontaminate overlap_frac is fractional for partial leaks") {
    val train = Seq((0L, "a b c d e f")).toDF("doc_id", "text")
    // shares shingles "a b c", "b c d" of its 4 3-shingles -> 0.5
    val eval = Seq((9L, "a b c d x y")).toDF("doc_id", "text")
    val r = Curation.decontaminate(train, eval, shingleK = 3, minOverlap = 0.4)
      .collect().head
    assert(r.getAs[Long]("n_shingles") == 4L)
    assert(r.getAs[Long]("n_hit") == 2L)
    assert(r.getAs[Double]("overlap_frac") == 0.5)
    assert(r.getAs[Boolean]("contaminated"))
  }

  test("sampleStrata is deterministic, respects per-stratum fractions, and 0/1 are exact") {
    val docs = (0L until 4000L).map(i => (i, s"s${i % 4}")).toDF("doc_id", "source")
    val frac = Map("s0" -> 0.0, "s1" -> 1.0, "s2" -> 0.5)
    val sample = Curation.sampleStrata(docs, "source", frac, defaultFraction = 0.25)
    val counts = sample.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!counts.contains("s0"))
    assert(counts("s1") == 1000L)
    assert(math.abs(counts("s2") - 500L) < 100, s"s2=${counts.get("s2")}")
    assert(math.abs(counts("s3") - 250L) < 80, s"s3=${counts.get("s3")}")
    // deterministic: the same rows survive on a second run
    val ids1 = sample.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = Curation.sampleStrata(docs, "source", frac, defaultFraction = 0.25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
  }

  test("sampleStrata: ids congruent mod 1000003 draw independently (wide granularity)") {
    // the old single-modulus draw made every id in a `mod 1000003` residue
    // class share fate — at billion-doc scale each class was kept or
    // dropped as a ~1000-doc block. The two-coprime-moduli draw must split
    // such pairs: with keep-rate 0.5 over 200 congruent pairs, some pair
    // must diverge (P[all agree] = 2^-200 under independence).
    val pairs = (0L until 200L).flatMap(i => Seq(i, i + 1000003L))
    val docs = pairs.map(i => (i, "s")).toDF("doc_id", "source")
    val kept = Curation.sampleStrata(docs, "source", Map("s" -> 0.5))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val diverging = (0L until 200L).count(i =>
      kept.contains(i) != kept.contains(i + 1000003L))
    assert(diverging > 0,
      "congruent-mod-1000003 ids always share fate — the draw collapsed to one modulus")
    // still deterministic and near the requested rate
    assert(math.abs(kept.size - 200) < 60, s"kept=${kept.size} of 400 at rate 0.5")
  }

  test("packSequences: bins fill sequentially per source, docs split across boundaries") {
    // token counts: "w w w w" = 4 tokens each; budget 10
    val docs = Seq(
      (0L, "s", "w w w w"),    // tokens [0,4)   -> bin 0
      (1L, "s", "w w w w"),    // tokens [4,8)   -> bin 0
      (2L, "s", "w w w w"),    // tokens [8,12)  -> bins 0..1 (splits)
      (3L, "s", "w w w w"),    // tokens [12,16) -> bin 1
      (10L, "t", "w w w w")    // separate source restarts at bin 0
    ).toDF("doc_id", "source", "text")
    val rows = Curation.packSequences(docs, budget = 10)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(0L).getAs[Long]("first_bin") == 0L && rows(0L).getAs[Long]("last_bin") == 0L)
    assert(rows(1L).getAs[Long]("first_bin") == 0L && rows(1L).getAs[Long]("last_bin") == 0L)
    assert(rows(2L).getAs[Long]("first_bin") == 0L && rows(2L).getAs[Long]("last_bin") == 1L)
    assert(rows(2L).getAs[Long]("n_bins") == 2L)
    assert(rows(3L).getAs[Long]("first_bin") == 1L && rows(3L).getAs[Long]("last_bin") == 1L)
    assert(rows(10L).getAs[Long]("first_bin") == 0L)
  }

  test("packSequences: empty doc occupies its start boundary without advancing bins") {
    val docs = Seq(
      (0L, "s", "w w w"),  // [0,3) -> bin 0
      (1L, "s", ""),       // 1 empty token? bpe count of "" is 0 -> bin 0
      (2L, "s", "w w w")   // [3,6) -> bin 0 with budget 10
    ).toDF("doc_id", "source", "text")
    val rows = Curation.packSequences(docs, budget = 10)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getAs[Long]("n_tokens") == 0L)
    assert(rows(1L).getAs[Long]("first_bin") == 0L && rows(1L).getAs[Long]("n_bins") == 1L)
    assert(rows(2L).getAs[Long]("last_bin") == 0L)
  }

  test("shuffleShards: deterministic, contiguous per-shard positions, balanced-ish") {
    val docs = (0L until 800L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val a = Curation.shuffleShards(docs, numShards = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val b = Curation.shuffleShards(docs, numShards = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(a.toSet === b.toSet, "shuffle is not deterministic across runs")
    assert(a.length === 800 && a.forall(t => t._2 >= 0 && t._2 < 4))
    // positions are exactly 0..n-1 within each shard (a training loader
    // can seek by (shard, pos) with no gaps)
    a.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (0L until rows.length).toSeq,
        s"shard $shard positions not contiguous")
    }
    // md5 keys spread uniformly: no shard is pathologically skewed
    val sizes = a.groupBy(_._2).values.map(_.length)
    assert(sizes.min > 100 && sizes.max < 300, s"shard sizes $sizes")
    // and the order is NOT the id order (it actually shuffled)
    val shard0 = a.filter(_._2 == 0L).sortBy(_._3).map(_._1).toSeq
    assert(shard0 != shard0.sorted, "in-shard order degenerated to id order")
  }

  test("trainValTestSplit: pure, exhaustive, disjoint, proportional-ish") {
    val docs = (0L until 2000L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val a = Curation.trainValTestSplit(docs, valFrac = 0.1, testFrac = 0.2)
      .select("doc_id", "split").collect().map(r => (r.getLong(0), r.getString(1)))
    // purity: identical assignment on re-run and under other partitioning
    val b = Curation.trainValTestSplit(docs.repartition(13), 0.1, 0.2)
      .select("doc_id", "split").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(a.sorted.sameElements(b.sorted))
    // exhaustive + disjoint by construction (one label per row); rough
    // proportions from the md5 buckets
    val byLabel = a.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byLabel.keySet == Set("train", "val", "test"))
    assert(math.abs(byLabel("val") - 200) < 60 && math.abs(byLabel("test") - 400) < 80,
      s"split sizes drifted: $byLabel")
    // degenerate fractions refuse loudly
    intercept[IllegalArgumentException](
      Curation.trainValTestSplit(docs, 0.8, 0.3))
  }

  test("sampleFixedPerStratum: exact counts, stable membership, pure") {
    val docs = (0L until 900L).map(i => (i, s"l${i % 3}")).toDF("doc_id", "lang")
    val a = graft.llmops.Curation.sampleFixedPerStratum(docs, "lang", n = 25)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(a.groupBy(_._2).view.mapValues(_.length).toMap ==
      Map("l0" -> 25, "l1" -> 25, "l2" -> 25))
    // purity: same membership under different partitioning
    val b = graft.llmops.Curation.sampleFixedPerStratum(
        docs.repartition(11), "lang", n = 25)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(a.sorted.sameElements(b.sorted))
    // a stratum smaller than n returns whole
    val tiny = graft.llmops.Curation.sampleFixedPerStratum(
      docs.filter(col("doc_id") < 5), "lang", n = 25).count()
    assert(tiny == 5L)
  }

  test("capPerStratum: budget prefix in md5 order, pure, unweighted = top-N") {
    val docs = (0L until 300L).map(i => (i, s"s${i % 3}", 100L))
      .toDF("doc_id", "source", "n_chars")
    // 100 rows x 100 chars per stratum, budget 1000 → exactly 10 kept each
    val a = graft.llmops.Curation
      .capPerStratum(docs, "source", budget = 1000, weightCol = Some("n_chars"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(a.groupBy(_._2).view.mapValues(_.length).toMap ==
      Map("s0" -> 10, "s1" -> 10, "s2" -> 10))
    // purity: identical membership under different partitioning
    val b = graft.llmops.Curation
      .capPerStratum(docs.repartition(13), "source", budget = 1000,
        weightCol = Some("n_chars"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(a.sorted.sameElements(b.sorted))
    // kept set = the md5-order PREFIX: every kept row ranks before every
    // dropped row of its stratum in md5(id) order
    val ranked = docs.withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))))
      .collect().map(r => (r.getLong(0), r.getInt(3))).toMap
    val keptIds = a.map(_._1).toSet
    assert(keptIds.forall(id => ranked(id) <= 10),
      "a kept row ranked past the budget prefix")
    // unweighted degenerates to the plain top-N-rows cap
    val n = graft.llmops.Curation.capPerStratum(docs, "source", budget = 7)
      .groupBy("source").count().collect().map(_.getLong(1))
    assert(n.forall(_ == 7L))
    // a stratum under budget keeps everything
    val whole = graft.llmops.Curation.capPerStratum(
      docs.filter(col("doc_id") < 5), "source", budget = 1000,
      weightCol = Some("n_chars")).count()
    assert(whole == 5L)
    intercept[IllegalArgumentException](
      graft.llmops.Curation.capPerStratum(docs, "source", budget = 0))
  }

  // Independent reference for the priority-sampling key: same math as
  // Curation.priorityKey but via java MessageDigest, no Spark involved.
  private def refPriority(id: Long, w: Double): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(id.toString.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    val u52 = java.lang.Long.parseLong(hex.substring(0, 13), 16)
    w / ((u52 + 1).toDouble / 4503599627370496.0)
  }

  test("prioritySample: exact top-k by the w/u priority key, tau estimator") {
    val n = 200
    val rows = (1L to n).map(i => (i, (i % 17 + 1) * 10L))
    val df = rows.toDF("doc_id", "w")
    val k = 25
    val got = Curation.prioritySample(df.repartition(7), k, "w")
      .select("doc_id", "w", "priority", "w_hat")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    // expected: k highest reference priorities, tau = (k+1)-th
    val pris = rows.map { case (id, w) => (id, w, refPriority(id, w.toDouble)) }
      .sortBy(t => (-t._3, t._1))
    val expIds = pris.take(k).map(_._1).toSet
    val tau = pris(k)._3
    assert(got.length == k)
    assert(got.map(_._1).toSet == expIds)
    got.foreach { case (id, w, pri, wHat) =>
      assert(pri == refPriority(id, w.toDouble), s"priority mismatch for $id")
      assert(wHat == math.max(w.toDouble, tau), s"w_hat mismatch for $id")
    }
    // population <= k: exhaustive sample, tau = 0, w_hat = w exactly
    val small = Seq((1L, 5L), (2L, 7L)).toDF("doc_id", "w")
    val all = Curation.prioritySample(small, 10, "w")
      .select("doc_id", "w_hat").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    assert(all.toSeq == Seq((1L, 5.0), (2L, 7.0)))
  }

  test("prioritySample fuzz: random sizes/weights/partitionings all equal the reference") {
    val rnd = new scala.util.Random(1313L)
    for (round <- 1 to 12) {
      val n = 1 + rnd.nextInt(300)
      val k = 1 + rnd.nextInt(40)
      val parts = 1 + rnd.nextInt(9)
      // ids sparse and shuffled; weights any positive double shape
      val rows = rnd.shuffle((1 to n).map(_ => rnd.nextLong(1000000L) + 1L)
        .distinct.toList).map { id =>
        (id, math.exp(rnd.nextGaussian() * 3)) // spans ~1e-4 .. 1e4
      }
      val got = Curation.prioritySample(
          rows.toDF("doc_id", "w").repartition(parts), k, "w")
        .select("doc_id", "priority", "w_hat")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
        .sortBy(_._1).toSeq
      val ranked = rows.map { case (id, w) => (id, w, refPriority(id, w)) }
        .sortBy(t => (-t._3, t._1))
      val expSel = ranked.take(k)
      val tau = if (ranked.length > k) ranked(k)._3 else 0.0
      val exp = expSel.map { case (id, w, p) =>
        (id, p, math.max(w, tau)) }.sortBy(_._1)
      assert(got == exp,
        s"round $round (n=$n k=$k parts=$parts): fuzz mismatch")
    }
  }

  test("prioritySampleByStratum: exact per-stratum top-k, per-stratum tau") {
    val rows = for (s <- Seq("a", "b", "c"); i <- 1L to 60L)
      yield (i + (s.head - 'a') * 1000L, s, (i % 13 + 1) * 10L)
    val df = rows.toDF("doc_id", "stratum", "w")
    val k = 7
    val got = Curation
      .prioritySampleByStratum(df.repartition(5), k, "w", "stratum")
      .select("doc_id", "stratum", "w", "priority", "w_hat")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(got.length == 3 * k)
    for (s <- Seq("a", "b", "c")) {
      val mine = rows.filter(_._2 == s)
        .map { case (id, _, w) => (id, w, refPriority(id, w.toDouble)) }
        .sortBy(t => (-t._3, t._1))
      val expIds = mine.take(k).map(_._1).toSet
      val tau = mine(k)._3
      val g = got.filter(_._2 == s)
      assert(g.map(_._1).toSet == expIds, s"stratum $s ids differ")
      g.foreach { case (id, _, w, pri, wHat) =>
        assert(pri == refPriority(id, w.toDouble))
        assert(wHat == math.max(w.toDouble, tau), s"stratum $s tau differs")
      }
    }
    // small stratum: exhaustive with tau = 0
    val withTiny = (rows :+ (9999L, "tiny", 5L)).toDF("doc_id", "stratum", "w")
    val tiny = Curation.prioritySampleByStratum(withTiny, k, "w", "stratum")
      .filter(col("stratum") === "tiny")
      .select("doc_id", "w_hat").collect()
    assert(tiny.length == 1 && tiny.head.getDouble(1) == 5.0)
  }

  test("prioritySample: non-positive or non-numeric weights raise loudly") {
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    for (bad <- Seq(Seq(10.0, 0.0), Seq(10.0, -1.0))) {
      val e = intercept[Exception] {
        Curation.prioritySample(
          bad.zipWithIndex.map { case (w, i) => (i.toLong, w) }
            .toDF("doc_id", "w"), 5, "w").collect()
      }
      assert(msgs(e).exists(m => m != null && m.contains("prioritySample")),
        s"expected the weight guard for $bad, got $e")
    }
    val eStr = intercept[Exception] {
      Curation.prioritySample(
        Seq((1L, "ten"), (2L, "20")).toDF("doc_id", "w"), 5, "w").collect()
    }
    assert(msgs(eStr).exists(m => m != null && m.contains("prioritySample")))
    intercept[IllegalArgumentException](
      Curation.prioritySample(Seq((1L, 1L)).toDF("doc_id", "w"), 0, "w"))
  }

  test("capPerStratum: zero/negative/fractional weights raise loudly (clean-prefix contract)") {
    // the guard lives in the plan (the weight is data, not a parameter):
    // any offending row must fail the job, never silently re-admit rows
    // after the budget trips (w<=0) or under-count (fractional cast-trunc)
    def run(ws: Seq[Double]): Unit = graft.llmops.Curation
      .capPerStratum(
        ws.zipWithIndex.map { case (w, i) => (i.toLong, "s", w) }
          .toDF("doc_id", "source", "w"),
        "source", budget = 100, weightCol = Some("w"))
      .collect()
    for (bad <- Seq(Seq(10.0, 0.0), Seq(10.0, -3.0), Seq(10.0, 2.5))) {
      val e = intercept[Exception](run(bad))
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
      assert(msgs(e).exists(m => m != null && m.contains("capPerStratum")),
        s"expected the capPerStratum weight guard to fire for $bad, got $e")
    }
    // integral doubles are fine (exact long values in a double column)
    run(Seq(10.0, 20.0, 30.0))
    // a NON-NUMERIC weight column must also raise: the string casts to
    // NULL double, and a bare isNull first disjunct would let the whole
    // WHEN condition go NULL -> otherwise -> NULL weight (silent zero
    // contribution instead of the loud failure the contract promises)
    val eStr = intercept[Exception] {
      graft.llmops.Curation.capPerStratum(
          Seq((0L, "s", "ten"), (1L, "s", "20")).toDF("doc_id", "source", "w"),
          "source", budget = 100, weightCol = Some("w"))
        .collect()
    }
    def msgs2(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs2(x.getCause))
    assert(msgs2(eStr).exists(m => m != null && m.contains("capPerStratum")),
      s"expected the weight guard to fire for a non-numeric weight, got $eStr")
  }

  test("temperatureMix: exact keep set equals an independent reference; alpha flattens; guards raise") {
    // skewed strata: "big" 300 docs, "mid" 60, "small" 20
    val rows = (1L to 300L).map(i => (i, "big")) ++
      (1001L to 1060L).map(i => (i, "mid")) ++
      (2001L to 2020L).map(i => (i, "small"))
    val df = rows.toDF("doc_id", "lang")
    val budget = 120L
    val got = Curation.temperatureMix(df.repartition(5), "lang", budget)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // independent reference: plain Scala recompute of rates + draw
    def draw(id: Long): Long =
      ((id % 1000003 + 1) * 2654435761L + (id % 999983 + 1) * 2246822519L) % 4294967296L
    val counts = rows.groupBy(_._2).map { case (s, g) => s -> g.size.toLong }
      .toSeq.sortBy(_._1)
    val total = counts.map(_._2).sum.toDouble
    var z = 0.0
    counts.foreach { case (_, n) => z += math.sqrt(n / total) }
    val rates = counts.map { case (s, n) =>
      val r = math.min(1.0, budget.toDouble * (math.sqrt(n / total) / z) / n.toDouble)
      s -> BigDecimal(r).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    val exp = rows.filter { case (id, s) =>
      draw(id) < rates(s) * 4294967296.0
    }.map(_._1).toSet
    assert(got == exp, "keep set differs from the independent reference")
    // flattening: smaller strata keep a HIGHER fraction under alpha = 0.5
    assert(rates("small") > rates("mid") && rates("mid") > rates("big"),
      s"rates not flattened: $rates")
    // alpha = 1 reproduces natural proportions: one uniform keep-rate
    val natural = Curation.temperatureMix(df, "lang", budget, alpha = 1.0)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // uniform rate ~ budget/N = 0.316: every stratum downsamples by the
    // SAME fraction (binomial noise aside, each stays well below its size)
    assert(natural.values.sum < 200L && natural("big") > 5 * natural("small"),
      s"alpha=1 should keep natural skew, got $natural")
    intercept[IllegalArgumentException](
      Curation.temperatureMix(df, "lang", 0L))
    intercept[IllegalArgumentException](
      Curation.temperatureMix(df, "lang", 10L, alpha = 0.0))
    intercept[IllegalArgumentException](
      Curation.temperatureMix(df.withColumn("lang", col("doc_id")), "lang", 10L))
  }

  test("temperatureMix: NULL is a stratum of its own (counted, rated, sampled — never silently dropped)") {
    // the prioritySampleByStratum <=> discipline: silent stratum loss is
    // a bias bug — rows with a NULL strataCol must be sampled at the
    // NULL stratum's own flattened rate, not vanish
    val rows: Seq[(Long, Option[String])] =
      (1L to 300L).map(i => (i, Some("big"))) ++
      (2001L to 2020L).map(i => (i, Some("small"))) ++
      (5001L to 5050L).map(i => (i, Option.empty[String]))
    val df = rows.toDF("doc_id", "lang")
    val budget = 120L
    val got = Curation.temperatureMix(df.repartition(5), "lang", budget)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    def draw(id: Long): Long =
      ((id % 1000003 + 1) * 2654435761L + (id % 999983 + 1) * 2246822519L) % 4294967296L
    // independent reference: NULL sorts LAST in the Z fold (the oracle's
    // ORDER BY s NULLS LAST), then the same recipe
    val counts: Seq[(Option[String], Long)] =
      Seq(Some("big") -> 300L, Some("small") -> 20L, None -> 50L)
    val total = counts.map(_._2).sum.toDouble
    var z = 0.0
    counts.foreach { case (_, n) => z += math.sqrt(n / total) }
    val rates = counts.map { case (s, n) =>
      val r = math.min(1.0, budget.toDouble * (math.sqrt(n / total) / z) / n.toDouble)
      s -> BigDecimal(r).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    val exp = rows.filter { case (id, s) =>
      draw(id) < rates(s) * 4294967296.0
    }.map(_._1).toSet
    assert(got == exp, "keep set differs from the independent reference")
    // and the NULL stratum genuinely contributed rows
    assert(exp.exists(_ >= 5001L), "NULL stratum drew no rows — bad test setup")
    assert(got.exists(_ >= 5001L), "NULL-stratum rows were dropped")
  }

  test("temperatureMix: more strata than maxStrata raises loudly before flooding the driver") {
    val df = (1L to 500L).map(i => (i, s"s$i")).toDF("doc_id", "lang")
    val e = intercept[IllegalArgumentException](
      Curation.temperatureMix(df, "lang", 100L, maxStrata = 100))
    assert(e.getMessage.contains("maxStrata") ||
        e.getMessage.contains("distinct strata"), e.getMessage)
    // and the cap is a limit on DISTINCT STRATA, not rows: many rows in
    // few strata sail through
    val ok = Curation.temperatureMix(
        (1L to 500L).map(i => (i, s"s${i % 5}")).toDF("doc_id", "lang"),
        "lang", 100L, maxStrata = 100)
      .count()
    assert(ok > 0)
  }

  test("temperatureMix exactBudget: water-fills clamped residual; matches iterative renormalization; hits the budget") {
    // "small" saturates (its flattened target exceeds its 4 rows), so the
    // default clamp undershoots; exactBudget redistributes the residual
    val rows = (1L to 300L).map(i => (i, "big")) ++
      (1001L to 1060L).map(i => (i, "mid")) ++
      (2001L to 2004L).map(i => (i, "small"))
    val df = rows.toDF("doc_id", "lang")
    val budget = 120L
    val counts = Seq(("big", 300L), ("mid", 60L), ("small", 4L))
    val total = counts.map(_._2).sum.toDouble
    val qs = counts.map { case (s, n) => (s, n, math.sqrt(n / total)) }
    // reference 1: the CLASSIC iterative renormalization loop (clamp,
    // re-level over the unclamped, repeat to fixpoint) — an independent
    // formulation of water-filling the prefix scan must agree with
    def iterative(): Map[String, Double] = {
      var clamped = Set.empty[String]
      while (true) {
        val residual = budget.toDouble - qs.filter(c => clamped(c._1)).map(_._2).sum
        val zu = qs.filterNot(c => clamped(c._1)).map(_._3).sum
        val lam = residual / zu
        val newly = qs.filterNot(c => clamped(c._1))
          .filter(c => lam >= c._2.toDouble / c._3).map(_._1)
        if (newly.isEmpty)
          return qs.map { case (s, n, q) =>
            s -> (if (clamped(s)) 1.0 else lam * q / n.toDouble)
          }.toMap
        clamped ++= newly
      }
      sys.error("unreachable")
    }
    val refRates = iterative()
    assert(refRates("small") == 1.0, s"small should clamp: $refRates")
    // reference 2: the operator's own prefix-scan recipe, recomputed
    // independently (ratio sort, running sums, first clearing level,
    // 9dp round) — pins the EXACT keep set through the certified draw
    val byRatio = qs.map { case (s, n, q) => (s, n, q, n.toDouble / q) }
      .sortBy(_._4)
    val cn = byRatio.scanLeft(0L)(_ + _._2)
    val cq = byRatio.scanLeft(0.0)(_ + _._3)
    val zT = cq.last
    val firstSat = byRatio.indices
      .find(i => (budget.toDouble - cn(i).toDouble) / (zT - cq(i)) < byRatio(i)._4)
      .map(_ + 1).getOrElse(byRatio.length + 1)
    val lam = (budget.toDouble - cn(firstSat - 1).toDouble) / (zT - cq(firstSat - 1))
    val exactRates = byRatio.zipWithIndex.map { case ((s, n, q, _), i) =>
      s -> (if (i + 1 < firstSat) 1.0
            else math.min(1.0, BigDecimal(lam * q / n.toDouble)
              .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }.toMap
    // the two formulations agree (to the 9dp rounding the operator applies)
    for ((s, r) <- exactRates)
      assert(math.abs(r - math.min(1.0, refRates(s))) < 1e-6,
        s"prefix scan vs iterative diverge at $s: $r vs ${refRates(s)}")
    // realized EXPECTED total ~ budget (the whole point of the mode);
    // the default clamp mode undershoots on the same data
    val realized = counts.map { case (s, n) => n * exactRates(s) }.sum
    assert(math.abs(realized - budget.toDouble) < 0.01,
      s"exactBudget expected total $realized != $budget")
    val clampOnly = {
      var z = 0.0
      qs.sortBy(_._1).foreach(z += _._3)
      counts.map { case (s, n) =>
        val q = math.sqrt(n / total)
        n * math.min(1.0, budget.toDouble * (q / z) / n.toDouble)
      }.sum
    }
    assert(clampOnly < budget.toDouble - 1.0,
      s"test setup: default mode should undershoot, got $clampOnly")
    // the operator's exact keep set equals the recipe's
    def draw(id: Long): Long =
      ((id % 1000003 + 1) * 2654435761L + (id % 999983 + 1) * 2246822519L) % 4294967296L
    val got = Curation.temperatureMix(df.repartition(7), "lang", budget,
        exactBudget = true)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val exp = rows.filter { case (id, s) =>
      draw(id) < exactRates(s) * 4294967296.0
    }.map(_._1).toSet
    assert(got == exp, "exactBudget keep set differs from the recipe")
    // clamped strata are kept WHOLE
    assert((2001L to 2004L).forall(got), "clamped stratum not fully kept")
    // budget >= N keeps everything
    val all = Curation.temperatureMix(df, "lang", 1000L, exactBudget = true)
      .count()
    assert(all == rows.size.toLong, s"budget >= N should keep all, got $all")
  }

  test("temperatureRates + applyStratumRates: a static fit applies to a STREAM batch-identically") {
    // the fit/apply split's purpose: the count+collect fit runs on a
    // static reference corpus, the rate filter is a stateless narrow
    // map — so a live ingest stream can be mixed with the SAME certified
    // draw, and sealed output equals the batch filter row-for-row
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows: Seq[(Long, Option[String])] =
      (1L to 200L).map(i => (i, Some(if (i <= 150) "big" else "small"))) ++
      (901L to 920L).map(i => (i, Option.empty[String]))
    val batch = rows.toDF("doc_id", "lang")
    val rates = Curation.temperatureRates(batch, "lang", budget = 60L)
    assert(rates.exists(_._1.isEmpty), "NULL stratum must carry a rate")
    val input = MemoryStream[(Long, Option[String])]
    val q = Curation.applyStratumRates(
        input.toDF().toDF("doc_id", "lang"), "lang", rates)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("tmix_stream").start()
    try {
      input.addData(rows: _*); q.processAllAvailable()
      val got = spark.table("tmix_stream").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      val exp = Curation.applyStratumRates(batch, "lang", rates)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got == exp && got.nonEmpty,
        s"stream mix diverged from batch: ${got.size} vs ${exp.size}")
      // and the batch path through temperatureMix is the same set
      val direct = Curation.temperatureMix(batch, "lang", 60L)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(direct == exp)
    } finally q.stop()
  }

  test("temperatureRates exactBudget fuzz: random strata/budgets match iterative water-filling; expected total hits min(budget, N)") {
    val rnd = new scala.util.Random(77L)
    for (round <- 1 to 20) {
      val k = 1 + rnd.nextInt(8)
      val counts = (1 to k).map(i => s"s$i" -> (1L + rnd.nextInt(400)))
      val total = counts.map(_._2).sum
      val budget = 1L + rnd.nextInt((total * 1.3).toInt).toLong
      var id = 0L
      val rows = counts.flatMap { case (s, n) =>
        (1L to n).map { _ => id += 1; (id, s) }
      }
      val df = rows.toDF("doc_id", "lang")
      val got = Curation.temperatureRates(df, "lang", budget,
          exactBudget = true)
        .collect { case (Some(s), r) => s -> r }.toMap
      // independent ITERATIVE water-filling (clamp, re-level, repeat)
      val qs = counts.map { case (s, n) =>
        (s, n, math.sqrt(n.toDouble / total.toDouble)) }
      var clamped = Set.empty[String]
      var ref = Map.empty[String, Double]
      var done = false
      while (!done) {
        val residual = budget.toDouble -
          qs.filter(c => clamped(c._1)).map(_._2).sum
        val zu = qs.filterNot(c => clamped(c._1)).map(_._3).sum
        val lam = residual / zu
        val newly = qs.filterNot(c => clamped(c._1))
          .filter(c => lam >= c._2.toDouble / c._3).map(_._1)
        if (newly.isEmpty) {
          ref = qs.map { case (s, n, q) =>
            s -> (if (clamped(s)) 1.0
                  else math.min(1.0, lam * q / n.toDouble))
          }.toMap
          done = true
        } else clamped ++= newly
      }
      for ((s, r) <- got)
        assert(math.abs(r - ref(s)) < 1e-6,
          s"round $round (k=$k budget=$budget counts=$counts): " +
            s"prefix scan vs iterative diverge at $s: $r vs ${ref(s)}")
      val realized = counts.map { case (s, n) => n * got(s) }.sum
      val want = math.min(budget.toDouble, total.toDouble)
      assert(math.abs(realized - want) < 1e-3,
        s"round $round: expected total $realized != $want " +
          s"(budget=$budget N=$total counts=$counts rates=$got)")
    }
  }

  test("corpusReport: per-source integer sums and 6dp averages match a hand computation (NULL text = zero-length doc)") {
    val docs = Seq(
      (1L, Some("the cat sat on the mat"), "web"),       // 6 toks, 22 chars
      (2L, Some("def f(x):\n    return x;"), "web"),     // code-ish
      (3L, Some("bro\uFFFDken text\u0001"), "crawl"),  // 1 repl + 1 ctrl
      (4L, Some("   "), "crawl"),                        // 0 tokens, 3 chars
      (5L, Option.empty[String], "crawl")                // NULL text
    ).toDF("doc_id", "text", "source")
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Curation.corpusReport(docs).orderBy("source")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getDouble(8), r.getDouble(9), r.getDouble(10)))
    val crawl = got(0); val web = got(1)
    assert(crawl._1 == "crawl" && web._1 == "web")
    // crawl: 3 docs (the NULL-text doc COUNTS, as a zero-length one —
    // a NULL-skipping sum would deflate every average); tokens 2+0+0;
    // chars 13+3+0; no code; 1 repl; 1 ctrl; 1 latin doc (doc 3)
    assert(crawl == ("crawl", 3L, 2L, 16L, 0L, 1L, 1L, 1L,
      r6(2.0 / 3), r6(16.0 / 3), r6(1.0 / 3)), s"got $crawl")
    // web: 2 docs; 6 + 4 tokens; 22 + 23 chars; doc 2 routes code; both latin
    val codeScore2 = docs.filter(col("doc_id") === 2L)
      .select(graft.functions.Text.codeScore(col("text"))).head.getDouble(0)
    assert(codeScore2 >= 0.5, s"test setup: doc 2 should score code ($codeScore2)")
    assert(web == ("web", 2L, 10L, 45L, 1L, 0L, 0L, 2L, 5.0, 22.5, 1.0),
      s"got $web")
  }

  test("applyStratumRates: flat literal-map lookup analyzes + executes at the FULL default maxStrata cap (10k)") {
    // the r15 form folded a nested when().otherwise() per stratum — a
    // |strata|-DEEP expression tree that risks an opaque analyzer
    // StackOverflowError at the fit's default maxStrata = 10000, far
    // below the fit's loud guard. The flat form is ONE map node with
    // 2*|strata| children; draws are checked against a direct Scala
    // replay of the certified Knuth draw (the same semantics the CASE
    // chain computed), stratum rates 1.0/0.5/0.0 all exercised.
    val k = 10000
    def rate(i: Int): Double = (i % 3) * 0.5 // 0.0, 0.5, 1.0 by stratum
    val rates: Seq[(Option[String], Double)] =
      (0 until k).map(i => (Option(s"s$i"), rate(i)))
    val rows = (1L to 600L).map(i => (i, s"s${(i % k).toInt}"))
    val df = rows.toDF("doc_id", "lang")
    val got = Curation.applyStratumRates(df, "lang", rates)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    def draw(id: Long): Long = Math.floorMod(
      (Math.floorMod(id, 1000003L) + 1L) * 2654435761L +
        (Math.floorMod(id, 999983L) + 1L) * 2246822519L, 4294967296L)
    val exp = rows.filter { case (id, s) =>
      draw(id) < rate(s.stripPrefix("s").toInt) * 4294967296.0
    }.map(_._1).toSet
    assert(got == exp && got.nonEmpty && got.size < rows.size,
      s"flat lookup draws diverge: ${got.size} kept vs ${exp.size}")
    // NULL stratum + unseen strata (default: dropped at 0.0) draw the
    // same as the r15 CASE semantics
    val small: Seq[(Option[String], Double)] =
      Seq((Option("a"), 1.0), (Option("b"), 0.5), (None, 0.5))
    val rows2: Seq[(Long, Option[String])] =
      (1L to 300L).map(i => (i, Some(Seq("a", "b", "zz")((i % 3).toInt)))) ++
        (301L to 400L).map(i => (i, Option.empty[String]))
    val got2 = Curation.applyStratumRates(
        rows2.toDF("doc_id", "lang"), "lang", small)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val exp2 = rows2.filter { case (id, s) =>
      val r = s match {
        case Some("a") => 1.0
        case Some("b") => 0.5
        case Some(_) => 0.0 // unseen stratum: default Some(0.0) drop
        case None => 0.5
      }
      draw(id) < r * 4294967296.0
    }.map(_._1).toSet
    assert(got2 == exp2 && got2.nonEmpty)
    assert(!exp2.exists(id => id % 3 == 2 && id <= 300),
      "unseen stratum zz must drop at the 0.0 default")
  }

  test("applyStratumRates unseenRate: None raises loudly on a never-fitted stratum; Some(r) keeps it at r") {
    val rates: Seq[(Option[String], Double)] = Seq((Option("a"), 1.0))
    val df = Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("doc_id", "lang")
    // default: unseen stratum silently drops (documented mix semantics)
    val kept = Curation.applyStratumRates(df, "lang", rates)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L))
    // Some(1.0): unseen stratum kept wholesale
    val all = Curation.applyStratumRates(df, "lang", rates,
        unseenRate = Some(1.0)).count()
    assert(all == 3L)
    // None: the STRICT streaming option — first unseen row raises
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    val e = intercept[Exception](
      Curation.applyStratumRates(df, "lang", rates, unseenRate = None)
        .collect())
    assert(msgs(e).exists(m => m != null &&
        m.contains("absent from the fitted rates")),
      s"expected the strict unseen-stratum guard, got $e")
    // NULL strata hit the same strict guard when the fit never saw NULL
    val dfN = Seq((Some(1L), Some("a")), (Some(2L), Option.empty[String]))
      .toDF("doc_id", "lang")
    val eN = intercept[Exception](
      Curation.applyStratumRates(dfN, "lang", rates, unseenRate = None)
        .collect())
    assert(msgs(eN).exists(m => m != null &&
      m.contains("absent from the fitted rates")))
  }

  test("knuthDraw samplers: fractional numeric ids raise loudly (truncation would collide distinct ids); integral doubles draw value-identically") {
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    // 3.2 and 3.9 both try_cast to 3: without the guard two DISTINCT
    // ids share one draw fate — silent collision, not a loud error
    val frac = Seq((3.2, "a"), (3.9, "a")).toDF("doc_id", "lang")
    val e = intercept[Exception](
      Curation.sampleStrata(frac, "lang", Map("a" -> 0.5)).collect())
    assert(msgs(e).exists(m => m != null && m.contains("INTEGRAL")),
      s"expected the integral-id guard, got $e")
    val e2 = intercept[Exception](
      Curation.temperatureMix(frac, "lang", 1L).collect())
    assert(msgs(e2).exists(m => m != null && m.contains("INTEGRAL")))
    // integral doubles pass and draw exactly like their long value
    val dblKeep = Curation.sampleStrata(
        (1 to 200).map(i => (i.toDouble, "a")).toDF("doc_id", "lang"),
        "lang", Map("a" -> 0.35))
      .select(col("doc_id").cast("long")).collect().map(_.getLong(0)).toSet
    val longKeep = Curation.sampleStrata(
        (1 to 200).map(i => (i.toLong, "a")).toDF("doc_id", "lang"),
        "lang", Map("a" -> 0.35))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(dblKeep == longKeep && dblKeep.nonEmpty)
  }

  test("knuthDraw samplers: NULL / non-long-castable ids raise loudly (no silent row loss)") {
    // a NULL or garbage id draws NULL, the keep predicate goes NULL, and
    // the row silently vanishes from the sample — the silent-bias hole
    // the priority family's guardedLongId closed; the fractional family
    // (sampleStrata / sampleByWeight / temperatureMix) shares one guard
    // inside the draw itself
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    def expectLoud(f: => Unit, what: String): Unit = {
      val e = intercept[Exception](f)
      assert(msgs(e).exists(m => m != null && m.contains("long-castable")),
        s"$what: expected the id guard, got $e")
    }
    val nullId = Seq((Some(1L), "a"), (None, "a"))
      .toDF("doc_id", "lang")
    expectLoud(Curation.sampleStrata(nullId, "lang", Map("a" -> 0.5)).collect(),
      "sampleStrata NULL id")
    expectLoud(Curation.temperatureMix(nullId, "lang", 1L).collect(),
      "temperatureMix NULL id")
    val strId = Seq(("docA", "a", 0.5), ("17", "a", 0.5))
      .toDF("doc_id", "lang", "w")
    expectLoud(Curation.sampleByWeight(strId, "w").collect(),
      "sampleByWeight garbage id")
    // numeric-string ids are long-castable and draw like their value
    val okStr = Seq(("1", "a"), ("2", "a"))
      .toDF("doc_id", "lang")
    val gotStr = Curation.sampleStrata(okStr, "lang", Map("a" -> 1.0))
      .count()
    assert(gotStr == 2L)
  }

  test("prioritySample/byStratum: non-long-castable ids raise loudly (no silent empty sample)") {
    // the winner set is keyed on idCol cast to long: without the guard a
    // string doc-id corpus casts to NULL, the TopKBy buffer skips every
    // row, and the caller gets an EMPTY "sample" with no error — the
    // silent-bias failure the weight guard prevents, one column over
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    val strIds = Seq(("docA", 10.0), ("docB", 20.0)).toDF("doc_id", "w")
    val e1 = intercept[Exception](
      Curation.prioritySample(strIds, 5, "w").collect())
    assert(msgs(e1).exists(m => m != null && m.contains("id column")),
      s"expected the id guard, got $e1")
    val e2 = intercept[Exception](
      Curation.prioritySampleByStratum(
        Seq(("docA", "s", 10.0), ("docB", "s", 20.0))
          .toDF("doc_id", "stratum", "w"), 5, "w", "stratum").collect())
    assert(msgs(e2).exists(m => m != null && m.contains("id column")),
      s"expected the id guard, got $e2")
    // numeric-STRING ids are long-castable and sample fine (same winners
    // as the long-typed equivalent: the priority hashes the string form,
    // which for a numeric string equals the long's toString)
    val numStr = Seq(("1", 10.0), ("2", 20.0), ("3", 30.0)).toDF("doc_id", "w")
    val ok = Curation.prioritySample(numStr, 2, "w")
      .select("doc_id").collect().map(_.getString(0)).toSet
    val okLong = Curation.prioritySample(
        Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("doc_id", "w"), 2, "w")
      .select("doc_id").collect().map(_.getLong(0).toString).toSet
    assert(ok == okLong)
  }

  test("prioritySampleByStratum: a NULL stratum is sampled, not silently dropped") {
    // the winner join-back is null-safe (<=>): NULL-stratum winners must
    // survive — a plain equi-join would select them in the aggregate and
    // then drop them on the way back
    val rows: Seq[(Long, Option[String], Double)] =
      (1L to 30L).map(i => (i, Some("a"), (i % 7 + 1).toDouble)) ++
        (101L to 130L).map(i => (i, None: Option[String], (i % 5 + 1).toDouble))
    val df = rows.toDF("doc_id", "stratum", "w")
    val k = 4
    val got = Curation.prioritySampleByStratum(df.repartition(3), k, "w", "stratum")
      .select("doc_id", "stratum", "priority", "w_hat").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getDouble(2), r.getDouble(3)))
    assert(got.count(_._2.isEmpty) == k, "NULL stratum must contribute k rows")
    assert(got.count(_._2.contains("a")) == k)
    // NULL-stratum winners are the reference top-k of exactly those rows
    val mine = rows.filter(_._2.isEmpty)
      .map { case (id, _, w) => (id, refPriority(id, w)) }
      .sortBy(t => (-t._2, t._1))
    assert(got.filter(_._2.isEmpty).map(_._1).toSet == mine.take(k).map(_._1).toSet)
    got.filter(_._2.isEmpty).foreach { case (id, _, _, wHat) =>
      val tau = mine(k)._2
      val w = rows.find(_._1 == id).get._3
      assert(wHat == math.max(w, tau))
    }
  }

  test("prioritySampleByStratum: winner broadcast past maxBroadcastWinners raises loudly") {
    // k x |strata| bounds the broadcast join-back; past the cap the
    // single-partition counter must raise (the skylineN discipline),
    // never silently single-node a huge frame
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    val rows = for (s <- 1 to 20; i <- 1 to 3)
      yield (s * 100L + i, s.toString, i.toDouble)
    val df = rows.toDF("doc_id", "stratum", "w")
    val e = intercept[Exception](
      Curation.prioritySampleByStratum(df, 2, "w", "stratum",
        maxBroadcastWinners = 10).collect())
    assert(msgs(e).exists(m => m != null && m.contains("winner set exceeded")),
      s"expected the broadcast cap guard, got $e")
    // under the cap the same frame samples normally
    val ok = Curation.prioritySampleByStratum(df, 2, "w", "stratum",
      maxBroadcastWinners = 40)
    assert(ok.count() == 40L)
  }

  test("redactPii replaces emails, phones, and IPs and counts each kind") {
    val docs = Seq(
      (0L, "mail me at jane.doe+x@example.org or call 555-123-4567 from 10.0.0.1"),
      (1L, "no pii here at all")
    ).toDF("doc_id", "text")
    val rows = Curation.redactPii(docs).collect().map(r => r.getLong(0) -> r).toMap
    val r0 = rows(0L)
    assert(r0.getAs[Int]("n_emails") == 1)
    assert(r0.getAs[Int]("n_phones") == 1)
    assert(r0.getAs[Int]("n_ips") == 1)
    assert(r0.getAs[String]("redacted") ==
      "mail me at <EMAIL> or call <PHONE> from <IP>")
    val r1 = rows(1L)
    assert(r1.getAs[Int]("n_emails") == 0 && r1.getAs[String]("redacted") == "no pii here at all")
  }

  test("redactPii counts agree with the emitted tags when kinds overlap") {
    // phone-shaped digits inside an email's local part: the email pass
    // consumes them, so NO <PHONE> tag is emitted — n_phones must be 0,
    // not 1 (counts are computed on the progressively-redacted text)
    val docs = Seq((0L, "reach 555-123-4567@example.com now")).toDF("doc_id", "text")
    val r = Curation.redactPii(docs).collect().head
    assert(r.getAs[Int]("n_emails") == 1)
    assert(r.getAs[Int]("n_phones") == 0, "counted a phone the email pass consumed")
    val red = r.getAs[String]("redacted")
    assert(red == "reach <EMAIL> now")
    // per-kind tag counts in the output match the reported counts
    assert("<EMAIL>".r.findAllIn(red).size == r.getAs[Int]("n_emails"))
    assert("<PHONE>".r.findAllIn(red).size == r.getAs[Int]("n_phones"))
  }

  test("corpusDrift surfaces movers, one-sided tokens, and signed deltas") {
    val old = Seq((0L, "alpha alpha beta"), (1L, "alpha gone")).toDF("doc_id", "text")
    val neu = Seq((2L, "alpha beta beta"), (3L, "beta fresh")).toDF("doc_id", "text")
    val rows = Curation.corpusDrift(old, neu, topK = 10).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    // old: alpha 3/5, beta 1/5, gone 1/5; new: alpha 1/5, beta 3/5, fresh 1/5
    assert(rows("alpha") == (0.6, 0.2, -0.4))
    assert(rows("beta") == (0.2, 0.6, 0.4))
    assert(rows("gone") == (0.2, 0.0, -0.2), "token absent from new must read p_new=0")
    assert(rows("fresh") == (0.0, 0.2, 0.2), "token absent from old must read p_old=0")
    // ordering: biggest |delta| first, ties by token
    val ordered = Curation.corpusDrift(old, neu, topK = 10).collect().map(_.getString(0)).toSeq
    assert(ordered.take(2) == Seq("alpha", "beta"))
  }

  test("corpusDrift is partition-count invariant and respects topK") {
    val a = (0L until 300L).map(i => (i, s"w${i % 17} filler common")).toDF("doc_id", "text")
    val b = (0L until 300L).map(i => (i, s"w${i % 11} filler common")).toDF("doc_id", "text")
    val one = Curation.corpusDrift(a.repartition(1), b.repartition(1), topK = 5)
      .collect().map(_.toSeq)
    val wide = Curation.corpusDrift(a.repartition(13), b.repartition(7), topK = 5)
      .collect().map(_.toSeq)
    assert(one.length == 5 && one.toSeq == wide.toSeq)
  }
  test("winsorize clips to the group's exact interpolated quantiles") {
    import spark.implicits._
    // group g: values 1..10 -> p25 = 3.25, p75 = 7.75 (linear interp);
    // group h constant -> bounds equal the value, nothing clips
    val df = ((1 to 10).map(v => ("g", v.toDouble)) :+ ("h", 5.0))
      .toDF("k", "v")
    val got = Curation.winsorize(df, Seq("k"), "v", loQ = 0.25, hiQ = 0.75)
      .orderBy("k", "v").as[(String, Double, Double)].collect().toSeq
    val gClipped = got.filter(_._1 == "g").map(_._3)
    assert(gClipped == Seq(3.25, 3.25, 3.25, 4.0, 5.0, 6.0, 7.0, 7.75, 7.75, 7.75))
    assert(got.filter(_._1 == "h").map(_._3) == Seq(5.0))
    // every clipped value sits inside the bounds; interior values untouched
    assert(got.forall { case (_, v, w) => w >= 3.25 || v == 5.0 })
  }

  test("winsorize approx mode clips with the same plan shape") {
    import spark.implicits._
    val df = (1 to 1000).map(v => ("g", v.toDouble)).toDF("k", "v")
    val got = Curation.winsorize(df, Seq("k"), "v", loQ = 0.01, hiQ = 0.99,
        exact = false)
      .agg(org.apache.spark.sql.functions.min("v_w"),
        org.apache.spark.sql.functions.max("v_w"))
      .as[(Double, Double)].collect().head
    // t-digest bounds land within a loose tolerance of the exact ones
    assert(math.abs(got._1 - 10.99) < 5 && math.abs(got._2 - 990.01) < 5, s"$got")
  }
}
