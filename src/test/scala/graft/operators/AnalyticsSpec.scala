package graft.operators

import graft.core.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Reference-model fuzz for [[Analytics]]: the one-window-pass funnel
  * must equal a sequential per-entity replay, at depths beyond the
  * catalog row's three stages and with/without the horizon bound.
  */
class AnalyticsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def refFunnel(
      rows: Seq[(Long, Long, Long, String)], // key, ts, tie, type
      stages: Seq[String],
      horizon: Option[Long]): Map[Long, Seq[Option[Long]]] =
    rows.groupBy(_._1).map { case (k, evs) =>
      val sorted = evs.sortBy(e => (e._2, e._3))
      val frontier = Array.fill[Option[Long]](stages.length)(None)
      for ((_, ts, _, tpe) <- sorted; i <- stages.indices
           if frontier(i).isEmpty && tpe == stages(i)) {
        val prevOk = i == 0 || frontier(i - 1).exists(ts >= _)
        val horizonOk = i == 0 ||
          horizon.forall(h => frontier.head.exists(v => ts - v <= h))
        if (prevOk && horizonOk) frontier(i) = Some(ts)
      }
      k -> frontier.toSeq
    }

  test("funnelStages equals a sequential replay on random streams (depth 4)") {
    val rnd = new Random(81L)
    val types = Seq("a", "b", "c", "d")
    for (round <- 0 until 3; horizon <- Seq(None, Some(50L))) {
      val rows = (0 until 400).map { i =>
        (rnd.nextInt(12).toLong, rnd.nextInt(200).toLong, i.toLong,
          types(rnd.nextInt(types.length)))
      }
      val df = rows.toDF("user_id", "ts_ms", "event_id", "event_type")
      val got = Analytics.funnelStages(df,
          stages = types.map(t => t -> (col("event_type") === t)),
          keys = Seq("user_id"), horizonMs = horizon)
        .collect().map { r =>
          r.getLong(0) -> (1 to 4).map(i => Option(r.get(i)).map(_.asInstanceOf[Long]))
        }.toMap
      val expect = refFunnel(rows, types, horizon)
      assert(got == expect, s"round $round horizon $horizon:\n" +
        (got.keySet ++ expect.keySet).toSeq.sorted
          .filter(k => got.get(k) != expect.get(k))
          .map(k => s"  key $k got ${got.get(k)} expect ${expect.get(k)}")
          .mkString("\n"))
    }
  }

  /** Replay model for PREDICATE stages (possibly overlapping): one event
    * may complete several stages in order — matching the window pass,
    * where stage i's gate reads stage i-1's frontier INCLUDING the
    * current row.
    */
  private def refFunnelPred(
      rows: Seq[(Long, Long, Long, Long)], // key, ts, tie, v
      preds: Seq[Long => Boolean],
      horizon: Option[Long]): Map[Long, Seq[Option[Long]]] =
    rows.groupBy(_._1).map { case (k, evs) =>
      val sorted = evs.sortBy(e => (e._2, e._3))
      val frontier = Array.fill[Option[Long]](preds.length)(None)
      for ((_, ts, _, v) <- sorted; i <- preds.indices
           if frontier(i).isEmpty && preds(i)(v)) {
        val prevOk = i == 0 || frontier(i - 1).exists(ts >= _)
        val horizonOk = i == 0 ||
          horizon.forall(h => frontier.head.exists(ts - _ <= h))
        if (prevOk && horizonOk) frontier(i) = Some(ts)
      }
      k -> frontier.toSeq
    }

  test("funnelStages fuzz: overlapping predicates, ts ties, horizon boundaries") {
    // 240 independent histories (keys) across 6 jobs: tiny ts range so
    // ties are common, horizon 10 over ts 0..15 so boundary (== h) and
    // just-past (== h+1) gaps both occur, and v-threshold stages OVERLAP
    // (v=4 satisfies all three), so one event can cascade several stages
    val rnd = new Random(97L)
    val preds: Seq[Long => Boolean] = Seq(_ >= 1L, _ >= 2L, _ >= 3L)
    for (round <- 0 until 3; horizon <- Seq(None, Some(10L))) {
      val rows = (0 until 600).map { i =>
        (rnd.nextInt(40).toLong, rnd.nextInt(16).toLong, i.toLong,
          rnd.nextInt(5).toLong)
      }
      val df = rows.toDF("user_id", "ts_ms", "event_id", "v")
      val got = Analytics.funnelStages(df,
          stages = Seq("s1" -> (col("v") >= 1), "s2" -> (col("v") >= 2),
            "s3" -> (col("v") >= 3)),
          keys = Seq("user_id"), horizonMs = horizon)
        .collect().map { r =>
          r.getLong(0) -> (1 to 3).map(i => Option(r.get(i)).map(_.asInstanceOf[Long]))
        }.toMap
      val expect = refFunnelPred(rows, preds, horizon)
      assert(got == expect, s"round $round horizon $horizon:\n" +
        (got.keySet ++ expect.keySet).toSeq.sorted
          .filter(k => got.get(k) != expect.get(k))
          .map(k => s"  key $k got ${got.get(k)} expect ${expect.get(k)}")
          .mkString("\n"))
    }
  }

  test("funnelStages horizon boundary: exactly-h qualifies, h+1 does not") {
    // key 1: stage2 lands exactly at horizon (10 - 0 == 10 <= 10)
    // key 2: stage2 one past the horizon (11 - 0 > 10) — never completes
    // key 3: same-ts cascade — one event (v=3) completes all three stages
    val rows = Seq(
      (1L, 0L, 0L, 1L), (1L, 10L, 1L, 2L),
      (2L, 0L, 2L, 1L), (2L, 11L, 3L, 2L),
      (3L, 5L, 4L, 3L))
    val got = Analytics.funnelStages(
        rows.toDF("user_id", "ts_ms", "event_id", "v"),
        stages = Seq("s1" -> (col("v") >= 1), "s2" -> (col("v") >= 2),
          "s3" -> (col("v") >= 3)),
        keys = Seq("user_id"), horizonMs = Some(10L))
      .collect().map { r =>
        r.getLong(0) -> (1 to 3).map(i => Option(r.get(i)).map(_.asInstanceOf[Long]))
      }.toMap
    assert(got(1L) == Seq(Some(0L), Some(10L), None))
    assert(got(2L) == Seq(Some(0L), None, None))
    assert(got(3L) == Seq(Some(5L), Some(5L), Some(5L)))
  }

  test("funnelCounts is monotone non-increasing across stages") {
    val rnd = new Random(82L)
    val rows = (0 until 300).map { i =>
      (rnd.nextInt(10).toLong, rnd.nextInt(100).toLong, i.toLong,
        Seq("x", "y", "z")(rnd.nextInt(3)))
    }
    val counts = Analytics.funnelCounts(
        rows.toDF("user_id", "ts_ms", "event_id", "event_type"),
        stages = Seq("x" -> (col("event_type") === "x"),
          "y" -> (col("event_type") === "y"),
          "z" -> (col("event_type") === "z")),
        keys = Seq("user_id")).head()
    assert(counts.getLong(0) >= counts.getLong(1) &&
      counts.getLong(1) >= counts.getLong(2), s"not monotone: $counts")
  }

  test("cohortRetention equals a per-entity replay") {
    val rnd = new Random(83L)
    val rows = (0 until 500).map { i =>
      (rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong, i.toLong, "e")
    }
    val period = 100L
    val got = Analytics.cohortRetention(
        rows.toDF("user_id", "ts_ms", "event_id", "event_type"),
        keyCol = "user_id", periodMs = period)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expect = rows.groupBy(_._1).toSeq.flatMap { case (_, evs) =>
      val periods = evs.map(_._2 / period).distinct
      val cohort = periods.min
      periods.map(p => (cohort, p - cohort))
    }.groupBy(identity).map { case ((c, o), xs) => (c, o, xs.size.toLong) }.toSet
    assert(got == expect)
  }

  // ------------------------------------------------------ attribution --

  // rows: (user, ts, id, type, value); conv type "p", touches "c"/"v"
  private def refAttribution(
      rows: Seq[(Long, Long, Long, String, Double)],
      look: Long): Map[(String, String), (Long, Double)] = {
    val touches = rows.filter(r => r._4 == "c" || r._4 == "v")
    val cells = scala.collection.mutable.Map[(String, String), (Long, Double)]()
    def add(model: String, ch: String, credit: Double): Unit = {
      val (n, c) = cells.getOrElse((model, ch), (0L, 0.0))
      cells((model, ch)) = (n + 1, c + credit)
    }
    for ((u, ts, _, _, value) <- rows.filter(_._4 == "p")) {
      val w = touches.filter(t => t._1 == u && t._2 >= ts - look && t._2 < ts)
        .sortBy(t => (t._2, t._3))
      if (w.nonEmpty) {
        add("first_touch", w.head._4, value)
        add("last_touch", w.last._4, value)
        w.groupBy(_._4).foreach { case (ch, g) =>
          add("linear", ch, value * g.size / w.size)
        }
      }
    }
    cells.toMap
  }

  private def runAttribution(rows: Seq[(Long, Long, Long, String, Double)],
      look: Long): Map[(String, String), (Long, Double)] =
    Analytics.attribution(
        rows.toDF("user_id", "ts_ms", "event_id", "event_type", "value"),
        convType = "p", touchTypes = Seq("c", "v"), lookbackMs = look,
        binSizeMs = look)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap

  test("attribution: hand case with window and instant boundaries") {
    val rows = Seq(
      (1L, 5L, 1L, "c", 0.0),   // AT window start (15 - 10): included
      (1L, 6L, 2L, "v", 0.0),   // in window
      (1L, 10L, 3L, "c", 0.0),  // in window
      (1L, 15L, 4L, "c", 0.0),  // AT the conversion instant: excluded
      (1L, 15L, 5L, "p", 100.0),
      (2L, 40L, 6L, "p", 50.0)) // no touches: unattributable, dropped
    // user 1 window [5, 15): touches c@5, v@6, c@10
    val got = runAttribution(rows, look = 10L)
    val expect = Map(
      ("first_touch", "c") -> ((1L, 100.0)),  // c@5 is the earliest in [5,15)
      ("last_touch", "c") -> ((1L, 100.0)),   // c@10 the latest before 15
      ("linear", "c") -> ((1L, 200.0 / 3)),   // 2 of 3 touches
      ("linear", "v") -> ((1L, 100.0 / 3)))
    assert(got.keySet == expect.keySet)
    for ((k, (n, c)) <- expect) {
      assert(got(k)._1 == n, s"$k n_conv")
      assert(math.abs(got(k)._2 - c) < 1e-9, s"$k credit: ${got(k)._2} vs $c")
    }
  }

  test("attribution: same-timestamp touches break ties on the tie column") {
    val rows = Seq(
      (7L, 10L, 1L, "v", 0.0), (7L, 10L, 2L, "c", 0.0), // tie on ts: ids order
      (7L, 12L, 3L, "p", 10.0))
    val got = runAttribution(rows, look = 100L)
    assert(got(("first_touch", "v"))._1 == 1L) // id 1 < id 2
    assert(got(("last_touch", "c"))._1 == 1L)
  }

  test("attribution equals a sequential per-user replay on random streams") {
    val rnd = new Random(84L)
    for (look <- Seq(30L, 120L)) {
      val rows = (0 until 600).map { i =>
        val tpe = rnd.nextInt(5) match {
          case 0 => "p"; case 1 | 2 => "c"; case _ => "v"
        }
        (rnd.nextInt(15).toLong, rnd.nextInt(300).toLong, i.toLong, tpe,
          math.rint(rnd.nextDouble() * 10000) / 100)
      }
      val got = runAttribution(rows, look)
      val expect = refAttribution(rows, look)
      assert(got.keySet == expect.keySet, s"cells at look=$look")
      for ((k, (n, c)) <- expect) {
        assert(got(k)._1 == n, s"$k n_conv at look=$look")
        assert(math.abs(got(k)._2 - c) < 1e-6, s"$k credit at look=$look")
      }
    }
  }

  test("attribution is invariant to input partitioning") {
    val rnd = new Random(85L)
    val rows = (0 until 300).map { i =>
      val tpe = if (i % 4 == 0) "p" else if (i % 2 == 0) "c" else "v"
      (rnd.nextInt(8).toLong, rnd.nextInt(200).toLong, i.toLong, tpe, 1.0)
    }
    val df = rows.toDF("user_id", "ts_ms", "event_id", "event_type", "value")
    def run(d: org.apache.spark.sql.DataFrame) =
      Analytics.attribution(d, "p", Seq("c", "v"), 50L, binSizeMs = 50L)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
          math.rint(r.getDouble(3) * 1e6))).toSet
    assert(run(df.coalesce(1)) == run(df.repartition(13)))
  }

  test("basketRules: hand case — counts, both directions, a-priori pruning") {
    // baskets: {a,b,c} {a,b} {a,c} {a} {d} — d is infrequent at 0.3
    val bi = Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "c"), (4L, "a"), (5L, "d"), (1L, "a") /* dup row */)
      .toDF("basket", "item")
    val got = Analytics.basketRules(bi, "basket", "item",
        minSupport = 0.3, minConfidence = 0.0)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        math.rint(r.getDouble(4) * 1e6) / 1e6)).toSet
    // n=5 baskets; a:4 b:2 c:2; ab:2 ac:2 (support .4); bc:1 (.2 < .3, out)
    assert(got == Set(
      ("a", "b", 2L, 0.5), ("b", "a", 2L, 1.0),
      ("a", "c", 2L, 0.5), ("c", "a", 2L, 1.0)))
  }

  test("basketRules equals a brute-force pair count on random baskets") {
    val rnd = new Random(77L)
    val rows = (0 until 1200).map { _ =>
      (rnd.nextInt(120).toLong, s"i${rnd.nextInt(12)}") }.distinct
    val minSup = 0.05
    val nB = rows.map(_._1).distinct.size.toDouble
    val byBasket = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val pairCnt = byBasket.values.toSeq
      .flatMap(s => s.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.size).toMap
    val itemCnt = rows.groupBy(_._2).view.mapValues(_.size).toMap
    val expect = pairCnt.toSeq
      .flatMap { case ((x, y), n) => Seq((x, y, n), (y, x, n)) }
      .filter { case (_, _, n) => n / nB >= minSup }
      .map { case (x, y, n) =>
        (x, y, n.toLong, math.rint(n / itemCnt(x).toDouble * 1e6) / 1e6) }
      .toSet
    val got = Analytics.basketRules(rows.toDF("basket", "item"),
        "basket", "item", minSupport = minSup)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        math.rint(r.getDouble(4) * 1e6) / 1e6)).toSet
    assert(got == expect)
  }

  test("skyline2 equals brute-force dominance on random points, any partitioning") {
    val rnd = new Random(42L)
    val pts = (0 until 400).map(_ => (rnd.nextInt(50) * 1.0, rnd.nextInt(40)))
    val cells = pts.groupBy(identity).view.mapValues(_.size).toMap
    val frontier = cells.keySet.filter { case (lo, hi) =>
      !cells.keySet.exists { case (lo2, hi2) =>
        lo2 <= lo && hi2 >= hi && (lo2 < lo || hi2 > hi) } }
    val expect = frontier.map { case (lo, hi) => (lo, hi, cells((lo, hi)).toLong) }
    def run(df: org.apache.spark.sql.DataFrame) =
      Analytics.skyline2(df, "price", "size")
        .collect().map(r => (r.getDouble(0), r.getInt(1), r.getLong(2))).toSet
    val df = pts.toDF("price", "size")
    assert(run(df.coalesce(1)) == expect)
    assert(run(df.repartition(13)) == expect)
  }

  test("skylineN equals brute-force 3-d dominance on random points, any partitioning") {
    val rnd = new Random(7L)
    val pts = (0 until 600).map(_ =>
      (rnd.nextInt(30) * 1.0, rnd.nextInt(20) * 1.0, rnd.nextInt(10) * 1.0))
    val cells = pts.groupBy(identity).view.mapValues(_.size).toMap
    val frontier = cells.keySet.filter { case (a, b, c) =>
      !cells.keySet.exists { case (a2, b2, c2) =>
        a2 <= a && b2 >= b && c2 >= c && (a2 < a || b2 > b || c2 > c) } }
    val expect = frontier.map { case (a, b, c) => (a, b, c, cells((a, b, c)).toLong) }
    def run(df: org.apache.spark.sql.DataFrame) =
      Analytics.skylineN(df, minCols = Seq("cost"),
          maxCols = Seq("perf", "life"))
        .collect()
        .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
        .toSet
    val df = pts.toDF("cost", "perf", "life")
    assert(run(df.coalesce(1)) == expect)
    assert(run(df.repartition(17)) == expect)
    // d=2 via skylineN agrees with skyline2's frontier on the same data
    val two = Analytics.skylineN(df, Seq("cost"), Seq("perf"))
      .select("cost", "perf").collect()
      .map(r => (r.getDouble(0), r.getDouble(1))).toSet
    val sk2 = Analytics.skyline2(df, "cost", "perf")
      .select("cost", "perf").collect()
      .map(r => (r.getDouble(0), r.getDouble(1))).toSet
    assert(two == sk2)
  }

  test("skylineN: the merged-candidate guard fails loudly, NULL attrs excluded") {
    // anti-correlated exact diagonal: every cell is on the frontier, so
    // the merge sees every cell — a tiny cap must trip
    val diag = (0 until 500).map(i => (i * 1.0, i * 1.0)).toDF("a", "b")
    val ex = intercept[Exception] {
      Analytics.skylineN(diag, Seq("a"), Seq("b"), maxCandidates = 100)
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("candidate set exceeded")))
    // NULLs can't rank
    val withNull = Seq((1.0, Some(2.0)), (0.5, None)).toDF("a", "b")
    val got = Analytics.skylineN(withNull, Seq("a"), Seq("b")).collect()
    assert(got.length == 1 && got(0).getDouble(0) == 1.0)
  }

  test("skylines reject non-numeric attributes with a clear boundary error") {
    // skyline2 quantile-buckets minCol (cast to double) — a string/date
    // attribute would silently degrade to one bucket or fail mid-plan,
    // so the boundary requires numeric loudly
    val df = Seq(("x", 1.0), ("y", 2.0)).toDF("s", "v")
    val e2 = intercept[IllegalArgumentException](
      Analytics.skyline2(df, minCol = "s", maxCol = "v"))
    assert(e2.getMessage.contains("must be numeric"))
    val eN = intercept[IllegalArgumentException](
      Analytics.skylineN(df, minCols = Seq("v"), maxCols = Seq("s")))
    assert(eN.getMessage.contains("must be numeric"))
  }

  test("basketRules: a basket wider than maxBasketItems fails LOUDLY") {
    val bi = (0 until 30).map(i => (1L, s"i$i")).toDF("basket", "item")
    val ex = intercept[Exception] {
      Analytics.basketRules(bi, "basket", "item",
        minSupport = 0.001, maxBasketItems = 10).collect()
    }
    assert(ex.getMessage.contains("wider than") ||
      Option(ex.getCause).exists(_.getMessage.contains("wider than")))
  }
}
