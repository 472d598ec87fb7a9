package graft.operators

import graft.core.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ResampleSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // (key, ts_ms, tie, value): key "a" has a 3-bucket gap (buckets 0,1,4 at
  // step=10), key "b" one bucket; bucket 1 has an in-bucket tie on ts
  private val rows = Seq(
    ("a", 3L, 1L, 1.0), ("a", 7L, 2L, 2.0),
    ("a", 15L, 3L, 5.0), ("a", 15L, 4L, 6.0),
    ("a", 41L, 5L, 9.0),
    ("b", 100L, 6L, 42.0))

  private def run(df: org.apache.spark.sql.DataFrame) =
    Resample.resampleForwardFill(df, Seq("k"), "t", "v", "tie", stepMs = 10L)
      .orderBy("k", "bucket_ms")
      .select("k", "bucket_ms", "n_events", "sum_v", "last_v")
      .as[(String, Long, Long, Double, Double)].collect().toSeq

  test("grid is complete, gaps zero-fill, last value carries forward") {
    val got = run(rows.toDF("k", "t", "tie", "v"))
    assert(got == Seq(
      // bucket 0: two events, last by ts = 2.0
      ("a", 0L, 2L, 3.0, 2.0),
      // bucket 1: ts tie at 15 broken by tie col -> 6.0
      ("a", 10L, 2L, 11.0, 6.0),
      // empty buckets: zero events, zero sum, value carried forward
      ("a", 20L, 0L, 0.0, 6.0),
      ("a", 30L, 0L, 0.0, 6.0),
      ("a", 40L, 1L, 9.0, 9.0),
      ("b", 100L, 1L, 42.0, 42.0)))
  }

  test("result is invariant to input partitioning and order") {
    val base = run(rows.toDF("k", "t", "tie", "v"))
    val shuffled = run(rows.reverse.toDF("k", "t", "tie", "v").repartition(7))
    assert(base == shuffled)
  }

  private def runInterp(df: org.apache.spark.sql.DataFrame) =
    Resample.resampleInterpolate(df, Seq("k"), "t", "v", "tie", stepMs = 10L)
      .orderBy("k", "bucket_ms")
      .select("k", "bucket_ms", "n_events", "interp_v")
      .as[(String, Long, Long, Double)].collect().toSeq

  test("interpolation: anchors exact, gaps blend linearly, no extrapolation") {
    val got = runInterp(rows.toDF("k", "t", "tie", "v"))
    assert(got == Seq(
      // anchors emit their last-by-(ts, tie) value exactly
      ("a", 0L, 2L, 2.0),
      ("a", 10L, 2L, 6.0),
      // gap of 3 buckets from 6.0 (bucket 1) to 9.0 (bucket 4):
      // fractions 1/3 and 2/3 of the delta
      ("a", 20L, 0L, 7.0),
      ("a", 30L, 0L, 8.0),
      ("a", 40L, 1L, 9.0),
      // single-anchor key: its own value, no generated tail
      ("b", 100L, 1L, 42.0)))
    // partitioning invariance (the forward-fill discipline)
    val shuffled = runInterp(rows.reverse.toDF("k", "t", "tie", "v").repartition(7))
    assert(got == shuffled)
  }

  test("timeWeightedAvg equals the sequential zero-order-hold replay") {
    val rnd = new scala.util.Random(29)
    val data = Seq.tabulate(300) { i =>
      (s"k${rnd.nextInt(6)}", rnd.nextInt(1000).toLong, i.toLong,
        (rnd.nextInt(200) - 100) / 10.0)
    } :+ (("solo", 500L, 999L, 7.5)) // single-observation key
    val got = Resample.timeWeightedAvg(data.toDF("k", "t", "tie", "v"),
        keys = Seq("k"), tsMsCol = "t", valueCol = "v", tieCol = "tie")
      .orderBy("k")
      .as[(String, Long, Long, Double)].collect().toSeq
    val want = data.groupBy(_._1).toSeq.map { case (k, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      val span = sorted.last._2 - sorted.head._2
      val twa =
        if (span == 0) sorted.last._4
        else sorted.sliding(2).collect { case Seq(a, b) =>
          (b._2 - a._2) * a._4 }.sum / span
      (k, rows.size.toLong, span,
        BigDecimal(twa).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy(_._1)
    // compare twa at 5dp to keep float association order out of the gate
    def canon(r: (String, Long, Long, Double)) =
      (r._1, r._2, r._3, math.round(r._4 * 1e5))
    assert(got.map(canon) == want.map(canon),
      s"twa diverged:\ngot:  $got\nwant: $want")
  }

  test("ewma equals the sequential recurrence, across block boundaries") {
    // blockSize=4 forces multi-block keys: the cross-block s_in
    // composition path is what this gate exercises
    val rnd = new scala.util.Random(7)
    val data = (1 to 6).flatMap { k =>
      val n = 1 + rnd.nextInt(30)
      (1 to n).map(i => (s"k$k", rnd.nextInt(1000).toLong,
        (k * 1000 + i).toLong, rnd.nextDouble() * 100))
    }
    val got = Resample.ewma(
        data.toDF("k", "t", "tie", "v").repartition(7),
        keys = Seq("k"), alpha = 0.3, tsMsCol = "t", valueCol = "v",
        tieCol = "tie", blockSize = 4)
      .orderBy("k", "t", "tie")
      .select("k", "t", "tie", "v", "ewma")
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    val want = data.groupBy(_._1).toSeq.flatMap { case (k, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      sorted.tail.scanLeft(sorted.head._4) { (s, r) => 0.7 * s + 0.3 * r._4 }
        .zip(sorted).map { case (s, r) => (k, r._2, r._3, r._4, s) }
    }.sortBy(r => (r._1, r._2, r._3))
    assert(got.size == want.size)
    got.zip(want).foreach { case (g, w) =>
      assert((g._1, g._2, g._3, g._4) == (w._1, w._2, w._3, w._4))
      // got is pre-rounded to 6dp by the operator; tolerance-compare the
      // smoothed value (digit-rounding a rounded value trips boundaries)
      assert(math.abs(g._5 - w._5) < 1e-5, s"ewma diverged at $g vs $w")
    }
  }

  test("ewma single-row and single-block keys pass through exactly") {
    val got = Resample.ewma(
        Seq(("a", 1L, 1L, 5.0), ("b", 1L, 1L, 3.0), ("b", 2L, 2L, 7.0))
          .toDF("k", "t", "tie", "v"),
        keys = Seq("k"), alpha = 0.5, tsMsCol = "t", valueCol = "v",
        tieCol = "tie", blockSize = 256)
      .orderBy("k", "t")
      .select("k", "t", "ewma").as[(String, Long, Double)].collect().toSeq
    assert(got == Seq(("a", 1L, 5.0), ("b", 1L, 3.0), ("b", 2L, 5.0)))
  }

  test("decayedSum equals the sequential recurrence, across block boundaries") {
    val rnd = new scala.util.Random(19)
    val half = 1000.0 // ms
    val data = (1 to 5).flatMap { k =>
      val n = 1 + rnd.nextInt(25)
      var t = 0L
      (1 to n).map { i =>
        t += 1 + rnd.nextInt(3000)
        (s"k$k", t, (k * 1000 + i).toLong, rnd.nextDouble() * 10)
      }
    }
    val got = Resample.decayedSum(
        data.toDF("k", "t", "tie", "v").repartition(6),
        keys = Seq("k"), halfLifeMs = half.toLong, tsMsCol = "t",
        valueCol = "v", tieCol = "tie", blockSize = 4)
      .orderBy("k", "t", "tie")
      .select("k", "t", "tie", "v", "decayed")
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    val lam = math.log(2.0) / half
    val want = data.groupBy(_._1).toSeq.flatMap { case (k, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      var s = 0.0; var last = 0L; var first = true
      sorted.map { r =>
        s = if (first) r._4 else math.exp(-lam * (r._2 - last)) * s + r._4
        first = false; last = r._2
        (k, r._2, r._3, r._4, s)
      }
    }.sortBy(r => (r._1, r._2, r._3))
    assert(got.size == want.size)
    got.zip(want).foreach { case (g, w) =>
      assert((g._1, g._2, g._3, g._4) == (w._1, w._2, w._3, w._4))
      assert(math.abs(g._5 - w._5) < 1e-5, s"decayed diverged at $g vs $w")
    }
    // a long-silent key must have decayed toward its latest arrival
    val lastRow = got.last
    assert(lastRow._5 >= lastRow._4 - 1e-6, "score lost its newest weight")
  }

  test("ewma shuffles its input once: the second pass reuses the exchange") {
    // the emission and block-summary passes hang off canonically-equal
    // exchange subtrees; losing that (a column drifts between them) would
    // silently double the full-data shuffle at scale
    val data = (1 to 200).map(i => (s"k${i % 5}", i.toLong, i.toLong, i * 1.0))
    val df = Resample.ewma(data.toDF("k", "t", "tie", "v"),
      keys = Seq("k"), alpha = 0.2, tsMsCol = "t", valueCol = "v",
      tieCol = "tie", blockSize = 8)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert("ReusedExchange|ReusedQueryStage".r.findAllIn(p).nonEmpty,
      s"ewma's summary pass re-shuffled the input instead of reusing the exchange:\n${p.take(2000)}")
  }

  test("a NULL key group survives the segmented scans (family parity with cusum/twa)") {
    // the join-back keys on a struct of the keys (NULL fields compare
    // equal in struct equality) — a plain column equi-join would silently
    // drop the NULL-key group, diverging from the pure window/groupBy
    // members of the family (cusum, timeWeightedAvg), which keep it
    val data = Seq((Option.empty[String], 1L, 1L, 10.0),
      (Option.empty[String], 2L, 2L, 20.0), (Some("a"), 1L, 3L, 5.0))
    val ew = Resample.ewma(data.toDF("k", "t", "tie", "v"),
        keys = Seq("k"), alpha = 0.5, tsMsCol = "t", valueCol = "v",
        tieCol = "tie", blockSize = 1)
      .orderBy("t", "tie")
      .collect().map(r => (Option(r.getString(0)), r.getDouble(4))).toSeq
    assert(ew == Seq((None, 10.0), (Some("a"), 5.0), (None, 15.0)),
      s"NULL-key group lost or wrong in ewma: $ew")
    val ho = Resample.holt(data.toDF("k", "t", "tie", "v"),
        keys = Seq("k"), alpha = 0.5, beta = 0.5, tsMsCol = "t",
        valueCol = "v", tieCol = "tie", blockSize = 1)
      .filter(col("k").isNull).orderBy("t")
      .collect().map(r => r.getDouble(4)).toSeq
    assert(ho == Seq(10.0, 15.0), s"NULL-key group lost in holt: $ho")
  }

  test("a key spanning too many buckets fails loudly") {
    val wide = Seq(("a", 0L, 1L, 1.0), ("a", 10000000L, 2L, 2.0))
      .toDF("k", "t", "tie", "v")
    val e = intercept[Exception] {
      Resample.resampleForwardFill(wide, Seq("k"), "t", "v", "tie",
        stepMs = 2L, maxBuckets = 1000L).count()
    }
    assert(e.getMessage.contains("buckets"))
  }

  // ------------------------------------------------------- decompose --

  /** Sequential reference: classical additive decomposition with the
    * same trend/centering conventions (2xMA even, plain MA odd; phase
    * means of detrended; centered by the mean of defined phase means).
    */
  private def refDecompose(ys: Seq[Double], m: Int)
      : Seq[(Option[Double], Option[Double], Option[Double])] = {
    val n = ys.length
    val half = m / 2
    val trend = (0 until n).map { t =>
      if (m % 2 == 1) {
        if (t - half >= 0 && t + half < n)
          Some(ys.slice(t - half, t + half + 1).sum / m) else None
      } else {
        if (t - half >= 0 && t + half < n)
          Some((ys.slice(t - half, t + half).sum
            + ys.slice(t - half + 1, t + half + 1).sum) / (2.0 * m))
        else None
      }
    }
    val det = ys.zip(trend).map { case (y, tr) => tr.map(y - _) }
    val phaseMeans = (0 until m).map { p =>
      val vs = (p until n by m).flatMap(det)
      if (vs.isEmpty) None else Some(vs.sum / vs.size)
    }
    val defined = phaseMeans.flatten
    val center = defined.sum / defined.size
    val seasonal = (0 until n).map(t => phaseMeans(t % m).map(_ - center))
    (0 until n).map { t =>
      (trend(t), seasonal(t),
        for (tr <- trend(t); se <- seasonal(t)) yield ys(t) - tr - se)
    }
  }

  private def runDecompose(ys: Seq[Double], m: Int,
      partitions: Int = 4): Seq[(Option[Double], Option[Double], Option[Double])] = {
    val df = ys.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }
      .toDF("k", "ord", "v").repartition(partitions)
    Resample.decompose(df, Seq("k"), "ord", "v", m)
      .orderBy("ord")
      .collect()
      .map(r => (Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Double]),
        Option(r.get(5)).map(_.asInstanceOf[Double])))
      .toSeq
  }

  private def close(a: Option[Double], b: Option[Double]): Boolean =
    (a, b) match {
      case (Some(x), Some(y)) => math.abs(x - y) < 1e-9
      case (None, None) => true
      case _ => false
    }

  test("decompose: a pure trend+seasonal series recovers both exactly") {
    // y_t = t + (+5 at even phase, -5 at odd), period 2: interior trend
    // is exactly t, detrended exactly +-5, seasonal +-5, residual 0
    val ys = (0 until 8).map(t => t.toDouble + (if (t % 2 == 0) 5.0 else -5.0))
    val got = runDecompose(ys, 2)
    assert(got.head == ((None, Some(5.0), None)))      // edge: no trend
    assert(got.last == ((None, Some(-5.0), None)))
    for (t <- 1 until 7) {
      assert(close(got(t)._1, Some(t.toDouble)), s"trend at $t: ${got(t)}")
      assert(close(got(t)._2, Some(if (t % 2 == 0) 5.0 else -5.0)))
      assert(close(got(t)._3, Some(0.0)), s"residual at $t: ${got(t)}")
    }
  }

  test("decompose equals the sequential reference (odd and even periods)") {
    val rnd = new scala.util.Random(86L)
    for (m <- Seq(3, 4, 7); n <- Seq(m + 1, 40)) {
      val ys = Seq.fill(n)(math.rint(rnd.nextDouble() * 1000) / 10)
      val got = runDecompose(ys, m)
      val ref = refDecompose(ys, m)
      for (((g, r), idx) <- got.zip(ref).zipWithIndex)
        assert(close(g._1, r._1) && close(g._2, r._2) && close(g._3, r._3),
          s"m=$m n=$n row $idx: got $g ref $r")
    }
  }

  test("decompose is invariant to input partitioning") {
    val rnd = new scala.util.Random(87L)
    val ys = Seq.fill(50)(rnd.nextDouble() * 100)
    assert(runDecompose(ys, 4, partitions = 1) == runDecompose(ys, 4, partitions = 9))
  }

  test("seasonalHolt: fitted = level + seasonal, and the scan sees the adjusted series") {
    val rnd = new scala.util.Random(88L)
    val m = 4
    val ys = (0 until 32).map(t =>
      0.5 * t + Seq(3.0, -1.0, -2.5, 0.5)(t % m) + rnd.nextDouble())
    val df = ys.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }
      .toDF("k", "ord", "v")
    val got = Resample.seasonalHolt(df, Seq("k"), "ord", "v", m,
        alpha = 0.3, beta = 0.2, blockSize = 8)
      .orderBy("ord").collect()
    assert(got.length == 32)
    // sequential replay: reference decomposition then the holt recurrence
    val ref = refDecompose(ys, m)
    val adj = ys.zip(ref).map { case (y, (_, se, _)) => y - se.get }
    var level = adj.head; var trend = 0.0
    for ((r, t) <- got.zipWithIndex) {
      if (t > 0) {
        val l2 = 0.3 * adj(t) + 0.7 * (level + trend)
        trend = 0.2 * (l2 - level) + 0.8 * trend
        level = l2
      }
      val seasonal = r.getDouble(2)
      assert(math.abs(seasonal - ref(t)._2.get) < 1e-9, s"seasonal at $t")
      assert(math.abs(r.getDouble(3) - adj(t)) < 1e-9, s"adjusted at $t")
      assert(math.abs(r.getDouble(4) - level) < 1e-5, s"level at $t")
      assert(math.abs(r.getDouble(6) - (r.getDouble(4) + seasonal)) < 1e-6,
        s"fitted != level + seasonal at $t")
    }
  }
}
