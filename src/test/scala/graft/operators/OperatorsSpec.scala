package graft.operators

import graft.core.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OperatorsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("asofJoinBackward: inclusive backward match with tie-break") {
    val left = Seq((1L, 10L), (1L, 20L), (1L, 25L), (2L, 5L))
      .toDF("k", "t")
    val right = Seq((1L, 10L, "a", 1L), (1L, 10L, "b", 2L), (1L, 21L, "c", 3L))
      .toDF("k", "t", "v", "seq")
    val out = KVOps.asofJoinBackward(left, right, Seq("k"), "t", "t",
        Seq("v"), rightOrderCol = Some("seq"))
      .orderBy("k", "t").collect()
    // t=10: inclusive match, tie between a/b broken by seq -> b
    // t=20: still b; t=25: c; k=2: no right rows -> null
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq ==
      Seq((1L, 10L, "b"), (1L, 20L, "b"), (1L, 25L, "c"), (2L, 5L, null)))
  }

  test("asof tolerance: stale matches null out, boundary is inclusive, both directions") {
    val left = Seq((1L, 100L), (1L, 115L), (1L, 200L)).toDF("k", "t")
    val right = Seq((1L, 90L, "a", 1L), (1L, 110L, "b", 2L)).toDF("k", "t", "v", "seq")
    val back = KVOps.asofJoinBackward(left, right, Seq("k"), "t", "t",
        Seq("v"), rightOrderCol = Some("seq"), toleranceMs = Some(10L))
      .orderBy("t").collect().map(r => (r.getLong(1), r.getString(2))).toSeq
    // t=100: match a at 90, 100-90 == 10 <= 10 -> keep (inclusive bound)
    // t=115: match b at 110 within 5 -> keep; t=200: b is 90 stale -> null
    assert(back == Seq((100L, "a"), (115L, "b"), (200L, null)))
    val fwd = KVOps.asofJoinForward(left, right, Seq("k"), "t", "t",
        Seq("v"), rightOrderCol = Some("seq"), toleranceMs = Some(10L))
      .orderBy("t").collect().map(r => (r.getLong(1), r.getString(2))).toSeq
    // t=100: next right at 110, lookahead 10 -> keep; t=115 and t=200:
    // nothing at-or-after within 10 -> null
    assert(fwd == Seq((100L, "b"), (115L, null), (200L, null)))
    // brute-force parity on a random history
    val rnd = new scala.util.Random(31)
    val l2 = Seq.fill(200)((rnd.nextInt(4).toLong, rnd.nextInt(500).toLong)).toDF("k", "t")
    val r2 = Seq.tabulate(120)(i =>
      (rnd.nextInt(4).toLong, rnd.nextInt(500).toLong, i.toLong)).toDF("k", "t", "rid")
    val got = KVOps.asofJoinBackward(l2, r2, Seq("k"), "t", "t",
        Seq("rid"), rightOrderCol = Some("rid"), toleranceMs = Some(40L))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).sorted.toSeq
    val rrows = r2.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = l2.collect().map { lr =>
      val (k, t) = (lr.getLong(0), lr.getLong(1))
      val cand = rrows.filter(x => x._1 == k && x._2 <= t && t - x._2 <= 40L)
      val best = if (cand.isEmpty) -1L
        else cand.maxBy(x => (x._2, x._3))._3
      (k, t, best)
    }.sorted.toSeq
    assert(got == want)
  }

  test("asofJoinNearest: min |dt| wins, backward breaks distance ties") {
    val left = Seq((1L, 10L), (1L, 14L), (1L, 15L), (1L, 100L), (2L, 5L))
      .toDF("k", "t")
    val right = Seq((1L, 12L, "b1", 1L), (1L, 18L, "f1", 2L), (2L, 50L, "x", 3L))
      .toDF("k", "t", "v", "seq")
    val out = KVOps.asofJoinNearest(left, right, Seq("k"), "t", "t",
        Seq("v"), rightOrderCol = Some("seq"))
      .orderBy("k", "t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    // t=10: only forward-ish 12 at d=2 vs 18 at d=8 -> b1 (12 is forward
    //       of 10 but nearest overall); t=14: 12@d2 vs 18@d4 -> b1;
    // t=15: 12@d3 vs 18@d3 TIE -> backward (12) wins; t=100: 18 nearest;
    // k=2: the only right row is 45 ahead -> still matches (no tolerance)
    assert(out == Seq((1L, 10L, "b1"), (1L, 14L, "b1"), (1L, 15L, "b1"),
      (1L, 100L, "f1"), (2L, 5L, "x")))
  }

  test("asofJoinNearest: tolerance bounds both directions; same-ts ties") {
    val left = Seq((1L, 100L), (1L, 200L)).toDF("k", "t")
    val right = Seq((1L, 100L, "a", 1L), (1L, 100L, "b", 2L), (1L, 150L, "c", 3L))
      .toDF("k", "t", "v", "seq")
    val out = KVOps.asofJoinNearest(left, right, Seq("k"), "t", "t",
        Seq("v"), rightOrderCol = Some("seq"), toleranceMs = Some(40L))
      .orderBy("t").collect().map(r => (r.getLong(1), r.getString(2))).toSeq
    // t=100: distance 0 on the backward side, largest seq of the ts tie -> b
    // t=200: nearest is 150 at d=50 > tolerance 40 -> null
    assert(out == Seq((100L, "b"), (200L, null)))
  }

  test("asofJoinNearest equals the quadratic model on random data") {
    val rnd = new scala.util.Random(31)
    val left = (1 to 300).map(i =>
      (rnd.nextInt(4).toLong, rnd.nextInt(500).toLong, i.toLong))
    val right = (1 to 200).map(i =>
      (rnd.nextInt(4).toLong, rnd.nextInt(500).toLong, s"p$i", i.toLong))
    val got = KVOps.asofJoinNearest(
        left.toDF("k", "t", "lid"), right.toDF("k", "t", "v", "seq"),
        Seq("k"), "t", "t", Seq("v"), rightOrderCol = Some("seq"),
        toleranceMs = Some(60L))
      .orderBy("k", "t", "lid")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    val want = left.sortBy(l => (l._1, l._2, l._3)).map { l =>
      val cands = right.filter(r => r._1 == l._1 && math.abs(r._2 - l._2) <= 60L)
      val pick =
        if (cands.isEmpty) null
        else cands.minBy(r => (math.abs(r._2 - l._2),
          if (r._2 <= l._2) 0 else 1, // backward wins distance ties
          if (r._2 <= l._2) -r._4 else r._4))._3 // ts-tie: back max, fwd min
      (l._1, l._2, l._3, pick)
    }
    assert(got == want)
  }

  test("asofJoinNearest: both direction windows share ONE hash exchange") {
    val l = (1 to 50).map(i => (i % 3L, i.toLong)).toDF("k", "t")
    val r = (1 to 50).map(i => (i % 3L, i * 2L, s"v$i", i.toLong))
      .toDF("k", "t", "v", "seq")
    val p = KVOps.asofJoinNearest(l, r, Seq("k"), "t", "t", Seq("v"),
        rightOrderCol = Some("seq"))
      .queryExecution.executedPlan.toString
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx == 1, s"expected 1 hash exchange, got $hashEx:\n$p")
    assert(!p.contains("Join"), s"nearest regressed to a join plan:\n$p")
  }

  test("asofJoinForward: inclusive forward match with earliest-wins tie-break") {
    import org.apache.spark.sql.functions.col
    val left = Seq((1L, 10L), (1L, 20L), (1L, 25L), (2L, 50L))
      .toDF("k", "t")
    val right = Seq((1L, 10L, "a", 2L), (1L, 10L, "b", 1L), (1L, 21L, "c", 3L))
      .toDF("k", "t", "v", "seq")
    val out = KVOps.asofJoinForward(left, right, Seq("k"), "t", "t",
        Seq("v"), rightOrderCol = Some("seq"))
      .orderBy("k", "t").collect()
    // t=10: inclusive, tie between a/b broken toward SMALLEST seq -> b
    // t=20: next right at 21 -> c; t=25: nothing ahead -> null; k=2: null
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq ==
      Seq((1L, 10L, "b"), (1L, 20L, "c"), (1L, 25L, null), (2L, 50L, null)))
  }

  test("asofJoinBackward matches the window formulation on real events") {
    val ev = graft.queries.Catalog.loadEvents(spark, "/root/testdata/sf0.001")
    val viaOp = KVOps.asofJoinBackward(
        ev.select(col("event_id"), col("user_id"), col("ts_ms")),
        ev.filter(col("event_type") === "signup")
          .select(col("user_id"), col("ts_ms"), col("event_id"), col("value")),
        Seq("user_id"), "ts_ms", "ts_ms", Seq("ts_ms"), Some("event_id"))
      .select(col("event_id"), col("asof_ts_ms"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val viaWin = ev.select(col("event_id"),
      max(when(col("event_type") === "signup", col("ts_ms"))).over(w).as("win_ts"))
    val joined = viaOp.join(viaWin, "event_id")
    assert(joined.filter(!(col("asof_ts_ms") <=> col("win_ts"))).count() == 0)
  }

  test("distinctCountTwoPhase equals countDistinct") {
    val df = Seq((1, "a"), (1, "a"), (1, "b"), (2, "a"), (2, "c"), (2, "c"))
      .toDF("k", "v")
    val two = Skew.distinctCountTwoPhase(df, Seq("k"), "v", "n")
      .orderBy("k").collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(two == Seq((1, 2L), (2, 2L)))
  }

  test("saltedJoin is row-identical to a plain join") {
    val left = (0 until 500).map(i => (i % 3, i)).toDF("k", "lv")
    val right = Seq((0, "x"), (1, "y"), (2, "z"), (2, "zz")).toDF("k", "rv")
    val plain = left.join(right, Seq("k")).groupBy("k").count()
      .orderBy("k").collect().toSeq
    val salted = Skew.saltedJoin(left, right, Seq("k"), saltFactor = 7)
      .groupBy("k").count().orderBy("k").collect().toSeq
    assert(plain == salted)
  }
}
