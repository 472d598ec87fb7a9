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
