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
