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
}
