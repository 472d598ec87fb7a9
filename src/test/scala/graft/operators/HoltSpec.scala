package graft.operators

import graft.core.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class HoltSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def sequential(xs: Seq[Double], alpha: Double, beta: Double)
      : Seq[(Double, Double)] =
    xs.tail.scanLeft((xs.head, 0.0)) { case ((l, b), x) =>
      val l2 = alpha * x + (1 - alpha) * (l + b)
      val b2 = beta * (l2 - l) + (1 - beta) * b
      (l2, b2)
    }

  test("holt equals the sequential 2-state recurrence across blocks") {
    val rnd = new scala.util.Random(11)
    val data = (1 to 6).flatMap { k =>
      val n = 1 + rnd.nextInt(40)
      (1 to n).map(i => (s"k$k", rnd.nextInt(1000).toLong,
        (k * 1000 + i).toLong, rnd.nextDouble() * 100))
    }
    val got = Resample.holt(
        data.toDF("k", "t", "tie", "v").repartition(7),
        keys = Seq("k"), alpha = 0.4, beta = 0.3, tsMsCol = "t",
        valueCol = "v", tieCol = "tie", blockSize = 4)
      .orderBy("k", "t", "tie")
      .select("k", "t", "tie", "v", "level", "trend")
      .as[(String, Long, Long, Double, Double, Double)].collect().toSeq
    val want = data.groupBy(_._1).toSeq.flatMap { case (k, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      sequential(sorted.map(_._4), 0.4, 0.3).zip(sorted)
        .map { case ((l, b), r) => (k, r._2, r._3, r._4, l, b) }
    }.sortBy(r => (r._1, r._2, r._3))
    assert(got.size == want.size)
    got.zip(want).foreach { case (g, w) =>
      assert((g._1, g._2, g._3, g._4) == (w._1, w._2, w._3, w._4))
      assert(math.abs(g._5 - w._5) < 1e-5, s"level diverged at $g vs $w")
      assert(math.abs(g._6 - w._6) < 1e-5, s"trend diverged at $g vs $w")
    }
  }

  test("a linear ramp is tracked exactly: trend converges to the slope") {
    // x_t = 5t: once warmed up, level ≈ x and trend ≈ 5
    val data = (1 to 200).map(i => ("a", i.toLong, i.toLong, 5.0 * i))
    val last = Resample.holt(data.toDF("k", "t", "tie", "v"),
        keys = Seq("k"), alpha = 0.5, beta = 0.5, tsMsCol = "t",
        valueCol = "v", tieCol = "tie", blockSize = 16)
      .orderBy("t").select("level", "trend")
      .as[(Double, Double)].collect().last
    assert(math.abs(last._1 - 1000.0) < 0.5, s"level ${last._1}")
    assert(math.abs(last._2 - 5.0) < 0.05, s"trend ${last._2}")
  }

  test("beta = 0 degenerates to simple exponential smoothing (zero trend)") {
    val data = Seq(("a", 1L, 1L, 10.0), ("a", 2L, 2L, 20.0), ("a", 3L, 3L, 0.0))
    val got = Resample.holt(data.toDF("k", "t", "tie", "v"),
        keys = Seq("k"), alpha = 0.3, beta = 0.0, tsMsCol = "t",
        valueCol = "v", tieCol = "tie")
      .orderBy("t").select("level", "trend")
      .as[(Double, Double)].collect().toSeq
    assert(got.map(_._2) == Seq(0.0, 0.0, 0.0))
    assert(math.abs(got(1)._1 - (0.7 * 10 + 0.3 * 20)) < 1e-9)
    assert(math.abs(got(2)._1 - (0.7 * 13 + 0.3 * 0)) < 1e-9)
  }

  test("holt shuffles its input once: summary pass reuses the exchange") {
    val data = (1 to 200).map(i => (s"k${i % 5}", i.toLong, i.toLong, i * 1.0))
    val df = Resample.holt(data.toDF("k", "t", "tie", "v"),
      keys = Seq("k"), alpha = 0.2, beta = 0.1, tsMsCol = "t",
      valueCol = "v", tieCol = "tie", blockSize = 8)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert("ReusedExchange|ReusedQueryStage".r.findAllIn(p).nonEmpty,
      s"holt's summary pass re-shuffled the input:\n${p.take(2000)}")
  }
}
