package graft.operators

import graft.core.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class CusumSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def model(xs: Seq[Double], target: Double, slack: Double)
      : Seq[(Double, Double)] = {
    var (s, t) = (0.0, 0.0)
    xs.map { x =>
      s = math.max(0.0, s + (x - target - slack))
      t = math.max(0.0, t - (x - target - slack) - 2 * slack)
      (s, t)
    }
  }

  test("cusum equals the sequential max-recurrence on random data") {
    val rnd = new scala.util.Random(17)
    val data = (1 to 5).flatMap { k =>
      (1 to 40).map(i => (s"k$k", i.toLong, i.toLong, rnd.nextDouble() * 100))
    }
    val got = Resample.cusum(data.toDF("k", "t", "tie", "v"),
        keys = Seq("k"), target = 50.0, slack = 5.0, threshold = 100.0,
        tsMsCol = "t", valueCol = "v", tieCol = "tie")
      .orderBy("k", "t")
      .select("k", "t", "cusum_high", "cusum_low")
      .as[(String, Long, Double, Double)].collect().toSeq
    val want = data.groupBy(_._1).toSeq.flatMap { case (k, rows) =>
      val sorted = rows.sortBy(_._2)
      model(sorted.map(_._4), 50.0, 5.0).zip(sorted)
        .map { case ((s, t), r) => (k, r._2, s, t) }
    }.sortBy(r => (r._1, r._2))
    got.zip(want).foreach { case (g, w) =>
      assert((g._1, g._2) == (w._1, w._2))
      assert(math.abs(g._3 - w._3) < 1e-6, s"high diverged at $g vs $w")
      assert(math.abs(g._4 - w._4) < 1e-6, s"low diverged at $g vs $w")
    }
  }

  test("a mean shift breaches the high side; a stable series never does") {
    val stable = (1 to 50).map(i => ("s", i.toLong, i.toLong, 50.0))
    val shifted = (1 to 50).map(i =>
      ("d", i.toLong, i.toLong, if (i <= 25) 50.0 else 70.0))
    val out = Resample.cusum((stable ++ shifted).toDF("k", "t", "tie", "v"),
        keys = Seq("k"), target = 50.0, slack = 5.0, threshold = 100.0,
        tsMsCol = "t", valueCol = "v", tieCol = "tie")
      .select("k", "t", "breach")
      .as[(String, Long, Boolean)].collect()
    assert(!out.filter(_._1 == "s").exists(_._3), "stable series breached")
    val firstBreach = out.filter(r => r._1 == "d" && r._3).map(_._2).sorted
    // shift of +20 with slack 5 accumulates 15/step: breach ~7 steps in
    assert(firstBreach.nonEmpty && firstBreach.head <= 35L,
      s"shift not detected: $firstBreach")
  }

  test("the whole chart runs over ONE key exchange") {
    val data = (1 to 100).map(i => (s"k${i % 3}", i.toLong, i.toLong, i * 1.0))
    val p = Resample.cusum(data.toDF("k", "t", "tie", "v"),
        keys = Seq("k"), target = 50.0, slack = 5.0, threshold = 100.0,
        tsMsCol = "t", valueCol = "v", tieCol = "tie")
      .queryExecution.executedPlan.toString
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx == 1, s"expected 1 hash exchange, got $hashEx:\n$p")
  }
}
