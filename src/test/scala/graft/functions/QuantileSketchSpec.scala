package graft.functions

import graft.core.TestSpark
import graft.functions.expressions.{KLLBuffer, QuantileFunctions}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** quantile_sketch — the mergeable KLL-style summary. What is pinned is
  * the CONTRACT, not the values (which legitimately vary with merge
  * order): total weight == n exactly, and every answer's true rank is
  * within the sketch's own carried `bound` of the target rank, under
  * any partitioning.
  */
class QuantileSketchSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val probs = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)

  /** (violations, bound) of a sketch answer row against exact data. */
  private def check(values: Seq[Double], row: Row): (Int, Long) = {
    val n = row.getLong(0)
    val bound = row.getLong(1)
    val qs = row.getSeq[Double](2)
    assert(n == values.size.toLong, "sketch leaked weight: n mismatch")
    val sorted = values.sorted
    var bad = 0
    probs.zip(qs).foreach { case (p, v) =>
      val target = math.max(1L, math.ceil(p * n).toLong)
      val lt = sorted.count(_ < v).toLong // true rank span of v: [lt+1, le]
      val le = sorted.count(_ <= v).toLong
      assert(le > lt, s"answer $v for p=$p is not an input value")
      if (le < target - bound || lt + 1 > target + bound) bad += 1
    }
    (bad, bound)
  }

  test("bound holds on random data with heavy ties, any partitioning, small k") {
    val rnd = new scala.util.Random(7)
    val values = Seq.fill(20000)((rnd.nextInt(500) * 3 + 1).toDouble)
    for (parts <- Seq(1, 7, 32)) {
      val df = values.toDF("v").repartition(parts)
      val row = df.agg(QuantileFunctions.quantile_sketch(col("v"), probs, 64)
        .as("s")).select("s.*").head()
      val (bad, bound) = check(values, row)
      assert(bad == 0, s"$bad rank-bound violations at parts=$parts")
      // the bound must stay a SUMMARY-scale quantity, not n-scale
      assert(bound < values.size / 2, s"bound $bound is uselessly large")
    }
  }

  test("exactness regime: n below k answers the exact discrete quantile") {
    val values = (1 to 100).map(_.toDouble)
    val row = values.toDF("v").repartition(3)
      .agg(QuantileFunctions.quantile_sketch(col("v"), probs, 256).as("s"))
      .select("s.*").head()
    val qs = row.getSeq[Double](2)
    // with zero compactions on any path, err accumulates only from the
    // merge of sub-k partials — still zero compactions, so answers are
    // the exact quantile_disc values
    probs.zip(qs).foreach { case (p, v) =>
      val target = math.max(1, math.ceil(p * 100).toInt)
      assert(v == target.toDouble, s"p=$p: got $v want $target")
    }
    assert(row.getLong(0) == 100L)
  }

  test("buffer combine: weight-exact, bound-additive, contract survives skewed merge trees") {
    val rnd = new scala.util.Random(13)
    val values = Seq.fill(9999)(rnd.nextDouble() * 1000)
    // fold left-deep in uneven chunks (the worst merge tree)
    val chunks = values.grouped(123).toSeq
    val acc = new KLLBuffer(32)
    chunks.foreach { ch =>
      val b = new KLLBuffer(32)
      ch.foreach(b.update)
      acc.combine(b)
    }
    assert(acc.totalWeight == values.size.toLong)
    assert(acc.n == values.size.toLong)
    val sorted = values.sorted
    val qs = acc.quantiles(probs)
    probs.zip(qs).foreach { case (p, v) =>
      val target = math.max(1L, math.ceil(p * acc.n).toLong)
      val lt = sorted.count(_ < v).toLong
      val le = sorted.count(_ <= v).toLong
      assert(le >= target - acc.bound && lt + 1 <= target + acc.bound,
        s"p=$p: rank span [${lt + 1}, $le] vs target $target bound ${acc.bound}")
    }
  }

  test("NULLs skipped; empty input is NULL; SQL surface via extensions") {
    val s2 = spark.newSession()
    graft.GraftExtensions.register(s2)
    locally {
      import s2.implicits._
      Seq(Some(1.0), None, Some(3.0), Some(2.0)).toDF("v")
        .createOrReplaceTempView("qs_in")
    }
    val r = s2.sql(
      "SELECT quantile_sketch(v, '0.5', 100) AS s FROM qs_in").head()
    val st = r.getStruct(0)
    assert(st.getLong(0) == 3L)
    assert(st.getSeq[Double](2) == Seq(2.0))
    val empty = s2.sql(
      "SELECT quantile_sketch(v, '0.5', 100) AS s FROM qs_in WHERE v > 99")
      .head()
    assert(empty.isNullAt(0))
  }
}
