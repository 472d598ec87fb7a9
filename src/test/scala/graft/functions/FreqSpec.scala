package graft.functions

import graft.core.TestSpark
import graft.functions.expressions.FreqExpressions.approx_heavy_hitters
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Misra–Gries guarantees under adversarial partitioning: the
  * sketch's CONTENT may vary with merge order, but (1) no estimate ever
  * exceeds the true count, (2) no true count ever exceeds est + err,
  * (3) every item above the N/(k+1) frequency threshold is present, and
  * (4) in the exact regime (distinct <= k) counts are exact with err
  * accounting to zero loss. The catalog gate certifies the same on the
  * corpus; this spec drives skewed/Zipfian streams through real
  * shuffles at several partition counts.
  */
class FreqSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def sketch(items: Seq[String], k: Int, partitions: Int)
      : (Long, Long, Map[String, Long]) = {
    val row = items.toDF("item").repartition(partitions)
      .agg(approx_heavy_hitters(col("item"), k).as("hh"))
      .select(col("hh.n"), col("hh.err"), col("hh.items")).head()
    val est = row.getSeq[Row](2).map(r => r.getString(0) -> r.getLong(1)).toMap
    (row.getLong(0), row.getLong(1), est)
  }

  test("exact regime: distinct <= k reproduces every count exactly, err 0") {
    val items = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(3)("c")
    for (p <- Seq(1, 7)) {
      val (n, err, est) = sketch(items, k = 8, partitions = p)
      assert(n == 68 && err == 0)
      assert(est == Map("a" -> 40L, "b" -> 25L, "c" -> 3L))
    }
  }

  test("approximation regime: bounds and heavy containment at every partitioning") {
    val rnd = new scala.util.Random(90L)
    // Zipf-ish: item i with weight 1/(i+1)
    val universe = (0 until 200).map(i => s"w$i")
    val weights = universe.indices.map(i => 1.0 / (i + 1))
    val cum = weights.scanLeft(0.0)(_ + _).tail
    val total = cum.last
    val items = Seq.fill(20000) {
      val x = rnd.nextDouble() * total
      universe(cum.indexWhere(x <= _))
    }
    val exact = items.groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    val k = 10
    for (p <- Seq(1, 4, 32)) {
      val (n, err, est) = sketch(items, k, partitions = p)
      assert(n == items.size.toLong)
      assert(est.size <= k, s"p=$p: ${est.size} counters exceed k")
      for ((w, e) <- est) {
        val t = exact.getOrElse(w, 0L)
        assert(e <= t, s"p=$p: overcount on $w: est $e > true $t")
        assert(t <= e + err, s"p=$p: $w true $t above est $e + err $err")
      }
      val threshold = n.toDouble / (k + 1)
      for ((w, t) <- exact if t > threshold)
        assert(est.contains(w), s"p=$p: heavy item $w (true $t > $threshold) missing")
    }
  }

  test("per-group sketches are independent") {
    val rows = (Seq.fill(30)(("g1", "x")) ++ Seq.fill(5)(("g1", "y")) ++
      Seq.fill(12)(("g2", "z"))).toDF("g", "item").repartition(5)
    val got = rows.groupBy("g")
      .agg(approx_heavy_hitters(col("item"), 4).as("hh"))
      .select(col("g"), col("hh.n"), col("hh.items"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getSeq[Row](2).map(x => (x.getString(0), x.getLong(1))))))
      .toMap
    assert(got("g1") == ((35L, Seq(("x", 30L), ("y", 5L)))))
    assert(got("g2") == ((12L, Seq(("z", 12L)))))
  }

  test("null items are skipped, not counted") {
    val (n, _, est) = {
      val df = Seq(Some("a"), None, Some("a"), None, Some("b"))
        .toDF("item")
      val row = df.agg(approx_heavy_hitters(col("item"), 4).as("hh"))
        .select(col("hh.n"), col("hh.err"), col("hh.items")).head()
      (row.getLong(0), row.getLong(1),
        row.getSeq[Row](2).map(r => r.getString(0) -> r.getLong(1)).toMap)
    }
    assert(n == 3 && est == Map("a" -> 2L, "b" -> 1L))
  }
}
