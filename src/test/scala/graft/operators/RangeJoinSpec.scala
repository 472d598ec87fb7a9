package graft.operators

import graft.core.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // deterministic pseudo-random fixture: 200 points, 60 intervals over a
  // signed range (negatives exercise floor-division binning)
  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(x => x * 6364136223846793005L + 1442695040888963407L).drop(1)

  private val pts = lcg(1).take(200).zipWithIndex
    .map { case (h, i) => (i.toLong, (h % 1000L) - 500L) }.toSeq
  private val ivs = lcg(2).take(60).zipWithIndex.map { case (h, i) =>
    val s = (h % 1000L) - 500L
    (1000L + i, s, s + (math.abs(h) % 97L))
  }.toSeq

  test("pointInInterval matches the brute-force cross join") {
    val p = pts.toDF("pid", "t")
    val iv = ivs.toDF("iid", "s", "e")
    for (binSize <- Seq(7L, 64L, 1000L)) {
      val got = RangeJoin.pointInInterval(p, iv, binSize, "t", "s", "e")
        .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
      val want = p.crossJoin(iv)
        .filter(col("t") >= col("s") && col("t") <= col("e"))
        .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
      assert(got == want, s"binSize=$binSize")
      assert(got.distinct == got, s"duplicate pairs at binSize=$binSize")
    }
  }

  test("intervalOverlapJoin matches the brute-force cross join, duplicate-free") {
    val l = ivs.toDF("lid", "ls", "le")
    val r = ivs.map { case (id, s, e) => (2000L + id, s - 40L, s - 40L + (e - s)) }
      .toDF("rid", "rs", "re")
    for (binSize <- Seq(7L, 64L, 1000L)) {
      val got = RangeJoin.intervalOverlapJoin(l, r, binSize,
          "ls", "le", "rs", "re")
        .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
      val want = l.crossJoin(r)
        .filter(col("ls") <= col("re") && col("rs") <= col("le"))
        .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
      assert(got == want, s"binSize=$binSize")
      // the first-shared-bin emit rule must keep multi-bin overlaps unique
      assert(got.distinct == got, s"duplicate pairs at binSize=$binSize")
    }
  }

  test("intervalOverlapJoin with keys joins per key; degenerate guard fires") {
    val l = ivs.map { case (id, s, e) => (id, s, e, id % 3) }.toDF("lid", "ls", "le", "k")
    val r = ivs.map { case (id, s, e) => (2000L + id, s - 25L, e - 25L, id % 3) }
      .toDF("rid", "rs", "re", "k")
    val got = RangeJoin.intervalOverlapJoin(l, r, 64L,
        "ls", "le", "rs", "re", keys = Seq("k"))
      .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
    val want = l.crossJoin(r.select(col("rid"), col("rs"), col("re"), col("k").as("k2")))
      .filter(col("k") === col("k2") && col("ls") <= col("re") && col("rs") <= col("le"))
      .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
    assert(got == want)
    val wide = Seq((1L, 0L, 10000000L)).toDF("rid", "rs", "re")
    val e = intercept[Exception] {
      RangeJoin.intervalOverlapJoin(ivs.toDF("lid", "ls", "le"), wide, 2L,
        "ls", "le", "rs", "re", maxBinsPerInterval = 1000L).count()
    }
    assert(e.getMessage.contains("bins"))
  }

  test("pointInInterval with keys joins per key") {
    val p = pts.map { case (id, t) => (id, t, id % 3) }.toDF("pid", "t", "k")
    val iv = ivs.map { case (id, s, e) => (id, s, e, id % 3) }.toDF("iid", "s", "e", "k")
    val got = RangeJoin.pointInInterval(p, iv, 64L, "t", "s", "e", keys = Seq("k"))
      .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
    val want = p.crossJoin(iv.select(col("iid"), col("s"), col("e"), col("k").as("k2")))
      .filter(col("k") === col("k2") && col("t") >= col("s") && col("t") <= col("e"))
      .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
    assert(got == want)
  }

  test("pointInInterval degenerate interval fails loudly; probe surfaces it") {
    val p = Seq((1L, 5L)).toDF("pid", "t")
    val iv = Seq((1L, 0L, 10000000L)).toDF("iid", "s", "e")
    val ex = intercept[Exception] {
      RangeJoin.pointInInterval(p, iv, 1L, "t", "s", "e", maxBinsPerInterval = 1000L)
        .count()
    }
    assert(ex.getMessage != null)
    val probe = RangeJoin.overflowIntervals(iv, 1L, "s", "e", maxBinsPerInterval = 1000L)
      .collect()
    assert(probe.length == 1 && probe.head.getLong(2) == 10000001L)
    // and empty when the guard is a no-op
    assert(RangeJoin.overflowIntervals(iv, 100000L, "s", "e", 1000L).isEmpty)
  }

  test("pointInIntervalLeft matches the brute-force left join") {
    val p = pts.toDF("pid", "t")
    val iv = ivs.toDF("iid", "s", "e")
    for (binSize <- Seq(7L, 64L, 1000L)) {
      val got = RangeJoin.pointInIntervalLeft(p, iv, binSize, "t", "s", "e")
        .select("pid", "iid").as[(Long, Option[Long])].collect().sorted.toSeq
      val want = p.join(iv,
          col("t") >= col("s") && col("t") <= col("e"), "left")
        .select("pid", "iid").as[(Long, Option[Long])].collect().sorted.toSeq
      assert(got == want, s"binSize=$binSize")
      // every point survives; unmatched points null-extend exactly once
      assert(got.map(_._1).distinct.sorted == pts.map(_._1).sorted)
    }
  }

  test("pointInIntervalLeft with keys: per-key matches, unmatched survive once") {
    val p = pts.map { case (id, t) => (id, t, id % 3) }.toDF("pid", "t", "k")
    val iv = ivs.map { case (id, s, e) => (id, s, e, id % 3) }.toDF("iid", "s", "e", "k")
    val res = RangeJoin.pointInIntervalLeft(p, iv, 64L, "t", "s", "e", keys = Seq("k"))
    // interval-side key copy is dropped; point columns all survive
    assert(res.columns.toSeq == Seq("pid", "t", "k", "iid", "s", "e"))
    val got = res.select("pid", "iid").as[(Long, Option[Long])].collect().sorted.toSeq
    val want = p.join(iv.select(col("iid"), col("s"), col("e"), col("k").as("k2")),
        col("k") === col("k2") && col("t") >= col("s") && col("t") <= col("e"), "left")
      .select("pid", "iid").as[(Long, Option[Long])].collect().sorted.toSeq
    assert(got == want)
    assert(got.map(_._1).distinct.sorted == pts.map(_._1).sorted)
  }

  test("pointInIntervalLeft null point and degenerate-interval guard") {
    val p = Seq((1L, Some(5L)), (2L, None)).toDF("pid", "t")
    val iv = Seq((10L, 0L, 10L)).toDF("iid", "s", "e")
    val rows = RangeJoin.pointInIntervalLeft(p, iv, 8L, "t", "s", "e")
      .select("pid", "iid").as[(Long, Option[Long])].collect().sorted.toSeq
    // the null-t point survives, null-extended
    assert(rows == Seq((1L, Some(10L)), (2L, None)))
    val wide = Seq((1L, 0L, 10000000L)).toDF("iid", "s", "e")
    val ex = intercept[Exception] {
      RangeJoin.pointInIntervalLeft(p, wide, 1L, "t", "s", "e",
        maxBinsPerInterval = 1000L).count()
    }
    assert(ex.getMessage != null)
  }

  test("intervalOverlapJoinLeft matches the brute-force left join") {
    val l = ivs.toDF("lid", "ls", "le")
    val r = ivs.map { case (id, s, e) => (2000L + id, s - 40L, s - 40L + (e - s)) }
      .toDF("rid", "rs", "re")
    for (binSize <- Seq(7L, 64L, 1000L)) {
      val got = RangeJoin.intervalOverlapJoinLeft(l, r, binSize,
          "ls", "le", "rs", "re")
        .select("lid", "rid").as[(Long, Option[Long])].collect().sorted.toSeq
      val want = l.join(r,
          col("ls") <= col("re") && col("rs") <= col("le"), "left")
        .select("lid", "rid").as[(Long, Option[Long])].collect().sorted.toSeq
      assert(got == want, s"binSize=$binSize")
      assert(got.map(_._1).distinct.sorted == ivs.map(_._1).sorted,
        s"a left interval vanished or null-extended twice at binSize=$binSize")
    }
  }

  test("intervalOverlapJoinLeft with keys; null-bound lefts null-extend once") {
    val l = ivs.map { case (id, s, e) => (id, s, e, id % 3) }.toDF("lid", "ls", "le", "k")
    val r = ivs.map { case (id, s, e) => (2000L + id, s - 25L, e - 25L, id % 3) }
      .toDF("rid", "rs", "re", "k")
    val res = RangeJoin.intervalOverlapJoinLeft(l, r, 64L,
      "ls", "le", "rs", "re", keys = Seq("k"))
    assert(res.columns.toSeq == Seq("lid", "ls", "le", "k", "rid", "rs", "re"))
    val got = res.select("lid", "rid").as[(Long, Option[Long])].collect().sorted.toSeq
    val want = l.join(r.select(col("rid"), col("rs"), col("re"), col("k").as("k2")),
        col("k") === col("k2") && col("ls") <= col("re") && col("rs") <= col("le"),
        "left")
      .select("lid", "rid").as[(Long, Option[Long])].collect().sorted.toSeq
    assert(got == want)
    // a null-bound left interval matches nothing but must survive once
    val nl = Seq((1L, Some(0L), Some(10L)), (2L, None, Some(5L))).toDF("lid", "ls", "le")
    val nr = Seq((10L, 5L, 8L)).toDF("rid", "rs", "re")
    val rows = RangeJoin.intervalOverlapJoinLeft(nl, nr, 8L, "ls", "le", "rs", "re")
      .select("lid", "rid").as[(Long, Option[Long])].collect().sorted.toSeq
    assert(rows == Seq((1L, Some(10L)), (2L, None)))
  }

  test("bandJoinLeft matches the brute-force left join") {
    val l = pts.toDF("lid", "lt")
    val r = pts.map { case (id, t) => (id + 5000L, t + 200L) }.toDF("rid", "rt")
    for ((delta, bin) <- Seq((0L, 0L), (13L, 0L), (13L, 40L))) {
      val got = RangeJoin.bandJoinLeft(l, r, delta, "lt", "rt", binSize = bin)
        .select("lid", "rid").as[(Long, Option[Long])].collect().sorted.toSeq
      val want = l.join(r, abs(col("lt") - col("rt")) <= delta, "left")
        .select("lid", "rid").as[(Long, Option[Long])].collect().sorted.toSeq
      assert(got == want, s"delta=$delta bin=$bin")
      assert(got.map(_._1).distinct.sorted == pts.map(_._1).sorted)
    }
  }

  test("bandJoin matches brute force, each pair exactly once") {
    val l = pts.toDF("lid", "lt")
    val r = pts.map { case (id, t) => (id + 5000L, t) }.toDF("rid", "rt")
    for ((delta, bin) <- Seq((0L, 0L), (13L, 0L), (13L, 40L))) {
      val got = RangeJoin.bandJoin(l, r, delta, "lt", "rt", binSize = bin)
        .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
      val want = l.crossJoin(r)
        .filter(abs(col("lt") - col("rt")) <= delta)
        .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
      assert(got == want, s"delta=$delta bin=$bin")
      assert(got.distinct == got, s"duplicate pairs at delta=$delta bin=$bin")
    }
  }

  test("bandJoin with keys restricts pairs to the key") {
    val l = pts.map { case (id, t) => (id, t, id % 4) }.toDF("lid", "lt", "k")
    val r = pts.map { case (id, t) => (id + 5000L, t, id % 4) }.toDF("rid", "rt", "k")
    val got = RangeJoin.bandJoin(l, r, 20L, "lt", "rt", keys = Seq("k"))
      .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
    val want = l.crossJoin(r.select(col("rid"), col("rt"), col("k").as("k2")))
      .filter(col("k") === col("k2") && abs(col("lt") - col("rt")) <= 20L)
      .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
    assert(got == want)
  }

  test("bandJoin rejects a binSize that would miss pairs") {
    val df = Seq((1L, 1L)).toDF("id", "t")
    val ex = intercept[IllegalArgumentException] {
      RangeJoin.bandJoin(df, df, delta = 10L, "t", "t", binSize = 5L)
    }
    assert(ex.getMessage.contains("would miss pairs"))
  }
}
