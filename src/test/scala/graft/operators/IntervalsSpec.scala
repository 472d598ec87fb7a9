package graft.operators

import graft.core.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class IntervalsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // key "a": [0,10] [5,20] (overlap) [20,25] (touching -> merges)
  //          [30,35] (gap -> new island)
  // key "b": [1,2] alone; a NULL-bounded row that must be dropped
  private val rows = Seq(
    ("a", Some(0L), Some(10L)), ("a", Some(5L), Some(20L)),
    ("a", Some(20L), Some(25L)), ("a", Some(30L), Some(35L)),
    ("b", Some(1L), Some(2L)), ("b", None, Some(9L)), ("b", Some(4L), None))

  private def islands(rs: Seq[(String, Option[Long], Option[Long])]) =
    Intervals.coalesce(rs.toDF("k", "s", "e"), Seq("k"), "s", "e")
      .orderBy("k", "island")
      .select("k", "island", "island_start", "island_end", "n_merged")
      .as[(String, Long, Long, Long, Long)].collect().toSeq

  test("overlapping and touching intervals merge; gaps split islands") {
    assert(islands(rows) == Seq(
      ("a", 1L, 0L, 25L, 3L),
      ("a", 2L, 30L, 35L, 1L),
      ("b", 1L, 1L, 2L, 1L)))
  }

  test("result is invariant to input order and partitioning") {
    val base = islands(rows)
    val got = Intervals.coalesce(
        rows.reverse.toDF("k", "s", "e").repartition(5), Seq("k"), "s", "e")
      .orderBy("k", "island")
      .select("k", "island", "island_start", "island_end", "n_merged")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == base)
  }

  test("an interval contained inside an earlier long one does not split") {
    // [0,100] then [10,20]: running-max end (not lag(e)) is what makes
    // containment correct — a lag-based merge would wrongly split at 20
    val got = islands(Seq(
      ("a", Some(0L), Some(100L)), ("a", Some(10L), Some(20L)),
      ("a", Some(50L), Some(60L)), ("a", Some(101L), Some(110L))))
    assert(got == Seq(("a", 1L, 0L, 100L, 3L), ("a", 2L, 101L, 110L, 1L)))
  }

  test("gaps are the complement of islands") {
    val got = Intervals.gaps(rows.toDF("k", "s", "e"), Seq("k"), "s", "e")
      .orderBy("k", "gap_start")
      .select("k", "gap_start", "gap_end")
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("a", 25L, 30L)))
  }

  test("subtract/intersect match the integer point-set brute force") {
    val rnd = new scala.util.Random(19)
    def mk(n: Int) = Seq.tabulate(n) { _ =>
      val s = rnd.nextInt(120).toLong
      (s"k${rnd.nextInt(5)}", s, s + rnd.nextInt(15).toLong)
    }
    val lRows = mk(60); val rRows = mk(40)
    val l = lRows.toDF("k", "s", "e"); val r = rRows.toDF("k", "s", "e")
    def points(rows: Seq[(String, Long, Long)], k: String): Set[Long] =
      rows.filter(_._1 == k).flatMap { case (_, s, e) => s to e }.toSet
    def runs(pts: Set[Long]): Seq[(Long, Long)] =
      pts.toSeq.sorted.foldLeft(List.empty[(Long, Long)]) {
        case ((s0, e0) :: rest, p) if p == e0 + 1 => (s0, p) :: rest
        case (acc, p) => (p, p) :: acc
      }.reverse
    val keys = (lRows ++ rRows).map(_._1).distinct
    def check(op: String, got: Seq[(String, Long, Long)],
        model: String => Set[Long]): Unit = {
      val want = keys.flatMap(k => runs(model(k)).map { case (s, e) => (k, s, e) })
        .sortBy(x => (x._1, x._2))
      assert(got == want, s"$op diverged:\ngot:  $got\nwant: $want")
    }
    val gotSub = Intervals.subtract(l, r, Seq("k"), "s", "e", "s", "e")
      .orderBy("k", "seg_start").as[(String, Long, Long)].collect().toSeq
    check("subtract", gotSub, k => points(lRows, k) -- points(rRows, k))
    val gotInt = Intervals.intersect(l, r, Seq("k"), "s", "e", "s", "e")
      .orderBy("k", "seg_start").as[(String, Long, Long)].collect().toSeq
    check("intersect", gotInt, k => points(lRows, k) & points(rRows, k))
    // degenerate sides: empty right -> subtract is the left's point-set
    // union runs (NOTE: stricter than coalesce, which keeps integer-
    // adjacent islands like [57,62] [63,76] apart — the set algebra is
    // point-set exact and unifies them)
    val emptyR = Seq.empty[(String, Long, Long)].toDF("k", "s", "e")
    val sub2 = Intervals.subtract(l, emptyR, Seq("k"), "s", "e", "s", "e")
      .orderBy("k", "seg_start").as[(String, Long, Long)].collect().toSeq
    check("subtract-empty-right", sub2, k => points(lRows, k))
    assert(Intervals.intersect(l, emptyR, Seq("k"), "s", "e", "s", "e").isEmpty)
  }

  test("coalesce matches a per-key sequential reference on random input") {
    val rnd = new scala.util.Random(42)
    val data = Seq.tabulate(400) { _ =>
      val k = s"k${rnd.nextInt(6)}"
      val s = rnd.nextInt(200).toLong
      (k, Some(s), Some(s + 1 + rnd.nextInt(30).toLong))
    }
    val got = islands(data)
    val want = data.groupBy(_._1).toSeq.flatMap { case (k, rs) =>
      val sorted = rs.map(r => (r._2.get, r._3.get)).sorted
      val merged = sorted.tail.foldLeft(List((sorted.head, 1L))) {
        case (acc @ (((s0, e0), n) :: rest), (s1, e1)) =>
          if (s1 <= e0) (((s0, math.max(e0, e1)), n + 1)) :: rest
          else (((s1, e1), 1L)) :: acc
        case (Nil, _) => sys.error("unreachable")
      }.reverse
      merged.zipWithIndex.map { case (((s, e), n), i) =>
        (k, (i + 1).toLong, s, e, n)
      }
    }.sortBy(r => (r._1, r._2))
    assert(got == want)
  }
}
