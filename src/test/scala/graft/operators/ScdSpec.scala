package graft.operators

import graft.core.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class ScdSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // key "a": X@1, X@2 (no-op), Y@3, X@5 (re-opens a NEW version), current
  // key "b": one NULL attr run then a value — NULL must not equal "Z"
  private def log = Seq(
    ("a", 1L, 1L, Some("X")), ("a", 2L, 2L, Some("X")),
    ("a", 3L, 3L, Some("Y")), ("a", 5L, 4L, Some("X")),
    ("b", 10L, 5L, None), ("b", 11L, 6L, None), ("b", 12L, 7L, Some("Z"))
  ).toDF("k", "ts", "id", "attr")

  test("versions collapse no-ops, re-open on change, and chain valid_to") {
    val out = Scd.scd2(log, Seq("k"), "ts", "id", Seq("attr"))
      .orderBy("k", "version")
      .collect()
      .map(r => (r.getString(0), Option(r.getString(1)), r.getLong(2),
        r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Long]),
        r.getBoolean(5), r.getLong(6)))
    assert(out.toSeq == Seq(
      ("a", Some("X"), 1L, 1L, Some(3L), false, 2L),
      ("a", Some("Y"), 2L, 3L, Some(5L), false, 1L),
      ("a", Some("X"), 3L, 5L, None, true, 1L),
      ("b", None, 1L, 10L, Some(12L), false, 2L),
      ("b", Some("Z"), 2L, 12L, None, true, 1L)))
  }

  test("same-ts changes are ordered by the tie column deterministically") {
    val d = Seq(("a", 1L, 2L, "B"), ("a", 1L, 1L, "A"))
      .toDF("k", "ts", "id", "attr")
    val out = Scd.scd2(d, Seq("k"), "ts", "id", Seq("attr"))
      .orderBy("version").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getBoolean(5)))
    assert(out.toSeq == Seq(("A", 1L, false), ("B", 2L, true)))
  }

  test("multi-attribute tracking opens a version when ANY attr changes") {
    val d = Seq(("a", 1L, 1L, "X", 1), ("a", 2L, 2L, "X", 2),
      ("a", 3L, 3L, "X", 2)).toDF("k", "ts", "id", "s", "v")
    val out = Scd.scd2(d, Seq("k"), "ts", "id", Seq("s", "v"))
      .orderBy("version").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Int]("v") == 1 && out(1).getAs[Int]("v") == 2)
  }

  test("scd2 equals the sequential run-collapse model on random change logs") {
    val rnd = new scala.util.Random(43)
    val data = (1 to 8).flatMap { k =>
      (1 to 60).map { i =>
        (s"k$k", rnd.nextInt(20).toLong, i.toLong,
          if (rnd.nextInt(5) == 0) None else Some(s"v${rnd.nextInt(3)}"))
      }
    }
    val got = Scd.scd2(data.toDF("k", "ts", "id", "attr"),
        Seq("k"), "ts", "id", Seq("attr"))
      .orderBy("k", "version").collect()
      .map(r => (r.getString(0), Option(r.getString(1)), r.getLong(2),
        r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Long]),
        r.getBoolean(5), r.getLong(6))).toSeq
    val want = data.groupBy(_._1).toSeq.flatMap { case (k, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      // collapse maximal runs of equal attr (None == None)
      val runs = sorted.foldLeft(Vector.empty[(Option[String], Long, Long)]) {
        case (acc, r) =>
          if (acc.nonEmpty && acc.last._1 == r._4)
            acc.init :+ ((acc.last._1, acc.last._2, acc.last._3 + 1))
          else acc :+ ((r._4, r._2, 1L))
      }
      runs.zipWithIndex.map { case ((attr, from, n), i) =>
        val to = if (i + 1 < runs.size) Some(runs(i + 1)._2) else None
        (k, attr, (i + 1).toLong, from, to, to.isEmpty, n)
      }
    }.sortBy(r => (r._1, r._3))
    assert(got == want)
  }

  test("the whole history builds over ONE exchange (pinned plan shape)") {
    val plan = Scd.scd2(log, Seq("k"), "ts", "id", Seq("attr"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1,
      s"expected 1 hash exchange (windows+agg+lead reuse it), got $exchanges:\n$plan")
  }
}
