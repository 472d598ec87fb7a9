package graft.operators

import graft.core.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MergeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // target: four keys; source: update k=1, delete k=2, leave k=3 alone
  // (no source row), insert k=9; k=4 matched but updateWhen filters it
  private val target = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
  private val source = Seq(
    (1L, "A", 11.0), (2L, "DEL", 0.0), (4L, "skip", 44.0), (9L, "n", 90.0))

  private def run(
      updateWhen: org.apache.spark.sql.Column = lit(true),
      deleteWhen: org.apache.spark.sql.Column = lit(false),
      insertWhen: org.apache.spark.sql.Column = lit(true)) =
    Merge.mergeInto(
        target.toDF("k", "name", "v"), source.toDF("k", "name", "v"),
        keys = Seq("k"), updateWhen, deleteWhen, insertWhen)
      .orderBy("k").as[(Long, String, Double)].collect().toSeq

  test("all three clauses: update, delete, keep, conditional-update, insert") {
    val got = run(
      updateWhen = col("src_name") =!= "skip",
      deleteWhen = col("src_name") === "DEL")
    assert(got == Seq(
      (1L, "A", 11.0),   // matched + update
      (3L, "c", 30.0),   // target-only: kept
      (4L, "d", 40.0),   // matched but updateWhen false: kept unchanged
      (9L, "n", 90.0)))  // source-only: inserted
  }

  test("defaults update every match and insert every unmatched source row") {
    assert(run() == Seq(
      (1L, "A", 11.0), (2L, "DEL", 0.0), (3L, "c", 30.0),
      (4L, "skip", 44.0), (9L, "n", 90.0)))
  }

  test("insertWhen=false drops unmatched source rows") {
    assert(run(insertWhen = lit(false)).map(_._1) == Seq(1L, 2L, 3L, 4L))
  }

  test("conditions can read both sides: update only when source value wins") {
    val got = run(updateWhen = col("src_v") > col("v"))
    // k=1: 11>10 update; k=2: 0<20 keep; k=4: 44>40 update
    assert(got == Seq(
      (1L, "A", 11.0), (2L, "b", 20.0), (3L, "c", 30.0),
      (4L, "skip", 44.0), (9L, "n", 90.0)))
  }

  test("a source deriving from the target (self-join lineage) merges cleanly") {
    val tgt = target.toDF("k", "name", "v")
    val src = tgt.filter(col("k") % 2 === 1)
      .withColumn("v", col("v") + 1)
    val got = Merge.mergeInto(tgt, src, Seq("k"))
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(got == Seq(
      (1L, "a", 11.0), (2L, "b", 20.0), (3L, "c", 31.0), (4L, "d", 40.0)))
  }

  test("duplicate source keys fail loudly (SQL MERGE ambiguous-match rule)") {
    val dup = (source :+ (1L, "again", 12.0)).toDF("k", "name", "v")
    val e = intercept[Exception] {
      Merge.mergeInto(target.toDF("k", "name", "v"), dup, Seq("k")).count()
    }
    assert(e.getMessage.contains("duplicate"))
  }

  test("a source missing target columns is rejected up front") {
    val e = intercept[IllegalArgumentException] {
      Merge.mergeInto(target.toDF("k", "name", "v"),
        Seq((1L, "x")).toDF("k", "name"), Seq("k"))
    }
    assert(e.getMessage.contains("missing"))
  }

  test("mergeInto equals a sequential model on random targets and deltas") {
    val rnd = new scala.util.Random(17)
    for (trial <- 1 to 6) {
      val tgt = (1L to 40L).filter(_ => rnd.nextDouble() < 0.7)
        .map(k => (k, s"t$k", rnd.nextInt(100).toDouble))
      val srcKeys = (1L to 50L).filter(_ => rnd.nextDouble() < 0.4)
      val src = srcKeys.map(k => (k, if (rnd.nextDouble() < 0.3) "DEL" else s"s$k",
        rnd.nextInt(100).toDouble))
      val got = Merge.mergeInto(
          tgt.toDF("k", "name", "v").repartition(5),
          src.toDF("k", "name", "v").repartition(3),
          keys = Seq("k"),
          updateWhen = col("src_v") >= col("v"),
          deleteWhen = col("src_name") === "DEL",
          insertWhen = col("src_name") =!= "DEL")
        .orderBy("k").as[(Long, String, Double)].collect().toSeq
      // sequential replay of the clause semantics
      val srcMap = src.map(r => r._1 -> r).toMap
      val fromTarget = tgt.flatMap { t =>
        srcMap.get(t._1) match {
          case Some(s) if s._2 == "DEL" => None               // matched delete
          case Some(s) if s._3 >= t._3  => Some(s)            // matched update
          case Some(_)                  => Some(t)            // update gated off
          case None                     => Some(t)            // target-only
        }
      }
      val inserts = src.filter(s => !tgt.exists(_._1 == s._1) && s._2 != "DEL")
      val want = (fromTarget ++ inserts).sortBy(_._1)
      assert(got == want, s"trial $trial:\ngot:  $got\nwant: $want")
    }
  }

  test("a NULL clause condition means FALSE (SQL MERGE), never a dropped row") {
    // src name is NULL for every source row: deleteWhen/updateWhen/
    // insertWhen all evaluate NULL. SQL MERGE treats a NULL clause
    // condition as not-fired — the matched row must be KEPT UNCHANGED
    // (not silently filtered by a NULL __keep) and the unmatched source
    // row must NOT insert.
    val tgt = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "name", "v")
    val src = Seq((1L, Option.empty[String], 99.0),
      (9L, Option.empty[String], 90.0)).toDF("k", "name", "v")
    val got = Merge.mergeInto(tgt, src, Seq("k"),
        updateWhen = col("src_name") =!= "x",
        deleteWhen = col("src_name") === "DEL",
        insertWhen = col("src_name") === "n")
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((1L, "a", 10.0), (2L, "b", 20.0)),
      s"NULL clause conditions must keep matched rows and gate inserts: $got")
  }

  test("merge result is invariant to input partitioning") {
    val base = run()
    val got = Merge.mergeInto(
        target.toDF("k", "name", "v").repartition(5),
        source.toDF("k", "name", "v").repartition(3), Seq("k"))
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(got == base)
  }
}
