package graft.llmops

import graft.core.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ClassifySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (0L, "spark shuffle partition executor spark", "tech"),
    (1L, "executor codegen partition shuffle plan", "tech"),
    (2L, "soup recipe garlic onion butter", "food"),
    (3L, "butter garlic bread recipe oven", "food"),
    (4L, "spark plan codegen shuffle spark", "tech")
  ).toDF("doc_id", "text", "source")

  test("classifySelf separates clearly distinct label vocabularies") {
    val out = Classify.classifySelf(docs, "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(0L -> "tech", 1L -> "tech", 2L -> "food",
      3L -> "food", 4L -> "tech"))
  }

  test("unseen tokens score through the per-label OOV weight") {
    val model = Classify.trainNaiveBayes(docs, "source")
    val probe = Seq((99L, "spark shuffle zzznovel")).toDF("doc_id", "text")
    val r = Classify.scoreNaiveBayes(probe, model).collect().head
    assert(r.getString(1) == "tech") // two tech tokens dominate one OOV
    // the OOV token contributed ln(1/(n_lab+V)) — strictly below any
    // seen-token weight, so the score is lower than the same doc without it
    val clean = Classify.scoreNaiveBayes(
      Seq((99L, "spark shuffle")).toDF("doc_id", "text"), model).collect().head
    assert(r.getDouble(2) < clean.getDouble(2))
  }

  test("zero-token docs classify by prior alone, ties break to smaller label") {
    val skew = docs.union(Seq((5L, "extra tech words here now", "tech"))
      .toDF("doc_id", "text", "source"))
    val model = Classify.trainNaiveBayes(skew, "source")
    val empty = Seq((7L, "")).toDF("doc_id", "text")
    val r = Classify.scoreNaiveBayes(empty, model).collect()
    // "" tokenizes to one empty-string token in Text.tokens — also fine:
    // the point is the row SURVIVES and is deterministic
    assert(r.length == 1)
    assert(r.head.getString(1) == "tech") // 4/6 docs: largest prior wins
  }

  test("maxVocab caps the model and OOV-scores the dropped tail") {
    val model = Classify.trainNaiveBayes(docs, "source", maxVocab = 3)
    val grid = model.weights.select("tok").distinct().collect().map(_.getString(0))
    assert(grid.length == 3)
    // top-3 by corpus frequency: spark(4), shuffle(3), then the count-2
    // band breaks ties by token order
    assert(grid.contains("spark") && grid.contains("shuffle"))
    // scoring still runs end to end with most tokens OOV
    val out = Classify.scoreNaiveBayes(docs, model).collect()
    assert(out.length == 5)
  }

  test("scores are partition-count invariant (decimal sums)") {
    val many = (0L until 200L).map { i =>
      (i, if (i % 2 == 0) "alpha beta gamma alpha" else "delta epsilon zeta delta",
        if (i % 2 == 0) "a" else "b")
    }.toDF("doc_id", "text", "source")
    val one = Classify.classifySelf(many.repartition(1), "source")
      .orderBy("doc_id").collect().map(_.toSeq)
    val wide = Classify.classifySelf(many.repartition(17), "source")
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(one.toSeq == wide.toSeq)
  }
}
