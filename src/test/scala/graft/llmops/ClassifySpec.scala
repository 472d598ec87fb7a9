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

  test("pipeline matches a plain-Scala NB reference on random corpora (seeded fuzz)") {
    import java.math.{BigDecimal => JBD, RoundingMode}
    def r6(x: Double): JBD = new JBD(x).setScale(6, RoundingMode.HALF_UP)
    // independent reference: same formulas, driver-side BigDecimal sums
    def localNb(corpus: Seq[(Long, String, String)]): Map[Long, (String, Double)] = {
      val toks = corpus.flatMap { case (id, text, lab) =>
        text.split(" ").map(t => (id, lab, t)) }
      val vocab = toks.map(_._3).distinct.sorted
      val v = vocab.size
      val cnt = toks.groupBy(t => (t._2, t._3)).view.mapValues(_.size).toMap
      val nLab = toks.groupBy(_._2).view.mapValues(_.size).toMap
      val labels = corpus.map(_._3).distinct.sorted
      val nDocsLab = corpus.groupBy(_._3).view.mapValues(_.size).toMap
      val prior = labels.map(l =>
        l -> r6(math.log(nDocsLab(l).toDouble / corpus.size))).toMap
      val w = (for (t <- vocab; l <- labels) yield (t, l) ->
        r6(math.log((cnt.getOrElse((l, t), 0) + 1.0) / (nLab.getOrElse(l, 0) + v)))).toMap
      corpus.map { case (id, text, _) =>
        val scores = labels.map { l =>
          val sll = text.split(" ").foldLeft(JBD.ZERO)((a, t) => a.add(w((t, l))))
          l -> prior(l).add(sll)
        }
        val (bl, bs) = scores.minBy { case (l, s) => (s.negate, l) }
        id -> (bl, bs.doubleValue)
      }.toMap
    }
    val rnd = new scala.util.Random(321)
    val wordsPool = Vector("red", "blue", "fast", "slow", "ion", "gel", "arc", "hub")
    for (trial <- 1 to 8) {
      val corpus = (0L until 15L).map { id =>
        val lab = s"c${rnd.nextInt(3)}"
        val text = (1 to (2 + rnd.nextInt(6)))
          .map(_ => wordsPool(rnd.nextInt(wordsPool.size))).mkString(" ")
        (id, text, lab)
      }
      val got = Classify.classifySelf(corpus.toDF("doc_id", "text", "source"), "source")
        .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
      val want = localNb(corpus)
      corpus.foreach { case (id, _, _) =>
        assert(got(id)._1 == want(id)._1,
          s"trial $trial doc $id: predicted ${got(id)._1} vs ${want(id)._1}")
        assert(math.abs(got(id)._2 - r6(want(id)._2).doubleValue) < 1e-9,
          s"trial $trial doc $id: score ${got(id)._2} vs ${want(id)._2}")
      }
    }
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
