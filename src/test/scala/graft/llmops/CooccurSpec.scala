package graft.llmops

import graft.core.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class CooccurSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // a+b co-occur in 3 docs, a+c in 2, b+c in 1 (drops at minPairCount=2)
  private val docs = Seq(
    (1L, "a b x"), (2L, "a b"), (3L, "b a a"), // per-doc dup of a counts once
    (4L, "a c"), (5L, "c a"), (6L, "b c d"))

  test("pmi matches the hand model; per-doc multiplicity counts once") {
    val got = Cooccur.pmiPairs(docs.toDF("doc_id", "text"),
        minPairCount = 2L, maxVocab = 10, maxTermsPerDoc = 10)
      .orderBy("term_a", "term_b")
      .as[(String, String, Long, Double)].collect().toSeq
    // df: a=5, b=4, c=3 (x, d fall below no cap here but pairs < 2 drop)
    def pmi(nab: Long, na: Long, nb: Long) =
      BigDecimal(math.log(nab * 6.0 / (na * nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Seq(
      ("a", "b", 3L, pmi(3, 5, 4)),
      ("a", "c", 2L, pmi(2, 5, 3))))
  }

  test("maxVocab drops the rarest terms from every pair") {
    val got = Cooccur.pmiPairs(docs.toDF("doc_id", "text"),
        minPairCount = 1L, maxVocab = 2, maxTermsPerDoc = 10)
      .orderBy("term_a", "term_b")
      .as[(String, String, Long, Double)].collect().toSeq
    // vocab = {a, b}: only the (a, b) pair can survive
    assert(got.map(p => (p._1, p._2, p._3)) == Seq(("a", "b", 3L)))
  }

  test("maxTermsPerDoc keeps each doc's best-ranked vocab terms only") {
    // cap=2: doc 6 ("b c d") keeps {b, c} (ranks 2, 3) and drops d, so
    // no d pair exists even at minPairCount=1
    val got = Cooccur.pmiPairs(docs.toDF("doc_id", "text"),
        minPairCount = 1L, maxVocab = 10, maxTermsPerDoc = 2)
      .orderBy("term_a", "term_b")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(!got.exists(p => p._1 == "d" || p._2 == "d"))
    assert(got.exists(p => (p._1, p._2) == ("b", "c")))
  }

  test("pmiPairs equals a sequential model on random corpora (caps active)") {
    val rnd = new scala.util.Random(29)
    for (trial <- 1 to 5) {
      val corpus = (1L to 15L).map { id =>
        val n = 1 + rnd.nextInt(8)
        (id, (1 to n).map(_ => ('a' + rnd.nextInt(6)).toChar.toString).mkString(" "))
      }
      val (maxVocab, cap, minN) = (4, 3, 1 + rnd.nextInt(2))
      val got = Cooccur.pmiPairs(corpus.toDF("doc_id", "text").repartition(4),
          minPairCount = minN.toLong, maxVocab = maxVocab, maxTermsPerDoc = cap)
        .orderBy("term_a", "term_b")
        .as[(String, String, Long, Double)].collect().toSeq
      // sequential replay: distinct terms, df, ranked vocab, per-doc cap,
      // pairs, counts, pmi
      val docTerms = corpus.map { case (id, tx) =>
        id -> tx.split(" ").filter(_.nonEmpty).distinct.toSeq }
      val df = docTerms.flatMap(_._2).groupBy(identity).map { case (t, o) => t -> o.size }
      val vocab = df.toSeq.sortBy { case (t, d) => (-d, t) }.take(maxVocab)
        .zipWithIndex.map { case ((t, d), i) => t -> (i, d) }.toMap
      val capped = docTerms.map { case (id, ts) =>
        id -> ts.filter(vocab.contains).sortBy(t => vocab(t)._1).take(cap) }
      val pairCounts = capped.flatMap { case (_, ts) =>
        for (x <- ts; y <- ts if x < y) yield (x, y)
      }.groupBy(identity).map { case (p, o) => p -> o.size }
        .filter(_._2 >= minN)
      val nDocs = corpus.size.toDouble
      val want = pairCounts.toSeq.map { case ((x, y), nab) =>
        val pmi = BigDecimal(math.log(nab * nDocs / (vocab(x)._2.toDouble * vocab(y)._2)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (x, y, nab.toLong, pmi)
      }.sortBy(p => (p._1, p._2))
      assert(got == want, s"trial $trial:\ngot:  $got\nwant: $want")
    }
  }

  test("plan: vocab joins broadcast, pair join is equi on the doc id, no cartesian") {
    val p = Cooccur.pmiPairs(docs.toDF("doc_id", "text"))
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), "vocab join lost its broadcast")
    assert(!p.contains("CartesianProduct"), s"cartesian appeared:\n${p.take(1500)}")
    // exactly one nested-loop is legal: the one-row total-docs broadcast
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).length <= 1,
      s"pair generation went all-pairs:\n${p.take(1500)}")
  }
}
