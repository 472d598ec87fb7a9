package graft.llmops

import graft.core.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LanguageModelSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // train tokens: doc0 = [a, b, a, b], doc2 = [a, c] -> c(a)=3, c(b)=2,
  // c(c)=1; N=6, V=3; bigrams: (a,b)x2, (b,a)x1, (a,c)x1
  private val train = Seq((0L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")

  test("seen bigrams score c2/c1; unseen fall back to alpha-smoothed unigram") {
    // score doc: [a, b, d] -> bigrams (a,b) seen, (b,d) unseen (d OOV)
    val score = Seq((1L, "a b d")).toDF("doc_id", "text")
    val got = LanguageModel.bigramScore(train, score)
      .select("doc_id", "n_bigrams", "avg_ll", "ppl")
      .as[(Long, Long, Double, Double)].head()
    // p(b|a) = c(a,b)/c(a) = 2/3; p(d|b) backoff = 0.4*(0+1)/(6+3)
    val ll1 = BigDecimal(math.log(2.0 / 3.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val ll2 = BigDecimal(math.log(0.4 / 9.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val avg = ((ll1 + ll2) / 2).toDouble
    assert(got._1 == 1L && got._2 == 2L)
    assert(math.abs(got._3 - BigDecimal(avg).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(math.abs(got._4 - BigDecimal(math.exp(-avg)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    // an unseen bigram of two KNOWN words uses that word's unigram count
    val score2 = Seq((1L, "b c")).toDF("doc_id", "text") // (b,c) unseen, c known
    val got2 = LanguageModel.bigramScore(train, score2)
      .select("avg_ll").as[Double].head()
    val want2 = BigDecimal(math.log(0.4 * 2.0 / 9.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(got2 - want2) < 1e-9)
  }

  test("documents with fewer than two tokens drop out") {
    val score = Seq((1L, "a"), (3L, ""), (5L, "a b")).toDF("doc_id", "text")
    val ids = LanguageModel.bigramScore(train, score)
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(5L))
  }

  test("scores are invariant to partitioning (decimal-sum discipline)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = LanguageModel.bigramScore(docs.filter(col("doc_id") % 2 === 0), docs)
      .orderBy("doc_id").collect()
    val b = LanguageModel.bigramScore(
        docs.filter(col("doc_id") % 2 === 0).repartition(13), docs.repartition(7))
      .orderBy("doc_id").collect()
    assert(a.sameElements(b))
  }
}
