package graft.llmops

import graft.core.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed cases for the character-coverage repetition signals —
  * the Catalog oracle certifies end-to-end parity with DuckDB over the
  * test corpus; these pin the METRIC DEFINITIONS on inputs where every
  * value is checkable by eye (including the documented >1 overshoot of
  * `dup_trigram_frac` on loopy text).
  */
class RepetitionSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: (Long, String)*): Map[Long, (Long, Double, Double, Double, Double)] =
    Repetition.signals(rows.toDF("doc_id", "text")).collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    }.toMap

  test("the loopy document: every signal by hand, dup_trigram_frac over 1") {
    // norm = "a b a b a" (9 chars), toks = [a,b,a,b,a]
    //   dup_word_frac   = (5 - 2) / 5                  = 0.6
    //   top_word_cov    = a: 3 occurrences x 1 char / 9 = 0.333333
    //   top_bigram_cov  = "a b" 2 x 3 / 9               = 0.666667
    //   dup_trigram_frac= "a b a" 2 x 5 / 9             = 1.111111 (>1:
    //     overlapping occurrences both count — the documented overshoot)
    val m = run((1L, "A  b\ta B\n a"))
    assert(m(1L) == ((5L, 0.6, 0.333333, 0.666667, 1.111111)))
  }

  test("a repetition-free document scores zero on both dup signals") {
    // norm = "x y z" (5 chars): no repeated word, no repeated trigram
    val m = run((2L, "x y z"))
    assert(m(2L) == ((3L, 0.0, 0.2, 0.6, 0.0)))
  }

  test("documents under 3 tokens are dropped; others unaffected") {
    val m = run((1L, "just two"), (2L, "one"), (3L, ""), (4L, "u v w"))
    assert(m.keySet == Set(4L))
  }

  test("signals are invariant to input partitioning") {
    val docs = Seq(
      (1L, "a b a b a"), (2L, "x y z"), (3L, "p q p q p q p"),
      (4L, "only two"), (5L, "m n o p q r s m n o"))
      .toDF("doc_id", "text")
    val one = Repetition.signals(docs.coalesce(1)).collect().toSet
    val many = Repetition.signals(docs.repartition(7)).collect().toSet
    assert(one == many && one.nonEmpty)
  }
}
