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

  test("native kernel matches the sorted-run HOF formula on adversarial text") {
    // the original HOF formulation, kept here as the differential oracle
    // for the RepetitionStats kernel that replaced it
    import org.apache.spark.sql.{Column, DataFrame}
    import org.apache.spark.sql.functions._
    def hofSignals(docs: DataFrame): DataFrame = {
      val norm = trim(regexp_replace(lower(col("text")), "\\s+", " "))
      val base = docs
        .select(col("doc_id"), norm.as("__norm"))
        .withColumn("__toks",
          filter(split(col("__norm"), " "), t => length(t) > lit(0)))
        .withColumn("__nchars", length(col("__norm")))
        .withColumn("__ntok", size(col("__toks")))
        .filter(col("__ntok") >= 3)
        .withColumn("__ndistinct", size(array_distinct(col("__toks"))))
      val g2 = zip_with(
        slice(col("__toks"), lit(1), col("__ntok") - lit(1)),
        slice(col("__toks"), lit(2), col("__ntok") - lit(1)),
        (a, b) => concat(a, lit(" "), b))
      val g3 = zip_with(
        slice(g2, lit(1), col("__ntok") - lit(2)),
        slice(col("__toks"), lit(3), col("__ntok") - lit(2)),
        (a, b) => concat(a, lit(" "), b))
      def starts(ws: Column): Column =
        filter(sequence(lit(1), size(ws)),
          i => (i === lit(1)) || element_at(ws, i) =!= element_at(ws, i - lit(1)))
      def runs(ws: Column, st: Column): Column = {
        val nexts = concat(slice(st, lit(2), size(st) - lit(1)),
          array(size(ws) + lit(1)))
        zip_with(st, nexts, (a, b) =>
          struct((b - a).as("cnt"), length(element_at(ws, a)).as("len")))
      }
      val sorted = base
        .withColumn("__ws1", array_sort(col("__toks")))
        .withColumn("__ws2", array_sort(g2))
        .withColumn("__ws3", array_sort(g3))
        .withColumn("__st1", starts(col("__ws1")))
        .withColumn("__st2", starts(col("__ws2")))
        .withColumn("__st3", starts(col("__ws3")))
      def maxCov(ws: String, st: String): Column =
        array_max(transform(runs(col(ws), col(st)), r => r("cnt") * r("len")))
      def dupChars(ws: String, st: String): Column =
        aggregate(
          transform(runs(col(ws), col(st)), r =>
            when(r("cnt") > 1, (r("cnt") * r("len")).cast("long")).otherwise(lit(0L))),
          lit(0L), (acc, x) => acc + x)
      sorted
        .select(col("doc_id"),
          col("__nchars"), col("__ntok"), col("__ndistinct"),
          maxCov("__ws1", "__st1").as("__w1"),
          maxCov("__ws2", "__st2").as("__w2"),
          dupChars("__ws3", "__st3").as("__d3"))
        .select(
          col("doc_id"),
          col("__ntok").cast("long").as("n_tokens"),
          round((col("__ntok") - col("__ndistinct")).cast("double") / col("__ntok"), 6)
            .as("dup_word_frac"),
          round(col("__w1").cast("double") / col("__nchars"), 6).as("top_word_cov"),
          round(col("__w2").cast("double") / col("__nchars"), 6).as("top_bigram_cov"),
          round(col("__d3").cast("double") / col("__nchars"), 6).as("dup_trigram_frac"))
    }
    val rnd = new scala.util.Random(421)
    val vocab = Seq("a", "bb", "ccc", "éé", "中文", "x",
      "😀", "word", "spät", "бук")
    val randomDocs = (1L to 60L).map { i =>
      val n = rnd.nextInt(40)
      (i, (0 until n).map(_ => vocab(rnd.nextInt(vocab.length)))
        .mkString(sep = if (i % 3 == 0) "  " else " "))
    }
    val edgeDocs = Seq(
      (101L, "a a a a a a a a"), (102L, "\tmixed\nwhitespace\r here "),
      (103L, null.asInstanceOf[String]), (104L, ""), (105L, "ONE one OnE one"),
      (106L, "中 中文 中 中文 中"))
    val docs = (randomDocs ++ edgeDocs).toDF("doc_id", "text")
    val native = Repetition.signals(docs).collect().map(r => r.getLong(0) -> r.toSeq).toMap
    val hof = hofSignals(docs).collect().map(r => r.getLong(0) -> r.toSeq).toMap
    assert(native == hof && native.nonEmpty)
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
