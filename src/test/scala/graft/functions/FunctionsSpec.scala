package graft.functions

import graft.core.TestSpark
import graft.functions.expressions.HashExpressions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FunctionsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import org.apache.spark.sql.Row

  private def one(colExpr: org.apache.spark.sql.Column, text: String): Any = {
    import spark.implicits._
    Seq(text).toDF("text").select(colExpr.as("v")).head().get(0)
  }

  test("normalize/tokens/fingerprint") {
    assert(one(Text.normalize(col("text")), "  Hello\t WORLD  ") == "hello world")
    assert(one(Text.tokenCount(col("text")), "a b  c").asInstanceOf[Int] == 3)
    assert(one(Text.bpeTokenCount(col("text")), "ab12,cd").asInstanceOf[Int] == 4) // ab|12|,|cd
    // md5 of normalized text, stable
    assert(one(Text.fingerprint(col("text")), "A  b") ==
      one(Text.fingerprint(col("text")), "a b"))
  }

  test("shingles produce distinct k-grams") {
    val sh = one(Text.shingles(col("text"), 3), "a b c d").asInstanceOf[scala.collection.Seq[String]]
    assert(sh.toSet == Set("a b c", "b c d"))
  }

  test("quality ratios bounded and deterministic") {
    val p = one(Text.punctRatio(col("text")), "a,b.c!").asInstanceOf[Double]
    assert(p == 3.0 / 6.0)
    val s = one(Text.stopwordRatio(col("text")), "the cat and dog").asInstanceOf[Double]
    assert(s == 2.0 / 4.0)
  }

  test("TextStats matches the composed column forms") {
    import spark.implicits._
    val texts = Seq(
      "The quick brown fox, with a vengeance!? And so it goes; on and on.",
      "", "   ", "a", "no stop words here whatsoever",
      "the the the the", ".,!?;:", "多字节 文本 the cat", "x" * 600)
    val df = texts.toDF("text")
    val st = Text.stats(col("text"))
    val got = df.select(
      st.getField("n_chars"), st.getField("punct_ratio"),
      st.getField("stopword_ratio"), st.getField("quality")).collect()
    val want = df.select(
      length(col("text")).cast("long"), Text.punctRatio(col("text")),
      Text.stopwordRatio(col("text")),
      // qualityScore rounds internally; compare unrounded composition
      (least(length(col("text")).cast("double") / 500.0, lit(1.0)) +
        least(Text.stopwordRatio(col("text")) * 4.0, lit(1.0)) +
        greatest(lit(1.0) - Text.punctRatio(col("text")) * 5.0, lit(0.0))) / 3.0).collect()
    got.zip(want).zip(texts).foreach { case ((g, w), t) =>
      assert(g.getLong(0) == w.getLong(0), s"n_chars for '$t'")
      assert(math.abs(g.getDouble(1) - w.getDouble(1)) < 1e-12, s"punct for '$t'")
      assert(math.abs(g.getDouble(2) - w.getDouble(2)) < 1e-12, s"stop for '$t'")
      assert(math.abs(g.getDouble(3) - w.getDouble(3)) < 1e-12, s"quality for '$t'")
    }
  }

  test("langId picks marker language; CJK wins") {
    assert(one(Text.langId(col("text")), "the cat is on the mat and happy") == "en")
    assert(one(Text.langId(col("text")), "el perro y la casa de madrid que") == "es")
    assert(one(Text.langId(col("text")), "der hund und die katze ist gut") == "de")
    assert(one(Text.langId(col("text")), "你好 world") == "zh")
    assert(one(Text.langId(col("text")), "zzz qqq") == "und")
  }

  test("cosine/jaccard basics") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 0.0f), Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)))
      .toDF("a", "b", "c")
    val r = df.select(
      Vectors.cosine(col("a"), col("b")).as("same"),
      Vectors.cosine(col("a"), col("c")).as("orth")).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12 && math.abs(r.getDouble(1)) < 1e-12)
    val j = Seq((Seq("a", "b", "c"), Seq("b", "c", "d")))
      .toDF("x", "y").select(Vectors.jaccard(col("x"), col("y"))).head().getDouble(0)
    assert(j == 2.0 / 4.0)
  }

  test("MinHashBands: identical inputs collide on every band, disjoint rarely") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("a b c", "b c d", "c d e")),
      (2L, Seq("a b c", "b c d", "c d e")),
      (3L, Seq("x y z", "y z w", "z w v"))).toDF("id", "sh")
    val bands = df.select(col("id"), HashExpressions.minhash_bands(col("sh"), 4, 2).as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(bands(1L) == bands(2L))
    assert(bands(1L) != bands(3L))
    assert(bands(1L).length == 4)
  }

  test("SimHash64: near-identical token sets within small Hamming distance") {
    import spark.implicits._
    val df = Seq(
      (1L, (1 to 50).map(i => s"tok$i")),
      (2L, (1 to 50).map(i => s"tok$i") :+ "extra"),
      (3L, (100 to 150).map(i => s"zz$i"))).toDF("id", "toks")
    val sigs = df.select(col("id"), HashExpressions.simhash64(col("toks")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(1L), sigs(2L)) <= 8)
    assert(ham(sigs(1L), sigs(3L)) > 8)
  }

  test("rollingHash is order-sensitive") {
    assert(one(Text.rollingHash(col("text")), "ab") != one(Text.rollingHash(col("text")), "ba"))
  }
}
