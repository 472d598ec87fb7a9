package graft

import graft.core.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface of the custom expressions (runtime registration path;
  * the same builders back the `spark.sql.extensions=graft.GraftExtensions`
  * config route).
  */
class GraftExtensionsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("custom expressions callable from SQL") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT simhash64(array('a','b')) AS sh,
                minhash_bands(array('a b c','b c d'), 4, 2) AS mh,
                jaccard_sorted(array('a','b','c'), array('b','c','d')) AS js,
                word_shingles(array('a','b','c'), 2) AS ws,
                rolling_hash64('ab') AS rh""").head()
    assert(row.getLong(0) != 0L)
    assert(row.getSeq[Long](1).length == 4)
    assert(row.getDouble(2) == 0.5)
    assert(row.getSeq[String](3) == Seq("a b", "b c"))
    assert(row.getLong(4) == 'a'.toLong * 31 + 'b'.toLong)
  }

  test("SQL and Column APIs agree") {
    GraftExtensions.register(spark)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1L, Seq("x y z", "y z w"))).toDF("id", "sh")
    val viaCol = df.select(
      graft.functions.expressions.HashExpressions.minhash_bands(col("sh"), 4, 2)).head().getSeq[Long](0)
    df.createOrReplaceTempView("t")
    val viaSql = spark.sql("SELECT minhash_bands(sh, 4, 2) FROM t").head().getSeq[Long](0)
    assert(viaCol == viaSql)
  }
}
