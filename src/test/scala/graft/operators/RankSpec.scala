package graft.operators

import graft.core.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Rank — the two-phase distributed prefix scans. Ground truth is the
  * sequential scan over the collected, fully-sorted data; the points
  * pinned are exactness (not approximation — bucket boundaries must
  * never move a value), partition invariance, and the degenerate
  * shapes that break naive bucketing (heavy ties, fewer distinct
  * values than buckets, single row).
  */
class RankSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // keys with heavy ties (values mod 17) so quantile boundaries land ON
  // tied runs, ids unique for the total order
  private def data(n: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(11)
    (0 until n).map(i => (i.toLong, (rnd.nextInt(17) * 10 + 3).toLong))
  }

  test("rowNumber equals the sequential rank, survives repartitioning and ties") {
    val rows = data(5000)
    val df = rows.toDF("id", "v").repartition(13)
    val got = Rank.rowNumber(df, Seq(col("v"), col("id")),
        bucketOn = col("v"), out = "rn")
      .select("id", "rn").as[(Long, Long)].collect().toMap
    val want = rows.sortBy(r => (r._2, r._1)).zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1L) }.toMap
    assert(got == want)
    val again = Rank.rowNumber(df.repartition(3), Seq(col("v"), col("id")),
        bucketOn = col("v"), out = "rn")
      .select("id", "rn").as[(Long, Long)].collect().toMap
    assert(again == want)
  }

  test("runningSum is the exact inclusive prefix sum in total order") {
    val rows = data(3000)
    val df = rows.toDF("id", "v")
    val got = Rank.runningSum(df, Seq(col("v"), col("id")),
        bucketOn = col("v"), value = col("v"), out = "rs")
      .select("id", "rs").as[(Long, Long)].collect().toMap
    var acc = 0L
    val want = rows.sortBy(r => (r._2, r._1)).map { case (id, v) =>
      acc += v; id -> acc
    }.toMap
    assert(got == want)
  }

  test("runningSum descending via negated bucket key (the q_pareto shape)") {
    val rows = data(2000)
    val df = rows.toDF("id", "v")
    val got = Rank.runningSum(df, Seq(col("v").desc, col("id")),
        bucketOn = -col("v"), value = col("v"), out = "rs")
      .select("id", "rs").as[(Long, Long)].collect().toMap
    var acc = 0L
    val want = rows.sortBy(r => (-r._2, r._1)).map { case (id, v) =>
      acc += v; id -> acc
    }.toMap
    assert(got == want)
  }

  test("prefixMax is strict (current row excluded), NULL on the global first row") {
    val rows = data(2000).map { case (id, v) => (id, v, (id * 7919) % 1000) }
    val df = rows.toDF("id", "v", "m")
    val got = Rank.prefixMax(df, Seq(col("v"), col("id")),
        bucketOn = col("v"), value = col("m"), out = "pm")
      .select("id", "pm").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
      .toMap
    var best: Option[Long] = None
    val want = rows.sortBy(r => (r._2, r._1)).map { case (id, _, m) =>
      val out = id -> best
      best = Some(best.fold(m)(math.max(_, m)))
      out
    }.toMap
    assert(got == want)
    assert(got(rows.minBy(r => (r._2, r._1))._1).isEmpty,
      "the global first row must carry NULL")
  }

  test("ntile matches the exact SQL bucket sizes, heavy ties, n > count edge") {
    val rows = data(1003) // 1003 % 7 = 2: both bucket-size branches
    val df = rows.toDF("id", "v").repartition(9)
    val got = Rank.ntile(df, Seq(col("v"), col("id")),
        bucketOn = col("v"), n = 7, out = "bucket")
      .select("id", "bucket").as[(Long, Long)].collect().toMap
    // sequential reference: first (c mod n) buckets get q+1 rows
    val c = rows.size; val q = c / 7; val r = c % 7
    val want = rows.sortBy(x => (x._2, x._1)).zipWithIndex.map {
      case ((id, _), i) =>
        id -> (if (i < r * (q + 1)) i / (q + 1) + 1L
               else r + (i - r * (q + 1)) / q + 1L)
    }.toMap
    assert(got == want)
    val sizes = got.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(sizes == Map(1L -> 144, 2L -> 144, 3L -> 143, 4L -> 143,
      5L -> 143, 6L -> 143, 7L -> 143))
    // n > count: every row alone in its own rank-numbered bucket
    val tiny = rows.take(3).toDF("id", "v")
    val g2 = Rank.ntile(tiny, Seq(col("v"), col("id")),
        bucketOn = col("v"), n = 10, out = "bucket")
      .select("bucket").as[Long].collect().sorted.toSeq
    assert(g2 == Seq(1L, 2L, 3L))
  }

  test("percentRank is (rn-1)/(c-1); single row is 0.0") {
    val rows = data(500)
    val df = rows.toDF("id", "v").repartition(5)
    val got = Rank.percentRank(df, Seq(col("v"), col("id")),
        bucketOn = col("v"), out = "pr")
      .select("id", "pr").as[(Long, Double)].collect().toMap
    val want = rows.sortBy(x => (x._2, x._1)).zipWithIndex.map {
      case ((id, _), i) => id -> i.toDouble / (rows.size - 1)
    }.toMap
    assert(got == want) // bit-exact: same IEEE division
    val one = Rank.percentRank(rows.take(1).toDF("id", "v"),
        Seq(col("v"), col("id")), bucketOn = col("v"), out = "pr")
      .select("pr").as[Double].head()
    assert(one == 0.0)
  }

  test("cumeDist follows the SQL tie rule (peers share the last member's count)") {
    val rows = data(2000) // 17 distinct values: every row has ~117 peers
    val df = rows.toDF("id", "v").repartition(7)
    val got = Rank.cumeDist(df, "v", out = "cd")
      .select("id", "cd").as[(Long, Double)].collect().toMap
    val n = rows.size
    val leByValue = rows.map(_._2).groupBy(identity).view
      .mapValues(_.size).toMap
    val sortedVals = leByValue.keys.toSeq.sorted
    val cumLe = sortedVals.zip(
      sortedVals.scanLeft(0L)(_ + leByValue(_)).tail).toMap
    val want = rows.map { case (id, v) => id -> cumLe(v).toDouble / n }.toMap
    assert(got == want) // bit-exact: same IEEE division
    assert(got.values.max == 1.0, "the top tie group must reach exactly 1.0")
    // NULL values are excluded entirely: not ranked, not counted in n
    val withNull = (rows.take(50).map { case (id, v) => (id, Some(v)) } :+
      (9999L, Option.empty[Long])).toDF("id", "v")
    val g2 = Rank.cumeDist(withNull, "v", out = "cd")
      .select("id", "cd").as[(Long, Double)].collect()
    assert(g2.length == 50 && !g2.exists(_._1 == 9999L))
    assert(g2.map(_._2).max == 1.0, "n must exclude the NULL row")
  }

  test("quantilesDisc picks the exact ceil(p*n)-ranked value, ties and all") {
    val rnd = new scala.util.Random(23)
    val vals = (0 until 2001).map(_ => rnd.nextInt(50).toLong) // heavy ties
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v").repartition(9)
    val probs = Seq(0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0)
    val got = Rank.quantilesDisc(df, "v", probs)
      .as[(Double, Long)].collect().toMap
    val sorted = vals.sorted
    val want = probs.map { p =>
      val r = math.max(1L, math.ceil(p * sorted.length).toLong)
      p -> sorted((r - 1).toInt)
    }.toMap
    assert(got == want)
    // NULLs carry no rank
    val withNulls = df.select(col("id"),
      when(col("id") % 3 === 0, col("v")).as("v"))
    val live = vals.zipWithIndex.collect { case (v, i) if i % 3 == 0 => v }.sorted
    val g2 = Rank.quantilesDisc(withNulls, "v", Seq(0.5))
      .as[(Double, Long)].collect().toMap
    assert(g2(0.5) ==
      live((math.max(1L, math.ceil(0.5 * live.length).toLong) - 1).toInt))
  }

  test("degenerate shapes: one distinct key, fewer rows than buckets, one row") {
    // every row shares the bucket key — one giant bucket, still exact
    val tied = (0L until 100L).map(i => (i, 5L)).toDF("id", "v")
    val rn = Rank.rowNumber(tied, Seq(col("v"), col("id")),
        bucketOn = col("v"), out = "rn")
      .select("id", "rn").as[(Long, Long)].collect().toMap
    assert(rn == (0L until 100L).map(i => i -> (i + 1L)).toMap)
    // 3 rows, default bucket count far larger
    val tiny = Seq((1L, 30L), (2L, 10L), (3L, 20L)).toDF("id", "v")
    val rs = Rank.runningSum(tiny, Seq(col("v"), col("id")),
        bucketOn = col("v"), value = col("v"), out = "rs")
      .select("id", "rs").as[(Long, Long)].collect().toMap
    assert(rs == Map(2L -> 10L, 3L -> 30L, 1L -> 60L))
    // single row
    val one = Rank.prefixMax(Seq((1L, 1L)).toDF("id", "v"),
        Seq(col("v"), col("id")), bucketOn = col("v"), value = col("v"),
        out = "pm")
      .select("pm").collect()
    assert(one.length == 1 && one(0).isNullAt(0))
  }
}
