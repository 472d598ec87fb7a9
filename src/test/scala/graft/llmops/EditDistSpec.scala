package graft.llmops

import graft.core.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Reference-implementation fuzz for [[Dedup.editDistancePairs]]: the
  * blocked (chunk-signature + length-band) plan must reproduce the
  * quadratic all-pairs levenshtein truth EXACTLY — the operator claims
  * no false negatives, so the fuzz deliberately seeds corpora straddling
  * the short/long routing boundary (len around (k+1)*w) where a naive
  * chunking scheme loses its pigeonhole guarantee on truncated chunks.
  */
class EditDistSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(b.length + 1)(identity)
    var prev = 0
    for (i <- 1 to a.length) {
      prev = d(0); d(0) = i
      for (j <- 1 to b.length) {
        val tmp = d(j)
        d(j) = math.min(math.min(d(j) + 1, d(j - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = tmp
      }
    }
    d(b.length)
  }

  private def norm(s: String) = s.toLowerCase.replaceAll("\\s+", " ").trim

  private def mutate(rnd: Random, s: String, edits: Int): String = {
    var cur = s
    for (_ <- 0 until edits) {
      val op = rnd.nextInt(3)
      val p = rnd.nextInt(math.max(1, cur.length))
      cur = op match {
        case 0 if cur.nonEmpty => cur.substring(0, p) + cur.substring(math.min(p + 1, cur.length)) // delete
        case 1 => cur.substring(0, p) + ('a' + rnd.nextInt(26)).toChar + cur.substring(p) // insert
        case _ if cur.nonEmpty => cur.substring(0, p) + ('a' + rnd.nextInt(26)).toChar + cur.substring(math.min(p + 1, cur.length)) // substitute
        case _ => cur
      }
    }
    cur
  }

  private def truth(docs: Seq[(Long, String)], k: Int): Set[(Long, Long, Int)] = {
    val n = docs.map { case (id, t) => (id, norm(t)) }
    (for {
      (ia, ta) <- n; (ib, tb) <- n
      if ia < ib && math.abs(ta.length - tb.length) <= k
      d = lev(ta, tb) if d <= k
    } yield (ia, ib, d)).toSet
  }

  private def run(docs: Seq[(Long, String)], k: Int): Set[(Long, Long, Int)] =
    Dedup.editDistancePairs(docs.toDF("doc_id", "text"), k = k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("blocked pairs equal the quadratic truth on boundary-length fuzz corpora") {
    val rnd = new Random(20260814L)
    val k = 5; val boundary = (k + 1) * 8 // longMin for w=8
    for (round <- 0 until 4) {
      val docs = scala.collection.mutable.ArrayBuffer[(Long, String)]()
      var id = 0L
      for (_ <- 0 until 18) {
        // lengths clustered on the short/long routing boundary plus tails
        val len = boundary - k - 2 + rnd.nextInt(2 * k + 6)
        val s = (0 until len).map(_ => ('a' + rnd.nextInt(6)).toChar).mkString
        docs += ((id, s)); id += 1
        // near-dup partners at 0..k and k+1..k+3 edits
        for (_ <- 0 until rnd.nextInt(3)) {
          docs += ((id, mutate(rnd, s, rnd.nextInt(k + 4)))); id += 1
        }
      }
      // a few genuinely long docs with partners
      for (_ <- 0 until 4) {
        val s = (0 until 150 + rnd.nextInt(100)).map(_ => ('a' + rnd.nextInt(8)).toChar).mkString
        docs += ((id, s)); id += 1
        docs += ((id, mutate(rnd, s, rnd.nextInt(k + 2)))); id += 1
      }
      val expect = truth(docs.toSeq, k)
      val got = run(docs.toSeq, k)
      assert(got == expect,
        s"round $round: missing=${expect -- got} extra=${got -- expect}")
      assert(expect.nonEmpty, s"round $round: degenerate fuzz corpus")
    }
  }

  test("whitespace/case differences are free (normalization before distance)") {
    val docs = Seq(
      (1L, "The  Quick\nBrown Fox jumps over the lazy dog tonight my friend"),
      (2L, "the quick brown fox jumps over the lazy dog tonight my friend"),
      (3L, "the quick brown fox jumps over the lazy dot tonight my friend"))
    val got = run(docs, 2)
    assert(got == Set((1L, 2L, 0), (1L, 3L, 1), (2L, 3L, 1)), s"got $got")
  }

  test("probe-bucket skew guard trips loudly on a degenerate corpus") {
    // 30 identical long docs: one chunk key holds every doc
    val docs = (0L until 30L)
      .map(i => (i, "aaaaaaaabbbbbbbbccccccccddddddddeeeeeeeeffffffffgggggggg"))
    val ex = intercept[Exception] {
      Dedup.editDistancePairs(docs.toDF("doc_id", "text"), k = 5,
        maxBucketSize = 8).count()
    }
    assert(ex.getMessage != null)
    // uncapped: all 30*29/2 pairs at distance 0
    assert(run(docs, 5).count(_._3 == 0) == 435)
  }
}
