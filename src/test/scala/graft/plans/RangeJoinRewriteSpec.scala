package graft.plans

import graft.GraftExtensions
import graft.core.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The opt-in range-join bin rewrite: SQL point-in-interval joins leave
  * the nested-loop plan family when `spark.graft.rangeJoin.binSize` is
  * set, and every rewritten result is row-identical to the nested-loop
  * truth (the residual keeps the original predicates verbatim).
  */
class RangeJoinRewriteSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  GraftExtensions.register(spark)

  // points: (pid, user, t); intervals: (iid, user, s, e) incl. a null-t
  // point, a null-s interval, and a malformed s > e interval
  Seq((1L, "u1", Some(5L)), (2L, "u1", Some(25L)), (3L, "u2", Some(5L)),
      (4L, "u1", None))
    .toDF("pid", "user", "t").createOrReplaceTempView("pts")
  Seq((10L, "u1", Some(0L), Some(10L)), (11L, "u1", Some(20L), Some(30L)),
      (12L, "u2", Some(100L), Some(200L)), (13L, "u1", None, Some(50L)),
      (14L, "u1", Some(40L), Some(35L)))
    .toDF("iid", "user", "s", "e").createOrReplaceTempView("iv")

  private def withBin[A](bin: Long)(f: => A): A = {
    spark.conf.set(RangeJoinRewrite.BinSizeConf, bin.toString)
    try f finally spark.conf.unset(RangeJoinRewrite.BinSizeConf)
  }

  private def planOf(sql: String): String =
    spark.sql(sql).queryExecution.executedPlan.toString

  private def rows(sql: String): Seq[(Long, Long)] =
    spark.sql(sql).as[(Long, Long)].collect().toSeq.sorted

  private val plainSql =
    "SELECT pid, iid FROM pts JOIN iv ON t >= s AND t <= e"
  private val keyedSql =
    """SELECT pid, iid FROM pts JOIN iv
       ON pts.user = iv.user AND t >= s AND t <= e"""
  private val strictSql =
    "SELECT pid, iid FROM pts JOIN iv ON t > s AND t < e"

  test("dormant without the conf: the nested-loop plan survives") {
    val p = planOf(plainSql)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("CartesianProduct"),
      s"expected Spark's native non-equi plan when the rule is off:\n$p")
  }

  test("with the conf: binned equi-join plan, identical rows") {
    val truth = rows(plainSql)
    assert(truth.nonEmpty)
    withBin(8L) {
      val p = planOf(plainSql)
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"rewrite did not fire:\n$p")
      assert(p.contains("Generate"), s"no bin replication in:\n$p")
      assert(rows(plainSql) == truth)
    }
  }

  test("equality conjuncts join alongside the bin (narrow reducers)") {
    val truth = rows(keyedSql)
    assert(truth.nonEmpty)
    withBin(8L) {
      val p = planOf(keyedSql)
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"keyed rewrite did not fire:\n$p")
      // the user key must be part of the join, not just the residual
      assert(p.linesIterator.exists(l =>
        l.contains("Join") && l.contains("user")), s"equi key left the join:\n$p")
      assert(rows(keyedSql) == truth)
    }
  }

  test("strict bounds stay exact (residual keeps original strictness)") {
    val truth = rows(strictSql)
    withBin(8L) {
      assert(!planOf(strictSql).contains("BroadcastNestedLoopJoin"))
      assert(rows(strictSql) == truth)
    }
  }

  test("nulls and malformed (s > e) intervals match nothing, both modes") {
    val truth = rows(plainSql)
    assert(!truth.exists { case (p, i) => p == 4L || i == 13L || i == 14L })
    withBin(8L) {
      assert(!rows(plainSql).exists { case (p, i) => p == 4L || i == 13L || i == 14L })
    }
  }

  test("bin width never changes rows (sweep, incl. wider than every interval)") {
    val truth = rows(keyedSql)
    for (bin <- Seq(1L, 3L, 7L, 64L, 1000000L))
      withBin(bin) { assert(rows(keyedSql) == truth, s"bin=$bin diverged") }
  }

  test("interval overlap: rewrite fires, rows identical, no duplicates") {
    // iv vs itself: overlap of [s,e] pairs per user — many shared bins
    // per pair at bin=2, so the first-shared-bin dedup is load-bearing
    val q = """SELECT a.iid, b.iid FROM iv a JOIN iv b
               ON a.user = b.user AND a.s <= b.e AND b.s <= a.e"""
    val truth = rows(q)
    assert(truth.nonEmpty)
    for (bin <- Seq(2L, 7L, 1000L)) withBin(bin) {
      val p = planOf(q)
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"overlap rewrite did not fire at bin=$bin:\n$p")
      assert(rows(q) == truth, s"bin=$bin diverged (duplicate or lost pairs)")
    }
  }

  test("interval overlap: strict bounds and reversed operand order stay exact") {
    val q = """SELECT a.iid, b.iid FROM iv a JOIN iv b
               ON b.e >= a.s AND a.e > b.s AND a.iid < b.iid"""
    val truth = rows(q)
    withBin(4L) {
      assert(!planOf(q).contains("BroadcastNestedLoopJoin"))
      assert(rows(q) == truth)
    }
  }

  test("overlap fuzz: random interval pairs equal the nested-loop truth") {
    val rnd = new scala.util.Random(11)
    def mk(n: Int, name: String): Unit =
      Seq.tabulate(n) { i =>
        val s = rnd.nextInt(500).toLong
        (i.toLong, s"u${rnd.nextInt(4)}", s, s + rnd.nextInt(60).toLong)
      }.toDF("iid", "user", "s", "e").createOrReplaceTempView(name)
    mk(150, "fa"); mk(150, "fb")
    val q = """SELECT fa.iid, fb.iid FROM fa JOIN fb
               ON fa.user = fb.user AND fa.s <= fb.e AND fb.s <= fa.e"""
    val truth = rows(q)
    assert(truth.nonEmpty)
    withBin(32L) {
      assert(!planOf(q).contains("BroadcastNestedLoopJoin"))
      assert(rows(q) == truth)
    }
  }

  private def rowsOpt(sql: String): Seq[(Long, Option[Long])] =
    spark.sql(sql).as[(Long, Option[Long])].collect().toSeq.sortBy(r => (r._1, r._2))

  test("LEFT JOIN preserving the point side: no nested loop, identical rows") {
    val q = """SELECT pid, iid FROM pts LEFT JOIN iv
               ON pts.user = iv.user AND t >= s AND t <= e"""
    val truth = rowsOpt(q)
    // the fixture guarantees both matched and unmatched points
    assert(truth.exists(_._2.isEmpty) && truth.exists(_._2.nonEmpty))
    for (bin <- Seq(3L, 8L, 1000L)) withBin(bin) {
      val p = planOf(q)
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"left-outer rewrite did not fire at bin=$bin:\n$p")
      assert(rowsOpt(q) == truth,
        s"bin=$bin diverged (lost or duplicated a null-extension)")
    }
  }

  test("RIGHT JOIN preserving the point side rewrites; interval-preserved does not") {
    val rightQ = """SELECT pid, iid FROM iv RIGHT JOIN pts
                    ON pts.user = iv.user AND t >= s AND t <= e"""
    val truthR = rowsOpt(rightQ)
    withBin(8L) {
      assert(!planOf(rightQ).contains("BroadcastNestedLoopJoin"),
        s"right-outer (point preserved) should rewrite:\n${planOf(rightQ)}")
      assert(rowsOpt(rightQ) == truthR)
    }
    // LEFT JOIN preserving the INTERVAL side: replicated side would
    // null-extend once per bin — the rule must step aside (no bin
    // Generate in the plan), rows unchanged
    val ivQ = """SELECT iid, pid FROM iv LEFT JOIN pts
                 ON pts.user = iv.user AND t >= s AND t <= e"""
    val truthI = rowsOpt(ivQ)
    withBin(8L) {
      assert(!planOf(ivQ).contains("Generate"),
        s"interval-preserved outer join must NOT be rewritten:\n${planOf(ivQ)}")
      assert(rowsOpt(ivQ) == truthI)
    }
  }

  test("EXISTS / NOT EXISTS time-range subqueries leave the nested loop") {
    val existsQ = """SELECT pid FROM pts WHERE EXISTS (
      SELECT 1 FROM iv WHERE iv.user = pts.user
        AND pts.t >= iv.s AND pts.t <= iv.e)"""
    val notExistsQ = """SELECT pid FROM pts WHERE NOT EXISTS (
      SELECT 1 FROM iv WHERE iv.user = pts.user
        AND pts.t >= iv.s AND pts.t <= iv.e)"""
    def ids(sql: String): Seq[Long] =
      spark.sql(sql).as[Long].collect().toSeq.sorted
    val existsTruth = ids(existsQ)
    val notExistsTruth = ids(notExistsQ)
    // complementary over the point set, so both sides are exercised
    assert(existsTruth.nonEmpty && notExistsTruth.nonEmpty)
    assert((existsTruth ++ notExistsTruth).sorted ==
      Seq(1L, 2L, 3L, 4L))
    for ((q, truth) <- Seq(existsQ -> existsTruth, notExistsQ -> notExistsTruth);
         bin <- Seq(3L, 8L, 1000L)) withBin(bin) {
      val p = planOf(q)
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"semi/anti rewrite did not fire at bin=$bin:\n$p")
      assert(ids(q) == truth, s"bin=$bin diverged for:\n$q")
    }
  }

  test("abs() band-join SQL rewrites: both strictnesses, either operand order") {
    // pts x pts self-band on t — the `abs(a.t - b.t) <= d` idiom
    // the u1 pair sits exactly 20 apart: <= 20 is the inclusive
    // boundary, < 21 the strict twin
    val qs = Seq(
      """SELECT a.pid, b.pid FROM pts a JOIN pts b
         ON a.user = b.user AND abs(a.t - b.t) <= 20 AND a.pid < b.pid""",
      """SELECT a.pid, b.pid FROM pts a JOIN pts b
         ON a.user = b.user AND abs(b.t - a.t) < 21 AND a.pid < b.pid""",
      """SELECT a.pid, b.pid FROM pts a JOIN pts b
         ON a.user = b.user AND 20 >= abs(a.t - b.t) AND a.pid < b.pid""")
    for (q <- qs) {
      val truth = rows(q)
      assert(truth.nonEmpty, s"fixture has no band pairs for:\n$q")
      for (bin <- Seq(5L, 12L, 1000L)) withBin(bin) {
        val p = planOf(q)
        assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
          s"abs-band rewrite did not fire at bin=$bin:\n$p")
        assert(rows(q) == truth, s"bin=$bin diverged for:\n$q")
      }
    }
  }

  test("an explicit user join hint wins over the rule") {
    val q = """SELECT /*+ BROADCAST(iv) */ pid, iid FROM pts JOIN iv
               ON t >= s AND t <= e"""
    val truth = rows(q)
    withBin(8L) {
      assert(planOf(q).contains("BroadcastNestedLoopJoin"),
        s"hinted join must keep the user's strategy:\n${planOf(q)}")
      assert(rows(q) == truth)
    }
  }

  test("degenerate-interval guard: a bin-explosion interval fails loudly") {
    Seq((1L, "u1", Some(0L), Some(100000000L)))
      .toDF("iid", "user", "s", "e").createOrReplaceTempView("wideiv")
    withBin(1L) {
      spark.conf.set(RangeJoinRewrite.MaxBinsConf, "1000")
      try {
        val ex = intercept[Exception] {
          spark.sql("SELECT pid, iid FROM pts JOIN wideiv ON t >= s AND t <= e")
            .collect()
        }
        def msgs(t: Throwable): Seq[String] =
          if (t == null) Nil
          else Option(t.getMessage).toSeq ++ msgs(t.getCause)
        assert(msgs(ex).exists(_.contains("bins")),
          s"expected the loud bins guard, got: ${msgs(ex)}")
      } finally spark.conf.unset(RangeJoinRewrite.MaxBinsConf)
    }
  }

  test("fuzz: rewritten rows equal the nested-loop truth on random data") {
    val rnd = new scala.util.Random(7)
    val pts = Seq.tabulate(300)(i =>
      (i.toLong, s"u${rnd.nextInt(5)}", Some(rnd.nextInt(1000).toLong)))
    val ivs = Seq.tabulate(120) { i =>
      val s = rnd.nextInt(1000).toLong
      (i.toLong, s"u${rnd.nextInt(5)}", Some(s), Some(s + rnd.nextInt(80).toLong))
    }
    pts.toDF("pid", "user", "t").createOrReplaceTempView("fpts")
    ivs.toDF("iid", "user", "s", "e").createOrReplaceTempView("fiv")
    val q = """SELECT pid, iid FROM fpts JOIN fiv
               ON fpts.user = fiv.user AND t >= s AND t <= e"""
    val truth = rows(q)
    assert(truth.nonEmpty)
    withBin(50L) {
      assert(!planOf(q).contains("BroadcastNestedLoopJoin"))
      assert(rows(q) == truth)
    }
    // the outer path on the same data: every point survives, null
    // extensions appear exactly once, across bin widths
    val lq = """SELECT pid, iid FROM fpts LEFT JOIN fiv
                ON fpts.user = fiv.user AND t >= s AND t <= e"""
    val ltruth = rowsOpt(lq)
    assert(ltruth.exists(_._2.isEmpty) && ltruth.exists(_._2.nonEmpty))
    for (bin <- Seq(13L, 50L, 400L)) withBin(bin) {
      assert(!planOf(lq).contains("BroadcastNestedLoopJoin"))
      assert(rowsOpt(lq) == ltruth, s"left-outer fuzz diverged at bin=$bin")
    }
    // the semi/anti paths: EXISTS and NOT EXISTS partition the points
    def ids(sql: String): Seq[Long] = spark.sql(sql).as[Long].collect().toSeq.sorted
    val exQ = """SELECT pid FROM fpts WHERE EXISTS (SELECT 1 FROM fiv
                 WHERE fiv.user = fpts.user AND t >= s AND t <= e)"""
    val neQ = """SELECT pid FROM fpts WHERE NOT EXISTS (SELECT 1 FROM fiv
                 WHERE fiv.user = fpts.user AND t >= s AND t <= e)"""
    val (exTruth, neTruth) = (ids(exQ), ids(neQ))
    assert(exTruth.nonEmpty && neTruth.nonEmpty &&
      exTruth.size + neTruth.size == 300)
    for (bin <- Seq(13L, 400L); (q, truth) <- Seq(exQ -> exTruth, neQ -> neTruth))
      withBin(bin) {
        assert(!planOf(q).contains("BroadcastNestedLoopJoin"))
        assert(ids(q) == truth, s"semi/anti fuzz diverged at bin=$bin")
      }
    // the abs band path on random points
    val absQ = """SELECT a.pid, b.pid FROM fpts a JOIN fpts b
                  ON a.user = b.user AND abs(a.t - b.t) <= 37 AND a.pid < b.pid"""
    val absTruth = rows(absQ)
    assert(absTruth.nonEmpty)
    for (bin <- Seq(19L, 37L, 500L)) withBin(bin) {
      assert(!planOf(absQ).contains("BroadcastNestedLoopJoin"))
      assert(rows(absQ) == absTruth, s"abs fuzz diverged at bin=$bin")
    }
  }
}
