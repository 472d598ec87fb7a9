package graft.operators

import java.nio.file.Files
import graft.core.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ProfileSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val df = Seq(
    (Some(1.5), Some("aa")),
    (Some(2.5), Some("bb")),
    (None, Some("aa")),
    (Some(2.5), None)
  ).toDF("num", "str")

  test("profiles nulls, exact distincts, extremes, and means per column") {
    val rows = Profile.profileColumns(df, Seq("num"), Seq("str"))
      .collect().map(r => r.getString(0) -> r).toMap
    val n = rows("num")
    assert(n.getAs[Long]("n_rows") == 4L && n.getAs[Long]("n_nulls") == 1L)
    assert(n.getAs[Long]("n_distinct") == 2L)
    assert(n.getAs[Double]("min_num") == 1.5 && n.getAs[Double]("max_num") == 2.5)
    assert(n.getAs[Double]("avg_num") == 2.166667) // 6.5/3 at the 6dp discipline
    assert(n.isNullAt(n.fieldIndex("min_str")))
    val s = rows("str")
    assert(s.getAs[Long]("n_nulls") == 1L && s.getAs[Long]("n_distinct") == 2L)
    assert(s.getAs[String]("min_str") == "aa" && s.getAs[String]("max_str") == "bb")
    assert(s.getAs[Double]("avg_len") == 2.0)
    assert(s.isNullAt(s.fieldIndex("min_num")))
  }

  test("the whole profile is one scan (no per-column jobs)") {
    val dir = Files.createTempDirectory("profile-scan").toString
    (0L until 500L).map(i => (i, i * 1.5, s"s${i % 7}"))
      .toDF("a", "b", "c").write.mode("overwrite").parquet(dir)
    val prof = Profile.profileColumns(spark.read.parquet(dir),
      Seq("a", "b"), Seq("c"))
    val scans = prof.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.length == 1, s"profile read the table ${scans.length} times")
    assert(prof.count() == 3)
  }

  test("approx mode trades the Expand for sketches, same schema, sane estimates") {
    val big = (0L until 2000L).map(i => (i % 97, (i % 13).toString))
      .toDF("a", "c")
    val exact = Profile.profileColumns(big, Seq("a"), Seq("c"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_distinct")).toMap
    val approx = Profile.profileColumns(big, Seq("a"), Seq("c"), exactDistinct = false)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_distinct")).toMap
    assert(exact("a") == 97L && exact("c") == 13L)
    assert(math.abs(approx("a") - 97L) <= 5 && math.abs(approx("c") - 13L) <= 2)
    // the exact form pays an Expand; the approx form must not
    assert(Profile.profileColumns(big, Seq("a"), Seq("c"), exactDistinct = false)
      .queryExecution.sparkPlan.collect {
        case e: org.apache.spark.sql.execution.ExpandExec => e
      }.isEmpty, "approx profile still plans an Expand")
  }

  test("psiDrift: zero on identical snapshots, sequential-model parity, shift detection") {
    import spark.implicits._
    val rnd = new scala.util.Random(53)
    val baseRows = Seq.fill(600)(rnd.nextGaussian() * 20 + 50)
    val shiftRows = Seq.fill(600)(rnd.nextGaussian() * 20 + 70)
    def df(xs: Seq[Double]) = xs.toDF("value")
    def psiOf(a: Seq[Double], b: Seq[Double]): Double =
      Profile.psiDrift(df(a), df(b), "value", lo = 0.0, binWidth = 10.0, nBins = 10)
        .head().getDouble(3)
    // identical snapshots: every term is (p - p) ln 1 = 0
    assert(psiOf(baseRows, baseRows) == 0.0)
    // sequential replay of the declared formula
    def model(a: Seq[Double], b: Seq[Double]): Double = {
      def bins(xs: Seq[Double]) = xs
        .map(v => math.min(math.max(math.floor(v / 10.0), -1.0), 10.0).toLong)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val (ba, bb) = (bins(a), bins(b))
      val keys = ba.keySet ++ bb.keySet
      val (ta, tb) = (a.size.toDouble, b.size.toDouble)
      val raw = keys.toSeq.map { k =>
        val p = math.max(ba.getOrElse(k, 0L) / ta, 1e-6)
        val q = math.max(bb.getOrElse(k, 0L) / tb, 1e-6)
        (p - q) * math.log(p / q)
      }.sum
      BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = psiOf(baseRows, shiftRows)
    assert(math.abs(got - model(baseRows, shiftRows)) <= 1e-5,
      s"psi diverged: got $got, model ${model(baseRows, shiftRows)}")
    // a 1-sigma mean shift is a textbook "shifted" reading; tiny noise is not
    assert(got > 0.25, s"shift undetected: $got")
    assert(psiOf(baseRows, baseRows.map(_ + 0.01)) < 0.1)
  }
  test("setOverlap exact: multiplicity never matters; jaccard by hand") {
    import spark.implicits._
    // A = {1,2,3} (2 repeated heavily), B = {3,4}; a NULL key drops
    val a = Seq(1L, 2L, 2L, 2L, 3L).map(Option(_)).toDF("k")
    val b = (Seq(3L, 4L).map(Option(_)) :+ Option.empty[Long]).toDF("k")
    val got = Profile.setOverlap(a, b, "k")
      .as[(Long, Long, Long, Long, Double)].collect().head
    assert(got == ((3L, 2L, 1L, 4L, 0.25)))
  }

  test("setOverlap HLL lands within tolerance of exact, with NO key exchange") {
    import spark.implicits._
    val a = (1 to 4000).map(_.toLong).toDF("k")
    val b = (2001 to 6000).map(_.toLong).toDF("k")
    val e = Profile.setOverlap(a, b, "k")
      .as[(Long, Long, Long, Long, Double)].collect().head
    assert(e == ((4000L, 4000L, 2000L, 6000L, BigDecimal(2000.0 / 6000)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    val hdf = Profile.setOverlap(a, b, "k", exact = false)
    val h = hdf.as[(Long, Long, Long, Long, Double)].collect().head
    assert(math.abs(h._1 - 4000) <= 200 && math.abs(h._4 - 6000) <= 300, s"$h")
    assert(math.abs(h._5 - e._5) <= 0.1, s"jaccard estimate drifted: $h vs $e")
    // the sketch path must not shuffle on the key: sketch partials merge
    val plan = hdf.queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning(__k"),
      s"HLL overlap shuffled on the key:\n${plan.take(1200)}")
  }
  test("outliers: median/MAD by hand, zero-MAD degenerate, cutoff flags") {
    import spark.implicits._
    // group g: {1..9, 100}: med=5.5, |dev| = {4.5,3.5,...,0.5,94.5} ->
    // mad median of {0.5..4.5, 94.5} = 2.5; z(100) = 0.6745*94.5/2.5 = 25.5
    // group c: constant -> mad 0 -> z 0, nothing flags
    val df = ((1 to 9).map(v => ("g", v.toDouble)) :+ ("g", 100.0)) ++
      Seq(("c", 7.0), ("c", 7.0), ("c", 7.0))
    val got = Profile.outliers(df.toDF("k", "v"), Seq("k"), "v", cutoff = 3.5)
      .orderBy("k", "v").as[(String, Double, Double, Boolean)].collect().toSeq
    val gz = got.filter(_._1 == "g")
    assert(gz.last._3 == BigDecimal(0.6745 * 94.5 / 2.5)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble && gz.last._4)
    assert(gz.init.forall(!_._4), s"inliers flagged: $gz")
    assert(got.filter(_._1 == "c").forall(r => r._3 == 0.0 && !r._4))
  }
}
