package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.TestSpark
import graft.operators.Quality._

class QualitySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def df = Seq(
    (1L, Some("a"), 10.0, "AIR", "AB"),
    (2L, Some("b"), 20.0, "RAIL", "CD"),
    (3L, None, 55.0, "AIR", "EF"),
    (4L, Some("d"), 30.0, "SHIP", "G7"),
    (4L, Some("e"), 40.0, "AIR", "HI")
  ).toDF("id", "s", "v", "mode", "code")

  test("every constraint family measures and judges correctly in one call") {
    val out = Quality.check(df, Seq(
      Completeness("s", minRatio = 1.0),
      Unique(Seq("id")),
      Bounds("v", 0.0, 50.0, minRatio = 0.9),
      MemberOf("mode", Seq("AIR", "RAIL"), minRatio = 0.5),
      Matches("code", "[A-Z]{2}", minRatio = 1.0),
      MinRows(3L),
      MeanInRange("v", 20.0, 40.0)
    )).collect().map(r => r.getString(0) ->
      ((r.getDouble(2), r.getDouble(3), r.getBoolean(4)))).toMap

    assert(out("completeness:s") == ((0.8, 1.0, false)))
    assert(out("unique:id") == ((0.8, 1.0, false)))
    assert(out("bounds:v") == ((0.8, 0.9, false)))
    assert(out("member_of:mode") == ((0.8, 0.5, true)))
    // "G7" breaks the two-uppercase shape
    assert(out("matches:code") == ((0.8, 1.0, false)))
    assert(out("min_rows:3") == ((1.0, 1.0, true)))
    // mean(10,20,55,30,40) = 31 within [20, 40]
    assert(out("mean_in_range:v") == ((31.0, 20.0, true)))
  }

  test("NULLs fail bounds/membership/pattern but count one distinct group") {
    val d2 = Seq((Some(1.0), Option.empty[String]),
      (None, Some("x")), (None, Some("x"))).toDF("v", "k")
    val out = Quality.check(d2, Seq(
      Bounds("v", 0.0, 9.0), MemberOf("k", Seq("x")),
      Matches("k", "x+"), Unique(Seq("k"), minRatio = 0.5)
    )).collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out("bounds:v") == 0.333333)
    assert(out("member_of:k") == 0.666667)
    assert(out("matches:k") == 0.666667)
    // distinct over (NULL, "x") = 2 groups / 3 rows
    assert(out("unique:k") == 0.666667)
  }

  test("composite-key uniqueness distinguishes NULL from empty string") {
    val d3 = Seq((Option.empty[String], "x"), (Some(""), "x"))
      .toDF("a", "b")
    val u = Quality.check(d3, Seq(Unique(Seq("a", "b"))))
      .collect().head
    assert(u.getDouble(2) == 1.0 && u.getBoolean(4))
  }

  test("approxUnique path measures within HLL tolerance and skips Expand") {
    val big = spark.range(0, 10000)
      .select((col("id") % 1000).as("k"), col("id"))
    val exact = Quality.check(big, Seq(Unique(Seq("k"), minRatio = 0.05)))
      .collect().head.getDouble(2)
    val approx = Quality.check(big, Seq(Unique(Seq("k"), minRatio = 0.05)),
      approxUnique = true).collect().head.getDouble(2)
    assert(exact == 0.1)
    assert(math.abs(approx - 0.1) < 0.01)
    val plan = Quality.check(big, Seq(Unique(Seq("k"))), approxUnique = true)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), "HLL uniqueness must not plan an Expand")
  }

  test("all constraints compile into ONE aggregation pass over the input") {
    val plan = Quality.check(df, Seq(
      Completeness("s"), Bounds("v", 0.0, 50.0), MemberOf("mode", Seq("AIR")),
      Matches("code", "[A-Z]{2}"), MinRows(1L), MeanInRange("v", 0.0, 99.0)
    )).queryExecution.optimizedPlan
    val nScans = plan.collectLeaves().size
    assert(nScans == 1, s"expected one leaf scan, got $nScans:\n$plan")
  }

  test("duplicate constraint names are rejected loudly") {
    intercept[IllegalArgumentException] {
      Quality.check(df, Seq(Completeness("s"), Completeness("s")))
    }
  }

  test("metrics equal a sequential model on random data (fuzz)") {
    val rnd = new scala.util.Random(71)
    for (trial <- 1 to 5) {
      val rows = (1 to 200).map { _ =>
        (if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(60).toDouble),
          if (rnd.nextInt(8) == 0) None else Some(s"c${rnd.nextInt(40)}"),
          Seq("AIR", "RAIL", "SHIP", "ODD")(rnd.nextInt(4)))
      }
      val df2 = rows.toDF("v", "k", "mode")
      def r6(x: Double) = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val out = Quality.check(df2, Seq(
        Completeness("v"), Unique(Seq("k")),
        Bounds("v", 5.0, 50.0), MemberOf("mode", Seq("AIR", "RAIL")),
        MinRows(150L), MeanInRange("v", 20.0, 40.0)
      )).collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
      val n = rows.size.toDouble
      assert(out("completeness:v") == r6(rows.count(_._1.isDefined) / n))
      assert(out("unique:k") == r6(rows.map(_._2).distinct.size / n))
      assert(out("bounds:v") ==
        r6(rows.count(_._1.exists(x => x >= 5.0 && x <= 50.0)) / n))
      assert(out("member_of:mode") ==
        r6(rows.count(r => Set("AIR", "RAIL")(r._3)) / n))
      assert(out("min_rows:150") == r6(math.min(n / 150.0, 1.0)))
      val defined = rows.flatMap(_._1)
      assert(math.abs(out("mean_in_range:v") -
        defined.sum / defined.size) < 1e-5, s"trial $trial mean")
    }
  }

  test("checkGrouped isolates the broken slice") {
    val d = Seq(
      ("day1", Some(1.0)), ("day1", Some(2.0)),
      ("day2", None), ("day2", Some(9.0))
    ).toDF("day", "v")
    val out = Quality.checkGrouped(d, Seq("day"), Seq(
      Completeness("v"), Bounds("v", 0.0, 5.0)
    )).collect().map(r => (r.getString(0), r.getString(1),
      r.getDouble(3), r.getBoolean(5))).toSeq
    assert(out == Seq(
      ("day1", "bounds:v", 1.0, true),
      ("day1", "completeness:v", 1.0, true),
      ("day2", "bounds:v", 0.0, false),
      ("day2", "completeness:v", 0.5, false)))
    // per-group uniqueness is within-group distinctness
    val u = Quality.checkGrouped(
        Seq(("a", 1), ("a", 1), ("b", 1)).toDF("g", "k"),
        Seq("g"), Seq(Unique(Seq("k"))))
      .collect().map(r => (r.getString(0), r.getDouble(3))).toSeq
    assert(u == Seq(("a", 0.5), ("b", 1.0)))
  }

  test("two exact Unique constraints plan ONE scan + an Expand (the documented k+1x cost)") {
    // two exact distinct-counts on different key sets make Spark expand
    // every row once per distinct set (plus once for plain metrics) —
    // single scan, ~3x shuffled rows. Pin the shape so the cost model in
    // the scaladoc stays true; approxUnique = true must avoid the Expand
    // entirely (pure map-side partials).
    val d = Seq((1, "a"), (2, "b"), (2, "b")).toDF("x", "y")
    val exact = Quality.check(d, Seq(
      Unique(Seq("x")), Unique(Seq("y")), Completeness("x")))
    val pe = exact.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val scans = pe.linesIterator.count(l =>
      l.contains("Scan") && !l.contains("Exchange"))
    assert(pe.contains("Expand"),
      s"multi-Unique no longer plans an Expand — update the Quality scaladoc cost note:\n$pe")
    assert(exact.collect().length == 3)
    val approx = Quality.check(d, Seq(
      Unique(Seq("x")), Unique(Seq("y")), Completeness("x")),
      approxUnique = true)
    val pa = approx.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(!pa.contains("Expand"),
      s"approxUnique grew an Expand — the HLL escape hatch broke:\n$pa")
  }
}
