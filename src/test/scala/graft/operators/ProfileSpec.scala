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
}
