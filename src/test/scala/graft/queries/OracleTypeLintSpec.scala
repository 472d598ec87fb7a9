package graft.queries

import java.nio.file.Files
import scala.sys.process._
import org.scalatest.funsuite.AnyFunSuite

/** Makes the oracle decimal type-lint UN-SKIPPABLE: the failure class
  * "DuckDB widens an aggregate to DECIMAL128(38,0) and the driver's
  * pandas/arrow hash path stringifies `150.0` vs Spark's BIGINT `150`"
  * shipped a red correctness row twice (r8 `q_funnel`, r11 `q_rank_sql`)
  * because `tools/oracle_check.py --lint` ran only at the builder's
  * discretion. This spec dumps the live `SparkEntry.oracleSql` map through
  * the same serializer the driver consumes (`Verify.writeOracleJson`) and
  * shells out to the lint, so `sbt test` itself goes red on any oracle
  * whose output schema contains a decimal column.
  *
  * The lint is a LIMIT-0 type probe — DuckDB plans each oracle against the
  * sf0.001 parquet views but materializes zero rows, so the whole catalog
  * lints in seconds and needs no Spark session.
  */
class OracleTypeLintSpec extends AnyFunSuite {

  // Overridable so CI hosts with fixtures elsewhere still RUN the lint —
  // but never silently skipped: if the catalog declares oracles and the
  // fixture is missing, that's a broken test environment and the spec
  // FAILS (an assume() here would quietly reintroduce the discretionary
  // lint gap this spec exists to close).
  private val sfDir = sys.env.getOrElse("SPARK_GRAFT_LINT_SF_DIR",
    sys.props.getOrElse("graft.lint.sf.dir", "/root/testdata/sf0.001"))
  private val repoRoot = new java.io.File(".").getCanonicalPath

  test("no oracle emits a decimal-typed output column (driver hash safety)") {
    val py = new java.io.File(repoRoot, "tools/oracle_check.py")
    val haveOracles = Catalog.defs.exists(_._2.oracle.isDefined)
    assert(!haveOracles || py.isFile,
      s"catalog declares oracles but the lint tool is missing at $py — " +
        "the decimal type-lint MUST run (un-skippable by design)")
    assert(!haveOracles || new java.io.File(sfDir).isDirectory,
      s"catalog declares oracles but testdata is missing at $sfDir — " +
        "set SPARK_GRAFT_LINT_SF_DIR (or -Dgraft.lint.sf.dir) to a " +
        "directory with the parquet fixture tables")

    val tmp = Files.createTempDirectory("oracle-lint-").toFile
    graft.Verify.writeOracleJson(tmp.getAbsolutePath)

    // schema parity: the driver hashes columns SORTED BY NAME, so any
    // column-set difference between a query and its oracle is a
    // guaranteed red row (the r7 events-schema incident class). Emit
    // every oracled query's Spark column list (analysis only — no jobs
    // beyond what plan construction itself runs) for the lint to
    // compare against each oracle's LIMIT-0 schema.
    val spark = graft.core.TestSpark.spark
    val colsJson = Catalog.defs.toSeq.collect {
      case (name, qd) if qd.oracle.isDefined =>
        val cols = qd.fn(spark, sfDir).columns
        s""""$name": [${cols.map(c => s""""$c"""").mkString(",")}]"""
    }.mkString("{", ",", "}")
    Files.writeString(
      tmp.toPath.resolve("spark_columns.json"), colsJson)

    val out = new StringBuilder
    val rc = Process(
      Seq("python3", py.getAbsolutePath, sfDir, tmp.getAbsolutePath,
        "--lint"),
      new java.io.File(repoRoot))
      .!(ProcessLogger(l => out.append(l).append('\n'),
        l => out.append(l).append('\n')))

    val failures = out.toString.linesIterator
      .filterNot(_.endsWith("OK")).toSeq
    assert(rc == 0,
      s"oracle type lint failed (exit $rc):\n${failures.mkString("\n")}")
  }
}
