package graft.queries

import graft.core.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Smoke over the whole driver-facing catalog at sf0.001: every query must
  * execute and return rows (the DuckDB hash-parity itself is the driver's
  * correctness gate; this keeps `sbt test` honest about executability).
  */
class CatalogSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"

  test("oracles exist only for declared queries") {
    val qs = Catalog.queries.keySet
    assert(Catalog.oracles.keySet.subsetOf(qs))
    assert(Catalog.headlines.toSet.subsetOf(qs))
  }

  test("README's query/oracle counts match the code (no stale prose)") {
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), "UTF-8")
    val qn = Catalog.queries.size
    val on = Catalog.oracles.size
    assert(readme.contains(s"$qn named queries"),
      s"README no longer states the query count $qn — recount and update")
    assert(readme.contains(s"DuckDB SQL for $on of them"),
      s"README no longer states the oracle count $on — recount and update")
    assert(readme.contains(s"the $qn-query driver surface"),
      s"README module map no longer states the query count $qn")
  }

  Catalog.defs.foreach { case (name, qd) =>
    test(s"$name executes with rows at sf0.001") {
      val df = qd.fn(TestSpark.spark, dir)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }
}
