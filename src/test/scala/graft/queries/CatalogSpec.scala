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

  Catalog.defs.foreach { case (name, qd) =>
    test(s"$name executes with rows at sf0.001") {
      val df = qd.fn(TestSpark.spark, dir)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }
}
