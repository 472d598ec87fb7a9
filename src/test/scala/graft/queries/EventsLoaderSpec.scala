package graft.queries

import java.nio.file.Files
import graft.core.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The events loader is the one place the engine touches a table whose
  * physical encoding the driver owns and has already changed once
  * (round 7: INT64 nanos → timestamp[us], which broke every events query
  * at analysis). This spec pins the contract: whatever encoding `ts`
  * arrives in — INT64 epoch-nanos, timestamp, timestamp_ntz — the loader
  * yields the SAME logical shape (`ts`: UTC timestamp, `ts_ms`: long)
  * with identical values, and the as-of plan built on top keeps its
  * pinned union-window shape.
  */
class EventsLoaderSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  // the shipped table (timestamp[us] as of round 7), re-encoded two ways
  private lazy val variants: Map[String, String] = {
    val real = Catalog.loadEvents(spark, sf)
    def stage(name: String)(re: org.apache.spark.sql.DataFrame): String = {
      val dir = Files.createTempDirectory(s"events-$name").toString
      re.write.mode("overwrite").parquet(s"$dir/events.parquet")
      dir
    }
    Map(
      "int64-nanos" -> stage("nanos") {
        real.withColumn("ts", unix_micros(col("ts")) * 1000L).drop("ts_ms")
      },
      "timestamp-ltz" -> stage("ltz") {
        // spark writes TimestampType as isAdjustedToUTC=true micros
        real.drop("ts_ms")
      })
  }

  test("all ts encodings load to one logical shape with identical values") {
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val base = Catalog.loadEvents(spark, sf)
      .select("event_id", "ts_ms", "ts").orderBy("event_id").collect()
    assert(base.nonEmpty)
    for ((enc, dir) <- variants) {
      val got = Catalog.loadEvents(spark, dir)
      assert(got.schema("ts").dataType == TimestampType, s"$enc: ts type")
      assert(got.schema("ts_ms").dataType == LongType, s"$enc: ts_ms type")
      val rows = got.select("event_id", "ts_ms", "ts")
        .orderBy("event_id").collect()
      assert(rows.sameElements(base),
        s"$enc: loader values diverge from the shipped encoding")
    }
  }

  test("the as-of union-window shape survives every ts encoding") {
    for ((enc, dir) <- variants) {
      val p = Catalog.queries("q_asof_join")(spark, dir)
        .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
      assert(p.contains("Window") && !p.contains("Join"),
        s"$enc: asof plan lost the union-window form:\n$p")
    }
  }

  test("an unsupported ts encoding fails loudly at load, not at analysis") {
    val dir = Files.createTempDirectory("events-bad").toString
    Catalog.loadEvents(spark, sf).withColumn("ts", col("ts").cast("string"))
      .drop("ts_ms").write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalArgumentException](Catalog.loadEvents(spark, dir))
    assert(e.getMessage.contains("events.ts"))
  }
}
