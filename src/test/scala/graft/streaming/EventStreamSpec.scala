package graft.streaming

import java.nio.file.Files
import graft.core.{GraftDB, GraftOptions, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming surface driven for real: file-source micro-batches through
  * the shared windowed-agg plan and through GraftDB ingestion (foreachBatch
  * = the reference's group-commit pipeline, `kv/db.go:224-285`).
  */
class EventStreamSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  private def eventsBatch() = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  test("streaming windowed agg equals the batch plan over the same data") {
    val batch = eventsBatch()
    // stage the batch as parquet with micro-ts so readStream sees a plain schema
    val dir = Files.createTempDirectory("stream-in").toString
    batch.write.mode("overwrite").parquet(dir)
    val stream = EventStream.readEventsStream(spark, dir, batch.schema)
    val q = EventStream.runToMemory(stream, "win_agg_test")
    try {
      val streamed = spark.table("win_agg_test")
        .orderBy("window_start", "event_type").collect()
      val expected = EventStream.windowedAgg(batch)
        .orderBy("window_start", "event_type").collect()
      assert(streamed.length == expected.length && streamed.sameElements(expected))
    } finally q.stop()
  }

  test("streaming ingestion into GraftDB: each micro-batch is a generation") {
    val batch = eventsBatch()
    val inDir = Files.createTempDirectory("stream-kv-in").toString
    // two files -> with maxFilesPerTrigger=1, two micro-batches
    batch.filter(col("event_id") % 2 === 0)
      .select(encode(col("event_id").cast("string"), "UTF-8").as("key"),
        encode(col("event_type"), "UTF-8").as("value"))
      .coalesce(1).write.mode("overwrite").parquet(s"$inDir/b0")
    batch.filter(col("event_id") % 2 === 1)
      .select(encode(col("event_id").cast("string"), "UTF-8").as("key"),
        encode(col("event_type"), "UTF-8").as("value"))
      .coalesce(1).write.mode("append").parquet(s"$inDir/b0")
    val db = new GraftDB(spark, Files.createTempDirectory("stream-kv-db").toString,
      GraftOptions(compactTriggerFiles = 1000))
    val schema = spark.read.parquet(s"$inDir/b0").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$inDir/b0")
    val q = EventStream.ingestToDb(stream, db,
      Files.createTempDirectory("stream-ckpt").toString)
    try { q.processAllAvailable() } finally q.stop()
    assert(db.view().count() === batch.count())
    assert(db.stats()("dataSegments") >= 2) // one generation per micro-batch
  }
}
