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
  private val spark = TestSpark.spark

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

  test("watermark drops data later than the bound in append mode") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "event_type", "value")
    val agg = EventStream.windowedAgg(df, windowDur = "1 hour", watermark = "1 hour")
    val q = agg.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("late_test").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    try {
      // batch 1: events up to 06:30 -> watermark advances to 05:30
      input.addData((t("2024-01-01 04:10:00"), "click", 1.0),
        (t("2024-01-01 06:30:00"), "click", 1.0))
      q.processAllAvailable()
      // batch 2: both 03:00 and 04:20 are below the 05:30 watermark — the
      // 04:00 window was already finalized and emitted, so BOTH are dropped
      input.addData((t("2024-01-01 03:00:00"), "click", 100.0),
        (t("2024-01-01 04:20:00"), "click", 1.0),
        (t("2024-01-01 09:00:00"), "click", 1.0)) // pushes watermark to 08:00
      q.processAllAvailable()
      input.addData((t("2024-01-01 12:00:00"), "click", 1.0)) // finalize all
      q.processAllAvailable()
      val out = spark.table("late_test")
        .select(unix_millis(col("window_start")).as("w"), col("n_events"), col("sum_value"))
        .collect()
        .map(r => (java.time.Instant.ofEpochMilli(r.getLong(0)).toString,
          (r.getLong(1), r.getDouble(2)))).toMap
      // 04:00 window finalized with only the on-time 04:10 event; the late
      // 03:00 and 04:20 arrivals never surface
      assert(out("2024-01-01T04:00:00Z") == (1L, 1.0))
      assert(!out.contains("2024-01-01T03:00:00Z"), "late event leaked past the watermark")
      assert(out("2024-01-01T06:00:00Z") == (1L, 1.0))
      assert(out("2024-01-01T09:00:00Z") == (1L, 1.0))
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
