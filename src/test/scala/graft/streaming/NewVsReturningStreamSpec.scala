package graft.streaming

import java.nio.file.Files

import graft.core.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Batch≡stream + restart gates for the new-vs-returning dual: every
  * distinct (key, bucket) emits exactly once, labeled against the
  * key's true minimum bucket, under out-of-order cross-batch delivery
  * (inside the watermark — wider than the ts spread, per the funnel
  * stream lesson: beyond it flatMapGroupsWithState silently drops).
  */
class NewVsReturningStreamSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("newVsReturningStream labels equal the batch min-bucket rule, out of order") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val period = 1000L
    val input = MemoryStream[(Long, Long)]
    val df = input.toDF().toDF("key", "ts_ms")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
    val q = EventStream.newVsReturningStream(df,
        periodMs = period, watermark = "60 seconds")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("nvr_test").start()
    // key 1: buckets 2, 3, 5 (bucket 3 delivered BEFORE bucket 2, and a
    // duplicate bucket-2 event later); key 2: single bucket 4; key 3:
    // bucket 0 then 1 (adjacent)
    val b1 = Seq((1L, 3200L), (2L, 4100L), (3L, 100L))
    val b2 = Seq((1L, 2100L), (3L, 1900L), (1L, 5500L))
    val b3 = Seq((1L, 2800L), (2L, 4900L))
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      input.addData(b3: _*); q.processAllAvailable()
      // push the watermark far past every bucket start to seal them all
      input.addData((9L, 500000L)); q.processAllAvailable()
      input.addData((9L, 600000L)); q.processAllAvailable()
      val got = spark.table("nvr_test").as[NewVsRow].collect()
        .filter(_.key != 9L).map(r => (r.key, r.bucket, r.is_new)).toSet
      // batch rule on the same rows
      val all = (b1 ++ b2 ++ b3).map { case (k, t) => (k, t / period) }.distinct
      val minB = all.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
      val expect = all.map { case (k, b) => (k, b, b == minB(k)) }.toSet
      assert(got == expect, s"stream/batch divergence:\n$got\nvs\n$expect")
      // exactly-once per (key, bucket): no duplicate emissions
      val dups = spark.table("nvr_test").as[NewVsRow].collect()
        .groupBy(r => (r.key, r.bucket)).filter(_._2.length > 1)
      assert(dups.isEmpty, s"duplicate emissions: ${dups.keys}")
    } finally q.stop()
  }

  test("newVsReturningStream survives a checkpoint restart: min bucket is recovered") {
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    val period = 1000L
    val inDir = Files.createTempDirectory("nvr-restart-in").toString
    val outDir = Files.createTempDirectory("nvr-restart-out").toString
    val ckDir = Files.createTempDirectory("nvr-restart-ck").toString
    val schema = Seq((0L, 0L)).toDF("key", "ts_ms").schema
    def push(rows: (Long, Long)*): Unit =
      rows.toSeq.toDF("key", "ts_ms").repartition(1)
        .write.mode("append").parquet(inDir)
    def start() = {
      val src = spark.readStream.schema(schema).parquet(inDir)
        .withColumn("ts", timestamp_millis(col("ts_ms")))
      EventStream.newVsReturningStream(src,
          periodMs = period, watermark = "5 seconds")
        .writeStream.outputMode(OutputMode.Append)
        .option("checkpointLocation", ckDir)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[NewVsRow], _: Long) =>
          b.write.mode("append").parquet(outDir): Unit
        }.start()
    }
    // phase 1: key 1 active in bucket 10; seal it (watermark past its
    // start), emitting (10, is_new = true); STOP
    push((1L, 10500L))
    val q1 = start(); q1.processAllAvailable()
    push((9L, 40000L)); q1.processAllAvailable()
    push((9L, 50000L)); q1.processAllAvailable()
    q1.stop()
    // phase 2: key 1 returns in bucket 60. Amnesia would call it new;
    // the recovered state knows bucket 10 came first.
    push((1L, 60800L))
    val q2 = start(); q2.processAllAvailable()
    push((9L, 900000L)); q2.processAllAvailable()
    push((9L, 950000L)); q2.processAllAvailable()
    q2.stop()
    val rows = spark.read.parquet(outDir).as[NewVsRow].collect()
      .filter(_.key == 1L).map(r => (r.bucket, r.is_new)).sortBy(_._1).toSeq
    assert(rows == Seq((10L, true), (60L, false)),
      s"restart broke the min-bucket carry: $rows")
  }
}
