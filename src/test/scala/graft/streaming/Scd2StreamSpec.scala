package graft.streaming

import java.nio.file.Files
import graft.core.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** scd2Stream — the streaming SCD Type-2 dual: sealed-order parity with
  * the oracled batch builder (closed versions only; the open version is
  * the state) and checkpoint-restart recovery of the open-version carry.
  */
class Scd2StreamSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("scd2Stream: closed versions equal the batch builder's non-current rows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Long, Long, Option[String])]
    val df = input.toDF().toDF("key", "ts_ms", "tie", "attr")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
    val q = EventStream.scd2Stream(df, watermark = "10 seconds")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("scd2_test").start()
    // out-of-order ACROSS batches; key 1 runs A,A,B,C (two closes), key 2
    // a single open run (no emission), key 3 a NULL run closed by Z (the
    // NULL==NULL no-reopen case)
    val b1 = Seq((1L, 3000L, 3L, Some("B")), (2L, 1500L, 4L, Some("X")),
      (3L, 1000L, 7L, Option.empty[String]))
    val b2 = Seq((1L, 1000L, 1L, Some("A")), (1L, 5000L, 5L, Some("C")),
      (3L, 2000L, 8L, Option.empty[String]))
    val b3 = Seq((2L, 2500L, 6L, Some("X")), (1L, 2000L, 2L, Some("A")),
      (3L, 2500L, 9L, Some("Z")))
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      input.addData(b3: _*); q.processAllAvailable()
      input.addData((9L, 100000L, 0L, Some("s"))); q.processAllAvailable()
      input.addData((9L, 200000L, 0L, Some("s"))); q.processAllAvailable()
      input.addData((9L, 300000L, 0L, Some("s"))); q.processAllAvailable()
      val streamed = spark.table("scd2_test").as[Scd2Row].collect()
        .filter(_.key != 9L)
        .map(r => (r.key, r.attr, r.version, r.valid_from, r.valid_to, r.n_events))
        .sortBy(r => (r._1, r._3)).toSeq
      assert(streamed == Seq(
        (1L, Some("A"), 1L, 1000L, 3000L, 2L),
        (1L, Some("B"), 2L, 3000L, 5000L, 1L),
        (3L, None, 1L, 1000L, 2500L, 2L)),
        s"unexpected closed versions: $streamed")
      // and value-for-value against the batch builder's closed rows
      val batch = graft.operators.Scd.scd2(
          (b1 ++ b2 ++ b3).toDF("key", "ts_ms", "tie", "attr"),
          keys = Seq("key"), tsCol = "ts_ms", tieCol = "tie",
          attrs = Seq("attr"))
        .filter(!col("is_current"))
        .select("key", "attr", "version", "valid_from", "valid_to", "n_events")
        .collect()
        .map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5)))
        .sortBy(r => (r._1, r._3)).toSeq
      assert(streamed == batch,
        s"stream/batch divergence:\nstream: $streamed\nbatch:  $batch")
    } finally q.stop()
  }

  test("scd2Stream survives a checkpoint restart: the open version is recovered") {
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    val T = 100000L
    val inDir = Files.createTempDirectory("scd2-restart-in").toString
    val outDir = Files.createTempDirectory("scd2-restart-out").toString
    val ckDir = Files.createTempDirectory("scd2-restart-ck").toString
    val schema = Seq((0L, 0L, 0L, Option.empty[String]))
      .toDF("key", "ts_ms", "tie", "attr").schema
    def push(rows: (Long, Long, Long, Option[String])*): Unit =
      rows.toSeq.toDF("key", "ts_ms", "tie", "attr").repartition(1)
        .write.mode("append").parquet(inDir)
    def start() = {
      val src = spark.readStream.schema(schema).parquet(inDir)
        .withColumn("ts", timestamp_millis(col("ts_ms")))
      EventStream.scd2Stream(src, watermark = "5 seconds")
        .writeStream.outputMode(OutputMode.Append)
        .option("checkpointLocation", ckDir)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[Scd2Row], _: Long) =>
          b.write.mode("append").parquet(outDir): Unit
        }.start()
    }
    // phase 1: two X rows fold into the OPEN version (n_events = 2),
    // nothing emits; STOP with the open version only in the checkpoint
    push((1L, T, 1L, Some("X")), (1L, T + 1000L, 2L, Some("X")))
    val q1 = start(); q1.processAllAvailable()
    push((9L, T + 6000L, 0L, Some("s"))); q1.processAllAvailable()
    push((9L, T + 6500L, 0L, Some("s"))); q1.processAllAvailable()
    q1.stop()
    // phase 2: Y closes the RECOVERED version — version 1, n_events 2,
    // valid_from T. Amnesia would emit nothing (Y would just open v1).
    push((1L, T + 2000L, 3L, Some("Y")))
    val q2 = start(); q2.processAllAvailable()
    push((9L, T + 3000000L, 0L, Some("s"))); q2.processAllAvailable()
    push((9L, T + 3100000L, 0L, Some("s"))); q2.processAllAvailable()
    q2.stop()
    val rows = spark.read.parquet(outDir).as[Scd2Row].collect()
      .filter(_.key == 1L).toSeq
    assert(rows.map(r => (r.attr, r.version, r.valid_from, r.valid_to, r.n_events))
        == Seq((Some("X"), 1L, T, T + 2000L, 2L)),
      s"restart broke the open-version carry: $rows")
  }
}
