package graft.streaming

import java.nio.file.Files
import graft.core.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** attributionStream — the streaming multi-touch attribution dual:
  * sealed-conversion credits roll up to the oracled batch operator's
  * (model, channel) cells, boundary semantics match the batch
  * `[cts-L, cts)` window exactly, and the in-window touch buffer
  * survives a checkpoint restart.
  */
class AttributionStreamSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def toStreamRows(rows: Seq[(Long, Long, Long, String, Double)]) =
    rows.map { case (k, ts, tie, tpe, v) =>
      (k, ts, tie, tpe == "p", tpe, v)
    }

  test("attributionStream: per-conversion credits at the batch window boundaries") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Long, Long, Boolean, String, Double)]
    val df = input.toDF().toDF("key", "ts_ms", "tie", "is_conv", "channel", "value")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
    val q = EventStream.attributionStream(df, lookbackMs = 10000L,
        watermark = "60 seconds")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("attr_test").start()
    val T = 100000L
    // the AnalyticsSpec hand case, scaled to ms: window [T+5000, T+15000)
    // holds c@start (inclusive), v, c; c AT the conversion instant is out
    val rows = toStreamRows(Seq(
      (1L, T + 5000L, 1L, "c", 0.0),   // at window start: in
      (1L, T + 6000L, 2L, "v", 0.0),
      (1L, T + 10000L, 3L, "c", 0.0),
      (1L, T + 15000L, 4L, "c", 0.0),  // at the instant: out
      (1L, T + 15000L, 5L, "p", 100.0),
      (2L, T + 40000L, 6L, "p", 50.0))) // no touches: nothing emits
    try {
      // deliver out of order across batches, then push the watermark far past
      input.addData(rows(3), rows(5)); q.processAllAvailable()
      input.addData(rows(0), rows(4), rows(2)); q.processAllAvailable()
      input.addData(rows(1)); q.processAllAvailable()
      input.addData((9L, T + 900000L, 0L, false, "c", 0.0)); q.processAllAvailable()
      input.addData((9L, T + 950000L, 0L, false, "c", 0.0)); q.processAllAvailable()
      val got = spark.table("attr_test").as[AttrCredit].collect()
        .filter(_.key == 1L)
        .map(c => (c.model, c.channel, math.rint(c.credit * 1e6) / 1e6, c.n_touches))
        .sortBy(c => (c._1, c._2)).toSeq
      assert(got == Seq(
        ("first_touch", "c", 100.0, 3L),
        ("last_touch", "c", 100.0, 3L),
        ("linear", "c", math.rint(200.0 / 3 * 1e6) / 1e6, 3L),
        ("linear", "v", math.rint(100.0 / 3 * 1e6) / 1e6, 3L)),
        s"unexpected credits: $got")
    } finally q.stop()
  }

  test("attributionStream cells equal the batch operator on a random stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val rnd = new scala.util.Random(91L)
    val T = 1000000L
    val rows = (0 until 400).map { i =>
      val tpe = rnd.nextInt(5) match {
        case 0 => "p"; case 1 | 2 => "c"; case _ => "v"
      }
      (rnd.nextInt(10).toLong, T + rnd.nextInt(60000).toLong, i.toLong, tpe,
        math.rint(rnd.nextDouble() * 10000) / 100)
    }
    val look = 15000L
    val input = MemoryStream[(Long, Long, Long, Boolean, String, Double)]
    val df = input.toDF().toDF("key", "ts_ms", "tie", "is_conv", "channel", "value")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
    val q = EventStream.attributionStream(df, lookbackMs = look,
        watermark = "120 seconds")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("attr_fuzz").start()
    try {
      // shuffled delivery across three batches + watermark push past all
      val shuffled = rnd.shuffle(toStreamRows(rows))
      val (b1, rest) = shuffled.splitAt(130)
      val (b2, b3) = rest.splitAt(130)
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      input.addData(b3: _*); q.processAllAvailable()
      input.addData((99L, T + 9000000L, 0L, false, "c", 0.0)); q.processAllAvailable()
      input.addData((99L, T + 9500000L, 0L, false, "c", 0.0)); q.processAllAvailable()
      val streamCells = spark.table("attr_fuzz").as[AttrCredit].collect()
        .filter(_.key != 99L)
        .groupBy(c => (c.model, c.channel))
        .map { case (k, cs) => k -> ((cs.length.toLong, cs.map(_.credit).sum)) }
      val batchCells = graft.operators.Analytics.attribution(
          rows.toDF("user_id", "ts_ms", "event_id", "event_type", "value"),
          convType = "p", touchTypes = Seq("c", "v"), lookbackMs = look,
          binSizeMs = look)
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
        .toMap
      assert(streamCells.keySet == batchCells.keySet,
        s"cell sets differ: ${streamCells.keySet} vs ${batchCells.keySet}")
      for ((k, (n, credit)) <- streamCells) {
        assert(n == batchCells(k)._1, s"$k n_conv: $n vs ${batchCells(k)._1}")
        assert(math.abs(credit - batchCells(k)._2) < 1e-6,
          s"$k credit: $credit vs ${batchCells(k)._2}")
      }
    } finally q.stop()
  }

  test("attributionStream survives a restart: the touch buffer is recovered") {
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    val T = 100000L
    val inDir = Files.createTempDirectory("attr-restart-in").toString
    val outDir = Files.createTempDirectory("attr-restart-out").toString
    val ckDir = Files.createTempDirectory("attr-restart-ck").toString
    val schema = Seq((0L, 0L, 0L, false, "", 0.0))
      .toDF("key", "ts_ms", "tie", "is_conv", "channel", "value").schema
    def push(rows: (Long, Long, Long, Boolean, String, Double)*): Unit =
      rows.toSeq.toDF("key", "ts_ms", "tie", "is_conv", "channel", "value")
        .repartition(1).write.mode("append").parquet(inDir)
    def start() = {
      val src = spark.readStream.schema(schema).parquet(inDir)
        .withColumn("ts", timestamp_millis(col("ts_ms")))
      EventStream.attributionStream(src, lookbackMs = 60000L,
          watermark = "5 seconds")
        .writeStream.outputMode(OutputMode.Append)
        .option("checkpointLocation", ckDir)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[AttrCredit], _: Long) =>
          b.write.mode("append").parquet(outDir): Unit
        }.start()
    }
    // phase 1: two sealed touches enter the buffer, nothing emits; STOP
    push((1L, T, 1L, false, "c", 0.0), (1L, T + 1000L, 2L, false, "v", 0.0))
    val q1 = start(); q1.processAllAvailable()
    push((9L, T + 6000L, 0L, false, "c", 0.0)); q1.processAllAvailable()
    push((9L, T + 6500L, 0L, false, "c", 0.0)); q1.processAllAvailable()
    q1.stop()
    // phase 2: a conversion after restart credits the RECOVERED touches.
    // Amnesia would emit nothing (empty window -> unattributable).
    push((1L, T + 2000L, 3L, true, "", 60.0))
    val q2 = start(); q2.processAllAvailable()
    push((9L, T + 3000000L, 0L, false, "c", 0.0)); q2.processAllAvailable()
    push((9L, T + 3100000L, 0L, false, "c", 0.0)); q2.processAllAvailable()
    q2.stop()
    val got = spark.read.parquet(outDir).as[AttrCredit].collect()
      .filter(_.key == 1L)
      .map(c => (c.model, c.channel, c.credit, c.n_touches))
      .sortBy(c => (c._1, c._2)).toSeq
    assert(got == Seq(
      ("first_touch", "c", 60.0, 2L),
      ("last_touch", "v", 60.0, 2L),
      ("linear", "c", 30.0, 2L),
      ("linear", "v", 30.0, 2L)),
      s"restart broke the touch-buffer carry: $got")
  }
}
