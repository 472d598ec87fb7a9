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

  private def eventsBatch() =
    graft.queries.Catalog.loadEvents(spark, "/root/testdata/sf0.001")
      .drop("ts_ms")

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

  test("flatMapGroupsWithState sessionization: gap splits, cross-batch state, timeout flush") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Long)] // (user_id, ts_ms)
    val df = input.toDF().toDF("user_id", "ts_ms")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
    val q = EventStream.sessionizeStream(df, gapMs = 1000L, watermark = "0 seconds")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sess_test").start()
    try {
      // user 1: two events 500ms apart (one session), then a 4s gap
      input.addData((1L, 1000L), (1L, 1500L))
      q.processAllAvailable()
      // same user after the gap: closes session (1000..1500, n=2) immediately;
      // user 2 opens a session in the same batch
      input.addData((1L, 6000L), (2L, 6100L))
      q.processAllAvailable()
      // advance the watermark far past everything: timeouts flush the
      // remaining open sessions (watermark lags one batch -> two pushes)
      input.addData((9L, 100000L)); q.processAllAvailable()
      input.addData((9L, 200000L)); q.processAllAvailable()
      val out = spark.table("sess_test").as[Session].collect()
        .map(s => (s.user_id, s.start_ms, s.end_ms, s.n_events)).toSet
      assert(out.contains((1L, 1000L, 1500L, 2L)), s"gap-closed session missing: $out")
      assert(out.contains((1L, 6000L, 6000L, 1L)), s"timeout-flushed session missing: $out")
      assert(out.contains((2L, 6100L, 6100L, 1L)), s"user-2 session missing: $out")
    } finally q.stop()
  }

  test("resampleStream: closed buckets + gap-fill equal the batch resample") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Long, Long, Double)] // key, ts_ms, tie, value
    val df = input.toDF().toDF("key", "ts_ms", "tie", "value")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
    val q = EventStream.resampleStream(df, stepMs = 1000L, watermark = "0 seconds")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("resample_test").start()
    // key 1: buckets 0 (two rows, in-bucket tie on ts), 1, then a 2-bucket
    // gap, then bucket 4; key 2: a single bucket
    val events = Seq(
      (1L, 100L, 1L, 1.0), (1L, 700L, 2L, 2.0), (1L, 700L, 1L, 7.0),
      (1L, 1500L, 3L, 5.0), (2L, 300L, 4L, 42.0))
    val lateEvents = Seq((1L, 4200L, 5L, 9.0))
    try {
      input.addData(events: _*)
      q.processAllAvailable()
      input.addData(lateEvents: _*)
      q.processAllAvailable()
      // sentinel pushes advance the global watermark past bucket 4's end
      // so the event-time timeout flushes the trailing buckets
      input.addData((9L, 100000L, 0L, 0.0)); q.processAllAvailable()
      input.addData((9L, 200000L, 0L, 0.0)); q.processAllAvailable()
      val streamed = spark.table("resample_test").as[ResampleRow].collect()
        .filter(_.key != 9L)
        .map(r => (r.key, r.bucket_ms, r.n_events, r.sum_value, r.last_value))
        .sortBy(r => (r._1, r._2)).toSeq
      val batch = graft.operators.Resample.resampleForwardFill(
          (events ++ lateEvents).toDF("key", "ts_ms", "tie", "value"),
          keys = Seq("key"), tsMsCol = "ts_ms", valueCol = "value",
          tieCol = "tie", stepMs = 1000L)
        .orderBy("key", "bucket_ms")
        .as[(Long, Long, Long, Double, Double)].collect().toSeq
      assert(streamed == batch,
        s"stream/batch divergence:\nstream: $streamed\nbatch:  $batch")
      // the in-bucket tie at ts=700 must resolve by the tie column (2.0)
      assert(streamed.head == (1L, 0L, 3L, 10.0, 2.0), s"got ${streamed.head}")
    } finally q.stop()
  }

  test("interpolateStream: sealed anchors + linear gap blends equal the batch interpolation") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Long, Long, Double)] // key, ts_ms, tie, value
    val df = input.toDF().toDF("key", "ts_ms", "tie", "value")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
    val q = EventStream.interpolateStream(df, stepMs = 1000L, watermark = "0 seconds")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("interp_test").start()
    // key 1: anchors at buckets 0 (in-bucket tie), 1, then a 2-bucket gap
    // whose rows must blend 5.0 -> 9.0, then bucket 4 — delivered across
    // batches and out of order; key 2: a single anchor (no gaps, no tail)
    val b1 = Seq(
      (1L, 100L, 1L, 1.0), (1L, 700L, 2L, 2.0), (1L, 700L, 1L, 7.0),
      (2L, 300L, 4L, 42.0))
    val b2 = Seq((1L, 4200L, 5L, 9.0), (1L, 1500L, 3L, 5.0))
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      // sentinels advance the watermark so the trailing anchors seal
      input.addData((9L, 100000L, 0L, 0.0)); q.processAllAvailable()
      input.addData((9L, 200000L, 0L, 0.0)); q.processAllAvailable()
      val streamed = spark.table("interp_test").as[InterpRow].collect()
        .filter(_.key != 9L)
        .map(r => (r.key, r.bucket_ms, r.n_events, r.interp_value))
        .sortBy(r => (r._1, r._2)).toSeq
      val batch = graft.operators.Resample.resampleInterpolate(
          (b1 ++ b2).toDF("key", "ts_ms", "tie", "value"),
          keys = Seq("key"), tsMsCol = "ts_ms", valueCol = "value",
          tieCol = "tie", stepMs = 1000L)
        .orderBy("key", "bucket_ms")
        .as[(Long, Long, Long, Double)].collect().toSeq
      assert(streamed == batch,
        s"stream/batch divergence:\nstream: $streamed\nbatch:  $batch")
      // the blended gap: 5.0 -> 9.0 over buckets 2 and 3
      assert(streamed.filter(r => r._1 == 1L && r._2 == 2000L).head._4 == 5.0 + (9.0 - 5.0) * (1.0 / 3.0))
      assert(streamed.filter(r => r._1 == 1L && r._2 == 3000L).head._4 == 5.0 + (9.0 - 5.0) * (2.0 / 3.0))
    } finally q.stop()
  }

  test("resampleStream/interpolateStream: a gap past maxBuckets raises loudly instead of materializing the run") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    // one key dark for 20 buckets; guard at 10 — the batch twin's gap
    // guard, applied where the stream's memory actually lives (the gap
    // run is built inside ONE group invocation once the next anchor
    // seals in a single watermark jump)
    val events = Seq((1L, 500L, 1L, 1.0), (1L, 20500L, 2L, 5.0))
    def drive(start: MemoryStream[(Long, Long, Long, Double)] =>
        org.apache.spark.sql.streaming.StreamingQuery): Throwable = {
      val input = MemoryStream[(Long, Long, Long, Double)]
      val q = start(input)
      try {
        input.addData(events: _*)
        intercept[Exception] {
          q.processAllAvailable()
          // sentinels seal the trailing bucket/anchor -> the gap run flushes
          input.addData((9L, 100000L, 0L, 0.0)); q.processAllAvailable()
          input.addData((9L, 200000L, 0L, 0.0)); q.processAllAvailable()
        }
      } finally q.stop()
    }
    val eR = drive { input =>
      EventStream.resampleStream(
          input.toDF().toDF("key", "ts_ms", "tie", "value")
            .withColumn("ts", timestamp_millis(col("ts_ms"))),
          stepMs = 1000L, watermark = "0 seconds", maxBuckets = 10L)
        .writeStream.outputMode(OutputMode.Append)
        .format("memory").queryName("resample_gap_guard").start()
    }
    assert(msgs(eR).exists(m => m != null && m.contains("resampleStream") &&
        m.contains("gap spans")), s"expected the gap guard, got $eR")
    val eI = drive { input =>
      EventStream.interpolateStream(
          input.toDF().toDF("key", "ts_ms", "tie", "value")
            .withColumn("ts", timestamp_millis(col("ts_ms"))),
          stepMs = 1000L, watermark = "0 seconds", maxBuckets = 10L)
        .writeStream.outputMode(OutputMode.Append)
        .format("memory").queryName("interp_gap_guard").start()
    }
    assert(msgs(eI).exists(m => m != null && m.contains("interpolateStream") &&
        m.contains("gap spans")), s"expected the gap guard, got $eI")
  }

  test("interpolateStream: the gap cap boundary matches the batch twin (maxBuckets-1 fill rows pass, maxBuckets raise)") {
    // stream/batch parity AT the cap: resampleInterpolate allows a gap of
    // exactly maxBuckets - 1 fill rows and raises at maxBuckets — the
    // stream twin must draw the line at the same gap, not one bucket
    // earlier (the r14 guard raised where the batch twin succeeded)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    val cap = 10L
    def driveStream(events: Seq[(Long, Long, Long, Double)],
        name: String): Seq[(Long, Long, Long, Double)] = {
      val input = MemoryStream[(Long, Long, Long, Double)]
      val q = EventStream.interpolateStream(
          input.toDF().toDF("key", "ts_ms", "tie", "value")
            .withColumn("ts", timestamp_millis(col("ts_ms"))),
          stepMs = 1000L, watermark = "0 seconds", maxBuckets = cap)
        .writeStream.outputMode(OutputMode.Append)
        .format("memory").queryName(name).start()
      try {
        input.addData(events: _*); q.processAllAvailable()
        input.addData((9L, 500000L, 0L, 0.0)); q.processAllAvailable()
        input.addData((9L, 900000L, 0L, 0.0)); q.processAllAvailable()
        spark.table(name).as[InterpRow].collect()
          .filter(_.key != 9L)
          .map(r => (r.key, r.bucket_ms, r.n_events, r.interp_value))
          .sortBy(r => (r._1, r._2)).toSeq
      } finally q.stop()
    }
    // anchors at buckets 0 and 10: 9 fill rows == cap - 1 -> both succeed,
    // and the sealed grid is bit-equal to the batch twin's
    val atCap = Seq((1L, 500L, 1L, 1.0), (1L, 10500L, 2L, 5.0))
    val streamed = driveStream(atCap, "interp_cap_ok")
    val batch = graft.operators.Resample.resampleInterpolate(
        atCap.toDF("key", "ts_ms", "tie", "value"),
        keys = Seq("key"), tsMsCol = "ts_ms", valueCol = "value",
        tieCol = "tie", stepMs = 1000L, maxBuckets = cap)
      .orderBy("key", "bucket_ms")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(streamed.size == 11 && streamed == batch,
      s"boundary divergence:\nstream: $streamed\nbatch:  $batch")
    // anchors at buckets 0 and 11: 10 fill rows == cap -> BOTH raise
    val pastCap = Seq((1L, 500L, 1L, 1.0), (1L, 11500L, 2L, 5.0))
    val eS = intercept[Exception](driveStream(pastCap, "interp_cap_bad"))
    assert(msgs(eS).exists(m => m != null && m.contains("interpolateStream") &&
        m.contains("gap spans")), s"expected the stream guard, got $eS")
    val eB = intercept[Exception] {
      graft.operators.Resample.resampleInterpolate(
          pastCap.toDF("key", "ts_ms", "tie", "value"),
          keys = Seq("key"), tsMsCol = "ts_ms", valueCol = "value",
          tieCol = "tie", stepMs = 1000L, maxBuckets = cap)
        .collect()
    }
    assert(msgs(eB).exists(m => m != null &&
        m.contains("resampleInterpolate") && m.contains("gap spans")),
      s"expected the batch guard, got $eB")
  }

  test("ewmaStream: sealed smoothed values equal the batch segmented scan") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Long, Long, Double)] // key, ts_ms, tie, value
    val df = input.toDF().toDF("key", "ts_ms", "tie", "value")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
    val q = EventStream.ewmaStream(df, alpha = 0.3, watermark = "10 seconds")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("ewma_test").start()
    // out-of-order ACROSS batches (all inside the watermark bound), plus
    // a mid-stream sentinel so part of each key folds early and the
    // carry must survive into the later seal
    val b1 = Seq((1L, 3000L, 3L, 30.0), (2L, 1500L, 4L, 5.0))
    val b2 = Seq((1L, 1000L, 1L, 10.0), (1L, 5000L, 5L, 50.0))
    val b3 = Seq((2L, 2500L, 6L, 15.0), (1L, 2000L, 2L, 20.0))
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      input.addData(b3: _*); q.processAllAvailable()
      // partial seal at wm=3500: ts<=3500 folds now, the rest later
      input.addData((9L, 13500L, 0L, 0.0)); q.processAllAvailable()
      input.addData((9L, 100000L, 0L, 0.0)); q.processAllAvailable()
      input.addData((9L, 200000L, 0L, 0.0)); q.processAllAvailable()
      val streamed = spark.table("ewma_test").as[EwmaRow].collect()
        .filter(_.key != 9L)
        .map(r => (r.key, r.ts_ms, r.tie, r.value, r.ewma))
        .sortBy(r => (r._1, r._2, r._3)).toSeq
      val batch = graft.operators.Resample.ewma(
          (b1 ++ b2 ++ b3).toDF("key", "ts_ms", "tie", "value"),
          keys = Seq("key"), alpha = 0.3, tsMsCol = "ts_ms",
          valueCol = "value", tieCol = "tie", blockSize = 2)
        .orderBy("key", "ts_ms", "tie")
        .as[(Long, Long, Long, Double, Double)].collect().toSeq
      // tolerance, not bit-identity: the batch scan evaluates Q + P*s_in,
      // which regroups the FP ops vs the stream's sequential fold — a
      // value landing on a 6dp rounding boundary can differ one ulp
      assert(streamed.size == batch.size && streamed.nonEmpty)
      streamed.zip(batch).foreach { case (g, w) =>
        assert((g._1, g._2, g._3, g._4) == (w._1, w._2, w._3, w._4))
        assert(math.abs(g._5 - w._5) < 1e-5,
          s"stream/batch ewma divergence at $g vs $w")
      }
      assert(streamed.size == 6)
    } finally q.stop()
  }

  test("decayStream: sealed scores equal the batch decayedSum") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Long, Long, Double)]
    val df = input.toDF().toDF("key", "ts_ms", "tie", "value")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
    val q = EventStream.decayStream(df, halfLifeMs = 1000L, watermark = "10 seconds")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("decay_test").start()
    val b1 = Seq((1L, 3000L, 3L, 8.0), (2L, 1500L, 4L, 5.0))
    val b2 = Seq((1L, 1000L, 1L, 10.0), (1L, 5000L, 5L, 2.0))
    val b3 = Seq((2L, 2500L, 6L, 15.0), (1L, 2000L, 2L, 4.0))
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      input.addData(b3: _*); q.processAllAvailable()
      input.addData((9L, 13500L, 0L, 0.0)); q.processAllAvailable() // partial seal
      input.addData((9L, 100000L, 0L, 0.0)); q.processAllAvailable()
      input.addData((9L, 200000L, 0L, 0.0)); q.processAllAvailable()
      val streamed = spark.table("decay_test").as[DecayRow].collect()
        .filter(_.key != 9L)
        .map(r => (r.key, r.ts_ms, r.tie, r.value, r.decayed))
        .sortBy(r => (r._1, r._2, r._3)).toSeq
      val batch = graft.operators.Resample.decayedSum(
          (b1 ++ b2 ++ b3).toDF("key", "ts_ms", "tie", "value"),
          keys = Seq("key"), halfLifeMs = 1000L, tsMsCol = "ts_ms",
          valueCol = "value", tieCol = "tie", blockSize = 2)
        .orderBy("key", "ts_ms", "tie")
        .as[(Long, Long, Long, Double, Double)].collect().toSeq
      assert(streamed.size == batch.size)
      streamed.zip(batch).foreach { case (g, w) =>
        assert((g._1, g._2, g._3, g._4) == (w._1, w._2, w._3, w._4))
        assert(math.abs(g._5 - w._5) < 1e-5,
          s"stream/batch decayed divergence at $g vs $w")
      }
    } finally q.stop()
  }

  test("enrichJoin stream-stream: out-of-order cross-batch arrivals still pair") {
    // the existing enrichJoin coverage stages files; this drives BOTH
    // sides as MemoryStreams with the matching click arriving a batch
    // AFTER its purchase — the state-buffering path file replay can't hit
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    def mk() = MemoryStream[(Long, Long, Long)]
    val (clicks, purchases) = (mk(), mk())
    def df(m: MemoryStream[(Long, Long, Long)]) =
      m.toDF().toDF("event_id", "user_id", "ts_ms")
        .withColumn("ts", timestamp_millis(col("ts_ms")))
    val q = EventStream.enrichJoin(df(clicks), df(purchases),
        windowMs = 2000L, watermark = "10 seconds")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("ssj_mem_test").start()
    try {
      // purchase arrives FIRST; its click comes in the next micro-batch
      purchases.addData((100L, 1L, 3000L)); q.processAllAvailable()
      assert(spark.table("ssj_mem_test").count() == 0)
      clicks.addData((7L, 1L, 2000L), (8L, 1L, 500L), (9L, 2L, 2500L))
      q.processAllAvailable()
      // second purchase pairs with the already-buffered click 9
      purchases.addData((200L, 2L, 4000L)); q.processAllAvailable()
      val got = spark.table("ssj_mem_test")
        .select("purchase_id", "user_id", "click_id")
        .as[(Long, Long, Long)].collect().sorted.toSeq
      // click 8 (2500ms before) is outside the 2s window; click 7 pairs
      assert(got == Seq((100L, 1L, 7L), (200L, 2L, 9L)), s"got $got")
    } finally q.stop()
  }

  test("dedupFirstStream: emits the event-order first row once, suppresses the rest") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Long, Long, Double)]
    val df = input.toDF().toDF("key", "ts_ms", "tie", "value")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
    val q = EventStream.dedupFirstStream(df, watermark = "5 seconds")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("dedup_test").start()
    try {
      // key 1: a LATER row arrives first; the true (ts,tie)-first comes
      // in batch 2 and must be the one emitted. key 2: tie-break on ts.
      input.addData((1L, 3000L, 3L, 30.0), (2L, 1000L, 7L, 7.0))
      q.processAllAvailable()
      input.addData((1L, 1000L, 1L, 10.0), (2L, 1000L, 4L, 4.0))
      q.processAllAvailable()
      // watermark driver: push wm past 3000 (wm = max_ts - 5s)
      input.addData((9L, 20000L, 0L, 0.0)); q.processAllAvailable()
      input.addData((9L, 40000L, 0L, 0.0)); q.processAllAvailable()
      // post-seal duplicates of key 1 must be suppressed
      input.addData((1L, 39000L, 9L, 99.0)); q.processAllAvailable()
      input.addData((9L, 80000L, 0L, 0.0)); q.processAllAvailable()
      val got = spark.table("dedup_test").as[DedupRow].collect()
        .filter(_.key != 9L).sortBy(_.key).toSeq
      assert(got == Seq(DedupRow(1L, 1000L, 1L, 10.0),
        DedupRow(2L, 1000L, 4L, 4.0)))
      // exactly the batch keep-first verdict over the same rows
      val batch = Seq((1L, 3000L, 3L, 30.0), (2L, 1000L, 7L, 7.0),
          (1L, 1000L, 1L, 10.0), (2L, 1000L, 4L, 4.0), (1L, 39000L, 9L, 99.0))
        .toDF("key", "ts_ms", "tie", "value")
        .groupBy("key")
        .agg(min_by(struct(col("ts_ms"), col("tie"), col("value")),
          struct(col("ts_ms"), col("tie"))).as("f"))
        .select(col("key"), col("f.ts_ms"), col("f.tie"), col("f.value"))
        .as[DedupRow].collect().sortBy(_.key).toSeq
      assert(got == batch)
    } finally q.stop()
  }

  test("holtStream: sealed level/trend equal the batch affine scan") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Long, Long, Double)]
    val df = input.toDF().toDF("key", "ts_ms", "tie", "value")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
    val q = EventStream.holtStream(df, alpha = 0.4, beta = 0.3,
        watermark = "10 seconds")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("holt_test").start()
    val b1 = Seq((1L, 3000L, 3L, 8.0), (2L, 1500L, 4L, 5.0))
    val b2 = Seq((1L, 1000L, 1L, 10.0), (1L, 5000L, 5L, 2.0))
    val b3 = Seq((2L, 2500L, 6L, 15.0), (1L, 2000L, 2L, 4.0))
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      input.addData(b3: _*); q.processAllAvailable()
      input.addData((9L, 30000L, 0L, 0.0)); q.processAllAvailable()
      input.addData((9L, 100000L, 0L, 0.0)); q.processAllAvailable()
      input.addData((9L, 200000L, 0L, 0.0)); q.processAllAvailable()
      val streamed = spark.table("holt_test").as[HoltRow].collect()
        .filter(_.key != 9L)
        .map(r => (r.key, r.ts_ms, r.tie, r.value, r.level, r.trend))
        .sortBy(r => (r._1, r._2, r._3)).toSeq
      val batch = graft.operators.Resample.holt(
          (b1 ++ b2 ++ b3).toDF("key", "ts_ms", "tie", "value"),
          keys = Seq("key"), alpha = 0.4, beta = 0.3, tsMsCol = "ts_ms",
          valueCol = "value", tieCol = "tie", blockSize = 2)
        .orderBy("key", "ts_ms", "tie")
        .as[(Long, Long, Long, Double, Double, Double)].collect().toSeq
      assert(streamed.size == batch.size && streamed.nonEmpty)
      streamed.zip(batch).foreach { case (g, w) =>
        assert((g._1, g._2, g._3, g._4) == (w._1, w._2, w._3, w._4))
        assert(math.abs(g._5 - w._5) < 1e-5, s"level diverged at $g vs $w")
        assert(math.abs(g._6 - w._6) < 1e-5, s"trend diverged at $g vs $w")
      }
    } finally q.stop()
  }

  test("cusumStream: sealed chart values equal the batch reflection form") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Long, Long, Double)]
    val df = input.toDF().toDF("key", "ts_ms", "tie", "value")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
    val q = EventStream.cusumStream(df, target = 50.0, slack = 5.0,
        threshold = 30.0, watermark = "10 seconds")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("cusum_test").start()
    // key 1 drifts high (70s) out of order; key 2 stays on target
    val b1 = Seq((1L, 2000L, 2L, 70.0), (2L, 1000L, 9L, 50.0))
    val b2 = Seq((1L, 1000L, 1L, 70.0), (1L, 3000L, 3L, 70.0))
    val b3 = Seq((2L, 2000L, 8L, 51.0), (1L, 4000L, 4L, 70.0))
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      input.addData(b3: _*); q.processAllAvailable()
      input.addData((9L, 30000L, 0L, 50.0)); q.processAllAvailable()
      input.addData((9L, 100000L, 0L, 50.0)); q.processAllAvailable()
      input.addData((9L, 200000L, 0L, 50.0)); q.processAllAvailable()
      val streamed = spark.table("cusum_test").as[CusumRow].collect()
        .filter(_.key != 9L)
        .map(r => (r.key, r.ts_ms, r.tie, r.cusum_high, r.cusum_low, r.breach))
        .sortBy(r => (r._1, r._2, r._3)).toSeq
      val batch = graft.operators.Resample.cusum(
          (b1 ++ b2 ++ b3).toDF("key", "ts_ms", "tie", "value"),
          keys = Seq("key"), target = 50.0, slack = 5.0, threshold = 30.0,
          tsMsCol = "ts_ms", valueCol = "value", tieCol = "tie")
        .orderBy("key", "ts_ms", "tie")
        .select("key", "ts_ms", "tie", "cusum_high", "cusum_low", "breach")
        .as[(Long, Long, Long, Double, Double, Boolean)].collect().toSeq
      assert(streamed.size == batch.size && streamed.nonEmpty)
      streamed.zip(batch).foreach { case (g, w) =>
        assert((g._1, g._2, g._3, g._6) == (w._1, w._2, w._3, w._6),
          s"row/breach diverged at $g vs $w")
        assert(math.abs(g._4 - w._4) < 1e-6 && math.abs(g._5 - w._5) < 1e-6,
          s"chart diverged at $g vs $w")
      }
      // 3 steps of +15 drift breach the 30 threshold at ts=3000
      assert(streamed.filter(_._1 == 1L).map(r => (r._2, r._6)).toSeq ==
        Seq((1000L, false), (2000L, false), (3000L, true), (4000L, true)))
    } finally q.stop()
  }

  test("twaStream: the latest sealed row per key equals the batch TWA") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Long, Long, Double)] // key, ts_ms, tie, value
    val df = input.toDF().toDF("key", "ts_ms", "tie", "value")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
    val q = EventStream.twaStream(df, watermark = "10 seconds")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("twa_test").start()
    // out-of-order across batches; key 2 has an in-ts tie (hold 0 for the
    // first of the pair) and key 3 is single-sample (span 0 -> last value)
    val b1 = Seq((1L, 4000L, 3L, 30.0), (2L, 1500L, 4L, 5.0))
    val b2 = Seq((1L, 1000L, 1L, 10.0), (2L, 1500L, 5L, 7.0), (3L, 2000L, 9L, 42.0))
    val b3 = Seq((1L, 2000L, 2L, 20.0), (2L, 2500L, 6L, 15.0))
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      input.addData(b3: _*); q.processAllAvailable()
      input.addData((9L, 13000L, 0L, 0.0)); q.processAllAvailable() // partial seal
      input.addData((9L, 100000L, 0L, 0.0)); q.processAllAvailable()
      input.addData((9L, 200000L, 0L, 0.0)); q.processAllAvailable()
      val latest = spark.table("twa_test").as[TwaRow].collect()
        .filter(_.key != 9L).groupBy(_.key).map(_._2.maxBy(_.ts_ms))
        .map(r => (r.key, r.n_obs, r.span_ms, r.twa)).toSeq.sortBy(_._1)
      val batch = graft.operators.Resample.timeWeightedAvg(
          (b1 ++ b2 ++ b3).toDF("key", "ts_ms", "tie", "value"),
          keys = Seq("key"), tsMsCol = "ts_ms", valueCol = "value",
          tieCol = "tie")
        .orderBy("key")
        .as[(Long, Long, Long, Double)].collect().toSeq
      assert(latest == batch,
        s"stream/batch divergence:\nstream: $latest\nbatch:  $batch")
      // every prefix emitted: 3 + 3 + 1 rows total
      assert(spark.table("twa_test").as[TwaRow].collect()
        .count(_.key != 9L) == 7)
    } finally q.stop()
  }

  test("interpolateStream survives a checkpoint restart: the previous anchor is recovered") {
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    val inDir = Files.createTempDirectory("ip-restart-in").toString
    val outDir = Files.createTempDirectory("ip-restart-out").toString
    val ckDir = Files.createTempDirectory("ip-restart-ck").toString
    val schema = Seq((0L, 0L, 0L, 0.0)).toDF("key", "ts_ms", "tie", "value").schema
    def push(rows: (Long, Long, Long, Double)*): Unit =
      rows.toSeq.toDF("key", "ts_ms", "tie", "value").repartition(1)
        .write.mode("append").parquet(inDir)
    def start() = {
      val src = spark.readStream.schema(schema).parquet(inDir)
        .withColumn("ts", timestamp_millis(col("ts_ms")))
      EventStream.interpolateStream(src, stepMs = 1000L, watermark = "0 seconds")
        .writeStream.outputMode(OutputMode.Append)
        .option("checkpointLocation", ckDir)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[InterpRow], _: Long) =>
          b.write.mode("append").parquet(outDir): Unit
        }.start()
    }
    // phase 1: anchor at bucket 0 seals and emits; ONLY the checkpoint
    // now knows the previous anchor
    push((1L, 500L, 1L, 10.0))
    val q1 = start(); q1.processAllAvailable()
    push((9L, 2000L, 0L, 0.0)); q1.processAllAvailable()
    q1.stop()
    // phase 2: the next anchor (bucket 3) must blend its gap run against
    // the RECOVERED anchor — amnesia would emit the anchor with no gaps
    push((1L, 3500L, 2L, 40.0))
    val q2 = start(); q2.processAllAvailable()
    push((9L, 100000L, 0L, 0.0)); q2.processAllAvailable()
    push((9L, 200000L, 0L, 0.0)); q2.processAllAvailable()
    q2.stop()
    val rows = spark.read.parquet(outDir).as[InterpRow].collect()
      .filter(_.key == 1L).sortBy(_.bucket_ms)
      .map(r => (r.bucket_ms, r.n_events, r.interp_value)).toSeq
    assert(rows == Seq(
      (0L, 1L, 10.0),
      (1000L, 0L, 10.0 + (40.0 - 10.0) * (1.0 / 3.0)),
      (2000L, 0L, 10.0 + (40.0 - 10.0) * (2.0 / 3.0)),
      (3000L, 1L, 40.0)),
      s"restart broke the interpolation anchor: $rows")
  }

  test("ewmaStream survives a checkpoint restart: the carry is recovered") {
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    val T = 100000L
    val inDir = Files.createTempDirectory("ew-restart-in").toString
    val outDir = Files.createTempDirectory("ew-restart-out").toString
    val ckDir = Files.createTempDirectory("ew-restart-ck").toString
    val schema = Seq((0L, 0L, 0L, 0.0)).toDF("key", "ts_ms", "tie", "value").schema
    def push(rows: (Long, Long, Long, Double)*): Unit =
      rows.toSeq.toDF("key", "ts_ms", "tie", "value").repartition(1)
        .write.mode("append").parquet(inDir)
    def start() = {
      val src = spark.readStream.schema(schema).parquet(inDir)
        .withColumn("ts", timestamp_millis(col("ts_ms")))
      EventStream.ewmaStream(src, alpha = 0.5, watermark = "5 seconds")
        .writeStream.outputMode(OutputMode.Append)
        .option("checkpointLocation", ckDir)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[EwmaRow], _: Long) =>
          b.write.mode("append").parquet(outDir): Unit
        }.start()
    }
    // phase 1: first observation folds (s = 10), STOP with the carry
    // only in the checkpoint
    push((1L, T, 1L, 10.0))
    val q1 = start(); q1.processAllAvailable()
    push((9L, T + 6000L, 0L, 0.0)); q1.processAllAvailable()
    push((9L, T + 6500L, 0L, 0.0)); q1.processAllAvailable()
    q1.stop()
    // phase 2: the next observation must smooth AGAINST the recovered
    // carry (0.5*10 + 0.5*20 = 15); amnesia would restart at s = 20
    push((1L, T + 2000L, 2L, 20.0))
    val q2 = start(); q2.processAllAvailable()
    push((9L, T + 3000000L, 0L, 0.0)); q2.processAllAvailable()
    push((9L, T + 3100000L, 0L, 0.0)); q2.processAllAvailable()
    q2.stop()
    val rows = spark.read.parquet(outDir).as[EwmaRow].collect()
      .filter(_.key == 1L).sortBy(_.ts_ms).toSeq
    assert(rows.map(_.ewma) == Seq(10.0, 15.0),
      s"restart broke the ewma carry: $rows")
  }

  test("cusumStream survives a checkpoint restart: both sums recovered") {
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    val T = 100000L
    val inDir = Files.createTempDirectory("cu-restart-in").toString
    val outDir = Files.createTempDirectory("cu-restart-out").toString
    val ckDir = Files.createTempDirectory("cu-restart-ck").toString
    val schema = Seq((0L, 0L, 0L, 0.0)).toDF("key", "ts_ms", "tie", "value").schema
    def push(rows: (Long, Long, Long, Double)*): Unit =
      rows.toSeq.toDF("key", "ts_ms", "tie", "value").repartition(1)
        .write.mode("append").parquet(inDir)
    def start() = {
      val src = spark.readStream.schema(schema).parquet(inDir)
        .withColumn("ts", timestamp_millis(col("ts_ms")))
      EventStream.cusumStream(src, target = 50.0, slack = 5.0,
          threshold = 25.0, watermark = "5 seconds")
        .writeStream.outputMode(OutputMode.Append)
        .option("checkpointLocation", ckDir)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[CusumRow], _: Long) =>
          b.write.mode("append").parquet(outDir): Unit
        }.start()
    }
    // phase 1: +20 deviation folds hi to 15; STOP with the sums only in
    // the checkpoint
    push((1L, T, 1L, 70.0))
    val q1 = start(); q1.processAllAvailable()
    push((9L, T + 6000L, 0L, 50.0)); q1.processAllAvailable()
    push((9L, T + 6500L, 0L, 50.0)); q1.processAllAvailable()
    q1.stop()
    // phase 2: the next +20 must fold AGAINST the recovered 15 -> 30 and
    // breach the 25 threshold; amnesia would restart at 15 (no breach)
    push((1L, T + 2000L, 2L, 70.0))
    val q2 = start(); q2.processAllAvailable()
    push((9L, T + 3000000L, 0L, 50.0)); q2.processAllAvailable()
    push((9L, T + 3100000L, 0L, 50.0)); q2.processAllAvailable()
    q2.stop()
    val rows = spark.read.parquet(outDir).as[CusumRow].collect()
      .filter(_.key == 1L).sortBy(_.ts_ms).toSeq
    assert(rows.map(r => (r.cusum_high, r.breach)) ==
      Seq((15.0, false), (30.0, true)),
      s"restart broke the cusum sums: $rows")
  }

  test("funnelStream: committed frontiers equal the batch funnel, out-of-order included") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val stages = Seq(col("v") >= 1, col("v") >= 2, col("v") >= 3) // overlapping
    val horizon = Some(5000L)
    val input = MemoryStream[(Long, Long, Long, Long)] // key, ts_ms, tie, v
    val df = input.toDF().toDF("key", "ts_ms", "tie", "v")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .withColumn("bits", graft.operators.Analytics.stageBits(stages))
    val q = EventStream.funnelStream(df, nStages = 3, horizonMs = horizon,
        watermark = "5 seconds")
      .writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("funnel_stream_test").start()
    // key 1: plain a -> b -> c across batches
    // key 2: OUT OF ORDER across batches — the b/c event (ts 2000) arrives
    //   a batch BEFORE the stage-a event (ts 1000); an unbuffered fold
    //   would commit (1000, None, None), the sealed fold must cascade to
    //   (1000, 2000, 2000)
    // key 3: stage b lands exactly AT the horizon (6000 - 1000 == 5000)
    // key 4: stage b one past the horizon — never completes
    // key 5: same-event cascade, one v=3 event completes all three stages
    val batch1 = Seq((1L, 1000L, 1L, 1L), (2L, 2000L, 2L, 3L),
      (3L, 1000L, 3L, 1L), (4L, 1000L, 4L, 1L))
    val batch2 = Seq((1L, 2000L, 5L, 2L), (2L, 1000L, 6L, 1L),
      (3L, 6000L, 7L, 2L), (4L, 6001L, 8L, 2L), (5L, 1500L, 9L, 3L))
    val batch3 = Seq((1L, 3000L, 10L, 3L))
    try {
      input.addData(batch1: _*); q.processAllAvailable()
      input.addData(batch2: _*); q.processAllAvailable()
      input.addData(batch3: _*); q.processAllAvailable()
      // sentinels push the watermark past every real event so the
      // event-time timeouts drain the pending buffers (wm lags one batch)
      input.addData((9L, 100000L, 0L, 0L)); q.processAllAvailable()
      input.addData((9L, 200000L, 0L, 0L)); q.processAllAvailable()
      // n_complete is monotone per key: the max-update is the final state
      val streamed = spark.table("funnel_stream_test").as[FunnelUpdate]
        .collect().filter(_.key != 9L)
        .groupBy(_.key).map { case (k, us) => k -> us.maxBy(_.n_complete).stage_ts }
      val all = batch1 ++ batch2 ++ batch3
      val expect = graft.operators.Analytics.funnelStages(
          all.toDF("user_id", "ts_ms", "tie", "v"),
          stages = Seq("s1" -> (col("v") >= 1), "s2" -> (col("v") >= 2),
            "s3" -> (col("v") >= 3)),
          keys = Seq("user_id"), tieCol = "tie", horizonMs = horizon)
        .collect().map { r =>
          r.getLong(0) -> (1 to 3).map(i => Option(r.get(i)).map(_.asInstanceOf[Long]))
        }.toMap
        .filter(_._2.exists(_.nonEmpty)) // all-None keys emit no update
      assert(streamed == expect,
        s"stream/batch divergence:\nstream: $streamed\nbatch:  $expect")
      // the out-of-order cascade specifically
      assert(streamed(2L) == Seq(Some(1000L), Some(2000L), Some(2000L)))
      assert(streamed(3L) == Seq(Some(1000L), Some(6000L), None))
      assert(streamed(4L) == Seq(Some(1000L), None, None))
      assert(streamed(5L) == Seq(Some(1500L), Some(1500L), Some(1500L)))
    } finally q.stop()
  }

  test("coalesceIntervalsStream: closed islands equal the batch coalesce") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Long, Long)] // key, s_ms, e_ms
    val df = input.toDF().toDF("key", "s_ms", "end_ms")
      .withColumn("ts", timestamp_millis(col("s_ms")))
    val q = EventStream.coalesceIntervalsStream(df, watermark = "5 seconds")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("coalesce_stream_test").start()
    // times sit on a base offset: a row with event time exactly 0 is
    // dropped by the late filter at the initial watermark 0
    val T = 100000L
    // key 1: [T+0,T+1000] [T+500,T+2000] overlap, [T+2000,T+2500]
    //   touching -> one island; then a gap -> [T+9000,T+9500]
    // key 2: OUT OF ORDER across batches — [T+3000,T+4000] arrives a
    //   batch before [T+1000,T+3500]; the sealed fold must merge them
    //   into one island (an unbuffered fold would emit two)
    // key 3: a singleton
    val batch1 = Seq((1L, T, T + 1000L), (1L, T + 500L, T + 2000L),
      (2L, T + 3000L, T + 4000L))
    val batch2 = Seq((1L, T + 2000L, T + 2500L), (2L, T + 1000L, T + 3500L),
      (3L, T + 100L, T + 200L))
    val batch3 = Seq((1L, T + 9000L, T + 9500L))
    try {
      input.addData(batch1: _*); q.processAllAvailable()
      input.addData(batch2: _*); q.processAllAvailable()
      input.addData(batch3: _*); q.processAllAvailable()
      // sentinels advance the watermark past every island end so the
      // event-time timeouts flush the trailing open islands
      input.addData((9L, T + 1000000L, T + 1000001L)); q.processAllAvailable()
      input.addData((9L, T + 3000000L, T + 3000001L)); q.processAllAvailable()
      val streamed = spark.table("coalesce_stream_test").as[IslandRow]
        .collect().filter(_.key != 9L)
        .map(r => (r.key, r.island_start, r.island_end, r.n_merged))
        .sortBy(r => (r._1, r._2)).toSeq
      val all = batch1 ++ batch2 ++ batch3
      val batch = graft.operators.Intervals.coalesce(
          all.toDF("key", "s", "e"), keys = Seq("key"),
          startCol = "s", endCol = "e")
        .select(col("key"), col("island_start"), col("island_end"), col("n_merged"))
        .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
      assert(streamed == batch,
        s"stream/batch divergence:\nstream: $streamed\nbatch:  $batch")
      // the out-of-order merge specifically
      assert(streamed.contains((2L, T + 1000L, T + 4000L, 2L)))
    } finally q.stop()
  }

  test("coalesceIntervalsStream survives a checkpoint restart mid-island") {
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    val T = 100000L
    val inDir = Files.createTempDirectory("ci-restart-in").toString
    val outDir = Files.createTempDirectory("ci-restart-out").toString
    val ckDir = Files.createTempDirectory("ci-restart-ck").toString
    val schema = Seq((0L, 0L, 0L)).toDF("key", "s_ms", "end_ms").schema
    def push(rows: (Long, Long, Long)*): Unit =
      rows.toSeq.toDF("key", "s_ms", "end_ms").repartition(1)
        .write.mode("append").parquet(inDir)
    def start() = {
      val src = spark.readStream.schema(schema).parquet(inDir)
        .withColumn("ts", timestamp_millis(col("s_ms")))
      EventStream.coalesceIntervalsStream(src, watermark = "5 seconds")
        .writeStream.outputMode(OutputMode.Append)
        .option("checkpointLocation", ckDir)
        .format("parquet").option("path", outDir).start()
    }
    // phase 1: open an island for key 1, then STOP mid-island
    push((1L, T, T + 1000L), (1L, T + 500L, T + 2000L))
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    // phase 2: a NEW query from the same checkpoint — the overlapping
    // interval must merge into the RECOVERED open island (an amnesiac
    // restart would emit two islands), then sentinels flush
    push((1L, T + 1500L, T + 3000L))
    val q2 = start(); q2.processAllAvailable()
    push((9L, T + 1000000L, T + 1000001L)); q2.processAllAvailable()
    push((9L, T + 3000000L, T + 3000001L)); q2.processAllAvailable()
    q2.stop()
    val out = spark.read.parquet(outDir).as[IslandRow].collect()
      .filter(_.key == 1L)
      .map(r => (r.island_start, r.island_end, r.n_merged)).toSeq
    assert(out == Seq((T, T + 3000L, 3L)),
      s"restart broke island state: $out")
  }

  test("funnelStream survives a checkpoint restart mid-funnel") {
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    val T = 100000L
    val inDir = Files.createTempDirectory("fn-restart-in").toString
    val outDir = Files.createTempDirectory("fn-restart-out").toString
    val ckDir = Files.createTempDirectory("fn-restart-ck").toString
    val schema = Seq((0L, 0L, 0L, 0L)).toDF("key", "ts_ms", "tie", "v").schema
    def push(rows: (Long, Long, Long, Long)*): Unit =
      rows.toSeq.toDF("key", "ts_ms", "tie", "v").repartition(1)
        .write.mode("append").parquet(inDir)
    def start() = {
      val src = spark.readStream.schema(schema).parquet(inDir)
        .withColumn("ts", timestamp_millis(col("ts_ms")))
        .withColumn("bits", graft.operators.Analytics.stageBits(
          Seq(col("v") >= 1, col("v") >= 2, col("v") >= 3)))
      EventStream.funnelStream(src, nStages = 3, watermark = "5 seconds")
        .writeStream.outputMode(OutputMode.Update)
        .option("checkpointLocation", ckDir)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[FunnelUpdate], _: Long) =>
          b.write.mode("append").parquet(outDir): Unit
        }.start()
    }
    // phase 1: stage 1 completes — sealed by MODEST sentinels (the
    // watermark must stay behind phase 2's event or it would arrive
    // late), STOP mid-funnel
    push((1L, T, 1L, 1L))
    val q1 = start(); q1.processAllAvailable()
    push((9L, T + 6000L, 0L, 0L)); q1.processAllAvailable()
    push((9L, T + 6500L, 0L, 0L)); q1.processAllAvailable()
    q1.stop()
    // phase 2: stages 2+3 complete from one event — legal ONLY if the
    // recovered frontier still holds stage 1 (amnesia would gate them out)
    push((1L, T + 2000L, 2L, 3L))
    val q2 = start(); q2.processAllAvailable()
    push((9L, T + 3000000L, 0L, 0L)); q2.processAllAvailable()
    push((9L, T + 3100000L, 0L, 0L)); q2.processAllAvailable()
    q2.stop()
    val last = spark.read.parquet(outDir).as[FunnelUpdate].collect()
      .filter(_.key == 1L).maxBy(_.n_complete)
    assert(last.stage_ts == Seq(Some(T), Some(T + 2000L), Some(T + 2000L)),
      s"restart broke funnel state: $last")
  }

  test("dedupStream keeps one row per key with watermark-bounded state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(String, Long)] // (fingerprint, ts_ms)
    val df = input.toDF().toDF("fingerprint", "ts_ms")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
    val q = EventStream.dedupStream(df, "fingerprint", watermark = "10 minutes")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("dedup_test").start()
    try {
      input.addData(("a", 1000L), ("a", 1500L), ("b", 2000L))
      q.processAllAvailable()
      // duplicate key across batches at a DIFFERENT event time: still dropped
      input.addData(("a", 2500L), ("c", 3000L))
      q.processAllAvailable()
      val out = spark.table("dedup_test").select("fingerprint").as[String].collect().sorted
      assert(out.toSeq == Seq("a", "b", "c"))
    } finally q.stop()
  }

  test("dedupUnitsStream: keep-first across batches, min-(id,pos) within a batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String)]
    val df = input.toDF().toDF("doc_id", "text")
    val q = EventStream.dedupUnitsStream(df)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("unit_dedup_test").start()
    try {
      // batch 1: "shared" appears in docs 9 and 2 — the min doc wins
      input.addData((9L, "shared\nnine only"), (2L, "shared\ntwo only"))
      q.processAllAvailable()
      // batch 2: doc 1 re-sends "shared" (lower id, but LATER batch: still
      // dropped — history wins) plus one genuinely new unit
      input.addData((1L, "shared\nfresh"))
      q.processAllAvailable()
      val out = spark.table("unit_dedup_test").as[UnitRow].collect()
        .map(u => (u.doc_id, u.unit)).toSet
      assert(out == Set((2L, "shared"), (9L, "nine only"), (2L, "two only"),
        (1L, "fresh")))
    } finally q.stop()
  }

  test("stream-stream interval join equals the batch plan over the same data") {
    val batch = eventsBatch()
    val dir = Files.createTempDirectory("enrich-in").toString
    batch.write.mode("overwrite").parquet(dir)
    def side(df: org.apache.spark.sql.DataFrame, t: String) =
      df.filter(col("event_type") === t).select("event_id", "user_id", "ts")
    val stream = EventStream.readEventsStream(spark, dir, batch.schema)
    val joined = EventStream.enrichJoin(
      side(stream, "click"), side(stream, "purchase"), windowMs = 3600000L)
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("enrich_test").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("enrich_test").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val expected = EventStream.enrichJoin(
        side(batch, "click"), side(batch, "purchase"), windowMs = 3600000L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(expected.nonEmpty, "fixture produced no purchase-click pairs; widen the window")
      assert(streamed == expected,
        s"stream/batch divergence: ${streamed.size} vs ${expected.size} pairs")
    } finally q.stop()
  }

  test("stream-static join: micro-batches enrich against a broadcast dimension") {
    import spark.implicits._
    val batch = eventsBatch()
    val dir = Files.createTempDirectory("static-join-in").toString
    batch.write.mode("overwrite").parquet(dir)
    // static dimension: user segment buckets — broadcastable, no state
    val dim = (0L until 100L).map(u => (u, if (u % 2 == 0) "even" else "odd"))
      .toDF("user_id", "segment")
    def joined(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "user_id")
        .join(org.apache.spark.sql.functions.broadcast(dim), Seq("user_id"))
    val stream = EventStream.readEventsStream(spark, dir, batch.schema)
    val q = joined(stream).writeStream.outputMode("append")
      .format("memory").queryName("static_join_test").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("static_join_test").collect()
        .map(r => (r.getLong(1), r.getString(2))).toSet
      val expected = joined(batch).collect()
        .map(r => (r.getLong(1), r.getString(2))).toSet
      assert(expected.nonEmpty && streamed == expected)
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

  test("streaming embedding ingest appends to a persisted IVF index (drift-aware)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val idxDir = Files.createTempDirectory("stream-ivf-idx").toString
    graft.llmops.Similarity.buildIvfIndex(
      emb.filter(col("vec_id") % 2 === 0), idxDir, numCentroids = 8)
    val baseCount = graft.llmops.Similarity.ivfAssigned(spark, idxDir).count()
    // stream the odd half in two micro-batches
    val inDir = Files.createTempDirectory("stream-ivf-in").toString
    val odd = emb.filter(col("vec_id") % 2 === 1)
    odd.filter(col("vec_id") % 4 === 1).coalesce(1).write.mode("overwrite").parquet(s"$inDir/b")
    odd.filter(col("vec_id") % 4 === 3).coalesce(1).write.mode("append").parquet(s"$inDir/b")
    val stream = EventStream.readEventsStream(spark, s"$inDir/b", odd.schema)
    val q = EventStream.ingestToIvfIndex(stream, idxDir,
      Files.createTempDirectory("stream-ivf-ckpt").toString)
    try { q.processAllAvailable() } finally q.stop()
    // every streamed vector is in the live index and reachable by probes
    assert(graft.llmops.Similarity.ivfAssigned(spark, idxDir).count() ==
      baseCount + odd.count())
    val res = graft.llmops.Similarity.ivfTopKIndexed(
      spark, idxDir, odd.limit(3), k = 3, nProbe = 8)
    assert(res.count() == 9)
    assert(res.collect().map(_.getLong(1)).exists(_ % 2 == 1),
      "streamed vectors never surfaced as neighbors")
  }

  test("streaming ingest into an IVF-PQ index codes every batch; compaction folds them") {
    import graft.llmops.Similarity
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val idxDir = Files.createTempDirectory("stream-ivfpq-idx").toString
    Similarity.buildIvfPqIndex(
      emb.filter(col("vec_id") % 2 === 0), idxDir, numCentroids = 8)
    val inDir = Files.createTempDirectory("stream-ivfpq-in").toString
    val odd = emb.filter(col("vec_id") % 2 === 1)
    odd.filter(col("vec_id") % 4 === 1).coalesce(1).write.mode("overwrite").parquet(s"$inDir/b")
    odd.filter(col("vec_id") % 4 === 3).coalesce(1).write.mode("append").parquet(s"$inDir/b")
    val stream = EventStream.readEventsStream(spark, s"$inDir/b", odd.schema)
    val q = EventStream.ingestToIvfIndex(stream, idxDir,
      Files.createTempDirectory("stream-ivfpq-ckpt").toString)
    try { q.processAllAvailable() } finally q.stop()
    // every streamed row carries a PQ code (the append encoded its batch)
    val assigned = Similarity.ivfAssigned(spark, idxDir)
    assert(assigned.count() == emb.count())
    assert(assigned.filter(col("code").isNull || size(col("code")) =!= 8).count() == 0,
      "a streamed batch landed uncoded — ADC scans over it would fail")
    // fold the micro-batch append dirs into the base table: results of the
    // ADC+re-rank path are unchanged, generation bumps, nothing re-fits
    val genBefore = Similarity.ivfGeneration(spark, idxDir).get
    val before = Similarity.ivfPqTopK(spark, idxDir, emb.limit(3), k = 3, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(Similarity.compactIvfAppends(spark, idxDir))
    assert(Similarity.ivfGeneration(spark, idxDir).contains(genBefore + 1))
    val after = Similarity.ivfPqTopK(spark, idxDir, emb.limit(3), k = 3, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(after == before, "compaction changed query results")
    assert(!Similarity.compactIvfAppends(spark, idxDir),
      "a second compaction found batches to fold in a freshly folded index")
  }
}
