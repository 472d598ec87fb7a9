package graft.streaming

import java.nio.file.Files
import graft.core.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** asofStream — the streaming backward as-of dual: sealed-order parity
  * with the oracled batch KVOps.asofJoinBackward on out-of-order
  * histories, tolerance staleness, and checkpoint-restart recovery of
  * the carried reference.
  */
class AsofStreamSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  // (key, ts_ms, tie, payload) — reference side
  private val rightRows = Seq(
    (1L, 1000L, 1L, Some("r1")), (1L, 1000L, 2L, Some("r2")),
    (1L, 4000L, 3L, Some("r3")), (2L, 5000L, 1L, Some("rA")))
  // (key, ts_ms, tie) — probe side; expected backward matches:
  // (1,500)→none, (1,1000)→r2 (inclusive + largest tie), (1,3500)→r2,
  // (1,4000)→r3, (1,9000)→r3, (2,4500)→none, (2,6000)→rA, (3,700)→none
  private val leftRows = Seq(
    (1L, 500L, 1L), (1L, 1000L, 2L), (1L, 3500L, 3L), (1L, 4000L, 4L),
    (1L, 9000L, 5L), (2L, 4500L, 1L), (2L, 6000L, 2L), (3L, 700L, 1L))

  private def runStream(tol: Option[Long],
      name: String): Seq[(Long, Long, Long, Option[Long], Option[String])] = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val lIn = MemoryStream[(Long, Long, Long)]
    val rIn = MemoryStream[(Long, Long, Long, Option[String])]
    val lDf = lIn.toDF().toDF("key", "ts_ms", "tie")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
    val rDf = rIn.toDF().toDF("key", "ts_ms", "tie", "payload")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
    // the lateness budget must cover the deliberate cross-batch shuffle
    // (ts 500..9000 arrive in arbitrary batch order): 20s means nothing
    // here is "too late", and the sentinels then seal everything
    val q = EventStream.asofStream(lDf, rDf, watermark = "20 seconds",
        toleranceMs = tol)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName(name).start()
    try {
      // out-of-order ACROSS batches: late probes arrive after later
      // references; the sealed-order fold must not care
      rIn.addData(rightRows(2), rightRows(3)); q.processAllAvailable()
      lIn.addData(leftRows(4), leftRows(0), leftRows(6)); q.processAllAvailable()
      rIn.addData(rightRows(0), rightRows(1)); q.processAllAvailable()
      lIn.addData(leftRows(1), leftRows(5), leftRows(7)); q.processAllAvailable()
      lIn.addData(leftRows(2), leftRows(3)); q.processAllAvailable()
      // watermark sentinels (filtered out of the assertion)
      for (t <- Seq(50000L, 100000L, 150000L)) {
        lIn.addData((9L, t, 0L)); q.processAllAvailable()
      }
      spark.table(name).as[AsofRow].collect()
        .filter(_.key != 9L)
        .map(r => (r.key, r.ts_ms, r.tie, r.asof_ts_ms, r.asof_payload))
        .sortBy(t => (t._1, t._2, t._3)).toSeq
    } finally q.stop()
  }

  test("asofStream: matches equal the batch asofJoinBackward on shuffled arrivals") {
    import spark.implicits._
    val streamed = runStream(tol = None, name = "asof_test")
    val batchL = leftRows.toDF("key", "ts_ms", "tie")
    val batchR = rightRows.toDF("key", "ts_ms", "tie", "payload")
      .withColumn("rt_ms", col("ts_ms"))
    val batch = graft.operators.KVOps.asofJoinBackward(
        batchL, batchR, keys = Seq("key"), leftTime = "ts_ms",
        rightTime = "ts_ms", payloadCols = Seq("payload", "rt_ms"),
        rightOrderCol = Some("tie"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.getAs[java.lang.Long]("asof_rt_ms")).map(_.longValue),
        Option(r.getAs[String]("asof_payload"))))
      .sortBy(t => (t._1, t._2, t._3)).toSeq
    assert(streamed == batch,
      s"stream/batch divergence:\nstream: $streamed\nbatch:  $batch")
    // spot anchors: inclusive equal-ts match takes the LARGEST tie, and
    // a probe before any reference emits NULLs rather than nothing
    assert(streamed.contains((1L, 1000L, 2L, Some(1000L), Some("r2"))))
    assert(streamed.contains((1L, 500L, 1L, None, None)))
  }

  test("asofStream: tolerance nulls matches older than the bound, keeps the rest") {
    val streamed = runStream(tol = Some(3000L), name = "asof_tol_test")
    // 9000 - 4000 = 5000 > 3000 → stale, NULLed; 3500 - 1000 = 2500 ok
    assert(streamed.contains((1L, 9000L, 5L, None, None)))
    assert(streamed.contains((1L, 3500L, 3L, Some(1000L), Some("r2"))))
  }

  test("asofStream: random histories in random batch order equal the batch join (seeded fuzz)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val rnd = new scala.util.Random(97)
    // ~25 keys, ts 1000..31000, duplicate timestamps ON PURPOSE (tie
    // rules are where stream and batch most easily diverge). NEVER
    // ts=0: Spark's stateful late-filter drops rows AT the watermark
    // (sealed-means-final), and the initial watermark is 0 — an
    // epoch-0 event is late before the stream even starts (verified:
    // ts=0 dropped, ts=1 kept).
    val rs = (0 until 300).map { i =>
      (rnd.nextInt(25).toLong, (1 + rnd.nextInt(31)) * 1000L, i.toLong,
        Some(s"r$i"))
    }
    val ls = (0 until 300).map { i =>
      (rnd.nextInt(25).toLong, (1 + rnd.nextInt(31)) * 1000L, i.toLong)
    }
    val lIn = MemoryStream[(Long, Long, Long)]
    val rIn = MemoryStream[(Long, Long, Long, Option[String])]
    val lDf = lIn.toDF().toDF("key", "ts_ms", "tie")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
    val rDf = rIn.toDF().toDF("key", "ts_ms", "tie", "payload")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
    val q = EventStream.asofStream(lDf, rDf, watermark = "40 seconds")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("asof_fuzz").start()
    try {
      // interleave both sides in shuffled chunks across many batches
      val lChunks = rnd.shuffle(ls).grouped(40).toSeq
      val rChunks = rnd.shuffle(rs).grouped(40).toSeq
      for (i <- 0 until math.max(lChunks.size, rChunks.size)) {
        if (i < rChunks.size) { rIn.addData(rChunks(i): _*); q.processAllAvailable() }
        if (i < lChunks.size) { lIn.addData(lChunks(i): _*); q.processAllAvailable() }
      }
      for (t <- Seq(100000L, 200000L, 300000L)) {
        lIn.addData((99L, t, 0L)); q.processAllAvailable()
      }
      val streamed = spark.table("asof_fuzz").as[AsofRow].collect()
        .filter(_.key != 99L)
        .map(r => (r.key, r.ts_ms, r.tie, r.asof_ts_ms, r.asof_payload))
        .sortBy(t => (t._1, t._2, t._3)).toSeq
      val batch = graft.operators.KVOps.asofJoinBackward(
          ls.toDF("key", "ts_ms", "tie"),
          rs.toDF("key", "ts_ms", "tie", "payload")
            .withColumn("rt_ms", col("ts_ms")),
          keys = Seq("key"), leftTime = "ts_ms", rightTime = "ts_ms",
          payloadCols = Seq("payload", "rt_ms"), rightOrderCol = Some("tie"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          Option(r.getAs[java.lang.Long]("asof_rt_ms")).map(_.longValue),
          Option(r.getAs[String]("asof_payload"))))
        .sortBy(t => (t._1, t._2, t._3)).toSeq
      assert(streamed.size == ls.size, s"lost probes: ${streamed.size}/${ls.size}")
      assert(streamed == batch,
        s"fuzz divergence (first diff: ${streamed.zip(batch).find(p => p._1 != p._2)})")
    } finally q.stop()
  }

  test("asofForwardStream: matches equal the batch asofJoinForward within tolerance") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val tol = 3000L
    val lIn = MemoryStream[(Long, Long, Long)]
    val rIn = MemoryStream[(Long, Long, Long, Option[String])]
    val lDf = lIn.toDF().toDF("key", "ts_ms", "tie")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
    val rDf = rIn.toDF().toDF("key", "ts_ms", "tie", "payload")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
    val q = EventStream.asofForwardStream(lDf, rDf, toleranceMs = tol,
        watermark = "20 seconds")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("asof_fwd_test").start()
    try {
      // probes BEFORE their references, shuffled across batches;
      // (1,500)→r2 wins the 1000-ts tie (smallest tie), (1,3500)→r3,
      // (1,4100)→NULL (4000 already past, window [4100,7100] empty),
      // (1,900)→r2, (2,4500)→rA at 5000, (3,100)→NULL (no refs at all)
      lIn.addData((1L, 500L, 1L), (1L, 3500L, 2L), (2L, 4500L, 1L)); q.processAllAvailable()
      rIn.addData(rightRows(2), rightRows(3)); q.processAllAvailable()
      lIn.addData((1L, 4100L, 3L), (1L, 900L, 4L), (3L, 100L, 1L)); q.processAllAvailable()
      rIn.addData(rightRows(0), rightRows(1)); q.processAllAvailable()
      for (t <- Seq(50000L, 100000L, 150000L)) {
        lIn.addData((9L, t, 0L)); q.processAllAvailable()
      }
      val streamed = spark.table("asof_fwd_test").as[AsofRow].collect()
        .filter(_.key != 9L)
        .map(r => (r.key, r.ts_ms, r.tie, r.asof_ts_ms, r.asof_payload))
        .sortBy(t => (t._1, t._2, t._3)).toSeq
      // forward ties at one timestamp break SMALLEST tie → r1, not r2
      assert(streamed.contains((1L, 500L, 1L, Some(1000L), Some("r1"))))
      assert(streamed.contains((1L, 4100L, 3L, None, None)))
      assert(streamed.contains((3L, 100L, 1L, None, None)))
      val batchL = Seq((1L, 500L, 1L), (1L, 3500L, 2L), (2L, 4500L, 1L),
        (1L, 4100L, 3L), (1L, 900L, 4L), (3L, 100L, 1L)).toDF("key", "ts_ms", "tie")
      val batchR = rightRows.toDF("key", "ts_ms", "tie", "payload")
        .withColumn("rt_ms", col("ts_ms"))
      val batch = graft.operators.KVOps.asofJoinForward(
          batchL, batchR, keys = Seq("key"), leftTime = "ts_ms",
          rightTime = "ts_ms", payloadCols = Seq("payload", "rt_ms"),
          rightOrderCol = Some("tie"), toleranceMs = Some(tol))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          Option(r.getAs[java.lang.Long]("asof_rt_ms")).map(_.longValue),
          Option(r.getAs[String]("asof_payload"))))
        .sortBy(t => (t._1, t._2, t._3)).toSeq
      assert(streamed == batch,
        s"stream/batch divergence:\nstream: $streamed\nbatch:  $batch")
    } finally q.stop()
  }

  test("asofForwardStream survives a restart: the WAITING probe is recovered and matched") {
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    val T = 100000L
    val inDir = Files.createTempDirectory("asoff-restart-in").toString
    val outDir = Files.createTempDirectory("asoff-restart-out").toString
    val ckDir = Files.createTempDirectory("asoff-restart-ck").toString
    val schema = Seq((0L, 0L, 0L, 0, Option.empty[String]))
      .toDF("key", "ts_ms", "tie", "side", "payload").schema
    def push(rows: (Long, Long, Long, Int, Option[String])*): Unit =
      rows.toSeq.toDF("key", "ts_ms", "tie", "side", "payload").repartition(1)
        .write.mode("append").parquet(inDir)
    def start() = {
      val src = spark.readStream.schema(schema).parquet(inDir)
        .withColumn("ts", timestamp_millis(col("ts_ms")))
      EventStream.asofForwardStream(
          src.filter(col("side") === 1), src.filter(col("side") === 0),
          toleranceMs = 60000L, watermark = "5 seconds")
        .writeStream.outputMode(OutputMode.Append)
        .option("checkpointLocation", ckDir)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[AsofRow], _: Long) =>
          b.write.mode("append").parquet(outDir): Unit
        }.start()
    }
    // phase 1: seal the probe with NO reference in sight — it must wait
    // (emitting nothing), with only the checkpoint holding it
    push((1L, T, 1L, 1, None))
    val q1 = start(); q1.processAllAvailable()
    push((9L, T + 6000L, 0L, 1, None)); q1.processAllAvailable()
    push((9L, T + 6500L, 0L, 1, None)); q1.processAllAvailable()
    q1.stop()
    assert(!new java.io.File(outDir).exists() ||
      spark.read.parquet(outDir).filter(col("key") === 1L).count() == 0,
      "the probe emitted before any reference or window expiry")
    // phase 2: the in-window reference arrives after restart — the
    // RECOVERED probe must match it (amnesia would drop the probe and
    // emit nothing, or re-emit NULLs at window end)
    push((1L, T + 30000L, 1L, 0, Some("next")))
    val q2 = start(); q2.processAllAvailable()
    push((9L, T + 300000L, 0L, 1, None)); q2.processAllAvailable()
    push((9L, T + 400000L, 0L, 1, None)); q2.processAllAvailable()
    q2.stop()
    val rows = spark.read.parquet(outDir).as[AsofRow].collect()
      .filter(_.key == 1L)
      .map(r => (r.ts_ms, r.tie, r.asof_ts_ms, r.asof_payload)).toSeq
    assert(rows == Seq((T, 1L, Some(T + 30000L), Some("next"))),
      s"restart broke the waiting-probe recovery: $rows")
  }

  test("asofStream survives a checkpoint restart: the carried reference is recovered") {
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    val T = 100000L
    val inDir = Files.createTempDirectory("asof-restart-in").toString
    val outDir = Files.createTempDirectory("asof-restart-out").toString
    val ckDir = Files.createTempDirectory("asof-restart-ck").toString
    val schema = Seq((0L, 0L, 0L, 0, Option.empty[String]))
      .toDF("key", "ts_ms", "tie", "side", "payload").schema
    def push(rows: (Long, Long, Long, Int, Option[String])*): Unit =
      rows.toSeq.toDF("key", "ts_ms", "tie", "side", "payload").repartition(1)
        .write.mode("append").parquet(inDir)
    def start() = {
      val src = spark.readStream.schema(schema).parquet(inDir)
        .withColumn("ts", timestamp_millis(col("ts_ms")))
      EventStream.asofStream(
          src.filter(col("side") === 1), src.filter(col("side") === 0),
          watermark = "5 seconds")
        .writeStream.outputMode(OutputMode.Append)
        .option("checkpointLocation", ckDir)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[AsofRow], _: Long) =>
          b.write.mode("append").parquet(outDir): Unit
        }.start()
    }
    // phase 1: seal ONE reference into the carry, no probes; stop with
    // the carry only in the checkpoint
    push((1L, T, 1L, 0, Some("ref")))
    val q1 = start(); q1.processAllAvailable()
    push((9L, T + 6000L, 0L, 1, None)); q1.processAllAvailable()
    push((9L, T + 6500L, 0L, 1, None)); q1.processAllAvailable()
    q1.stop()
    // phase 2: a probe after restart must match the RECOVERED carry —
    // amnesia would emit NULLs
    push((1L, T + 2000L, 1L, 1, None))
    val q2 = start(); q2.processAllAvailable()
    push((9L, T + 3000000L, 0L, 1, None)); q2.processAllAvailable()
    push((9L, T + 3100000L, 0L, 1, None)); q2.processAllAvailable()
    q2.stop()
    val rows = spark.read.parquet(outDir).as[AsofRow].collect()
      .filter(_.key == 1L)
      .map(r => (r.ts_ms, r.tie, r.asof_ts_ms, r.asof_payload)).toSeq
    assert(rows == Seq((T + 2000L, 1L, Some(T), Some("ref"))),
      s"restart broke the reference carry: $rows")
  }
}
