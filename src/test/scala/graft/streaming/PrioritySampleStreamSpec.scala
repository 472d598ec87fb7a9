package graft.streaming

import java.nio.file.Files
import graft.core.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** prioritySampleStream — the streaming priority-sample dual. Unlike the
  * sketch twins this one is EXACT: the priority is a pure function of
  * (id, weight) and top-k of a set is order-independent, so after any
  * prefix of the stream each key's emission must equal the batch sample
  * of exactly the rows seen so far — bit-for-bit, under any delivery
  * order, and across restarts.
  */
class PrioritySampleStreamSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  /** Independent reference priority (MessageDigest, no Spark). */
  private def refPriority(id: Long, w: Double): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(id.toString.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    val u52 = java.lang.Long.parseLong(hex.substring(0, 13), 16)
    w / ((u52 + 1).toDouble / 4503599627370496.0)
  }

  /** Expected emission for `seen` rows of one key: ids + priorities
    * best-first, tau = (k+1)-th priority (0 when exhaustive). */
  private def expected(seen: Seq[(Long, Double)], k: Int)
      : (Seq[Long], Seq[Double], Double) = {
    val ranked = seen.map { case (id, w) => (id, refPriority(id, w)) }
      .sortBy(t => (-t._2, t._1))
    val top = ranked.take(k)
    (top.map(_._1), top.map(_._2),
      ranked.drop(k).headOption.map(_._2).getOrElse(0.0))
  }

  test("exact per-key sample under shuffled multi-batch delivery; equals the batch operator") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val k = 10
    val rnd = new scala.util.Random(17L)
    // 3 independent keys, duplicate ids across keys on purpose
    val rows = for (key <- 1L to 3L; i <- 1L to 400L)
      yield (key, i, ((i * key) % 23 + 1).toDouble)
    val shuffled = rnd.shuffle(rows)
    val input = MemoryStream[(Long, Long, Double)]
    val q = EventStream.prioritySampleStream(
        input.toDF().toDF("key", "doc_id", "w"), k)
      .writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("ps_stream").start()
    try {
      var seen = Seq.empty[(Long, Long, Double)]
      for (b <- shuffled.grouped(300)) {
        input.addData(b: _*)
        q.processAllAvailable()
        seen = seen ++ b
        val latest = spark.table("ps_stream").as[PSampleUpdate].collect()
          .groupBy(_.key).map { case (key, us) => key -> us.maxBy(_.n) }
        for (key <- 1L to 3L) {
          val mine = seen.filter(_._1 == key).map(t => (t._2, t._3))
          val (expIds, expPris, expTau) = expected(mine, k)
          val u = latest(key)
          assert(u.n == mine.size.toLong, s"key=$key row count")
          assert(u.ids == expIds, s"key=$key ids differ after ${seen.size}")
          assert(u.priorities == expPris, s"key=$key priorities differ")
          assert(u.tau == expTau, s"key=$key tau differs")
        }
      }
      // stream == batch operator, bit-for-bit, for one key's final state
      val mine = rows.filter(_._1 == 2L).map(t => (t._2, t._3))
      val batch = graft.llmops.Curation.prioritySample(
          mine.toDF("doc_id", "w"), k, "w")
        .select("doc_id", "priority")
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
        .sortBy(t => (-t._2, t._1)).toSeq
      val fin = spark.table("ps_stream").as[PSampleUpdate].collect()
        .filter(_.key == 2L).maxBy(_.n)
      assert(fin.ids.zip(fin.priorities).toSeq == batch,
        "streaming sample != batch prioritySample on the same rows")
    } finally q.stop()
  }

  test("sample state survives a checkpoint restart") {
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    val inDir = Files.createTempDirectory("ps-restart-in").toString
    val outDir = Files.createTempDirectory("ps-restart-out").toString
    val ckDir = Files.createTempDirectory("ps-restart-ck").toString
    val schema = Seq((0L, 0L, 0.0)).toDF("key", "doc_id", "w").schema
    def push(rows: (Long, Long, Double)*): Unit =
      rows.toSeq.toDF("key", "doc_id", "w").repartition(1)
        .write.mode("append").parquet(inDir)
    def start() = {
      val src = spark.readStream.schema(schema).parquet(inDir)
      EventStream.prioritySampleStream(src, k = 5)
        .writeStream.outputMode(OutputMode.Update)
        .option("checkpointLocation", ckDir)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[PSampleUpdate], _: Long) =>
          b.write.mode("append").parquet(outDir): Unit
        }.start()
    }
    val first = (1L to 40L).map(i => (1L, i, (i % 7 + 1).toDouble))
    val second = (41L to 80L).map(i => (1L, i, (i % 7 + 1).toDouble))
    push(first: _*)
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    push(second: _*)
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    val fin = spark.read.parquet(outDir).as[PSampleUpdate].collect().maxBy(_.n)
    val (expIds, expPris, expTau) =
      expected((first ++ second).map(t => (t._2, t._3)), 5)
    // amnesia would sample only the second push; the carried top-k must
    // still hold first-push winners
    assert(fin.n == 80L)
    assert(fin.ids == expIds && fin.priorities == expPris && fin.tau == expTau)
  }

  test("non-positive weight fails the query loudly (no silent bias)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Long, Double)]
    val q = EventStream.prioritySampleStream(
        input.toDF().toDF("key", "doc_id", "w"), 3)
      .writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("ps_guard").start()
    try {
      input.addData((1L, 1L, 0.0))
      val e = intercept[Exception](q.processAllAvailable())
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
      assert(msgs(e).exists(m => m != null && m.contains("prioritySampleStream")),
        s"expected the weight guard, got $e")
    } finally q.stop()
  }

  test("non-long-castable doc_id fails the query loudly (the batch id guard)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String, Double)]
    val q = EventStream.prioritySampleStream(
        input.toDF().toDF("key", "doc_id", "w"), 3)
      .writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("ps_id_guard").start()
    try {
      input.addData((1L, "docA", 1.0))
      val e = intercept[Exception](q.processAllAvailable())
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
      assert(msgs(e).exists(m => m != null && m.contains("id column")),
        s"expected the id guard, got $e")
    } finally q.stop()
  }
}
