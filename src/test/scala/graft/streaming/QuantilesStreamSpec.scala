package graft.streaming

import java.nio.file.Files
import graft.core.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** quantilesStream — the streaming KLL dual: the carried rank-error
  * bound holds at EVERY emission for any delivery order, n is weight-
  * exact, the sub-k regime reproduces exact discrete quantiles, keys
  * are independent, and the compactor stack survives restarts.
  */
class QuantilesStreamSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val probs = Seq(0.1, 0.25, 0.5, 0.75, 0.9)

  /** Asserts the sketch contract of one emission against the exact
    * prefix of values it has seen. */
  private def assertBound(seen: Seq[Double], u: QSUpdate): Unit = {
    assert(u.n == seen.size.toLong, s"weight leak: n=${u.n} vs ${seen.size}")
    val sorted = seen.sorted
    probs.zip(u.qs).foreach { case (p, v) =>
      val target = math.max(1L, math.ceil(p * u.n).toLong)
      val lt = sorted.count(_ < v).toLong
      val le = sorted.count(_ <= v).toLong
      assert(le > lt, s"answer $v for p=$p is not a seen value")
      assert(le >= target - u.bound && lt + 1 <= target + u.bound,
        s"p=$p: true rank span [${lt + 1}, $le] misses target $target " +
          s"by more than bound ${u.bound}")
    }
  }

  test("carried bound holds at every emission under shuffled multi-batch delivery") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val rnd = new scala.util.Random(41L)
    val values = Seq.fill(12000)((rnd.nextInt(700) * 7 + 2).toDouble)
    val shuffled = rnd.shuffle(values)
    val input = MemoryStream[(Long, Double)]
    val q = EventStream.quantilesStream(
        input.toDF().toDF("key", "value"), probs, k = 64)
      .writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("qs_stream").start()
    try {
      val batches = shuffled.grouped(4000).toSeq
      var seen = Seq.empty[Double]
      for (b <- batches) {
        input.addData(b.map((1L, _)): _*)
        q.processAllAvailable()
        seen = seen ++ b
        val u = spark.table("qs_stream").as[QSUpdate].collect()
          .filter(_.key == 1L).maxBy(_.n)
        assertBound(seen, u)
        assert(u.bound < seen.size / 2, s"bound ${u.bound} uselessly large")
      }
      // stream-vs-batch parity OF THE CONTRACT: the batch aggregate over
      // the same multiset also passes the same assertion (values may
      // legitimately differ — merge trees differ)
      val batch = values.toDF("v").repartition(9)
        .agg(graft.functions.expressions.QuantileFunctions
          .quantile_sketch(org.apache.spark.sql.functions.col("v"), probs, 64)
          .as("s"))
        .select("s.*").head()
      assertBound(values,
        QSUpdate(1L, batch.getLong(0), batch.getLong(1),
          batch.getSeq[Double](2)))
    } finally q.stop()
  }

  test("sub-k regime answers exact discrete quantiles; keys independent") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Double)]
    val q = EventStream.quantilesStream(
        input.toDF().toDF("key", "value"), probs, k = 256)
      .writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("qs_exact").start()
    try {
      input.addData((1 to 100).map(i => (1L, i.toDouble)) ++
        Seq((2L, 5.0), (2L, 6.0)): _*)
      q.processAllAvailable()
      val fin = spark.table("qs_exact").as[QSUpdate].collect()
        .groupBy(_.key).map { case (kk, us) => kk -> us.maxBy(_.n) }
      // zero compactions: the sketch IS the data, answers are exact
      assert(fin(1L).qs == probs.map(p =>
        math.max(1, math.ceil(p * 100).toInt).toDouble))
      assert(fin(2L).n == 2L && fin(2L).qs ==
        probs.map(p => if (math.ceil(p * 2) <= 1) 5.0 else 6.0))
    } finally q.stop()
  }

  test("compactor stack survives a checkpoint restart") {
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    val inDir = Files.createTempDirectory("qs-restart-in").toString
    val outDir = Files.createTempDirectory("qs-restart-out").toString
    val ckDir = Files.createTempDirectory("qs-restart-ck").toString
    val schema = Seq((0L, 0.0)).toDF("key", "value").schema
    def push(rows: (Long, Double)*): Unit =
      rows.toSeq.toDF("key", "value").repartition(1)
        .write.mode("append").parquet(inDir)
    def start() = {
      val src = spark.readStream.schema(schema).parquet(inDir)
      EventStream.quantilesStream(src, probs, k = 16)
        .writeStream.outputMode(OutputMode.Update)
        .option("checkpointLocation", ckDir)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[QSUpdate], _: Long) =>
          b.write.mode("append").parquet(outDir): Unit
        }.start()
    }
    val rnd = new scala.util.Random(5L)
    val first = Seq.fill(300)(rnd.nextDouble() * 100)
    val second = Seq.fill(300)(rnd.nextDouble() * 100)
    push(first.map((1L, _)): _*)
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    push(second.map((1L, _)): _*)
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    val fin = spark.read.parquet(outDir).as[QSUpdate].collect().maxBy(_.n)
    // amnesia would restart at n=300; the carried state must cover both
    assertBound(first ++ second, fin)
  }
}
