package graft.streaming

import java.nio.file.Files
import graft.core.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** heavyHittersStream — the streaming Misra–Gries dual: the running
  * summary's guarantees (no overcount, err upper bound, heavy-item
  * containment) hold at every emission for any delivery order, the
  * exact regime reproduces counts, and the counters survive restarts.
  */
class HeavyHittersStreamSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("running summary keeps the MG guarantees under shuffled multi-batch delivery") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val rnd = new scala.util.Random(92L)
    // Zipf-ish items on one key
    val universe = (0 until 150).map(i => s"w$i")
    val weights = universe.indices.map(i => 1.0 / (i + 1))
    val cum = weights.scanLeft(0.0)(_ + _).tail
    val items = Seq.fill(8000) {
      val x = rnd.nextDouble() * cum.last
      universe(cum.indexWhere(x <= _))
    }
    val exact = items.groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    val k = 12
    val input = MemoryStream[(Long, String)]
    val q = EventStream.heavyHittersStream(
        input.toDF().toDF("key", "item"), k)
      .writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("hh_stream").start()
    try {
      val shuffled = rnd.shuffle(items).map((1L, _))
      val (b1, rest) = shuffled.splitAt(3000)
      val (b2, b3) = rest.splitAt(3000)
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      input.addData(b3: _*); q.processAllAvailable()
      // Update mode: the LAST emission carries the final summary
      val fin = spark.table("hh_stream").as[HHUpdate].collect()
        .filter(_.key == 1L).maxBy(_.n)
      assert(fin.n == items.size.toLong)
      assert(fin.items.size <= k)
      for ((w, e) <- fin.items) {
        val t = exact.getOrElse(w, 0L)
        assert(e <= t, s"overcount on $w: $e > $t")
        assert(t <= e + fin.err, s"$w true $t above est $e + err ${fin.err}")
      }
      val threshold = fin.n.toDouble / (k + 1)
      for ((w, t) <- exact if t > threshold)
        assert(fin.items.exists(_._1 == w), s"heavy item $w (true $t) missing")
    } finally q.stop()
  }

  test("exact regime: distinct <= k reproduces counts; per-key independence") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String)]
    val q = EventStream.heavyHittersStream(
        input.toDF().toDF("key", "item"), 4)
      .writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("hh_exact").start()
    try {
      input.addData(Seq.fill(6)((1L, "a")) ++ Seq((1L, "b"), (2L, "z")): _*)
      q.processAllAvailable()
      input.addData((1L, "b"), (2L, "z")); q.processAllAvailable()
      val fin = spark.table("hh_exact").as[HHUpdate].collect()
        .groupBy(_.key).map { case (kk, us) => kk -> us.maxBy(_.n) }
      assert(fin(1L).items == Seq(("a", 6L), ("b", 2L)) && fin(1L).err == 0)
      assert(fin(2L).items == Seq(("z", 2L)) && fin(2L).n == 2L)
    } finally q.stop()
  }

  test("counters survive a checkpoint restart") {
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    val inDir = Files.createTempDirectory("hh-restart-in").toString
    val outDir = Files.createTempDirectory("hh-restart-out").toString
    val ckDir = Files.createTempDirectory("hh-restart-ck").toString
    val schema = Seq((0L, "")).toDF("key", "item").schema
    def push(rows: (Long, String)*): Unit =
      rows.toSeq.toDF("key", "item").repartition(1)
        .write.mode("append").parquet(inDir)
    def start() = {
      val src = spark.readStream.schema(schema).parquet(inDir)
      EventStream.heavyHittersStream(src, 4)
        .writeStream.outputMode(OutputMode.Update)
        .option("checkpointLocation", ckDir)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[HHUpdate], _: Long) =>
          b.write.mode("append").parquet(outDir): Unit
        }.start()
    }
    push(Seq.fill(5)((1L, "x")) ++ Seq((1L, "y")): _*)
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    push((1L, "x"), (1L, "y"))
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    val fin = spark.read.parquet(outDir).as[HHUpdate].collect().maxBy(_.n)
    // amnesia would restart at n=2 with counts x=1, y=1
    assert(fin.n == 8L && fin.items == Seq(("x", 6L), ("y", 2L)),
      s"restart lost the counters: $fin")
  }
}
