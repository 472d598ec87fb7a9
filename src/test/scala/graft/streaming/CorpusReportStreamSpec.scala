package graft.streaming

import graft.core.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** corpusReportStream — the streaming dual of the batch per-source corpus
  * health dashboard: because every folded value is an INTEGER sum, the
  * stream's final state must equal the batch GROUP BY exactly under any
  * batching/arrival order, NULL text and NULL source included.
  */
class CorpusReportStreamSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("final per-source state equals the batch corpusReport exactly under shuffled multi-batch delivery") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rnd = new scala.util.Random(61L)
    val words = Seq("the", "cat", "def", "return", "table", "scan")
    val rows: Seq[(Long, Option[String], Option[String])] =
      (1L to 400L).map { i =>
        val src = if (i % 37 == 0) Option.empty[String]
          else Some(s"src${(i % 4).toInt}")
        val text =
          if (i % 53 == 0) Option.empty[String] // NULL text: zero-length doc
          else Some(Seq.fill(3 + rnd.nextInt(20))(
            words(rnd.nextInt(words.length))).mkString(" ") +
            (if (i % 11 == 0) " bro\uFFFDken" else "") +
            (if (i % 13 == 0) "\u0007" else ""))
        (i, src, text)
      }
    val batch = rows.toDF("doc_id", "source", "text")
    val input = MemoryStream[(Long, Option[String], Option[String])]
    val q = EventStream.corpusReportStream(
        input.toDF().toDF("doc_id", "source", "text"))
      .writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("cr_stream").start()
    try {
      val shuffled = rnd.shuffle(rows)
      val (b1, rest) = shuffled.splitAt(150)
      val (b2, b3) = rest.splitAt(150)
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      input.addData(b3: _*); q.processAllAvailable()
      // Update mode: the last emission per source carries the final sums
      val fin = spark.table("cr_stream").as[CRUpdate].collect()
        .groupBy(_.source).map { case (_, ups) => ups.maxBy(_.n_docs) }
        .map(u => u.source ->
          ((u.n_docs, u.n_tokens, u.n_chars, u.n_code_docs, u.n_repl_chars,
            u.n_ctrl_chars, u.n_latin_docs, u.avg_tokens, u.avg_chars,
            u.latin_share)))
        .toMap
      val exp = graft.llmops.Curation.corpusReport(batch).collect()
        .map(r => Option(r.getString(0)) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
            r.getLong(5), r.getLong(6), r.getLong(7), r.getDouble(8),
            r.getDouble(9), r.getDouble(10))))
        .toMap
      assert(fin.keySet == exp.keySet,
        s"source groups diverge: ${fin.keySet} vs ${exp.keySet}")
      assert(fin.contains(None), "NULL source must be a group of its own")
      for ((src, e) <- exp)
        assert(fin(src) == e, s"source $src: stream ${fin(src)} vs batch $e")
      // the damage rows actually exercised the repl/ctrl counters
      assert(exp.values.exists(_._5 > 0L) && exp.values.exists(_._6 > 0L),
        "test corpus must carry real U+FFFD and control-char damage")
    } finally q.stop()
  }
}
