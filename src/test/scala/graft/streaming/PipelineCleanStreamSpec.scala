package graft.streaming

import graft.core.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** pipelineCleanStream — the streaming ingest twin of pipeline_e2e's
  * corpus-producing stages (clean -> audit gate -> exact dedup -> mix):
  * single-batch delivery must reproduce the batch pipeline exactly
  * (within-batch dedup winner = min doc_id, the batch rule); across
  * batches re-arrivals of an already-emitted cleaned document drop.
  */
class PipelineCleanStreamSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // a corpus where every stage has work: docs with line-ified text, some
  // below the kept-line floor, exact duplicates (same token stream), and
  // enough rows per lang for fractional mix rates
  private def mkRows(ids: Seq[Long]): Seq[(Long, String, String, String)] =
    ids.map { i =>
      val lang = Seq("en", "de", "fr")((i % 3).toInt)
      val nLines = if (i % 7 == 0) 2 else 12 // i%7==0 fails the floor
      // i%5==0 duplicates the content of doc (i-ish) -> exact-dup groups
      val seedTok = if (i % 5 == 0) "dup" else s"w$i"
      val line = s"$seedTok alpha beta gamma delta."
      (i, lang, s"src${(i % 2).toInt}", Seq.fill(nLines)(line).mkString("\n"))
    }

  private def batchPipeline(
      rows: Seq[(Long, String, String, String)],
      rates: Seq[(Option[String], Double)]) = {
    val df = rows.toDF("doc_id", "lang", "source", "text")
    val cleaned = graft.functions.Text.withC4LineClean(df, col("text"))
    val gated = graft.functions.Text.withScriptProfile(
        graft.functions.Text.withEncodingQuality(cleaned, col("clean_text")),
        col("clean_text"))
      .filter(col("n_kept") >= 8 && col("enc_score") >= 0.9 &&
        col("script_pred") === "latin")
      .select("doc_id", "lang", "source", "clean_text")
    val deduped = graft.llmops.Dedup.exactSurvivors(gated,
      textCol = "clean_text")
    graft.llmops.Curation.applyStratumRates(deduped, "lang", rates)
      .select("doc_id").collect().map(_.getLong(0)).toSet
  }

  test("single-batch delivery reproduces the batch clean->gate->dedup->mix pipeline exactly") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = mkRows(1L to 120L)
    val rates = graft.llmops.Curation.temperatureRates(
      rows.toDF("doc_id", "lang", "source", "text"), "lang", budget = 40L)
    val input = MemoryStream[(Long, String, String, String)]
    val q = EventStream.pipelineCleanStream(
        input.toDF().toDF("doc_id", "lang", "source", "text"), rates)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("e2e_stream").start()
    try {
      input.addData(rows: _*); q.processAllAvailable()
      val got = spark.table("e2e_stream").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      val exp = batchPipeline(rows, rates)
      assert(got == exp && got.nonEmpty,
        s"stream pipeline diverged from batch: ${got.size} vs ${exp.size}")
      // the stages all did real work: floor-failed docs and duplicate
      // content are gone, the mix dropped a real fraction
      assert(!got.exists(_ % 7 == 0), "kept-line floor not applied")
      val dupSurvivors = got.filter(_ % 5 == 0)
      assert(dupSurvivors.size <= 1,
        s"exact dedup kept ${dupSurvivors.size} copies of the dup content")
      assert(got.size < rows.count(i => i._1 % 7 != 0),
        "the mix filter dropped nothing")
    } finally q.stop()
  }

  test("across micro-batches a re-arrival of already-emitted cleaned content drops (keep-first)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // keep-everything rates so only dedup decides survival
    val rates: Seq[(Option[String], Double)] =
      Seq((Option("en"), 1.0), (Option("de"), 1.0), (Option("fr"), 1.0))
    val line = "alpha beta gamma delta epsilon."
    def doc(i: Long) = (i, "en", "src0", Seq.fill(12)(line).mkString("\n"))
    val input = MemoryStream[(Long, String, String, String)]
    val q = EventStream.pipelineCleanStream(
        input.toDF().toDF("doc_id", "lang", "source", "text"), rates)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("e2e_stream_kf").start()
    try {
      input.addData(doc(5L)); q.processAllAvailable()
      input.addData(doc(1L), doc(9L)); q.processAllAvailable()
      val got = spark.table("e2e_stream_kf").select("doc_id")
        .collect().map(_.getLong(0)).toSeq
      // batch 1 emitted doc 5; batch 2's SAME cleaned content (docs 1
      // and 9) is a duplicate of already-emitted history and drops —
      // arrival order wins across batches, min doc_id within one
      assert(got == Seq(5L), s"keep-first across batches violated: $got")
    } finally q.stop()
  }
}
