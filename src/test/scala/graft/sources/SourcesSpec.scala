package graft.sources

import java.nio.file.Files
import graft.core.{GraftDB, GraftOptions, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink coverage (SURVEY §2.5): the reference has only its own
  * WAL/SST/vlog formats; the Spark engine gets parquet/orc/json/csv for
  * free — proven here by round-tripping the engine's tables through each
  * format and by ingesting a CSV source straight into a GraftDB.
  */
class SourcesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def events =
    graft.queries.Catalog.loadEvents(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))

  for (fmt <- Seq("parquet", "orc", "json", "csv")) {
    test(s"$fmt round-trip preserves the events table") {
      val dir = Files.createTempDirectory(s"src-$fmt").toString
      val w = events.write.mode("overwrite")
      (if (fmt == "csv") w.option("header", "true") else w).format(fmt).save(dir)
      val r = spark.read.format(fmt)
      val back = (if (fmt == "csv") r.option("header", "true").schema(events.schema) else r.schema(events.schema))
        .load(dir)
      assert(back.count() == events.count())
      val a = events.orderBy("event_id").collect()
      val b = back.orderBy("event_id").collect()
      assert(a.sameElements(b))
    }
  }

  test("CSV source ingests into GraftDB (scan -> engine write path)") {
    val dir = Files.createTempDirectory("src-csv-kv").toString
    events.select(col("event_id"), col("event_type"))
      .write.mode("overwrite").option("header", "true").csv(dir)
    val csv = spark.read.option("header", "true")
      .schema("event_id LONG, event_type STRING").csv(dir)
    val db = new GraftDB(spark, Files.createTempDirectory("src-db").toString,
      GraftOptions(compactTriggerFiles = 1000))
    db.write(csv.select(
      encode(col("event_id").cast("string"), "UTF-8").as("key"),
      encode(col("event_type"), "UTF-8").as("value")))
    assert(db.view().count() == events.count())
    assert(db.get("42".getBytes("UTF-8")).isDefined)
  }

  test("binaryFile source feeds the multimodal pipeline (raw files -> media table -> decode)") {
    import graft.llmops.Multimodal
    // stage raw "media" files on disk — the shape real image/audio ingest has
    val dir = Files.createTempDirectory("src-bin").toFile
    (0 until 8).foreach { i =>
      val f = new java.io.File(dir, f"img_$i%02d.bin")
      val out = new java.io.FileOutputStream(f)
      try out.write(Array.tabulate[Byte](64 + i * 16)(j => ((i * 31 + j) % 127).toByte))
      finally out.close()
    }
    val raw = spark.read.format("binaryFile").load(dir.toString)
    assert(raw.columns.toSet == Set("path", "modificationTime", "length", "content"))
    // file name -> media_id, content -> payload: the standard ingest mapping
    val media = Multimodal.asMedia(
      raw.select(
        regexp_extract(col("path"), "img_(\\d+)\\.bin$", 1).cast("long").as("media_id"),
        col("content")),
      "media_id", "content", "image")
    val decoded = Multimodal.decodeStub(media)
    assert(decoded.count() == 8)
    val r = decoded.filter(col("media_id") === 3).head()
    assert(r.getStruct(r.fieldIndex("meta")).getAs[Long]("byte_len") == 64 + 3 * 16)
  }
}
