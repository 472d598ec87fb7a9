package graft.llmops

import graft.core.TestSpark
import graft.llmops.{Multimodal, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def docsMedia = {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    Multimodal.asMedia(
      docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload")),
      "doc_id", "payload", "image")
  }

  test("decodeStub fills the typed metadata struct per partition batch") {
    val decoded = Multimodal.decodeStub(docsMedia)
    assert(decoded.schema.fieldNames.toSeq ==
      Seq("media_id", "modality", "payload", "meta"))
    val r = decoded.filter(col("media_id") === 0).head()
    val meta = r.getStruct(r.fieldIndex("meta"))
    assert(meta.getAs[Long]("byte_len") > 0)
    assert(meta.getAs[Int]("width") >= 16 && meta.getAs[Int]("height") >= 16)
    assert(decoded.count() == 500)
  }

  test("featurizeStub -> ANN top-k: multimodal similarity plumbing end-to-end") {
    val emb = Multimodal.featurizeStub(docsMedia, dim = 16)
      .withColumnRenamed("media_id", "vec_id")
    assert(emb.head().getSeq[Float](1).length == 16)
    val topk = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 3), k = 4)
    val got = topk.collect()
    assert(got.length == 3 * 4)
    assert(got.forall(r => r.getAs[Long]("query_id") != r.getAs[Long]("neighbor_id")))
  }

  test("resizeStub: evenly-sampled payload at target dims, composes into featurize") {
    val resized = Multimodal.resizeStub(Multimodal.decodeStub(docsMedia), 8, 8)
    val r = resized.filter(col("media_id") === 0).head()
    val payload = r.getAs[Array[Byte]]("payload")
    val meta = r.getStruct(r.fieldIndex("meta"))
    assert(meta.getAs[Int]("width") == 8 && meta.getAs[Int]("height") == 8)
    assert(meta.getAs[Long]("byte_len") == payload.length)
    assert(payload.length <= 64)
    // deterministic: same input, same sampled bytes
    val again = Multimodal.resizeStub(Multimodal.decodeStub(docsMedia), 8, 8)
      .filter(col("media_id") === 0).head().getAs[Array[Byte]]("payload")
    assert(java.util.Arrays.equals(payload, again))
    // order-preserving even sampling: first byte is the original first byte
    val orig = docsMedia.filter(col("media_id") === 0).head().getAs[Array[Byte]]("payload")
    assert(payload.head == orig.head)
    // the resized table still feeds the featurize -> ANN path
    val emb = Multimodal.featurizeStub(resized, dim = 8)
    assert(emb.head().getSeq[Float](1).length == 8)
  }

  test("sampleFrames emits n deterministic offsets per media") {
    val frames = Multimodal.sampleFrames(docsMedia, 4)
    assert(frames.filter(col("media_id") === 1).count() == 4)
    val offs = frames.filter(col("media_id") === 1).orderBy("frame_idx")
      .select("byte_offset").collect().map(_.getLong(0)).toSeq
    assert(offs == offs.sorted && offs.head == 0L)
  }
}
