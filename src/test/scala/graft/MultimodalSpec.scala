package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.multimodal.Multimodal

/** Multimodal column plumbing: schema, decode batch shape, frame sampling
  * (SURVEY.md §1.2 — binary payloads + typed metadata). */
class MultimodalSpec extends AnyFunSuite with Matchers with SparkFixture {

  private def media = Multimodal.attachFakePayload(Tables.documents(spark, sfDir))

  test("media column has the declared multimodal schema") {
    val m = media.schema("media").dataType.asInstanceOf[StructType]
    m("payload").dataType shouldBe BinaryType
    m("mime").dataType shouldBe StringType
    val meta = m("meta").dataType.asInstanceOf[StructType]
    meta("width").dataType shouldBe IntegerType
    meta("duration_ms").dataType shouldBe LongType
    media.select("media.mime").distinct().count() shouldBe 3
  }

  test("decodeFeatures yields fixed-width normalized vectors, one per row") {
    val feats = Multimodal.decodeFeatures(media, dim = 16)
    feats.count() shouldBe media.count()
    val row = feats.orderBy("doc_id").head()
    val v = row.getSeq[Float](1)
    v.length shouldBe 16
    v.sum shouldBe 1.0f +- 0.001f  // L1-normalized histogram
    // deterministic: same input → same features
    val again = Multimodal.decodeFeatures(media, dim = 16).orderBy("doc_id").head()
    again.getSeq[Float](1) should equal(v)
  }

  test("resizeStub caps dims and payload while preserving the media struct shape") {
    val resized = Multimodal.resizeStub(media, maxW = 8, maxH = 8)
    resized.schema.catalogString shouldBe media.schema.catalogString
    resized.count() shouldBe media.count()
    resized.select(max("media.meta.width")).head().getInt(0) should be <= 8
    resized.select(max(org.apache.spark.sql.functions.length(col("media.payload"))))
      .head().getInt(0) should be <= 64
  }

  test("sampleFrames explodes each video into n indexed frames") {
    val frames = Multimodal.sampleFrames(media, nFrames = 4)
    val videos = media.where(col("media.mime") === "video/mp4").count()
    frames.count() shouldBe videos * 4
    frames.groupBy("doc_id").count().select(max("count")).head().getLong(0) shouldBe 4
    frames.where(org.apache.spark.sql.functions.length(col("frame_bytes")) === 0)
      .count() shouldBe 0L
  }
}
