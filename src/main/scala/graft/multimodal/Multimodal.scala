package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column model (SURVEY.md §1.2, §2.10): media travel as opaque
  * `binary` payloads with a typed metadata struct — the schema pattern
  * that scales to 100 TB of mixed text/image/audio because Spark never
  * interprets the bytes until an explicit decode stage, and the decode
  * stage is a `mapPartitions` pipeline (one JVM-side batch iterator per
  * partition, no per-row task overhead, partitioning preserved) — the
  * Scala-native equivalent of PySpark's `mapInPandas` batch-UDF shape:
  * same per-partition batch iteration contract, without the Arrow
  * serialization hop a Python worker would add.
  *
  * The byte-level decoders (JPEG/WAV/MP4) are STUBBED deterministically —
  * this container ships no codec libraries. Everything Spark-owned is
  * real and tested (MultimodalSpec): the schema, the typed Dataset hop,
  * the per-partition batch iteration, the frame-sampling explode.
  */
object Multimodal {

  /** media column: (payload: binary, mime: string,
    * meta: struct(width int, height int, duration_ms bigint)). */
  def attachFakePayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      struct(
        col("text").cast("binary").as("payload"),
        element_at(lit(Array("image/png", "audio/wav", "video/mp4")),
          (col("doc_id") % 3 + 1).cast("int")).as("mime"),
        struct(
          (col("n_chars") % 640).cast("int").as("width"),
          (col("n_chars") % 480).cast("int").as("height"),
          (col("n_chars") * 33L).as("duration_ms")).as("meta")).as("media"))

  /** STUB for a real image/audio feature extractor: a deterministic
    * byte-histogram folded to `dim` floats, L1-normalized. Replace with a
    * codec call (e.g. JavaCV / TwelveMonkeys) in a real deployment — the
    * mapPartitions plumbing around it is the part that matters here. */
  private[multimodal] def stubDecode(bytes: Array[Byte], dim: Int): Array[Float] = {
    val hist = new Array[Float](dim)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xff) % dim) += 1f; i += 1 }
    val total = math.max(1f, bytes.length.toFloat)
    hist.map(_ / total)
  }

  /** Decode stage: media rows → fixed-width float features, one batch
    * iterator per partition. */
  def decodeFeatures(media: DataFrame, dim: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val decoded: Dataset[(Long, Array[Float])] = media
      .select(col("doc_id"), col("media.payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => (id, stubDecode(bytes, dim)) })
    decoded.toDF("doc_id", "features")
  }

  /** Resize stage (image path): STUB for a real scaler — deterministically
    * subsamples the payload to the target pixel budget and rewrites the
    * metadata dims, preserving the media struct shape so downstream
    * stages are oblivious. The Spark-side contract (struct in, same
    * struct out, row-for-row) is the real part. */
  def resizeStub(media: DataFrame, maxW: Int = 64, maxH: Int = 64): DataFrame =
    media.select(col("doc_id"),
      struct(
        expr(s"substring(media.payload, 1, greatest(least(length(media.payload), $maxW * $maxH), 1))")
          .as("payload"),
        col("media.mime").as("mime"),
        struct(
          least(col("media.meta.width"), lit(maxW)).as("width"),
          least(col("media.meta.height"), lit(maxH)).as("height"),
          col("media.meta.duration_ms").as("duration_ms")).as("meta")).as("media"))

  /** Frame-sampling stage (video path): slice the payload into n equal
    * chunks — the Spark shape of frame extraction (explode to one row per
    * frame, frame index carried alongside). */
  def sampleFrames(media: DataFrame, nFrames: Int = 4): DataFrame =
    media
      .where(col("media.mime") === "video/mp4")
      .select(col("doc_id"), col("media.payload").as("payload"),
              explode(expr(s"sequence(0, ${nFrames - 1})")).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        expr(s"substring(payload, frame_idx * (length(payload) div $nFrames) + 1, " +
             s"greatest(length(payload) div $nFrames, 1))").as("frame_bytes"))
}
