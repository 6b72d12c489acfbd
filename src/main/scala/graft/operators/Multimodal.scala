package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `BinaryType` columns plus typed metadata, processed without ever
  * materializing a payload on the driver.
  *
  * The actual codecs (JPEG decode, resampling, video demux) are NOT
  * available in this environment, so the pixel/sample-level step is a
  * clearly-marked deterministic STUB (`fakeDecodeMeta`) — everything
  * Spark-side is real and is the part that matters at 100 TB: the
  * schema contract, bytewise chunking/frame sampling as codegen'd
  * expressions, metadata extraction, and the rule that payload bytes
  * flow executor-to-executor only (filters/projections on metadata
  * push down BEFORE payload-touching stages, so pruned files are never
  * decoded).
  */
object Multimodal {

  /** Byte length of a payload. */
  def payloadBytes(media: Column): Column = length(media).cast("long")

  /** STUB decode: deterministic fake (width, height, channels) derived
    * from the payload's md5 — stands in for a real codec while keeping
    * every downstream contract (struct schema, null for empty payloads)
    * real. Replace the three hash-derived fields with a codec call at
    * deployment; the signature is the contract. */
  def fakeDecodeMeta(media: Column): Column = {
    def hx(from: Int, len: Int, mod: Int, base: Int): Column =
      (conv(substring(md5(media), from, len), 16, 10).cast("long")
        % mod + base).cast("int")
    when(length(media) > 0, struct(
      hx(1, 4, 1920, 16).as("width"),
      hx(5, 4, 1080, 16).as("height"),
      hx(9, 1, 3, 1).as("channels")))
  }

  /** Aspect-preserving resize target for a bounded long side — pure
    * metadata math (the real resize kernel would consume it). */
  def resizeDims(width: Column, height: Column, maxSide: Int): Column = {
    val long = greatest(width, height).cast("double")
    val scale = when(long > maxSide, lit(maxSide) / long).otherwise(lit(1.0))
    struct(floor(width * scale).cast("int").as("width"),
      floor(height * scale).cast("int").as("height"))
  }

  /** Frame sampling: treat the payload as fixed-size frames of
    * `frameBytes`, keep every `stride`-th frame as its own binary —
    * a codegen'd expression (sequence + transform + bytewise substring),
    * no UDF, no driver involvement. */
  def sampleFrames(media: Column, frameBytes: Int, stride: Int): Column = {
    val nFrames = ceil(length(media).cast("double") / frameBytes).cast("int")
    when(length(media) > 0,
      transform(sequence(lit(0), nFrames - 1, lit(stride)),
        i => substring(media, i * frameBytes + 1, lit(frameBytes))))
      .otherwise(array().cast("array<binary>"))
  }

  /** Number of frames kept by [[sampleFrames]] without materializing
    * them (metadata-only planning). */
  def sampledFrameCount(media: Column, frameBytes: Int, stride: Int): Column = {
    val nFrames = ceil(length(media).cast("double") / frameBytes).cast("int")
    when(nFrames > 0, floor((nFrames - 1).cast("double") / stride).cast("int") + 1)
      .otherwise(lit(0))
  }

  /** Metadata extraction over a media table: one row per document with
    * payload size, frame plan, and stub-decoded dimensions. The only
    * stage that touches payload bytes; everything downstream can run
    * on the (tiny) metadata projection. */
  def mediaMeta(df: DataFrame, idCol: String, mediaCol: String,
      frameBytes: Int = 1024, stride: Int = 4): DataFrame = {
    val media = col(mediaCol)
    df.select(col(idCol),
      payloadBytes(media).as("n_bytes"),
      ceil(length(media).cast("double") / frameBytes).cast("int").as("n_frames"),
      sampledFrameCount(media, frameBytes, stride).as("n_sampled"),
      fakeDecodeMeta(media).getField("width").as("width"),
      fakeDecodeMeta(media).getField("height").as("height"))
  }
}
