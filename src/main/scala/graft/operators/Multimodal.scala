package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal binary-column plumbing: treat image/audio/video payloads as
  * opaque `binary` columns with typed metadata, processed per-partition in
  * batches — the Scala analogue of a vectorized (mapInPandas-style) decode
  * stage.
  *
  * The decode itself is a STUB (this container has no image/audio codecs):
  * [[decodeStub]] derives deterministic fake dimensions from the payload
  * bytes. Everything around it — the binary schema, the per-partition
  * batch iteration, the typed metadata row shape — is the real plumbing a
  * codec-backed implementation would drop into.
  */
object Multimodal {

  case class MediaMeta(
      doc_id: Long,
      byte_len: Long,
      width: Int,
      height: Int,
      channels: Int,
      format: String)

  /** Deterministic fake decode of a payload header. A real implementation
    * would replace ONLY the body of `decodeOne` with a codec call; the
    * partition-batched iteration (one codec context per partition, streamed
    * rows, no per-row setup cost) is the part that matters at scale. */
  def decodeStub(payloads: Dataset[(Long, Array[Byte])]): Dataset[MediaMeta] = {
    import payloads.sparkSession.implicits._
    payloads.mapPartitions { it =>
      // per-partition "codec" init happens here (once, not per row)
      it.map { case (id, bytes) => decodeOne(id, bytes) }
    }
  }

  private def decodeOne(id: Long, bytes: Array[Byte]): MediaMeta = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < math.min(bytes.length, 64)) { // "header" sniff only
      h ^= bytes(i)
      h *= 0x100000001b3L
      i += 1
    }
    val pos = h & Long.MaxValue
    MediaMeta(
      doc_id = id,
      byte_len = bytes.length.toLong,
      width = (1 + pos % 640).toInt,
      height = (1 + (pos / 640) % 480).toInt,
      channels = 3,
      format = if ((pos & 1) == 0) "rgb8" else "yuv420")
  }

  /** Frame sampling over a binary payload: fixed-stride offsets, one row
    * per frame — the shape of a video frame-extraction stage. Pure
    * expressions (no stub needed: slicing bytes is real work). An empty
    * payload yields ZERO frames: the sequence upper bound would be -1 there
    * and Spark's `sequence(0, -1)` generates the descending [0, -1], so the
    * explode is gated on byte_len > 0. */
  def sampleFrames(df: DataFrame, idCol: String, payloadCol: String,
      stride: Int, maxFrames: Int, frameLen: Int): DataFrame =
    df.select(col(idCol), col(payloadCol),
      octet_length(col(payloadCol)).cast("long").as("byte_len"))
      .withColumn("frame_idx", explode(when(col("byte_len") > 0,
        sequence(lit(0L),
          expr(s"least($maxFrames, (byte_len + ${stride - 1}) div $stride) - 1")))
        .otherwise(expr("array()").cast("array<bigint>"))))
      .withColumn("frame_bytes",
        expr(s"substring($payloadCol, cast(frame_idx * $stride + 1 as int), $frameLen)"))
      .drop(payloadCol)
}
