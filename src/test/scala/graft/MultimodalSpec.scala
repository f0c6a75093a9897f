package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.sources.Tables

class MultimodalSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("decode stub: partition-batched decode yields one typed row per payload") {
    val payloads = Tables.documents(spark, Sf)
      .select(col("doc_id"), col("text").cast("binary"))
      .as[(Long, Array[Byte])]
    val metas = Multimodal.decodeStub(payloads)
    assert(metas.count() === payloads.count())
    val m = metas.head()
    assert(m.width >= 1 && m.width <= 640 && m.height >= 1 && m.height <= 480)
    // deterministic: same input -> same fake decode
    val twice = Multimodal.decodeStub(payloads).head()
    assert(twice === m)
  }

  test("frame sampling emits bounded per-doc frames with real byte slices") {
    val df = Tables.documents(spark, Sf)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val frames = Multimodal.sampleFrames(df, "doc_id", "payload",
      stride = 100, maxFrames = 4, frameLen = 32)
    val per = frames.groupBy("doc_id").count()
    assert(per.agg(max("count")).head().getLong(0) <= 4)
    assert(frames.where(octet_length(col("frame_bytes")) > 32).count() === 0)
  }

  test("frame sampling of an empty payload emits zero frames, not [0,-1]") {
    val df = Seq((1L, Array.emptyByteArray), (2L, "0123456789" * 25 getBytes "UTF-8"))
      .toDF("doc_id", "payload")
    val frames = Multimodal.sampleFrames(df, "doc_id", "payload",
      stride = 100, maxFrames = 4, frameLen = 32)
    assert(frames.where(col("doc_id") === 1L).count() === 0)
    assert(frames.where(col("doc_id") === 2L).count() === 3) // ceil(250/100)
    assert(frames.where(col("frame_idx") < 0).count() === 0)
  }
}
