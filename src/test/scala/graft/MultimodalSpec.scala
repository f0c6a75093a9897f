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
}
