package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.expressions.{BitmapBuffer, BitmapCodec}

/** Exact bitmap aggregate pinned against driver-side Set models: codec
  * round trips, canonical-form invariance (order and partitioning), and
  * the DataFrame lifecycle vs count(DISTINCT). */
class BitmapSpec extends AnyFunSuite {
  import TestSpark._

  private def build(vs: Seq[Long]): Array[Byte] = {
    val b = new BitmapBuffer
    vs.foreach(b.add)
    b.serialize()
  }

  test("codec round-trips arbitrary long sets including negatives and empty") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 100) {
      val vs = Seq.fill(rnd.nextInt(200))(rnd.nextLong() >> rnd.nextInt(40))
      val bytes = build(vs)
      assert(BitmapCodec.decode(bytes).toSeq === vs.distinct.sorted, s"trial $trial")
      assert(BitmapCodec.cardinality(bytes) === vs.distinct.size.toLong)
    }
    assert(BitmapCodec.decode(build(Nil)).isEmpty)
    assert(BitmapCodec.cardinality(build(Nil)) === 0L)
  }

  test("wire form is canonical: insertion order and partitioning never change bytes") {
    val rnd = new scala.util.Random(13)
    for (_ <- 1 to 50) {
      val vs = Seq.fill(1 + rnd.nextInt(300))(rnd.nextInt(500).toLong)
      val direct = build(vs)
      assert(build(rnd.shuffle(vs)).toSeq === direct.toSeq)
      // partitioned build + merge == direct build
      val (l, r) = vs.splitAt(rnd.nextInt(vs.size + 1))
      val m = new BitmapBuffer
      BitmapCodec.decode(build(l)).foreach(m.add)
      BitmapCodec.decode(build(r)).foreach(m.add)
      assert(m.serialize().toSeq === direct.toSeq)
    }
  }

  test("andCount matches the Set-intersection model") {
    val rnd = new scala.util.Random(17)
    for (_ <- 1 to 50) {
      val a = Seq.fill(rnd.nextInt(200))(rnd.nextInt(300).toLong)
      val b = Seq.fill(rnd.nextInt(200))(rnd.nextInt(300).toLong)
      assert(BitmapCodec.andCount(build(a), build(b)) ===
        (a.toSet intersect b.toSet).size.toLong)
    }
  }

  test("malformed bytes are rejected with Malformed, never AIOOBE or giant allocation") {
    def mustFail(bytes: Array[Byte], what: String): Unit = {
      intercept[BitmapCodec.Malformed] { BitmapCodec.decode(bytes) }
      what match {
        case "count" => intercept[BitmapCodec.Malformed] { BitmapCodec.cardinality(bytes) }
        case _ => ()
      }
    }
    mustFail(Array.emptyByteArray, "count")                       // empty input
    mustFail(Array[Byte](0x80.toByte), "count")                   // truncated count varint
    mustFail(Array[Byte](5), "count")                             // count 5, zero payload bytes
    // count varint claiming ~2^60 values: must fail the payload bound, not allocate
    mustFail(Array[Byte](0x80.toByte, 0x80.toByte, 0x80.toByte, 0x80.toByte,
      0x80.toByte, 0x80.toByte, 0x80.toByte, 0x80.toByte, 0x10, 1, 1, 1), "count")
    // 10-byte varint with high bits set past 64 → overflow rejection
    mustFail(Array.fill[Byte](10)(0xff.toByte) :+ 1.toByte, "count")
    mustFail(Array[Byte](1, 2, 7), "decode")                      // trailing bytes
    mustFail(Array[Byte](2, 2, 0), "decode")                      // zero delta (non-canonical)
    mustFail(Array[Byte](2, 2), "decode")                         // truncated value list
    // valid bytes still decode after all that
    assert(BitmapCodec.decode(build(Seq(1L, 5L, 5L))).toSeq === Seq(1L, 5L))
  }

  test("SQL kernels return NULL on malformed binary and cast INT input to long") {
    import TestSpark.spark.implicits._
    val df = Seq((1, Array[Byte](0x80.toByte)), (2, Array[Byte](5))).toDF("id", "b")
    df.createOrReplaceTempView("badbm")
    val out = TestSpark.spark.sql(
      "SELECT graft_bitmap_count(b) AS c, graft_bitmap_and_count(b, b) AS ac FROM badbm")
      .collect()
    out.foreach { r => assert(r.isNullAt(0) && r.isNullAt(1)) }
    // graft_bitmap over an INT column: implicit cast, no ClassCastException
    val bm = TestSpark.spark.sql(
      "SELECT graft_bitmap_count(graft_bitmap(id)) AS n FROM badbm").collect()
    assert(bm.head.getLong(0) === 2L)
  }

  test("DataFrame lifecycle: daily bitmaps union-merge losslessly, counts exact") {
    import TestSpark.spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.expressions.Bitmap
    val rnd = new scala.util.Random(19)
    val rows = Seq.tabulate(5000)(i =>
      (s"t${i % 3}", (i % 7).toLong, rnd.nextInt(400).toLong))
    val df = rows.toDF("k", "day", "uid")
    val daily = df.groupBy("k", "day").agg(Bitmap.sketch(col("uid")).as("bm"))
    val merged = daily.groupBy("k").agg(Bitmap.merge(col("bm")).as("bm_m"))
    val direct = df.groupBy("k").agg(Bitmap.sketch(col("uid")).as("bm_d"),
      countDistinct(col("uid")).as("n"))
    val out = merged.join(direct, Seq("k"))
      .select(col("k"), Bitmap.count(col("bm_m")).as("nb"), col("n"),
        (md5(col("bm_m")) === md5(col("bm_d"))).as("lossless"))
      .collect()
    assert(out.length === 3)
    out.foreach { r =>
      assert(r.getBoolean(3), s"merge not lossless for ${r.getString(0)}")
      assert(r.getLong(1) === r.getLong(2), s"count mismatch for ${r.getString(0)}")
    }
  }
}
