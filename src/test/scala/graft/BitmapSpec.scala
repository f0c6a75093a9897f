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
