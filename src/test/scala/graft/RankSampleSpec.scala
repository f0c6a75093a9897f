package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.expressions.{RankSampleBuffer, RankSampleCodec}

/** The canonical rank sample pinned against a driver-side reference model:
  * state must be a pure function of the (u, v) multiset — the property
  * every merge≡rebuild md5 claim rests on — and the quantile pick must
  * match the reference bottom-k + rank arithmetic exactly. */
class RankSampleSpec extends AnyFunSuite {
  import TestSpark._

  private def build(k: Int, entries: Seq[(Long, Long)], preN: Long = -1L): Array[Byte] = {
    val b = new RankSampleBuffer(k)
    entries.foreach { case (u, v) => b.add(u, v) }
    b.serialize()
  }

  /** Reference model: bottom-k of the multiset sorted by (u, v). */
  private def refKept(k: Int, entries: Seq[(Long, Long)]): Seq[(Long, Long)] =
    entries.sorted.take(k)

  private def refQuantile(k: Int, entries: Seq[(Long, Long)], qPct: Int): Long = {
    val vs = refKept(k, entries).map(_._2).sorted
    vs(((qPct.toLong * vs.length + 99L) / 100L).toInt - 1)
  }

  test("state is a pure function of the multiset: order and partitioning never change bytes") {
    val rnd = new scala.util.Random(47)
    for (trial <- 1 to 60) {
      val k = 1 + rnd.nextInt(40)
      val n = rnd.nextInt(300)
      val entries = Seq.fill(n)((rnd.nextInt(500).toLong, rnd.nextLong() >> rnd.nextInt(40)))
      val direct = build(k, entries)
      assert(build(k, rnd.shuffle(entries)).toSeq === direct.toSeq, s"trial $trial: order")
      // random 3-way partition, buffer-level merge
      val parts = entries.groupBy(_ => rnd.nextInt(3)).values.toSeq
      val m = new RankSampleBuffer(k)
      parts.foreach { p =>
        val pb = new RankSampleBuffer(k)
        p.foreach { case (u, v) => pb.add(u, v) }
        m.addMerge(pb)
      }
      assert(m.serialize().toSeq === direct.toSeq, s"trial $trial: partitioning")
      // decode round-trips the reference kept set and the full count
      val (gotN, us, vs) = RankSampleCodec.decode(direct)
      assert(gotN === n.toLong, s"trial $trial: n")
      assert(us.zip(vs).toSeq === refKept(k, entries), s"trial $trial: kept set")
    }
  }

  test("quantile pick matches the reference model at every percentile") {
    val rnd = new scala.util.Random(53)
    for (trial <- 1 to 30) {
      val k = 8 + rnd.nextInt(64)
      val entries = Seq.fill(50 + rnd.nextInt(400))(
        (rnd.nextLong() >>> 4, rnd.nextInt(100000).toLong))
      val bytes = build(k, entries)
      val (_, _, vs) = RankSampleCodec.decode(bytes)
      val sorted = vs.sorted
      for (q <- Seq(1, 25, 50, 75, 95, 100)) {
        val idx = ((q.toLong * sorted.length + 99L) / 100L).toInt - 1
        assert(sorted(idx) === refQuantile(k, entries, q), s"trial $trial q=$q")
      }
    }
  }

  test("malformed bytes are rejected, never AIOOBE or giant allocation") {
    def bad(bytes: Array[Byte]): Unit =
      intercept[RankSampleCodec.Malformed] { RankSampleCodec.decode(bytes) }
    bad(Array.emptyByteArray)
    bad(Array[Byte](0x80.toByte))                 // truncated n varint
    bad(Array[Byte](5, 5))                        // m=5, zero payload
    bad(Array[Byte](1, 2, 1, 1, 1, 1))            // m > n
    bad(Array[Byte](2, 2, 1, 1, 1))               // truncated entry list
    bad(Array[Byte](1, 1, 1, 2, 9))               // trailing bytes
    bad(Array.fill[Byte](10)(0xff.toByte) :+ 1.toByte) // varint overflow
    // valid empty sketch round-trips
    val (n, us, _) = RankSampleCodec.decode(build(4, Nil))
    assert(n === 0L && us.isEmpty)
  }

  test("DataFrame lifecycle: partitioned sketches union-merge to the direct bytes") {
    import TestSpark.spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.expressions.RankSample
    val rnd = new scala.util.Random(59)
    val rows = Seq.tabulate(8000)(i =>
      (s"g${i % 3}", (i % 11).toLong, rnd.nextLong() >>> 8, rnd.nextInt(1000000).toLong))
    val df = rows.toDF("g", "part", "u", "v")
    val k = 64
    val partial = df.groupBy("g", "part").agg(RankSample.sketch(col("u"), col("v"), k).as("sk"))
    val merged = partial.groupBy("g").agg(RankSample.merge(col("sk"), k).as("sk_m"))
    val direct = df.groupBy("g").agg(RankSample.sketch(col("u"), col("v"), k).as("sk_d"))
    val out = merged.join(direct, "g")
      .select(col("g"), (md5(col("sk_m")) === md5(col("sk_d"))).as("lossless"),
        RankSample.count(col("sk_m")).as("n"),
        RankSample.quantile(col("sk_m"), 50).as("p50"))
      .collect()
    assert(out.length === 3)
    val byG = rows.groupBy(_._1)
    out.foreach { r =>
      val g = r.getString(0)
      assert(r.getBoolean(1), s"merge not lossless for $g")
      assert(r.getLong(2) === byG(g).size.toLong)
      assert(r.getLong(3) === refQuantile(k, byG(g).map(t => (t._3, t._4)), 50))
    }
  }
}
