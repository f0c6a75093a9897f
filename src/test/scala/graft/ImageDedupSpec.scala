package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{ImageDedup, MediaCodecs}

/** Image perceptual-hash dedup pinned against driver-side models: codec
  * round trips, the resize-invariance theorem, and the full pipeline pair
  * set vs a brute-force Hamming model. */
class ImageDedupSpec extends AnyFunSuite {
  import TestSpark._

  // driver-side reference model: hash an image straight from the planted
  // pixel function (no codecs), brute-force all pairs
  private def modelHash(seed: Long, variant: Int): (Long, Long) = {
    val w = (8 * (2 + seed % 3)).toInt
    val h = (8 * (2 + seed % 2)).toInt
    val samples = Array.tabulate(64) { k =>
      val i = k % 8; val j = k / 8
      ImageDedup.grayAt(seed, variant, i * w / 8, j * h / 8)
    }
    val mean = samples.map(_.toLong).sum / 64
    var lo = 0L; var hi = 0L
    for (k <- 0 until 64 if samples(k) > mean)
      if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32)
    (lo, hi)
  }

  private def hamming(a: (Long, Long), b: (Long, Long)): Int =
    java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)

  test("codec round trips reproduce the planted raster for all three formats") {
    for (id <- 0L until 12L) {
      val seed = id / 3
      val expected = (id % 3).toInt match {
        case 2 => // thumbnail: 8x8 sample grid of the base raster
          val (w, h, _) = ImageDedup.syntheticRaster(seed, 0)
          (8, 8, Array.tabulate(8 * 8 * 3) { p =>
            val cell = p / 3; val i = cell % 8; val j = cell / 8
            ImageDedup.grayAt(seed, 0, i * w / 8, j * h / 8).toByte
          })
        case v =>
          ImageDedup.syntheticRaster(seed, v)
      }
      import TestSpark.spark.implicits._
      val Seq((w, h, rgb)) = ImageDedup
        .corpus(Seq(id).toDS()).collect().toSeq
        .map { case (_, _, bytes) => ImageDedup.decodeRaster(bytes).get }
      assert((w, h) === ((expected._1, expected._2)), s"dims for img $id")
      assert(rgb.toSeq === expected._3.toSeq, s"raster for img $id")
    }
  }

  test("aHash is resize-invariant for sample-aligned thumbnails (Hamming 0)") {
    for (seed <- 0L until 30L) {
      val (w, h, rgb) = ImageDedup.syntheticRaster(seed, 0)
      val base = ImageDedup.aHash(w, h, rgb)
      val ppm = MediaCodecs.ppmEncodeRaster(w, h, rgb)
      val small = MediaCodecs.ppmResizeNearest(ppm, 8, 8).get
      val (w2, h2, rgb2) = MediaCodecs.ppmRaster(small).get
      assert(ImageDedup.aHash(w2, h2, rgb2) === base, s"seed $seed")
    }
  }

  test("hash halves are non-negative 32-bit (band math and oracle need this)") {
    for (seed <- 0L until 50L; v <- 0 to 1) {
      val (w, h, rgb) = ImageDedup.syntheticRaster(seed, v)
      val (lo, hi) = ImageDedup.aHash(w, h, rgb)
      assert(lo >= 0L && lo <= 0xffffffffL, s"lo seed=$seed v=$v")
      assert(hi >= 0L && hi <= 0xffffffffL, s"hi seed=$seed v=$v")
    }
  }

  test("pipeline pair set equals the brute-force Hamming<=3 model") {
    import TestSpark.spark.implicits._
    val n = 90L // 30 seed groups
    val got = ImageDedup
      .nearDupPairs(ImageDedup.fingerprints(ImageDedup.corpus((0L until n).toDS())))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val hashes = (0L until n).map { id =>
      id -> modelHash(id / 3, if (id % 3 == 1) 1 else 0)
    }
    val expected = (for {
      (a, ha) <- hashes; (b, hb) <- hashes if a < b
      d = hamming(ha, hb) if d <= 3
    } yield (a, b, d.toLong)).toSet
    assert(got === expected)
    // non-vacuous: Hamming-0 thumbnail pairs AND nonzero perturbed pairs
    assert(expected.exists(_._3 == 0L))
    assert(expected.exists(_._3 > 0L))
  }

  test("incremental probe union equals full recompute for any base/delta split") {
    import TestSpark.spark.implicits._
    import graft.operators.HammingPairs
    val n = 60L
    val fps = ImageDedup.fingerprints(ImageDedup.corpus((0L until n).toDS()))
      .cache()
    val full = ImageDedup.nearDupPairs(fps)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    for (mod <- Seq(2L, 7L, 10L)) {
      val base = fps.where(org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.col("img_id"),
        org.apache.spark.sql.functions.lit(mod)) =!= 0L)
      val delta = fps.where(org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.col("img_id"),
        org.apache.spark.sql.functions.lit(mod)) === 0L)
      val inc = HammingPairs.pairs(base, "img_id")
        .unionByName(HammingPairs.probePairs(base, delta, "img_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(inc === full, s"split mod $mod")
    }
    fps.unpersist()
  }
}
