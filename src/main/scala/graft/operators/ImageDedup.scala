package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Perceptual-hash image near-dedup: the multimodal sibling of the text
  * dedup tier (reference anchor: the brief's multimodal columns +
  * dedup families; no reader-side equivalent — reader moves media as
  * opaque bytes).
  *
  * Pipeline: stored mixed-format corpus (PPM / QOI / PNG payloads) →
  * magic-byte raster decode in mapPartitions (one codec dispatch per
  * partition, the [[MediaCodecs.decodeMedia]] shape) → 64-bit average
  * hash (aHash: 8×8 nearest-neighbor thumbnail, bit = pixel > mean) →
  * Hamming-banded candidate join (4 × 16-bit bands; pigeonhole: any pair
  * at Hamming ≤ 3 agrees on ≥ 1 band exactly, so banding is LOSSLESS for
  * the ≤ 3 threshold) → exact Hamming verification in buckets.
  *
  * Scale shape at 100 TB: payload bytes never shuffle — each partition
  * reduces its images to 16 bytes of hash; the band table is (id,
  * band_id, band_val) longs; every join is a keyed shuffle (the SimHash
  * band machinery applied to pixels). The 64-bit hash is stored as two
  * non-negative 32-bit halves (h_lo, h_hi) so band extraction and the
  * SQL oracle avoid sign arithmetic on bit 63.
  *
  * The hash is resize-invariant BY CONSTRUCTION for sample-aligned
  * scales: aHash samples the source at floor(i·w/8); a nearest-neighbor
  * thumbnail of a multiple-of-8 image samples the SAME source pixels, so
  * base and thumbnail hash Hamming-0 (pinned in ImageDedupSpec).
  */
object ImageDedup {

  /** 60-bit md5-derived seed hash — the repo's hash60 oracle convention
    * (`('0x' || substr(md5(seed), 1, 15))::BIGINT` in DuckDB). Small
    * modular coefficients straight off the seed were measured to CYCLE
    * (period lcm(7,11,5,256)): at sf10's millions of seeds every image
    * recurs ~17×, exact-dup cliques grow with the corpus, and the pair
    * output itself goes quadratic. md5 coefficients decorrelate seeds
    * permanently — the same reason GenScale ciphers text across copies. */
  def seedHash(seed: Long): Long = seedHashStr(seed.toString)

  /** String form of the hash60 convention, for compound keys like the
    * audio lane's per-(seed, window) envelope. */
  def seedHashStr(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("US-ASCII"))
      .map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Synthetic per-seed raster with SQL-replayable pixel arithmetic (the
    * QOI/PNG oracle convention): gray(x,y) = (ax·x + by·y + c·x·y + d)
    * mod 256 with md5-derived per-seed coefficients, r = g = b. Variant 1
    * adds a planted perturbation (+24 clamped at 255 wherever
    * (x+y) % 13 = 0) so near-miss pairs exercise nonzero Hamming
    * distances. */
  def syntheticRaster(seed: Long, variant: Int): (Int, Int, Array[Byte]) = {
    val w = (8 * (2 + seed % 3)).toInt
    val h = (8 * (2 + seed % 2)).toInt
    val h60 = seedHash(seed)
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = grayAtH(h60, variant, x, y)
        val p = (y * w + x) * 3
        rgb(p) = g.toByte; rgb(p + 1) = g.toByte; rgb(p + 2) = g.toByte
        x += 1
      }
      y += 1
    }
    (w, h, rgb)
  }

  /** The planted pixel function — kept in one place so the Spark corpus,
    * the driver-side spec model, and the DuckDB oracle stay in lockstep. */
  def grayAt(seed: Long, variant: Int, x: Int, y: Int): Int =
    grayAtH(seedHash(seed), variant, x, y)

  private def grayAtH(h60: Long, variant: Int, x: Int, y: Int): Int = {
    val base = (((1 + h60 % 127) * x + (1 + (h60 / 127) % 131) * y +
      ((h60 / 16637) % 61) * x * y + h60 % 256) % 256).toInt
    if (variant == 1 && (x + y) % 13 == 0) math.min(255, base + 24) else base
  }

  /** Mixed-format stored corpus: img_id = doc id, seed = id/3 groups each
    * base image (variant 0, PPM) with a perturbed twin (variant 1, QOI)
    * and an 8×8 thumbnail (variant 2, PNG — resized through the REAL
    * [[MediaCodecs.ppmResizeNearest]] path, not re-synthesized). */
  def corpus(ids: Dataset[Long]): Dataset[(Long, String, Array[Byte])] = {
    import ids.sparkSession.implicits._
    ids.mapPartitions(_.map { id =>
      val seed = id / 3
      (id % 3).toInt match {
        case 0 =>
          val (w, h, rgb) = syntheticRaster(seed, 0)
          (id, "ppm", MediaCodecs.ppmEncodeRaster(w, h, rgb))
        case 1 =>
          val (w, h, rgb) = syntheticRaster(seed, 1)
          (id, "qoi", MediaCodecs.qoiEncode(w, h, rgb))
        case _ =>
          val (w, h, rgb) = syntheticRaster(seed, 0)
          val ppm = MediaCodecs.ppmEncodeRaster(w, h, rgb)
          val small = MediaCodecs.ppmResizeNearest(ppm, 8, 8)
            .getOrElse(sys.error(s"resize failed for img $id"))
          val (w2, h2, rgb2) = MediaCodecs.ppmRaster(small)
            .getOrElse(sys.error(s"raster parse failed for img $id"))
          (id, "png", MediaCodecs.pngEncode(w2, h2, rgb2))
      }
    })
  }

  /** Magic-byte raster dispatch: P6 / qoif / PNG signature → (w, h, rgb).
    * None dead-letters (malformed payload). */
  def decodeRaster(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    if (bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6')
      MediaCodecs.ppmRaster(bytes)
    else if (bytes.length >= 4 && bytes(0) == 'q' && bytes(1) == 'o' &&
      bytes(2) == 'i' && bytes(3) == 'f')
      MediaCodecs.qoiDecode(0L, bytes).map { case (info, rgb) =>
        (info.width.get.toInt, info.height.get.toInt, rgb)
      }
    else if (bytes.length >= 8 && (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P')
      MediaCodecs.pngDecode(0L, bytes).map { case (info, rgb) =>
        (info.width.get.toInt, info.height.get.toInt, rgb)
      }
    else None

  /** 64-bit aHash of a raster (red channel — the corpus is grayscale;
    * a color deployment substitutes integer luma here): sample the 8×8
    * nearest-neighbor thumbnail at floor(i·w/8), threshold against the
    * integer mean, bit k = (j·8 + i). Returned as two non-negative
    * 32-bit halves. */
  def aHash(w: Int, h: Int, rgb: Array[Byte]): (Long, Long) = {
    val samples = new Array[Int](64)
    var j = 0
    var sum = 0L
    while (j < 8) {
      val sy = j * h / 8
      var i = 0
      while (i < 8) {
        val sx = i * w / 8
        val v = rgb((sy * w + sx) * 3) & 0xff
        samples(j * 8 + i) = v
        sum += v
        i += 1
      }
      j += 1
    }
    val mean = sum / 64
    var lo = 0L; var hi = 0L
    var k = 0
    while (k < 64) {
      if (samples(k) > mean) {
        if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32)
      }
      k += 1
    }
    (lo, hi)
  }

  /** Decode + hash: (img_id, format, w, h, h_lo, h_hi); undecodable
    * payloads dead-letter (dropped with their ids recoverable by
    * anti-join, same convention as decodeMedia). */
  def fingerprints(corpus: Dataset[(Long, String, Array[Byte])]): DataFrame = {
    import corpus.sparkSession.implicits._
    corpus.mapPartitions(_.flatMap { case (id, fmt, bytes) =>
      decodeRaster(bytes).map { case (w, h, rgb) =>
        val (lo, hi) = aHash(w, h, rgb)
        (id, fmt, w.toLong, h.toLong, lo, hi)
      }
    }).toDF("img_id", "format", "w", "h", "h_lo", "h_hi")
  }

  /** Near-dup pairs at Hamming ≤ maxHamming (must be ≤ 3 for the 4-band
    * losslessness guarantee) — the shared [[HammingPairs]] machinery:
    * band table → keyed self-join → distinct candidates → exact Hamming
    * verify. Returns (a_id, b_id, hamming), a_id < b_id — provably
    * identical to the brute-force all-pairs oracle. */
  def nearDupPairs(fps: DataFrame, maxHamming: Int = 3): DataFrame =
    HammingPairs.pairs(fps, "img_id", maxHamming)
}
