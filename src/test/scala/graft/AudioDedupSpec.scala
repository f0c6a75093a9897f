package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{AudioDedup, MediaCodecs}

/** Audio perceptual dedup pinned against driver-side models: WAV
  * round trip, the gain-invariance theorem, and the pipeline pair set
  * vs brute-force Hamming. */
class AudioDedupSpec extends AnyFunSuite {
  import TestSpark._

  test("wavSamples round-trips the PCM payload exactly") {
    for (seed <- 0L until 10L; v <- 0 to 2) {
      val pcm = AudioDedup.syntheticPcm(seed, v)
      val (rate, got) = MediaCodecs.wavSamples(
        MediaCodecs.wavEncode(pcm, 16000)).get
      assert(rate === 16000)
      assert(got.toSeq === pcm.toSeq, s"seed=$seed v=$v")
    }
    // malformed payloads dead-letter
    assert(MediaCodecs.wavSamples(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("energy hash is gain-invariant: uniform scaling lands at Hamming 0") {
    for (seed <- 0L until 25L) {
      val base = AudioDedup.energyHash(AudioDedup.syntheticPcm(seed, 0)).get
      val gained = AudioDedup.energyHash(AudioDedup.syntheticPcm(seed, 1)).get
      assert(gained === base, s"seed=$seed")
      // and an arbitrary (not just x2) scale, directly on samples
      val scaled = AudioDedup.syntheticPcm(seed, 0).map(s => (s * 3).toShort)
      assert(AudioDedup.energyHash(scaled).get === base, s"x3 seed=$seed")
    }
  }

  test("non-64-divisible or empty sample counts dead-letter") {
    assert(AudioDedup.energyHash(Array.empty[Short]).isEmpty)
    assert(AudioDedup.energyHash(new Array[Short](65)).isEmpty)
    assert(AudioDedup.energyHash(new Array[Short](128)).isDefined)
  }

  test("pipeline pair set equals the brute-force Hamming<=3 model") {
    import TestSpark.spark.implicits._
    val n = 90L
    val got = AudioDedup
      .nearDupPairs(AudioDedup.fingerprints(AudioDedup.corpus((0L until n).toDS())))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val hashes = (0L until n).map { id =>
      id -> AudioDedup.energyHash(AudioDedup.syntheticPcm(id / 3, (id % 3).toInt)).get
    }
    val expected = (for {
      (a, ha) <- hashes; (b, hb) <- hashes if a < b
      d = java.lang.Long.bitCount(ha._1 ^ hb._1) +
        java.lang.Long.bitCount(ha._2 ^ hb._2) if d <= 3
    } yield (a, b, d.toLong)).toSet
    assert(got === expected)
    assert(expected.exists(_._3 == 0L)) // planted gain twins
  }
}
