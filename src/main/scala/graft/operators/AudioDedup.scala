package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Perceptual audio near-dedup — the waveform sibling of [[ImageDedup]]
  * (brief: multimodal columns as first-class dedup citizens): WAV corpus
  * → real PCM16 decode ([[MediaCodecs.wavSamples]]) → 64-bit
  * energy-profile fingerprint → the shared [[HammingPairs]] banded
  * candidate join → exact verify.
  *
  * Fingerprint (the integer skeleton of Haitsma–Kalker's robust audio
  * hash, energy differences instead of float spectral bands): split the
  * waveform into 64 equal windows, window energy E_w = Σ|s|, bit w =
  * E_w > E_{(w+1) mod 64}. Comparing ADJACENT energies makes the hash
  * AMPLITUDE-INVARIANT by construction: uniform gain g scales every E_w
  * by g and preserves every comparison, so a re-encoded louder copy
  * lands at Hamming 0 (pinned in AudioDedupSpec) — the audio analogue
  * of the image lane's resize-invariance theorem. A sparse additive
  * perturbation (+64 every 97th sample) flips only the comparisons
  * whose adjacent energies nearly tie, planting 1–3-bit near-dups.
  *
  * Scale shape: identical to the image lane — waveform bytes never
  * shuffle; each partition reduces its payloads to 16 bytes of hash;
  * every join is keyed. */
object AudioDedup {

  /** Synthetic PCM16 waveform with SQL-replayable integer arithmetic: a
    * per-window envelope (md5 of "seed-window", values 1..97 — a linear
    * mod-97 envelope was rejected on paper: only ~26k distinct (slope,
    * offset) classes, so at sf10's millions of seeds bit patterns recur
    * and the pair output goes quadratic, the image lane's
    * coefficient-cycling failure again) times a fixed zigzag carrier
    * (i mod 17 − 8), so window energies vary strongly across w. Variant
    * 1 doubles the amplitude (planted gain-invariance); variant 2 adds
    * +64 every 97th sample (planted near-miss). */
  /** Per-window envelope values (1..97): four md5 digests per seed, 16
    * envelope bytes each — one md5 per window was measured at 38 s for
    * the sf10 corpus (320M digests); the block form is 16× fewer. Byte j
    * of digest b drives window b·16+j, which DuckDB reads back as a
    * 2-hex-char substring of md5("seed-b"). */
  def envelope(seed: Long): Array[Int] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Int](64)
    var b = 0
    while (b < 4) {
      val dig = md.digest(s"$seed-$b".getBytes("US-ASCII"))
      var j = 0
      while (j < 16) { out(b * 16 + j) = (dig(j) & 0xff) % 97 + 1; j += 1 }
      b += 1
    }
    out
  }

  def syntheticPcm(seed: Long, variant: Int): Array[Short] =
    pcmFromEnv(envelope(seed), seed, variant)

  private def pcmFromEnv(env: Array[Int], seed: Long, variant: Int): Array[Short] = {
    val k = (8 + seed % 5).toInt // window size; n = 64k
    val n = 64 * k
    Array.tabulate(n) { i =>
      val base = env(i / k) * ((i % 17) - 8)
      val pert = if (variant == 2 && i % 97 == 0) 64 else 0
      val gain = if (variant == 1) 2 else 1
      ((base + pert) * gain).toShort
    }
  }

  /** WAV corpus: one payload per id; seed = id/3 groups base, gain-double
    * and perturbed variants. The envelope is memoized across consecutive
    * same-seed ids (the three variants of a group usually land in one
    * partition), cutting digest work ~3× again. */
  def corpus(ids: Dataset[Long]): Dataset[(Long, Array[Byte])] = {
    import ids.sparkSession.implicits._
    ids.mapPartitions { it =>
      var lastSeed = Long.MinValue
      var lastEnv: Array[Int] = null
      it.map { id =>
        val seed = id / 3
        if (seed != lastSeed) { lastSeed = seed; lastEnv = envelope(seed) }
        (id, MediaCodecs.wavEncode(pcmFromEnv(lastEnv, seed, (id % 3).toInt), 16000))
      }
    }
  }

  /** 64-bit energy-profile hash as two non-negative 32-bit halves.
    * Requires a sample count divisible by 64 (the corpus guarantees it);
    * other lengths dead-letter. */
  def energyHash(samples: Array[Short]): Option[(Long, Long)] = {
    val n = samples.length
    if (n == 0 || n % 64 != 0) return None
    val k = n / 64
    val e = new Array[Long](64)
    var i = 0
    while (i < n) {
      e(i / k) += math.abs(samples(i).toLong)
      i += 1
    }
    var lo = 0L; var hi = 0L
    var w = 0
    while (w < 64) {
      if (e(w) > e((w + 1) % 64)) {
        if (w < 32) lo |= 1L << w else hi |= 1L << (w - 32)
      }
      w += 1
    }
    Some((lo, hi))
  }

  /** Decode + fingerprint: (id, n_samples, h_lo, h_hi); undecodable or
    * non-64-divisible payloads dead-letter. */
  def fingerprints(corpus: Dataset[(Long, Array[Byte])]): DataFrame = {
    import corpus.sparkSession.implicits._
    corpus.mapPartitions(_.flatMap { case (id, bytes) =>
      for {
        (_, samples) <- MediaCodecs.wavSamples(bytes)
        (lo, hi) <- energyHash(samples)
      } yield (id, samples.length.toLong, lo, hi)
    }).toDF("id", "n_samples", "h_lo", "h_hi")
  }

  /** Near-dup pairs at Hamming ≤ 3 via the shared banded machinery —
    * row-identical to the brute-force all-pairs oracle. */
  def nearDupPairs(fps: DataFrame, maxHamming: Int = 3): DataFrame =
    HammingPairs.pairs(fps, "id", maxHamming)
}
