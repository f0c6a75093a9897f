package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared Hamming-banded near-dup candidate machinery over 64-bit
  * fingerprints stored as two non-negative 32-bit halves (h_lo, h_hi) —
  * used by the image (aHash) and audio (energy-profile hash) dedup
  * lanes; the SimHash band idea applied to media fingerprints.
  *
  * Losslessness: a pair at Hamming ≤ 3 differs in at most 3 of the 4
  * 16-bit bands, so at least one band matches exactly (pigeonhole) and
  * the keyed band join finds every such pair; exact in-bucket
  * verification then makes the output row-identical to the brute-force
  * all-pairs oracle. Every join is a keyed shuffle of (id, band_id,
  * band_val) longs — fingerprint bytes, never payloads, on the wire. */
object HammingPairs {

  /** (a_id, b_id, hamming) with a_id < b_id for all pairs at Hamming ≤
    * maxHamming (≤ 3 required for the 4-band guarantee). `fps` must
    * carry (idCol, h_lo, h_hi). */
  def pairs(fps: DataFrame, idCol: String, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, s"4x16-bit banding is only lossless to Hamming 3, got $maxHamming")
    val bands = fps.select(col(idCol).as("id"), col("h_lo"), col("h_hi"),
      posexplode(array(
        col("h_lo").bitwiseAND(lit(0xffffL)),
        shiftright(col("h_lo"), 16),
        col("h_hi").bitwiseAND(lit(0xffffL)),
        shiftright(col("h_hi"), 16))))
      .withColumnRenamed("pos", "band_id")
      .withColumnRenamed("col", "band_val")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand = bands.as("x").join(bands.as("y"), Seq("band_id", "band_val"))
      .where(col("x.id") < col("y.id"))
      .select(col("x.id").as("a_id"), col("y.id").as("b_id"),
        col("x.h_lo").as("alo"), col("x.h_hi").as("ahi"),
        col("y.h_lo").as("blo"), col("y.h_hi").as("bhi"))
      .distinct()
    val pairs = cand
      .withColumn("hamming",
        expr("bit_count(alo ^ blo) + bit_count(ahi ^ bhi)").cast("long"))
      .where(col("hamming") <= maxHamming)
      .select("a_id", "b_id", "hamming")
    CacheScope.unpersistAfterUse(pairs, bands)
  }
}
