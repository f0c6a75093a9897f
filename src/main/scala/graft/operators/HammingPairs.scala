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

  /** The persistable band index: (id, band_id, band_val, h_lo, h_hi) —
    * 4 rows of longs per fingerprint. At cluster scale this table is the
    * stored artifact an incremental deployment keeps between batches
    * (bucketed by (band_id, band_val)); here it is derived on demand. */
  def bandTable(fps: DataFrame, idCol: String): DataFrame =
    fps.select(col(idCol).as("id"), col("h_lo"), col("h_hi"),
      posexplode(array(
        col("h_lo").bitwiseAND(lit(0xffffL)),
        shiftright(col("h_lo"), 16),
        col("h_hi").bitwiseAND(lit(0xffffL)),
        shiftright(col("h_hi"), 16))))
      .withColumnRenamed("pos", "band_id")
      .withColumnRenamed("col", "band_val")

  private def verify(cand: DataFrame, maxHamming: Int): DataFrame = cand
    .distinct()
    .withColumn("hamming",
      expr("bit_count(alo ^ blo) + bit_count(ahi ^ bhi)").cast("long"))
    .where(col("hamming") <= maxHamming)
    .select("a_id", "b_id", "hamming")

  /** (a_id, b_id, hamming) with a_id < b_id for all pairs at Hamming ≤
    * maxHamming (≤ 3 required for the 4-band guarantee). `fps` must
    * carry (idCol, h_lo, h_hi). */
  def pairs(fps: DataFrame, idCol: String, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, s"4x16-bit banding is only lossless to Hamming 3, got $maxHamming")
    val bands = bandTable(fps, idCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand = bands.as("x").join(bands.as("y"), Seq("band_id", "band_val"))
      .where(col("x.id") < col("y.id"))
      .select(col("x.id").as("a_id"), col("y.id").as("b_id"),
        col("x.h_lo").as("alo"), col("x.h_hi").as("ahi"),
        col("y.h_lo").as("blo"), col("y.h_hi").as("bhi"))
    CacheScope.unpersistAfterUse(verify(cand, maxHamming), bands)
  }

  /** Incremental probe: every pair at Hamming ≤ maxHamming with AT LEAST
    * ONE side in `delta`, found by joining the delta's bands against the
    * (index ∪ delta) band table — per-batch cost tracks the DELTA, the
    * index is only read through the keyed join. union with the prior
    * batch's pairs ≡ a full recompute over index ∪ delta (delta–index
    * pairs probe from the delta side; delta–delta pairs from either side,
    * deduped by the canonical a < b orientation). */
  def probePairs(index: DataFrame, delta: DataFrame, idCol: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, s"4x16-bit banding is only lossless to Hamming 3, got $maxHamming")
    val db = bandTable(delta, idCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val all = bandTable(index, idCol).unionByName(db)
    val cand = db.as("x").join(all.as("y"), Seq("band_id", "band_val"))
      .where(col("x.id") =!= col("y.id"))
      .select(
        least(col("x.id"), col("y.id")).as("a_id"),
        greatest(col("x.id"), col("y.id")).as("b_id"),
        when(col("x.id") < col("y.id"), col("x.h_lo")).otherwise(col("y.h_lo")).as("alo"),
        when(col("x.id") < col("y.id"), col("x.h_hi")).otherwise(col("y.h_hi")).as("ahi"),
        when(col("x.id") < col("y.id"), col("y.h_lo")).otherwise(col("x.h_lo")).as("blo"),
        when(col("x.id") < col("y.id"), col("y.h_hi")).otherwise(col("x.h_hi")).as("bhi"))
    CacheScope.unpersistAfterUse(verify(cand, maxHamming), db)
  }
}
