package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.Bloom

/** Incremental dedup of an incoming batch against an existing corpus —
  * "which of today's documents have we already ingested?".
  *
  * The naive form is an anti-join of incoming against every corpus
  * fingerprint: at 100 TB that reshuffles the full corpus key set for every
  * incremental batch. This operator pays the corpus scan ONCE into a
  * fixed-size Bloom filter (one aggregate, bitwise-OR merge), broadcasts
  * it, and lets every incoming row rule itself out map-side; only the
  * filter's maybe-hits (true duplicates + the tuned false-positive sliver)
  * enter the exact anti-join. Bloom filters have no false negatives, so
  * the result is IDENTICAL to the plain anti-join — which is exactly what
  * the `dedup_incremental` DuckDB oracle asserts.
  *
  * Sizing: with m bits and k hashes over n corpus keys the FP rate is
  * ~(1 - e^{-kn/m})^k; m = 8n bits, k = 6 gives ~2%. In production the
  * filter would be persisted next to the corpus and OR-merged
  * incrementally instead of rebuilt per batch (merge is associative and
  * partitioning-invariant).
  */
object IncrementalDedup {

  /** Rows of `incoming` whose `fpCol` value does not occur in
    * `corpus.fpCol`. Result columns = `incoming`'s, exactly the plain
    * anti-join's rows. */
  def newRows(incoming: DataFrame, corpus: DataFrame, fpCol: String,
      numBits: Int = 1 << 20, numHashes: Int = 6): DataFrame = {
    val filter = corpus.agg(Bloom.aggregate(col(fpCol), numBits, numHashes).as("__bloom"))
    // persist the probed frame: the two sinks below (pass-through and exact
    // resolve) would otherwise each re-run the incoming scan and the filter
    // probe — the same union-re-executes-the-pipeline trap the ANN
    // verification rows hit. CacheScope releases the blocks after the
    // consuming action.
    val probed = incoming
      .crossJoin(broadcast(filter))
      .withColumn("__maybe", Bloom.mightContain(col("__bloom"), col(fpCol)))
      .drop("__bloom")
      .persist()
    val definitelyNew = probed.where(!col("__maybe")).drop("__maybe")
    // only the maybe-hits reach the exact resolve — the whole point
    val maybes = probed.where(col("__maybe")).drop("__maybe")
    val confirmedNew = maybes.join(
      corpus.select(col(fpCol)).distinct(), Seq(fpCol), "left_anti")
    // restore incoming's column order (the resolve join moved fpCol first)
    val out = definitelyNew.unionByName(confirmedNew.select(incoming.columns.map(col): _*))
    CacheScope.unpersistAfterUse(out, probed)
  }

  /** Diagnostic: the maybe-hit fraction, for FP-rate assertions in specs. */
  def maybeFraction(incoming: DataFrame, corpus: DataFrame, fpCol: String,
      numBits: Int, numHashes: Int): Double = {
    val filter = corpus.agg(Bloom.aggregate(col(fpCol), numBits, numHashes).as("__bloom"))
    val agg = incoming.crossJoin(broadcast(filter))
      .agg(
        count(lit(1)).as("n"),
        count(when(Bloom.mightContain(col("__bloom"), col(fpCol)), lit(1))).as("maybe"))
      .head()
    if (agg.getLong(0) == 0L) 0.0 else agg.getLong(1).toDouble / agg.getLong(0)
  }
}
