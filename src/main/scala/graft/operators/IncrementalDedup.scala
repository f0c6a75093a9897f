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
  *
  * Two probe shapes:
  *  - [[newRows]]: ONE filter, broadcast whole. Fine while m fits a single
  *    aggregate buffer and a broadcast (corpora to ~10^8-10^9 keys).
  *  - [[newRowsSharded]]: the 100 TB shape — the filter is SHARDED by key
  *    hash (`bucket = pmod(hash(fp), S)`, one fixed-size filter per bucket
  *    built by one groupBy aggregate), stored as a table, and probed by an
  *    equi-join of incoming rows on bucket. Per-bucket filter size is a
  *    constant of the configuration (asserted in BloomSpec); corpus growth
  *    adds SHARDS, not bytes-per-shard, so nothing ever outgrows an
  *    aggregation buffer or a broadcast. Same no-false-negative contract.
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
    val out = definitelyNew.unionByName(confirmedNew.select(incoming.columns.toIndexedSeq.map(col): _*))
    CacheScope.unpersistAfterUse(out, probed)
  }

  /** Shard-selection hash: independent of the xxhash64(fp) the Bloom's bit
    * indices use (seeded with an extra literal), so a bucket's keys don't
    * concentrate on a bit-index residue class inside their shard's filter. */
  private def bucketOf(fp: Column, numShards: Int): Column =
    pmod(xxhash64(lit("__graft_shard__"), fp), lit(numShards.toLong)).cast("int")

  /** The sharded filter table: one row per key-hash bucket,
    * `(__bucket int, __bloom binary)`, each filter a FIXED `bitsPerShard`
    * bits regardless of corpus size. This is the 100 TB shape the single
    * broadcast filter of [[newRows]] cannot reach: a 10^11-key corpus at
    * m = 8n needs ~100 GB of filter — not constructible in one aggregate
    * buffer, not broadcastable — but as `S = ceil(8n / bitsPerShard)`
    * shards it is one ordinary groupBy aggregate (map-side partial OR-merge
    * per bucket), a table you persist next to the corpus, and every piece
    * stays a few hundred KB. Growth is in SHARD COUNT, never shard size.
    * Incremental maintenance is [[mergeShardedFilters]]: OR-merge the
    * stored table with a delta batch's table per bucket — bit-identical
    * to a rebuild over the union (spec-asserted), no corpus rescan. */
  def shardedFilters(corpus: DataFrame, fpCol: String, numShards: Int,
      bitsPerShard: Int, numHashes: Int): DataFrame =
    corpus
      .select(bucketOf(col(fpCol), numShards).as("__bucket"), col(fpCol))
      .groupBy("__bucket")
      .agg(Bloom.aggregate(col(fpCol), bitsPerShard, numHashes).as("__bloom"))

  /** [[newRows]] through the sharded filter table — identical result (no
    * false negatives per shard, exact resolve over the maybes), but no
    * single-broadcast scale cap. The probe is an equi-join of incoming on
    * `__bucket`: Spark broadcasts the filter table while it is small and
    * degrades to a keyed shuffle of the INCOMING side only (KB-scale rows)
    * when it is not — each task then holds just its buckets' filters.
    * Buckets with no corpus keys have no filter row (left join, NULL
    * bloom) and are definitely-new by construction. */
  def newRowsSharded(incoming: DataFrame, corpus: DataFrame, fpCol: String,
      numShards: Int, bitsPerShard: Int = 1 << 20, numHashes: Int = 6): DataFrame = {
    val filters = shardedFilters(corpus, fpCol, numShards, bitsPerShard, numHashes)
    val probed = incoming
      .withColumn("__bucket", bucketOf(col(fpCol), numShards))
      .join(filters, Seq("__bucket"), "left")
      .withColumn("__maybe",
        coalesce(Bloom.mightContain(col("__bloom"), col(fpCol)), lit(false)))
      .drop("__bucket", "__bloom")
      .persist()
    val definitelyNew = probed.where(!col("__maybe")).drop("__maybe")
    val maybes = probed.where(col("__maybe")).drop("__maybe")
    val confirmedNew = maybes.join(
      corpus.select(col(fpCol)).distinct(), Seq(fpCol), "left_anti")
    val out = definitelyNew.unionByName(confirmedNew.select(incoming.columns.toIndexedSeq.map(col): _*))
    CacheScope.unpersistAfterUse(out, probed)
  }

  /** Incremental maintenance of a sharded filter table WITHOUT a corpus
    * rescan: union the stored table with the delta batch's table and
    * OR-merge per bucket (one keyed ObjectHashAggregate over |buckets|
    * rows of fixed-size filters — trivial at any corpus size). Bitwise OR
    * is exact, so the result is BIT-IDENTICAL to rebuilding over
    * corpus ∪ delta (asserted in BloomSpec) — the same stored-sketch
    * lifecycle as the HLL sketch tables: scan each day's data once,
    * merge filter tables forever after. */
  def mergeShardedFilters(stored: DataFrame, delta: DataFrame): DataFrame =
    stored.unionByName(delta)
      .groupBy("__bucket")
      .agg(Bloom.merge(col("__bloom")).as("__bloom"))

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
