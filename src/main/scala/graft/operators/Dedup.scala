package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.expressions.{ChunkBoundaries, CosineSim, EqualPositionCount, HyperplaneBandKeys, MinHashSig, ShingleHashes, SimHash16, Sketch, SortedIntersectCount}
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions

/** Deduplication operators for the LLM-training-data pipeline.
  *
  * Scale discipline shared by every near-dup variant: candidate generation
  * is a shuffle on (band_id, band_hash) — O(n * bands) shuffle rows — and
  * exact verification runs only inside buckets. There is no crossJoin
  * anywhere; an all-pairs comparison at 100 TB is not a slow plan, it is a
  * non-plan.
  */
object Dedup {

  /** Exact dedup: keep one survivor per key, latest by `orderCols` with a
    * deterministic tie-break. One hash-partitioned shuffle (row_number over
    * the key window); map-side nothing to combine since survivors are whole
    * rows. Equivalent shape to reader's downstream PK dedupe. */
  def exactLatest(df: DataFrame, keyCols: Seq[String], orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1).drop("__rn")
  }

  /** Exact-duplicate groups by content fingerprint: groupBy md5(normalized
    * text) — partial aggregation map-side, survivors = min(id). */
  def exactByFingerprint(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), fingerprintHex(col(textCol)).as("fp"))
      .groupBy("fp")
      .agg(min(col(idCol)).as("survivor_id"), count(lit(1)).as("group_size"))

  /** @param maxBucketSize optional candidate-volume guard: an LSH band
    *   bucket holding B docs yields B(B−1)/2 candidate pairs, and ONE
    *   pathological bucket (boilerplate, empty-ish docs, adversarial
    *   spam) can dominate the whole join with no cap on B. When set,
    *   buckets LARGER than the cap are dropped before the self-join —
    *   recall loss is confined to pairs whose every shared band is a
    *   mega-bucket (on real corpora: exactly the boilerplate one wants
    *   gone) and the drop is OBSERVABLE via [[lshBucketCensus]], never
    *   silent. Default None: existing outputs are byte-identical. */
  final case class MinHashConfig(
      numPerm: Int = 128,
      bands: Int = 32,
      shingleSize: Int = 5,
      threshold: Double = 0.9,
      maxBucketSize: Option[Int] = None) {
    require(numPerm % bands == 0, "bands must divide numPerm")
    require(maxBucketSize.forall(_ >= 2), "a cap below 2 drops every pair")
    def rowsPerBand: Int = numPerm / bands
  }

  /** Near-duplicate pairs via MinHash + banded LSH, exact-verified.
    *
    * Pipeline (each step one narrow projection or one keyed shuffle):
    *  1. shingle + hash + MinHash signature         (single pass, codegen)
    *  2. explode band hashes                        (n * bands rows, 16B each)
    *  3. self-join on (band_id, band_hash), id<id   (shuffle on band key)
    *  4. distinct candidate pairs                   (shuffle on pair)
    *  5. join back shingle sets, exact Jaccard >= t (two broadcast-or-shuffle
    *     hash joins keyed by doc id)
    *
    * With 128 perms / 32 bands / r=4, P[candidate | J=0.9] = 1-(1-0.9^4)^32
    * ≈ 1 - 3e-15: recall at the threshold is effectively exact, which is why
    * the verified output can match an all-pairs oracle.
    */
  def minhashNearDupPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      cfg: MinHashConfig = MinHashConfig()): DataFrame =
    nearDupPairs(docs, idCol,
      Sketch.column(ShingleHashes(Sketch.expr(col(textCol)), cfg.shingleSize, word = true)),
      cfg, None)

  /** Bucket-cap observability census for [[MinHashConfig.maxBucketSize]]:
    * ONE row — (n_buckets, n_buckets_dropped, n_rows_dropped,
    * n_pairs_dropped), where n_pairs_dropped = Σ B·(B−1)/2 over the
    * dropped buckets: the EXACT candidate-pair mass the cap removed from
    * the self-join. The guard is never silent — a capping pipeline
    * surfaces this row next to its output (the no-silent-caps rule). */
  def lshBucketCensus(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      cfg: MinHashConfig): DataFrame = {
    val cap = cfg.maxBucketSize.getOrElse(
      throw new IllegalArgumentException("census is for a capped config"))
    val buckets = docs
      .select(col(idCol).as("id"),
        Sketch.column(ShingleHashes(Sketch.expr(col(textCol)), cfg.shingleSize,
          word = true)).as("sh"))
      .where(size(col("sh")) > 0)
      .withColumn("sig", Sketch.column(MinHashSig(Sketch.expr(col("sh")), cfg.numPerm)))
      .withColumn("bands", lshBandHashes(col("sig"), cfg.bands, cfg.rowsPerBand))
      .select(col("id"), posexplode(col("bands")))
      .groupBy(col("pos").as("band_id"), col("col").as("band_hash"))
      .agg(count(lit(1)).as("bsz"))
    buckets.agg(
      count(lit(1)).as("n_buckets"),
      sum(when(col("bsz") > cap, 1L).otherwise(0L)).as("n_buckets_dropped"),
      sum(when(col("bsz") > cap, col("bsz")).otherwise(0L)).as("n_rows_dropped"),
      sum(when(col("bsz") > cap, expr("bsz * (bsz - 1) div 2"))
        .otherwise(0L)).as("n_pairs_dropped"))
  }

  /** Same machinery over character n-gram sets (catches reorder-heavy edits
    * word shingles miss). `blockCol`, when set, restricts pairs to the same
    * block (e.g. same source) — classic blocking to cut candidate volume. */
  def ngramNearDupPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      cfg: MinHashConfig,
      blockCol: Option[String] = None): DataFrame =
    nearDupPairs(docs, idCol,
      Sketch.column(ShingleHashes(Sketch.expr(col(textCol)), n, word = false)),
      cfg, blockCol)

  private def nearDupPairs(
      docs: DataFrame,
      idCol: String,
      shExpr: Column,
      cfg: MinHashConfig,
      blockCol: Option[String]): DataFrame = {
    // (id, sh, [block]) built lazily from the raw docs — the full shingle
    // arrays (KBs per doc) are deliberately NEVER persisted or shuffled
    // corpus-wide. r9 scale finding: persisting them alongside the
    // signatures put the whole corpus's shingle sets through the cache AND
    // through the verify joins (500k docs at sf10 → multi-GB, spilling);
    // only SURVIVORS ever need their sets, so only survivors pay.
    def shingled(src: DataFrame): DataFrame =
      src.select(Seq(col(idCol).as("id"), shExpr.as("sh")) ++ blockCol.map(col): _*)
        .where(size(col("sh")) > 0)

    // Persisted sketch table is NARROW: (id, sig, bands[, block]) — ~1.3 KB
    // per doc at 128 perms — consumed by both sides of the band self-join
    // and the estimate prefilter. At cluster scale this is the standard
    // "persist the signatures" step of every LSH pipeline.
    val withSig = shingled(docs)
      .withColumn("sig", Sketch.column(MinHashSig(Sketch.expr(col("sh")), cfg.numPerm)))
      .withColumn("bands", lshBandHashes(col("sig"), cfg.bands, cfg.rowsPerBand))
      .select(Seq(col("id"), col("sig"), col("bands")) ++ blockCol.map(col): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val bandCols = Seq(col("id"), posexplode(col("bands"))) ++ blockCol.map(col)
    val bandTableRaw = withSig
      .select(bandCols: _*)
      .withColumnRenamed("pos", "band_id")
      .withColumnRenamed("col", "band_hash")
    // candidate-volume guard (see MinHashConfig.maxBucketSize): one keyed
    // count + one semi-join — buckets above the cap never reach the
    // self-join, bounding per-key fan-out at cap² instead of unbounded
    val bandTable = cfg.maxBucketSize match {
      case None => bandTableRaw
      case Some(cap) =>
        val keyCols = Seq("band_id", "band_hash") ++ blockCol
        val small = bandTableRaw.groupBy(keyCols.map(col): _*)
          .agg(count(lit(1)).as("bsz"))
          .where(col("bsz") <= cap)
          .select(keyCols.map(col): _*)
        bandTableRaw.join(small, keyCols, "left_semi")
    }

    // The shared-band COUNT is itself a similarity estimator (the banding
    // twin of the numPerm-position estimate below): a pair at exactly
    // `threshold` agrees on Binomial(bands, t^r) bands — μ = bands·t^r,
    // σ² = μ(1−t^r) — so cutting at μ−6σ loses a true threshold pair with
    // P ~ 1e-9 while discarding the low-similarity collision mass BEFORE
    // any signature is fetched. r9 sf10 finding: 500k short docs produced
    // 39M distinct candidates, 87% sharing ≤4 of 32 bands; the signature
    // join over them — not the kernels, not the self-join — was the wall
    // (75 s → the count is free from the dedup groupBy, signatures are
    // not). Configs whose μ−6σ ≤ 1 get minShared = 1, i.e. a no-op.
    val pBand = math.pow(cfg.threshold, cfg.rowsPerBand)
    val muBands = cfg.bands * pBand
    val minShared = math.max(1.0,
      math.ceil(muBands - 6 * math.sqrt(muBands * (1 - pBand)))).toInt
    val joinKeys = Seq("band_id", "band_hash") ++ blockCol
    val candidates = bandTable.as("x")
      .join(bandTable.as("y"), joinKeys, "inner")
      .where(col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .agg(count(lit(1)).as("shared_bands"))
      .where(col("shared_bands") >= minShared)
      .select(col("id_a"), col("id_b"))

    // Two-stage verification. Stage 1 joins only the fixed-width signatures
    // and keeps pairs whose MinHash ESTIMATE clears a slack threshold —
    // with 128 perms the estimator's σ at J=0.9 is ~0.027, so a 6σ slack
    // (0.15) loses nothing while discarding the ~0-similarity bucket
    // collisions that dominate candidate volume. Stage 2 fetches the full
    // shingle sets only for survivors and computes exact Jaccard.
    // `plausible` is persisted (tiny pair list) because it feeds both the
    // survivor-id fetch and the final join — without it the band self-join
    // would re-execute per consumer (the r7 union-re-executes lesson).
    val sigs = withSig.select(col("id"), col("sig"))
    val est = Sketch.column(EqualPositionCount(
      Sketch.expr(col("ga.sig")), Sketch.expr(col("gb.sig"))))
    val plausible = candidates
      .join(sigs.as("ga"), col("id_a") === col("ga.id"))
      .join(sigs.as("gb"), col("id_b") === col("gb.id"))
      .where(est.cast("double") / cfg.numPerm >= cfg.threshold - 0.15)
      .select(col("id_a"), col("id_b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // Survivor-only shingle fetch: semi-join the survivor ids against the
    // raw docs (AQE broadcasts the id list when it is small — the healthy
    // case — and falls back to a keyed shuffle under adversarial candidate
    // volume), THEN run the shingle kernel on just those rows. Persisted
    // because both pair sides consume it.
    val pids = plausible
      .select(explode(array(col("id_a"), col("id_b"))).as(idCol)).distinct()
    val shSets = shingled(docs.join(pids, Seq(idCol), "left_semi"))
      .select(col("id"), col("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val inter = Sketch.column(SortedIntersectCount(
      Sketch.expr(col("sa.sh")), Sketch.expr(col("sb.sh"))))
    val verified = plausible
      .join(shSets.as("sa"), col("id_a") === col("sa.id"))
      .join(shSets.as("sb"), col("id_b") === col("sb.id"))
      .select(
        col("id_a"), col("id_b"),
        (inter.cast("double") / (size(col("sa.sh")) + size(col("sb.sh")) - inter)).as("jacc"))
      .where(col("jacc") >= cfg.threshold)
    // release the caches once the consuming action finishes — a session
    // running many queries must not accumulate orphaned blocks
    CacheScope.unpersistAfterUse(
      CacheScope.unpersistAfterUse(
        CacheScope.unpersistAfterUse(verified, withSig), plausible), shSets)
  }

  /** Asymmetric CONTAINMENT near-dup pairs: C(A,B) = |S(A)∩S(B)| /
    * min(|S(A)|,|S(B)|) ≥ threshold — the doc-in-doc lane symmetric
    * Jaccard cannot see (a page quoted whole inside a 10× larger page has
    * J ≈ 0.1 but C = 1.0; think excerpts, quotations, syndicated
    * fragments). MinHash banding does NOT preserve containment, so
    * candidate generation is bottom-K probing: every doc emits its K
    * smallest shingle hashes (ShingleHashes returns the sorted distinct
    * set, so the bottom-K is a free slice) and any doc whose full shingle
    * set contains one of them is a candidate.
    *
    * Recall envelope (the 6σ-class argument the other lanes use): if
    * C ≥ t, at most a (1−t) fraction of the smaller set is missing from
    * the larger; hash rank is independent of which shingles are missing,
    * so ALL K bottom hashes land in the missing mass with
    * P ≤ (1−t)^K = 1e-12 at t=0.9, K=12. Exact verification
    * (SortedIntersectCount over survivor-only shingle fetches) then makes
    * precision exact, so the output equals the all-pairs oracle.
    *
    * Shape at 100 TB: probes are n·K narrow rows, postings O(shingles)
    * narrow rows, and the candidate join is ONE keyed shuffle on the
    * 8-byte hash; full shingle arrays are never persisted or shuffled
    * corpus-wide — survivors only, the [[minhashNearDupPairs]]
    * discipline. Probe cost concentrates on high-df shingles exactly like
    * the LSH band table does on hot bands; the distinct() collapses the
    * per-shingle pair multiplicity before verification.
    */
  def containmentPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 4,
      bottomK: Int = 12,
      threshold: Double = 0.9): DataFrame = {
    val shExpr = Sketch.column(
      ShingleHashes(Sketch.expr(col(textCol)), shingleSize, word = true))
    def shingled(src: DataFrame): DataFrame =
      src.select(col(idCol).as("id"), shExpr.as("sh"))
        .where(size(col("sh")) > 0)

    val probes = shingled(docs)
      .select(col("id"), explode(slice(col("sh"), 1, bottomK)).as("h"))
    val postings = shingled(docs)
      .select(col("id"), explode(col("sh")).as("h"))
    val candidates = probes.as("x")
      .join(postings.as("y"), Seq("h"), "inner")
      .where(col("x.id") =!= col("y.id"))
      .select(least(col("x.id"), col("y.id")).as("id_a"),
        greatest(col("x.id"), col("y.id")).as("id_b"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val pids = candidates
      .select(explode(array(col("id_a"), col("id_b"))).as(idCol)).distinct()
    val shSets = shingled(docs.join(pids, Seq(idCol), "left_semi"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val inter = Sketch.column(SortedIntersectCount(
      Sketch.expr(col("sa.sh")), Sketch.expr(col("sb.sh"))))
    val verified = candidates
      .join(shSets.as("sa"), col("id_a") === col("sa.id"))
      .join(shSets.as("sb"), col("id_b") === col("sb.id"))
      .select(col("id_a"), col("id_b"),
        size(col("sa.sh")).cast("long").as("m_a"),
        size(col("sb.sh")).cast("long").as("m_b"),
        inter.cast("long").as("inter"))
      .withColumn("containment",
        col("inter").cast("double") / least(col("m_a"), col("m_b")))
      .where(col("containment") >= threshold)
    CacheScope.unpersistAfterUse(
      CacheScope.unpersistAfterUse(verified, candidates), shSets)
  }

  /** Incremental LSH index probe: near-dup pairs between a DELTA batch and
    * an already-indexed BASE corpus, without re-shingling the base.
    *
    * The base's (id, band_id, band_hash) table IS the persisted index — at
    * cluster scale it is written once, bucketed by (band_id, band_hash),
    * and each arriving batch only (1) sketches ITS OWN rows, (2) probes the
    * index with a keyed equi-join, (3) exact-verifies inside buckets. Base
    * shingle sets are re-derived for VERIFY SURVIVORS only (a semi-join of
    * matched ids against the base — the same survivor-only discipline as
    * [[minhashNearDupPairs]]), so a TB-scale base costs the delta probe
    * O(delta · bands) shuffle rows plus the survivors' text, never a
    * corpus re-scan. Returns (id_base, id_delta, jacc), exact-verified at
    * `cfg.threshold`, so the output equals the all-pairs cross oracle.
    * Same banding math as the self-join variant: recall at the threshold
    * is 1 − (1 − t^r)^bands ≈ 1 − 3e-15 at the 128/32 defaults. */
  def minhashProbePairs(
      base: DataFrame,
      delta: DataFrame,
      idCol: String,
      textCol: String,
      cfg: MinHashConfig = MinHashConfig()): DataFrame = {
    val shExpr = Sketch.column(
      ShingleHashes(Sketch.expr(col(textCol)), cfg.shingleSize, word = true))
    def shingled(src: DataFrame): DataFrame =
      src.select(col(idCol).as("id"), shExpr.as("sh"))
        .where(size(col("sh")) > 0)
    def withSig(src: DataFrame): DataFrame =
      shingled(src)
        .withColumn("sig", Sketch.column(MinHashSig(Sketch.expr(col("sh")), cfg.numPerm)))
        .withColumn("bands", lshBandHashes(col("sig"), cfg.bands, cfg.rowsPerBand))
        .select(col("id"), col("sig"), col("bands"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def bandTable(sigs: DataFrame): DataFrame =
      sigs.select(col("id"), posexplode(col("bands")))
        .withColumnRenamed("pos", "band_id")
        .withColumnRenamed("col", "band_hash")

    val baseSig = withSig(base)
    val deltaSig = withSig(delta)

    // same μ−6σ shared-band prefilter as the self-join path: the count is
    // free from the pair groupBy and discards the low-similarity collision
    // mass before any signature is fetched
    val pBand = math.pow(cfg.threshold, cfg.rowsPerBand)
    val muBands = cfg.bands * pBand
    val minShared = math.max(1.0,
      math.ceil(muBands - 6 * math.sqrt(muBands * (1 - pBand)))).toInt
    val candidates = bandTable(deltaSig).as("x")
      .join(bandTable(baseSig).as("y"), Seq("band_id", "band_hash"), "inner")
      .groupBy(col("x.id").as("id_delta"), col("y.id").as("id_base"))
      .agg(count(lit(1)).as("shared_bands"))
      .where(col("shared_bands") >= minShared)
      .select(col("id_delta"), col("id_base"))

    val est = Sketch.column(EqualPositionCount(
      Sketch.expr(col("ga.sig")), Sketch.expr(col("gb.sig"))))
    val plausible = candidates
      .join(deltaSig.select(col("id"), col("sig")).as("ga"), col("id_delta") === col("ga.id"))
      .join(baseSig.select(col("id"), col("sig")).as("gb"), col("id_base") === col("gb.id"))
      .where(est.cast("double") / cfg.numPerm >= cfg.threshold - 0.15)
      .select(col("id_delta"), col("id_base"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // survivor-only shingle fetch, per side — the only point the BASE text
    // is touched, and only for ids that cleared the signature estimate
    val shDelta = shingled(
      delta.join(plausible.select(col("id_delta").as(idCol)).distinct(), Seq(idCol), "left_semi"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val shBase = shingled(
      base.join(plausible.select(col("id_base").as(idCol)).distinct(), Seq(idCol), "left_semi"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val inter = Sketch.column(SortedIntersectCount(
      Sketch.expr(col("sa.sh")), Sketch.expr(col("sb.sh"))))
    val verified = plausible
      .join(shDelta.as("sa"), col("id_delta") === col("sa.id"))
      .join(shBase.as("sb"), col("id_base") === col("sb.id"))
      .select(
        col("id_base"), col("id_delta"),
        (inter.cast("double") / (size(col("sa.sh")) + size(col("sb.sh")) - inter)).as("jacc"))
      .where(col("jacc") >= cfg.threshold)
    Seq(baseSig, deltaSig, plausible, shDelta, shBase)
      .foldLeft(verified)(CacheScope.unpersistAfterUse)
  }

  /** Character-level edit-distance near-dup pairs at Levenshtein distance
    * ≤ 1, via FastSS deletion neighborhoods (Bocek et al. 2007, "Fast
    * Similarity Search in Large Dictionaries"): two strings within edit
    * distance 1 always share a member of their 1-deletion neighborhoods
    * ({s} ∪ {s minus one char}) — substitution meets at the both-sides
    * deletion of the differing position, insert/delete meets at the longer
    * side's deletion — so candidate generation is an equi-join on
    * neighborhood keys and NO pair below the distance bound can be missed.
    * Exact `levenshtein` verification inside buckets then makes the output
    * row-identical to the all-pairs oracle (false candidates are free to
    * appear; they cannot survive).
    *
    * This is the typo/near-variant dedup family shingle Jaccard cannot see
    * on SHORT keys (titles, URLs, product names): one edit in a 40-char
    * string moves word-shingle Jaccard barely at all in either direction,
    * while edit distance isolates it exactly.
    *
    * Shape at 100 TB: each string of length L emits L+1 keys, each hashed
    * to 8 bytes (xxhash64) before the shuffle — O(n·L) rows of fixed-width
    * keys, no string bytes on the wire for candidate generation. Hash
    * collisions only ADD candidates (verification removes them). Candidate
    * pairs are deduped by a keyed aggregate BEFORE strings are fetched;
    * the two id-keyed joins that fetch the strings touch survivors of the
    * key join only. Intended for bounded-length key columns (L ≲ 64 —
    * derive a title/URL column first); for long strings or d ≥ 2 the
    * L+1-key scheme gives way to pigeonhole segment indexing (PassJoin,
    * Li et al. 2011), which this operator deliberately does not need at
    * d = 1. */
  def editDistancePairs(df: DataFrame, idCol: String, strCol: String): DataFrame = {
    val strs = df.select(col(idCol).as("id"), col(strCol).as("t"))
      .where(length(col("t")) > 0)
    val keyed = strs.select(col("id"), explode(deletionKeys(col("t"))).as("k"))
    val cand = keyed.as("a").join(keyed.as("b"), Seq("k"))
      .where(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    cand
      .join(strs.select(col("id").as("id_a"), col("t").as("t_a")), Seq("id_a"))
      .join(strs.select(col("id").as("id_b"), col("t").as("t_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        levenshtein(col("t_a"), col("t_b")).cast("long").as("dist"))
      .where(col("dist") <= 1)
  }

  /** Two-table FastSS probe: fuzzy record linkage of a (dirty) probe feed
    * against a master catalog at Levenshtein ≤ 1 — the cross-table sibling
    * of [[editDistancePairs]], exactly as [[minhashProbePairs]] is the
    * cross-table sibling of the LSH self-join. Same deletion-neighborhood
    * exactness claim, same hashed-key equi-join shape; at cluster scale
    * the master's key table is built once and persisted (the linkage
    * index) while each arriving feed batch explodes only its own
    * neighborhoods. Emits (id_master, id_probe, dist) with no within-side
    * pairs. */
  def editDistanceProbePairs(
      master: DataFrame, probe: DataFrame,
      idCol: String, strCol: String): DataFrame = {
    def strs(df: DataFrame): DataFrame =
      df.select(col(idCol).as("id"), col(strCol).as("t"))
        .where(length(col("t")) > 0)
    def keyed(df: DataFrame): DataFrame =
      strs(df).select(col("id"), explode(deletionKeys(col("t"))).as("k"))
    val cand = keyed(master).as("a").join(keyed(probe).as("b"), Seq("k"))
      .select(col("a.id").as("id_master"), col("b.id").as("id_probe"))
      .distinct()
    cand
      .join(strs(master).select(col("id").as("id_master"), col("t").as("t_m")), Seq("id_master"))
      .join(strs(probe).select(col("id").as("id_probe"), col("t").as("t_p")), Seq("id_probe"))
      .select(col("id_master"), col("id_probe"),
        levenshtein(col("t_m"), col("t_p")).cast("long").as("dist"))
      .where(col("dist") <= 1)
  }

  /** 1-deletion neighborhood of `t`, each member xxhash64'd to a fixed
    * 8-byte key. Index 0 keeps the string itself (covers exact match and
    * the short side of insert/delete); i = 1..L deletes the i-th char.
    * array_distinct collapses the equal keys a run of repeated chars
    * produces, cutting join multiplicity before the explode. */
  private def deletionKeys(t: Column): Column =
    array_distinct(transform(
      sequence(lit(0), length(t)),
      i => xxhash64(when(i === 0, t)
        .otherwise(concat(t.substr(lit(1), i - 1), t.substr(i + 1, length(t)))))))

  /** SimHash fingerprints: one 16-bit content hash per doc; docs whose
    * fingerprints collide (or sit within small Hamming distance) are dup
    * candidates. Pure single-pass projection. */
  def simhashFingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // token hashes stay md5-derived (hash60) so a SQL oracle can reproduce
    // the fingerprint; the bit-voting runs in the native SimHash16 kernel.
    val toks = tokens(lower(col(textCol)))
    val hashes = transform(toks, t => hash60(t))
    docs.select(col(idCol), Sketch.column(SimHash16(Sketch.expr(hashes))).as("simhash"))
  }

  /** Embedding near-dup pairs: hyperplane-LSH bucketed candidates, exact
    * cosine verification.
    *
    * Recall bound (same convention as the MinHash 1−3e-15 case): with the
    * default 256 bands x 16 bits, a pair at exactly cos=0.9 shares a band
    * bit with p = 1 − acos(0.9)/π ≈ 0.8564, a whole band with p^16 ≈
    * 0.0838, and misses ALL bands with (1−p^16)^256 ≈ 1.9e-10 — pairs
    * above the threshold miss even more rarely, so the LSH output matches
    * the exact all-pairs oracle for all practical purposes. The price is
    * band-table width (256 keys/row, ~6 KB shuffled per row) and 4096
    * plane projections per row in the one-pass native kernel — the classic
    * recall/volume dial; at lower stakes, 64x8 cuts both 4x for a 1.7e-3
    * miss rate. Every bucket join stays a keyed shuffle, never a cross
    * product. */
  def embeddingNearDupPairs(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      threshold: Double,
      numBands: Int = 256,
      bitsPerBand: Int = 16): DataFrame = {
    val base = embeddings.select(
      col(idCol).as("id"),
      VectorFunctions.toDouble(col(vecCol)).as("v"))

    // Materialize the band table once: it feeds BOTH sides of the self-join,
    // and without the persist each side re-runs the 4096-projection kernel
    // over the full corpus (same "persist the signatures" rule as the
    // MinHash pipeline). The cached table is (id, band_id, band_key) longs —
    // ~24 B x bands per row — released by CacheScope after the consuming
    // action.
    val bandTable = base
      .withColumn("bkeys", Sketch.column(
        HyperplaneBandKeys(Sketch.expr(col("v")), numBands, bitsPerBand, dim)))
      .select(col("id"), posexplode(col("bkeys")))
      .withColumnRenamed("pos", "band_id")
      .withColumnRenamed("col", "band_key")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val candidates = bandTable.as("x")
      .join(bandTable.as("y"), Seq("band_id", "band_key"))
      .where(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()

    // exact-verify branch prunes to (id, v) — no kernel re-eval
    val vecs = base.select(col("id"), col("v"))
    val verified = candidates
      .join(vecs.as("va"), col("id_a") === col("va.id"))
      .join(vecs.as("vb"), col("id_b") === col("vb.id"))
      .select(col("id_a"), col("id_b"),
        Sketch.column(CosineSim(Sketch.expr(col("va.v")), Sketch.expr(col("vb.v")))).as("cos"))
      .where(col("cos") >= threshold)
    CacheScope.unpersistAfterUse(verified, bandTable)
  }

  /** Content-defined chunks: split each document at rolling-hash boundaries
    * ([[graft.expressions.ChunkBoundaries]]) and fingerprint every chunk.
    * Unlike fixed-width blocks, an insertion early in a document moves ONE
    * boundary — the same chunks re-align afterwards — so chunk fingerprints
    * survive edits and sub-document duplication (boilerplate headers,
    * quoted passages) becomes an exact groupBy instead of a fuzzy match.
    * Map-only: kernel pass + posexplode + substring/md5 per chunk. */
  def contentChunks(df: DataFrame, idCol: String, textCol: String,
      w: Int = 8, modulus: Int = 256): DataFrame = {
    val bounds = Sketch.column(ChunkBoundaries(Sketch.expr(col(textCol)), w, modulus))
    df.select(col(idCol), col(textCol).as("__text"), bounds.as("__bounds"))
      .select(col(idCol), col("__text"), col("__bounds"),
        posexplode(col("__bounds")).as(Seq("__idx", "__end")))
      .withColumn("chunk_idx", (col("__idx") + 1).cast("long"))
      .withColumn("chunk_off", when(col("__idx") === 0, lit(1L))
        .otherwise(element_at(col("__bounds"), col("__idx")) + 1L).cast("long"))
      .withColumn("chunk_len", (col("__end") - col("chunk_off") + 1L).cast("long"))
      .withColumn("chunk_md5",
        md5(col("__text").substr(col("chunk_off").cast("int"), col("chunk_len").cast("int"))))
      .select(col(idCol), col("chunk_idx"), col("chunk_off"), col("chunk_len"), col("chunk_md5"))
  }

  /** Connected components over a near-dup PAIR graph: cluster label = the
    * minimum doc id reachable through dup edges. Pair generation (LSH) says
    * "A~B, B~C"; survivor selection needs "{A,B,C} is one cluster, keep
    * exactly one" — transitive closure, not pairs.
    *
    * Iterative min-label propagation: each round every vertex takes the min
    * of its own and its neighbors' labels (one keyed shuffle of the EDGE
    * table per round), until a fixpoint. The graph here is only the dup
    * pairs — a vanishing fraction of the corpus — and near-dup components
    * are shallow (chains of transitive near-dups), so rounds ≈ component
    * diameter stays small; the fixpoint check is one bounded count() per
    * round. For adversarially deep graphs the published fix is alternating
    * large/small-star pointer doubling (O(log D) rounds, same per-round
    * shuffle shape) — the swap-in if a corpus ever produces long chains.
    *
    * Returns (vertex, cluster) for every vertex that appears in `pairs`;
    * cluster = min id of the component, so `vertex == cluster` marks the
    * kept representative. */
  def connectedComponents(
      pairs: DataFrame, aCol: String, bCol: String, maxIter: Int = 20): DataFrame = {
    // materialize the pair pipeline ONCE before mirroring: the union below
    // references `pairs` twice, and without this barrier the (potentially
    // expensive — LSH) pair generation would execute once per branch
    val p = pairs.select(col(aCol).as("src"), col(bCol).as("dst")).localCheckpoint(true)
    val edges = p.union(p.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist()
    edges.count() // materialize before the loop
    // each iteration MUST truncate lineage (localCheckpoint), not just
    // persist: a persisted frame keeps its full logical plan, and the loop
    // references `labels` three times per round — the analyzed tree grows
    // exponentially and a 12-round chain OOMs the driver just STRINGIFYING
    // the plan. With LogicalRDD-backed labels the per-round plan is flat.
    var labels = edges.select(col("src").as("v")).distinct()
      .withColumn("lab", col("v"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val nbrMin = edges.join(labels, edges("src") === labels("v"))
        .groupBy(col("dst").as("u")).agg(min("lab").as("nlab"))
      // chg is computed INLINE (nlab < old lab ⟺ the fold lowered the
      // label) and counted by the fused materialize+count (r16) — the
      // previous form re-joined next against labels and ran a second
      // whole-frame job per round just to learn the changed count
      val (next, _, nChg) = org.apache.spark.sql.graftshim.GraftBridge
        .localCheckpointCount(
          labels.join(nbrMin, labels("v") === col("u"), "left")
            .select(col("v"),
              least(col("lab"), coalesce(col("nlab"), col("lab"))).as("lab"),
              coalesce(col("nlab") < col("lab"), lit(false)).as("chg")),
          Some("chg"))
      labels = next.select("v", "lab") // superseded blocks freed by the ContextCleaner
      converged = nChg == 0
      iter += 1
    }
    edges.unpersist(false)
    // an unconverged result would be silently WRONG labels (a component
    // wider than maxIter rounds) — fail loudly; the fix for such graphs is
    // the alternating-star pointer-doubling variant, not a bigger maxIter
    require(converged,
      s"connected components did not converge in $maxIter rounds — " +
        "component diameter exceeds the propagation budget; use " +
        "connectedComponentsStar for deep graphs (O(log d) rounds)")
    labels.select(col("v"), col("lab").as("cluster"))
  }

  /** Connected components by alternating large-star / small-star pointer
    * doubling — O(log d) rounds in the component diameter d, vs the O(d)
    * of [[connectedComponents]]'s min-label propagation. This is the
    * adversarial-graph-safe default: a pathological template family
    * producing a 1000-long chain of transitive near-dups finishes in ~10
    * rounds here where propagation would need 1000 (and `require`-fails at
    * its budget). Per round it costs two keyed aggregates + two joins over
    * the EDGE table (still only the dup pairs, a vanishing fraction of the
    * corpus) — roughly twice propagation's per-round shuffle work, bought
    * back exponentially in round count.
    *
    * The two operations (after Kiveris et al., "Connected Components in
    * MapReduce and Beyond", where their convergence + correctness proofs
    * live):
    *  - large-star: every vertex u connects each STRICTLY LARGER neighbor
    *    to the minimum of its closed neighborhood min(N(u) ∪ {u}).
    *  - small-star: orient every edge large→small; every vertex u connects
    *    its (now all smaller) neighbors and itself to their minimum.
    * Both preserve connectivity; alternating them reaches a fixpoint where
    * the edge set IS the star forest (u → component-min). Fixpoint is
    * detected by an order-invariant set checksum (count + bit-XOR of
    * xxhash64(u,v) — the edge sets are canonical-oriented and distinct),
    * then VERIFIED structurally: one parent per child, no root that is
    * itself a child — so a checksum collision cannot smuggle out wrong
    * labels. Same localCheckpoint-per-round lineage truncation as the
    * propagation loop (a persisted frame keeps its full logical plan; the
    * analyzed tree otherwise grows exponentially with rounds).
    *
    * Returns (v, cluster) for every vertex in `pairs`, cluster = component
    * min — same contract as [[connectedComponents]]. */
  def connectedComponentsStar(
      pairs: DataFrame, aCol: String, bCol: String, maxIter: Int = 35): DataFrame = {
    def largeStar(e: DataFrame): DataFrame = {
      val und = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = und.groupBy("u").agg(min("v").as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      und.join(mins, "u")
        .where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v"))
        .distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      val oriented = e.select(
        greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      val mins = oriented.groupBy("u").agg(min("v").as("m"))
      oriented.join(mins, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .union(mins.select(col("u"), col("m").as("v")))
        .where(col("u") =!= col("v"))
        .distinct()
    }
    // the (count, bit-XOR of xxhash64(u,v)) set checksum rides the
    // materialization job itself (r16, GraftBridge.localCheckpointXor) —
    // the previous form ran a second whole-frame aggregate per round
    def checkpointWithChecksum(e: DataFrame): (DataFrame, (Long, Long)) = {
      val (f, n, x) = org.apache.spark.sql.graftshim.GraftBridge
        .localCheckpointXor(
          e.withColumn("h", xxhash64(col("u"), col("v"))), "h")
      (f.select("u", "v"), (n, x))
    }
    val (edges0, cs0) = checkpointWithChecksum(
      pairs.where(col(aCol) =!= col(bCol))
        .select(greatest(col(aCol), col(bCol)).as("u"),
          least(col(aCol), col(bCol)).as("v"))
        .distinct())
    var edges = edges0
    // vertices appearing ONLY in degenerate self-pairs keep their own label
    // (the mirror of propagation's behavior); a vertex with BOTH a self-pair
    // and real edges gets its label from the star forest alone — emitting
    // both would produce two labels for one vertex (caught by the
    // union-find property spec)
    val realVerts = edges.select(col("u").as("v"))
      .union(edges.select(col("v"))).distinct()
    val selfLabels = pairs.where(col(aCol) === col(bCol))
      .select(col(aCol).as("v"), col(aCol).as("cluster")).distinct()
      .join(realVerts, Seq("v"), "left_anti")
    var cs = cs0
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val (next, nextCs) = checkpointWithChecksum(smallStar(largeStar(edges)))
      converged = nextCs == cs
      edges = next
      cs = nextCs
      iter += 1
    }
    require(converged,
      s"star CC did not converge in $maxIter rounds — at O(log d) rounds " +
        "this means a graph far beyond any real dup component; investigate")
    // structural verification of star-ness (checksum-collision guard):
    // every child has exactly one parent, and no parent is also a child
    val badParents = edges.groupBy("u").agg(countDistinct("v").as("nv"))
      .where(col("nv") > 1).count()
    require(badParents == 0L, s"star CC fixpoint is not a forest: $badParents vertices with >1 parent")
    val rootAsChild = edges.select(col("v")).intersect(edges.select(col("u"))).count()
    require(rootAsChild == 0L, s"star CC fixpoint has $rootAsChild non-root parents")
    edges.select(col("u").as("v"), col("v").as("cluster"))
      .union(edges.select(col("v").as("v"), col("v").as("cluster")))
      .union(selfLabels)
      .distinct()
  }

  /** Cross-document duplicated chunks: every chunk fingerprint seen in more
    * than one document, with its spread. One keyed shuffle over the chunk
    * fingerprints (KB per doc), map-side partials — the sub-document twin
    * of [[exactByFingerprint]]. */
  def duplicatedChunks(df: DataFrame, idCol: String, textCol: String,
      w: Int = 8, modulus: Int = 256): DataFrame =
    contentChunks(df, idCol, textCol, w, modulus)
      .groupBy("chunk_md5")
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col(idCol)).as("n_docs"),
        min(col(idCol)).as("first_doc"),
        max(col(idCol)).as("last_doc"))
      .where(col("n_docs") > 1)
}
