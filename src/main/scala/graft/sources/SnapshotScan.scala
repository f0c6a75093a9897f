package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PK-range chunked snapshot scan — the Spark-native re-expression of
  * reader's keyset pagination (reference: lib/rdbms/scan/scan.go:43-116,
  * lib/postgres/scanner.go).
  *
  * Reader walks a table sequentially: `WHERE pk > $last ORDER BY pk LIMIT
  * batchSize`, carrying the last-seen key forward batch by batch. That shape
  * is inherently serial. The Spark equivalent computes the PK span once
  * (the same bounds discovery reader does on its first batch /
  * OptionalStartingValues overrides, scan.go:44-55) and emits one
  * *predicate-pushed* range scan per chunk:
  *
  *   - each chunk's `pk >= lo AND pk < hi` filter reaches the parquet
  *     row-group stats (PushedFilters in the plan) — the columnar analogue
  *     of an index range seek;
  *   - chunks are independent, so a 1000-executor cluster schedules them all
  *     at once instead of walking the keyspace serially;
  *   - against a JDBC source the identical split drives
  *     partitionColumn/lowerBound/upperBound/numPartitions.
  */
object SnapshotScan {

  final case class PkBounds(min: Long, max: Long) {
    def span: Long = max - min + 1
  }

  /** Bounds discovery: one tiny agg job (two longs to the driver), exactly
    * the information reader's scanner state machine tracks. */
  def pkBounds(df: DataFrame, pkCol: String): PkBounds = {
    val row = df.agg(min(col(pkCol)).cast("long"), max(col(pkCol)).cast("long")).head()
    PkBounds(row.getLong(0), row.getLong(1))
  }

  /** Uniform-width chunk id for a key: `(pk - min) div chunkWidth` with
    * `chunkWidth = ceil(span / numChunks)`. Pure arithmetic, so an external
    * oracle can reproduce the assignment. */
  def chunkWidth(bounds: PkBounds, numChunks: Int): Long =
    (bounds.span + numChunks - 1) / numChunks

  /** The chunked scan: a union of per-chunk range-filtered reads, each
    * tagged with its chunk id. `base` should be the raw scan (or a cheap
    * projection of it) so each branch's range predicate pushes down. */
  def chunked(base: DataFrame, pkCol: String, bounds: PkBounds, numChunks: Int): DataFrame = {
    val w = chunkWidth(bounds, numChunks)
    val pk: Column = col(pkCol)
    (0 until numChunks)
      .map { i =>
        val lo = bounds.min + i.toLong * w
        val hi = lo + w
        base.where(pk >= lo && pk < hi).withColumn("chunk_id", lit(i.toLong))
      }
      .reduce(_.unionAll(_))
  }

  /** Quantile-balanced chunk boundaries: uniform key-width splits collapse
    * when the PK space is sparse/skewed (a hot insert range = one giant
    * chunk). approxQuantile gives near-equal ROW counts per chunk for the
    * cost of one sketch pass — the same reason reader re-pages by observed
    * last-row keys rather than fixed arithmetic strides (scan.go:100-116
    * UpdateStartingValue). Returns numChunks+1 ascending boundaries. */
  def quantileBoundaries(df: DataFrame, pkCol: String, numChunks: Int): Array[Long] = {
    val probs = (0 to numChunks).map(_.toDouble / numChunks).toArray
    val qs = df.stat.approxQuantile(pkCol, probs, 0.001).map(_.toLong)
    qs(qs.length - 1) = qs.last + 1 // make the final bound exclusive-safe
    qs
  }

  /** Chunked scan over explicit ascending boundaries: chunk i covers
    * [bounds(i), bounds(i+1)). */
  def chunkedByBoundaries(base: DataFrame, pkCol: String, boundaries: Array[Long]): DataFrame = {
    val pk: Column = col(pkCol)
    boundaries.sliding(2).zipWithIndex.map { case (Array(lo, hi), i) =>
      base.where(pk >= lo && pk < hi).withColumn("chunk_id", lit(i.toLong))
    }.reduce(_.unionAll(_))
  }

  /** Single-scan chunk assignment for an already-columnar source: ONE pass,
    * chunk id as pure arithmetic `(pk - min) div width`. [[chunked]]'s
    * union-of-range-scans exists to map chunks onto an external paging
    * source (JDBC partitions); over parquet it re-plans the scan N times for
    * something a projection computes — at thousands of chunks that is plan
    * blowup for zero I/O benefit. */
  def chunkedSingleScan(
      base: DataFrame, pkCol: String, bounds: PkBounds, numChunks: Int): DataFrame = {
    val w = chunkWidth(bounds, numChunks)
    base
      .where(col(pkCol) >= bounds.min && col(pkCol) <= bounds.max)
      // integer `div`, not `/`+cast: double division loses exactness near
      // 2^53 and can round a quotient across an integer boundary, assigning
      // the wrong chunk for extreme key offsets
      .withColumn("chunk_id", expr(s"(cast($pkCol as bigint) - ${bounds.min}L) div ${w}L"))
  }

  // ---- composite / non-numeric primary keys ----
  // Reference: lib/rdbms/primary_key/primary_keys.go:14-97 — Keys holds an
  // ORDERED list of (name, startingValue, endingValue); scan progress and
  // start/end overrides compare keys lexicographically (keyset pagination
  // `WHERE (k1,k2) > (v1,v2)`). The Spark re-expression keeps the same
  // tuple order semantics as composable Column predicates, so they push
  // into the scan like any other filter.

  /** Lexicographic (row-value) `(k1,...,kn) >= (v1,...,vn)`:
    * k1 > v1 OR (k1 = v1 AND (k2,...) >= (v2,...)). */
  def lexGte(pkCols: Seq[String], values: Seq[Any]): Column = {
    require(pkCols.nonEmpty && pkCols.length == values.length)
    val k = col(pkCols.head); val v = lit(values.head)
    if (pkCols.length == 1) k >= v
    else (k > v) || (k === v && lexGte(pkCols.tail, values.tail))
  }

  /** Lexicographic `(k1,...,kn) <= (v1,...,vn)`. */
  def lexLte(pkCols: Seq[String], values: Seq[Any]): Column = {
    require(pkCols.nonEmpty && pkCols.length == values.length)
    val k = col(pkCols.head); val v = lit(values.head)
    if (pkCols.length == 1) k <= v
    else (k < v) || (k === v && lexLte(pkCols.tail, values.tail))
  }

  /** Start/end overrides on a composite key (primary_keys.go LoadValues):
    * scan only the lexicographic window [start, end], both inclusive like
    * the reference's StartingValue/EndingValue. */
  def compositeRange(
      base: DataFrame,
      pkCols: Seq[String],
      start: Option[Seq[Any]],
      end: Option[Seq[Any]]): DataFrame = {
    val lo = start.map(lexGte(pkCols, _)).getOrElse(lit(true))
    val hi = end.map(lexLte(pkCols, _)).getOrElse(lit(true))
    base.where(lo && hi)
  }

  /** Chunk id for ascending lexicographic boundary tuples: the number of
    * boundaries at or below the row's key. A handful of boundaries unrolls
    * to a when-chain the optimizer codegens — single scan, map-side only,
    * no join and no window. Boundary k sends keys in
    * [boundaries(k-1), boundaries(k)) to chunk k; keys below the first
    * boundary land in chunk 0. */
  def lexChunkId(pkCols: Seq[String], boundaries: Seq[Seq[Any]]): Column =
    boundaries
      .map(b => when(lexGte(pkCols, b), 1L).otherwise(0L))
      .reduceOption(_ + _)
      .getOrElse(lit(0L))

  /** Single-scan chunked read on a composite (or any orderable) key. */
  def chunkedComposite(
      base: DataFrame, pkCols: Seq[String], boundaries: Seq[Seq[Any]]): DataFrame =
    base.withColumn("chunk_id", lexChunkId(pkCols, boundaries))

  /** Deterministic rank-based boundaries for a string/UUID (or any
    * orderable) key: the key VALUES at ranks `1 + i*n/numChunks` of the
    * total order — values at a rank are well-defined even under ties, so
    * the assignment is exactly reproducible by an external oracle.
    *
    * Scale shape (no global sort, no unpartitioned window): distinct-key
    * counts (one keyed shuffle with map-side partials) are range-partitioned
    * and sorted per partition; phase 1 ships ONE long per partition to the
    * driver (partition totals → exact global rank offsets), phase 2 walks
    * each partition's sorted keys with its known starting rank and emits
    * only the keys covering a target rank. Driver traffic is P longs +
    * numChunks-1 boundary keys — the same merge RangePartitioner performs,
    * but on exact counts, so the result is byte-reproducible by a SQL
    * oracle's row_number. */
  def rankBoundaries(
      df: DataFrame, keyCol: String, numChunks: Int, numPartitions: Int = 32): Seq[String] = {
    import df.sparkSession.implicits._
    val cnts = df.select(col(keyCol).cast("string").as("k"))
      .groupBy("k").agg(count(lit(1)).as("cnt"))
      .repartitionByRange(numPartitions, col("k"))
      .sortWithinPartitions("k")
      .as[(String, Long)]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val partTotals = cnts.mapPartitions { it =>
        Iterator.single((org.apache.spark.TaskContext.getPartitionId(), it.map(_._2).sum))
      }.collect().toMap
      val n = partTotals.valuesIterator.sum
      if (n == 0L) return Seq.empty
      val maxPid = if (partTotals.isEmpty) -1 else partTotals.keysIterator.max
      val offsets = new Array[Long](maxPid + 2)
      (0 to maxPid).foreach(p => offsets(p + 1) = offsets(p) + partTotals.getOrElse(p, 0L))
      val targets = (1 until numChunks).map(i => 1L + i * n / numChunks).distinct.sorted.toArray
      cnts.mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        var cum = offsets(pid)
        // keys and targets are both sorted ascending, so a single advancing
        // index merges them in O(keys + targets) — scanning all targets per
        // key would be O(keys x targets), quadratic at 100 TB key counts
        var ti = java.util.Arrays.binarySearch(targets, cum + 1) match {
          case found if found >= 0 => found
          case ins => -ins - 1
        }
        it.flatMap { case (k, c) =>
          cum += c
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
          while (ti < targets.length && targets(ti) <= cum) {
            out += ((targets(ti), k))
            ti += 1
          }
          out
        }
      }.collect().sortBy(_._1).map(_._2).toSeq
    } finally cnts.unpersist(blocking = false)
  }
}
