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
}
