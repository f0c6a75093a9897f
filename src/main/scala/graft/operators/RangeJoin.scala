package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range join (point-in-interval) without a nested loop.
  *
  * Declared naively (`p >= start AND p < end` with no equi-key), Spark can
  * only plan BroadcastNestedLoopJoin or a cartesian product — quadratic the
  * moment both sides are large. The standard scalable encoding buckets the
  * domain:
  *
  *   - a point belongs to exactly ONE bucket: floor(p / w);
  *   - an interval is EXPLODED to every bucket it overlaps
  *     (floor(start/w) .. floor((end-1)/w) for end-exclusive intervals);
  *   - the join becomes an equi-join on bucket plus the exact range
  *     predicate as a post-filter.
  *
  * Each (point, interval) pair meets in at most one bucket (the point's),
  * so no dedup pass is needed. Shuffle volume is O(points + intervals x
  * avg_buckets_spanned) — pick `bucketWidth` near the typical interval
  * length so avg span is ~2. Skewed buckets split under AQE like any
  * equi-join. This is the same family trick as the as-of join's union
  * encoding: turn an order/range predicate into a keyed shuffle Catalyst
  * already optimizes well.
  *
  * Reference anchor: the brief's custom-operator list (as-of join, RANGE
  * join); reader itself correlates CDC rows to time windows downstream.
  */
object RangeJoin {

  /** Inner join of `points` to end-exclusive `intervals`:
    * every (point row, interval row) with start <= p < end.
    * `pointCol`/`startCol`/`endCol` are integral (days, seconds, micros —
    * any consistent unit). Columns from both inputs survive. */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def b(c: Column): Column = floor(c / lit(bucketWidth)).cast("long")
    val p = points.withColumn("__bucket", b(col(pointCol)))
    val iv = intervals
      .withColumn("__bucket",
        explode(sequence(b(col(startCol)),
          b(greatest(col(endCol) - 1, col(startCol))))))
    p.join(iv, Seq("__bucket"))
      .where(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bucket")
  }

  /** Interval-INTERVAL overlap join: every (a row, b row) with
    * a.start < b.end AND b.start < a.end (end-exclusive overlap — the
    * temporal-join predicate for validity windows, sessions, SCD-2
    * histories). Same bucket encoding, but both sides explode to their
    * spanned buckets, so an overlapping pair can now meet in EVERY shared
    * bucket. Instead of a distinct pass over the join output (a second
    * corpus-sized shuffle), each pair is CLAIMED by exactly one bucket —
    * the bucket of max(a.start, b.start), which both rows provably span
    * whenever they overlap (it lies in [start, end) of each) — via a
    * post-filter on bucket == floor(greatest(sa, sb) / w). Shuffle is
    * O(Σ spans); no dedup shuffle exists at any scale. */
  def intervalOverlap(
      a: DataFrame,
      b: DataFrame,
      aStart: String, aEnd: String,
      bStart: String, bEnd: String,
      bucketWidth: Long,
      keyCols: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def bk(c: Column): Column = floor(c / lit(bucketWidth)).cast("long")
    def spanned(df: DataFrame, s: String, e: String): DataFrame =
      df.withColumn("__bucket",
        explode(sequence(bk(col(s)), bk(greatest(col(e) - 1, col(s))))))
    spanned(a, aStart, aEnd)
      .join(spanned(b, bStart, bEnd), keyCols :+ "__bucket")
      .where(col(aStart) < col(bEnd) && col(bStart) < col(aEnd) &&
        col("__bucket") === bk(greatest(col(aStart), col(bStart))))
      .drop("__bucket")
  }
}
