package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable fixed-width histogram quantiles — the bounded-state companion
  * to the exact interpolated percentiles of `agg_stats`.
  *
  * Exact per-group percentiles materialize every value of the group on one
  * node (Spark's `percentile` collects a per-group value buffer; at 100 TB a
  * hot group is a straight OOM). The histogram sketch replaces that with the
  * classic two-level shape:
  *
  *   1. `bucket = floor(value / width)` — pure arithmetic, map-side;
  *   2. `groupBy(keys, bucket).count()` — ONE keyed shuffle whose cardinality
  *      is `|keys| x |buckets|`, independent of row count; partial
  *      aggregation makes the map-side combine free;
  *   3. a per-key cumulative walk over the (tiny) bucket table picks, for
  *      each requested rank, the first bucket whose cumulative count reaches
  *      it.
  *
  * The histogram is mergeable exactly like the HLL register file
  * (element-wise ADD instead of element-wise MAX), so the same estimate
  * falls out no matter how the input was partitioned, and the whole
  * construction is integer/IEEE-deterministic — the DuckDB oracle replays
  * it verbatim rather than trusting a claim.
  *
  * The estimate is the chosen bucket's UPPER edge: the rank-r order
  * statistic is structurally inside the bucket, so
  * `est - width <= exact_r <= est` always holds — inclusive on BOTH ends,
  * because a value exactly on a bucket edge sits at est - width (that claim
  * is emitted by the query as the `ok` column).
  *
  * Rank definition: `r = ceil(q * n)` with q carried as DECIMAL(3,2) so the
  * product is exact (a double 0.9*n rounds across the integer boundary for
  * some n and engines disagree at the edge).
  *
  * Reference behavior being re-expressed: reader's downstream consumers
  * compute latency/size distribution summaries over CDC streams; this is
  * the bounded-memory form of those rank statistics.
  */
object QuantileHist {

  /** (keys..., q DECIMAL(3,2), r BIGINT, n BIGINT) — one row per key x q. */
  private def rankTargets(df: DataFrame, keys: Seq[String], qs: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("q", explode(array(qs.map(q => lit(q).cast("decimal(3,2)")): _*)))
      .withColumn("r", ceil(col("q") * col("n")).cast("long"))

  /** Histogram-estimated quantiles: (keys..., q DOUBLE, est DOUBLE).
    *
    * `qs` are passed as strings ("0.25") so they enter the plan as exact
    * decimals, never as already-rounded doubles.
    */
  def estimate(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      width: Double,
      qs: Seq[String]): DataFrame = {
    val hist = df
      .groupBy((keys.map(col) :+ floor(col(valueCol) / lit(width)).cast("long").as("bucket")): _*)
      .agg(count(lit(1)).as("cnt"))
    val byKey = Window.partitionBy(keys.map(col): _*).orderBy("bucket")
    val cum = hist.withColumn("cum", sum("cnt").over(byKey))
    // first bucket whose cumulative count reaches the rank target = min
    // surviving bucket after the >= filter — one keyed agg, no sort-limit
    rankTargets(df, keys, qs)
      .join(cum, keys)
      .where(col("cum") >= col("r"))
      .groupBy((keys.map(col) :+ col("q")): _*)
      .agg(min(col("bucket")).as("est_bucket"))
      .select((keys.map(col) :+
        col("q").cast("double").as("q") :+
        ((col("est_bucket") + 1) * lit(width)).as("est")): _*)
  }

  /** The exact rank-r order statistic for each (key, q) — the verification
    * side. This IS the expensive per-group sort the sketch exists to avoid;
    * it rides along in the query (like `sketch_distinct`'s exact
    * countDistinct) so the driver's hash compare pins the estimate against
    * ground truth instead of trusting it. */
  def exactRankValue(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      qs: Seq[String]): DataFrame = {
    val ranked = df
      .select((keys.map(k => col(k).as(s"rk_$k")) :+ col(valueCol).as("v")): _*)
      .withColumn("rn", row_number().over(
        Window.partitionBy(keys.map(k => col(s"rk_$k")): _*).orderBy(col("v"))))
    rankTargets(df, keys, qs)
      .join(ranked,
        keys.map(k => col(k) === col(s"rk_$k")).reduce(_ && _) && col("rn") === col("r"))
      .select((keys.map(col) :+
        col("q").cast("double").as("q") :+
        col("v").as("exact_v")): _*)
  }
}
