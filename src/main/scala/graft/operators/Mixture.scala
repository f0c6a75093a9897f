package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic data-mixture rebalancing — thin each source to hit a
  * target mixture WITHOUT upsampling (no document repeats).
  *
  * Training corpora are blended from sources with target proportions
  * (web/books/code/...); the raw crawl never arrives in those proportions.
  * Given per-source weights w_s, the largest corpus achievable with
  * keep-rates ≤ 1 everywhere is N* = W · M where M = min_s(n_s / w_s)
  * (the binding source is kept whole). The per-source keep rate is then
  *
  *   rate_s = w_s · M / n_s   (= share_s · N* / n_s, the W cancels)
  *
  * and each row is kept by a REPLAYABLE Bernoulli draw: a 60-bit integer
  * from md5(id), scaled to [0,1), compared against the rate — the same
  * arithmetic the oracle runs, so the exact kept-set (not just its size)
  * is deterministic across engines, partitionings, and reruns.
  *
  * Cost at 100 TB: one tiny keyed agg for per-source counts, a one-row
  * (M, W) aggregate broadcast onto the |sources|-row rate table, the rate
  * table broadcast onto the corpus, and a map-only filter. Nothing wide
  * ever shuffles.
  */
object Mixture {

  private val Scale60 = 1152921504606846976d // 2^60, exact as a double

  /** Uniform [0,1) from the first 60 bits of md5(id) — the corpus-wide
    * replayable coin. DuckDB replays it as
    * `('0x' || substr(md5(id), 1, 15))::BIGINT / 2^60`. */
  def unitHash(id: Column): Column =
    conv(substring(md5(id), 1, 15), 16, 10).cast("long").cast("double") / lit(Scale60)

  /** (source, n_src, share, keep_rate) — one row per source. `weights` is
    * (sourceCol, w DOUBLE); weights need not be normalized. */
  def rates(df: DataFrame, sourceCol: String, weights: DataFrame): DataFrame = {
    val counts = df.groupBy(sourceCol).agg(count(lit(1)).as("n_src"))
      .join(weights, Seq(sourceCol))
    // one-row (M, W) broadcast onto the |sources|-row frame: the single-row
    // side makes the nested loop O(|sources|) map-side
    val scalars = counts.agg(
      min(col("n_src") / col("w")).as("m"),
      sum(col("w")).as("wsum"))
    counts.crossJoin(broadcast(scalars))
      .select(
        col(sourceCol),
        col("n_src"),
        (col("w") / col("wsum")).as("share"),
        least(lit(1.0), col("w") * col("m") / col("n_src")).as("keep_rate"))
  }

  /** The thinned corpus: rows whose replayable coin lands under their
    * source's keep rate. `id` must be a string column (hash input). */
  def rebalance(df: DataFrame, sourceCol: String, id: Column,
      weights: DataFrame): DataFrame = {
    val r = rates(df, sourceCol, weights).select(sourceCol, "keep_rate")
    df.join(broadcast(r), Seq(sourceCol))
      .where(unitHash(id) < col("keep_rate"))
      .drop("keep_rate")
  }
}
