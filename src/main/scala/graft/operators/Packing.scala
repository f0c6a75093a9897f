package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assemble documents into fixed-token-budget training
  * batches. The assignment is a running token total over a deterministic
  * global order (length-descending, id tie-break) with
  * `batch_id = (cum - 1) div budget` — contiguous greedy packing, so every
  * batch holds ~budget tokens and the layout is byte-reproducible across
  * reruns (the property a training job needs to resume mid-epoch).
  *
  * The naive encoding — a running sum over an unpartitioned window — is the
  * single-partition scale-killer PlanHygieneSpec bans. The distributed form
  * here decomposes the prefix sum ALGEBRAICALLY instead of relying on a
  * physical partitioning:
  *
  *   cum(doc) = tokensInLongerDocs(len) + len * rankWithinLen(id)
  *
  * where the first term comes from a per-length aggregate (distinct length
  * values are bounded by the longest document, so the suffix-sum table is
  * KB-scale and broadcast), and the second is a window partitioned by
  * length. Nothing depends on partition ids or cached physical layout, so
  * the result is identical under recomputation, AQE re-planning, or any
  * partition count — unlike a repartitionByRange+mapPartitions offset scheme,
  * whose driver-collected offsets silently go stale if the range sampling
  * re-runs.
  */
object Packing {

  /** @return (idCol, lenCol, cum_tokens, batch_id) — one row per input doc.
    * `lenCol` must be non-negative. */
  def packByTokenBudget(
      df: DataFrame,
      idCol: String,
      lenCol: String,
      budget: Long): DataFrame = {
    require(budget > 0)
    val docs = df.select(col(idCol).cast("long").as(idCol),
      col(lenCol).cast("long").as(lenCol))

    // per-length totals (one keyed agg, map-side partials) -> driver-side
    // suffix sums over length DESC = tokens packed before the first doc of
    // each length. Distinct lengths are bounded by the longest document
    // (same bounded-driver-state argument as Ann.trainCentroids), so the
    // offset table is KB-scale: broadcast it back.
    val perLen = docs.groupBy(col(lenCol))
      .agg(sum(col(lenCol)).as("__len_total"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(-_._1)
    val before = perLen.scanLeft(0L)(_ + _._2)
    val spark = df.sparkSession
    import spark.implicits._
    val offsets = perLen.map(_._1).zip(before).toSeq
      .toDF(lenCol, "__before")

    val wRank = Window.partitionBy(col(lenCol)).orderBy(col(idCol))
    docs
      .join(broadcast(offsets), Seq(lenCol))
      .withColumn("__rn", row_number().over(wRank))
      .withColumn("cum_tokens", col("__before") + col(lenCol) * col("__rn"))
      .withColumn("batch_id", expr(s"(greatest(cum_tokens, 1L) - 1) div ${budget}L"))
      .select(col(idCol), col(lenCol), col("cum_tokens"), col("batch_id"))
  }
}
