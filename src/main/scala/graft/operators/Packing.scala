package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
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
  * is an EXACT two-phase prefix sum (same pattern as
  * [[graft.sources.SnapshotScan.rankBoundaries]]): range-partition by the
  * global order, phase 1 ships ONE long per partition to the driver
  * (partition token totals -> exact starting offset per partition), phase 2
  * streams each partition once adding its offset. Driver traffic is P
  * longs; no partition ever holds more than its slice.
  */
object Packing {

  /** @return (idCol, lenCol, cum_tokens, batch_id) — one row per input doc.
    * `lenCol` must be non-negative. */
  def packByTokenBudget(
      df: DataFrame,
      idCol: String,
      lenCol: String,
      budget: Long,
      numPartitions: Int = 32): DataFrame = {
    require(budget > 0)
    val spark = df.sparkSession
    import spark.implicits._

    val sorted: Dataset[(Long, Long)] = df
      .select(col(idCol).cast("long"), col(lenCol).cast("long"))
      .as[(Long, Long)]
      .repartitionByRange(numPartitions, col(lenCol).desc, col(idCol))
      .sortWithinPartitions(col(lenCol).desc, col(idCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // phase 1: one token-total long per partition -> exact global offsets
    val partTotals = sorted.mapPartitions { it =>
      Iterator.single((org.apache.spark.TaskContext.getPartitionId(), it.map(_._2).sum))
    }.collect().toMap
    val maxPid = if (partTotals.isEmpty) -1 else partTotals.keysIterator.max
    val offsets = new Array[Long](maxPid + 2)
    (0 to maxPid).foreach(p => offsets(p + 1) = offsets(p) + partTotals.getOrElse(p, 0L))

    // phase 2: stream each partition once with its known starting offset.
    // The persist is released by the first action on the RESULT (phase 2 is
    // lazy — an eager unpersist here would force a recompute of the sort).
    val packed = sorted.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var cum = offsets(pid)
      it.map { case (id, len) =>
        cum += len
        (id, len, cum, (cum - 1) / budget)
      }
    }.toDF(idCol, lenCol, "cum_tokens", "batch_id")
    CacheScope.unpersistAfterUse(packed, sorted.toDF())
  }
}
