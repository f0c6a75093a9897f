package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DynamoDB-stream shard resume filtering — the third member of the replay-
  * guard family (GTID sets → [[GtidResume]], binlog file+pos →
  * [[BinlogResume]]), with deliberately DIFFERENT semantics the reference
  * encodes per source:
  *
  * Reference: sources/dynamodb/stream/shard.go:63-87 — a shard with a
  * stored LastProcessedSequenceNumber resumes with iterator type
  * `AfterSequenceNumber` (STRICTLY after — the stored row itself was
  * committed, unlike GTID/binlog where the watermark row replays);
  * an unseen shard starts at `TrimHorizon` (everything passes); a shard
  * marked processed is skipped wholesale (shard.go:65-68). Offsets are
  * per-shard (offsets/offsets.go:79-90).
  *
  * Sequence numbers are unsigned decimal STRINGS of varying length
  * (AWS emits up to 40 digits — past any integer type), so ordering is
  * (length, lexicographic): "1000" > "999" even though it sorts first as a
  * plain string. Getting this wrong silently replays or skips ~10% of
  * rows at every length boundary, which is why the spec pins it.
  *
  * Same scale shape as the other guards: the watermark table is one row
  * per shard, broadcast; the stream side never shuffles. */
object ShardResume {

  /** Numeric-string strictly-greater: a > b for non-negative decimal
    * strings of any length (no leading zeros, per AWS sequence format). */
  private def seqGt(a: Column, b: Column): Column =
    (length(a) > length(b)) || (length(a) === length(b) && a > b)

  /** Keep the rows a resumed shard consumer must process. `seen` carries
    * (shard_id string, last_seq string nullable, processed boolean):
    *  - shards absent from `seen` pass everything (TrimHorizon);
    *  - processed shards pass nothing;
    *  - otherwise strictly-after the stored sequence number.
    * Rows with a NULL shard or sequence are EXCLUDED (unroutable). */
  def shouldProcess(rows: DataFrame, shardCol: String, seqCol: String,
      seen: DataFrame): DataFrame = {
    val wm = seen.select(col("shard_id").as("__wm_shard"),
      col("last_seq").as("__wm_seq"), col("processed").as("__wm_done"))
    rows
      .join(broadcast(wm), col(shardCol) === col("__wm_shard"), "left")
      .where(col(shardCol).isNotNull && col(seqCol).isNotNull &&
        !coalesce(col("__wm_done"), lit(false)) &&
        (col("__wm_seq").isNull || seqGt(col(seqCol), col("__wm_seq"))))
      .drop("__wm_shard", "__wm_seq", "__wm_done")
  }
}
