package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** GTID-based resume filtering — the replay guard a resumed MySQL CDC
  * stream applies to its first batches.
  *
  * Reference: lib/mysql/gtid.go:11-52 (ShouldProcessRow): a row tagged
  * `sid:txid` is processed iff
  *   - no GTID set has been seen yet (fresh stream), or
  *   - its source id (sid) has never been seen, or
  *   - its transaction id >= the highest txid recorded for that sid.
  *
  * Reader evaluates this per row against an in-memory GTID set; the Spark
  * re-expression joins the stream against the checkpointed watermark table
  * (sid -> highest txid, the GTID-set's interval tops — exactly what
  * PersistedMap stores between runs) with a BROADCAST left join: the seen
  * set is tiny (one row per source server), so the filter is map-only at
  * any scale, no shuffle of the stream side.
  */
object GtidResume {

  /** Split a `sid:txid` GTID string into typed columns. Malformed strings
    * (wrong arity or non-numeric txid) yield NULLs — `try_cast` so a bad
    * row cannot abort the batch under ANSI mode, mirroring the reference's
    * per-row error return (gtid.go:29-40). */
  def parseGtid(gtid: Column): (Column, Column) = {
    val parts = split(gtid, ":")
    val ok = size(parts) === 2
    (when(ok, element_at(parts, 1)),
      when(ok, element_at(parts, 2)).try_cast("long"))
  }

  /** Keep the rows a resumed stream must process. `seen` carries
    * (sid string, highest long); an empty `seen` passes everything
    * (gtid.go:12-25). Malformed GTIDs (NULL sid/txid after parse) are
    * EXCLUDED — the reference errors on them rather than replaying them;
    * a dead-letter path can recover them as
    * `rows.where(parseGtid(col(gtidCol))._2.isNull)`. */
  def shouldProcess(rows: DataFrame, gtidCol: String, seen: DataFrame): DataFrame = {
    val (sid, txid) = parseGtid(col(gtidCol))
    rows
      .withColumn("sid", sid)
      .withColumn("txid", txid)
      .join(broadcast(seen.select(col("sid"), col("highest"))), Seq("sid"), "left")
      .where(col("sid").isNotNull && col("txid").isNotNull &&
        (col("highest").isNull || col("txid") >= col("highest")))
      .drop("highest")
  }
}
