package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binlog file+position resume filtering — the non-GTID twin of
  * [[GtidResume]], for MySQL replicas without GTID enabled.
  *
  * Reference: sources/mysql/streaming/offset.go:13-27 (Position carries
  * `File string, Pos uint32` beside the optional GTID set;
  * ToMySQLPosition():39-41 resumes the syncer from exactly (file, pos)) and
  * iterator.go:73-113 (offsets read from the persisted map; without GTID the
  * stream restarts at the stored file+pos, so the first batches can replay
  * events at-or-after that offset). UpdatePosition (offset.go:43-76)
  * advances Pos on every event and File on ROTATE events, so the watermark
  * orders lexicographically on (file, pos): MySQL names binlog files with a
  * zero-padded sequence (`binlog.000042`), making string order = rotation
  * order.
  *
  * A row is processed iff
  *   - its offset key (one per configured source — the persisted-map key,
  *     iterator.go:75) has no stored watermark (fresh stream), or
  *   - its file sorts after the watermark file (a later rotation), or
  *   - same file and pos >= the watermark pos.
  *
  * Same shape as the GTID guard: the watermark table is one row per source,
  * broadcast, so the filter is map-only at any scale — no shuffle of the
  * stream side. */
object BinlogResume {

  /** Keep the rows a resumed non-GTID stream must process. `seen` carries
    * (okey string, wfile string, wpos long); keys absent from `seen` pass
    * everything. Rows with a NULL file or pos are EXCLUDED — an offsetless
    * event cannot be ordered against the watermark, mirroring the
    * reference's error-on-malformed behavior rather than replaying them. */
  def shouldProcess(rows: DataFrame, keyCol: String, fileCol: String,
      posCol: String, seen: DataFrame): DataFrame = {
    // internal names: the stream side legitimately carries its own
    // okey/wfile-style columns (the spec exercises keyCol == "okey")
    val wm = seen.select(col("okey").as("__wm_key"),
      col("wfile").as("__wm_file"), col("wpos").as("__wm_pos"))
    rows
      .join(broadcast(wm), col(keyCol) === col("__wm_key"), "left")
      .where(col(fileCol).isNotNull && col(posCol).isNotNull &&
        (col("__wm_file").isNull ||
          col(fileCol) > col("__wm_file") ||
          (col(fileCol) === col("__wm_file") && col(posCol) >= col("__wm_pos"))))
      .drop("__wm_key", "__wm_file", "__wm_pos")
  }
}
