package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot-diff change capture — CDC for sources with no usable log.
  *
  * reader captures changes from the database's own log (binlog/WAL/change
  * streams; reference: sources/mysql/streaming.go, sources/postgres/); when
  * no log is reachable, the standard fallback is diffing two periodic
  * snapshots on the primary key and emitting synthetic insert/update/delete
  * events. This operator produces that event batch with Debezium-style
  * before/after images, feeding the same downstream envelope/state tier as
  * log-based CDC (graft.cdc.Envelope).
  *
  * Plan shape, sized for 100 TB snapshots:
  *   - ONE full-outer join on the PK. PKs are unique, so there is no skew;
  *     both sides shuffle-partition on the same key, and with bucketed
  *     snapshot storage (see `join_bucketed`) the join is shuffle-free.
  *   - Change detection is a null-safe per-column `<=>` comparison — no row
  *     digests, no stringification, no type coercion; Catalyst prunes any
  *     column the caller drops before the diff.
  *   - Unchanged rows (the overwhelming majority of a 100 TB snapshot pair)
  *     are dropped by the post-join filter before anything wider happens.
  *
  * Output: (pk..., op ∈ {c,u,d}, before_<col>, after_<col> for every non-PK
  * column) — before image null for inserts, after image null for deletes,
  * matching the Debezium envelope's create/delete shapes.
  */
object SnapshotDiff {

  def diff(v1: DataFrame, v2: DataFrame, pk: Seq[String]): DataFrame = {
    val cols = v1.columns.toSeq
    require(v2.columns.toSeq == cols,
      s"snapshot schemas differ: ${cols.mkString(",")} vs ${v2.columns.mkString(",")}")
    val nonPk = cols.filterNot(pk.contains)
    val before = v1.select(cols.map(c => col(c).as(s"b_$c")): _*)
    val after = v2.select(cols.map(c => col(c).as(s"a_$c")): _*)
    val joined = before.join(after,
      pk.map(k => col(s"b_$k") === col(s"a_$k")).reduce(_ && _), "full_outer")
    val inV1 = pk.map(k => col(s"b_$k").isNotNull).reduce(_ && _)
    val inV2 = pk.map(k => col(s"a_$k").isNotNull).reduce(_ && _)
    val changed = nonPk.map(c => !(col(s"b_$c") <=> col(s"a_$c"))).reduce(_ || _)
    joined
      .withColumn("op",
        when(!inV1, lit("c")).when(!inV2, lit("d")).when(changed, lit("u")))
      .where(col("op").isNotNull)
      .select((pk.map(k => coalesce(col(s"a_$k"), col(s"b_$k")).as(k)) :+ col("op")) ++
        nonPk.flatMap(c =>
          Seq(col(s"b_$c").as(s"before_$c"), col(s"a_$c").as(s"after_$c"))): _*)
  }
}
