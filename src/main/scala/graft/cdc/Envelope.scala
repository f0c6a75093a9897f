package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Debezium envelope + latest-state compaction, as Catalyst expressions.
  *
  * Reference: lib/debezium/transformer/transformer.go:108-149
  * (createPayload: After = converted row, Source{Table, TsMs}, Operation "r")
  * and writers/transfer (downstream dedupe to latest state per PK).
  */
object Envelope {

  /** Wrap rows in a snapshot-read envelope: op='r', before=NULL, after=the
    * row, source=(table, ts_ms) — transformer.go:121-127. `afterCols` become
    * `after_*` columns (flattened struct: identical information, and flat
    * columns keep the result comparable by any SQL oracle). */
  def snapshotEnvelope(
      df: DataFrame,
      pkCol: String,
      tsMs: Column,
      table: String,
      afterCols: Seq[String]): DataFrame = {
    val flat = Seq(
      col(pkCol),
      lit("r").as("op"),
      tsMs.cast("long").as("ts_ms"),
      lit(table).as("source_table")) ++
      afterCols.map(c => col(c).as(s"after_$c")) ++
      // snapshot reads have no prior image: typed NULL per after column
      afterCols.map(c => lit(null).cast(df.schema(c).dataType).as(s"before_$c"))
    df.select(flat: _*)
  }

  /** Nested (true Debezium shape) variant: struct(before, after, op, ts_ms,
    * source). Used by the streaming path / tests; the flattened variant is
    * what the oracle checks. */
  def nestedEnvelope(df: DataFrame, tsMs: Column, table: String, afterCols: Seq[String]): DataFrame = {
    val after = struct(afterCols.map(col): _*)
    val beforeNull = struct(afterCols.map(c => lit(null).cast(df.schema(c).dataType).as(c)): _*)
    df.select(
      struct(
        beforeNull.as("before"),
        after.as("after"),
        lit("r").as("op"),
        tsMs.cast("long").as("ts_ms"),
        struct(lit(table).as("table")).as("source")
      ).as("envelope"))
  }

  /** Change-event envelope with BEFORE images: op c/u/d per row plus the
    * prior row image per key, reconstructed with a lag window — the batch
    * re-expression of what reader's binlog iterator carries natively
    * (sources/mysql/streaming/iterator.go before/after rows; transformer.go
    * payload.Before). One shuffle on the key; no state store needed. */
  def changeEnvelope(
      df: DataFrame,
      keyCol: String,
      seqCols: Seq[Column],
      opCol: Column,
      tsMs: Column,
      table: String,
      valueCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(seqCols: _*)
    val flat = Seq(
      col(keyCol),
      opCol.as("op"),
      tsMs.cast("long").as("ts_ms"),
      lit(table).as("source_table")) ++
      valueCols.map(c => col(c).as(s"after_$c")) ++
      valueCols.map(c => lag(col(c), 1).over(w).as(s"before_$c"))
    df.select(flat: _*)
  }

  /** Latest-state compaction: last event per key by (event time, seq) — the
    * materialization step reader's downstream (artie transfer) performs when
    * collapsing a CDC stream to current state. row_number over a
    * hash-partitioned window: one shuffle on the key, no global sort. */
  def latestState(df: DataFrame, keyCols: Seq[String], orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }
}
