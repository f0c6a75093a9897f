package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

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

  // ---- schema descriptor (the Debezium Schema/FieldsObject typing block) ----
  // Reference: lib/debezium/transformer/transformer.go:47-66 — the
  // transformer builds `debezium.Schema{FieldsObject: [{Fields, Optional:
  // false, FieldLabel: "after"}]}` from every column's
  // `ValueConverter.ToField(name)`, and every payload ships with it
  // (createPayload → SchemaEventPayload{Schema, Payload},
  // transformer.go:108-127). That block is what makes the envelope
  // self-describing to downstream consumers. The Spark analogue derives the
  // same (wire type, semantic type, parameters) triple from the column's
  // Catalyst DataType — the engine-side mapping each converter's ToField
  // hardcodes (converters/time.go:15-97, decimal.go:38-53, passthrough.go).

  /** Debezium wire type + optional semantic type/parameters for a Spark
    * type. Mirrors the converter→Field table: temporal types land on
    * io.debezium.time.* over int32/int64, decimals on the Kafka-connect
    * Decimal logical type over bytes with scale/precision parameters, and
    * primitives pass through. */
  def debeziumFieldSpec(dt: DataType): (String, Option[String], Seq[(String, String)]) =
    dt match {
      case BooleanType => ("boolean", None, Nil)
      case ShortType => ("int16", None, Nil)
      case IntegerType => ("int32", None, Nil)
      case LongType => ("int64", None, Nil)
      case FloatType => ("float", None, Nil)
      case DoubleType => ("double", None, Nil)
      case StringType => ("string", None, Nil)
      case BinaryType => ("bytes", None, Nil)
      case DateType => ("int32", Some("io.debezium.time.Date"), Nil)
      case TimestampType | TimestampNTZType =>
        ("int64", Some("io.debezium.time.MicroTimestamp"), Nil)
      case d: DecimalType =>
        ("bytes", Some("org.apache.kafka.connect.data.Decimal"),
          Seq("scale" -> d.scale.toString,
            "connect.decimal.precision" -> d.precision.toString))
      case other =>
        throw new IllegalArgumentException(s"no Debezium field mapping for $other")
    }

  private def fieldJson(name: String, dt: DataType, nullable: Boolean): String = {
    val (wire, sem, params) = debeziumFieldSpec(dt)
    val base = s""""type":"$wire","optional":$nullable,"field":"$name""""
    val semPart = sem.map(n => s""","name":"$n"""").getOrElse("")
    val paramPart =
      if (params.isEmpty) ""
      else params.map { case (k, v) => s""""$k":"$v"""" }
        .mkString(""","parameters":{""", ",", "}")
    s"{$base$semPart$paramPart}"
  }

  /** JSON rendering of the full Schema block for an `after` row of the given
    * fields — transformer.go:56-62's FieldsObject list with the single
    * "after" entry, rendered in Debezium's wire shape. */
  def schemaJson(fields: Seq[(String, DataType, Boolean)]): String = {
    val inner = fields.map { case (n, dt, nl) => fieldJson(n, dt, nl) }.mkString(",")
    s"""{"type":"struct","fields":[{"type":"struct","fields":[$inner],"optional":false,"field":"after"}]}"""
  }

  /** Kafka message key for a row: the PrimaryKeyPayload JSON — schema = a
    * FieldsObject struct over the PK columns' Debezium fields, payload =
    * their wire values (reference: lib/kafkalib/message.go:33-41,
    * lib/debezium/transformer/transformer.go:150-179). The schema half is a
    * per-table constant folded into a literal; only the payload half is
    * per-row work (one to_json of the key struct) — so keying 100 TB of
    * messages costs one codegen'd projection, no shuffle. */
  def messageKeyJson(df: DataFrame, pkCols: Seq[String]): Column = {
    val fields = pkCols.map { n =>
      val f = df.schema(n)
      fieldJson(n, f.dataType, f.nullable)
    }.mkString(",")
    concat(
      lit(s"""{"schema":{"type":"struct","fields":[$fields]},"payload":"""),
      to_json(struct(pkCols.map(n => wireValue(n, df.schema(n).dataType).as(n)): _*)),
      lit("}"))
  }

  /** Kafka message key built from CDC before/after images — the
    * BuildPartitionKey analogue (lib/debezium/transformer/
    * light_transformer.go:34-45): the key comes from the AFTER image,
    * falling back to the BEFORE image when after is absent — the
    * delete-event case, where only the before row carries the PK. */
  def messageKeyFromImages(
      before: Column,
      after: Column,
      st: StructType,
      pkCols: Seq[String]): Column = {
    val row = coalesce(after, before)
    val fields = pkCols.map { n =>
      val f = st(n)
      fieldJson(n, f.dataType, f.nullable)
    }.mkString(",")
    concat(
      lit(s"""{"schema":{"type":"struct","fields":[$fields]},"payload":"""),
      to_json(struct(pkCols.map(n =>
        wireValueOf(row.getField(n), st(n).dataType).as(n)): _*)),
      lit("}"))
  }

  /** Convert a column to its Debezium wire value (convertRow analogue,
    * transformer.go:131-149): temporals to epoch int32/int64 per their
    * semantic type, decimals to the unscaled integer (the information
    * content of decimal.go's big-endian bytes), primitives pass through. */
  def wireValue(name: String, dt: DataType): Column = wireValueOf(col(name), dt)

  /** wireValue over an arbitrary column expression (e.g. a struct field). */
  def wireValueOf(c: Column, dt: DataType): Column = dt match {
    case DateType =>
      datediff(c, to_date(lit("1970-01-01"))).cast("int")
    case TimestampType | TimestampNTZType => unix_micros(c.cast("timestamp"))
    case d: DecimalType =>
      // the long analogue of decimal.go's big-endian unscaled bytes: exact
      // for unscaled values < 2^63 (precision <= 18). Wider decimals would
      // need the byte encoding itself — reject loudly rather than overflow.
      require(d.precision <= 18,
        s"unscaled-long wire value overflows for $dt; precision must be <= 18")
      val p10 = BigDecimal(10).pow(d.scale)
      (c * lit(p10).cast(s"decimal(${d.scale + 1},0)")).cast("long")
    case _ => c
  }

  /** Snapshot envelope WITH the schema descriptor: op='r' payload columns
    * converted to wire values, plus the `schema_json` typing block every
    * message carries (SchemaEventPayload = {Schema, Payload}). */
  def schemaEnvelope(
      df: DataFrame,
      pkCol: String,
      tsMs: Column,
      table: String,
      afterCols: Seq[String]): DataFrame = {
    val specs = afterCols.map(c => (c, df.schema(c).dataType, df.schema(c).nullable))
    val flat = Seq(
      col(pkCol),
      lit("r").as("op"),
      tsMs.cast("long").as("ts_ms"),
      lit(table).as("source_table"),
      lit(schemaJson(specs)).as("schema_json")) ++
      afterCols.map(c => wireValue(c, df.schema(c).dataType).as(s"after_$c"))
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

  /** SCD-2 history materialization — [[latestState]]'s history-table twin.
    * Where latestState keeps only each key's newest image (what
    * writers/transfer materializes downstream), SCD-2 keeps EVERY version
    * with a validity interval: valid_from = this change's timestamp,
    * valid_to = the next change's (NULL while current). Same single keyed
    * shuffle + within-partition sort as latestState — the lead() is free
    * once the window exists, so the history table costs no more than the
    * compacted one. `orderCols` must totally order events within a key
    * (e.g. ts + event id), or version intervals are ambiguous. */
  def scd2History(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[Column],
      validFrom: Column): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols: _*)
    df.withColumn("valid_from", validFrom.cast("long"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
