package graft.cdc

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Mongo change-stream event parsing — the Mongo twin of the DynamoDB
  * AttributeValue unmarshal.
  *
  * Reference: lib/mongo/change_event.go:8-60 (NewChangeEvent pulls
  * operationType, ns.coll, documentKey._id, fullDocument, optional
  * fullDocumentBeforeChange out of the raw bson.M) and ToMessage
  * (change_event.go:118-160: insert→"c", update/replace→"u", delete→"d"
  * with the documentKey as the payload when no after image exists). Values
  * arrive in Mongo extended JSON ($oid / $numberLong / $date wrappers).
  *
  * The Spark re-expression parses the whole event ONCE per row with
  * `from_json` against a typed schema (extended-JSON wrapper objects are
  * just nested structs — field names may contain `$`), then projects struct
  * fields: one parse, codegen'd field access, no per-field re-parse.
  */
object MongoChange {

  private def extLong = StructType(Seq(StructField("$numberLong", StringType)))
  private def extOid = StructType(Seq(StructField("$oid", StringType)))
  private def extDate = StructType(Seq(StructField("$date", extLong)))

  /** Typed schema for the change events this pipeline carries. A real
    * deployment would widen `fullDocument` to its collection schema; the
    * extended-JSON wrapper shapes ($oid, $numberLong, $date-of-$numberLong
    * canonical form) are the fixed part. */
  val changeEventSchema: StructType = StructType(Seq(
    StructField("operationType", StringType),
    StructField("ns", StructType(Seq(
      StructField("db", StringType),
      StructField("coll", StringType)))),
    StructField("documentKey", StructType(Seq(StructField("_id", extOid)))),
    StructField("fullDocument", StructType(Seq(
      StructField("_id", extOid),
      StructField("user_id", extLong),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("ts", extDate))))))

  /** One-pass parse of a raw change-event JSON string. */
  def parse(jsonCol: Column): Column = from_json(jsonCol, changeEventSchema)

  /** operationType → Debezium op code (ToMessage, change_event.go:118-160).
    * Unknown operation types map to NULL — the columnar analogue of the
    * reference's "unsupported operation type" error. */
  def opCode(operationType: Column): Column =
    when(operationType === "insert", lit("c"))
      .when(operationType.isin("update", "replace"), lit("u"))
      .when(operationType === "delete", lit("d"))

  /** Extended-JSON scalar accessors over a parsed event struct. */
  def oid(ce: Column): Column =
    ce.getField("documentKey").getField("_id").getField("$oid")

  def docLong(ce: Column, field: String): Column =
    ce.getField("fullDocument").getField(field).getField("$numberLong").cast("long")

  def docDateMs(ce: Column, field: String): Column =
    ce.getField("fullDocument").getField(field).getField("$date")
      .getField("$numberLong").cast("long")
}
