package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** DynamoDB AttributeValue unmarshalling for the FULL type surface.
  *
  * Reference: lib/dynamo/message.go:32-83 (transformAttributeValue):
  * S→string, N→float64, B/BS→bytes, BOOL→bool, M→recursive map,
  * L→recursive list, SS→[]string, NS→[]float64. The scalar (N/S) path is
  * exercised by `dynamo_unmarshal`; this object covers the nested and
  * set-valued members with ONE typed from_json pass per row (the
  * recursion is bounded by the declared schema — Spark's schema-first
  * answer to the reference's open-ended `any` recursion; an unbounded
  * document would use the same wrappers at VariantType).
  */
object DynamoAttr {

  private def n = StructType(Seq(StructField("N", StringType)))
  private def s = StructType(Seq(StructField("S", StringType)))

  /** Typed schema for a row image carrying every non-scalar member kind. */
  val deepImageSchema: StructType = StructType(Seq(
    StructField("pk", n),
    StructField("flag", StructType(Seq(StructField("BOOL", BooleanType)))),
    StructField("tags", StructType(Seq(StructField("SS", ArrayType(StringType))))),
    StructField("scores", StructType(Seq(StructField("NS", ArrayType(StringType))))),
    StructField("meta", StructType(Seq(StructField("M", StructType(Seq(
      StructField("u", n),
      StructField("t", s))))))),
    StructField("items", StructType(Seq(StructField("L", ArrayType(StructType(Seq(
      StructField("N", StringType),
      StructField("S", StringType))))))))))

  def parseDeep(jsonCol: Column): Column = from_json(jsonCol, deepImageSchema)

  /** Typed schema for the snapshot-via-S3-export envelope
    * (lib/s3lib/dynamodb_export.go:12-30): each exported row is the stream
    * AttributeValue map plus ONE wrapper object, `{"Item": {attr: {TYPE:
    * value}}}`. The `B` member carries base64 text on the wire and decodes
    * to bytes (dynamodb_export.go:55-66, base64.StdEncoding). */
  val exportSchema: StructType = StructType(Seq(
    StructField("Item", StructType(Seq(
      StructField("pk", n),
      StructField("etype", s),
      StructField("payload", StructType(Seq(StructField("B", StringType)))),
      StructField("owner", StructType(Seq(StructField("M", StructType(Seq(
        StructField("u", n))))))))))))

  def parseExport(jsonCol: Column): Column = from_json(jsonCol, exportSchema)

  /** N members arrive as strings and unmarshal to numbers
    * (message.go:26-41). */
  def num(c: Column): Column = c.getField("N").cast("double")
}
