package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.cdc.MongoChange

class MongoChangeSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val insertEv =
    """{"operationType":"insert","ns":{"db":"g","coll":"c"},
      |"documentKey":{"_id":{"$oid":"aabbccddeeff001122334455"}},
      |"fullDocument":{"_id":{"$oid":"aabbccddeeff001122334455"},
      |"user_id":{"$numberLong":"42"},"event_type":"click","value":1.5,
      |"ts":{"$date":{"$numberLong":"1700000000000"}}}}""".stripMargin.replace("\n", "")

  private val deleteEv =
    """{"operationType":"delete","ns":{"db":"g","coll":"c"},
      |"documentKey":{"_id":{"$oid":"aabbccddeeff001122334455"}}}"""
      .stripMargin.replace("\n", "")

  private val badOp =
    """{"operationType":"invalidate","ns":{"db":"g","coll":"c"},
      |"documentKey":{"_id":{"$oid":"aabbccddeeff001122334455"}}}"""
      .stripMargin.replace("\n", "")

  test("extended JSON parses in one pass: $oid/$numberLong/$date unwrapped") {
    val df = Seq(insertEv).toDF("j").withColumn("ce", MongoChange.parse(col("j")))
    val r = df.select(
      MongoChange.opCode(col("ce").getField("operationType")),
      MongoChange.oid(col("ce")),
      MongoChange.docLong(col("ce"), "user_id"),
      MongoChange.docDateMs(col("ce"), "ts"),
      col("ce").getField("fullDocument").getField("value")).head()
    assert(r.getString(0) === "c")
    assert(r.getString(1) === "aabbccddeeff001122334455")
    assert(r.getLong(2) === 42L)
    assert(r.getLong(3) === 1700000000000L)
    assert(r.getDouble(4) === 1.5)
  }

  test("delete carries documentKey only; unknown operationType maps to NULL op") {
    val df = Seq(deleteEv, badOp).toDF("j").withColumn("ce", MongoChange.parse(col("j")))
    val rows = df.select(
      MongoChange.opCode(col("ce").getField("operationType")),
      MongoChange.oid(col("ce")),
      col("ce").getField("fullDocument")).collect()
    assert(rows(0).getString(0) === "d")
    assert(rows(0).getString(1) === "aabbccddeeff001122334455")
    assert(rows(0).isNullAt(2), "delete must have no after image")
    assert(rows(1).isNullAt(0), "unsupported operation type must not map to an op")
  }
}
