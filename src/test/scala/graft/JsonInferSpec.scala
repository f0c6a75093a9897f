package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.expressions.{JsonTopLevelTypes, Sketch}

class JsonInferSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def types(j: String): Option[Seq[String]] = {
    val r = Seq(j).toDF("j")
      .select(Sketch.column(JsonTopLevelTypes(Sketch.expr(col("j")))).as("t")).head()
    if (r.isNullAt(0)) None else Some(r.getSeq[String](0))
  }

  test("maps every JSON type class like DuckDB's json_type") {
    assert(types("""{"a": 1, "b": -7, "c": 2.5, "d": 1e3, "e": "x", "f": true, "g": null, "h": {}, "i": []}""")
      === Some(Seq("a|int", "b|int", "c|double", "d|double", "e|string",
        "f|boolean", "g|null", "h|object", "i|array")))
  }

  test("malformed JSON and non-object roots dead-letter to NULL") {
    assert(types("{broken") === None)
    assert(types("[1,2,3]") === None)
    assert(types("42") === None)
  }

  test("empty object yields an empty census, not null") {
    assert(types("{}") === Some(Seq.empty))
  }

  // r15 pins: the streaming-parser rewrite must keep readTree's
  // (FAIL_ON_TRAILING_TOKENS) corner semantics exactly

  test("trailing content after the closing brace is malformed") {
    assert(types("""{"a": 1} junk""") === None)
    assert(types("""{"a": 1}{""") === None)
    assert(types("""{"a": 1} """) === Some(Seq("a|int"))) // bare whitespace ok
  }

  test("duplicate keys keep first position, last value") {
    assert(types("""{"a": 1, "b": "x", "a": 2.5}""")
      === Some(Seq("a|double", "b|string")))
  }

  test("ints wider than int64 still classify as int; exponents as double") {
    assert(types("""{"big": 123456789012345678901234567890, "e": 2E8}""")
      === Some(Seq("big|int", "e|double")))
  }

  test("deeply nested values are skipped, not typed") {
    assert(types("""{"a": {"b": [1, {"c": 2}]}, "d": [[["x"]]], "e": 9}""")
      === Some(Seq("a|object", "d|array", "e|int")))
    // malformed INSIDE a nested value is still malformed
    assert(types("""{"a": {"b": [1,}, "e": 9}""") === None)
  }

  test("empty and whitespace-only input dead-letters") {
    assert(types("") === None)
    assert(types("   ") === None)
  }
}
