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
}
