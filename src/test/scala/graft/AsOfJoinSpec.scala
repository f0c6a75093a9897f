package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

/** As-of join semantics + the plan property that makes it scale: there is
  * no join operator at all — one keyed exchange, one sort, one window. */
class AsOfJoinSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def left = Seq(
    (1L, 10L, 100L), // before any right row
    (1L, 20L, 101L), // exactly at a right row ts -> inclusive match
    (1L, 35L, 102L), // after two right rows -> latest wins
    (2L, 50L, 103L)  // key with no right rows at all
  ).toDF("k", "ts", "lid")

  private def right = Seq(
    (1L, 20L, 7L, "a"),
    (1L, 20L, 9L, "b"), // tie on ts -> greatest tie col (9) wins
    (1L, 30L, 5L, "c")
  ).toDF("k", "ts", "rid", "payload")

  test("inclusive <= match, tie-break to greatest, null when no prior row") {
    val out = AsOfJoin.lastMatch(left, right, Seq("k"), "ts", "rid",
      Seq("rid", "payload"))
      .orderBy("lid")
      .collect().map(r => (r.getLong(2), Option(r.get(3)).map(_.toString).orNull,
        Option(r.get(4)).map(_.toString).orNull))
    assert(out.toSeq == Seq(
      (100L, null, null),  // nothing at or before ts=10
      (101L, "9", "b"),    // ts=20 inclusive; tie resolves to rid 9
      (102L, "5", "c"),    // latest of the two earlier rows
      (103L, null, null))) // key 2 has no right rows
  }

  test("carried columns come from the SAME right row (no row tearing on nulls)") {
    // most recent right row has a NULL payload: the output must carry that
    // NULL, not splice in the older row's payload
    val r = Seq((1L, 20L, Some(7L), Some("old")), (1L, 30L, Some(9L), None))
      .toDF("k", "ts", "rid", "payload")
    val l = Seq((1L, 40L, 100L)).toDF("k", "ts", "lid")
    val out = AsOfJoin.lastMatch(l, r, Seq("k"), "ts", "rid",
      Seq("rid", "payload")).head()
    assert(out.getLong(3) === 9L)
    assert(out.isNullAt(4), "payload torn from an older right row")
  }

  test("plan has no join node — union + one keyed window") {
    val plan = AsOfJoin.lastMatch(left, right, Seq("k"), "ts", "rid",
      Seq("rid")).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join in as-of plan:\n$plan")
    assert(plan.contains("Window"))
  }

  test("carry-name collision with left columns is rejected loudly") {
    intercept[IllegalArgumentException] {
      AsOfJoin.lastMatch(left, right.withColumnRenamed("rid", "lid"),
        Seq("k"), "ts", "lid", Seq("lid"))
    }
  }
}
