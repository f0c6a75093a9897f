package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.GtidResume

class GtidResumeSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("resume filter: unseen sid passes, seen sid gated by highest, malformed excluded") {
    val rows = Seq(
      (1L, "a:100"), // seen, below highest -> dropped
      (2L, "a:500"), // seen, at highest -> kept
      (3L, "b:1"),   // unseen sid -> kept
      (4L, "garbage"),     // malformed arity -> excluded, not replayed
      (5L, "a:notanum"),   // malformed txid (ANSI-safe) -> excluded
      (6L, "a:501")  // seen, above highest -> kept
    ).toDF("event_id", "gtid")
    val seen = Seq(("a", 500L)).toDF("sid", "highest")

    val kept = GtidResume.shouldProcess(rows, "gtid", seen)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(2L, 3L, 6L))
  }

  test("empty seen set passes every well-formed row") {
    val rows = Seq((1L, "a:1"), (2L, "zz:0")).toDF("event_id", "gtid")
    val seen = Seq.empty[(String, Long)].toDF("sid", "highest")
    val kept = GtidResume.shouldProcess(rows, "gtid", seen).count()
    assert(kept === 2L)
  }
}
