package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.ShardResume

class ShardResumeSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def run(rows: Seq[(Long, String, String)],
      seen: Seq[(String, Option[String], Boolean)]): Set[Long] =
    ShardResume.shouldProcess(
      rows.toDF("event_id", "shard_id", "seq"),
      "shard_id", "seq",
      seen.toDF("shard_id", "last_seq", "processed"))
      .select("event_id").collect().map(_.getLong(0)).toSet

  test("strictly-after: the watermark row itself does NOT replay") {
    val got = run(
      Seq((1L, "s", "499"), (2L, "s", "500"), (3L, "s", "501")),
      Seq(("s", Some("500"), false)))
    assert(got === Set(3L))
  }

  test("numeric-string ordering: '1000' passes a '999' watermark, '998' does not") {
    // plain lexicographic would get BOTH wrong ('1000' < '999' as strings)
    val got = run(
      Seq((1L, "s", "1000"), (2L, "s", "998"), (3L, "s", "10000")),
      Seq(("s", Some("999"), false)))
    assert(got === Set(1L, 3L))
  }

  test("unseen shard = TrimHorizon (all pass); processed shard passes nothing") {
    val got = run(
      Seq((1L, "new", "1"), (2L, "done", "999999"), (3L, "done", "1")),
      Seq(("done", Some("5"), true)))
    assert(got === Set(1L))
  }

  test("seen shard with no sequence yet passes everything") {
    val got = run(
      Seq((1L, "s", "1"), (2L, "s", "2")),
      Seq(("s", None, false)))
    assert(got === Set(1L, 2L))
  }
}
