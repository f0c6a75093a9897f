package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.BinlogResume

class BinlogResumeSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("resume filter: fresh key passes, (file, pos) ordered lexicographically, offsetless excluded") {
    val rows = Seq[(Long, String, String, Option[Long])](
      (1L, "s1", "binlog.000002", Some(100L)),  // earlier file -> dropped
      (2L, "s1", "binlog.000003", Some(499L)),  // same file, below pos -> dropped
      (3L, "s1", "binlog.000003", Some(500L)),  // same file, at pos -> kept
      (4L, "s1", "binlog.000003", Some(501L)),  // same file, above pos -> kept
      (5L, "s1", "binlog.000010", Some(0L)),    // later file (zero-padded order) -> kept
      (6L, "s2", "binlog.000001", Some(4L)),    // unseen key -> kept
      (7L, "s1", null, Some(4L)),               // offsetless file -> excluded
      (8L, "s1", "binlog.000003", None)         // offsetless pos -> excluded
    ).toDF("event_id", "okey", "file", "pos")
    val seen = Seq(("s1", "binlog.000003", 500L)).toDF("okey", "wfile", "wpos")

    val kept = BinlogResume.shouldProcess(rows, "okey", "file", "pos", seen)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(3L, 4L, 5L, 6L))
  }

  test("empty watermark table passes every offset-tagged row") {
    val rows = Seq((1L, "a", "binlog.000001", 4L), (2L, "b", "binlog.000009", 0L))
      .toDF("event_id", "okey", "file", "pos")
    val seen = Seq.empty[(String, String, Long)].toDF("okey", "wfile", "wpos")
    assert(BinlogResume.shouldProcess(rows, "okey", "file", "pos", seen).count() === 2L)
  }

  test("rotation boundary: pos resets on a new file but later file always wins") {
    // after ROTATE the pos restarts low (offset.go:66-74); the lexicographic
    // file comparison must dominate the numeric pos comparison
    val rows = Seq((1L, "k", "binlog.000004", 4L)).toDF("event_id", "okey", "file", "pos")
    val seen = Seq(("k", "binlog.000003", 999999L)).toDF("okey", "wfile", "wpos")
    assert(BinlogResume.shouldProcess(rows, "okey", "file", "pos", seen).count() === 1L)
  }
}
