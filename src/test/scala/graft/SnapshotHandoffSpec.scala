package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.streaming.SnapshotHandoff

class SnapshotHandoffSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // (user_id, event_id, ts_ns, event_type, value, op)
  private def df(rows: (Long, Long, Long, String, Double, String)*): DataFrame =
    rows.toDF("user_id", "event_id", "ts_ns", "event_type", "value", "op")

  private def run(snapshot: DataFrame, batches: Seq[DataFrame], tag: String): Map[Long, (Long, String)] = {
    val work = s"/tmp/graft_test/handoff_$tag"
    val staged = s"$work/staged"
    batches.zipWithIndex.foreach { case (b, i) =>
      b.repartition(1).write.mode(if (i == 0) "overwrite" else "append").parquet(staged)
    }
    SnapshotHandoff.materialize(spark, snapshot, staged, batches.head.schema,
      "user_id", Seq("ts_ns", "event_id"), s"$work/state", s"$work/ckpt", nBuckets = 4)
      .where(col("op") =!= "d")
      .collect().map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("event_id"), r.getAs[String]("event_type"))).toMap
  }

  test("handoff equals continuous replay; untouched snapshot keys survive") {
    val snapshot = df((1L, 10L, 100L, "a", 1.0, "u"), (2L, 11L, 100L, "b", 1.0, "u"))
    val changes = df((1L, 20L, 200L, "a2", 2.0, "u"), (3L, 21L, 210L, "c", 3.0, "u"))
    val out = run(snapshot, Seq(changes), "basic")
    assert(out === Map(1L -> (20L, "a2"), 2L -> (11L, "b"), 3L -> (21L, "c")))
  }

  test("tombstones: an out-of-order OLDER update cannot resurrect a deleted key") {
    val snapshot = df((5L, 10L, 100L, "a", 1.0, "u"))
    // batch 1 carries the DELETE (ts 300); batch 2 carries an older update
    // (ts 200) — with drop-at-merge instead of tombstones, batch 2 would
    // resurrect key 5
    val b1 = df((5L, 30L, 300L, "gone", 0.0, "d"))
    val b2 = df((5L, 20L, 200L, "late", 2.0, "u"))
    val out = run(snapshot, Seq(b1, b2), "tombstone")
    assert(out === Map.empty[Long, (Long, String)])
  }

  test("merge is batch-split-insensitive: different stagings, identical state") {
    val snapshot = df((1L, 1L, 10L, "s", 0.0, "u"))
    val rows = Seq(
      (1L, 2L, 20L, "x", 1.0, "u"), (2L, 3L, 30L, "y", 1.0, "u"),
      (1L, 4L, 40L, "z", 1.0, "u"), (2L, 5L, 50L, "w", 1.0, "d"),
      (3L, 6L, 60L, "v", 1.0, "u"), (2L, 7L, 45L, "q", 1.0, "u"))
    val asOne = run(snapshot, Seq(rows.toDF("user_id", "event_id", "ts_ns", "event_type", "value", "op")), "one")
    val asThree = run(snapshot,
      rows.grouped(2).map(_.toDF("user_id", "event_id", "ts_ns", "event_type", "value", "op")).toSeq,
      "three")
    assert(asOne === asThree)
    assert(asOne === Map(1L -> (4L, "z"), 3L -> (6L, "v"))) // key 2 deleted at ts 50
  }
}
