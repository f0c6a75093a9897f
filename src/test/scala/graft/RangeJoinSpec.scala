package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

class RangeJoinSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("matches the naive range join exactly (random data, duplicates included)") {
    val rnd = new scala.util.Random(3)
    val pts = (1 to 400).map(i => (i.toLong, rnd.nextInt(1000).toLong)).toDF("pid", "p")
    val ivs = (1 to 60).map { i =>
      val s = rnd.nextInt(950).toLong
      (i.toLong, s, s + 1 + rnd.nextInt(120)) // widths 1..120 across buckets
    }.toDF("iid", "s", "e")
    val got = RangeJoin.pointInInterval(pts, ivs, "p", "s", "e", bucketWidth = 32L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val want = pts.join(ivs, col("p") >= col("s") && col("p") < col("e"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got === want)
    assert(got.size === got.distinct.size, "bucketization must not duplicate pairs")
    assert(want.nonEmpty)
  }

  test("boundaries: start inclusive, end exclusive; empty intervals match nothing") {
    val pts = Seq((1L, 10L), (2L, 19L), (3L, 20L), (4L, 9L)).toDF("pid", "p")
    val ivs = Seq((1L, 10L, 20L), (2L, 30L, 30L), (3L, 40L, 35L)).toDF("iid", "s", "e")
    val got = RangeJoin.pointInInterval(pts, ivs, "p", "s", "e", bucketWidth = 7L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 1L), (2L, 1L))) // 20 excluded (end), 10 included (start)
  }

  test("negative domains bucket correctly (floor division)") {
    val pts = Seq((1L, -15L), (2L, -1L), (3L, 0L)).toDF("pid", "p")
    val ivs = Seq((1L, -20L, 0L)).toDF("iid", "s", "e")
    val got = RangeJoin.pointInInterval(pts, ivs, "p", "s", "e", bucketWidth = 8L)
      .select("pid").collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 2L))
  }

  test("plans a keyed join on the bucket, not a nested loop") {
    val pts = (1 to 50).map(i => (i.toLong, i.toLong * 3)).toDF("pid", "p")
    val ivs = (1 to 10).map(i => (i.toLong, i * 10L, i * 10L + 25)).toDF("iid", "s", "e")
    val plan = RangeJoin.pointInInterval(pts, ivs, "p", "s", "e", 16L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan.take(600))
  }
}
