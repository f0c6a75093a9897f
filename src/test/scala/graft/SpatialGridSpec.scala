package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.SpatialGrid

/** Pins the half-neighborhood grid join against a brute-force O(n²)
  * driver model: the pair set must be EXACTLY the within-radius pairs,
  * each exactly once, normalized a_id < b_id — the theorem the 9→5 cell
  * refactor must preserve. */
class SpatialGridSpec extends AnyFunSuite {
  import TestSpark._

  private def model(pts: Seq[(Long, Long, Long)], r: Long): Set[(Long, Long, Long)] =
    (for {
      (ia, xa, ya) <- pts
      (ib, xb, yb) <- pts
      if ia < ib
      d2 = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
      if d2 <= r * r
    } yield (ia, ib, d2)).toSet

  test("pair set matches the brute-force model exactly (no dupes, no misses)") {
    import TestSpark.spark.implicits._
    val r = 100L
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 5) {
      // clustered points so same-cell, adjacent-cell and diagonal deltas
      // all occur, including negative-coordinate-free edges near 0
      val pts = Seq.tabulate(300) { i =>
        val cx = rnd.nextInt(6) * 100L
        (i.toLong, cx + rnd.nextInt(220).toLong, rnd.nextInt(6) * 100L + rnd.nextInt(220).toLong)
      }
      val df = pts.toDF("id", "x", "y")
        .withColumn("cx", expr(s"x div $r"))
        .withColumn("cy", expr(s"y div $r"))
      val got = SpatialGrid.pairsWithin(df, r)
        .collect().map(w => (w.getLong(0), w.getLong(1), w.getLong(2)))
      assert(got.length === got.toSet.size, s"trial $trial: duplicate pairs emitted")
      assert(got.toSet === model(pts, r), s"trial $trial: pair set mismatch")
      got.foreach { case (a, b, _) => assert(a < b, s"trial $trial: unnormalized pair") }
    }
  }

  test("probe side explodes to exactly 5 cells per point") {
    import TestSpark.spark.implicits._
    // candidate volume claim: 5 offsets, not 9 — count join-input rows via
    // the probe construction embedded in pairsWithin's plan is opaque, so
    // assert the observable consequence: a single isolated point yields 0
    // pairs and a coincident pair yields exactly 1.
    val df = Seq((1L, 0L, 0L), (2L, 0L, 0L), (3L, 100000L, 100000L))
      .toDF("id", "x", "y")
      .withColumn("cx", expr("x div 50")).withColumn("cy", expr("y div 50"))
    val got = SpatialGrid.pairsWithin(df, 50L).collect()
    assert(got.length === 1)
    assert(got.head.getLong(0) === 1L && got.head.getLong(1) === 2L && got.head.getLong(2) === 0L)
  }
}
