package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.SpatialPolygon

/** Ray-casting containment pinned against an independent imperative
  * PNPOLY transcription, plus hand-verified vertex/edge-grazing cases —
  * the classic parity failure modes: a +x ray passing exactly through a
  * vertex (must count ONE incident edge, never zero or two) and a ray
  * collinear with a horizontal edge (must count it zero times). */
class SpatialPolygonSpec extends AnyFunSuite {
  import TestSpark._

  /** Independent driver-side reference (imperative PNPOLY, half-open span
    * rule, exact Long arithmetic). */
  private def refInside(verts: Seq[(Long, Long)], px: Long, py: Long): Boolean = {
    var c = 0
    val n = verts.size
    for (i <- 0 until n) {
      val (x1, y1) = verts(i)
      val (x2, y2) = verts((i + 1) % n)
      if ((y1 > py) != (y2 > py)) {
        val lhs = (px - x1) * (y2 - y1)
        val rhs = (py - y1) * (x2 - x1)
        if (if (y2 > y1) lhs < rhs else lhs > rhs) c += 1
      }
    }
    c % 2 == 1
  }

  private def runInside(verts: Seq[(Long, Long)], pts: Seq[(Long, Long)]): Seq[Boolean] = {
    import TestSpark.spark.implicits._
    val df = pts.zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
      .toDF("i", "x", "y")
      .withColumn("verts", expr("array(" + verts.map { case (x, y) =>
        s"named_struct('x', ${x}L, 'y', ${y}L)" }.mkString(",") + ")"))
      .withColumn("nc", SpatialPolygon.rayCrossings("verts", "x", "y"))
      .orderBy("i")
    df.collect().map(r => r.getAs[Long]("nc") % 2 == 1).toSeq
  }

  // the query's star: center (100,100), wx = wy = 30 → inner radius 10
  private val star = Seq[(Long, Long)](
    (130, 100), (110, 110), (100, 130), (90, 110),
    (70, 100), (90, 90), (100, 70), (110, 90))

  test("hand-verified grazing cases on the concave star") {
    val cases = Seq[((Long, Long), Boolean)](
      ((100, 100), true),   // center; ray passes EXACTLY through vertex (130,100)
      ((60, 100), false),   // outside left, same y as two vertices
      ((140, 100), false),  // outside right, ray leaves the polygon entirely
      ((95, 110), true),    // inside the upper spike base; py = inner-vertex y
      ((120, 110), false),  // outside, py = inner-vertex y, ray grazes (110,110)? no: above edge
      ((100, 125), true),   // inside the upper spike
      ((105, 105), true),   // inside the core
      ((112, 112), false),  // in the concave notch between +x and +y spikes
      ((110, 110), false),  // EXACTLY the inner vertex: boundary — half-open rule decides
      ((130, 100), false))  // EXACTLY the outer vertex: boundary
    val got = runInside(star, cases.map(_._1))
    for ((((p, exp), g), i) <- cases.zip(got).zipWithIndex) {
      assert(refInside(star, p._1, p._2) === exp, s"reference disagrees on case $i $p")
      assert(g === exp, s"operator disagrees on case $i $p")
    }
  }

  test("horizontal edges: ray collinear with an edge counts it zero times") {
    // concave L-shape with horizontal edges: (0,0)-(40,0)-(40,10)-(10,10)-(10,40)-(0,40)
    val ell = Seq[(Long, Long)]((0, 0), (40, 0), (40, 10), (10, 10), (10, 40), (0, 40))
    val cases = Seq[((Long, Long), Boolean)](
      ((5, 5), true), ((20, 5), true), ((5, 20), true),
      ((20, 20), false),  // in the notch
      ((20, 10), false),  // ON the horizontal edge y=10 — half-open: the edge
                          // (40,10)-(10,10) never spans py=10, parity from the rest
      ((5, 10), true),    // inside the vertical arm at the notch height
      ((50, 10), false),  // outside right, collinear with the horizontal edge
      ((-5, 0), false))   // outside left, collinear with the bottom edge
    val got = runInside(ell, cases.map(_._1))
    for ((((p, exp), g), i) <- cases.zip(got).zipWithIndex) {
      assert(refInside(ell, p._1, p._2) === exp, s"reference disagrees on case $i $p")
      assert(g === exp, s"operator disagrees on case $i $p")
    }
  }

  test("randomized: operator matches the imperative reference on star grids") {
    val rnd = new scala.util.Random(211)
    for (_ <- 1 to 3) {
      val cx = 500L + rnd.nextInt(1000); val cy = 500L + rnd.nextInt(1000)
      val wx = 60L + rnd.nextInt(200); val wy = 60L + rnd.nextInt(200)
      val verts = Seq[(Long, Long)](
        (cx + wx, cy), (cx + wx / 3, cy + wy / 3), (cx, cy + wy),
        (cx - wx / 3, cy + wy / 3), (cx - wx, cy), (cx - wx / 3, cy - wy / 3),
        (cx, cy - wy), (cx + wx / 3, cy - wy / 3))
      // dense grid INCLUDING vertex-aligned rows/columns (grazing by design)
      val pts = for (dx <- -3 to 3; dy <- -3 to 3)
        yield (cx + dx * wx / 3, cy + dy * wy / 3)
      val got = runInside(verts, pts)
      val exp = pts.map { case (x, y) => refInside(verts, x, y) }
      assert(got === exp, s"star cx=$cx cy=$cy wx=$wx wy=$wy")
    }
  }
}
