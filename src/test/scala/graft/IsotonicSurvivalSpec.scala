package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the wave-6 lanes against independent driver-side references on
  * sf0.001: ml_isotonic's minimax fit must equal PAVA (the O(m)
  * pool-adjacent-violators algorithm — a genuinely different
  * construction) and be monotone; survival_na's cumulative hazard must
  * equal the ascending d/n fold and dominate -ln(KM) ordering-wise;
  * ml_linreg2's coefficients must solve the normal equations. */
class IsotonicSurvivalSpec extends AnyFunSuite {
  import TestSpark._

  test("ml_isotonic equals PAVA and is non-decreasing") {
    val rows = SparkEntry.queries("ml_isotonic")(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).sortBy(_._1)
    assert(rows.nonEmpty)
    val iso = rows.map(_._5)
    assert(iso.zip(iso.tail).forall { case (a, b) => a <= b },
      s"not monotone: ${iso.mkString(",")}")
    // PAVA reference: pool adjacent violators on (n, pos) cells
    case class Block(w: Long, p: Long) { def mean: Double = p.toDouble / w }
    var blocks = List.empty[Block]
    for ((_, n, pos, _, _) <- rows) {
      blocks = Block(n, pos) :: blocks
      while (blocks.lengthCompare(2) >= 0 &&
          blocks.head.mean <= blocks.tail.head.mean) {
        val a :: b :: rest = blocks: @unchecked
        blocks = Block(a.w + b.w, a.p + b.p) :: rest
      }
    }
    // expand pooled blocks back to per-cell fits by walking cell weights
    var fits = Vector.empty[Double]
    var rem = rows.toList
    for (b <- blocks.reverse) {
      var w = b.w
      while (w > 0 && rem.nonEmpty) {
        fits :+= b.p.toDouble / b.w
        w -= rem.head._2; rem = rem.tail
      }
    }
    assert(fits.length == rows.length, s"${fits.length} vs ${rows.length}")
    for ((got, want) <- iso.zip(fits))
      assert(math.abs(got - want) < 1e-12, s"minimax $got vs PAVA $want")
  }

  test("survival_na cumulative hazard equals the ascending d/n fold") {
    val rows = SparkEntry.queries("survival_na")(spark, Sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, seg) =>
      var h = 0.0
      for ((_, _, d, n, ch) <- seg.sortBy(_._2)) {
        h += d.toDouble / n.toDouble
        assert(ch == h, s"cum_hazard $ch vs fold $h")
      }
    }
    // hazard increments positive, curve strictly increasing per segment
    rows.groupBy(_._1).foreach { case (_, seg) =>
      val hs = seg.sortBy(_._2).map(_._5)
      assert(hs.zip(hs.tail).forall { case (a, b) => a < b })
    }
  }

  test("ml_linreg2 coefficients solve the normal equations") {
    val rows = SparkEntry.queries("ml_linreg2")(spark, Sf).collect()
    assert(rows.length == 3)
    val li = graft.sources.Tables.lineitem(spark, Sf)
      .selectExpr("l_returnflag as f",
        "cast(l_quantity as double) as x1",
        "cast(l_discount as double) as x2",
        "cast(l_extendedprice as double) as y")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    for (row <- rows) {
      val f = row.getString(0)
      val b1 = row.getDouble(5); val b2 = row.getDouble(6); val ic = row.getDouble(7)
      val g = li.filter(_._1 == f)
      // residuals orthogonal to [1, x1, x2] (normal equations), relative
      val res = g.map { case (_, x1, x2, y) => (x1, x2, y - ic - b1 * x1 - b2 * x2) }
      val scale = g.map(_._4).map(math.abs).sum
      assert(math.abs(res.map(_._3).sum) / scale < 1e-9)
      assert(math.abs(res.map(t => t._1 * t._3).sum) / (scale * 50) < 1e-9)
      assert(math.abs(res.map(t => t._2 * t._3).sum) / scale < 1e-9)
    }
  }
}
