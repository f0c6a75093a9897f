package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the two r14 sufficient-statistic lanes against driver-side
  * reference models on sf0.001: ml_ridge's λ=0 row must equal the OLS
  * closed form exactly and the path must shrink monotonically toward
  * zero; events_pacf's φ22 must equal the Durbin-Levinson value computed
  * from the exact integer ACF forms. */
class RidgePacfSpec extends AnyFunSuite {
  import TestSpark._

  test("ml_ridge: λ=0 is OLS exactly; |slope| shrinks monotonically in λ") {
    val rows = SparkEntry.queries("ml_ridge")(spark, Sf).collect()
    assert(rows.length == 4)
    val byLam = rows.map(r => r.getLong(0) ->
      (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    // reference OLS from the raw table, exact integer suffstats
    val ev = graft.sources.Tables.events(spark, Sf)
      .selectExpr("(ts_ns div 3600000000000) % 24 as x",
        "cast(cast(value as decimal(12,2)) * 100 as bigint) as y")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = ev.length.toLong
    val sx = ev.map(_._1).sum; val sy = ev.map(_._2).sum
    val sxy = ev.map(t => t._1 * t._2).sum
    val sxx = ev.map(t => t._1 * t._1).sum
    val num = (BigDecimal(n) * BigDecimal(sxy) - BigDecimal(sx) * BigDecimal(sy))
    def slope(lam: Long): Double =
      (num / (BigDecimal(n) * BigDecimal(sxx) - BigDecimal(sx) * BigDecimal(sx)
        + BigDecimal(lam) * BigDecimal(n))).toDouble
    assert(byLam(0L)._1 == n)
    // same rational, one rounding each side — agree to double ulps
    assert(math.abs(byLam(0L)._2 - slope(0L)) <= math.ulp(slope(0L)) * 4)
    assert(math.abs(byLam(4096L)._2 - slope(4096L)) <= math.ulp(slope(4096L)) * 4)
    val mags = Seq(0L, 16L, 256L, 4096L).map(l => math.abs(byLam(l)._2))
    assert(mags == mags.sorted.reverse, s"ridge path not shrinking: $mags")
    assert(mags.last < mags.head)
  }

  test("events_pacf: φ22 equals Durbin-Levinson from the exact ACF rationals") {
    val rows = SparkEntry.queries("events_pacf")(spark, Sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val r1 = r.getDouble(2); val r2 = r.getDouble(3)
      val phi22 = r.getDouble(4)
      // |r_k| ≤ 1 (Cauchy-Schwarz on the centered lagged products is not
      // exact for the m-pair variant, allow small slack) and the DL value
      assert(math.abs(r1) <= 1.2 && math.abs(r2) <= 1.2)
      val want = (r2 - r1 * r1) / (1.0 - r1 * r1)
      assert(math.abs(phi22 - want) < 1e-9,
        s"${r.getString(0)}: phi22 $phi22 vs DL $want")
    }
  }
}
