package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins events_granger's F statistic and both SSE folds BITWISE against a
  * BigInt-exact driver reference (Cramer determinants in BigInt, one
  * correctly-rounded double division per coefficient, day-ordered IEEE
  * residual folds — the identical op sequence), and profile_entropy
  * against a string-sorted Math.log fold. */
class GrangerEntropySpec extends AnyFunSuite {
  import TestSpark._

  private def bits(d: Double) = java.lang.Double.doubleToLongBits(d)

  test("events_granger replays a BigInt-exact Cramer + ordered-fold reference") {
    val daily = graft.sources.Tables.events(spark, Sf)
      .selectExpr("event_type", "ts_ns div 86400000000000 as day")
      .groupBy("event_type", "day").count()
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byType = daily.groupBy(_._1).view.mapValues(
      _.map(t => t._2 -> t._3).toMap).toMap
    // lag2 rows per type: (day, x_t, x_{t-1}) for days with a predecessor
    // in the OBSERVED sample sequence (row_number semantics, not calendar)
    val lag2 = byType.map { case (t, m) =>
      val days = m.keys.toSeq.sorted
      t -> days.zip(days.drop(1)).map { case (p, d) => d -> (m(d), m(p)) }.toMap
    }
    val types = byType.keys.toSeq.sorted
    val got = SparkEntry.queries("events_granger")(spark, Sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getBoolean(6))).toMap
    assert(got.size == types.size * (types.size - 1))
    for (xT <- types; yT <- types if xT != yT) {
      val days = (lag2(yT).keySet & lag2(xT).keySet).toSeq.sorted
      val rows = days.map { d =>
        val (y, u) = lag2(yT)(d)
        val v = lag2(xT)(d)._2
        (d, BigInt(y), BigInt(u), BigInt(v))
      }
      val n = BigInt(rows.length)
      def s(f: ((Long, BigInt, BigInt, BigInt)) => BigInt) = rows.map(f).sum
      val (sy, su, sv) = (s(_._2), s(_._3), s(_._4))
      val (suu, svv, suv) = (s(r => r._3 * r._3), s(r => r._4 * r._4), s(r => r._3 * r._4))
      val (suy, svy) = (s(r => r._3 * r._2), s(r => r._4 * r._2))
      def det3(m: Seq[BigInt]): BigInt =
        m(0) * (m(4) * m(8) - m(5) * m(7)) -
          m(1) * (m(3) * m(8) - m(5) * m(6)) +
          m(2) * (m(3) * m(7) - m(4) * m(6))
      val det = det3(Seq(n, su, sv, su, suu, suv, sv, suv, svv))
      val det0 = det3(Seq(sy, su, sv, suy, suu, suv, svy, suv, svv))
      val det1 = det3(Seq(n, sy, sv, su, suy, suv, sv, svy, svv))
      val det2 = det3(Seq(n, su, sy, su, suu, suy, sv, suv, svy))
      assert(det != 0, s"singular pair $xT->$yT in the test data")
      val (b0, b1, b2) =
        (det0.toDouble / det.toDouble, det1.toDouble / det.toDouble,
          det2.toDouble / det.toDouble)
      val detr = n * suu - su * su
      val ar = (n * suy - su * sy).toDouble / detr.toDouble
      val cr = (sy.toDouble - ar * su.toDouble) / n.toDouble
      var sseU = 0.0
      var sseR = 0.0
      for ((_, y, u, v) <- rows) {
        val predU = b0 + b1 * u.toDouble + b2 * v.toDouble
        val predR = cr + ar * u.toDouble
        sseU = sseU + (y.toDouble - predU) * (y.toDouble - predU)
        sseR = sseR + (y.toDouble - predR) * (y.toDouble - predR)
      }
      val f = (sseR - sseU) * (n - 3).toDouble / sseU
      val (gn, gSseR, gSseU, gF, gFlag) = got((xT, yT))
      assert(gn == rows.length.toLong, s"$xT->$yT n")
      assert(bits(gSseR) == bits(sseR), s"$xT->$yT sse_r $gSseR vs $sseR")
      assert(bits(gSseU) == bits(sseU), s"$xT->$yT sse_u $gSseU vs $sseU")
      assert(bits(gF) == bits(f), s"$xT->$yT f $gF vs $f")
      assert(gFlag == (f > 3.8414588206941245))
    }
  }

  test("profile_entropy replays a string-sorted Math.log fold") {
    val ev = graft.sources.Tables.events(spark, Sf).selectExpr(
      "cast(event_type as string) as a",
      "cast((ts_ns div 3600000000000) % 24 as string) as b",
      "cast(((ts_ns div 86400000000000) + 4) % 7 as string) as c").collect()
    def ent(f: org.apache.spark.sql.Row => String): (Long, Long, Double) = {
      val cells = ev.groupBy(f).view.mapValues(_.length.toLong)
        .toSeq.sortBy(_._1)
      val n = cells.map(_._2).sum
      var acc = 0.0
      for ((_, c) <- cells) {
        val p = c.toDouble / n.toDouble
        acc = acc + p * math.log(p)
      }
      (n, cells.length.toLong, -acc)
    }
    val want = Map("event_type" -> ent(_.getString(0)),
      "hour" -> ent(_.getString(1)), "dow" -> ent(_.getString(2)))
    val got = SparkEntry.queries("profile_entropy")(spark, Sf).collect()
    assert(got.length == 3)
    for (r <- got) {
      val (n, nd, h) = want(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == nd)
      assert(bits(r.getDouble(3)) == bits(h), s"${r.getString(0)} h")
      assert(bits(r.getDouble(4)) == bits(h / math.log(nd.toDouble)),
        s"${r.getString(0)} h_norm")
    }
  }
}
