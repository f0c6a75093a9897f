package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave-9 lanes against driver-side references on sf0.001. */
class ProfilingFunnelSpec extends AnyFunSuite {
  import TestSpark._

  test("profile_fd verdicts match direct group-distinct counts") {
    val got = SparkEntry.queries("profile_fd")(spark, Sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(5))).toMap
    assert(got.keySet == Set("orderkey->custkey", "custkey->orderpriority",
      "partkey->unitprice", "nationkey->regionkey"))
    val ord = graft.sources.Tables.orders(spark, Sf)
      .selectExpr("o_custkey", "o_orderpriority")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val groups = ord.groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).distinct.size }
    val (ng, nv) = (groups.size.toLong, groups.count(_._2 > 1).toLong)
    assert(got("custkey->orderpriority")._1 == ng)
    assert(got("custkey->orderpriority")._2 == nv)
    assert(!got("custkey->orderpriority")._3 == (nv > 0))
    assert(got("orderkey->custkey")._3 && got("nationkey->regionkey")._3)
  }

  test("profile_outliers: q1/q3 are exact ceil-rank order statistics; fences count right") {
    val rows = SparkEntry.queries("profile_outliers")(spark, Sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(4), r.getLong(5),
        r.getLong(6), r.getLong(7))).toMap
    val q = graft.sources.Tables.lineitem(spark, Sf)
      .selectExpr("cast(l_quantity as long) as x").collect().map(_.getLong(0)).sorted
    val n = q.length
    def ceilRank(p: Int) = q(((p * n + 99) / 100 - 1).toInt)
    val (q1, q3) = (ceilRank(25), ceilRank(75))
    val (gn, gq1, gq3, glo, ghi) = rows("quantity")
    assert(gn == n && gq1 == q1 && gq3 == q3)
    assert(glo == q.count(x => 2 * x < 2 * q1 - 3 * (q3 - q1)).toLong)
    assert(ghi == q.count(x => 2 * x > 2 * q3 + 3 * (q3 - q1)).toLong)
  }

  test("events_funnel_time p50/p90 are exact ceil-rank stats of driver-computed gaps") {
    val rows = SparkEntry.queries("events_funnel_time")(spark, Sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4)))
      .toMap
    val ev = graft.sources.Tables.events(spark, Sf)
      .where(org.apache.spark.sql.functions.expr("event_id % 13 = 0"))
      .selectExpr("user_id", "event_type", "ts_ns")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1)
    def stageGaps: (Seq[Long], Seq[Long]) = {
      val g12 = scala.collection.mutable.ArrayBuffer.empty[Long]
      val g23 = scala.collection.mutable.ArrayBuffer.empty[Long]
      for ((_, xs) <- byUser) {
        val views = xs.filter(_._2 == "view").map(_._3)
        if (views.nonEmpty) {
          val t1 = views.min
          val clicks = xs.filter(e => e._2 == "click" && e._3 > t1).map(_._3)
          if (clicks.nonEmpty) {
            val t2 = clicks.min
            g12 += (t2 - t1) / 60000000000L
            val purch = xs.filter(e => e._2 == "purchase" && e._3 > t2).map(_._3)
            if (purch.nonEmpty) g23 += (purch.min - t2) / 60000000000L
          }
        }
      }
      (g12.toSeq, g23.toSeq)
    }
    val (g12, g23) = stageGaps
    def check(name: String, gaps: Seq[Long]): Unit = if (gaps.nonEmpty) {
      val s = gaps.sorted; val n = s.length
      def cr(p: Int) = s(((p * n + 99) / 100 - 1).toInt)
      val (gn, mean, p50, p90) = rows(name)
      assert(gn == n.toLong)
      assert(math.abs(mean - gaps.sum.toDouble / n) < 1e-9)
      assert(p50 == cr(50) && p90 == cr(90), s"$name: $p50/$p90 vs ${cr(50)}/${cr(90)}")
    }
    check("view_to_click", g12)
    check("click_to_purchase", g23)
  }
}
