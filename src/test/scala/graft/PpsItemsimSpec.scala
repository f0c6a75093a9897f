package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave-8 lanes against driver-side references on sf0.001: sample_pps's
  * tick coverage/containment invariants, orders_itemsim against a
  * brute-force basket count, ml_chi2_select against the textbook
  * (o−e)²/e contingency formula. */
class PpsItemsimSpec extends AnyFunSuite {
  import TestSpark._

  test("sample_pps: every tick 1..200 covered once, intervals contain their ticks") {
    val rows = SparkEntry.queries("sample_pps")(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty && rows.length <= 200)
    val w = graft.sources.Tables.orders(spark, Sf)
      .selectExpr("cast(o_orderkey as long) as ok",
        "cast(cast(o_totalprice as decimal(12,2)) * 100 as bigint) as wt")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val tw = w.map(_._2).sum
    // reference: walk the cumulative axis, find the row containing each tick
    var cum = 0L
    val sel = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    for ((ok, wt) <- w) {
      val lo = cum * 200 / tw
      cum += wt
      val hi = cum * 200 / tw
      if (hi > lo) sel += ((ok, wt, cum, hi))
    }
    assert(rows.toSeq == sel.toSeq)
    // ticks 1..200 all covered by selected intervals
    val covered = rows.flatMap { case (_, wt, c, _) =>
      ((c - wt) * 200 / tw + 1) to (c * 200 / tw) }.toSet
    assert(covered == (1L to 200L).toSet)
  }

  test("orders_itemsim: cooc/fa/fb match a brute-force basket count") {
    val rows = SparkEntry.queries("orders_itemsim")(spark, Sf).collect()
    assert(rows.length == 20)
    val op = graft.sources.Tables.lineitem(spark, Sf)
      .selectExpr("l_orderkey as ok", "l_partkey as pk").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val baskets = op.groupBy(_._1).map { case (_, xs) => xs.map(_._2).toSet }
    val freq = op.groupBy(_._2).map { case (p, xs) => p -> xs.size.toLong }
    for (r <- rows) {
      val (pa, pb, cooc) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val want = baskets.count(b => b.contains(pa) && b.contains(pb)).toLong
      assert(cooc == want, s"($pa,$pb) cooc $cooc vs $want")
      assert(r.getLong(3) == freq(pa) && r.getLong(4) == freq(pb))
      val cos = cooc.toDouble / math.sqrt(freq(pa).toDouble * freq(pb).toDouble)
      assert(math.abs(r.getDouble(5) - cos) < 1e-12)
    }
    // the report is the global top by cooc: nothing outside beats the min inside
    val minIn = rows.map(_.getLong(2)).min
    val all = (for {
      b <- baskets; a <- b; c <- b if a < c
    } yield (a, c)).groupBy(identity).map(_._2.size)
    assert(all.forall(_ <= minIn) ||
      all.count(_ > minIn) <= 20, "top-20 not the global top")
  }

  test("ml_chi2_select equals the textbook (o-e)^2/e contingency score") {
    val got = SparkEntry.queries("ml_chi2_select")(spark, Sf).collect()
      .map(r => r.getString(0) -> r.getDouble(4)).toMap
    val ev = graft.sources.Tables.events(spark, Sf)
      .selectExpr(
        "cast(cast(value as decimal(12,2)) * 100 as bigint) div 5000 as cents_b",
        "(ts_ns div 3600000000000) % 24 as hour",
        "((ts_ns div 86400000000000) + 4) % 7 as dow",
        "case when event_type = 'purchase' then 1L else 0L end as label")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val n = ev.length.toDouble
    val p = ev.map(_._4).sum.toDouble
    def chi2(bucketOf: ((Long, Long, Long, Long)) => Long): Double = {
      // .toSeq first: mapping a Map to (size, sum) tuples would DEDUP
      // buckets that share a size (tuple-result map keeps Map semantics)
      val cells = ev.groupBy(bucketOf).toSeq.map { case (_, xs) =>
        (xs.size.toDouble, xs.map(_._4).sum.toDouble) }
      cells.map { case (nb, op) =>
        val ep = nb * p / n; val en = nb * (n - p) / n
        (op - ep) * (op - ep) / ep + ((nb - op) - en) * ((nb - op) - en) / en
      }.sum
    }
    val want = Map("cents_b" -> chi2(_._1), "hour" -> chi2(_._2), "dow" -> chi2(_._3))
    for ((f, w) <- want)
      assert(math.abs(got(f) - w) / (w max 1.0) < 1e-9, s"$f: ${got(f)} vs $w")
  }
}
