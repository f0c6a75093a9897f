package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TextFunctions => Tf}

/** Pins the wave-7 statistics/graph lanes against imperative driver-side
  * references on sf0.001: Kruskal-Wallis H from directly sorted midranks,
  * ANOVA's variance decomposition identity, Spearman via a from-scratch
  * rank correlation, and HITS against a plain adjacency-map iteration. */
class StatsTestsSpec extends AnyFunSuite {
  import TestSpark._

  private def rawEvents(): Array[(String, Long, Long)] =
    graft.sources.Tables.events(spark, Sf)
      .selectExpr("event_type",
        "cast(cast(value as decimal(12,2)) * 100 as bigint) as cents",
        "user_id % 3 as g")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

  test("events_kruskal H matches directly sorted midranks") {
    val got = SparkEntry.queries("events_kruskal")(spark, Sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(7), r.getDouble(8))).toMap
    val ev = rawEvents()
    for ((tpe, rows0) <- ev.groupBy(_._1)) {
      val vals = rows0.map(v => (v._2, v._3)).sortBy(_._1)
      val n = vals.length.toLong
      // midranks by tie groups
      val mr = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
      var i = 0
      while (i < vals.length) {
        var j = i
        while (j < vals.length && vals(j)._1 == vals(i)._1) j += 1
        val mid = (i + 1 + j).toDouble / 2.0 // avg of ranks i+1..j
        for (k <- i until j) mr += ((vals(k)._2, mid))
        i = j
      }
      val byG = mr.groupBy(_._1).map { case (g, xs) => g -> (xs.size.toLong, xs.map(_._2).sum) }
      val t = (0L to 2L).map { g =>
        val (ng, rg) = byG(g); rg * rg / ng.toDouble
      }.sum
      val h = 12.0 * t / (n * (n + 1)).toDouble - 3.0 * (n + 1).toDouble
      val tieSum = vals.groupBy(_._1).values.map { g =>
        val c = g.size.toDouble; c * c * c - c
      }.sum
      val hAdj = h / (1.0 - tieSum / (n.toDouble * n * n - n))
      assert(math.abs(got(tpe)._1 - h) < 1e-6, s"$tpe H ${got(tpe)._1} vs $h")
      assert(math.abs(got(tpe)._2 - hAdj) < 1e-6, s"$tpe H' ${got(tpe)._2} vs $hAdj")
    }
  }

  test("events_anova decomposition: ssb + ssw = sst computed from raw values") {
    val got = SparkEntry.queries("events_anova")(spark, Sf).collect()
    val ev = rawEvents()
    for (r <- got) {
      val tpe = r.getString(0)
      val xs = ev.filter(_._1 == tpe)
      val mean = xs.map(_._2).sum.toDouble / xs.length
      val sst = xs.map(v => (v._2 - mean) * (v._2 - mean)).sum
      val ssb = xs.groupBy(_._3).values.map { g =>
        val gm = g.map(_._2).sum.toDouble / g.size
        g.size * (gm - mean) * (gm - mean)
      }.sum
      assert(math.abs(r.getDouble(8) - ssb) / sst < 1e-9)
      assert(math.abs(r.getDouble(9) - (sst - ssb)) / sst < 1e-9)
      assert(math.abs((r.getDouble(8) + r.getDouble(9)) - sst) / sst < 1e-9)
    }
  }

  test("events_spearman matches a from-scratch rank correlation") {
    val got = SparkEntry.queries("events_spearman")(spark, Sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(4)).toMap
    assert(got.nonEmpty)
    val daily = graft.sources.Tables.events(spark, Sf)
      .selectExpr("event_type", "ts_ns div 86400000000000 as day")
      .groupBy("event_type", "day").count()
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def midranks(xs: Seq[Double]): Seq[Double] = {
      val sorted = xs.zipWithIndex.sortBy(_._1)
      val out = Array.ofDim[Double](xs.size)
      var i = 0
      while (i < sorted.size) {
        var j = i
        while (j < sorted.size && sorted(j)._1 == sorted(i)._1) j += 1
        val mid = (i + 1 + j).toDouble / 2.0
        for (k <- i until j) out(sorted(k)._2) = mid
        i = j
      }
      out.toSeq
    }
    val types = daily.map(_._1).distinct.sorted
    for (ta <- types; tb <- types if ta < tb) {
      val ma = daily.filter(_._1 == ta).map(d => d._2 -> d._3.toDouble).toMap
      val mb = daily.filter(_._1 == tb).map(d => d._2 -> d._3.toDouble).toMap
      val days = ma.keySet.intersect(mb.keySet).toSeq.sorted
      if (days.size >= 2 && got.contains((ta, tb))) {
        val ra = midranks(days.map(ma)); val rb = midranks(days.map(mb))
        val m = days.size.toDouble
        val num = m * ra.zip(rb).map(p => p._1 * p._2).sum - ra.sum * rb.sum
        val vx = m * ra.map(x => x * x).sum - ra.sum * ra.sum
        val vy = m * rb.map(x => x * x).sum - rb.sum * rb.sum
        val rho = num / math.sqrt(vx * vy)
        assert(math.abs(got((ta, tb)) - rho) < 1e-9, s"($ta,$tb)")
      }
    }
  }

  test("graph_hits equals an imperative 2-round iteration on the same edges") {
    val got = SparkEntry.queries("graph_hits")(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == 20)
    val cust = graft.sources.Tables.customer(spark, Sf)
      .select(col("c_custkey").cast("long").as("node"))
    val n = cust.count()
    val edges = cust.where(col("node") % 7 =!= 0)
      .select(col("node").as("src"), explode(array(
        pmod(Tf.hash60(concat(lit("hits-a-"), col("node").cast("string"))), lit(n)),
        pmod(Tf.hash60(concat(lit("hits-b-"), col("node").cast("string"))), lit(n))))
        .as("dst"))
      .where(col("src") =!= col("dst"))
      .join(cust.select(col("node").as("dst")), Seq("dst"), "left_semi")
      .distinct()
      .collect().map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst")))
    val nodes = cust.collect().map(_.getLong(0))
    var hub = nodes.map(_ -> 1L).toMap
    var auth = Map.empty[Long, Long]
    for (_ <- 1 to 2) {
      auth = nodes.map(v => v -> 0L).toMap ++
        edges.groupBy(_._2).map { case (d, es) => d -> es.map(e => hub(e._1)).sum }
      hub = nodes.map(v => v -> 0L).toMap ++
        edges.groupBy(_._1).map { case (s0, es) => s0 -> es.map(e => auth(e._2)).sum }
    }
    val want = nodes.map(v => (v, auth(v), hub(v)))
      .sortBy(t => (-t._2, -t._3, t._1)).take(20)
    assert(got.toSeq == want.toSeq)
  }
}
