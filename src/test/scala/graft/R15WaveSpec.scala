package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Property specs for the r15 wave: DBSCAN vs a brute-force reference on
  * planted layouts, AR(3) Durbin-Levinson replay, and MI vs a driver-side
  * fold in the same order over the same exact cells. */
class R15WaveSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // ---- ml_dbscan ----

  /** Textbook DBSCAN reference with the lane's deterministic tie-breaks:
    * core ⇔ ≥ minPts-1 neighbors, clusters = CC over core-core edges with
    * min-id labels, border → min core-neighbor's cluster. */
  private def refDbscan(pts: Seq[(Long, Long, Long)], eps: Long, minPts: Int)
      : (Map[Long, (Long, Boolean)], Long) = {
    def d2(a: (Long, Long, Long), b: (Long, Long, Long)) =
      (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)
    val nbrs = pts.map(p => p._1 ->
      pts.filter(q => q._1 != p._1 && d2(p, q) <= eps * eps).map(_._1).toSet).toMap
    val core = pts.map(_._1).filter(id => nbrs(id).size >= minPts - 1).toSet
    // CC over core-core edges, min label
    val label = scala.collection.mutable.Map(core.toSeq.map(c => c -> c): _*)
    var changed = true
    while (changed) {
      changed = false
      for (c <- core; n <- nbrs(c) if core(n)) {
        val m = math.min(label(c), label(n))
        if (label(c) != m) { label(c) = m; changed = true }
        if (label(n) != m) { label(n) = m; changed = true }
      }
    }
    val borders = pts.map(_._1).filterNot(core).flatMap { id =>
      val coreNb = nbrs(id).filter(core)
      if (coreNb.isEmpty) None else Some(id -> (coreNb.map(label).min, false))
    }
    val out = core.toSeq.map(c => c -> (label(c), true)).toMap ++ borders.toMap
    val noise = pts.map(_._1).count(id => !out.contains(id))
    (out, noise.toLong)
  }

  private def runDbscan(pts: Seq[(Long, Long, Long)], eps: Long, minPts: Int) = {
    val df = pts.toDF("id", "x", "y")
      .withColumn("cx", expr(s"x div $eps"))
      .withColumn("cy", expr(s"y div $eps"))
    graft.operators.Dbscan.labels(df, eps, minPts).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
  }

  test("dbscan matches brute force on planted two-cluster-plus-noise layouts") {
    // cluster A: tight blob of 6 around (100, 100); cluster B: chain of 5
    // around (5000, 5000); noise: 3 isolated points; border: point 20 sits
    // within eps of A's edge but has too few neighbors to be core
    val eps = 150L
    val pts: Seq[(Long, Long, Long)] =
      Seq((1L, 100L, 100L), (2L, 150L, 120L), (3L, 80L, 160L), (4L, 130L, 60L),
        (5L, 60L, 90L), (6L, 170L, 170L),
        (11L, 5000L, 5000L), (12L, 5100L, 5000L), (13L, 5200L, 5000L),
        (14L, 5300L, 5000L), (15L, 5400L, 5000L),
        (20L, 290L, 170L), // border of A via point 6
        (30L, 9000L, 100L), (31L, 100L, 9000L), (32L, 7000L, 7000L))
    val got = runDbscan(pts, eps, minPts = 4)
    val (want, noise) = refDbscan(pts, eps, minPts = 4)
    assert(got == want, s"labels differ: got=$got want=$want")
    assert(pts.size - got.size == noise)
  }

  test("dbscan on random layouts matches brute force") {
    val rnd = new scala.util.Random(151)
    for (trial <- 1 to 3) {
      val pts = (1L to 120L).map(i =>
        (i, rnd.nextInt(4000).toLong, rnd.nextInt(4000).toLong))
        // pairsWithin assumes distinct ids; coordinates may collide freely
        .toSeq
      val eps = 400L
      val got = runDbscan(pts, eps, minPts = 4)
      val (want, _) = refDbscan(pts, eps, minPts = 4)
      assert(got == want, s"trial $trial differs")
    }
  }

  test("ml_dbscan census is consistent: totals partition the point set") {
    val rows = SparkEntry.queries("ml_dbscan")(spark, Sf).collect()
    val n = graft.sources.Tables.customer(spark, Sf).count()
    assert(rows.map(_.getLong(3)).sum == n, "census rows must partition the corpus")
    val noise = rows.filter(_.getLong(0) == -1L)
    assert(noise.length == 1 && noise.head.getLong(1) == 0L)
    // every real cluster has at least one core (border-only clusters can't exist)
    assert(rows.filter(_.getLong(0) >= 0L).forall(_.getLong(1) >= 1L))
  }

  // ---- events_ar_fit ----

  test("events_ar_fit coefficients replay Durbin-Levinson from the lane's own r1..r3") {
    val rows = SparkEntry.queries("events_ar_fit")(spark, Sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (r1, r2, r3) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      val v1 = 1.0 - r1 * r1
      assert(v1 != 0.0)
      val phi22 = (r2 - r1 * r1) / v1
      val phi21 = r1 - phi22 * r1
      val den3 = 1.0 - phi21 * r1 - phi22 * r2
      assert(den3 != 0.0)
      val phi33 = (r3 - phi21 * r2 - phi22 * r1) / den3
      // same IEEE op sequence → bitwise equality, no tolerance
      def bits(d: Double) = java.lang.Double.doubleToLongBits(d)
      assert(bits(r.getDouble(5)) == bits(phi21 - phi33 * phi22), s"$r a1")
      assert(bits(r.getDouble(6)) == bits(phi22 - phi33 * phi21), s"$r a2")
      assert(bits(r.getDouble(7)) == bits(phi33), s"$r a3")
      assert(bits(r.getDouble(8)) == bits(
        (1.0 - r1 * r1) * (1.0 - phi22 * phi22) * (1.0 - phi33 * phi33)), s"$r var_ratio")
      // reflection coefficients of a near-stationary series stay bounded
      assert(math.abs(r1) <= 1.2 && math.abs(phi22) <= 1.2 && math.abs(phi33) <= 1.2)
    }
  }

  // ---- events_ljungbox ----

  test("events_ljungbox Q replays from the autocorr lane's own r_k, bitwise") {
    val acf = SparkEntry.queries("events_autocorr")(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val nDays = SparkEntry.queries("events_ar_fit")(spark, Sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = SparkEntry.queries("events_ljungbox")(spark, Sf).collect()
    assert(rows.length == nDays.size)
    for (r <- rows) {
      val t = r.getString(0)
      val n = r.getLong(1)
      assert(n == nDays(t))
      var s = 0.0
      for (k <- 1 to 7) {
        val rk = acf((t, k.toLong))
        s = s + rk * rk / (n - k).toDouble
      }
      val q = n.toDouble * (n + 2).toDouble * s
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(q), s"$t: ${r.getDouble(2)} vs $q")
      assert(r.getLong(3) == 7L)
      assert(r.getBoolean(4) == (q > 14.067140449340169))
    }
  }

  // ---- events_ar_backtest ----

  test("events_ar_backtest: exact naive SSE, consistent counts and flag") {
    val daily = graft.sources.Tables.events(spark, Sf)
      .selectExpr("event_type", "ts_ns div 86400000000000 as day")
      .groupBy("event_type", "day").count()
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val byType = daily.keys.groupBy(_._1)
    val rows = SparkEntry.queries("events_ar_backtest")(spark, Sf).collect()
    for (r <- rows) {
      val t = r.getString(0)
      val days = byType(t).map(_._2).toSeq.sorted
      val xs = days.map(d => daily((t, d)))
      // exact integer naive SSE over rows with 3 lags present
      val naive = (3 until xs.length)
        .map(i => (xs(i) - xs(i - 1)) * (xs(i) - xs(i - 1))).sum
      assert(r.getLong(1) == xs.length - 3, s"$t n_pred")
      assert(r.getLong(3) == naive, s"$t sse_naive")
      assert(r.getDouble(2) >= 0.0)
      assert(r.getBoolean(4) == (r.getDouble(2) < naive.toDouble))
    }
  }

  // ---- text_char_entropy ----

  test("char entropy kernel: corners and a hand-computed reference") {
    import org.apache.spark.sql.functions._
    import graft.expressions.{CharEntropyStats, Sketch}
    def stats(t: String): (Long, Long, Double) = {
      val r = Seq(t).toDF("t")
        .select(Sketch.column(CharEntropyStats(Sketch.expr(col("t")))).as("st"))
        .head().getSeq[Double](0)
      (r(0).toLong, r(1).toLong, r(2))
    }
    assert(stats("") == ((0L, 0L, 0.0)))
    val single = stats("aaaa")
    assert(single._1 == 4L && single._2 == 1L &&
      java.lang.Double.doubleToLongBits(single._3) ==
        java.lang.Double.doubleToLongBits(-0.0)) // the pinned -0.0 corner
    // surrogate pair counts as ONE code point
    assert(stats("😀") == ((1L, 1L, -0.0)))
    // ascending-code-point fold, hand replayed: "ab" -> two p=1/2 terms
    val ab = stats("ab")
    val half = 0.5 * math.log(0.5)
    assert(java.lang.Double.doubleToLongBits(ab._3) ==
      java.lang.Double.doubleToLongBits(-(half + half)))
    // uniform 4-symbol text: H = ln 4 up to the fold's rounding
    val u4 = stats("abcdabcdabcd")
    assert(math.abs(u4._3 - math.log(4.0)) < 1e-12)
  }

  // ---- ml_mi_select ----

  test("ml_mi_select equals a driver-side fold over the exact cells, bitwise") {
    val ev = graft.sources.Tables.events(spark, Sf).selectExpr(
      "cast(cast(value as decimal(12,2)) * 100 as bigint) div 5000 as cents_b",
      "(ts_ns div 3600000000000) % 24 as hour",
      "((ts_ns div 86400000000000) + 4) % 7 as dow",
      "case when event_type = 'purchase' then 1L else 0L end as label")
      .collect()
    def mi(f: org.apache.spark.sql.Row => Long): Double = {
      val cells = ev.groupBy(r => f(r)).view.mapValues { rs =>
        (rs.length.toLong, rs.map(_.getLong(3)).sum)
      }.toSeq.sortBy(_._1)
      val n = cells.map(_._2._1).sum
      val p = cells.map(_._2._2).sum
      val q = n - p
      var acc = 0.0
      for ((_, (nb, op)) <- cells) {
        val pos = if (op > 0)
          op.toDouble / n.toDouble * math.log((op * n).toDouble / (nb * p).toDouble)
        else 0.0
        val neg = if (nb - op > 0)
          (nb - op).toDouble / n.toDouble *
            math.log(((nb - op) * n).toDouble / (nb * q).toDouble)
        else 0.0
        acc = acc + (pos + neg)
      }
      acc
    }
    val want = Map(
      "cents_b" -> mi(_.getLong(0)), "hour" -> mi(_.getLong(1)),
      "dow" -> mi(_.getLong(2)))
    val got = SparkEntry.queries("ml_mi_select")(spark, Sf).collect()
      .map(r => r.getString(0) -> r.getDouble(4)).toMap
    for ((k, w) <- want) {
      assert(java.lang.Double.doubleToLongBits(got(k)) ==
        java.lang.Double.doubleToLongBits(w), s"$k: ${got(k)} vs $w")
      assert(w >= -1e-12, s"MI must be non-negative: $k $w")
    }
  }
}
