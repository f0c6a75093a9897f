package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Betweenness

/** Bounded-distance Brandes betweenness pinned against a driver-side
  * reference that runs the textbook per-source algorithm (queue BFS, σ by
  * level order, δ by reverse level order, truncated at the radius) — on
  * shapes exercising multiple shortest paths (σ > 1), ties, phantom edge
  * targets, radius truncation, and UNBOUNDED out-degree (the r15 ordered-
  * fold upgrade: δ folds in successor order, so the old out-degree ≤ 2
  * precondition is gone). The reference folds δ in the SAME successor
  * order with the SAME per-term op sequence, so dist, σ AND δ must all
  * match EXACTLY (bitwise for δ) — the order contract the DuckDB
  * SUM(ORDER BY) oracle replays is pinned here first. */
class BetweennessSpec extends AnyFunSuite {
  import TestSpark._

  /** (dist, sigma, delta) per (source, node) — phantom ids (≥ n) relay
    * paths but are excluded from the returned map, as in the operator. */
  private def reference(n: Int, edges: Seq[(Int, Int)], sources: Seq[Int],
      h: Int): Map[(Long, Long), (Long, Long, Double)] = {
    val adj = edges.distinct.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).distinct }
    val out = scala.collection.mutable.Map.empty[(Long, Long), (Long, Long, Double)]
    for (s <- sources) {
      val dist = scala.collection.mutable.Map(s -> 0L)
      val sigma = scala.collection.mutable.Map(s -> 1L)
      var level = Seq(s)
      for (d <- 1 to h) {
        // two passes: first mark all new nodes at this level, then sum σ
        val newNodes = level.flatMap(v => adj.getOrElse(v, Nil))
          .filter(w => !dist.contains(w)).distinct
        newNodes.foreach { w => dist(w) = d }
        val sig = scala.collection.mutable.Map.empty[Int, Long]
        for (v <- level; w <- adj.getOrElse(v, Nil) if dist(w) == d)
          sig(w) = sig.getOrElse(w, 0L) + sigma(v)
        sig.foreach { case (w, c) => sigma(w) = c }
        level = newNodes
      }
      val delta = scala.collection.mutable.Map.empty[Int, Double]
      for (d <- (h - 1) to 0 by -1) {
        for (v <- dist.keys if dist(v) == d) {
          var acc = 0.0
          // successor-ASC fold: the operator's sort_array+aggregate order
          for (w <- adj.getOrElse(v, Nil).sorted
               if dist.get(w).contains(d + 1L))
            acc += sigma(v).toDouble / sigma(w).toDouble *
              (1.0 + delta.getOrElse(w, 0.0))
          delta(v) = acc
        }
      }
      for (v <- dist.keys if v != s && v < n)
        out((s.toLong, v.toLong)) =
          (dist(v), sigma(v), delta.getOrElse(v, 0.0))
    }
    out.toMap
  }

  private def run(n: Int, edges: Seq[(Int, Int)], sources: Seq[Int],
      h: Int): Map[(Long, Long), (Long, Long, Double)] = {
    import TestSpark.spark.implicits._
    val nodesDf = (0 until n).map(_.toLong).toDF("node")
    val edgesDf = edges.map { case (a, b) => (a.toLong, b.toLong) }.toDF("src", "dst")
    Betweenness.sampled(nodesDf, edgesDf, sources.map(_.toLong), h)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
  }

  test("matches textbook Brandes on diamond, chain, random, hub and phantom shapes") {
    def randK(n: Int, k: Int, seed: Int): Seq[(Int, Int)] = {
      val r = new scala.util.Random(seed)
      (0 until n).flatMap { v =>
        Seq.fill(k)((v, r.nextInt(n))).filter(e => e._1 != e._2)
      }.distinct
    }
    val diamond = Seq((0, 1), (0, 2), (1, 3), (2, 3), (3, 4)) // σ(0→3)=2, σ(0→4)=2
    val chain = (0 until 12).map(i => (i, i + 1)) // radius truncation at h<11
    // hub: node 1 fans out to FIVE successors at the same level — the
    // δ(1) sum has 5 order-sensitive terms; kills any commutativity-only
    // replay argument
    val hub = Seq((0, 1)) ++ (2 to 6).map(w => (1, w)) ++
      (2 to 6).map(w => (w, 7))
    val shapes: Seq[(Int, Seq[(Int, Int)], Seq[Int], Int)] = Seq(
      (5, diamond, Seq(0), 4),
      (13, chain, Seq(0, 3), 6),
      (8, hub, Seq(0), 4),
      (40, randK(40, 2, 11), Seq(1, 2, 3), 8),
      (30, randK(30, 2, 23), Seq(0, 7), 5),
      // unbounded out-degree: 5 random out-edges per node
      (25, randK(25, 5, 47), Seq(0, 3), 5),
      // phantom targets: edges from real nodes into ids ≥ n relay paths
      (10, randK(10, 2, 31) ++ Seq((1, 12), (12, 4), (2, 12)), Seq(0, 1), 6))
    for ((n, edges, sources, h) <- shapes) {
      val exp = reference(n, edges, sources, h)
      val got = run(n, edges, sources, h)
      assert(got.keySet == exp.keySet,
        s"n=$n reach mismatch: extra=${got.keySet -- exp.keySet} missing=${exp.keySet -- got.keySet}")
      for ((k, (d, sg, dl)) <- exp) {
        val (gd, gsg, gdl) = got(k)
        assert(gd == d && gsg == sg, s"n=$n $k dist/sigma: got ($gd,$gsg) want ($d,$sg)")
        // EXACT: the operator's ordered fold must replay the reference's
        // successor-ASC fold bit for bit
        assert(java.lang.Double.doubleToLongBits(gdl) ==
            java.lang.Double.doubleToLongBits(dl),
          s"n=$n $k delta: got $gdl want $dl (bitwise)")
      }
    }
  }

  test("source sitting on other sources' paths accumulates dependency") {
    // 0→1→2→3 with sources {0, 1}: node 1 is interior to source 0's paths
    // (δ₀(1) = 2: targets 2 and 3) even though it is itself a source.
    val got = run(4, Seq((0, 1), (1, 2), (2, 3)), Seq(0, 1), 3)
    assert(got((0L, 1L)) == ((1L, 1L, 2.0)))
    assert(got((1L, 2L)) == ((1L, 1L, 1.0)))
  }
}
