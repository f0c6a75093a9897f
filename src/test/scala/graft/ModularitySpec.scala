package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Modularity

/** Synchronous one-level Louvain sweep pinned against a driver-side
  * model: the exact gain numerator 2m − k_u·k_v, the (gain desc, min
  * neighbor) tie-break, the stay-on-nonpositive-gain rule, and the
  * resulting partition's scaled modularity q_num = Σ_c (4m·e_c − Σtot_c²)
  * over q_den = 4m² — all integer, all replayed imperatively here. */
class ModularitySpec extends AnyFunSuite {
  import TestSpark._

  private def model(nodes: Seq[Long], und: Seq[(Long, Long)])
      : (Map[Long, Long], Long, Long) = {
    val sym = (und ++ und.map(e => (e._2, e._1))).distinct
    val adj = sym.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sorted }
    val deg = adj.map { case (k, v) => k -> v.size.toLong }.withDefaultValue(0L)
    val m = sym.size.toLong / 2
    val labels = nodes.map { n =>
      adj.get(n) match {
        case None => n -> n
        case Some(nbrs) =>
          val scored = nbrs.map(v => (2 * m - deg(n) * deg(v), v))
          val (g, v) = scored.maxBy { case (g, v) => (g, -v) }
          n -> (if (g > 0) v else n)
      }
    }.toMap
    val byLabel = nodes.groupBy(labels)
    val qNum = byLabel.map { case (_, members) =>
      val ms = members.toSet
      val e2 = sym.count(e => ms(e._1) && ms(e._2)).toLong
      val sumTot = members.map(deg).sum
      2 * m * e2 - sumTot * sumTot
    }.sum
    (labels, qNum, 4 * m * m)
  }

  private def run(nodes: Seq[Long], und: Seq[(Long, Long)])
      : (Map[Long, Long], Long, Long) = {
    import TestSpark.spark.implicits._
    val nodesDf = nodes.toDF("node")
    val sym = (und ++ und.map(e => (e._2, e._1))).distinct
    val edgesDf = sym.toDF("u", "v")
    val labels = Modularity.sweep(nodesDf, edgesDf)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val q = Modularity.modularityScaled(labels, edgesDf).collect()(0)
    (got, q.getLong(0), q.getLong(1))
  }

  test("sweep and scaled modularity match the driver model on five shapes") {
    val rnd = new scala.util.Random(131)
    val twoCliques: Seq[(Long, Long)] =
      (for (a <- 0 to 4; b <- (a + 1) to 4) yield (a.toLong, b.toLong)) ++
        (for (a <- 5 to 9; b <- (a + 1) to 9) yield (a.toLong, b.toLong)) :+ (4L, 5L)
    val shapes: Seq[(Seq[Long], Seq[(Long, Long)])] = Seq(
      ((0L to 9L), twoCliques),
      // chain: end nodes have degree 1, interior 2 — gains differ by side
      ((0L to 12L), (0L until 12L).map(i => (i, i + 1))),
      // star: hub degree 8 vs leaf degree 1 — gain 2m − 8 ties across leaves
      ((0L to 8L), (1L to 8L).map(i => (0L, i))),
      // triangle + isolated nodes: isolates stay singleton with Σtot = 0
      ((0L to 5L), Seq((0L, 1L), (1L, 2L), (0L, 2L))),
      ((0L to 39L), Seq.fill(60)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter(e => e._1 != e._2).distinct))
    for (((nodes, edges), si) <- shapes.zipWithIndex) {
      val (gotL, gotN, gotD) = run(nodes, edges)
      val (expL, expN, expD) = model(nodes, edges)
      assert(gotL === expL, s"labels shape $si")
      assert((gotN, gotD) === (expN, expD), s"modularity shape $si")
    }
  }

  test("negative-gain nodes stay put: K2 with 2m = 2 and k_u·k_v = 1 moves") {
    // two nodes one edge: gain = 2·1 − 1·1 = 1 > 0 → both move to the other;
    // labels cross but the partition is {0,1} either way? No: labels are
    // VALUES — node 0 → 1, node 1 → 0 gives two distinct label classes of
    // size 1 each under synchronous moves. The model must agree exactly.
    val (gotL, gotN, gotD) = run(Seq(0L, 1L), Seq((0L, 1L)))
    val (expL, expN, expD) = model(Seq(0L, 1L), Seq((0L, 1L)))
    assert(gotL === expL)
    assert((gotN, gotD) === (expN, expD))
  }

  test("weighted sweep matches the model through a contraction round") {
    import TestSpark.spark.implicits._
    // two 4-cliques bridged: sweep 1 moves each node to its min-degree
    // neighbor; contract; the weighted sweep then sees weights + self-loops
    val und: Seq[(Long, Long)] =
      (for (a <- 0 to 3; b <- (a + 1) to 3) yield (a.toLong, b.toLong)) ++
        (for (a <- 4 to 7; b <- (a + 1) to 7) yield (a.toLong, b.toLong)) :+ (3L, 4L)
    val nodes = (0L to 7L)
    val sym = (und ++ und.map(e => (e._2, e._1))).distinct
    val edgesDf = sym.toDF("u", "v")
    val labels1 = Modularity.sweep(nodes.toDF("node"), edgesDf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // driver contraction
    val wed = sym.groupBy { case (u, v) => (labels1(u), labels1(v)) }
      .map { case ((a, b), xs) => (a, b, xs.size.toLong) }.toSeq
    val nodes2 = labels1.values.toSeq.distinct.sorted
    val got = Modularity.sweepWeighted(nodes2.toDF("node"),
        wed.toDF("u", "v", "w"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // driver model of the weighted sweep
    val deg = wed.groupBy(_._1).map { case (u, xs) => u -> xs.map(_._3).sum }
      .withDefaultValue(0L)
    val m = wed.map(_._3).sum / 2
    val exp = nodes2.map { n =>
      val nbrs = wed.filter(e => e._1 == n && e._2 != n)
      if (nbrs.isEmpty) n -> n
      else {
        val (g, v) = nbrs.map(e => (2 * m * e._3 - deg(n) * deg(e._2), e._2))
          .maxBy { case (g, v) => (g, -v) }
        n -> (if (g > 0) v else n)
      }
    }.toMap
    assert(got === exp)
  }

  test("empty edge set: all singletons, q_den = 0 guard shape") {
    import TestSpark.spark.implicits._
    val nodesDf = (0L to 3L).toDF("node")
    val edgesDf = Seq.empty[(Long, Long)].toDF("u", "v")
    val labels = Modularity.sweep(nodesDf, edgesDf)
    assert(labels.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      (0L to 3L).map(n => (n, n)).toSet)
  }
}
