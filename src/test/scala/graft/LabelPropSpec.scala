package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.LabelProp

/** Deterministic label propagation pinned against a driver-side
  * synchronous reference on shapes chosen to exercise the semantics:
  * two cliques joined by one bridge edge must KEEP two communities
  * (majority voting resists the bridge — the behavior that separates LPA
  * from connected components), isolated nodes keep their own label, and
  * the (count desc, min label) tie-break must match exactly. */
class LabelPropSpec extends AnyFunSuite {
  import TestSpark._

  /** Synchronous rounds over an undirected edge list, majority label with
    * (count desc, min label) ties — the operator's contract restated
    * imperatively. */
  private def reference(nodes: Seq[Long], und: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val adj = (und ++ und.map(e => (e._2, e._1))).distinct
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var labels = nodes.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      labels = nodes.map { n =>
        adj.get(n) match {
          case None => n -> labels(n)
          case Some(nbrs) =>
            val votes = nbrs.map(labels).groupBy(identity)
              .map { case (l, xs) => (l, xs.size) }
            val best = votes.toSeq.minBy { case (l, c) => (-c, l) }._1
            n -> best
        }
      }.toMap
    }
    labels
  }

  private def run(nodes: Seq[Long], und: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    import TestSpark.spark.implicits._
    val nodesDf = nodes.toDF("node")
    val sym = (und ++ und.map(e => (e._2, e._1))).distinct
    val edgesDf = sym.toDF("u", "v")
    LabelProp.communities(nodesDf, edgesDf, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("matches the synchronous majority reference on five shapes") {
    val rnd = new scala.util.Random(97)
    val twoCliques: Seq[(Long, Long)] =
      (for (a <- 0 to 4; b <- (a + 1) to 4) yield (a.toLong, b.toLong)) ++
        (for (a <- 5 to 9; b <- (a + 1) to 9) yield (a.toLong, b.toLong)) :+ (4L, 5L)
    val shapes: Seq[(Seq[Long], Seq[(Long, Long)])] = Seq(
      // two 5-cliques + one bridge: communities must NOT merge
      ((0L to 9L), twoCliques),
      // chain: label waves move one hop per round
      ((0L to 12L), (0L until 12L).map(i => (i, i + 1))),
      // star: leaves adopt the hub's label in round 1, hub flips to min leaf
      ((0L to 8L), (1L to 8L).map(i => (0L, i))),
      // isolated nodes among a triangle
      ((0L to 5L), Seq((0L, 1L), (1L, 2L), (0L, 2L))),
      // random sparse graph
      ((0L to 39L), Seq.fill(50)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter(e => e._1 != e._2).distinct))
    for (((nodes, edges), si) <- shapes.zipWithIndex; rounds <- Seq(1, 3)) {
      assert(run(nodes, edges, rounds) === reference(nodes, edges, rounds),
        s"shape $si rounds $rounds")
    }
  }

  test("two bridged cliques keep two communities where CC would merge them") {
    val twoCliques: Seq[(Long, Long)] =
      (for (a <- 0 to 4; b <- (a + 1) to 4) yield (a.toLong, b.toLong)) ++
        (for (a <- 5 to 9; b <- (a + 1) to 9) yield (a.toLong, b.toLong)) :+ (4L, 5L)
    val out = run(0L to 9L, twoCliques, 3)
    assert(out.values.toSet.size == 2, s"expected 2 communities, got $out")
    assert((0L to 4L).map(out).toSet.size == 1)
    assert((5L to 9L).map(out).toSet.size == 1)
  }
}
