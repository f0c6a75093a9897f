package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bfs

/** Frontier double-stepped BFS pinned against a driver-side queue BFS on
  * several graph shapes — distances must match exactly, unreachable nodes
  * must be absent, and phantom edge targets (ids outside the node set)
  * must be dropped. */
class BfsSpec extends AnyFunSuite {
  import TestSpark._

  private def reference(n: Int, edges: Seq[(Int, Int)], src: Int): Map[Long, Long] = {
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val dist = scala.collection.mutable.Map(src -> 0L)
    val q = scala.collection.mutable.Queue(src)
    while (q.nonEmpty) {
      val v = q.dequeue()
      for (w <- adj.getOrElse(v, Nil) if w < n && !dist.contains(w)) {
        dist(w) = dist(v) + 1; q.enqueue(w)
      }
    }
    dist.map { case (k, v) => k.toLong -> v }.toMap
  }

  private def run(n: Int, edges: Seq[(Int, Int)], src: Int): Map[Long, Long] = {
    import TestSpark.spark.implicits._
    val nodesDf = (0 until n).map(_.toLong).toDF("node")
    val edgesDf = edges.map { case (a, b) => (a.toLong, b.toLong) }.toDF("src", "dst")
    Bfs.distances(nodesDf, edgesDf, src.toLong)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("matches queue BFS on random, chain and disconnected shapes") {
    val rnd = new scala.util.Random(53)
    val shapes: Seq[(Int, Seq[(Int, Int)], Int)] = Seq(
      // sparse random digraph
      { val n = 70; (n, Seq.fill(120)((rnd.nextInt(n), rnd.nextInt(n))).filter(e => e._1 != e._2).distinct, 1) },
      // long chain: odd diameter exercises the half-step of double-stepping
      { val n = 31; (n, (0 until 30).map(i => (i, i + 1)), 0) },
      // even-length chain
      { val n = 21; (n, (0 until 20).map(i => (i, i + 1)), 0) },
      // source with no out-edges: singleton result
      { val n = 10; (n, Seq((1, 2), (2, 3)), 5) },
      // disconnected component + phantom edge targets outside the node set
      { val n = 12; (n, Seq((0, 1), (1, 2), (2, 15), (8, 9), (9, 10)), 0) })
    for (((n, edges, src) , si) <- shapes.zipWithIndex) {
      // reference drops phantom targets (w < n) exactly like the operator's
      // node-set semi-join
      assert(run(n, edges, src) === reference(n, edges, src), s"shape $si")
    }
  }
}
