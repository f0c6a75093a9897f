package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.PageRank

/** Scaled-integer PageRank pinned against a driver-side BigInt reference:
  * the operator's contract is EXACT integer recurrence (truncating div,
  * fixed teleport constant), so the distributed result must equal the
  * imperative replay bit-for-bit — no tolerance. Shapes exercise the
  * semantics: a directed cycle conserves its damped mass symmetrically, a
  * star concentrates mass in the hub, dangling nodes (no out-edges) leak
  * their damped mass by design, and a random sparse digraph pins the
  * general case. */
class PageRankSpec extends AnyFunSuite {
  import TestSpark._

  /** The operator's recurrence restated imperatively with BigInt — same
    * truncating division (operands non-negative), same teleport. */
  private def reference(nodes: Seq[Long], edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val ded = edges.distinct
    val deg = ded.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    var pr = nodes.map(n => n -> PageRank.Scale).toMap
    for (_ <- 1 to rounds) {
      val in = ded.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => (pr(u) * 17L) / (20L * deg(u)) }.sum
      }
      pr = nodes.map(n => n -> (PageRank.Teleport + in.getOrElse(n, 0L))).toMap
    }
    pr
  }

  private def run(nodes: Seq[Long], edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    import TestSpark.spark.implicits._
    PageRank.ranks(nodes.toDF("node"), edges.distinct.toDF("src", "dst"), rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("matches the BigInt reference exactly on four shapes") {
    val cycle = (0L to 5L).map(i => i -> ((i + 1) % 6))
    val star = (1L to 7L).map(i => i -> 0L)
    val dangling = Seq(0L -> 1L, 1L -> 2L, 3L -> 2L) // 2 has no out-edges
    val rnd = new scala.util.Random(41)
    val sparse = Seq.fill(60)((rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
      .filter(e => e._1 != e._2)
    for ((nodes, edges) <- Seq(
        ((0L to 5L), cycle),
        ((0L to 7L), star),
        ((0L to 3L), dangling),
        ((0L to 19L), sparse))) {
      assert(run(nodes, edges, 3) === reference(nodes, edges, 3))
    }
  }

  test("cycle symmetry: every node in a directed cycle gets equal rank") {
    val cycle = (0L to 5L).map(i => i -> ((i + 1) % 6))
    val got = run(0L to 5L, cycle, 4)
    assert(got.values.toSet.size === 1)
  }

  test("star: hub outranks leaves and leaves hold only teleport mass") {
    val star = (1L to 7L).map(i => i -> 0L)
    val got = run(0L to 7L, star, 3)
    assert((1L to 7L).forall(l => got(0L) > got(l)))
    assert((1L to 7L).forall(l => got(l) === PageRank.Teleport))
  }
}
