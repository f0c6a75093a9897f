package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TextRank

class TextRankSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  /** Driver-side reference model: same scaled-integer weighted PageRank,
    * plain Scala Longs. Truncating Long division == Spark `div` ==
    * DuckDB `//` on positive operands, so agreement here plus the
    * hash-green oracle pins all three implementations together. */
  private def model(
      edges: Seq[(String, String, Long)], iters: Int, scale: Long): Map[String, Long] = {
    val wsum = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    val nodes = edges.map(_._1).distinct
    var r = nodes.map(_ -> scale).toMap
    val base = 15L * scale / 100L
    for (_ <- 1 to iters) {
      val contrib = collection.mutable.Map[String, Long]().withDefaultValue(0L)
      for ((s, d, w) <- edges) contrib(d) += r(s) * w / wsum(s)
      r = nodes.map(n => n -> (base + 85L * contrib(n) / 100L)).toMap
    }
    r
  }

  test("rank fixed point equals the driver-side integer model on random graphs") {
    for (seed <- 31 to 33) {
      val rnd = new scala.util.Random(seed)
      val words = Vector.tabulate(25)(i => s"n$i")
      // random directed multigraph, collapsed to weights — every node gets
      // at least one out-edge so the node sets line up by construction
      val raw = words.map(w => (w, words(rnd.nextInt(words.size)))) ++
        Seq.fill(120)((words(rnd.nextInt(words.size)), words(rnd.nextInt(words.size))))
      val edges = raw.filter { case (a, b) => a != b }
        .groupBy(identity).map { case ((a, b), g) => (a, b, g.size.toLong) }.toSeq
      val got = TextRank.rankWords(
        edges.toDF("src", "dst", "w"), iterations = 5)
        .as[(String, Long)].collect().toMap
      val want = model(edges, iters = 5, scale = 1000000000L)
      assert(got === want, s"seed $seed: distributed ranks diverge from the Long model")
    }
  }

  test("a hub word out-ranks leaves and every rank is at least the damping base") {
    // star graph: hub <-> each leaf (undirected orientation pairs). The
    // hub receives every leaf's full contribution; leaves split the hub's.
    val leaves = (1 to 8).map(i => s"leaf$i")
    val edges = leaves.flatMap(l => Seq(("hub", l, 1L), (l, "hub", 1L)))
    val ranks = TextRank.rankWords(edges.toDF("src", "dst", "w"), iterations = 5)
      .as[(String, Long)].collect().toMap
    val base = 150000000L
    assert(ranks.values.forall(_ >= base))
    assert(leaves.forall(l => ranks("hub") > ranks(l)),
      "hub must dominate every leaf after the fixed point")
  }
}
