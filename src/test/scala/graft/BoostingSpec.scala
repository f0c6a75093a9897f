package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Boosting

/** Boosting.fitStumps vs a driver-side reference implementation of the
  * same spec (truncating integer leaf values, exact SSE recurrence) on
  * adversarial shapes: skewed targets, negative residuals, ties. */
class BoostingSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  /** Driver-side reference: same defined arithmetic, brute force. */
  private def reference(rows: Seq[(Long, Long, Long)], rounds: Int)
      : Seq[(Long, String, Long, Long, Long, Long, Long, Long, Long, Double, Long, Long)] = {
    // rows: (f1, f2, y); features named "a", "b"
    var r = rows.map { case (a, b, y) => (a, b, y) }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, Long, Long, Long, Long, Long, Long, Long, Double, Long, Long)]
    for (t <- 0 until rounds) {
      val q = r.map(x => x._3 * x._3).sum
      // candidates: (feature, bucket) with left = rows where fval <= bucket
      val cands = for {
        (fname, fget) <- Seq[(String, ((Long, Long, Long)) => Long)](
          ("a", _._1), ("b", _._2))
        bucket <- r.map(fget).distinct.sorted
        left = r.filter(x => fget(x) <= bucket)
        if left.size < r.size
      } yield {
        val nl = left.size.toLong
        val sl = left.map(_._3).sum
        val nr = r.size - nl
        val srr = r.map(_._3).sum - sl
        val score = (BigInt(sl) * BigInt(sl)).toDouble / nl.toDouble +
          (BigInt(srr) * BigInt(srr)).toDouble / nr.toDouble
        (fname, bucket, nl, sl, nr, srr, score)
      }
      val best = cands.sortBy { case (f, b, _, _, _, _, sc) => (-sc, f, b) }.head
      val (bf, bb, nl, sl, nr, srr, score) = best
      val vL = sl / (8 * nl) // Scala / truncates toward zero, like div
      val vR = srr / (8 * nr)
      val sse = q - 2 * (vL * sl + vR * srr) + nl * vL * vL + nr * vR * vR
      out += ((t.toLong, bf, bb, nl, sl, nr, srr, vL, vR, score, q, sse))
      val fget: ((Long, Long, Long)) => Long = if (bf == "a") _._1 else _._2
      r = r.map(x => (x._1, x._2, x._3 - (if (fget(x) <= bb) vL else vR)))
    }
    out.toSeq
  }

  private def run(rows: Seq[(Long, Long, Long)], rounds: Int): Unit = {
    val df = rows.toDF("a", "b", "y")
    val got = Boosting.fitStumps(df, Seq("a", "b"), "y", rounds)
      .orderBy("round")
      .as[(Long, String, Long, Long, Long, Long, Long, Long, Long, Double, Long, Long)]
      .collect().toSeq
    assert(got == reference(rows, rounds))
  }

  test("skewed positive targets: model matches reference, SSE never increases") {
    val rows = (0L until 40L).map(i => (i % 5, i % 3, (i * i) % 97 + 3))
    run(rows, 3)
    val sse = Boosting.fitStumps(rows.toDF("a", "b", "y"), Seq("a", "b"), "y", 3)
      .orderBy("round").select("sse_before", "sse_after")
      .as[(Long, Long)].collect()
    sse.foreach { case (b, a) => assert(a <= b) }
    // rounds chain: next round's sse_before == this round's sse_after
    sse.sliding(2).foreach {
      case Array((_, a0), (b1, _)) => assert(a0 == b1)
      case _ =>
    }
  }

  test("negative targets exercise truncating division on both sides") {
    val rows = (0L until 30L).map(i => (i % 4, i % 7, 50L - 7 * i))
    run(rows, 3)
  }

  test("tied scores break on (feature, bucket) deterministically") {
    // symmetric data: feature a and b are identical columns, so every
    // (bucket) candidate ties across features — 'a' must win
    val rows = (0L until 16L).map(i => (i % 2, i % 2, 100 * (i % 2) + 10))
    val got = Boosting.fitStumps(rows.toDF("a", "b", "y"), Seq("a", "b"), "y", 1)
      .select("feature").as[String].collect()
    assert(got.toSeq == Seq("a"))
    run(rows, 2)
  }

  test("single boosting round on constant target yields zero-ish leaves") {
    val rows = (0L until 12L).map(i => (i % 3, i % 2, 80L))
    run(rows, 2)
  }
}
