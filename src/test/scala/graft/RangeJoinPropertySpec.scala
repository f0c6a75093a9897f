package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RangeJoin

/** Randomized cross-check of the bucketized range join against the naive
  * quadratic reference over many generated datasets (fixed seed —
  * CI-stable). Sweeps bucket widths smaller than, comparable to, and much
  * larger than interval lengths, negative domains, zero-width and inverted
  * intervals, and boundary collisions — the shapes where the
  * bucket-expansion arithmetic could silently drop or duplicate a pair. */
class RangeJoinPropertySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("equals the quadratic reference over 25 random datasets and widths") {
    val rnd = new scala.util.Random(77L)
    (1 to 25).foreach { trial =>
      val span = 200
      val pts = Seq.fill(1 + rnd.nextInt(40))(
        (rnd.nextLong(1L << 40), rnd.nextInt(2 * span).toLong - span))
      val ivs = (0 until rnd.nextInt(15)).map { _ =>
        val s = rnd.nextInt(2 * span).toLong - span
        val len = rnd.nextInt(60) - 5 // includes zero-width and inverted
        (rnd.nextLong(1L << 40), s, s + len)
      }
      val width = 1L + rnd.nextInt(80)

      val got = RangeJoin.pointInInterval(
        pts.toDF("pid", "p"), ivs.toDF("iid", "s", "e"), "p", "s", "e", width)
        .select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val want = (for {
        (pid, p) <- pts
        (iid, s, e) <- ivs
        if p >= s && p < e
      } yield (pid, iid)).sorted
      assert(got === want, s"trial=$trial width=$width")
    }
  }

  test("interval overlap equals the quadratic reference (pairs claimed once)") {
    // The claim-by-max-start trick must emit every overlapping pair EXACTLY
    // once across widths where pairs share 0, 1, or many buckets.
    val rnd = new scala.util.Random(91L)
    (1 to 25).foreach { trial =>
      val span = 200
      def mk(n: Int) = (0 until n).map { _ =>
        val s = rnd.nextInt(2 * span).toLong - span
        val len = rnd.nextInt(60) - 5 // includes zero-width and inverted
        (rnd.nextLong(1L << 40), s, s + len)
      }
      val as = mk(1 + rnd.nextInt(25))
      val bs = mk(1 + rnd.nextInt(25))
      val width = 1L + rnd.nextInt(80)

      val got = RangeJoin.intervalOverlap(
        as.toDF("aid", "as", "ae"), bs.toDF("bid", "bs", "be"),
        "as", "ae", "bs", "be", width)
        .select("aid", "bid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val want = (for {
        (aid, s1, e1) <- as
        (bid, s2, e2) <- bs
        if s1 < e2 && s2 < e1
      } yield (aid, bid)).sorted
      assert(got === want, s"trial=$trial width=$width")
    }
  }
}
