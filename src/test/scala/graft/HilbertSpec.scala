package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.expressions.Spatial

class HilbertSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def xy2d(x0: Long, y0: Long): Long = {
    // independent driver-side reference of the same public walk
    var x = x0; var y = y0; var d = 0L; var s = 2048L
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = 4095L - x; y = 4095L - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  test("forward kernel inverts d2xy on random curve positions (bijectivity)") {
    val rnd = new scala.util.Random(29)
    val ds = Seq.fill(5000)(math.abs(rnd.nextLong()) % (4096L * 4096L))
    ds.foreach { d =>
      val (x, y) = Spatial.d2xy(d)
      assert(x >= 0 && x < 4096 && y >= 0 && y < 4096)
      assert(xy2d(x, y) === d, s"d=$d -> ($x,$y) did not invert")
    }
  }

  test("unit-step property: consecutive curve positions are grid neighbors") {
    // THE property that separates Hilbert from Morton (Z jumps diagonally
    // at power-of-two boundaries) — checked across those exact boundaries
    val rnd = new scala.util.Random(31)
    val starts = Seq(0L, 4095L, 4096L * 64 - 1, 4096L * 4096 - 1000) ++
      Seq.fill(500)(math.abs(rnd.nextLong()) % (4096L * 4096L - 1))
    starts.foreach { d =>
      val (x1, y1) = Spatial.d2xy(d)
      val (x2, y2) = Spatial.d2xy(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1L,
        s"step d=$d: ($x1,$y1)->($x2,$y2) is not a unit move")
    }
  }

  test("the Catalyst expression agrees with the reference on random cells") {
    val rnd = new scala.util.Random(37)
    val pts = Seq.fill(2000)((math.abs(rnd.nextLong()) % 4096,
      math.abs(rnd.nextLong()) % 4096))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), Spatial.hilbert(col("x"), col("y")).as("d"))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) === xy2d(x, y))
    }
  }
}
