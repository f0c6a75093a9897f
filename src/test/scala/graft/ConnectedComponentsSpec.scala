package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

class ConnectedComponentsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def cc(pairs: (Long, Long)*): Map[Long, Long] =
    Dedup.connectedComponents(pairs.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("transitive chains collapse to one cluster labeled by the min id") {
    // A~B, B~C via different pairs; D~E separate
    assert(cc((2L, 5L), (5L, 9L), (20L, 30L)) ===
      Map(2L -> 2L, 5L -> 2L, 9L -> 2L, 20L -> 20L, 30L -> 20L))
  }

  test("cycles and stars converge to the same label") {
    // cycle 1-2-3-1 plus star center 10 with leaves
    val got = cc((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L), (10L, 12L), (10L, 13L))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L))
  }

  test("a deep chain (diameter 12) still reaches fixpoint") {
    val chain = (0L until 12L).map(i => (100L + i, 101L + i))
    val got = cc(chain: _*)
    assert(got.values.toSet === Set(100L))
    assert(got.size === 13)
  }

  test("min id wins regardless of pair orientation") {
    assert(cc((9L, 1L), (1L, 5L)) === Map(1L -> 1L, 5L -> 1L, 9L -> 1L))
  }

  private def ccStar(pairs: (Long, Long)*): Map[Long, Long] =
    Dedup.connectedComponentsStar(pairs.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("star CC matches propagation on chains, cycles, and stars") {
    val cases = Seq(
      Seq((2L, 5L), (5L, 9L), (20L, 30L)),
      Seq((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L), (10L, 12L), (10L, 13L)),
      Seq((9L, 1L), (1L, 5L)),
      (0L until 12L).map(i => (100L + i, 101L + i)))
    for (ps <- cases) assert(ccStar(ps: _*) === cc(ps: _*), s"pairs=$ps")
  }

  test("adversarial 1000-long chain: propagation require-fails at its budget, star CC converges") {
    // the pathological template-family shape: a path graph of diameter
    // 1000 — min-label propagation needs ~1000 rounds (one hop per round)
    val chain = (0L until 1000L).map(i => (i, i + 1))
    val ex = intercept[IllegalArgumentException] {
      Dedup.connectedComponents(chain.toDF("a", "b"), "a", "b", maxIter = 20).collect()
    }
    assert(ex.getMessage.contains("did not converge"))
    val got = ccStar(chain: _*)
    assert(got.size === 1001)
    assert(got.values.toSet === Set(0L))
  }

  test("star CC handles self-pairs and single edges") {
    assert(ccStar((7L, 7L), (1L, 2L)) === Map(7L -> 7L, 1L -> 1L, 2L -> 1L))
  }

  test("star CC matches a union-find reference over 20 random graphs") {
    val rnd = new scala.util.Random(8204L)
    (1 to 20).foreach { _ =>
      val n = 2 + rnd.nextInt(30)
      val pairs = Seq.fill(1 + rnd.nextInt(40))(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      // driver-side union-find as the reference model
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = parent.keys.map(v => v -> find(v)).toMap
      assert(ccStar(pairs: _*) === expected, s"pairs=$pairs")
    }
  }
}
