package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.SemanticDedup

class SemanticDedupSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  /** Deterministic pseudo-random vectors (no Random: replayable). The
    * Murmur3-style finalizer matters: a plain multiplicative hash is linear
    * in the coordinate index, which makes every vector a near-parallel ramp
    * (background cosines ~1.0). Mixed at dim 32 the max background cosine
    * is 0.71 vs the 0.995 planted twins — a wide deterministic margin. */
  private def mix(x0: Long): Long = {
    var x = x0
    x = (x ^ (x >>> 33)) * 0xff51afd7ed558ccdL
    x = (x ^ (x >>> 33)) * 0xc4ceb9fe1a85ec53L
    x ^ (x >>> 33)
  }

  private def vec(seed: Long, dim: Int = 32): Array[Double] =
    Array.tabulate(dim) { i =>
      ((mix(seed * 1000003L + i) & 0xffffL).toDouble / 65536.0) - 0.5
    }

  private def corpus(n: Int) =
    (0L until n.toLong).map(i => (i, vec(i))).toDF("id", "v")

  test("planted twins dedup within cells; background pairs stay apart") {
    val base = corpus(80)
    // twin = odd coords scaled 1.2 (cos ~0.995); same planting as the gate
    val twins = base.where($"id" % 10 === 0)
      .select(($"id" + 1000L).as("id"),
        transform($"v", (x, i) => x * (lit(1.0) + lit(0.2) * (i % 2).cast("double"))).as("v"))
    val all = base.unionByName(twins)

    val pairs = SemanticDedup.nearDupPairs(all, "id", "v", threshold = 0.9,
      targetCellSize = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0L until 80L by 10L).map(i => (i, i + 1000L)).toSet
    assert(pairs === expected)

    val decisions = SemanticDedup.dedup(all, "id", "v", threshold = 0.9,
      targetCellSize = 16)
      .collect().map(r => (r.getLong(0), r.getBoolean(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    val expectedDecisions =
      (0L until 80L).map(i => (i, true, -1L)).toSet ++
        (0L until 80L by 10L).map(i => (i + 1000L, false, i)).toSet
    assert(decisions === expectedDecisions)
  }

  test("boundary pairs survive nprobe=2 probing even when argmax cells differ") {
    // Force a split: with nprobe=1 a straddling pair can be missed; verify
    // the pair set under nprobe=2 is a superset of the nprobe=1 set and
    // contains every planted twin on a corpus big enough to have many cells.
    val base = corpus(400)
    val twins = base.where($"id" % 8 === 0)
      .select(($"id" + 10000L).as("id"),
        transform($"v", (x, i) => x * (lit(1.0) + lit(0.2) * (i % 2).cast("double"))).as("v"))
    val all = base.unionByName(twins)
    val expected = (0L until 400L by 8L).map(i => (i, i + 10000L)).toSet

    val p2 = SemanticDedup.nearDupPairs(all, "id", "v", threshold = 0.9,
      targetCellSize = 32, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p2 === expected)

    val p1 = SemanticDedup.nearDupPairs(all, "id", "v", threshold = 0.9,
      targetCellSize = 32, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p1.subsetOf(p2))
  }

  test("property: pairs vs driver-side brute force on random twin-planted " +
    "corpora — precision is a strict subset invariant, planted recall total") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed * 31)
      val dim = 24
      val base = Array.tabulate(120)(i =>
        (i.toLong, Array.fill(dim)(rnd.nextDouble() - 0.5)))
      val twins = base.filter(_._1 % 9 == 0).map { case (i, v) =>
        (i + 5000L, v.zipWithIndex.map { case (x, j) => if (j % 2 == 1) x * 1.2 else x })
      }
      val all = base ++ twins

      def cos(a: Array[Double], b: Array[Double]): Double = {
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
        dot / (math.sqrt(na) * math.sqrt(nb))
      }
      val brute = (for {
        x <- all.indices; y <- all.indices
        if all(x)._1 < all(y)._1 && cos(all(x)._2, all(y)._2) >= 0.9
      } yield (all(x)._1, all(y)._1)).toSet
      val planted = base.filter(_._1 % 9 == 0).map(p => (p._1, p._1 + 5000L)).toSet

      val got = SemanticDedup.nearDupPairs(all.toSeq.toDF("id", "v"), "id", "v",
        threshold = 0.9, targetCellSize = 24)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      // precision: every emitted pair carries a verified cosine, so the
      // cell approximation can only MISS pairs, never invent them
      assert(got.subsetOf(brute), s"seed $seed: emitted non-threshold pair")
      // recall on the planted twins: the 0.995 margin is wide enough that
      // nprobe=2 probing recovers every one on these corpora
      assert(planted.subsetOf(got), s"seed $seed: missed planted twins ${planted -- got}")
    }
  }

  test("transitive chains collapse to one min-id exemplar") {
    // a ~ b ~ c by construction: b = a scaled, c = b scaled (all cos ~1)
    val a = vec(7L)
    val docs = Seq(
      (5L, a), (6L, a.map(_ * 1.01)), (7L, a.map(_ * 1.02)),
      (8L, vec(99L))).toDF("id", "v")
    val decisions = SemanticDedup.dedup(docs, "id", "v", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getBoolean(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(decisions === Set(
      (5L, true, -1L), (6L, false, 5L), (7L, false, 5L), (8L, true, -1L)))
  }
}
