package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Auc

/** Contingency-cell Mann-Whitney AUC pinned against the brute-force
  * all-pairs count it compresses: u2 must EQUAL 2·#{(p,n): s_p > s_n} +
  * #{ties} exactly (both BIGINT), and auc must equal the one division. */
class AucSpec extends AnyFunSuite {
  import TestSpark._

  private def bruteU2(rows: Seq[(Long, Long)]): (Long, Long, Long) = {
    val pos = rows.filter(_._2 == 1L).map(_._1)
    val neg = rows.filter(_._2 == 0L).map(_._1)
    val wins = (for (p <- pos; q <- neg) yield if (p > q) 1L else 0L).sum
    val ties = (for (p <- pos; q <- neg) yield if (p == q) 1L else 0L).sum
    (2 * wins + ties, pos.size.toLong, neg.size.toLong)
  }

  test("u2 equals the brute-force doubled pair count on random score mixes") {
    import TestSpark.spark.implicits._
    val domain = Seq(0L, 1L, 2L, 3L)
    for (seed <- Seq(7, 19, 43)) {
      val rnd = new scala.util.Random(seed)
      // skew label odds with score so AUC lands strictly inside (0.5, 1)
      val rows = Seq.fill(400) {
        val s = rnd.nextInt(4).toLong
        val y = if (rnd.nextInt(4).toLong < s) 1L else 0L
        (s, y)
      }
      val (u2, n1, n0) = bruteU2(rows)
      val got = Auc.fromBucketScores(rows.toDF("v", "label"), "v", "label", domain)
        .collect().head
      assert(got.getLong(0) == n1 && got.getLong(1) == n0)
      assert(got.getLong(2) == u2, s"seed=$seed u2: got ${got.getLong(2)} want $u2")
      assert(got.getDouble(3) == u2.toDouble / (2.0 * n1 * n0))
    }
  }

  test("lift table matches per-cut brute-force counts") {
    import TestSpark.spark.implicits._
    val domain = Seq(0L, 1L, 2L, 3L)
    val rnd = new scala.util.Random(29)
    val rows = Seq.fill(300) {
      val s = rnd.nextInt(4).toLong
      (s, if (rnd.nextInt(5).toLong < s) 1L else 0L)
    }
    val n = rows.size.toLong
    val n1 = rows.count(_._2 == 1L).toLong
    val got = Auc.liftTable(rows.toDF("v", "label"), "v", "label", domain)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    for (cut <- domain) {
      val flagged = rows.count(_._1 >= cut).toLong
      val tp = rows.count(r => r._1 >= cut && r._2 == 1L).toLong
      val (gf, gtp, glift, grec) = got(cut)
      assert(gf == flagged && gtp == tp, s"cut=$cut counts")
      assert(glift == (tp * n).toDouble / (flagged * n1).toDouble)
      assert(grec == tp.toDouble / n1.toDouble)
    }
  }

  test("lift at a cut above every attained score is NULL, not a throw") {
    import TestSpark.spark.implicits._
    val rows = Seq((0L, 1L), (0L, 0L), (1L, 0L)) // nothing scores 2 or 3
    val r = Auc.liftTable(rows.toDF("v", "label"), "v", "label",
      Seq(0L, 1L, 2L, 3L)).collect()
    assert(r.filter(_.getLong(0) >= 2).forall(row =>
      row.getLong(1) == 0L && row.isNullAt(3)))
  }

  test("average precision matches the per-cut brute-force step sum") {
    import TestSpark.spark.implicits._
    val domain = Seq(0L, 1L, 2L, 3L)
    for (seed <- Seq(11, 31)) {
      val rnd = new scala.util.Random(seed)
      val rows = Seq.fill(350) {
        val s = rnd.nextInt(4).toLong
        (s, if (rnd.nextInt(5).toLong < s) 1L else 0L)
      }
      val n1 = rows.count(_._2 == 1L).toLong
      // brute AP: descending cuts, Δtp = positives AT the cut level
      val want = domain.reverse.map { cut =>
        val flagged = rows.count(_._1 >= cut).toLong
        val tp = rows.count(r => r._1 >= cut && r._2 == 1L).toLong
        val dtp = rows.count(r => r._1 == cut && r._2 == 1L).toLong
        if (flagged == 0L) 0.0
        else (dtp.toDouble / n1.toDouble) * (tp.toDouble / flagged.toDouble)
      }.reduce(_ + _)
      val got = Auc.averagePrecision(rows.toDF("v", "label"), "v", "label", domain)
        .collect().head
      assert(got.getDouble(3) == want, s"seed=$seed ap")
      // perfect ranker: AP = 1; random baseline column = prevalence
      assert(got.getDouble(2) == n1.toDouble / rows.size.toDouble)
    }
    val perfect = Seq.fill(5)((3L, 1L)) ++ Seq.fill(7)((0L, 0L))
    val ap = Auc.averagePrecision(perfect.toDF("v", "label"), "v", "label", domain)
      .collect().head.getDouble(3)
    assert(ap == 1.0)
  }

  test("calibration table: per-level rates, NULL on unattained, exact Brier") {
    import TestSpark.spark.implicits._
    val domain = Seq(0L, 1L, 2L, 3L)
    // level 2 unattained; others with known rates
    val rows = Seq.fill(4)((0L, 0L)) ++ Seq((0L, 1L)) ++
      Seq.fill(3)((1L, 1L)) ++ Seq.fill(3)((1L, 0L)) ++
      Seq.fill(2)((3L, 1L))
    val got = Auc.calibrationTable(rows.toDF("v", "label"), "v", "label", domain)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(0L).getLong(1) == 5L && got(0L).getLong(2) == 1L)
    assert(got(0L).getDouble(4) == 0.2)
    assert(got(1L).getDouble(4) == 0.5)
    assert(got(2L).getLong(1) == 0L && got(2L).isNullAt(4) && got(2L).isNullAt(5))
    assert(got(3L).getDouble(4) == 1.0)
    // Brier replay: same fixed ascending fold as the operator
    val n = rows.size.toDouble
    val brier = domain.map { v =>
      val pv = v.toDouble / 3.0
      val p = rows.count(r => r._1 == v && r._2 == 1L).toDouble
      val q = rows.count(r => r._1 == v && r._2 == 0L).toDouble
      p * ((1.0 - pv) * (1.0 - pv)) + q * (pv * pv)
    }.reduce(_ + _) / n
    assert(got(0L).getDouble(6) == brier)
  }

  test("degenerate orderings: perfect, inverted, all-tied") {
    import TestSpark.spark.implicits._
    val domain = Seq(0L, 1L, 2L, 3L)
    def auc(rows: Seq[(Long, Long)]): Double =
      Auc.fromBucketScores(rows.toDF("v", "label"), "v", "label", domain)
        .collect().head.getDouble(3)
    val perfect = Seq.fill(5)((3L, 1L)) ++ Seq.fill(7)((0L, 0L))
    val inverted = Seq.fill(5)((0L, 1L)) ++ Seq.fill(7)((3L, 0L))
    val tied = Seq.fill(5)((2L, 1L)) ++ Seq.fill(7)((2L, 0L))
    assert(auc(perfect) == 1.0)
    assert(auc(inverted) == 0.0)
    assert(auc(tied) == 0.5)
  }
}
