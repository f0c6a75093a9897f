package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.QuantileHist

class QuantileHistSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val qs = Seq("0.25", "0.50", "0.75", "0.95")

  test("estimate brackets the exact rank statistic: est - width <= exact <= est") {
    val rnd = new scala.util.Random(7)
    // clustered + heavy-tailed + duplicated values, two keys
    val rows = (1 to 2000).map { i =>
      val k = if (i % 3 == 0) "a" else "b"
      val v = if (i % 7 == 0) 5000.0 else rnd.nextInt(200) * 3.5
      (k, v)
    }
    val df = rows.toDF("k", "v")
    val width = 25.0
    val est = QuantileHist.estimate(df, Seq("k"), "v", width, qs)
    val exact = QuantileHist.exactRankValue(df, Seq("k"), "v", width, qs)
    val joined = est.join(exact, Seq("k", "q")).collect()
    assert(joined.length === 2 * qs.length)
    joined.foreach { r =>
      val (e, x) = (r.getAs[Double]("est"), r.getAs[Double]("exact_v"))
      assert(x >= e - width && x <= e, s"k=${r.getString(0)} q=${r.getAs[Double]("q")} est=$e exact=$x")
    }
  }

  test("estimate is partitioning-invariant (mergeable histogram)") {
    val df = (1 to 500).map(i => ("g", (i * 37 % 211).toDouble)).toDF("k", "v")
    val a = QuantileHist.estimate(df, Seq("k"), "v", 10.0, qs)
      .orderBy("q").collect().map(_.getAs[Double]("est")).toSeq
    val b = QuantileHist.estimate(df.repartition(7), Seq("k"), "v", 10.0, qs)
      .orderBy("q").collect().map(_.getAs[Double]("est")).toSeq
    assert(a === b)
  }

  test("negative values bucket correctly (floor toward -inf)") {
    val df = Seq(("n", -99.0), ("n", -1.0), ("n", 0.0), ("n", 1.0), ("n", 99.0))
      .toDF("k", "v")
    val est = QuantileHist.estimate(df, Seq("k"), "v", 10.0, Seq("0.25", "0.50"))
      .orderBy("q").collect()
    // n=5: r(0.25)=2 -> exact -1.0 in bucket [-10,0) -> est 0.0;
    //      r(0.50)=3 -> exact 0.0 in bucket [0,10) -> est 10.0
    assert(est.map(_.getAs[Double]("est")).toSeq === Seq(0.0, 10.0))
  }

  test("histogram selection equals the naive per-group rank statistic (randomized, ties + edge values)") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 3000).map { i =>
      val k = s"k${i % 5}"
      val v = rnd.nextInt(10) match {
        case 0 => rnd.nextInt(20) * 25.0            // exactly on a bucket edge
        case 1 => -rnd.nextInt(300).toDouble        // negative
        case _ => rnd.nextInt(500) * 1.7            // duplicated cluster values
      }
      (k, v)
    }
    val df = rows.toDF("k", "v")
    val allQs = Seq("0.10", "0.25", "0.50", "0.75", "0.90", "0.95", "1.00")
    val got = QuantileHist.exactRankValue(df, Seq("k"), "v", 25.0, allQs)
      .collect()
      .map(r => (r.getString(0), r.getAs[Double]("q")) -> r.getAs[Double]("exact_v"))
      .toMap
    val byKey = rows.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted }
    assert(got.size === byKey.size * allQs.length)
    for ((k, sorted) <- byKey; q <- allQs) {
      val r = (BigDecimal(q) * sorted.length).setScale(0, BigDecimal.RoundingMode.CEILING).toInt
      assert(got((k, q.toDouble)) === sorted(r - 1), s"k=$k q=$q r=$r")
    }
  }

  test("exactInterpolated is bit-identical to Spark's percentile() (randomized A/B)") {
    val rnd = new scala.util.Random(97)
    // ragged group sizes incl. a singleton; duplicated + negative values
    val rows = (1 to 2500).map { i =>
      val k = s"k${i % 7}"
      (k, if (i % 11 == 0) -rnd.nextInt(40) * 2.5 else rnd.nextInt(300) * 1.25)
    } :+ (("solo", 42.0))
    val df = rows.toDF("k", "v")
    val allQs = Seq("0.0", "0.25", "0.5", "0.75", "0.9", "1.0")
    val got = QuantileHist.exactInterpolated(df, Seq("k"), "v", 20.0, allQs)
      .collect()
      .map(r => (r.getString(0), r.getAs[Double]("q")) -> r.getAs[Double]("p"))
      .toMap
    val exp = df.groupBy("k")
      .agg(expr(s"percentile(v, array(${allQs.mkString(",")}))").as("ps"))
      .collect()
      .flatMap { r =>
        val ps = r.getAs[scala.collection.Seq[Double]]("ps")
        allQs.map(_.toDouble).zip(ps).map { case (q, p) => (r.getString(0), q) -> p }
      }.toMap
    assert(got.size === exp.size)
    exp.foreach { case (kq, p) =>
      // === : bit-identical, not approximately equal
      assert(got(kq) === p, s"at $kq")
    }
  }

  test("rank target uses exact decimal arithmetic at the integer boundary") {
    // n=10, q=0.90: double 0.9*10 rounds to 9.000000000000002 and ceil
    // would give 10; decimal gives exactly 9
    val df = (1 to 10).map(i => ("g", i.toDouble)).toDF("k", "v")
    val exact = QuantileHist.exactRankValue(df, Seq("k"), "v", 10.0, Seq("0.90")).collect()
    assert(exact.head.getAs[Double]("exact_v") === 9.0)
  }
}
