package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Pins the counts-of-counts Gini decomposition (PrefixSum block ranks,
  * closed-form block contribution) against a direct driver-side ranked
  * computation on skewed synthetic key distributions. */
class ProfileSkewSpec extends AnyFunSuite {
  import TestSpark._

  private def decomposed(counts: Seq[Long]): (Long, Long, Long) = {
    import TestSpark.spark.implicits._
    val cc = counts.groupBy(identity).map { case (c, xs) => (c, xs.size.toLong) }
      .toSeq.toDF("cnt", "m")
    val pre = graft.operators.PrefixSum.inclusive(cc, "cnt", "m", 4L)
    val row = pre.withColumn("r0", col("cum") - col("m"))
      .withColumn("contrib", expr("cnt * (m * r0 + (m * (m + 1)) div 2)"))
      .agg(sum(col("contrib")).as("srx"),
        sum(col("cnt") * col("m")).as("t"), sum(col("m")).as("n"))
      .collect()(0)
    val (srx, t, n) = (row.getLong(0), row.getLong(1), row.getLong(2))
    (2 * srx - (n + 1) * t, n * t, srx)
  }

  private def direct(counts: Seq[Long]): (Long, Long, Long) = {
    val sorted = counts.sorted
    val srx = sorted.zipWithIndex.map { case (c, i) => (i + 1) * c }.sum
    val t = counts.sum; val n = counts.size.toLong
    (2 * srx - (n + 1) * t, n * t, srx)
  }

  test("block-decomposed Gini equals the directly ranked form") {
    val rnd = new scala.util.Random(101)
    val shapes = Seq(
      Seq.fill(50)(1L),                              // uniform → gini_num = 0
      (1L to 40L),                                   // linear ramp
      Seq.fill(30)(1L) ++ Seq.fill(3)(100L),         // heavy hot keys
      Seq.fill(80)(rnd.nextInt(7).toLong + 1))       // random with many ties
    for ((cs, i) <- shapes.zipWithIndex) {
      assert(decomposed(cs) === direct(cs), s"shape $i")
    }
    assert(direct(Seq.fill(50)(1L))._1 === 0L, "uniform distribution has zero Gini")
  }
}
