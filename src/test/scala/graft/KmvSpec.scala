package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.expressions.{Sketch, TopKByScore}

/** Pins the KMV construction `sketch_kmv` rides on: TopKByScore with a
  * CONSTANT score and the 63-bit hash as the id keeps exactly the K
  * smallest DISTINCT hashes (the buffer dedups by id and, at equal
  * scores, evicts the largest id) — and the estimator built on it is
  * partitioning-invariant and within its published error envelope. */
class KmvSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val K = 64

  private def kmvArr(df: org.apache.spark.sql.DataFrame): Seq[Long] = {
    val agg = Sketch.column(TopKByScore(
      Sketch.expr(lit(0.0)),
      Sketch.expr(xxhash64(col("v")).bitwiseAND(lit(Long.MaxValue))),
      K).toAggregateExpression())
    df.agg(agg.as("kmv"))
      .select(expr("transform(kmv, x -> x.nid)"))
      .as[Seq[Long]].head()
  }

  test("constant-score TopK keeps exactly the K smallest distinct hashes, ascending") {
    val vals = (1 to 5000).map(i => s"item_${i % 700}") // duplicates included
    val got = kmvArr(vals.toDF("v"))
    val want = vals.distinct
      .map(v => spark.range(1).select(
        xxhash64(lit(v)).bitwiseAND(lit(Long.MaxValue))).as[Long].head())
    val expected = want.distinct.sorted.take(K)
    assert(got === expected)
  }

  test("sketch is partitioning-invariant") {
    val df = (1 to 3000).map(i => s"u_${i % 900}").toDF("v")
    assert(kmvArr(df) === kmvArr(df.repartition(17)))
  }

  test("distinct estimate within 4 sigma on a 10x-K universe") {
    val n = 700
    val got = kmvArr((1 to n).map(i => s"item_$i").toDF("v"))
    assert(got.size === K)
    val est = (K - 1).toDouble * 9.223372036854775808e18 / got.last.toDouble
    val sigma = n / math.sqrt(K - 2)
    assert(math.abs(est - n) <= 4 * sigma, s"est=$est n=$n sigma=$sigma")
  }

  test("small universes are exact (size < K means the sketch IS the set)") {
    val got = kmvArr((1 to 20).map(i => s"x$i").toDF("v"))
    assert(got.size === 20)
  }
}
