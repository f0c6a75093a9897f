package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.expressions.Gram

class GramSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def randomVecs(n: Int, dim: Int, seed: Int): Seq[(Long, Array[Double])] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, Array.fill(dim)(rnd.nextDouble() * 2 - 1)))
  }

  test("matches the brute-force quantized Gram cell-for-cell") {
    val dim = 8
    val scale = 1024L
    val vecs = randomVecs(40, dim, 31)
    // reference model: quantize once, accumulate in BigInt (no overflow
    // assumptions), full matrix
    val expected = Array.ofDim[BigInt](dim, dim).map(_.map(_ => BigInt(0)))
    vecs.foreach { case (_, v) =>
      val q = v.map(x => math.floor(x * scale).toLong)
      for (i <- 0 until dim; j <- 0 until dim)
        expected(i)(j) += BigInt(q(i)) * BigInt(q(j))
    }
    val got = vecs.toDF("vec_id", "embedding")
      .agg(Gram.gram(col("embedding"), dim, scale).as("g"))
      .head().getSeq[Long](0)
    assert(got.length === dim * dim)
    for (i <- 0 until dim; j <- 0 until dim)
      assert(BigInt(got(i * dim + j)) === expected(i)(j), s"cell ($i,$j)")
  }

  test("partitioning-invariant (elementwise-add merge) and symmetric") {
    val dim = 16
    val vecs = randomVecs(200, dim, 7)
    val df = vecs.toDF("vec_id", "embedding")
    val a = df.agg(Gram.gram(col("embedding"), dim, 1024L)).head().getSeq[Long](0)
    val b = df.repartition(13).agg(Gram.gram(col("embedding"), dim, 1024L))
      .head().getSeq[Long](0)
    assert(a === b)
    for (i <- 0 until dim; j <- 0 until dim)
      assert(a(i * dim + j) === a(j * dim + i))
  }

  test("rejects vectors of the wrong length") {
    val df = Seq((1L, Array(0.5, 0.5))).toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      df.agg(Gram.gram(col("embedding"), 3, 1024L)).head()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("!= dim")))
  }
}
