package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.expressions.{PqAdc, PqEncode, Sketch}
import graft.operators.AnnPq

class AnnPqSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def vecs(n: Int, dim: Int, seed: Int): Seq[(Long, Array[Double])] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, Array.fill(dim)(rnd.nextDouble() * 2 - 1)))
  }

  test("encode matches the brute-force argmin model; ADC matches table sums") {
    val dim = 16
    val data = vecs(80, dim, 5)
    val df = data.toDF("vec_id", "embedding")
    val cbs = AnnPq.trainCodebooks(df, "vec_id", "embedding", m = 4, ks = 8,
      sampleSize = 80, iters = 5)

    def normalize(v: Array[Double]) = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    def modelCodes(v: Array[Double]): Seq[Int] = {
      val nv = normalize(v)
      (0 until 4).map { m =>
        (0 until 8).minBy { j =>
          (0 until 4).map(t => math.pow(nv(m * 4 + t) - cbs(m)(j)(t), 2)).sum
        }
      }
    }
    val got = df
      .withColumn("codes",
        Sketch.column(PqEncode(Sketch.expr(col("embedding")), cbs)))
      .orderBy("vec_id").collect()
      .map(r => r.getSeq[Int](2))
    data.zip(got).foreach { case ((_, v), g) => assert(g === modelCodes(v)) }

    // ADC = sum of table entries selected by the codes
    val q = data.head._2
    val table = AnnPq.adcTable(q, cbs)
    val adc = df
      .withColumn("codes", Sketch.column(PqEncode(Sketch.expr(col("embedding")), cbs)))
      .withColumn("tbl", lit(table))
      .select(Sketch.column(
        PqAdc(Sketch.expr(col("codes")), Sketch.expr(col("tbl")), 8)))
      .orderBy()
      .collect().map(_.getDouble(0))
    data.map(d => modelCodes(d._2)).zip(adc).foreach { case (codes, a) =>
      val expect = codes.zipWithIndex.map { case (c, m) => table(m * 8 + c) }.sum
      assert(math.abs(a - expect) < 1e-12)
    }
  }

  test("two-stage search returns contiguous ranks and finds planted twins") {
    val dim = 16
    val base = vecs(200, dim, 9)
    // plant a near-twin of vector 0 at id 1000 (tiny perturbation)
    val twin = (1000L, base.head._2.map(_ * 1.001))
    val df = (base :+ twin).toDF("vec_id", "embedding")
    val cbs = AnnPq.trainCodebooks(df, "vec_id", "embedding", m = 4, ks = 8,
      sampleSize = 256, iters = 5)
    val res = AnnPq.searchTopK(df, Seq((0L, base.head._2)), "vec_id", "embedding",
      cbs, candidates = 50, k = 5).orderBy("rank").collect()
    assert(res.length === 5)
    assert(res.map(_.getLong(3)).toSeq === Seq(1L, 2L, 3L, 4L, 5L))
    // the planted twin (cos ~ 1.0) must surface as the top neighbor
    assert(res.head.getLong(1) === 1000L)
  }
}
