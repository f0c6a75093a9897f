package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Ann, AnnIvfPq}
import graft.expressions.{PqEncodeResidual, Sketch}

/** The composed IVF-PQ tier: the residual-encode kernel is pinned against
  * a driver-side reference model, and the full pipeline collapses to the
  * EXACT brute-force result when the approximations are turned off
  * (nprobe = nlist, candidates = corpus) — which exercises the list
  * routing, the q·c + ADC score decomposition and the re-rank join
  * independently of PQ quality. */
class AnnIvfPqSpec extends AnyFunSuite {
  import TestSpark._

  private def mkCorpus(n: Int, dim: Int, seed: Int): Seq[(Long, Seq[Double])] = {
    val rnd = new scala.util.Random(seed)
    Seq.tabulate(n)(i => (i.toLong, Seq.fill(dim)(rnd.nextGaussian())))
  }

  test("PqEncodeResidual matches the driver-side reference model") {
    import TestSpark.spark.implicits._
    val dim = 16; val m = 4; val ks = 4; val nlist = 3
    val rnd = new scala.util.Random(29)
    val cents = Array.fill(nlist) {
      val c = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(c.map(x => x * x).sum); c.map(_ / n)
    }
    val cbs = Array.fill(m)(Array.fill(ks)(Array.fill(dim / m)(rnd.nextGaussian() * 0.1)))
    val rows = mkCorpus(50, dim, 31)
    val lists = rows.map(_._1.toInt % nlist)
    val df = rows.zip(lists).map { case ((id, v), l) => (id, v, l) }.toDF("id", "v", "l")
      .withColumn("codes", Sketch.column(PqEncodeResidual(
        Sketch.expr(col("v")), Sketch.expr(col("l")), cents, cbs)))
    val got = df.select("id", "codes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap

    rows.zip(lists).foreach { case ((id, vSeq), l) =>
      val v = vSeq.toArray
      val n = math.sqrt(v.map(x => x * x).sum)
      val r = Array.tabulate(dim)(i => v(i) / n - cents(l)(i))
      val sub = dim / m
      val expect = Array.tabulate(m) { mm =>
        (0 until ks).minBy { j =>
          (0 until sub).map { t =>
            val e = r(mm * sub + t) - cbs(mm)(j)(t); e * e
          }.sum
        }
      }
      assert(got(id) === expect.toSeq, s"id $id")
    }
  }

  test("with approximations off, composed search equals brute force exactly") {
    import TestSpark.spark.implicits._
    val corpus = mkCorpus(200, 16, 37).toDF("vec_id", "embedding")
    val idx = AnnIvfPq.train(corpus, "vec_id", "embedding",
      nlist = 4, m = 4, ks = 8, sampleSize = 200)
    val queries = corpus.where(col("vec_id") < 5)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
    val got = AnnIvfPq.searchTopK(corpus, queries, "vec_id", "embedding", idx,
      nprobe = 4, candidates = 200, k = 5)
      .select("qid", "nid", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expect = Ann.bruteForceTopK(corpus, corpus.where(col("vec_id") < 5),
      "vec_id", "embedding", 5)
      .select("qid", "nid", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expect)
  }

  test("restricting nprobe only drops neighbors, never corrupts ranks") {
    import TestSpark.spark.implicits._
    val corpus = mkCorpus(200, 16, 41).toDF("vec_id", "embedding")
    val idx = AnnIvfPq.train(corpus, "vec_id", "embedding",
      nlist = 4, m = 4, ks = 8, sampleSize = 200)
    val queries = corpus.where(col("vec_id") < 5)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
    val out = AnnIvfPq.searchTopK(corpus, queries, "vec_id", "embedding", idx,
      nprobe = 1, candidates = 50, k = 5).collect()
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.keySet === queries.map(_._1).toSet)
    byQ.values.foreach { rows =>
      val ranks = rows.map(_.getAs[Long]("rank")).sorted
      assert(ranks === (1L to ranks.length).toArray, "ranks must be contiguous from 1")
      assert(ranks.length <= 5)
    }
  }
}
