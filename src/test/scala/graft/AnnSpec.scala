package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Ann
import graft.sources.Tables

class AnnSpec extends AnyFunSuite {
  import TestSpark._

  test("brute-force topk: k neighbors per query, self excluded, ranks 1..k") {
    val emb = Tables.embeddings(spark, Sf)
    val q = emb.where(col("vec_id") < 5)
    val out = Ann.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
    val rows = out.collect()
    assert(rows.length === 5 * 5)
    assert(rows.forall(r => r.getAs[Long]("qid") != r.getAs[Long]("nid")))
    val ranks = rows.groupBy(_.getAs[Long]("qid")).values
      .map(_.map(_.getAs[Long]("rank")).sorted.toSeq)
    assert(ranks.forall(_ == Seq(1L, 2L, 3L, 4L, 5L)))
  }

  test("LSH topk recall vs brute force is nontrivial") {
    val emb = Tables.embeddings(spark, Sf)
    val q = emb.where(col("vec_id") < 20)
    val exact = Ann.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Ann.lshTopK(emb, q, "vec_id", "embedding", 64, 5)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // random 64-dim embeddings are a worst case for LSH; just require the
    // buckets to genuinely concentrate: far better than the ~2.5% a random
    // same-size candidate set would score, at a fraction of brute-force cost
    assert(recall > 0.15, s"recall=$recall")
  }

  test("IVF topk probes lists and returns ranked neighbors with decent recall") {
    val emb = Tables.embeddings(spark, Sf)
    val q = emb.where(col("vec_id") < 20)
    val exact = Ann.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Ann.ivfTopK(emb, q, "vec_id", "embedding", 5, nlist = 16, nprobe = 4)
    val rows = ivf.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("rank") >= 1 && r.getAs[Long]("rank") <= 5))
    val got = rows.map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"))).toSet
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall > 0.2, s"recall=$recall") // nprobe/nlist = 1/4 of lists probed
  }

  test("LSH plan is bucket-joined, not a cross product") {
    val emb = Tables.embeddings(spark, Sf)
    val plan = Ann.lshTopK(emb, emb.where(col("vec_id") < 5), "vec_id", "embedding", 64, 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }

  test("top-k sink is a bounded partial aggregate, not a per-query window") {
    val emb = Tables.embeddings(spark, Sf)
    val k = 5
    val df = Ann.bruteForceTopK(emb, emb.where(col("vec_id") < 10), "vec_id", "embedding", k)
    val plan = df.queryExecution.executedPlan.toString

    // The scale property: scored pairs are combined map-side by the
    // TypedImperativeAggregate (partial_bounded_topk BEFORE the exchange),
    // and no Window operator funnels a query's full corpus into one task.
    assert(!plan.contains("Window"), s"window found in plan:\n$plan")
    assert(plan.contains("partial_bounded_topk"), s"no partial top-k in plan:\n$plan")
    assert(plan.contains("ObjectHashAggregate"), s"no object-hash agg in plan:\n$plan")

    // Rows entering the final aggregation are the serialized partial
    // buffers — at most one per (query, map task), each holding <= k pairs.
    // Verify the end result still honors the per-query bound exactly.
    val queries = 10
    val out = df.collect()
    assert(out.length === queries * k)
    assert(out.groupBy(_.getAs[Long]("qid")).values.forall(_.length <= k))
  }
}
