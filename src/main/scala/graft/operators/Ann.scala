package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.expressions.{CosineSim, HyperplaneBandKeys, Sketch}
import graft.functions.VectorFunctions.toDouble

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two tiers, per the standard scale playbook:
  *  - [[bruteForceTopK]]: exact baseline. The query set is broadcast (it is
  *    small by construction); the corpus streams through once. Cost is
  *    O(|corpus| * |queries|) similarity kernels but ZERO shuffle of the
  *    corpus — at 100 TB this is a map-only pass, and it is the correctness
  *    reference the approximate tier is judged against.
  *  - [[lshTopK]]: hyperplane-LSH bucketed search. Corpus vectors carry
  *    band keys; queries probe only matching buckets, cutting evaluated
  *    pairs to ~|corpus| * bands / 2^bits. Same top-k contract, approximate
  *    recall (measured against the brute-force tier in tests).
  *
  * Similarity is the fused native [[graft.expressions.CosineSim]] kernel
  * (one pass per pair; norms folded in) — no interpreted HOF chains.
  */
object Ann {

  /** Exact top-k cosine neighbors for each query vector. */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("nid"), toDouble(col(vecCol)).as("cv"))
    val q = queries.select(col(idCol).as("qid"), toDouble(col(vecCol)).as("qv"))
    val scored = c.join(broadcast(q), col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"),
        Sketch.column(CosineSim(Sketch.expr(col("cv")), Sketch.expr(col("qv")))).as("cos"))
    topKPerQuery(scored, k)
  }

  /** LSH-bucketed top-k: only corpus vectors sharing at least one band key
    * with the query are scored. */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      k: Int,
      numBands: Int = 8,
      bitsPerBand: Int = 4): DataFrame = {
    def prep(df: DataFrame, id: String, vec: String): DataFrame =
      df.select(col(idCol).as(id), toDouble(col(vecCol)).as(vec))
        .withColumn("bkeys", Sketch.column(
          HyperplaneBandKeys(Sketch.expr(col(vec)), numBands, bitsPerBand, dim)))
        .select(col(id), col(vec), posexplode(col("bkeys")))
        .withColumnRenamed("pos", "band_id")
        .withColumnRenamed("col", "band_key")

    val c = prep(corpus, "nid", "cv")
    val q = prep(queries, "qid", "qv")

    val scored = c.join(broadcast(q), Seq("band_id", "band_key"))
      .where(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"), col("cv"), col("qv"))
      .distinct() // a pair may collide in several bands; score once
      .select(col("qid"), col("nid"),
        Sketch.column(CosineSim(Sketch.expr(col("cv")), Sketch.expr(col("qv")))).as("cos"))
    topKPerQuery(scored, k)
  }

  /** Deterministic top-k: rank by similarity desc with neighbor id as the
    * total-order tie-break. */
  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w).cast("long")).where(col("rank") <= k)
  }
}
