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

  /** IVF (inverted-file) top-k: the corpus is coarsely quantized to the
    * nearest of `nlist` centroids (one broadcast pass — the "train" step
    * here uses deterministic seed vectors; swap in k-means centroids for
    * production); each query probes only its `nprobe` nearest lists.
    * Evaluated pairs shrink to ~|corpus| * nprobe / nlist, and the list
    * assignment is a plain column the corpus can be PARTITIONED/bucketed by
    * at write time — at 100 TB the probe then prunes whole files, which is
    * the property LSH band keys don't give you. */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4): DataFrame = {
    val c = corpus.select(col(idCol).as("nid"), toDouble(col(vecCol)).as("cv"))
    val q = queries.select(col(idCol).as("qid"), toDouble(col(vecCol)).as("qv"))

    // deterministic "training": the nlist lowest-id corpus vectors seed the
    // coarse quantizer (k-means iterations would refine these)
    val centroids = c.orderBy("nid").limit(nlist).orderBy("nid")
      .collect().zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](1).toArray) }
    val centDf = corpus.sparkSession.createDataFrame(
      centroids.toIndexedSeq.map { case (i, v) => (i, v.toSeq) })
      .toDF("list_id", "centroid")
      .select(col("list_id"), col("centroid").cast("array<double>").as("centroid"))

    def nearestLists(df: DataFrame, vec: String, n: Int): DataFrame = {
      val simToCentroid = Sketch.column(
        CosineSim(Sketch.expr(col(vec)), Sketch.expr(col("centroid"))))
      val w = Window.partitionBy(col(df.columns.head)).orderBy(
        simToCentroid.desc, col("list_id").asc)
      df.join(broadcast(centDf))
        .withColumn("__r", row_number().over(w))
        .where(col("__r") <= n)
        .drop("centroid", "__r")
    }

    val cAssigned = nearestLists(c, "cv", 1) // each corpus vector in ONE list
    val qProbes = nearestLists(q, "qv", nprobe)

    val scored = cAssigned.join(broadcast(qProbes), Seq("list_id"))
      .where(col("nid") =!= col("qid"))
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
