package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expressions.{CosineSim, HyperplaneBandKeys, NearestCentroids, Sketch, TopKByScore}
import graft.functions.VectorFunctions.toDouble

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Three tiers, per the standard scale playbook:
  *  - [[bruteForceTopK]]: exact baseline. The query set is broadcast (it is
  *    small by construction); the corpus streams through once. Cost is
  *    O(|corpus| * |queries|) similarity kernels but ZERO shuffle of the
  *    corpus — at 100 TB this is a map-only pass, and it is the correctness
  *    reference the approximate tiers are judged against.
  *  - [[lshTopK]]: hyperplane-LSH bucketed search. Corpus vectors carry
  *    band keys; queries probe only matching buckets, cutting evaluated
  *    pairs to ~|corpus| * bands / 2^bits. Same top-k contract, approximate
  *    recall (measured against the brute-force tier in tests).
  *  - [[ivfTopK]]: inverted-file search with k-means-trained coarse
  *    quantizer; each query probes only its nprobe nearest lists, and the
  *    list id is a plain column the corpus can be bucketed by at write time
  *    (file-level pruning LSH band keys can't give).
  *
  * Similarity is the fused native [[graft.expressions.CosineSim]] kernel
  * (one pass per pair; norms folded in) — no interpreted HOF chains.
  *
  * The top-k sink in every tier is the bounded
  * [[graft.expressions.TopKByScore]] aggregate: each map task emits at most
  * k pairs per query, so no exchange ever carries more than
  * O(queries x partitions x k) rows — a row_number window here would instead
  * funnel every scored pair into ONE partition per query, which is the
  * classic 100x-scale straggler.
  */
object Ann {

  /** Exact top-k cosine neighbors for each query vector. */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val c = corpus.select(col(idCol).cast("long").as("nid"), toDouble(col(vecCol)).as("cv"))
    val q = queries.select(col(idCol).cast("long").as("qid"), toDouble(col(vecCol)).as("qv"))
    val scored = c.join(broadcast(q), col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"),
        Sketch.column(CosineSim(Sketch.expr(col("cv")), Sketch.expr(col("qv")))).as("cos"))
    topKPerQuery(scored, k)
  }

  /** LSH-bucketed top-k: only corpus vectors sharing at least one band key
    * with the query are scored. A pair colliding in several bands is scored
    * per collision (one fused kernel each) and deduplicated inside the
    * bounded top-k buffer — cheaper than a distinct-shuffle that would have
    * to carry both full vectors. */
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
      df.select(col(idCol).cast("long").as(id), toDouble(col(vecCol)).as(vec))
        .withColumn("bkeys", Sketch.column(
          HyperplaneBandKeys(Sketch.expr(col(vec)), numBands, bitsPerBand, dim)))
        .select(col(id), col(vec), posexplode(col("bkeys")))
        .withColumnRenamed("pos", "band_id")
        .withColumnRenamed("col", "band_key")

    val c = prep(corpus, "nid", "cv")
    val q = prep(queries, "qid", "qv")

    val scored = c.join(broadcast(q), Seq("band_id", "band_key"))
      .where(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"),
        Sketch.column(CosineSim(Sketch.expr(col("cv")), Sketch.expr(col("qv")))).as("cos"))
    topKPerQuery(scored, k)
  }

  /** Lloyd k-means over a bounded, deterministic corpus sample, run on the
    * driver. The sample is a TakeOrderedAndProject (per-partition top-N then
    * merge — no global sort) and its size bounds driver memory/CPU
    * (sampleSize x dim doubles). On a real cluster the same contract can be
    * served by distributed k-means; what matters downstream is only the
    * nlist x dim centroid matrix. Centroids are unit-normalized (spherical
    * k-means — the right variant for cosine similarity). */
  def trainCentroids(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nlist: Int,
      sampleSize: Int = 4096,
      iters: Int = 10): Array[Array[Double]] = {
    val sample = corpus
      .select(col(idCol).cast("long").as("id"), toDouble(col(vecCol)).as("v"))
      .orderBy("id")
      .limit(sampleSize)
      .collect()
      .map(_.getSeq[Double](1).toArray)
    require(sample.length >= nlist, s"sample (${sample.length}) smaller than nlist ($nlist)")

    def normalize(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0) v else v.map(_ / n)
    }

    var cents = sample.take(nlist).map(v => normalize(v.clone()))
    val dim = sample.head.length
    var iter = 0
    while (iter < iters) {
      val sums = Array.fill(nlist)(new Array[Double](dim))
      val counts = new Array[Int](nlist)
      sample.foreach { v =>
        var best = 0
        var bestDot = Double.NegativeInfinity
        var l = 0
        while (l < nlist) {
          var dot = 0.0
          var i = 0
          while (i < dim) { dot += v(i) * cents(l)(i); i += 1 }
          if (dot > bestDot) { bestDot = dot; best = l }
          l += 1
        }
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
        counts(best) += 1
      }
      cents = Array.tabulate(nlist) { l =>
        if (counts(l) == 0) cents(l) // keep empty clusters stable
        else normalize(sums(l))
      }
      iter += 1
    }
    cents
  }

  /** IVF (inverted-file) top-k: the corpus is coarsely quantized to the
    * nearest of `nlist` k-means centroids; each query probes only its
    * `nprobe` nearest lists. Evaluated pairs shrink to
    * ~|corpus| * nprobe / nlist. List assignment is the map-only
    * [[graft.expressions.NearestCentroids]] projection (centroid matrix is
    * a baked-in literal — no join, no window), so the only shuffles are the
    * list-keyed probe join and the bounded top-k. */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4): DataFrame = {
    val cents = trainCentroids(corpus, idCol, vecCol, nlist)

    val c = corpus
      .select(col(idCol).cast("long").as("nid"), toDouble(col(vecCol)).as("cv"))
      .withColumn("list_id", element_at(Sketch.column(
        NearestCentroids(Sketch.expr(col("cv")), cents, 1)), 1))

    val q = queries
      .select(col(idCol).cast("long").as("qid"), toDouble(col(vecCol)).as("qv"))
      .withColumn("list_id", explode(Sketch.column(
        NearestCentroids(Sketch.expr(col("qv")), cents, nprobe))))

    val scored = c.join(broadcast(q), Seq("list_id"))
      .where(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"),
        Sketch.column(CosineSim(Sketch.expr(col("cv")), Sketch.expr(col("qv")))).as("cos"))
    topKPerQuery(scored, k)
  }

  /** Deterministic bounded top-k: rank by similarity desc with neighbor id
    * as the total-order tie-break. Map-side partial aggregation caps every
    * task's output at k rows per query (see [[graft.expressions.TopKByScore]]). */
  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val agg = Sketch.column(
      TopKByScore(Sketch.expr(col("cos")), Sketch.expr(col("nid")), k)
        .toAggregateExpression())
    scored
      .groupBy("qid")
      .agg(agg.as("topk"))
      .select(col("qid"), posexplode(col("topk")))
      .select(
        col("qid"),
        col("col.nid").as("nid"),
        col("col.cos").as("cos"),
        (col("pos") + 1).cast("long").as("rank"))
  }

  // ---- IVF list-partitioned storage (the write-time half of ivfTopK) ----

  /** Materialize the corpus partitioned by IVF list id. This is what makes
    * the nprobe/nlist ratio a STORAGE win, not just a compute win: each
    * list becomes its own parquet directory, so a probe that touches
    * nprobe of nlist lists skips the other directories at file-listing
    * time — the scan never opens them (partition pruning, asserted in
    * IvfStorageSpec). At 100 TB with nlist=1024 / nprobe=8 that is a
    * ~128x I/O cut before a single byte is read. */
  def writeListPartitioned(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      cents: Array[Array[Double]],
      outDir: String): Unit = {
    corpus
      .select(col(idCol).cast("long").as("nid"), toDouble(col(vecCol)).as("cv"))
      .withColumn("list_id", element_at(Sketch.column(
        NearestCentroids(Sketch.expr(col("cv")), cents, 1)), 1))
      // one file per list: the shuffle is paid once at write time
      .repartition(col("list_id"))
      .write.mode("overwrite").partitionBy("list_id").parquet(outDir)
  }

  /** Probe-side read over a list-partitioned corpus: the isin filter on the
    * partition column prunes to the probed lists' files only. */
  def readLists(spark: org.apache.spark.sql.SparkSession, dir: String,
      listIds: Seq[Long]): DataFrame =
    spark.read.parquet(dir).where(col("list_id").isin(listIds: _*))
}
