package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expressions.{CosineSim, NearestCentroids, PqAdc, PqEncodeResidual, Sketch}
import graft.functions.VectorFunctions.toDouble

/** Composed IVF-PQ — the production 100 TB ANN shape (IVFADC, Jégou,
  * Douze & Schmid 2011 §IV), built from the two halves that already
  * exist separately: [[Ann]]'s inverted-file coarse quantizer and
  * [[AnnPq]]'s product-quantization codes.
  *
  * Why composing beats either half alone at scale:
  *  - IVF alone restricts WHICH vectors a query scores (nprobe/nlist of
  *    the corpus) but still stores and reads full float vectors.
  *  - PQ alone compresses every vector 64× but still scores the WHOLE
  *    corpus per query.
  *  - Composed: the corpus at rest is (list_id, M codes) — list_id is a
  *    plain column the corpus is partitioned by at write time
  *    ([[Ann.writeListPartitioned]] file pruning), codes are the 64×
  *    compression — and a query reads only its nprobe lists and scores
  *    them by ADC table lookups, then exact-re-ranks the top C.
  *
  * Residual encoding is what makes the composition precise: PQ encodes
  * v_norm − cents(list) rather than v_norm, so the coarse quantizer
  * explains the bulk of the vector and the M-code budget is spent on the
  * remainder. The search-side score decomposes EXACTLY as
  * q·v_norm = q·cents(list) + q·residual — the first term is one scalar
  * per (query, probed list), the second is the ADC estimate — so the only
  * approximation anywhere is the PQ error on the residual (plus the IVF
  * scan restriction), which the exact re-rank of the top C then removes.
  */
object AnnIvfPq {

  /** Trained index: coarse centroids (unit-normalized, spherical k-means)
    * + per-subspace residual codebooks. */
  final case class Index(
      cents: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]])

  /** Train both quantizers on the bounded deterministic sample (the
    * [[Ann.trainCentroids]] convention: orderBy(id).limit(sampleSize) —
    * a TakeOrderedAndProject, no global sort; driver cost is bounded by
    * sampleSize × dim). The PQ codebooks are trained on the sample's
    * RESIDUALS under the trained coarse quantizer — the distribution the
    * corpus codes will actually quantize. */
  def train(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nlist: Int,
      m: Int,
      ks: Int,
      sampleSize: Int = 4096,
      iters: Int = 10): Index = {
    val cents = Ann.trainCentroids(corpus, idCol, vecCol, nlist, sampleSize, iters)
    val sample = corpus
      .select(col(idCol).cast("long").as("id"), toDouble(col(vecCol)).as("v"))
      .orderBy("id")
      .limit(sampleSize)
      .collect()
      .map { r =>
        val v = r.getSeq[Double](1).toArray
        val n = math.sqrt(v.map(x => x * x).sum)
        if (n > 0) v.map(_ / n) else v
      }
    val residuals = sample.map { v =>
      var best = 0
      var bestDot = Double.NegativeInfinity
      var l = 0
      while (l < cents.length) {
        var dot = 0.0
        var i = 0
        while (i < v.length) { dot += v(i) * cents(l)(i); i += 1 }
        if (dot > bestDot) { bestDot = dot; best = l }
        l += 1
      }
      Array.tabulate(v.length)(i => v(i) - cents(best)(i))
    }
    Index(cents, AnnPq.subspaceKMeans(residuals, m, ks, iters))
  }

  /** Encode the corpus to its at-rest IVF-PQ form: (nid, list_id, codes).
    * Map-only — both matrices are plan literals; this is the frame
    * [[Ann.writeListPartitioned]] would persist partitioned by list_id. */
  def encode(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      index: Index): DataFrame =
    corpus
      .select(col(idCol).cast("long").as("nid"), toDouble(col(vecCol)).as("cv"))
      .withColumn("list_id", element_at(Sketch.column(
        NearestCentroids(Sketch.expr(col("cv")), index.cents, 1)), 1))
      .withColumn("codes", Sketch.column(PqEncodeResidual(
        Sketch.expr(col("cv")), Sketch.expr(col("list_id")),
        index.cents, index.codebooks)))

  /** Two-stage IVF-PQ search. Query side: each query explodes to its
    * nprobe nearest lists, carrying the per-list scalar q·cents(list) and
    * its residual ADC table — a tiny broadcast frame. ADC scan: the
    * list_id equi-join touches only probed lists' codes; each candidate
    * costs M table lookups, no vector math. Exact re-rank: only the top
    * `candidates` per query fetch full vectors for the exact cosine. */
  def searchTopK(
      corpus: DataFrame,
      queries: Seq[(Long, Array[Double])],
      idCol: String,
      vecCol: String,
      index: Index,
      nprobe: Int,
      candidates: Int,
      k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val ks = index.codebooks(0).length
    val enc = encode(corpus, idCol, vecCol, index)

    // (qid, list_id, q·cents(list), residual ADC table) per probed list
    val probes = queries.flatMap { case (qid, qv) =>
      val n = math.sqrt(qv.map(x => x * x).sum)
      val qn = if (n > 0) qv.map(_ / n) else qv
      val tbl = AnnPq.adcTable(qv, index.codebooks).toSeq
      index.cents.zipWithIndex
        .map { case (c, l) => (l, c.zip(qn).map { case (a, b) => a * b }.sum) }
        .sortBy { case (l, dot) => (-dot, l) }
        .take(nprobe)
        .map { case (l, dot) => (qid, l, dot, tbl) }
    }
    val qdf = probes.toDF("qid", "list_id", "qdotc", "tbl")

    val adcScored = enc.select(col("nid"), col("list_id"), col("codes"))
      .join(broadcast(qdf), Seq("list_id"))
      .where(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"),
        (col("qdotc") + Sketch.column(
          PqAdc(Sketch.expr(col("codes")), Sketch.expr(col("tbl")), ks))).as("adc"))
    val cand = AnnPq.topKPerQuery(adcScored, "adc", candidates)

    val qvecs = queries.map { case (qid, qv) => (qid, qv.toSeq) }.toDF("qid", "qv")
    // re-rank fetches full vectors from the raw corpus, not `enc` — no
    // reason to re-run the encode projection for a vector lookup
    val full = corpus.select(col(idCol).cast("long").as("nid"), toDouble(col(vecCol)).as("cv"))
    cand.select(col("qid"), col("nid"))
      .join(full, "nid")
      .join(broadcast(qvecs), "qid")
      .select(col("qid"), col("nid"),
        Sketch.column(CosineSim(Sketch.expr(col("cv")),
          Sketch.expr(toDouble(col("qv"))))).as("cos"))
      .transform(AnnPq.topKPerQuery(_, "cos", k))
  }
}
