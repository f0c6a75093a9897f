package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expressions.{CosineSim, PqAdc, PqEncode, Sketch, TopKByScore}
import graft.functions.VectorFunctions.toDouble

/** Product-quantization ANN tier (Jégou et al. 2011) — the compressed-
  * domain search below [[Ann]]'s brute/LSH/IVF tiers.
  *
  * Scale shape: codebook training is the same bounded deterministic sample
  * as [[Ann.trainCentroids]] (M independent small k-means, driver-side;
  * only the M×ks×(d/M) codebook matters downstream). Encoding is the
  * map-only [[PqEncode]] projection — the corpus compresses to M
  * small-int codes per vector (64× smaller than float32 at rest for
  * 8×16 over 64 dims), which is the representation that lets a 100 TB
  * embedding corpus fit hot storage. Search is two-stage, the standard
  * ADC + re-rank recipe: every (query, code) pair costs M table lookups
  * (no vector math) into the query's precomputed inner-product table, the
  * bounded [[TopKByScore]] keeps C candidates per query, and ONLY those C
  * fetch their full vectors (keyed join) for an exact cosine re-rank. The
  * full-precision corpus is touched once at encode time and then only for
  * C·|queries| rows per search.
  */
object AnnPq {

  /** Per-subspace Lloyd k-means (L2, the PQ variant) over the bounded
    * deterministic sample; rows are L2-normalized first (cosine
    * workloads quantize direction). Init = first ks subvectors; empty
    * clusters keep their previous centroid. @return M × ks × (dim/M). */
  def trainCodebooks(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int,
      ks: Int,
      sampleSize: Int = 4096,
      iters: Int = 10): Array[Array[Array[Double]]] = {
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
    subspaceKMeans(sample, m, ks, iters)
  }

  /** M independent per-subspace Lloyd k-means (L2) over the given rows —
    * shared by direct-encoding PQ (rows = normalized vectors) and the
    * IVF-PQ composition (rows = coarse-quantizer residuals).
    * @return M × ks × (dim/M). */
  def subspaceKMeans(
      rows: Array[Array[Double]],
      m: Int,
      ks: Int,
      iters: Int): Array[Array[Array[Double]]] = {
    require(rows.length >= ks, s"rows ${rows.length} < ks $ks")
    val dim = rows.head.length
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val sub = dim / m

    Array.tabulate(m) { mm =>
      val s = rows.map(_.slice(mm * sub, (mm + 1) * sub))
      var cents = s.take(ks).map(_.clone())
      var iter = 0
      while (iter < iters) {
        val sums = Array.fill(ks)(new Array[Double](sub))
        val counts = new Array[Int](ks)
        s.foreach { v =>
          var best = 0
          var bestD = Double.MaxValue
          var j = 0
          while (j < ks) {
            var d = 0.0
            var t = 0
            while (t < sub) { val e = v(t) - cents(j)(t); d += e * e; t += 1 }
            if (d < bestD) { bestD = d; best = j }
            j += 1
          }
          var t = 0
          while (t < sub) { sums(best)(t) += v(t); t += 1 }
          counts(best) += 1
        }
        cents = Array.tabulate(ks)(j =>
          if (counts(j) == 0) cents(j)
          else sums(j).map(_ / counts(j)))
        iter += 1
      }
      cents
    }
  }

  /** The query's M×ks ADC table (row-major): table[m·ks + j] =
    * codebook(m)(j) · qNormalized_sub(m). */
  def adcTable(q: Array[Double], codebooks: Array[Array[Array[Double]]]): Array[Double] = {
    val m = codebooks.length
    val ks = codebooks(0).length
    val sub = codebooks(0)(0).length
    val n = math.sqrt(q.map(x => x * x).sum)
    val qn = if (n > 0) q.map(_ / n) else q
    val t = new Array[Double](m * ks)
    for (mm <- 0 until m; j <- 0 until ks) {
      var s = 0.0
      var tt = 0
      while (tt < sub) { s += codebooks(mm)(j)(tt) * qn(mm * sub + tt); tt += 1 }
      t(mm * ks + j) = s
    }
    t
  }

  /** Bounded per-query top-k on a scored frame (score desc, id tie-break). */
  def topKPerQuery(scored: DataFrame, scoreCol: String, k: Int): DataFrame = {
    val agg = Sketch.column(
      TopKByScore(Sketch.expr(col(scoreCol)), Sketch.expr(col("nid")), k)
        .toAggregateExpression())
    scored.groupBy("qid").agg(agg.as("topk"))
      .select(col("qid"), posexplode(col("topk")))
      .select(col("qid"), col("col.nid").as("nid"), col("col.cos").as(scoreCol),
        (col("pos") + 1).cast("long").as("rank"))
  }

  /** Two-stage PQ search: ADC top-C candidates, exact cosine re-rank to
    * top-k. `queries` rows: (qid, qv raw vector). */
  def searchTopK(
      corpus: DataFrame,
      queries: Seq[(Long, Array[Double])],
      idCol: String,
      vecCol: String,
      codebooks: Array[Array[Array[Double]]],
      candidates: Int,
      k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val ks = codebooks(0).length
    val c = corpus.select(col(idCol).cast("long").as("nid"),
        toDouble(col(vecCol)).as("cv"))
      .withColumn("codes", Sketch.column(PqEncode(Sketch.expr(col("cv")), codebooks)))

    val qdf = queries.map { case (qid, qv) => (qid, qv.toSeq, adcTable(qv, codebooks).toSeq) }
      .toDF("qid", "qv", "tbl")

    val adcScored = c.select(col("nid"), col("codes"))
      .join(broadcast(qdf.select(col("qid"), col("tbl"))), col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"),
        Sketch.column(PqAdc(Sketch.expr(col("codes")), Sketch.expr(col("tbl")), ks)).as("adc"))
    val cand = topKPerQuery(adcScored, "adc", candidates)

    cand.select(col("qid"), col("nid"))
      .join(c.select(col("nid"), col("cv")), "nid")
      .join(broadcast(qdf.select(col("qid"), col("qv"))), "qid")
      .select(col("qid"), col("nid"),
        Sketch.column(CosineSim(Sketch.expr(col("cv")), Sketch.expr(toDouble(col("qv"))))).as("cos"))
      .transform(topKPerQuery(_, "cos", k))
  }
}
