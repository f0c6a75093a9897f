package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expressions.{Sketch, SortedIntersectCount}

/** Exact set-similarity self-join via prefix filtering (the All-Pairs /
  * PPJoin family — Bayardo, Ma & Srikant WWW 2007; Xiao et al. 2008):
  * all document pairs whose binary word-set cosine ≥ t, with NO
  * probabilistic miss — the third exactness class in the dedup family,
  * next to FastSS deletion neighborhoods (edit distance) and the hashed
  * substring census (spans), where MinHash/SimHash/embedding LSH are
  * probabilistic.
  *
  * The theorem (the prefix-filtering lemma): order every token stream by
  * one global order (document frequency ascending, hash tie-break —
  * rarest first). A qualifying pair overlaps in ov ≥ ⌈t²·max(|A|,|B|)⌉
  * tokens (ov ≥ t·√(|A||B|) and min ≥ t²·max follow from ov ≤ min); and
  * if two sets overlap in ≥ α tokens, their (|·| − α + 1)-prefixes MUST
  * intersect — consider the order-smallest shared token w: were w outside
  * either prefix, ALL shared tokens would sit inside that side's (α−1)-
  * token suffix, too few. Per-doc prefix |X| − ⌈t²|X|⌉ + 1 is ≥ the
  * per-pair requirement, so joining PREFIX tokens against PREFIX tokens
  * is lossless — and prefix tokens are by construction the RAREST tokens,
  * so the candidate shuffle is skew-free precisely where a naive token
  * join explodes on stopwords, and candidate volume is O(n · prefix)
  * on the rare tail rather than O(n · |doc|) on the whole vocabulary.
  * Candidates then verify EXACTLY: one sorted-array intersect kernel per
  * pair, and the gate is the integer cross-multiplication
  * tDen²·ov² ≥ tNum²·|A||B| — no floating-point threshold.
  *
  * Scale shape: one keyed df-count agg, one keyed join to attach df, one
  * per-doc sort (bounded by doc length), the prefix-token candidate join,
  * pair-keyed dedup, and two keyed joins to fetch the sorted hash arrays
  * for verification. Token TEXT never shuffles — everything keys on
  * xxhash64 (same collision envelope as the substring census).
  */
object SimilarityJoin {

  /** Pairs (id_a < id_b) with binary token-set cosine ≥ tNum/tDen over
    * word `ngram`-gram sets. Output: (id_a, id_b, ov, na, nb, cos).
    *
    * Token granularity matters for the candidate volume, not correctness:
    * on a template-heavy corpus UNIGRAM document frequencies are dense
    * (every "rare" word still appears in hundreds of docs), the df²
    * blowup of the prefix join goes quadratic, and the sf10 run of the
    * unigram formulation exhausted spill disk (measured, recorded in
    * SURVEY §6). Word TRIGRAMS are Zipf-sparse on the same corpus —
    * prefix tokens have df ≈ 1-2 — which restores the linear candidate
    * volume prefix filtering is built for. Real web corpora are sparse
    * even at unigram level; the dial exists because synthetic template
    * text is the adversarial case. */
  def allPairsCosine(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      tNum: Int,
      tDen: Int,
      ngram: Int = 1): DataFrame = {
    require(tNum > 0 && tDen > 0 && tNum <= tDen)
    require(ngram >= 1 && ngram <= 5)
    val t2n = tNum * tNum
    val t2d = tDen * tDen

    val ws = filter(split(lower(col(textCol)), "[^a-z0-9]+"), w => w =!= "")
    val toks = (if (ngram == 1) {
      docs.select(col(idCol).cast("long").as("id"),
        explode(array_distinct(ws)).as("tok"))
    } else {
      val parts = (0 until ngram).map(k => s"ws[i + $k]").mkString(", ")
      docs.select(col(idCol).cast("long").as("id"), ws.as("ws"))
        .where(size(col("ws")) >= ngram)
        .select(col("id"), explode(array_distinct(expr(
          s"transform(sequence(0, size(ws) - $ngram), i -> concat_ws(' ', $parts))")))
          .as("tok"))
    })
      .select(col("id"), xxhash64(col("tok")).as("h"))

    val dfCounts = toks.groupBy("h").agg(count(lit(1)).as("df"))

    // per-doc token stream in the global (df asc, hash) order + the
    // value-sorted hash array the exact verifier needs
    val ordered = toks.join(dfCounts, "h")
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("df"), col("h")))).as("ts"))
      .select(col("id"), size(col("ts")).cast("long").as("n"),
        expr("transform(ts, x -> x.h)").as("hs"),
        sort_array(expr("transform(ts, x -> x.h)")).as("sorted_hs"))
      .withColumn("p", expr(s"n - ((n * $t2n + ${t2d - 1}) div $t2d) + 1"))

    val prefixes = ordered
      .select(col("id"), explode(expr("slice(hs, 1, p)")).as("h"))

    val cand = prefixes.select(col("id").as("id_a"), col("h"))
      .join(prefixes.select(col("id").as("id_b"), col("h")), "h")
      .where(col("id_a") < col("id_b"))
      .select(col("id_a").as("da"), col("id_b").as("db"))
      .distinct()

    val sets = ordered.select(col("id"), col("n"), col("sorted_hs"))
    cand
      .join(sets.select(col("id").as("da"), col("n").as("na"),
        col("sorted_hs").as("sa")), Seq("da"))
      .join(sets.select(col("id").as("db"), col("n").as("nb"),
        col("sorted_hs").as("sb")), Seq("db"))
      .withColumn("ov", Sketch.column(
        SortedIntersectCount(Sketch.expr(col("sa")), Sketch.expr(col("sb")))))
      .where(lit(t2d.toLong) * col("ov") * col("ov") >=
        lit(t2n.toLong) * col("na") * col("nb"))
      .select(col("da").as("id_a"), col("db").as("id_b"), col("ov"),
        col("na"), col("nb"),
        (col("ov").cast("double") / sqrt((col("na") * col("nb")).cast("double")))
          .as("cos"))
  }
}
