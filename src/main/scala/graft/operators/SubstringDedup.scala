package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Exact repeated-substring span detection — the span-level dedup lane of
  * Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
  * Better"): every k-token window that occurs ≥2 times corpus-wide is a
  * duplicated window; overlapping/adjacent duplicated windows per document
  * merge into MAXIMAL spans (gaps-and-islands over window positions),
  * reported as a per-doc duplicated-token fraction — the signal
  * span-removal curation cuts on, which whole-document near-dup lanes
  * cannot produce.
  *
  * Shape at 100 TB: window strings are built map-side from the token array
  * (one explode, O(tokens) rows) and immediately collapse to an 8-byte
  * xxhash64 key — the strings never leave the map side (at the 100× scale
  * run the string-keyed census shuffled ~1.5 GB of window text; hashed,
  * the standalone run is 23.3 s, ≤2.4× per decade). The repeat census is
  * ONE keyed agg; survivors join back on the persisted narrow windows
  * frame; the span merge is two window functions over one (doc, pos) sort.
  * A hash collision falsely marks one window duplicated at
  * P ~ n²/2⁶⁵ (≈2e-5 for 30M windows) — the same accepted class as the
  * 6σ estimate prefilters, and the oracle gate surfaces any hit.
  */
object SubstringDedup {

  /** (base tokenized frame, PERSISTED narrow (id, pos, win-hash) window
    * frame). Callers must route their result through
    * CacheScope.unpersistAfterUse on the wins frame. */
  private def prepare(docs: DataFrame, idCol: String, textCol: String, k: Int)
      : (DataFrame, DataFrame) = {
    val base = docs
      .select(col(idCol), split(lower(col(textCol)), " ").as("toks"))
      .withColumn("n_tokens", size(col("toks")))
    // sequence(0, n-k) DESCENDS for n<k — guard short docs out first
    val wins = base.where(col("n_tokens") >= k)
      .select(col(idCol), posexplode(expr(
        s"transform(sequence(0, size(toks) - $k), i -> concat_ws(' ', slice(toks, i + 1, $k)))")))
      .toDF(idCol, "pos", "win")
      .select(col(idCol), col("pos"), xxhash64(col("win")).as("win"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    (base, wins)
  }

  /** Maximal duplicated spans (idCol, s, e) — token index range [s, e) —
    * from the prepared windows frame. */
  private def spansOf(wins: DataFrame, idCol: String, k: Int): DataFrame = {
    val dup = wins.groupBy("win").agg(count(lit(1)).as("c"))
      .where(col("c") >= 2).select("win")
    val wPrev = Window.partitionBy(idCol).orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(idCol).orderBy("pos")
    wins.join(dup, Seq("win")).select(idCol, "pos")
      .withColumn("prev_end", max(col("pos") + k).over(wPrev))
      .withColumn("new_island", when(col("pos") <= col("prev_end"), 0).otherwise(1))
      .withColumn("island", sum("new_island").over(wRun))
      .groupBy(idCol, "island")
      .agg(min("pos").as("s"), (max("pos") + k).as("e"))
      .select(idCol, "s", "e")
  }

  /** Per-document duplicated-span statistics over `textCol` split on single
    * spaces and lowercased: (idCol, n_tokens, n_spans, dup_tokens,
    * dup_frac), one row per input document, ordered by nothing (caller
    * sorts). The returned frame owns a persisted intermediate, released
    * via CacheScope once the result is consumed. */
  def spanStats(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val (base, wins) = prepare(docs, idCol, textCol, k)
    val perDoc = spansOf(wins, idCol, k).groupBy(idCol)
      .agg(count(lit(1)).as("n_spans"), sum(col("e") - col("s")).as("dup_tokens"))
    val out = base.join(perDoc, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens").cast("long").as("n_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        (coalesce(col("dup_tokens"), lit(0L)).cast("double") /
          col("n_tokens").cast("double")).as("dup_frac"))
    CacheScope.unpersistAfterUse(out, wins)
  }

  /** Incremental span census: duplicated-span statistics for a DELTA batch
    * against an already-censused BASE corpus, without re-walking the base —
    * the substring twin of [[Dedup.minhashProbePairs]]'s index-probe story.
    * The base's (win-hash, count) census table IS the persisted index: at
    * cluster scale it is written once (bucketed by hash) and each arriving
    * batch (1) windows ITS OWN rows, (2) probes the index with one keyed
    * equi-join, (3) adds its delta-internal repeat counts. A delta window
    * is duplicated iff base_count + delta_count ≥ 2 — exactly the global
    * census over base ∪ delta, restricted to delta documents, so the
    * all-corpus oracle replays it. Span merge and per-doc rollup are the
    * [[spanStats]] shapes, over delta rows only. */
  def incrementalSpanStats(
      baseCensus: DataFrame, // (win, c) — the persisted index
      delta: DataFrame,
      idCol: String,
      textCol: String,
      k: Int): DataFrame = {
    val (base, wins) = prepare(delta, idCol, textCol, k)
    val deltaCensus = wins.groupBy("win").agg(count(lit(1)).as("dc"))
    val dup = deltaCensus.join(baseCensus, Seq("win"), "left")
      .where(coalesce(col("c"), lit(0L)) + col("dc") >= 2).select("win")
    val wPrev = Window.partitionBy(idCol).orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(idCol).orderBy("pos")
    val spans = wins.join(dup, Seq("win")).select(idCol, "pos")
      .withColumn("prev_end", max(col("pos") + k).over(wPrev))
      .withColumn("new_island", when(col("pos") <= col("prev_end"), 0).otherwise(1))
      .withColumn("island", sum("new_island").over(wRun))
      .groupBy(idCol, "island")
      .agg(min("pos").as("s"), (max("pos") + k).as("e"))
    val perDoc = spans.groupBy(idCol)
      .agg(count(lit(1)).as("n_spans"), sum(col("e") - col("s")).as("dup_tokens"))
    val out = base.join(perDoc, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens").cast("long").as("n_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        (coalesce(col("dup_tokens"), lit(0L)).cast("double") /
          col("n_tokens").cast("double")).as("dup_frac"))
    CacheScope.unpersistAfterUse(out, wins)
  }

  /** Build the (win, c) census index for a corpus — the thing
    * [[incrementalSpanStats]] probes. Written once at cluster scale;
    * OR-merged with a delta census to absorb the batch afterwards
    * (counts ADD, so absorption is a keyed sum, never a re-census). */
  def censusIndex(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val (_, wins) = prepare(docs, idCol, textCol, k)
    val out = wins.groupBy("win").agg(count(lit(1)).as("c"))
    CacheScope.unpersistAfterUse(out, wins)
  }

  /** The REMOVAL half of the Lee et al. pipeline: cut every duplicated
    * span out of every document and reassemble the surviving tokens in
    * order — (idCol, n_tokens, n_removed, clean_text), one row per input
    * document (fully-duplicated docs come back with empty clean_text;
    * span-removal curation usually drops them by a min-length gate
    * downstream). The cut is a per-doc LEFT ANTI join of token positions
    * against the span table (equi on the doc key, range predicate on the
    * position — spans per doc are few, so the extra condition is a cheap
    * in-bucket filter), and reassembly is one keyed agg sorting (pos, tok)
    * structs — the text_boilerplate reassembly shape. */
  def removeSpans(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val (base, wins) = prepare(docs, idCol, textCol, k)
    val spans = spansOf(wins, idCol, k)
    val toksPos = base.select(col(idCol), col("n_tokens"), posexplode(col("toks")))
      .toDF(idCol, "n_tokens", "pos", "tok")
    val kept = toksPos.join(spans,
      toksPos(idCol) === spans(idCol) &&
        toksPos("pos") >= spans("s") && toksPos("pos") < spans("e"),
      "left_anti")
    val clean = kept.groupBy(idCol)
      .agg(count(lit(1)).as("n_kept"),
        expr("concat_ws(' ', transform(array_sort(collect_list(struct(pos, tok))), x -> x.tok))")
          .as("clean_text"))
    val out = base.join(clean, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens").cast("long").as("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).cast("long").as("n_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
    CacheScope.unpersistAfterUse(out, wins)
  }
}
