package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => Tf}

/** Benchmark decontamination: flag training documents that share word
  * n-grams with an evaluation/benchmark set (the GPT-3/Llama-style 8-13-gram
  * overlap filter). A training corpus that contains eval text inflates every
  * downstream benchmark number, so this runs as a standard gate in
  * large-scale data pipelines.
  *
  * Shape at 100 TB: the benchmark set is small by construction (eval suites
  * are MBs, the corpus is TBs), so its distinct shingle table is BROADCAST —
  * the corpus side is one map-only explode (shingle extraction) feeding a
  * broadcast hash join; only the HIT rows (a tiny fraction) reach the one
  * keyed aggregation on (corpus_doc, bench_doc). Nothing ever shuffles the
  * corpus text itself. The broadcast is a FORCED hint (Spark honors it
  * regardless of size), so a benchmark set too big for the driver must opt
  * out via `broadcastBench = false` — a plain shuffle join on the shingle
  * key, still O(hits), never all-pairs.
  *
  * Shingles are matched as exact strings so the DuckDB oracle can replay
  * the whole construction; at production scale the join key would be the
  * 64-bit shingle hash (ShingleHashes kernel) to keep the broadcast table
  * and join rows narrow — same plan, narrower payload.
  */
object Decontaminate {

  /** (corpusIdCol, benchIdCol, n_hits) for every corpus/bench document pair
    * sharing at least `minHits` distinct word `n`-grams. */
  def overlapPairs(
      corpus: DataFrame,
      bench: DataFrame,
      corpusId: String,
      corpusText: String,
      benchId: String,
      benchText: String,
      n: Int,
      minHits: Long,
      broadcastBench: Boolean = true): DataFrame = {
    // wordShingles is array_distinct, so both explode sides are per-doc
    // distinct and count(*) below counts DISTINCT overlapping shingles
    val csh = corpus.select(col(corpusId),
      explode(Tf.wordShingles(split(col(corpusText), " "), n)).as("sh"))
    val bsh = bench.select(col(benchId),
      explode(Tf.wordShingles(split(col(benchText), " "), n)).as("sh"))
    csh.join(if (broadcastBench) broadcast(bsh) else bsh, "sh")
      .groupBy(corpusId, benchId)
      .agg(count(lit(1)).as("n_hits"))
      .where(col("n_hits") >= minHits)
  }
}
