package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training (Sennrich et al. 2016,
  * arXiv:1508.07909 — the standard subword-tokenizer trainer) as an
  * iterative distributed computation.
  *
  * BPE trains on the WORD-FREQUENCY table, not the raw corpus — the first
  * aggregation collapses a 100 TB corpus to its distinct words (millions of
  * rows, each a short symbol sequence), and every subsequent pass runs over
  * that table only. Each merge round is: (1) explode adjacent symbol pairs
  * per word (map-only HOF over arrays that never exceed word length),
  * (2) ONE keyed sum(freq) aggregate with map-side partials, (3) a
  * deterministic global top-1 (TakeOrdered — count desc, pair lex asc as
  * the total-order tie-break; one row to the driver per round, the same
  * bounded-collect contract as the CC fixpoint checks), (4) a map-only
  * merge application. The loop localCheckpoints per round so the plan
  * stays flat at any merge count.
  *
  * Symbol sequences travel as ONE string per word in a canonical
  * double-separator encoding: `·tok··tok··tok·`. Merging pair (a, b) is
  * then a plain (non-regex) `replace(seq, '·a··b·', '·ab·')`:
  *  - token boundaries carry TWO separators, so adjacent merge sites each
  *    consume one and greedy left-to-right replace implements exactly
  *    BPE's left-to-right non-overlapping application ('l l l' -> 'll l');
  *  - the single flanking separators make intra-token false matches
  *    impossible ('ba l' cannot match pair (a, l));
  *  - plain `replace` has identical scan semantics in Spark and DuckDB,
  *    so the oracle replays every round bit-for-bit without regex
  *    lookahead (which RE2 lacks).
  *
  * Reference corollary: reader has no tokenizer tier; this extends the
  * LLM-pipeline family (SURVEY §2 rows 27-29) with the trainer that
  * produces the vocab those rows consume.
  */
object BpeTrain {

  final case class Merge(step: Long, lhs: String, rhs: String,
      merged: String, cnt: Long)

  private val Sep = "·" // '·': outside the ASCII corpus alphabet

  /** Apply learned merges to a distinct-word table, map-only: the same
    * canonical double-separator encoding, one plain `replace` per merge
    * rule in training order (greedy-left non-overlapping — identical
    * semantics in the SQL oracle). Returns (word, n_subwords): the
    * subword count each word encodes to under the learned vocab. The
    * corpus itself is never re-walked — encode the vocabulary once, then
    * join; at 100 TB that is the only tractable application shape. */
  def encodeWords(words: DataFrame, wordCol: String, merges: Seq[Merge]): DataFrame = {
    var enc = words.select(
      col(wordCol).as("word"),
      concat(lit(Sep),
        array_join(concat(split(col(wordCol), ""), array(lit("</w>"))), Sep + Sep),
        lit(Sep)).as("seq"))
    for (m <- merges) {
      // Column-arg replace: tokens never pass through the SQL parser, so
      // quotes/backslashes in corpus-derived tokens can't corrupt the replay
      enc = enc.select(col("word"),
        replace(col("seq"), lit(s"$Sep${m.lhs}$Sep$Sep${m.rhs}$Sep"),
          lit(s"$Sep${m.merged}$Sep")).as("seq"))
    }
    enc.select(col("word"),
      size(split(regexp_replace(col("seq"), s"^$Sep|$Sep$$", ""), Sep + Sep))
        .cast("long").as("n_subwords"))
  }

  final case class ScoredMerge(step: Long, lhs: String, rhs: String,
      merged: String, nPair: Long, fLhs: Long, fRhs: Long)

  /** WordPiece-style LIKELIHOOD-scored merge training (Schuster &
    * Nakajima 2012; the scoring that distinguishes WordPiece from BPE):
    * each round merges the pair maximizing freq(ab)/(freq(a)·freq(b)) —
    * the unigram-LM likelihood GAIN of the merge — instead of raw pair
    * count, so rare-but-strongly-associated pairs merge before frequent
    * incidental ones. Same distributed shape as [[train]] (pair counts +
    * one extra symbol-count agg per round, deterministic global top-1,
    * map-only replace), and the score comparison is CROSS-ENGINE EXACT:
    * freq products stay below 2^53 so the BIGINT product casts to double
    * exactly, and IEEE division is identically rounded in Spark and
    * DuckDB — the oracle replays every round's argmax including
    * tie-breaks (score desc, pair lex asc). */
  def trainLikelihood(
      words: DataFrame,
      wordCol: String,
      freqCol: String,
      numMerges: Int,
      endMarker: String = "</w>"): Seq[ScoredMerge] = {
    var seqs = words
      .select(
        concat(lit(Sep),
          array_join(concat(split(col(wordCol), ""), array(lit(endMarker))),
            Sep + Sep),
          lit(Sep)).as("seq"),
        col(freqCol).cast("long").as("freq"))
      .localCheckpoint(true)

    val merges = ArrayBuffer.empty[ScoredMerge]
    var step = 1
    var exhausted = false
    while (step <= numMerges && !exhausted) {
      val toks = seqs.select(col("freq"),
        split(regexp_replace(col("seq"), s"^$Sep|$Sep$$", ""), Sep + Sep)
          .as("toks"))
      val sym = toks
        .select(col("freq"), explode(col("toks")).as("tok"))
        .groupBy("tok").agg(sum("freq").as("f"))
      val pairs = toks
        .select(col("freq"), explode(expr(
          s"transform(slice(toks, 1, size(toks) - 1), " +
            s"(x, j) -> struct(x AS lhs, element_at(toks, j + 2) AS rhs))"))
          .as("p"))
        .select(col("freq"), col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
        .groupBy("lhs", "rhs").agg(sum("freq").as("c"))
      val top = pairs
        .join(sym.select(col("tok").as("lhs"), col("f").as("fa")), Seq("lhs"))
        .join(sym.select(col("tok").as("rhs"), col("f").as("fb")), Seq("rhs"))
        .orderBy(
          (col("c").cast("double") / (col("fa") * col("fb")).cast("double")).desc,
          concat(col("lhs"), lit(Sep + Sep), col("rhs")).asc)
        .select("lhs", "rhs", "c", "fa", "fb")
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (lhs, rhs) = (top(0).getString(0), top(0).getString(1))
        merges += ScoredMerge(step.toLong, lhs, rhs, lhs + rhs,
          top(0).getLong(2), top(0).getLong(3), top(0).getLong(4))
        seqs = seqs
          .select(replace(col("seq"), lit(s"$Sep$lhs$Sep$Sep$rhs$Sep"),
            lit(s"$Sep${lhs + rhs}$Sep")).as("seq"), col("freq"))
          .localCheckpoint(true)
        step += 1
      }
    }
    merges.toSeq
  }

  /** Learned merge rules, in order. `words` must be a (word, freq) table
    * with distinct words. */
  def train(
      words: DataFrame,
      wordCol: String,
      freqCol: String,
      numMerges: Int,
      endMarker: String = "</w>"): Seq[Merge] = {
    var seqs = words
      .select(
        concat(lit(Sep),
          array_join(concat(split(col(wordCol), ""), array(lit(endMarker))),
            Sep + Sep),
          lit(Sep)).as("seq"),
        col(freqCol).cast("long").as("freq"))
      .localCheckpoint(true)

    val merges = ArrayBuffer.empty[Merge]
    var step = 1
    var exhausted = false
    while (step <= numMerges && !exhausted) {
      val top = seqs
        .select(col("freq"),
          split(regexp_replace(col("seq"), s"^$Sep|$Sep$$", ""), Sep + Sep)
            .as("toks"))
        .select(col("freq"), explode(expr(
          s"transform(slice(toks, 1, size(toks) - 1), " +
            s"(x, j) -> concat(x, '$Sep$Sep', element_at(toks, j + 2)))"))
          .as("pair"))
        .groupBy("pair").agg(sum("freq").as("c"))
        .orderBy(desc("c"), asc("pair"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val pair = top(0).getString(0)
        val c = top(0).getLong(1)
        // tokens never contain the separator (corpus chars plus the end
        // marker), so splitting on '··' is safe; replace rides Column
        // args, so arbitrary token bytes can't reach the SQL parser
        val Array(lhs, rhs) = pair.split(Sep + Sep)
        merges += Merge(step.toLong, lhs, rhs, lhs + rhs, c)
        seqs = seqs
          .select(replace(col("seq"), lit(s"$Sep$pair$Sep"),
            lit(s"$Sep${lhs + rhs}$Sep")).as("seq"), col("freq"))
          .localCheckpoint(true)
        step += 1
      }
    }
    merges.toSeq
  }
}
