package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer trainer — the SentencePiece-style (Kudo 2018) EM
  * alternative beside BPE (operators/BpeTrain.scala): seed a candidate
  * vocabulary from weighted substring counts, then alternate hard-EM
  * rounds of (E) Viterbi-segmenting every word under current piece costs
  * and (M) re-counting pieces from the chosen segmentations.
  *
  * Exactness over float likelihoods: piece cost is the SCALED-INTEGER
  * surrogate `len(bin(C div c))` = 1 + floor(log2(C / c)) — an integer
  * approximation of -log2 p(piece) with +1 smoothing — so every
  * comparison, tie-break, and count is integer-exact and the DuckDB
  * oracle replays training bit-for-bit (the BpeTrain double-separator
  * convention applied to EM; float log-likelihood would hash-diverge on
  * libm rounding). Segmentation search enumerates cut-point bitmasks
  * (word length capped at [[maxWordLen]] = 8 → ≤ 128 masks); ties break
  * to the smallest mask, i.e. the fewest/earliest cuts.
  *
  * Scale shape at 100 TB (the BpeTrain argument): the corpus collapses
  * to the distinct word-frequency table before anything iterative; each
  * EM round is one map-only segmentation pass over that table plus one
  * keyed agg; the vocabulary (≤ topPieces + alphabet) is collected to
  * the driver per round — the same bounded collect as BpeTrain's top-1.
  */
object UnigramTrain {

  /** floor(log2(n)) for n ≥ 1 — exact, no doubles. */
  def floorLog2(n: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(n)

  /** Integer piece cost: 1 + floor(log2(C / c)) = length of C/c in binary. */
  def pieceCost(total: Long, cnt: Long): Long = 1L + floorLog2(total / cnt)

  /** Best segmentation of `word` under `costs` by (total cost, mask)
    * with the smallest mask winning ties; None when no valid
    * segmentation exists (a piece fell out of the vocabulary). Mask bit
    * i set = cut between characters i and i+1 (0-indexed). */
  def segment(word: String, costs: Map[String, Long]): Option[Seq[String]] = {
    val L = word.length
    var bestCost = Long.MaxValue
    var bestPieces: Seq[String] = null
    var m = 0
    val mMax = 1 << (L - 1)
    while (m < mMax) {
      var ok = true
      var total = 0L
      val pieces = Seq.newBuilder[String]
      var start = 0
      var i = 0
      while (i < L && ok) {
        if (i == L - 1 || ((m >> i) & 1) == 1) {
          val p = word.substring(start, i + 1)
          costs.get(p) match {
            case Some(c) => total += c; pieces += p; start = i + 1
            case None    => ok = false
          }
        }
        i += 1
      }
      // ascending m: strict < keeps the smallest mask among minima
      if (ok && total < bestCost) { bestCost = total; bestPieces = pieces.result() }
      m += 1
    }
    Option(bestPieces)
  }

  /** Train over a (word, freq) table; returns (piece, cnt, cost) for the
    * final round's surviving pieces. */
  def train(
      words: DataFrame,
      wordCol: String,
      freqCol: String,
      topPieces: Int = 60,
      maxPieceLen: Int = 4,
      maxWordLen: Int = 8,
      rounds: Int = 2): DataFrame = {
    require(maxWordLen <= 16, "mask enumeration is 2^(len-1); cap the word length")
    val s = words.sparkSession
    import s.implicits._
    val w = words
      .select(col(wordCol).as("word"), col(freqCol).cast("long").as("freq"))
      .as[(String, Long)]

    // substring seeding: map-only explode over the word table, weighted
    // by word frequency with positional multiplicity
    val subs = w.flatMap { case (word, freq) =>
      for {
        l <- 1 to maxPieceLen
        st <- 0 to word.length - l
      } yield (word.substring(st, st + l), freq)
    }.toDF("piece", "f").groupBy("piece").agg(sum("f").as("cnt"))
    val vocab0 = subs.where(length(col("piece")) === 1)
      .unionByName(subs.where(length(col("piece")) >= 2)
        .orderBy(col("cnt").desc, col("piece")).limit(topPieces))

    // ≤ topPieces + alphabet entries — the BpeTrain bounded-collect shape
    var vocab: Map[String, Long] = vocab0.as[(String, Long)].collect().toMap
    for (_ <- 1 to rounds) {
      val total = vocab.values.sum
      val costs = vocab.map { case (p, c) => p -> pieceCost(total, c) }
      val bc = s.sparkContext.broadcast(costs)
      vocab = w.flatMap { case (word, freq) =>
        if (word.length > maxWordLen) Iterator.empty
        else segment(word, bc.value).iterator.flatMap(_.iterator.map(p => (p, freq)))
      }.toDF("piece", "f").groupBy("piece").agg(sum("f").as("cnt"))
        .as[(String, Long)].collect().toMap
    }
    val cFinal = vocab.values.sum
    vocab.toSeq.sortBy { case (p, c) => (-c, p) }
      .map { case (p, c) => (p, c, pieceCost(cFinal, c)) }
      .toDF("piece", "cnt", "cost")
  }

  /** Viterbi-encode the distinct vocabulary under a trained (piece, cnt,
    * cost) table — the apply half of train→apply (BpeTrain.encodeWords'
    * sibling). Map-only over the word table with the trained costs
    * broadcast; a word with no valid segmentation (pruned pieces, or
    * longer than [[maxWordLen]]) dead-letters with n_pieces = 0 and null
    * encoding instead of being dropped. Every word that received a
    * final-round segmentation during training is guaranteed encodable:
    * its pieces are exactly the ones the final counts came from. */
  def encodeWords(
      words: DataFrame,
      wordCol: String,
      freqCol: String,
      trained: DataFrame,
      maxWordLen: Int = 8): DataFrame = {
    val s = words.sparkSession
    import s.implicits._
    val costs = trained.select(col("piece"), col("cost"))
      .as[(String, Long)].collect().toMap
    val bc = s.sparkContext.broadcast(costs)
    words
      .select(col(wordCol).as("word"), col(freqCol).cast("long").as("freq"))
      .as[(String, Long)]
      .map { case (word, freq) =>
        val seg = if (word.length > maxWordLen) None else segment(word, bc.value)
        seg match {
          case Some(sg) =>
            (word, freq, sg.length.toLong,
              Some(sg.mkString("·")), Some(sg.map(bc.value).sum))
          case None => (word, freq, 0L, None: Option[String], None: Option[Long])
        }
      }
      .toDF("word", "freq", "n_pieces", "encoded", "enc_cost")
  }
}
