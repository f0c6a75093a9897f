package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.UnigramTrain

/** Unigram-LM trainer pinned against an independent driver-side reference:
  * recursive all-segmentations enumeration (vs the engine's bitmask walk)
  * and a from-scratch tiny-corpus EM replay. */
class UnigramTrainSpec extends AnyFunSuite {
  import TestSpark._

  // independent segmentation model: recursive enumeration of ALL piece
  // compositions, scored with the same integer cost; tie-break = smallest
  // mask, reconstructed from cut positions
  private def allSegs(word: String): Seq[Seq[String]] =
    if (word.isEmpty) Seq(Seq.empty)
    else for {
      l <- 1 to word.length
      rest <- allSegs(word.substring(l))
    } yield word.substring(0, l) +: rest

  private def maskOf(pieces: Seq[String]): Int =
    pieces.init.scanLeft(0)(_ + _.length).tail.map(c => 1 << (c - 1)).sum

  private def refSegment(word: String, costs: Map[String, Long]): Option[Seq[String]] = {
    val valid = allSegs(word).filter(_.forall(costs.contains))
    if (valid.isEmpty) None
    else Some(valid.minBy(sg => (sg.map(costs).sum, maskOf(sg))))
  }

  test("integer cost: len(bin(C div c)) = 1 + floor(log2(C/c))") {
    assert(UnigramTrain.pieceCost(8, 8) === 1L)
    assert(UnigramTrain.pieceCost(8, 1) === 4L)
    assert(UnigramTrain.pieceCost(1000, 3) === 9L) // 333 -> floor log2 = 8
    assert(UnigramTrain.floorLog2(1) === 0L)
    assert(UnigramTrain.floorLog2(1023) === 9L)
    assert(UnigramTrain.floorLog2(1024) === 10L)
  }

  test("bitmask segmentation equals recursive brute-force enumeration") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abc"
    for (_ <- 1 to 200) {
      val word = Seq.fill(1 + rnd.nextInt(8))(alphabet(rnd.nextInt(3))).mkString
      // random vocab: all single chars at random costs, plus random
      // substrings of the word; occasionally drop a char to exercise the
      // no-valid-segmentation path
      val base = alphabet.map(c => c.toString -> (1L + rnd.nextInt(6))).toMap
      val extra = (1 to 4).map { _ =>
        val st = rnd.nextInt(word.length)
        val l = 1 + rnd.nextInt(math.min(4, word.length - st))
        word.substring(st, st + l) -> (1L + rnd.nextInt(6))
      }.toMap
      val costs0 = base ++ extra
      val costs = if (rnd.nextInt(5) == 0) costs0 - word.substring(0, 1) else costs0
      assert(UnigramTrain.segment(word, costs) === refSegment(word, costs),
        s"word=$word costs=$costs")
    }
  }

  test("tiny-corpus train matches a hand-replayed EM") {
    import TestSpark.spark.implicits._
    // corpus: "ababab" x4, "abc" x2  -> "ab" dominates seeding
    val words = Seq(("ababab", 4L), ("abc", 2L)).toDF("word", "freq")
    val got = UnigramTrain.train(words, "word", "freq", topPieces = 3)
      .as[(String, Long, Long)].collect().map { case (p, c, k) => p -> ((c, k)) }.toMap

    // reference replay, from scratch
    val corpus = Seq(("ababab", 4L), ("abc", 2L))
    def seedCounts: Map[String, Long] = {
      val m = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      for ((wd, f) <- corpus; l <- 1 to 4; st <- 0 to wd.length - l)
        m(wd.substring(st, st + l)) += f
      m.toMap
    }
    val seeds = seedCounts
    val top3 = seeds.filter(_._1.length >= 2).toSeq
      .sortBy { case (p, c) => (-c, p) }.take(3)
    var vocab = seeds.filter(_._1.length == 1) ++ top3
    for (_ <- 1 to 2) {
      val c = vocab.values.sum
      val costs = vocab.map { case (p, n) => p -> UnigramTrain.pieceCost(c, n) }
      val m = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      for ((wd, f) <- corpus; sg <- refSegment(wd, costs).toSeq; p <- sg) m(p) += f
      vocab = m.toMap
    }
    val cF = vocab.values.sum
    val expected = vocab.map { case (p, n) => p -> ((n, UnigramTrain.pieceCost(cF, n))) }
    assert(got === expected)
    // non-vacuous: a multi-char piece must survive EM
    assert(expected.keys.exists(_.length > 1))
  }

  test("encodeWords reassembles every word exactly and dead-letters OOV") {
    import TestSpark.spark.implicits._
    val words = Seq(("ababab", 4L), ("abc", 2L)).toDF("word", "freq")
    val trained = UnigramTrain.train(words, "word", "freq", topPieces = 3)
    val enc = UnigramTrain.encodeWords(words, "word", "freq", trained)
      .as[(String, Long, Long, Option[String], Option[Long])].collect()
    assert(enc.length === 2)
    for ((word, _, n, encoded, cost) <- enc) {
      assert(n > 0 && encoded.isDefined && cost.isDefined, s"$word must encode")
      val pieces = encoded.get.split('·').toSeq
      assert(pieces.mkString === word, "pieces must reassemble the word byte-exactly")
      assert(pieces.length.toLong === n)
      // every trained word's final segmentation pieces are in the vocab
      val costs = trained.as[(String, Long, Long)].collect()
        .map { case (p, _, c) => p -> c }.toMap
      assert(cost.get === pieces.map(costs).sum)
    }
    // OOV lane: a word whose characters were pruned from the final vocab
    val oov = UnigramTrain.encodeWords(
      Seq(("zzz", 1L)).toDF("word", "freq"), "word", "freq", trained)
      .as[(String, Long, Long, Option[String], Option[Long])].collect().head
    assert(oov === (("zzz", 1L, 0L, None, None)))
  }
}
