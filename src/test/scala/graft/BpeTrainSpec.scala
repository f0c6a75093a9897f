package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.BpeTrain

class BpeTrainSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  /** Driver-side reference BPE: greedy left-to-right merge application,
    * top pair by (count desc, concatenated-pair lex asc) — the exact
    * contract the distributed trainer claims. */
  private def refBpe(words: Seq[(String, Long)], k: Int)
      : Seq[(String, String, Long)] = {
    var seqs: Seq[(Vector[String], Long)] =
      words.map { case (w, f) => (w.map(_.toString).toVector :+ "</w>", f) }
    val out = Seq.newBuilder[(String, String, Long)]
    var step = 0
    var done = false
    while (step < k && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((s, f) <- seqs; i <- 0 until s.length - 1)
        counts((s(i), s(i + 1))) = counts.getOrElse((s(i), s(i + 1)), 0L) + f
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.toSeq
          .sortBy { case ((a, b), n) => (-n, a + "··" + b) }.head
        out += ((l, r, c))
        seqs = seqs.map { case (s, f) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < s.length) {
            if (i < s.length - 1 && s(i) == l && s(i + 1) == r) {
              b += (l + r); i += 2
            } else { b += s(i); i += 1 }
          }
          (b.result(), f)
        }
        step += 1
      }
    }
    out.result()
  }

  private def trainOn(words: Seq[(String, Long)], k: Int) =
    BpeTrain.train(words.toDF("word", "freq"), "word", "freq", k)
      .map(m => (m.lhs, m.rhs, m.cnt))

  test("matches the reference trainer on random weighted vocabularies") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed * 17)
      val alphabet = "abcdef"
      val words = (1 to 40).map { _ =>
        val w = Seq.fill(2 + rnd.nextInt(6))(
          alphabet(rnd.nextInt(alphabet.length))).mkString
        w
      }.distinct.map(w => (w, 1L + rnd.nextInt(50).toLong))
      assert(trainOn(words, 8) === refBpe(words, 8), s"seed $seed")
    }
  }

  test("greedy left-to-right: 'l l l' merges to [ll, l], not [l, ll]") {
    // one word "lll": first merge is (l,l) with count 2x5; greedy
    // application leaves [ll, l, </w>], so round 2's top pair is (ll, l)
    val merges = trainOn(Seq(("lll", 5L)), 2)
    assert(merges.head === (("l", "l", 10L)))
    assert(merges(1) === (("ll", "l", 5L)))
  }

  test("count ties break on concatenated pair lexicographic order") {
    // "ab" and "cd" with equal freq: pairs (a,b), (b,</w>), (c,d),
    // (d,</w>) all count 7 -> 'a··b' wins lexicographically
    val merges = trainOn(Seq(("ab", 7L), ("cd", 7L)), 1)
    assert(merges === Seq(("a", "b", 7L)))
  }

  test("encodeWords subword counts match the reference apply on random vocabularies") {
    // reference apply: run refBpe's greedy merge machinery forward with
    // the TRAINED merge list (not re-derived tops) and count symbols
    def refEncode(words: Seq[String], merges: Seq[(String, String)]): Map[String, Long] =
      words.map { w =>
        var s: Vector[String] = w.map(_.toString).toVector :+ "</w>"
        for ((l, r) <- merges) {
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < s.length) {
            if (i < s.length - 1 && s(i) == l && s(i + 1) == r) {
              b += (l + r); i += 2
            } else { b += s(i); i += 1 }
          }
          s = b.result()
        }
        w -> s.length.toLong
      }.toMap
    for (seed <- 5 to 7) {
      val rnd = new scala.util.Random(seed * 13)
      val alphabet = "abcde"
      val words = (1 to 30).map { _ =>
        Seq.fill(2 + rnd.nextInt(6))(alphabet(rnd.nextInt(alphabet.length))).mkString
      }.distinct.map(w => (w, 1L + rnd.nextInt(20).toLong))
      val df = words.toDF("word", "freq")
      val merges = BpeTrain.train(df, "word", "freq", 6)
      val got = BpeTrain.encodeWords(df, "word", merges)
        .as[(String, Long)].collect().toMap
      val want = refEncode(words.map(_._1), merges.map(m => (m.lhs, m.rhs)))
      assert(got === want, s"seed $seed: distributed encode != reference apply")
    }
  }

  test("stops early when the pair space is exhausted") {
    // "ab": 3 pairs total ((a,b), (ab,</w>) after merge 1, then none)
    val merges = trainOn(Seq(("ab", 3L)), 10)
    assert(merges.length === 2)
    assert(merges === Seq(("a", "b", 3L), (("ab", "</w>", 3L))))
  }
}
