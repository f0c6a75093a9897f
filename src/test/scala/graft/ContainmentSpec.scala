package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Pins Dedup.containmentPairs against a brute-force all-pairs model on
  * the raw shingle STRING sets (the model never hashes and never probes —
  * any bottom-K recall gap or intersect miscount surfaces as a set
  * mismatch). Vocabulary is tiny so shingle overlap is dense, and planted
  * excerpt docs exercise the asymmetric lane the operator exists for. */
class ContainmentSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val K = 4 // shingle size used by the operator default

  private def model(docs: Seq[(Long, String)], t: Double): Set[(Long, Long, Long, Long, Long)] = {
    val sets = docs.map { case (id, text) =>
      val toks = text.toLowerCase.split(" ", -1).toSeq
      id -> toks.sliding(K).filter(_.size == K).map(_.mkString(" ")).toSet
    }.filter(_._2.nonEmpty)
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      inter = (sa & sb).size
      if inter.toDouble / math.min(sa.size, sb.size) >= t
    } yield (a, b, sa.size.toLong, sb.size.toLong, inter.toLong)).toSet
  }

  private def got(docs: Seq[(Long, String)]): Set[(Long, Long, Long, Long, Long)] =
    Dedup.containmentPairs(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet

  test("planted excerpt-in-document pairs are found; unrelated docs are not") {
    val big = (1 to 30).map(i => s"w$i").mkString(" ")                // 30 distinct tokens
    val excerpt = (1 to 12).map(i => s"w$i").mkString(" ")            // prefix: containment 1.0
    val docs = Seq(1L -> big, 2L -> excerpt, 3L -> "x y z q r s t u v w")
    val pairs = got(docs)
    assert(pairs == model(docs, 0.9))
    assert(pairs.exists { case (a, b, _, _, _) => (a, b) == (1L, 2L) })
  }

  test("random dense corpora match the brute-force all-pairs model") {
    val rnd = new scala.util.Random(11)
    val vocab = Vector("a", "b", "c", "d")
    for (trial <- 1 to 10) {
      val base = (1L to 30L).map { id =>
        val n = 4 + rnd.nextInt(25)
        id -> Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      // planted excerpts: first 8 tokens of a longer doc, offset ids
      val excerpts = base.filter(_._2.split(" ").length >= 14).take(3)
        .map { case (id, t) => (id + 100L) -> t.split(" ").take(8).mkString(" ") }
      val docs = base ++ excerpts
      assert(got(docs) == model(docs, 0.9), s"trial $trial diverged")
    }
  }
}
