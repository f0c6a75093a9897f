package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SimilarityJoin

class SimilarityJoinSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def bruteForce(docs: Seq[(Long, String)], t: Double): Set[(Long, Long)] = {
    val sets = docs.map { case (id, txt) =>
      (id, txt.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSet)
    }
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      ov = (sa & sb).size
      if sa.nonEmpty && sb.nonEmpty &&
        ov.toDouble / math.sqrt(sa.size.toDouble * sb.size) >= t - 1e-12
    } yield (a, b)).toSet
  }

  test("prefix filtering finds exactly the brute-force pair set (no misses)") {
    val rnd = new scala.util.Random(23)
    val vocab = (1 to 60).map(i => s"w$i")
    // overlapping random docs: shared template + random tail
    val docs: Seq[(Long, String)] = (0 until 60).map { i =>
      val base = vocab.take(12 + i % 5)
      val tail = Seq.fill(6)(vocab(rnd.nextInt(vocab.size)))
      (i.toLong, (rnd.shuffle(base ++ tail)).mkString(" "))
    }
    for ((tn, td) <- Seq((9, 10), (95, 100))) {
      val expected = bruteForce(docs, tn.toDouble / td)
      val got = SimilarityJoin.allPairsCosine(docs.toDF("doc_id", "text"),
          "doc_id", "text", tn, td)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === expected, s"threshold $tn/$td")
    }
  }

  test("identical word sets score cosine 1.0 regardless of word order") {
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, "delta gamma beta alpha"),
      (3L, "epsilon zeta eta theta"))
    val got = SimilarityJoin.allPairsCosine(docs.toDF("doc_id", "text"),
        "doc_id", "text", 99, 100)
      .collect()
    assert(got.length === 1)
    assert((got.head.getLong(0), got.head.getLong(1)) === (1L, 2L))
    assert(got.head.getDouble(5) === 1.0)
  }
}
