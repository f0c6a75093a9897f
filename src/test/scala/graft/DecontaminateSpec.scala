package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Decontaminate

class DecontaminateSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val benchSentence = "the quick brown fox jumps over the lazy dog tonight"

  test("corpus doc containing a benchmark span is flagged with the exact distinct-gram count") {
    val bench = Seq((100L, benchSentence)).toDF("bench_id", "bench_text")
    val corpus = Seq(
      (1L, s"some unrelated prefix text here $benchSentence and a suffix"),
      (2L, "completely different content with no overlap at all whatsoever in any gram"),
      (3L, "short doc")).toDF("doc_id", "text")
    val out = Decontaminate.overlapPairs(corpus, bench,
      "doc_id", "text", "bench_id", "bench_text", n = 8, minHits = 1L).collect()
    // bench has 10 tokens -> 3 distinct 8-grams, all present verbatim in doc 1
    assert(out.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("bench_id"),
      r.getAs[Long]("n_hits"))).toSeq === Seq((1L, 100L, 3L)))
  }

  test("repeated benchmark span in one doc still counts each gram once (distinct semantics)") {
    val bench = Seq((7L, benchSentence)).toDF("bench_id", "bench_text")
    val corpus = Seq((1L, s"$benchSentence again $benchSentence")).toDF("doc_id", "text")
    val out = Decontaminate.overlapPairs(corpus, bench,
      "doc_id", "text", "bench_id", "bench_text", n = 8, minHits = 1L).collect()
    assert(out.head.getAs[Long]("n_hits") === 3L)
  }

  test("minHits threshold filters partial overlaps") {
    val bench = Seq((1L, benchSentence)).toDF("bench_id", "bench_text")
    // only the first 8-gram of the bench sentence appears
    val corpus = Seq((1L, "the quick brown fox jumps over the lazy cat instead")).toDF("doc_id", "text")
    val hit = Decontaminate.overlapPairs(corpus, bench,
      "doc_id", "text", "bench_id", "bench_text", n = 8, minHits = 1L).collect()
    assert(hit.length === 1 && hit.head.getAs[Long]("n_hits") === 1L)
    val gated = Decontaminate.overlapPairs(corpus, bench,
      "doc_id", "text", "bench_id", "bench_text", n = 8, minHits = 2L).collect()
    assert(gated.isEmpty)
  }

  test("docs shorter than n grams produce no candidates") {
    val bench = Seq((1L, "tiny")).toDF("bench_id", "bench_text")
    val corpus = Seq((1L, "also tiny")).toDF("doc_id", "text")
    assert(Decontaminate.overlapPairs(corpus, bench,
      "doc_id", "text", "bench_id", "bench_text", n = 8, minHits = 1L).collect().isEmpty)
  }
}
