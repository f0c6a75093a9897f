package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SubstringDedup

/** Pins SubstringDedup.spanStats against a brute-force per-doc model:
  * enumerate every k-token window, count occurrences corpus-wide on the
  * RAW strings (the model never hashes), merge duplicated positions into
  * maximal spans with a direct scan. Random corpora draw from a tiny
  * vocabulary so cross-doc window repeats are dense — the regime where
  * island merging (overlap, adjacency, containment) actually exercises. */
class SubstringDedupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val K = 4

  /** (n_tokens, n_spans, dup_tokens) per doc via direct scan. */
  private def model(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Long)] = {
    val toks = docs.map { case (id, t) => id -> t.toLowerCase.split(" ", -1).toSeq }.toMap
    val winCounts = toks.values.flatMap(ts => ts.sliding(K).filter(_.size == K).map(_.mkString(" ")))
      .groupBy(identity).map { case (w, occ) => w -> occ.size }
    toks.map { case (id, ts) =>
      val dupPos = ts.sliding(K).zipWithIndex
        .collect { case (w, i) if w.size == K && winCounts(w.mkString(" ")) >= 2 => i }
        .toSeq
      // merge [p, p+K) intervals over sorted positions
      var spans = 0L; var dupToks = 0L
      var curStart = -1; var curEnd = -1
      for (p <- dupPos) {
        if (curEnd < 0 || p > curEnd) { // new island (touching pos == curEnd merges)
          if (curEnd >= 0) { spans += 1; dupToks += curEnd - curStart }
          curStart = p; curEnd = p + K
        } else curEnd = math.max(curEnd, p + K)
      }
      if (curEnd >= 0) { spans += 1; dupToks += curEnd - curStart }
      id -> ((ts.size.toLong, spans, dupToks))
    }
  }

  private def check(docs: Seq[(Long, String)]): Unit = {
    val got = SubstringDedup.spanStats(docs.toDF("doc_id", "text"), "doc_id", "text", K)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == model(docs))
  }

  test("planted shapes: exact twins, shared prefix, contained repeat, adjacency, uniques") {
    check(Seq(
      1L -> "a b c d e f g h",          // twin of 2
      2L -> "a b c d e f g h",
      3L -> "a b c d x y z w q r",      // shares the leading window with 1/2
      4L -> "p q r s t u v w",          // unique — zero spans
      5L -> "a b c d e f a b c d e f",  // internal repeat + cross-doc windows
      6L -> "m n",                      // shorter than k — zero windows
      7L -> "x y z w q r x y z w q r")) // internal repeat spanning adjacency
  }

  test("random dense corpora match the brute-force model") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "b", "c", "d", "e")
    for (trial <- 1 to 15) {
      val docs = (1L to 40L).map { id =>
        val n = 2 + rnd.nextInt(30)
        id -> Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      check(docs)
    }
  }

  /** Removal model: drop every token covered by a duplicated window. */
  private def removalModel(docs: Seq[(Long, String)]): Map[Long, (Long, Long, String)] = {
    val toks = docs.map { case (id, t) => id -> t.toLowerCase.split(" ", -1).toSeq }.toMap
    val winCounts = toks.values.flatMap(ts => ts.sliding(K).filter(_.size == K).map(_.mkString(" ")))
      .groupBy(identity).map { case (w, occ) => w -> occ.size }
    toks.map { case (id, ts) =>
      val covered = Array.fill(ts.size)(false)
      ts.sliding(K).zipWithIndex.foreach { case (w, i) =>
        if (w.size == K && winCounts(w.mkString(" ")) >= 2)
          (i until i + K).foreach(covered(_) = true)
      }
      val kept = ts.indices.filterNot(covered).map(ts)
      id -> ((ts.size.toLong, covered.count(identity).toLong, kept.mkString(" ")))
    }
  }

  test("span removal reassembles exactly the uncovered tokens, in order") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "d", "e")
    val docs = (1L to 40L).map { id =>
      val n = 2 + rnd.nextInt(30)
      id -> Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    } ++ Seq(100L -> "q w e r t y u i", 101L -> "q w e r t y u i") // fully-removed twins
    val got = SubstringDedup.removeSpans(docs.toDF("doc_id", "text"), "doc_id", "text", K)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got == removalModel(docs))
    assert(got(100L)._3 == "") // twin docs vanish entirely
  }
}
