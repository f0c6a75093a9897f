package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** WordPiece-style greedy longest-match-first subword segmentation (the
  * BERT tokenizer family — Wu et al. 2016 "Google's Neural Machine
  * Translation System", §3.2; the third tokenizer family beside BPE's
  * merge replay and the unigram-LM Viterbi). The `##` continuation
  * convention is modeled as POSITION-RESTRICTED vocabularies: `startVocab`
  * applies at offset 0, `contVocab` after it — exactly the start-piece /
  * continuation-piece split, without materializing marker strings. At each
  * position the LONGEST matching piece wins (maximal munch); both vocabs
  * contain every single character seen at their positions, so corpus words
  * never fail to encode (NULL is returned for genuinely unencodable input
  * rather than throwing). Vocab sets are baked plan literals hashed once
  * per executor — the corpus-side cost is O(len · maxPieceLen) HashSet
  * probes per DISTINCT word, never an interpreted HOF over the corpus. */
case class WordPieceCount(
    child: Expression,
    startVocab: Seq[String],
    contVocab: Seq[String],
    maxPieceLen: Int)
    extends UnaryExpression with CodegenFallback {

  require(maxPieceLen >= 1, "maxPieceLen must be positive")

  @transient private lazy val startSet = {
    val s = new java.util.HashSet[String](startVocab.size * 2)
    startVocab.foreach(s.add)
    s
  }
  @transient private lazy val contSet = {
    val s = new java.util.HashSet[String](contVocab.size * 2)
    contVocab.foreach(s.add)
    s
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val word = input.toString
    var pos = 0
    var cnt = 0L
    while (pos < word.length) {
      val set = if (pos == 0) startSet else contSet
      var l = math.min(maxPieceLen, word.length - pos)
      var matched = 0
      while (l >= 1 && matched == 0) {
        if (set.contains(word.substring(pos, pos + l))) matched = l
        l -= 1
      }
      if (matched == 0) return null // unencodable under this vocab
      pos += matched
      cnt += 1
    }
    cnt
  }

  override protected def withNewChildInternal(newChild: Expression): WordPieceCount =
    copy(child = newChild)
  override def prettyName: String = "wordpiece_count"
}

object WordPiece {
  /** Piece count of the greedy WordPiece segmentation of a word. */
  def count(word: Column, startVocab: Seq[String], contVocab: Seq[String],
      maxPieceLen: Int = 4): Column =
    Sketch.column(WordPieceCount(Sketch.expr(word), startVocab, contVocab, maxPieceLen))
}
