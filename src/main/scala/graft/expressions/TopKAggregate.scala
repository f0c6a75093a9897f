package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k accumulator: at most `k` (id, score) pairs, ordered by
  * (score desc, id asc), deduplicated by id.
  *
  * This is the scale-safe replacement for `row_number() over (partition by
  * qid)`: as a partial-aggregable buffer, every map task emits at most k
  * pairs per query key, so the shuffle after scoring carries
  * O(queries x partitions x k) rows instead of O(|corpus| x |queries|) rows
  * into one partition per query. Dedup-by-id also absorbs LSH band
  * collisions (the same candidate pair surfacing in several bands) without
  * a separate distinct-shuffle.
  *
  * k is small (top-k search), so inserts are O(k) linear scans — cheaper
  * than heap bookkeeping at these sizes and trivially correct.
  */
final class TopKBuffer(val k: Int) {
  val ids: Array[Long] = new Array[Long](k)
  val scores: Array[Double] = new Array[Double](k)
  var size: Int = 0

  @inline private def beats(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  def insert(id: Long, score: Double): Unit = {
    var i = 0
    while (i < size) {
      if (ids(i) == id) return // same neighbor via another LSH band
      i += 1
    }
    if (size < k) {
      ids(size) = id
      scores(size) = score
      size += 1
    } else if (size > 0) {
      var worst = 0
      var j = 1
      while (j < size) {
        if (beats(scores(worst), ids(worst), scores(j), ids(j))) worst = j
        j += 1
      }
      if (beats(score, id, scores(worst), ids(worst))) {
        ids(worst) = id
        scores(worst) = score
      }
    }
  }

  def merge(other: TopKBuffer): Unit = {
    var i = 0
    while (i < other.size) {
      insert(other.ids(i), other.scores(i))
      i += 1
    }
  }

  /** Indices of the buffered pairs in output order (score desc, id asc). */
  def sortedIndices: Array[Int] = {
    val idx = Array.tabulate(size)(identity)
    idx.sortInPlaceWith { (a, b) =>
      scores(a) > scores(b) || (scores(a) == scores(b) && ids(a) < ids(b))
    }
    idx
  }
}

/** `bounded_topk(score, id, k)`: array<struct<nid,cos>> of the k best pairs
  * by (score desc, id asc). TypedImperativeAggregate, so Spark plans it as
  * ObjectHashAggregate with a Partial/Final split — the map-side combine is
  * what bounds the shuffle (see [[TopKBuffer]]). */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("nid", LongType, nullable = false),
      StructField("cos", DoubleType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      buffer.insert(i.asInstanceOf[Long], s.asInstanceOf[Double])
    }
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: TopKBuffer): Any = {
    val idx = buffer.sortedIndices
    val rows: Array[Any] = idx.map { i =>
      new GenericInternalRow(Array[Any](buffer.ids(i), buffer.scores(i)))
    }
    new GenericArrayData(rows)
  }

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 16 * buffer.size)
    bb.putInt(buffer.k)
    bb.putInt(buffer.size)
    var i = 0
    while (i < buffer.size) {
      bb.putLong(buffer.ids(i))
      bb.putDouble(buffer.scores(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val bk = bb.getInt()
    val n = bb.getInt()
    val buf = new TopKBuffer(bk)
    var i = 0
    while (i < n) {
      val id = bb.getLong()
      val s = bb.getDouble()
      buf.ids(i) = id
      buf.scores(i) = s
      i += 1
    }
    buf.size = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))
  override def prettyName: String = "bounded_topk"
}
