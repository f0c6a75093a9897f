package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Gram-matrix sufficient statistic: G = Σ_rows v·vᵀ over an embedding
  * column, accumulated EXACTLY in scaled integers.
  *
  * This is the distributed-PCA / covariance primitive: principal components,
  * whitening, and linear probes over a 100 TB embedding corpus all reduce to
  * one pass building the d×d Gram (plus the mean vector, a special case) —
  * a FIXED dim(dim+1)/2-cell buffer per task with elementwise-add merge,
  * map-side combined, partitioning-invariant. The corpus never shuffles;
  * only ~16 KB buffers do. The d×d eigen-solve that follows is driver-side
  * O(d³) on a 64×64 matrix — the textbook sufficient-statistic split (same
  * shape as the OLS operator's Σx/Σxy fold, generalized to matrices).
  *
  * Exactness: each element is quantized v_i = floor(x_i · scale) ONCE, and
  * all products/sums stay in Long — order-independent, hash-stable, and
  * replayable in plain SQL (the oracle recomputes every cell from the same
  * quantization). Overflow headroom: |x| ≤ O(1) embeddings at scale 2¹⁰
  * give |v| ≤ ~2¹⁰, products ≤ 2²⁰ — Long overflows past ~2⁴³ rows per
  * cell (≈ 8 × 10¹² vectors), far beyond any corpus; larger `scale` trades
  * headroom for precision explicitly.
  *
  * Reference corollary: reader (row-at-a-time Go ETL) has no linear-algebra
  * tier; this extends the sufficient-statistic family (OLS, sketches) the
  * LLM-curation operators established.
  */
object Gram {
  /** `gram(vec, dim, scale)` → full row-major dim×dim symmetric matrix as
    * array<long> (upper triangle mirrored, so consumers index [i*dim+j]
    * without triangular arithmetic). */
  def gram(vec: Column, dim: Int, scale: Long): Column =
    Sketch.column(GramBuild(Sketch.expr(vec), dim, scale).toAggregateExpression())
}

final class GramBuffer(val dim: Int) {
  var n: Long = 0L
  // upper triangle, row-major: idx(i,j) = i*dim - i*(i-1)/2 + (j-i), j >= i
  val tri: Array[Long] = new Array[Long](dim * (dim + 1) / 2)

  def add(v: Array[Long]): Unit = {
    var idx = 0
    var i = 0
    while (i < dim) {
      val vi = v(i)
      var j = i
      while (j < dim) {
        tri(idx) += vi * v(j)
        idx += 1
        j += 1
      }
      i += 1
    }
    n += 1
  }

  def merge(other: GramBuffer): Unit = {
    var i = 0
    while (i < tri.length) { tri(i) += other.tri(i); i += 1 }
    n += other.n
  }
}

/** `gram_build(vec)` over array<double>: quantize once, accumulate the
  * upper triangle, emit the mirrored full matrix. */
case class GramBuild(
    child: Expression,
    dim: Int,
    scale: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[GramBuffer] {

  require(dim >= 1 && dim <= 1024, s"dim $dim outside [1, 1024]")
  require(scale >= 1, s"scale $scale < 1")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): GramBuffer = new GramBuffer(dim)

  override def update(buffer: GramBuffer, input: InternalRow): GramBuffer = {
    val raw = child.eval(input)
    if (raw != null) {
      val arr = raw.asInstanceOf[ArrayData]
      require(arr.numElements() == dim,
        s"embedding length ${arr.numElements()} != dim $dim")
      val v = new Array[Long](dim)
      var i = 0
      while (i < dim) {
        v(i) = math.floor(arr.getDouble(i) * scale).toLong
        i += 1
      }
      buffer.add(v)
    }
    buffer
  }

  override def merge(buffer: GramBuffer, other: GramBuffer): GramBuffer = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: GramBuffer): Any = {
    val full = new Array[Long](dim * dim)
    var idx = 0
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val g = buffer.tri(idx)
        full(i * dim + j) = g
        full(j * dim + i) = g
        idx += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(full)
  }

  override def serialize(buffer: GramBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(12 + buffer.tri.length * 8)
    bb.putInt(buffer.dim).putLong(buffer.n)
    buffer.tri.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): GramBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new GramBuffer(bb.getInt)
    buf.n = bb.getLong
    var i = 0
    while (i < buf.tri.length) { buf.tri(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramBuild =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramBuild =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GramBuild =
    copy(child = newChildren(0))
  override def prettyName: String = "gram_build"
}
