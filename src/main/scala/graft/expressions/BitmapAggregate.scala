package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Exact distinct-value bitmaps — the EXACT sibling of the approximate
  * sketch tier (HLL estimates, KMV estimates; the bitmap answers the same
  * distinct/intersection questions with zero error, at memory proportional
  * to the true cardinality — the Druid/ClickHouse `groupBitmap` shape).
  *
  * Buffer: a growable long array, sorted+deduped lazily (on overflow and
  * at serialize), so updates are O(1) appends and map-side combine stays
  * cheap. Wire form: sorted delta-varint bytes — deltas are ≥ 1 after
  * dedupe, so most values cost 1-2 bytes at realistic densities; the
  * SERIALIZED form is canonical (sorted, unique), which makes union-merge
  * bytes provably identical to building over the union directly — the
  * `ok_merge_lossless` md5 claim in bitmap_reaggregate.
  *
  * Values are stored EXACTLY (no hashing): exactness is the point. NULLs
  * are skipped like count(DISTINCT x).
  */
final class BitmapBuffer {
  private[expressions] var arr: Array[Long] = new Array[Long](16)
  private[expressions] var n: Int = 0

  def add(v: Long): Unit = {
    if (n == arr.length) {
      // compact first: dedupe may free most of the array without growing
      compact()
      if (n >= arr.length / 2) arr = java.util.Arrays.copyOf(arr, arr.length * 2)
    }
    arr(n) = v
    n += 1
  }

  def addAll(other: BitmapBuffer): Unit = {
    var i = 0
    while (i < other.n) { add(other.arr(i)); i += 1 }
  }

  /** Sort + dedupe in place. Idempotent. */
  def compact(): Unit = {
    if (n == 0) return
    java.util.Arrays.sort(arr, 0, n)
    var w = 1
    var i = 1
    while (i < n) {
      if (arr(i) != arr(w - 1)) { arr(w) = arr(i); w += 1 }
      i += 1
    }
    n = w
  }

  /** Canonical wire form: varint count, zigzag-varint first value, then
    * plain-varint deltas (all ≥ 1). */
  def serialize(): Array[Byte] = {
    compact()
    val out = new java.io.ByteArrayOutputStream(n * 2 + 8)
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0L) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    varint(n.toLong)
    var prev = 0L
    var i = 0
    while (i < n) {
      if (i == 0) varint((arr(0) << 1) ^ (arr(0) >> 63)) // zigzag
      else varint(arr(i) - prev)
      prev = arr(i)
      i += 1
    }
    out.toByteArray
  }
}

object BitmapCodec {
  /** The SQL kernels (`graft_bitmap_count` etc.) can be fed arbitrary
    * binary, so every read is bounds-checked and malformation surfaces as
    * this exception (caught → NULL in the scalar expressions), never as an
    * executor AIOOBE or a giant allocation. */
  final class Malformed(msg: String) extends IllegalArgumentException(s"malformed bitmap: $msg")

  private def fail(msg: String): Nothing = throw new Malformed(msg)

  // Bounds- and overflow-checked varint starting at `start`; returns
  // (value, position after the varint).
  private def readVarint(bytes: Array[Byte], start: Int): (Long, Int) = {
    var p = start
    var v = 0L; var shift = 0
    while (true) {
      if (p >= bytes.length) fail("truncated varint")
      val b = bytes(p); p += 1
      if (shift == 63 && (b & 0x7e) != 0) fail("varint overflows 64 bits")
      v |= (b & 0x7fL) << shift
      if ((b & 0x80) == 0) return (v, p)
      shift += 7
      if (shift > 63) fail("varint overflows 64 bits")
    }
    (v, p) // unreachable
  }

  /** Decode the canonical wire form to a sorted long array. Strict: the
    * count must fit the remaining bytes (each encoded value costs >= 1
    * byte) and the input must be fully consumed — trailing garbage is
    * malformation, matching the PNG/Avro strictness convention. */
  def decode(bytes: Array[Byte]): Array[Long] = {
    if (bytes == null || bytes.length == 0) fail("empty input")
    val (nL, p0) = readVarint(bytes, 0)
    if (nL < 0L || nL > (bytes.length - p0).toLong) fail(s"count $nL exceeds payload")
    val n = nL.toInt
    if (n == 0) {
      if (p0 != bytes.length) fail("trailing bytes")
      return Array.emptyLongArray
    }
    val out = new Array[Long](n)
    var p = p0
    var i = 0
    var prev = 0L
    while (i < n) {
      val (raw, p2) = readVarint(bytes, p)
      p = p2
      if (i == 0) prev = (raw >>> 1) ^ -(raw & 1L)
      else {
        if (raw <= 0L) fail("non-positive delta") // canonical deltas are >= 1
        prev += raw
      }
      out(i) = prev
      i += 1
    }
    if (p != bytes.length) fail("trailing bytes")
    out
  }

  /** Cardinality without materializing the values (count varint only, with
    * the same bounds validation as decode). */
  def cardinality(bytes: Array[Byte]): Long = {
    if (bytes == null || bytes.length == 0) fail("empty input")
    val (nL, p0) = readVarint(bytes, 0)
    if (nL < 0L || nL > (bytes.length - p0).toLong) fail(s"count $nL exceeds payload")
    nL
  }

  /** Exact |A ∩ B| by two-pointer walk over the sorted decodes. */
  def andCount(a: Array[Byte], b: Array[Byte]): Long = {
    val xs = decode(a); val ys = decode(b)
    var i = 0; var j = 0; var c = 0L
    while (i < xs.length && j < ys.length) {
      if (xs(i) == ys(j)) { c += 1; i += 1; j += 1 }
      else if (xs(i) < ys(j)) i += 1
      else j += 1
    }
    c
  }
}

/** `bitmap_bytes(value)` → canonical serialized distinct set. */
case class BitmapBytes(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BitmapBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): BitmapBuffer = new BitmapBuffer

  override def update(buffer: BitmapBuffer, input: InternalRow): BitmapBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: BitmapBuffer, other: BitmapBuffer): BitmapBuffer = {
    buffer.addAll(other)
    buffer
  }

  override def eval(buffer: BitmapBuffer): Any = buffer.serialize()

  override def serialize(buffer: BitmapBuffer): Array[Byte] = buffer.serialize()

  override def deserialize(bytes: Array[Byte]): BitmapBuffer = {
    val buf = new BitmapBuffer
    BitmapCodec.decode(bytes).foreach(buf.add)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapBytes =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapBytes =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BitmapBytes =
    copy(child = newChildren(0))
  override def prettyName: String = "bitmap_bytes"
}

/** `bitmap_merge(bitmap_bytes)` → union of stored bitmaps (re-aggregation
  * tier: daily bitmap table, any window unioned later, no corpus rescan).
  * Set union is associative/commutative/idempotent and the wire form is
  * canonical, so merged bytes ≡ a direct build over the union. */
case class BitmapMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BitmapBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): BitmapBuffer = new BitmapBuffer

  override def update(buffer: BitmapBuffer, input: InternalRow): BitmapBuffer = {
    val v = child.eval(input)
    if (v != null) BitmapCodec.decode(v.asInstanceOf[Array[Byte]]).foreach(buffer.add)
    buffer
  }

  override def merge(buffer: BitmapBuffer, other: BitmapBuffer): BitmapBuffer = {
    buffer.addAll(other)
    buffer
  }

  override def eval(buffer: BitmapBuffer): Any = buffer.serialize()
  override def serialize(buffer: BitmapBuffer): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): BitmapBuffer = {
    val buf = new BitmapBuffer
    BitmapCodec.decode(bytes).foreach(buf.add)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BitmapMergeAgg =
    copy(child = newChildren(0))
  override def prettyName: String = "bitmap_merge"
}

/** `bitmap_count(bytes)` → exact cardinality; NULL on malformed input
  * (the dead-letter convention — corrupt bytes must not crash executors). */
case class BitmapCount(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    try BitmapCodec.cardinality(v.asInstanceOf[Array[Byte]])
    catch { case _: BitmapCodec.Malformed => null }
  override protected def withNewChildInternal(newChild: Expression): BitmapCount =
    copy(child = newChild)
  override def prettyName: String = "bitmap_count"
}

/** `bitmap_and_count(a, b)` → exact intersection cardinality (the exact
  * retention/overlap primitive beside KMV's estimated intersection). */
case class BitmapAndCount(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    try BitmapCodec.andCount(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
    catch { case _: BitmapCodec.Malformed => null }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitmapAndCount =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "bitmap_and_count"
}

object Bitmap {
  /** Exact distinct set of a long column (NULLs skipped). */
  def sketch(c: Column): Column =
    Sketch.column(BitmapBytes(Sketch.expr(c.cast("long"))).toAggregateExpression())

  /** Union of stored bitmaps. */
  def merge(c: Column): Column =
    Sketch.column(BitmapMergeAgg(Sketch.expr(c)).toAggregateExpression())

  /** Exact cardinality of a stored bitmap. */
  def count(c: Column): Column = Sketch.column(BitmapCount(Sketch.expr(c)))

  /** Exact intersection cardinality of two stored bitmaps. */
  def andCount(a: Column, b: Column): Column =
    Sketch.column(BitmapAndCount(Sketch.expr(a), Sketch.expr(b)))
}
