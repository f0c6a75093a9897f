package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions.xxhash64
import org.apache.spark.sql.types._

/** Bloom filter as a native aggregate + membership expression pair.
  *
  * The incremental-dedup shape this serves at 100 TB: an existing corpus of
  * N fingerprints is summarized into a FIXED m-bit filter (one aggregation
  * with map-side partials — merge is a bitwise OR, so the build is order-
  * and partitioning-invariant); each incoming row then tests membership
  * against the broadcast filter map-side. Only the rows the filter cannot
  * rule out (true duplicates plus the ~(1-e^{-kn/m})^k false-positive
  * sliver) continue into the exact anti-join — the shuffle the filter
  * exists to shrink. No false negatives, so prefilter + exact resolve is
  * result-identical to the plain anti-join (asserted by the
  * `dedup_incremental` oracle).
  *
  * Bit indices use Kirsch-Mitzenmacher double hashing over the (already
  * 64-bit) input hash: idx_i = floorMod(h + i * h2(h), m) with an odd,
  * splitmix64-derived step — deterministic, so the filter bytes themselves
  * are reproducible run to run.
  *
  * Reference behavior being re-expressed: reader dedupes replayed CDC
  * events by primary key on resume (sources/mysql/streaming iterator
  * re-entering at a stored offset); this is the bounded-memory form of
  * "have I seen this key" at corpus scale.
  */
final class BloomBuffer(val numBits: Int, val numHashes: Int) {
  // numBits == 0 is BloomMerge's "no filter seen yet" sentinel (never
  // add()ed to); any real filter needs a positive multiple of 8
  require(numBits % 8 == 0 && numBits >= 0, s"numBits $numBits not a non-negative multiple of 8")
  val bytes: Array[Byte] = new Array[Byte](numBits / 8)

  def add(h: Long): Unit = {
    val step = Bloom.oddStep(h)
    var i = 0
    while (i < numHashes) {
      val idx = java.lang.Math.floorMod(h + i.toLong * step, numBits.toLong).toInt
      bytes(idx >> 3) = (bytes(idx >> 3) | (1 << (idx & 7))).toByte
      i += 1
    }
  }

  def merge(other: BloomBuffer): Unit = {
    var i = 0
    while (i < bytes.length) {
      bytes(i) = (bytes(i) | other.bytes(i)).toByte
      i += 1
    }
  }
}

object Bloom {
  /** splitmix64 finalizer of the hash, forced odd so the double-hash step
    * cycles through all indices. */
  def oddStep(h: Long): Long = Sketch.splitmix64(h) | 1L

  /** Zero-copy membership test against serialized filter bytes
    * (layout: byte 0 = numHashes, rest = bit array). */
  def mightContainBytes(ser: Array[Byte], h: Long): Boolean = {
    val numHashes = ser(0).toInt
    val numBits = (ser.length - 1).toLong * 8L
    val step = oddStep(h)
    var i = 0
    while (i < numHashes) {
      val idx = java.lang.Math.floorMod(h + i.toLong * step, numBits).toInt
      if ((ser(1 + (idx >> 3)) & (1 << (idx & 7))) == 0) return false
      i += 1
    }
    true
  }

  /** Build a filter over a 64-bit-hashed column. NULLs are skipped (a NULL
    * fingerprint is "no fingerprint", not a member). */
  def aggregate(c: Column, numBits: Int, numHashes: Int): Column =
    Sketch.column(BloomBuild(
      Sketch.expr(org.apache.spark.sql.functions.when(c.isNotNull, xxhash64(c))),
      numBits, numHashes).toAggregateExpression())

  /** Membership of a column's xxhash64 in a serialized filter. */
  def mightContain(bloom: Column, c: Column): Column =
    Sketch.column(BloomMightContain(Sketch.expr(bloom),
      Sketch.expr(org.apache.spark.sql.functions.xxhash64(c))))

  /** OR-merge of already-serialized filters — the re-aggregation tier
    * (stored filter table + today's delta → tomorrow's table, no corpus
    * rescan). Bitwise OR is exact: merged bytes are identical to a rebuild
    * over the union (asserted in BloomSpec). */
  def merge(c: Column): Column =
    Sketch.column(BloomMerge(Sketch.expr(c)).toAggregateExpression())
}

/** `bloom_build(hash64, m, k)` → serialized filter bytes (BinaryType). */
case class BloomBuild(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BloomBuffer] {

  require(numHashes >= 1 && numHashes <= 127, s"numHashes $numHashes outside [1, 127]")
  require(numBits > 0, s"numBits $numBits must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): BloomBuffer = new BloomBuffer(numBits, numHashes)

  override def update(buffer: BloomBuffer, input: InternalRow): BloomBuffer = {
    val h = child.eval(input)
    if (h != null) buffer.add(h.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: BloomBuffer, other: BloomBuffer): BloomBuffer = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: BloomBuffer): Any = serialize(buffer)

  override def serialize(buffer: BloomBuffer): Array[Byte] = {
    val out = new Array[Byte](1 + buffer.bytes.length)
    out(0) = buffer.numHashes.toByte
    System.arraycopy(buffer.bytes, 0, out, 1, buffer.bytes.length)
    out
  }

  override def deserialize(bytes: Array[Byte]): BloomBuffer = {
    val buf = new BloomBuffer((bytes.length - 1) * 8, bytes(0).toInt)
    System.arraycopy(bytes, 1, buf.bytes, 0, buf.bytes.length)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuild =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuild =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomBuild =
    copy(child = newChildren(0))
  override def prettyName: String = "bloom_build"
}

/** `bloom_merge(filterBytes)` → OR-merged serialized filter. The Bloom twin
  * of HllMerge: consumes ALREADY-serialized filters, so a persisted filter
  * table and a fresh delta merge per bucket without touching raw keys.
  * "No sketch seen yet" is a real zero-length sentinel buffer (numBits = 0
  * is invalid for any actual filter), not null — same rationale as
  * HllMerge's p = 0 sentinel. Mixed geometries (different m or k) are a
  * configuration error and fail loudly: OR-ing filters of different sizes
  * silently loses the no-false-negative contract. */
case class BloomMerge(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BloomBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  private def isEmptySentinel(b: BloomBuffer): Boolean = b.numBits == 0

  override def createAggregationBuffer(): BloomBuffer = new BloomBuffer(0, 0)

  private def absorb(buffer: BloomBuffer, bytes: Array[Byte]): BloomBuffer = {
    val in = deserialize(bytes)
    if (isEmptySentinel(buffer)) in
    else {
      require(buffer.numBits == in.numBits && buffer.numHashes == in.numHashes,
        s"cannot merge filters of geometry (m=${buffer.numBits}, k=${buffer.numHashes}) " +
          s"and (m=${in.numBits}, k=${in.numHashes})")
      buffer.merge(in); buffer
    }
  }

  override def update(buffer: BloomBuffer, input: InternalRow): BloomBuffer = {
    val v = child.eval(input)
    if (v == null) buffer else absorb(buffer, v.asInstanceOf[Array[Byte]])
  }

  override def merge(buffer: BloomBuffer, other: BloomBuffer): BloomBuffer =
    if (isEmptySentinel(other)) buffer
    else if (isEmptySentinel(buffer)) other
    else {
      require(buffer.numBits == other.numBits && buffer.numHashes == other.numHashes,
        s"cannot merge filters of geometry (m=${buffer.numBits}, k=${buffer.numHashes}) " +
          s"and (m=${other.numBits}, k=${other.numHashes})")
      buffer.merge(other); buffer
    }

  override def eval(buffer: BloomBuffer): Any = serialize(buffer)

  override def serialize(buffer: BloomBuffer): Array[Byte] =
    if (isEmptySentinel(buffer)) Array.emptyByteArray
    else {
      val out = new Array[Byte](1 + buffer.bytes.length)
      out(0) = buffer.numHashes.toByte
      System.arraycopy(buffer.bytes, 0, out, 1, buffer.bytes.length)
      out
    }
  override def deserialize(bytes: Array[Byte]): BloomBuffer =
    if (bytes.isEmpty) new BloomBuffer(0, 0)
    else {
      val buf = new BloomBuffer((bytes.length - 1) * 8, bytes(0).toInt)
      System.arraycopy(bytes, 1, buf.bytes, 0, buf.bytes.length)
      buf
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomMerge =
    copy(child = newChildren(0))
  override def prettyName: String = "bloom_merge"
}

/** `bloom_might_contain(filterBytes, hash64)` — zero-copy bit probes against
  * the serialized filter (no per-row deserialization: the broadcast filter
  * bytes are read in place). */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(bloom: Any, hash: Any): Any =
    Bloom.mightContainBytes(bloom.asInstanceOf[Array[Byte]], hash.asInstanceOf[Long])

  override protected def withNewChildrenInternal(l: Expression, r: Expression): BloomMightContain =
    copy(left = l, right = r)
  override def prettyName: String = "bloom_might_contain"
}
