package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions.xxhash64
import org.apache.spark.sql.types._

/** HyperLogLog register file: 2^p byte registers, each holding the maximum
  * observed "rank" (leading-zero run + 1 of the hash bits after the p index
  * bits) for the hashes routed to it.
  *
  * This is the distinct-count shape that matters at 100 TB: updates are
  * map-side and O(1), the aggregation buffer is a FIXED 2^p bytes no matter
  * how many rows flow through it, and merge is a register-wise max — so the
  * shuffle carries one 4 KB sketch per (group x map task) instead of the
  * exploded (group, value) pairs an exact count-distinct reshuffles.
  * Register-wise max is also order- and partitioning-invariant, so the
  * estimate is bit-deterministic for a deterministic input hash.
  *
  * Reference behavior being re-expressed: the reader's analytics consumers
  * count distinct keys over CDC streams; the Flajolet et al. HLL estimator
  * (standard bias-corrected form + linear-counting small-range correction;
  * a 64-bit hash needs no large-range correction) is the published
  * construction for doing that in bounded memory.
  */
final class HllBuffer(val p: Int) {
  val m: Int = 1 << p
  val registers: Array[Byte] = new Array[Byte](m)

  /** Route one 64-bit hash: top p bits pick the register, the rest set its
    * rank. */
  def add(hash: Long): Unit = {
    val idx = (hash >>> (64 - p)).toInt
    val rest = hash << p
    val rank =
      if (rest == 0L) 64 - p + 1
      else java.lang.Long.numberOfLeadingZeros(rest) + 1
    if (rank > registers(idx)) registers(idx) = rank.toByte
  }

  def merge(other: HllBuffer): Unit = {
    var i = 0
    while (i < m) {
      if (other.registers(i) > registers(i)) registers(i) = other.registers(i)
      i += 1
    }
  }

  def estimate: Double = {
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      invSum += java.lang.Math.pow(2.0, -registers(i).toDouble)
      if (registers(i) == 0) zeros += 1
      i += 1
    }
    val e = alpha * m.toDouble * m.toDouble / invSum
    // small-range (linear counting) correction; 64-bit hashes make the
    // classic large-range collision correction unnecessary
    if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
    else e
  }
}

/** `hll_distinct(hash64, p)`: approximate distinct count of the (already
  * 64-bit-hashed) child, as a rounded BIGINT. TypedImperativeAggregate, so
  * Spark plans ObjectHashAggregate with a Partial/Final split — the fixed
  * 2^p-byte buffer is what makes the map-side combine free. Standard error
  * ~= 1.04 / sqrt(2^p) (p=12 -> ~1.6%). */
case class HllDistinct(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[HllBuffer] {

  require(p >= 4 && p <= 16, s"precision $p outside [4, 16]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): HllBuffer = new HllBuffer(p)

  override def update(buffer: HllBuffer, input: InternalRow): HllBuffer = {
    val h = child.eval(input)
    if (h != null) buffer.add(h.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: HllBuffer, other: HllBuffer): HllBuffer = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: HllBuffer): Any = math.rint(buffer.estimate).toLong

  override def serialize(buffer: HllBuffer): Array[Byte] = {
    val out = new Array[Byte](1 + buffer.m)
    out(0) = buffer.p.toByte
    System.arraycopy(buffer.registers, 0, out, 1, buffer.m)
    out
  }

  override def deserialize(bytes: Array[Byte]): HllBuffer = {
    val buf = new HllBuffer(bytes(0).toInt)
    System.arraycopy(bytes, 1, buf.registers, 0, buf.m)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HllDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllDistinct =
    copy(child = newChildren(0))
  override def prettyName: String = "hll_distinct"
}

object Hll {
  /** Approximate distinct count of any column: deterministic xxhash64 in
    * front of the register file, so the estimate is reproducible run to run
    * and partitioning-invariant. NULLs are excluded like count(DISTINCT x)
    * excludes them — xxhash64 itself maps NULL to the seed (a real hash
    * value), so the null gate must happen BEFORE hashing or every NULL
    * would count as one extra distinct value. */
  def approxCountDistinct(c: Column, p: Int = 12): Column =
    Sketch.column(HllDistinct(
      Sketch.expr(org.apache.spark.sql.functions.when(c.isNotNull, xxhash64(c))),
      p).toAggregateExpression())

  /** The sketch ITSELF (serialized register file) — for pre-aggregated
    * sketch tables: store one per (group, day), merge any window later. */
  def sketch(c: Column, p: Int = 12): Column =
    Sketch.column(HllSketchBytes(
      Sketch.expr(org.apache.spark.sql.functions.when(c.isNotNull, xxhash64(c))),
      p).toAggregateExpression())

  /** Merge stored sketches (register-wise max — associative, commutative,
    * idempotent: merging daily sketches yields BIT-IDENTICAL registers to
    * sketching the union directly, which `sketch_reaggregate` asserts). */
  def merge(sketches: Column): Column =
    Sketch.column(HllMerge(Sketch.expr(sketches)).toAggregateExpression())

  /** Estimate from a serialized sketch. */
  def estimate(sketchBytes: Column): Column =
    Sketch.column(HllEstimate(Sketch.expr(sketchBytes)))
}

/** `hll_sketch(hash64, p)` → serialized register file (BinaryType). */
case class HllSketchBytes(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[HllBuffer] {

  require(p >= 4 && p <= 16, s"precision $p outside [4, 16]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): HllBuffer = new HllBuffer(p)

  override def update(buffer: HllBuffer, input: InternalRow): HllBuffer = {
    val h = child.eval(input)
    if (h != null) buffer.add(h.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: HllBuffer, other: HllBuffer): HllBuffer = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: HllBuffer): Any = serialize(buffer)

  override def serialize(buffer: HllBuffer): Array[Byte] = HllCodec.ser(buffer)
  override def deserialize(bytes: Array[Byte]): HllBuffer = HllCodec.de(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketchBytes =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketchBytes =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllSketchBytes =
    copy(child = newChildren(0))
  override def prettyName: String = "hll_sketch"
}

/** `hll_merge(sketchBytes)` → merged serialized sketch (register-wise max
  * over already-serialized register files — the re-aggregation tier). */
case class HllMerge(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[HllBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  // p is discovered from the first input sketch. "No sketch seen yet" is a
  // REAL sentinel buffer with p = 0 (an invalid precision for any actual
  // sketch, so unambiguous) rather than null: TypedImperativeAggregate
  // makes no promise that the framework never touches the buffer object,
  // and a null there is a latent NPE across Spark upgrades. An empty group
  // evals to the canonical empty p=4 sketch (no inputs to infer p from).
  private def isEmptySentinel(buffer: HllBuffer): Boolean = buffer.p == 0

  override def createAggregationBuffer(): HllBuffer = new HllBuffer(0)

  private def absorb(buffer: HllBuffer, bytes: Array[Byte]): HllBuffer = {
    val in = HllCodec.de(bytes)
    if (isEmptySentinel(buffer)) in
    else {
      require(buffer.p == in.p, s"cannot merge sketches of precision ${buffer.p} and ${in.p}")
      buffer.merge(in); buffer
    }
  }

  override def update(buffer: HllBuffer, input: InternalRow): HllBuffer = {
    val v = child.eval(input)
    if (v == null) buffer else absorb(buffer, v.asInstanceOf[Array[Byte]])
  }

  override def merge(buffer: HllBuffer, other: HllBuffer): HllBuffer =
    if (isEmptySentinel(other)) buffer
    else if (isEmptySentinel(buffer)) other
    else { buffer.merge(other); buffer }

  override def eval(buffer: HllBuffer): Any =
    HllCodec.ser(if (isEmptySentinel(buffer)) new HllBuffer(4) else buffer)

  override def serialize(buffer: HllBuffer): Array[Byte] =
    if (isEmptySentinel(buffer)) Array.emptyByteArray else HllCodec.ser(buffer)
  override def deserialize(bytes: Array[Byte]): HllBuffer =
    if (bytes.isEmpty) new HllBuffer(0) else HllCodec.de(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): HllMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllMerge =
    copy(child = newChildren(0))
  override def prettyName: String = "hll_merge"
}

/** `hll_estimate(sketchBytes)` → rounded BIGINT estimate. */
case class HllEstimate(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    math.rint(HllCodec.de(input.asInstanceOf[Array[Byte]]).estimate).toLong

  override protected def withNewChildInternal(newChild: Expression): HllEstimate =
    copy(child = newChild)
  override def prettyName: String = "hll_estimate"
}

/** Shared register-file wire format: [p][registers x 2^p]. */
private[expressions] object HllCodec {
  def ser(buffer: HllBuffer): Array[Byte] = {
    val out = new Array[Byte](1 + buffer.m)
    out(0) = buffer.p.toByte
    System.arraycopy(buffer.registers, 0, out, 1, buffer.m)
    out
  }
  def de(bytes: Array[Byte]): HllBuffer = {
    val buf = new HllBuffer(bytes(0).toInt)
    System.arraycopy(bytes, 1, buf.registers, 0, buf.m)
    buf
  }
}
