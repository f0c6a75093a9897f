package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-min sketch: approximate per-item frequencies in FIXED
  * depth x width memory — the heavy-hitters shape for a heavy-tailed token
  * vocabulary where an exact `groupBy(token).count()` keeps one partial-agg
  * entry per distinct token (web-scale corpora have billions).
  *
  * Each row adds 1 to one counter per sketch row; `estimate` reads the MIN
  * across rows (collisions only inflate, so est >= exact always, and
  * est <= exact + eps*N with eps ~ e/width at confidence 1 - e^-depth).
  * Merge is element-wise ADD — associative, commutative, partitioning-
  * invariant, exactly like the HLL register max and the Bloom OR.
  *
  * Bit derivation is Kirsch-Mitzenmacher over the item's md5:
  * h1 = hex[1..15], h2 = hex[17..31]*2+1 (odd), idx_j = (h1 + j*h2) % width
  * — all of it plain SQL, so the DuckDB oracle REPLAYS the whole sketch and
  * the driver hash-compares the estimates themselves rather than trusting a
  * claim. Depth is capped at 4: h1 < 2^60 and h2 < 2^61, so j <= 3 keeps
  * h1 + j*h2 < 2^63 on both engines — at j = 4 the sum can overflow signed
  * 64-bit (a negative index on the JVM, a hard error in DuckDB). Depth 4 is
  * also the standard operating point (confidence 1 - e^-4 ~ 98%).
  */
object CountMin {
  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** (h1, h2) from the item's md5 — the SQL-replayable pair. The first 15
    * hex chars are the big-endian first 8 bytes shifted right a nibble
    * (ditto chars 17-31 for the second half), so both halves come straight
    * off the digest bytes: no hex-string materialization, no per-row
    * formatter garbage on the sketch hot path. Equality with the hex
    * formulation is pinned against DuckDB constants in CountMinSpec. */
  def hashPair(item: String): (Long, Long) = {
    val d = md5.get()
    d.reset()
    val bytes = d.digest(item.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    def be(off: Int): Long = {
      var v = 0L
      var i = 0
      while (i < 8) { v = (v << 8) | (bytes(off + i) & 0xffL); i += 1 }
      v
    }
    (be(0) >>> 4, (be(8) >>> 4) * 2 + 1)
  }

  def sketch(c: Column, depth: Int, width: Int): Column =
    Sketch.column(CountMinBuild(Sketch.expr(c), depth, width).toAggregateExpression())

  def estimate(sketchBytes: Column, c: Column): Column =
    Sketch.column(CountMinQuery(Sketch.expr(sketchBytes), Sketch.expr(c)))

  def innerProduct(a: Column, b: Column): Column =
    Sketch.column(CountMinInner(Sketch.expr(a), Sketch.expr(b)))

  def merge(sketches: Column): Column =
    Sketch.column(CountMinMerge(Sketch.expr(sketches)).toAggregateExpression())
}

final class CountMinBuffer(val depth: Int, val width: Int) {
  val counters: Array[Long] = new Array[Long](depth * width)

  def add(item: String): Unit = {
    val (h1, h2) = CountMin.hashPair(item)
    var j = 0
    while (j < depth) {
      counters(j * width + ((h1 + j.toLong * h2) % width).toInt) += 1L
      j += 1
    }
  }

  def merge(other: CountMinBuffer): Unit = {
    var i = 0
    while (i < counters.length) {
      counters(i) += other.counters(i)
      i += 1
    }
  }
}

/** `count_min(item, depth, width)` → serialized counters (BinaryType). */
case class CountMinBuild(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CountMinBuffer] {

  require(depth >= 1 && depth <= 4,
    s"depth $depth outside [1, 4] — j*h2 overflows 64-bit past depth 4 (see scaladoc)")
  require(width >= 16, s"width $width < 16")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): CountMinBuffer = new CountMinBuffer(depth, width)

  override def update(buffer: CountMinBuffer, input: InternalRow): CountMinBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: CountMinBuffer, other: CountMinBuffer): CountMinBuffer = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: CountMinBuffer): Any = serialize(buffer)

  override def serialize(buffer: CountMinBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + buffer.counters.length * 8)
    bb.putInt(buffer.depth).putInt(buffer.width)
    buffer.counters.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CountMinBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new CountMinBuffer(bb.getInt, bb.getInt)
    var i = 0
    while (i < buf.counters.length) { buf.counters(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinBuild =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinBuild =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinBuild =
    copy(child = newChildren(0))
  override def prettyName: String = "count_min"
}

/** `count_min_merge(sketchBytes)` → merged serialized sketch (element-wise
  * counter ADD). The CMS leg of the stored-sketch lifecycle the HLL
  * (hll_merge) and Bloom (bloom_merge) tiers already have: daily sketch
  * tables answer any window by merging stored sketches — addition is
  * associative/commutative, so the merged sketch is BIT-identical to
  * sketching the union, and raw data is never rescanned. Shape discovery
  * and the empty-group sentinel follow HllMerge (a depth=0 sentinel buffer
  * rather than null — TypedImperativeAggregate makes no promise the
  * framework never touches the buffer). */
case class CountMinMerge(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CountMinBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  private def isEmptySentinel(buffer: CountMinBuffer): Boolean = buffer.depth == 0

  override def createAggregationBuffer(): CountMinBuffer = new CountMinBuffer(0, 0)

  private def absorb(buffer: CountMinBuffer, bytes: Array[Byte]): CountMinBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val in = new CountMinBuffer(bb.getInt, bb.getInt)
    var i = 0
    while (i < in.counters.length) { in.counters(i) = bb.getLong; i += 1 }
    if (isEmptySentinel(buffer)) in
    else {
      require(buffer.depth == in.depth && buffer.width == in.width,
        s"cannot merge ${buffer.depth}x${buffer.width} with ${in.depth}x${in.width}")
      buffer.merge(in); buffer
    }
  }

  override def update(buffer: CountMinBuffer, input: InternalRow): CountMinBuffer = {
    val v = child.eval(input)
    if (v == null) buffer else absorb(buffer, v.asInstanceOf[Array[Byte]])
  }

  override def merge(buffer: CountMinBuffer, other: CountMinBuffer): CountMinBuffer =
    if (isEmptySentinel(other)) buffer
    else if (isEmptySentinel(buffer)) other
    else { buffer.merge(other); buffer }

  override def eval(buffer: CountMinBuffer): Any = serialize(buffer)

  override def serialize(buffer: CountMinBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + buffer.counters.length * 8)
    bb.putInt(buffer.depth).putInt(buffer.width)
    buffer.counters.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CountMinBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new CountMinBuffer(bb.getInt, bb.getInt)
    var i = 0
    while (i < buf.counters.length) { buf.counters(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinMerge =
    copy(child = newChildren(0))
  override def prettyName: String = "count_min_merge"
}

/** `count_min_estimate(sketchBytes, item)` — min counter across rows. */
case class CountMinQuery(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(sketch: Any, item: Any): Any = {
    val bb = java.nio.ByteBuffer.wrap(sketch.asInstanceOf[Array[Byte]])
    val depth = bb.getInt
    val width = bb.getInt
    val (h1, h2) = CountMin.hashPair(item.asInstanceOf[UTF8String].toString)
    var best = Long.MaxValue
    var j = 0
    while (j < depth) {
      val c = bb.getLong(8 + (j * width + ((h1 + j.toLong * h2) % width).toInt) * 8)
      if (c < best) best = c
      j += 1
    }
    best
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CountMinQuery =
    copy(left = l, right = r)
  override def prettyName: String = "count_min_estimate"
}

/** `count_min_inner(a, b)` — equi-join cardinality estimate from two
  * sketches built with the SAME (depth, width) over each side's join key:
  * the minimum over rows of the counter inner product (the AMS/count-min
  * inner-product estimator, Cormode & Muthukrishnan 2005 §4.2).
  *
  * Matching keys hash to the same cell in every row, so each row's product
  * Σ_i A_j[i]·B_j[i] ≥ Σ_k a_k·b_k = |A ⋈ B| — collisions only ADD cross
  * terms, making the estimate one-sided (est ≥ exact always), with
  * est ≤ exact + (e/width)·N_A·N_B at confidence 1 − e^−depth.
  *
  * The scale point: join size drives the broadcast-vs-shuffle and skew
  * decisions a planner makes, and this answers it WITHOUT executing the
  * join — two independent fixed-size aggregates (one per table, map-side
  * combined, never co-shuffled) and one O(depth·width) driver-side fold.
  * Overflow headroom: each product term < (N_A/width)·N_B·width = N_A·N_B
  * summed across a row, so rows stay inside signed 64-bit until
  * N_A·N_B ≈ 9.2e18 — beyond any real table pair at 100 TB.
  */
case class CountMinInner(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val ba = java.nio.ByteBuffer.wrap(a.asInstanceOf[Array[Byte]])
    val bb = java.nio.ByteBuffer.wrap(b.asInstanceOf[Array[Byte]])
    val depth = ba.getInt
    val width = ba.getInt
    val depthB = bb.getInt
    val widthB = bb.getInt
    require(depth == depthB && width == widthB,
      s"sketch shape mismatch: ${depth}x$width vs ${depthB}x$widthB")
    var best = Long.MaxValue
    var j = 0
    while (j < depth) {
      var s = 0L
      var i = 0
      while (i < width) {
        val off = 8 + (j * width + i) * 8
        s += ba.getLong(off) * bb.getLong(off)
        i += 1
      }
      if (s < best) best = s
      j += 1
    }
    best
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CountMinInner =
    copy(left = l, right = r)
  override def prettyName: String = "count_min_inner"
}
