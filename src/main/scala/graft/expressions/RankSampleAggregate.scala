package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Canonical mergeable rank/quantile sketch — the distribution-free member
  * of the stored-sketch lifecycle (HLL/KMV/CMS/histogram/bitmap): answers
  * "what value sits at rank q·n" for ANY q with a rank-error guarantee
  * that does not depend on knowing the value domain a priori (the
  * histogram lane's limitation).
  *
  * Design: a bottom-k sample keyed by a per-row uniform hash — each row
  * carries u = hash60(row key) (the md5 convention, SQL-replayable) and
  * the sketch keeps the k entries with the smallest (u, v), plus the total
  * row count n. Quantile estimate = the value at rank ⌈q·m⌉ among the m
  * kept values ordered by value (m = min(k, n)). Because u is a
  * deterministic function of the ROW (not of arrival order), the state is
  * a pure function of the input MULTISET: bottom-k of a union equals
  * bottom-k of the union of bottom-ks, so merged bytes are BIT-IDENTICAL
  * to a direct build over the union — the same md5 merge≡rebuild claim as
  * BitmapAggregate, and the DuckDB oracle can replay the entire sketch
  * (bottom-k window + rank pick) and hash-compare the ESTIMATES
  * themselves, not just claims.
  *
  * Error bound: the kept set is a uniform k-sample of the multiset
  * (probabilistic over the hash), so by the DKW inequality
  * sup_x |F_k(x) − F(x)| ≤ ε with probability 1 − 2e^(−2kε²) — a
  * DISTRIBUTION-FREE rank guarantee: k = 4096 gives ε ≈ 4.2% at
  * δ = 1e−6, for ~64 KB per sketch.
  *
  * A literal KLL compactor hierarchy (Karnin–Lang–Liberty 2016) was
  * REJECTED for this slot on design, not difficulty: KLL's compaction
  * decisions depend on arrival/merge order, so merge ≡ rebuild can never
  * be a canonical-bytes equality and the oracle could replay nothing —
  * both pillars of this codebase's sketch-tier gate. The price is space:
  * KLL reaches rank error ε in O((1/ε)·√log(1/δ)) entries vs O(1/ε²)
  * here — a real difference only when ε ≪ 1% matters; at the lifecycle's
  * operating point (stored per-group sketches, percentile-grade answers)
  * the canonical sample wins on verifiability and loses nothing that
  * matters.
  */
final class RankSampleBuffer(val k: Int) {
  // parallel arrays of (u, v) entries; lazily compacted to bottom-k
  private[expressions] var us: Array[Long] = new Array[Long](math.min(k * 2, 1 << 14))
  private[expressions] var vs: Array[Long] = new Array[Long](math.min(k * 2, 1 << 14))
  private[expressions] var sz: Int = 0
  private[expressions] var n: Long = 0L

  def add(u: Long, v: Long): Unit = {
    if (sz == us.length) {
      compact()
      if (sz >= us.length / 2) {
        us = java.util.Arrays.copyOf(us, us.length * 2)
        vs = java.util.Arrays.copyOf(vs, vs.length * 2)
      }
    }
    us(sz) = u
    vs(sz) = v
    sz += 1
    n += 1
  }

  /** Append another buffer's SURVIVING entries (its bottom-k); counts add. */
  def addMerge(other: RankSampleBuffer): Unit = {
    other.compact()
    var i = 0
    while (i < other.sz) {
      if (sz == us.length) {
        compact()
        if (sz >= us.length / 2) {
          us = java.util.Arrays.copyOf(us, us.length * 2)
          vs = java.util.Arrays.copyOf(vs, vs.length * 2)
        }
      }
      us(sz) = other.us(i)
      vs(sz) = other.vs(i)
      sz += 1
      i += 1
    }
    n += other.n
  }

  /** Sort by (u, v) and truncate to the k smallest entries. Idempotent;
    * ties beyond position k drop deterministically in (u, v) order, so
    * the surviving set is a pure function of the multiset. The sort is a
    * primitive dual-array quicksort — this runs every ~3k·adds on the
    * corpus hot path, where a boxed sortBy costs a tuple + two boxes per
    * entry per compaction. */
  def compact(): Unit = {
    if (sz <= k && isSorted) return
    sortRange(0, sz - 1)
    sz = math.min(sz, k)
  }

  private def less(i: Int, j: Int): Boolean =
    us(i) < us(j) || (us(i) == us(j) && vs(i) < vs(j))

  private def swap(i: Int, j: Int): Unit = {
    val tu = us(i); us(i) = us(j); us(j) = tu
    val tv = vs(i); vs(i) = vs(j); vs(j) = tv
  }

  private def sortRange(lo0: Int, hi0: Int): Unit = {
    var lo = lo0
    var hi = hi0
    while (lo < hi) {
      if (hi - lo < 16) { // insertion sort for small runs
        var i = lo + 1
        while (i <= hi) {
          var j = i
          while (j > lo && less(j, j - 1)) { swap(j, j - 1); j -= 1 }
          i += 1
        }
        return
      }
      // median-of-three pivot to the middle
      val mid = lo + (hi - lo) / 2
      if (less(mid, lo)) swap(mid, lo)
      if (less(hi, lo)) swap(hi, lo)
      if (less(hi, mid)) swap(hi, mid)
      val pu = us(mid); val pv = vs(mid)
      var i = lo
      var j = hi
      while (i <= j) {
        while (us(i) < pu || (us(i) == pu && vs(i) < pv)) i += 1
        while (us(j) > pu || (us(j) == pu && vs(j) > pv)) j -= 1
        if (i <= j) { swap(i, j); i += 1; j -= 1 }
      }
      // recurse into the smaller side, loop on the larger
      if (j - lo < hi - i) { sortRange(lo, j); lo = i }
      else { sortRange(i, hi); hi = j }
    }
  }

  private def isSorted: Boolean = {
    var i = 1
    while (i < sz) {
      if (us(i - 1) > us(i) || (us(i - 1) == us(i) && vs(i - 1) > vs(i))) return false
      i += 1
    }
    true
  }

  /** Canonical wire form: varint n, varint m, then the m entries in
    * (u, v) order — u as non-negative delta varints (hash60 values are
    * < 2^60; equal u repeats as delta 0), v as zigzag varints. */
  def serialize(): Array[Byte] = {
    compact()
    val out = new java.io.ByteArrayOutputStream(sz * 10 + 16)
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0L) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    varint(n)
    varint(sz.toLong)
    var prev = 0L
    var i = 0
    while (i < sz) {
      varint(us(i) - prev)
      prev = us(i)
      varint((vs(i) << 1) ^ (vs(i) >> 63))
      i += 1
    }
    out.toByteArray
  }
}

object RankSampleCodec {
  final class Malformed(msg: String) extends IllegalArgumentException(s"malformed rank sample: $msg")
  private def fail(msg: String): Nothing = throw new Malformed(msg)

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

  /** Decode to (n, sorted (u, v) entries). Strict: m bounded by the
    * payload (each entry costs ≥ 2 bytes), full consumption required. */
  def decode(bytes: Array[Byte]): (Long, Array[Long], Array[Long]) = {
    if (bytes == null || bytes.length == 0) fail("empty input")
    val (n, p1) = readVarint(bytes, 0)
    if (n < 0L) fail("negative count")
    val (mL, p2) = readVarint(bytes, p1)
    if (mL < 0L || mL > n || mL > (bytes.length - p2).toLong / 2L) fail(s"kept count $mL exceeds payload")
    val m = mL.toInt
    val us = new Array[Long](m)
    val vs = new Array[Long](m)
    var p = p2
    var prev = 0L
    var i = 0
    while (i < m) {
      val (du, pa) = readVarint(bytes, p)
      if (du < 0L) fail("negative delta")
      prev += du
      val (zv, pb) = readVarint(bytes, pa)
      us(i) = prev
      vs(i) = (zv >>> 1) ^ -(zv & 1L)
      p = pb
      i += 1
    }
    if (p != bytes.length) fail("trailing bytes")
    (n, us, vs)
  }
}

/** `rank_sample(u, v, k)` → canonical serialized bottom-k rank sample. */
case class RankSampleAgg(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[RankSampleBuffer] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(left, right)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): RankSampleBuffer = new RankSampleBuffer(k)

  override def update(buffer: RankSampleBuffer, input: InternalRow): RankSampleBuffer = {
    val u = left.eval(input)
    val v = right.eval(input)
    if (u != null && v != null) buffer.add(u.asInstanceOf[Long], v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: RankSampleBuffer, other: RankSampleBuffer): RankSampleBuffer = {
    buffer.addMerge(other)
    buffer
  }

  override def eval(buffer: RankSampleBuffer): Any = buffer.serialize()
  override def serialize(buffer: RankSampleBuffer): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): RankSampleBuffer = {
    val buf = new RankSampleBuffer(k)
    val (n, us, vs) = RankSampleCodec.decode(bytes)
    var i = 0
    while (i < us.length) { buf.add(us(i), vs(i)); i += 1 }
    buf.n = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): RankSampleAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): RankSampleAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): RankSampleAgg =
    copy(left = newChildren(0), right = newChildren(1))
  override def prettyName: String = "rank_sample"
}

/** `rank_sample_merge(bytes, k)` → union of stored rank samples. Bottom-k
  * of a union = bottom-k of the union of bottom-ks and the wire form is
  * canonical, so merged bytes ≡ a direct build over the union. */
case class RankSampleMergeAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[RankSampleBuffer] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): RankSampleBuffer = new RankSampleBuffer(k)

  override def update(buffer: RankSampleBuffer, input: InternalRow): RankSampleBuffer = {
    val b = child.eval(input)
    if (b != null) {
      val (n, us, vs) = RankSampleCodec.decode(b.asInstanceOf[Array[Byte]])
      // Same-k contract: a stored sketch must carry m = min(n, k) kept
      // entries. m < k with n > m means it was built at a smaller k'
      // (entries k'+1..k are unrecoverable → merge ≢ rebuild); m > k
      // means a larger k' (recoverable but a contract breach). Fail loud
      // rather than silently emitting bytes that differ from a direct
      // build over the union.
      require(us.length <= k && (us.length == k || n == us.length),
        s"rank_sample_merge(k=$k) fed a sketch with kept=${us.length} of n=$n " +
          "entries - built with a different k; the same-k contract is " +
          "required for merge == rebuild")
      var i = 0
      while (i < us.length) { buffer.add(us(i), vs(i)); i += 1 }
      buffer.n += n - us.length // add() already counted the kept entries
    }
    buffer
  }

  override def merge(buffer: RankSampleBuffer, other: RankSampleBuffer): RankSampleBuffer = {
    buffer.addMerge(other)
    buffer
  }

  override def eval(buffer: RankSampleBuffer): Any = buffer.serialize()
  override def serialize(buffer: RankSampleBuffer): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): RankSampleBuffer = {
    val buf = new RankSampleBuffer(k)
    val (n, us, vs) = RankSampleCodec.decode(bytes)
    var i = 0
    while (i < us.length) { buf.add(us(i), vs(i)); i += 1 }
    buf.n = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): RankSampleMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): RankSampleMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): RankSampleMergeAgg =
    copy(child = newChildren(0))
  override def prettyName: String = "rank_sample_merge"
}

/** `rank_sample_quantile(bytes, qPct)` → the value at 1-based rank
  * ⌈qPct·m/100⌉ among the m kept values ordered by value — the
  * integer-exact rank pick ((qPct·m + 99) div 100) both engines replay
  * identically. NULL on malformed or empty input. */
case class RankSampleQuantile(child: Expression, qPct: Int)
    extends UnaryExpression with CodegenFallback {
  require(qPct >= 1 && qPct <= 100, "qPct in [1, 100]")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override protected def nullSafeEval(b: Any): Any =
    try {
      val (_, _, vs) = RankSampleCodec.decode(b.asInstanceOf[Array[Byte]])
      if (vs.isEmpty) null
      else {
        val sorted = vs.sorted
        val idx = ((qPct.toLong * sorted.length + 99L) / 100L).toInt // ceil, 1-based
        sorted(math.max(idx, 1) - 1)
      }
    } catch { case _: RankSampleCodec.Malformed => null }
  override protected def withNewChildInternal(newChild: Expression): RankSampleQuantile =
    copy(child = newChild)
  override def prettyName: String = "rank_sample_quantile"
}

/** `rank_sample_count(bytes)` → total rows n the sketch has seen (NULL on
  * malformed input). */
case class RankSampleCount(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override protected def nullSafeEval(b: Any): Any =
    try RankSampleCodec.decode(b.asInstanceOf[Array[Byte]])._1
    catch { case _: RankSampleCodec.Malformed => null }
  override protected def withNewChildInternal(newChild: Expression): RankSampleCount =
    copy(child = newChild)
  override def prettyName: String = "rank_sample_count"
}

object RankSample {
  /** Canonical bottom-k rank sample of (u = row hash, v = value). */
  def sketch(u: Column, v: Column, k: Int): Column =
    Sketch.column(RankSampleAgg(
      Sketch.expr(u.cast("long")), Sketch.expr(v.cast("long")), k).toAggregateExpression())

  /** Union of stored rank samples (same k). */
  def merge(c: Column, k: Int): Column =
    Sketch.column(RankSampleMergeAgg(Sketch.expr(c), k).toAggregateExpression())

  /** Sample quantile at qPct percent (integer-exact rank pick). */
  def quantile(c: Column, qPct: Int): Column =
    Sketch.column(RankSampleQuantile(Sketch.expr(c), qPct))

  /** Total rows seen. */
  def count(c: Column): Column = Sketch.column(RankSampleCount(Sketch.expr(c)))
}
