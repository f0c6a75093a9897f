package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels (Jégou, Douze & Schmid 2011, "Product
  * Quantization for Nearest Neighbor Search"): a d-dim vector splits into M
  * subvectors, each quantized to one of ks per-subspace centroids, so the
  * whole vector compresses to M small codes (M=8 × ks=16 → 8 half-byte
  * codes for a 64-float vector — 64× smaller than float32 at rest).
  * Asymmetric-distance computation (ADC) then scores a query against a code
  * WITHOUT reconstructing: the query precomputes its M×ks inner-product
  * table once, and each corpus code costs M array lookups instead of d
  * multiplies — both a storage and a compute tier below IVF/LSH.
  */

/** `pq_encode(vec)` → array<int> of M codes. The input is L2-normalized
  * first (cosine workloads quantize the direction, not the magnitude);
  * each subspace takes the L2-nearest of its ks centroids. The codebook
  * matrix is baked into the plan as a literal — map-only, no join. */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression with CodegenFallback {

  private val m = codebooks.length
  private val sub = codebooks(0)(0).length
  private val ks = codebooks(0).length

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val dim = m * sub
    require(arr.numElements() == dim, s"vector length ${arr.numElements()} != $dim")
    val v = new Array[Double](dim)
    var nrm = 0.0
    var i = 0
    while (i < dim) { val x = arr.getDouble(i); v(i) = x; nrm += x * x; i += 1 }
    nrm = math.sqrt(nrm)
    if (nrm > 0) { i = 0; while (i < dim) { v(i) /= nrm; i += 1 } }
    val codes = new Array[Int](m)
    var mm = 0
    while (mm < m) {
      val cb = codebooks(mm)
      val off = mm * sub
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < ks) {
        val c = cb(j)
        var d = 0.0
        var t = 0
        while (t < sub) { val e = v(off + t) - c(t); d += e * e; t += 1 }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      codes(mm) = best
      mm += 1
    }
    new GenericArrayData(codes)
  }

  override protected def withNewChildInternal(c: Expression): PqEncode =
    copy(child = c)
  override def prettyName: String = "pq_encode"
}

/** `pq_encode_residual(vec, list_id)` → array<int> of M codes over the
  * RESIDUAL v_norm − cents(list_id) — the IVFADC composition (Jégou 2011
  * §IV): the coarse quantizer explains the bulk of the vector and PQ only
  * encodes what is left, so the same code budget carries far more
  * precision than direct encoding. The residual is NOT re-normalized:
  * v_norm = cents(l) + r exactly, which is what makes the search-side
  * decomposition q·v_norm = q·cents(l) + q·r exact up to the PQ error on
  * r alone. Both matrices are plan literals — map-only, no join. */
case class PqEncodeResidual(
    left: Expression,
    right: Expression,
    cents: Array[Array[Double]],
    codebooks: Array[Array[Array[Double]]])
    extends BinaryExpression with CodegenFallback {

  private val m = codebooks.length
  private val sub = codebooks(0)(0).length
  private val ks = codebooks(0).length

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override protected def nullSafeEval(vec: Any, listId: Any): Any = {
    val arr = vec.asInstanceOf[ArrayData]
    val c = cents(listId.asInstanceOf[Int])
    val dim = m * sub
    require(arr.numElements() == dim, s"vector length ${arr.numElements()} != $dim")
    val v = new Array[Double](dim)
    var nrm = 0.0
    var i = 0
    while (i < dim) { val x = arr.getDouble(i); v(i) = x; nrm += x * x; i += 1 }
    nrm = math.sqrt(nrm)
    i = 0
    while (i < dim) {
      v(i) = (if (nrm > 0) v(i) / nrm else v(i)) - c(i)
      i += 1
    }
    val codes = new Array[Int](m)
    var mm = 0
    while (mm < m) {
      val cb = codebooks(mm)
      val off = mm * sub
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < ks) {
        val cc = cb(j)
        var d = 0.0
        var t = 0
        while (t < sub) { val e = v(off + t) - cc(t); d += e * e; t += 1 }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      codes(mm) = best
      mm += 1
    }
    new GenericArrayData(codes)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqEncodeResidual =
    copy(left = l, right = r)
  override def prettyName: String = "pq_encode_residual"
}

/** `pq_adc(codes, table)` — asymmetric-distance score: Σ_m table[m·ks +
  * codes[m]], where `table` is the query's precomputed M×ks inner-product
  * table (row-major array<double> column on the broadcast query frame). */
case class PqAdc(left: Expression, right: Expression, ks: Int)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(codes: Any, table: Any): Any = {
    val cs = codes.asInstanceOf[ArrayData]
    val t = table.asInstanceOf[ArrayData]
    var s = 0.0
    var mm = 0
    val m = cs.numElements()
    while (mm < m) { s += t.getDouble(mm * ks + cs.getInt(mm)); mm += 1 }
    s
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdc =
    copy(left = l, right = r)
  override def prettyName: String = "pq_adc"
}
