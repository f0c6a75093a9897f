package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType}

/** Space-filling-curve keys for storage layout.
  *
  * `HilbertIndex` maps a (x, y) cell of the 4096×4096 grid to its position
  * on the order-12 Hilbert curve (Hilbert 1891; the iterative xy→d walk is
  * the standard public formulation). Versus the Morton/Z key
  * (layout_zorder), the Hilbert curve has the UNIT-STEP property —
  * consecutive curve positions are always grid neighbors, where Z-order
  * takes long diagonal jumps at power-of-two boundaries — so range blocks
  * of the curve tile the plane in tighter clusters and per-file min/max
  * boxes are smaller for the same file count. The loop is 12 fixed
  * iterations of integer compare/add — a per-row kernel, NOT a Column
  * fold: building it declaratively doubles the expression tree per level
  * (the rotate step references both coordinates), and CollapseProject
  * would inline ~3^12 nodes into one projection.
  */
case class HilbertIndex(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(xv: Any, yv: Any): Any = {
    var x = xv.asInstanceOf[Long]
    var y = yv.asInstanceOf[Long]
    require(x >= 0 && x < 4096 && y >= 0 && y < 4096,
      s"HilbertIndex input ($x, $y) outside the 4096x4096 grid")
    var d = 0L
    var s = 2048L
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) {
          x = 4095L - x
          y = 4095L - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): HilbertIndex =
    copy(left = l, right = r)
  override def prettyName: String = "hilbert_index"
}

object Spatial {
  def hilbert(x: Column, y: Column): Column =
    Sketch.column(HilbertIndex(Sketch.expr(x), Sketch.expr(y)))

  /** Inverse walk d→(x, y) for the order-12 curve — used by the spec to
    * prove bijectivity and the unit-step property independently of the
    * forward kernel. */
  def d2xy(d0: Long): (Long, Long) = {
    var rx = 0L; var ry = 0L
    var x = 0L; var y = 0L
    var t = d0
    var s = 1L
    while (s < 4096) {
      rx = 1L & (t / 2)
      ry = 1L & (t ^ rx)
      // rotate
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s *= 2
    }
    (x, y)
  }
}
