package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}
import graft.kernels.Kernels

/** Static entry points for generated code: Janino-compiled expressions
  * call these through the Scala object's static forwarders, so the DP
  * kernels run on primitive arrays with zero boxing on either side. */
object NativeOps {
  def dtw(a: ArrayData, b: ArrayData, radius: Int): Double =
    Kernels.dtwFlat(a.toDoubleArray(), b.toDoubleArray(), radius)

  def lbKeogh(q: ArrayData, lo: ArrayData, hi: ArrayData): Double = {
    val qa = q.toDoubleArray()
    val la = lo.toDoubleArray()
    val ua = hi.toDoubleArray()
    var s = 0.0
    var i = 0
    val n = math.min(qa.length, math.min(la.length, ua.length))
    while (i < n) {
      val v = qa(i)
      if (v > ua(i)) { val d = v - ua(i); s += d * d }
      else if (v < la(i)) { val d = la(i) - v; s += d * d }
      i += 1
    }
    math.sqrt(s)
  }
}

/** Native Catalyst expressions for the hot pair-metric path.
  *
  * A Scala UDF converts each ArrayData argument into a boxed
  * scala.collection.Seq per call; at millions of pairs per task that
  * conversion dominates the O(sz·r) DTW itself. These expressions read
  * the primitive `ArrayData.toDoubleArray` buffers directly
  * (SURVEY §4.2) and implement `doGenCode` as a static call into
  * [[NativeOps]], so they stay INSIDE whole-stage codegen spans instead
  * of forcing the CodegenFallback interpreted boundary.
  */
case class DtwExpression(left: Expression, right: Expression, radius: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "ts_dtw_native"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    NativeOps.dtw(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], radius)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.NativeOps.dtw($a, $b, $radius);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** LB_Keogh against a precomputed envelope (low, up) — cheap O(sz) bound
  * evaluated per pair before the exact DTW. */
case class LbKeoghExpression(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "ts_lb_keogh_native"
  override protected def nullSafeEval(q: Any, lo: Any, hi: Any): Any =
    NativeOps.lbKeogh(q.asInstanceOf[ArrayData], lo.asInstanceOf[ArrayData],
      hi.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, lo, hi) =>
      s"${ev.value} = graft.functions.NativeOps.lbKeogh($q, $lo, $hi);")
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
                                                 t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

object NativeExpressions {
  /** DTW as a native expression; radius < 0 = unconstrained. */
  def dtwNative(a: Column, b: Column, radius: Int = -1): Column =
    GraftColumnBridge.column(DtwExpression(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b), radius))

  def lbKeoghNative(q: Column, low: Column, up: Column): Column =
    GraftColumnBridge.column(LbKeoghExpression(
      GraftColumnBridge.expression(q), GraftColumnBridge.expression(low),
      GraftColumnBridge.expression(up)))
}
