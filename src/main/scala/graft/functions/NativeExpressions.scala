package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}
import graft.kernels.Kernels

/** Native Catalyst expressions for the hot pair-metric path.
  *
  * A Scala UDF converts each ArrayData argument into a boxed
  * scala.collection.Seq per call; at millions of pairs per task that
  * conversion dominates the O(sz·r) DTW itself. These expressions read
  * the primitive `ArrayData.toDoubleArray` buffers directly
  * (SURVEY §4.2: "Expression... to avoid Row↔Scala UDF ser/de in the
  * n²-pair hot loop"). CodegenFallback is fine: the eval does one
  * virtual call per pair, the DP loop is already compiled Scala.
  */
case class DtwExpression(left: Expression, right: Expression, radius: Int)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "ts_dtw_native"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.dtwFlat(a.asInstanceOf[ArrayData].toDoubleArray(),
      b.asInstanceOf[ArrayData].toDoubleArray(), radius)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** LB_Keogh against a precomputed envelope (low, up) — cheap O(sz) bound
  * evaluated per pair before the exact DTW. */
case class LbKeoghExpression(query: Expression, low: Expression, up: Expression)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(query, low, up)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "ts_lb_keogh_native"
  override def eval(input: InternalRow): Any = {
    val q = query.eval(input); val lo = low.eval(input); val hi = up.eval(input)
    if (q == null || lo == null || hi == null) null
    else {
      val qa = q.asInstanceOf[ArrayData].toDoubleArray()
      val la = lo.asInstanceOf[ArrayData].toDoubleArray()
      val ua = hi.asInstanceOf[ArrayData].toDoubleArray()
      var s = 0.0; var i = 0
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
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(query = cs(0), low = cs(1), up = cs(2))
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
