package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Native one-pass int8 quantization over a vector column — the codegen
  * upgrade of the `array_max(transform(abs)) -> transform(floor(x*s+.5))`
  * composition in Vectors.quantizeInt8.
  *
  * Why it exists: the composed form's `scale` alias is a non-cheap
  * expression, and CollapseProject re-inlines it into whichever lambda
  * consumes it downstream — each ELEMENT then re-evaluates the
  * whole-vector max, O(dim²) interpreted work per row (the operator's
  * scaladoc documents the posexplode instance of this hazard; measured
  * 11.6 s vs 0.9 s at sf≈1 for quantized_topk when a consumer's
  * projection collapsed into the quantize tree). These expressions are
  * O(dim) by construction — the max and the codes are computed in ONE
  * compiled pass per row — and nothing Catalyst rewrites can re-inline.
  *
  * Parity with the composition (and the DuckDB quantizeSql replay):
  *  - maxAbs = max over abs(x_i as double), null elements skipped, and
  *    Spark's array_max NaN-ordering (NaN greater than everything);
  *  - scale = 127.0/maxAbs when maxAbs > 0 (plain double comparison —
  *    false for NaN), else 0.0; null vector -> null;
  *  - codes_i = floor(x_i * scale + 0.5) with Spark floor-on-double
  *    semantics (result LONG; null elements stay null). */
private[plans] object Quantize8 {
  def maxAbs(v: ArrayData, isFloat: Boolean): Double = {
    val n = v.numElements()
    var best = Double.NaN
    var seen = false
    var i = 0
    while (i < n) {
      if (!v.isNullAt(i)) {
        val x = math.abs(if (isFloat) v.getFloat(i).toDouble else v.getDouble(i))
        // array_max ordering: NaN is the greatest element
        if (!seen || java.lang.Double.isNaN(x) ||
            (!java.lang.Double.isNaN(best) && x > best)) best = x
        seen = true
      }
      i += 1
    }
    if (seen) best else Double.NaN // NaN marks "no non-null element" (-> scale 0)
  }

  def scaleOf(v: ArrayData, isFloat: Boolean): Double = {
    val m = maxAbs(v, isFloat)
    if (m > 0) 127.0 / m else 0.0 // NaN > 0 is false -> 0.0, as in `when`
  }
}

case class Int8ScaleExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> input, got ${other.sql}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "int8_scale"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  def score(v: ArrayData): Double = Quantize8.scaleOf(v, isFloat)

  override protected def nullSafeEval(v: Any): Any =
    score(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("int8scale", this, classOf[Int8ScaleExpr].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.score($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class Int8CodesExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> input, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "int8_codes"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  def codes(v: ArrayData): ArrayData = {
    val f = isFloat
    val scale = Quantize8.scaleOf(v, f)
    val n = v.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!v.isNullAt(i)) {
        val x = if (f) v.getFloat(i).toDouble else v.getDouble(i)
        out(i) = math.floor(x * scale + 0.5).toLong
      } // else null stays
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(v: Any): Any =
    codes(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("int8codes", this, classOf[Int8CodesExpr].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.codes($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Quantize8Expr {
  def scale8(v: Column): Column = Bridge.column(Int8ScaleExpr(Bridge.expression(v)))
  def codes8(v: Column): Column = Bridge.column(Int8CodesExpr(Bridge.expression(v)))
}
