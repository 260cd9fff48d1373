package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst expression for squared L2 distance between a vector
  * column and a (usually literal) centroid vector — the codegen upgrade
  * of Vectors.sqDistTo's per-element expression expansion (SURVEY.md
  * §2.C preference order: compose built-ins > custom Expression > UDF).
  *
  * Why it exists: expanding (x_i − h_i)² per element built k·dim-node
  * expression trees (k=8, dim=64 ⇒ ~4k nodes across the assignment
  * projection), paying Catalyst analysis + Janino compilation on every
  * Lloyd iteration because each iteration's centroid literals differ.
  * This expression is ONE node per centroid with an internal fused loop.
  *
  * Arithmetic parity with the expansion it replaces (and with the SQL
  * oracle's list_reduce replay): the loop accumulates left-to-right in
  * double, iterating over the RIGHT (centroid) length; a left vector
  * shorter than the centroid yields NULL (element_at past the end was
  * null, nulling the whole sum), and extra left components beyond the
  * centroid length are ignored — bit-for-bit the old semantics. */
case class SqL2Expr(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemOk(dt: DataType) = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

  override def dataType: DataType = DoubleType

  // a left vector shorter than the right yields null even over
  // non-null children
  override def nullable: Boolean = true

  override def prettyName: String = "sq_l2"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val h = b.asInstanceOf[ArrayData]
    val n = h.numElements()
    if (x.numElements() < n) return null
    val xf = isFloat(left); val hf = isFloat(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val hv = if (hf) h.getFloat(i).toDouble else h.getDouble(i)
      val d = xv - hv
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val getX = if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getH = if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = $b.numElements();
         |if ($a.numElements() < $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $d = $getX - $getH;
         |    $s += $d * $d;
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SqL2Expr {
  /** Column API entry point. */
  def sqL2(v: Column, cent: Column): Column =
    Bridge.column(SqL2Expr(Bridge.expression(v), Bridge.expression(cent)))
}
