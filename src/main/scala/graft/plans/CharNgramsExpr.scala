package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct character-n-gram extractor — the codegen upgrade of
  * the `array_distinct(transform(sequence(...), i -> substring(...)))`
  * composition (Dedup.charNgrams). Higher-order-function lambdas are
  * interpreted per ELEMENT in Spark — at corpus scale the per-character
  * Catalyst dispatch dominated the language-ID fit (measured 29.6 s at
  * sf≈1, ~all of it in the trigram explode). This is one compiled pass
  * per row.
  *
  * Exact parity with the composed form (pinned by the langid/simhash/
  * ngram-jaccard DuckDB oracles that replay its mechanics):
  *  - positions 1..max(numChars-(n-1), 1), SQL substring semantics —
  *    CHARACTER-based (multibyte safe via UTF8String.substringSQL), so
  *    text shorter than n yields ONE truncated gram (empty text: [""]);
  *  - distinct with first-occurrence order (array_distinct's order);
  *  - null text -> the single-element array [null]: the composed form's
  *    greatest(null, 1) swallows the null length, and substring(null)
  *    nulls the one element, NOT the array. Output is therefore never
  *    null (nullable = false), matching the composition. */
case class CharNgramsExpr(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"char_ngrams needs n >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = "char_ngrams"

  /** One-pass distinct n-gram extraction; shared by interpreted and
    * codegen'd paths. */
  def ngrams(s: UTF8String): ArrayData = {
    if (s == null) return new GenericArrayData(Array[Any](null))
    val len = s.numChars()
    val m = math.max(len - (n - 1), 1)
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 1
    while (i <= m) {
      seen.add(s.substringSQL(i, n))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]].asInstanceOf[Array[Any]])
  }

  override def eval(input: InternalRow): Any =
    ngrams(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("charNgrams", this, classOf[CharNgramsExpr].getName)
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        ${classOf[ArrayData].getName} ${ev.value} =
          $self.ngrams(${childGen.isNull} ? null : ${childGen.value});
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharNgramsExpr {
  /** Column API entry point. */
  def charNgrams(text: Column, n: Int): Column =
    Bridge.column(CharNgramsExpr(Bridge.expression(text), n))
}
