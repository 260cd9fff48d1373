package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native argmax language classifier over a distinct char-n-gram array
  * (the codegen upgrade of TextAnalysis.classifyLanguage's per-language
  * `array_intersect` ladder; SURVEY.md §2.C preference order: compose
  * built-ins > custom Expression > UDF).
  *
  * Why it exists: the composed form evaluates |langs| separate
  * array_intersect calls per row — each a nested scan of the document's
  * gram array against one profile — so the per-row constant is
  * |langs| x |grams| x |profile|-ish. At 100 TB that constant IS the
  * job. This expression inverts the loop: ONE pass over the document's
  * grams against a gram -> [language indices] hash map built once per
  * JVM from the (tiny, driver-fitted) profiles, then an argmax over the
  * |langs| score counters. Semantics are EXACTLY the composed form's
  * (and the DuckDB oracle replay's):
  *
  *  - input grams are pre-distinct (Dedup.charNgrams wraps
  *    array_distinct), so counting lookup hits equals
  *    |grams ∩ profile| — array_intersect's dedup is a no-op there;
  *  - profile gram lists are distinct by construction (GroupTopK rank /
  *    literal fixtures), so one gram increments a language at most once;
  *  - ties: strict `>` while scanning languages in ascending
  *    lexicographic order keeps the FIRST language — the composed
  *    form's struct(score, |langs|-i) array_max tie rule;
  *  - null TEXT is the composed form's behavior exactly: charNgrams on
  *    null text yields the array [null] (greatest(length-2, 1) swallows
  *    the null), every language scores 0, and the first language wins —
  *    null gram ELEMENTS are skipped here for the same score-0 result;
  *    a null gram ARRAY itself (never produced by charNgrams) -> null.
  *
  * The profiles ride the constructor (plain Strings, a few KB — they
  * serialize with the plan like any literal); the lookup structures are
  * transient-lazy per JVM. */
case class LangArgmaxExpr(child: Expression, profiles: Seq[(String, Seq[String])])
    extends UnaryExpression {

  require(profiles.nonEmpty, "lang_argmax needs at least one language profile")
  require(profiles.map(_._1) == profiles.map(_._1).sorted,
    "profiles must be pre-sorted by language for the first-language tie rule")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.sql}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "lang_argmax"

  @transient lazy val langNames: Array[UTF8String] =
    profiles.map(p => UTF8String.fromString(p._1)).toArray

  /** gram -> indices of every language whose profile contains it. */
  @transient lazy val gramToLangs: java.util.HashMap[UTF8String, Array[Int]] = {
    val m = new java.util.HashMap[UTF8String, scala.collection.mutable.ArrayBuffer[Int]]()
    profiles.zipWithIndex.foreach { case ((_, grams), i) =>
      grams.foreach { g =>
        val k = UTF8String.fromString(g)
        val buf = m.get(k)
        if (buf == null) {
          val b = scala.collection.mutable.ArrayBuffer[Int](i)
          m.put(k, b)
        } else buf += i
      }
    }
    val out = new java.util.HashMap[UTF8String, Array[Int]](m.size() * 2)
    m.forEach((k, v) => out.put(k, v.toArray))
    out
  }

  /** Single-pass scoring + argmax; shared by interpreted and codegen'd
    * paths (the map lookups dominate — dispatching into one compiled
    * method keeps the codegen'd plan small instead of inlining it). */
  def score(arr: ArrayData): UTF8String = {
    val scores = new Array[Int](langNames.length)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val hit = gramToLangs.get(arr.getUTF8String(i))
        if (hit != null) {
          var j = 0
          while (j < hit.length) { scores(hit(j)) += 1; j += 1 }
        }
      }
      i += 1
    }
    var best = 0
    var k = 1
    while (k < scores.length) {
      if (scores(k) > scores(best)) best = k
      k += 1
    }
    langNames(best)
  }

  override protected def nullSafeEval(g: Any): Any =
    score(g.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("langArgmax", this, classOf[LangArgmaxExpr].getName)
      s"${ev.value} = $self.score($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LangArgmaxExpr {
  /** Column API entry point; `profiles` must be sorted by language. */
  def langArgmax(grams: Column, profiles: Seq[(String, Seq[String])]): Column =
    Bridge.column(LangArgmaxExpr(Bridge.expression(grams), profiles))
}
