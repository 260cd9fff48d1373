package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.core.Nested

/** Custom-expression SQL registration + nested-map helper. (A session
  * truly built `.withExtensions` can't coexist with the shared test
  * session in one JVM — getOrCreate reuses it — so the SQL path is tested
  * through the same FunctionRegistry injection the extension performs.) */
class ExtensionsSpec extends AnyFunSuite {

  test("cosine_similarity is callable from SQL once registered") {
    val spark = graft.SparkSpec.session
    // the same builder GraftExtensions injects
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions {})
    spark.sessionState.functionRegistry.registerFunction(
      new FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarityExpr].getCanonicalName, "cosine_similarity"),
      exprs => CosineSimilarityExpr(exprs.head, exprs(1)))
    val v = spark.sql(
      "SELECT cosine_similarity(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)), " +
        "array(CAST(4.0 AS FLOAT), CAST(3.0 AS FLOAT)))").head().getDouble(0)
    assert(math.abs(v - 24.0 / 25.0) < 1e-15)
  }

  test("keyExists probes nested maps (tools.py:120-129)") {
    val m = Map("a" -> Map("b" -> Map("c" -> 1)))
    assert(Nested.keyExists(m, "a", "b", "c"))
    assert(Nested.keyExists(m, "a"))
    assert(!Nested.keyExists(m, "a", "x"))
    assert(!Nested.keyExists(m, "z"))
    assert(!Nested.keyExists(1, "a"))
  }
}
