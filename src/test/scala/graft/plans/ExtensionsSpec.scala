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

  test("sketch aggregates are callable from SQL via the extension's own builders") {
    val spark = graft.SparkSpec.session
    // register the extension's OWN builders (literal-arg extraction and
    // all) straight into the session's registry — same code path a
    // .withExtensions session runs
    val reg = spark.sessionState.functionRegistry
    GraftExtensions.functions.foreach { case (id, info, builder) =>
      reg.registerFunction(id, info, builder)
    }
    spark.range(100).createOrReplaceTempView("ext_nums2")
    // decimal-literal probs (SQL `array(0.25, 0.75)` folds to Decimals)
    val qs = spark.sql(
      "SELECT kll_quantiles(CAST(id AS DOUBLE), array(0.25, 0.75), 200) FROM ext_nums2")
      .head.getSeq[Double](0)
    assert(qs.length === 2 && qs(0) < qs(1))
    assert(qs(0) >= 15.0 && qs(0) <= 35.0 && qs(1) >= 65.0 && qs(1) <= 85.0)
    // kmv: 5 smallest of 0..99 (identity "hash" is fine for the shape test)
    val kmv = spark.sql("SELECT kmv_sketch(id, 5) FROM ext_nums2").head.getSeq[Long](0)
    assert(kmv === (0L until 5L))
    // freq_items: clear heavy survives a capacity-4 sketch
    val terms = spark.sql(
      """SELECT freq_items(t, 4) FROM (
        | SELECT CASE WHEN id % 3 = 0 THEN 'heavy' ELSE CONCAT('w', id) END AS t
        | FROM ext_nums2)""".stripMargin).head
      .getSeq[org.apache.spark.sql.Row](0)
    assert(terms.map(_.getString(0)).contains("heavy"))
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
