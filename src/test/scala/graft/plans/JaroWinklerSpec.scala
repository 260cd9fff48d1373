package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** JaroWinklerExpr: textbook values, the DuckDB-variant conventions
  * (0.7 boost threshold, empty→0), and codegen/interpreted parity. */
class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  private val eps = 1e-12

  test("textbook pairs match the published values") {
    assert(math.abs(JaroWinkler.similarity("MARTHA", "MARHTA") - 0.9611111111111111) < eps)
    assert(math.abs(JaroWinkler.similarity("DWAYNE", "DUANE") - 0.84) < eps)
    assert(math.abs(JaroWinkler.similarity("DIXON", "DICKSONX") - 0.8133333333333332) < eps)
  }

  test("below the 0.7 threshold no prefix boost applies") {
    // jaro(DWAYNE, DIXON) = 0.5777…; shared prefix 'D' must NOT boost
    assert(math.abs(JaroWinkler.similarity("DWAYNE", "DIXON") - 0.5777777777777778) < eps)
  }

  test("edge conventions match DuckDB: empty→0 (even both-empty), equal→1") {
    assert(JaroWinkler.similarity("", "") === 0.0)
    assert(JaroWinkler.similarity("", "abc") === 0.0)
    assert(JaroWinkler.similarity("abc", "") === 0.0)
    assert(JaroWinkler.similarity("abc", "abc") === 1.0)
    assert(JaroWinkler.similarity("a", "b") === 0.0) // no matches
  }

  test("prefix boost caps at 4 shared characters") {
    // 5 shared prefix chars, then divergence: boost must use p=4
    val s1 = "abcdeXY"; val s2 = "abcdeZW"
    val j = {
      // jaro by hand: m=5, t=0 → (5/7 + 5/7 + 1)/3
      (5.0 / 7 + 5.0 / 7 + 1.0) / 3
    }
    assert(math.abs(JaroWinkler.similarity(s1, s2) - (j + 4 * 0.1 * (1 - j))) < eps)
  }

  test("expression matches the scalar under codegen and survives nulls") {
    val df = Seq(("MARTHA", "MARHTA"), ("DWAYNE", "DUANE"), (null, "x"), ("x", null))
      .toDF("a", "b")
      .withColumn("jw", JaroWinklerExpr.jaroWinkler(col("a"), col("b")))
    val got = df.select("jw").collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got(0).exists(v => math.abs(v - 0.9611111111111111) < eps))
    assert(got(1).exists(v => math.abs(v - 0.84) < eps))
    assert(got(2).isEmpty && got(3).isEmpty)
  }

  test("filter pushes through whole-stage codegen (smoke: plan executes fused)") {
    val df = (1 to 100).map(i => (s"Customer#$i", s"Customer#${i + 1}")).toDF("a", "b")
      .filter(JaroWinklerExpr.jaroWinkler(col("a"), col("b")) >= 0.9)
    assert(df.count() > 0)
  }
}
