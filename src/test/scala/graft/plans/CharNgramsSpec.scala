package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** CharNgramsExpr: exact parity with the HOF composition it replaced
  * (array_distinct over transform/sequence/substring), including the
  * short-text truncation, empty text, null text, multibyte characters,
  * and first-occurrence order. */
class CharNgramsSpec extends SparkSpec {
  import spark.implicits._

  /** The pre-round-11 composition, verbatim — the parity oracle. */
  private def composed(text: org.apache.spark.sql.Column, n: Int) =
    array_distinct(
      transform(sequence(lit(1), greatest(length(text) - (n - 1), lit(1))),
        i => substring(text, i, lit(n))))

  private def cases: DataFrame = Seq(
    Option("abcdef"),
    Option("aaaa"),          // collapsing duplicates, order preserved
    Option("ab"),            // shorter than n: one truncated gram
    Option("a"),
    Option(""),              // empty: [""]
    Option("日本語のテキスト"),  // multibyte: character semantics
    Option("ααββγγ"),
    Option.empty[String]     // null text: [null], not null array
  ).toDF("text")

  test("parity with the composed form across edge cases, n = 2..4") {
    for (n <- 2 to 4) {
      val rows = cases.select(
        composed(col("text"), n).as("old"),
        graft.operators.Dedup.charNgrams(col("text"), n).as("nu")).collect()
      rows.zipWithIndex.foreach { case (r, i) =>
        assert(r.getSeq[String](0) === r.getSeq[String](1),
          s"case $i diverged at n=$n")
      }
    }
  }

  test("first-occurrence order and distinctness") {
    val out = Seq("abcabc").toDF("text")
      .select(graft.operators.Dedup.charNgrams(col("text"), 3))
      .head().getSeq[String](0)
    assert(out === Seq("abc", "bca", "cab"))
  }

  test("null text yields the single-null array under codegen") {
    val out = Seq(Option.empty[String]).toDF("text")
      .select(graft.operators.Dedup.charNgrams(col("text"), 3).as("g"))
      .select(size(col("g")).as("n"), col("g").getItem(0).isNull.as("firstNull"))
      .head()
    assert(out.getInt(0) === 1)
    assert(out.getBoolean(1))
  }
}
