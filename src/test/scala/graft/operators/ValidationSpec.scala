package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.core.{Bounds, ColumnRules, Report}

// (Report companion helpers under test: validateAsMap, dropAllNullRows)

class ValidationSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("status", StringType),
    StructField("amount", DoubleType)))

  private def rep(rows: Seq[Row], rules: Map[String, ColumnRules]) =
    Report(spark.createDataFrame(rows.asJava, schema), schema = rules, key = Some("id"))

  test("accepted flags values outside the list AND nulls (validation.py:47-51)") {
    val r = rep(Seq(
      Row(1L, "O", 1.0), Row(2L, "X", 1.0), Row(3L, null, 1.0)),
      Map("status" -> ColumnRules(accepted = Some(Seq("O", "F")))))
    val out = r.validate().collect()
    assert(out.map(_.getLong(1)).toSeq === Seq(2L, 3L)) // null flagged like pandas ~isin
    assert(out.forall(_.getString(3) === "Value not within the accepted range"))
    assert(out.forall(_.getString(2) === "accepted"))
  }

  test("range messages match the reference text, lower checked first (tools.py:104-110)") {
    val r = rep(Seq(
      Row(1L, "O", -5.0), Row(2L, "O", 50.0), Row(3L, "O", 150.0), Row(4L, "O", null)),
      Map("amount" -> ColumnRules(range = Some(Bounds(Some(0.0), Some(100.0))))))
    val out = r.validate().collect()
    assert(out.length === 2) // null never compares (pandas NaN comparisons false)
    assert(out(0).getLong(1) === 1L)
    assert(out(0).getString(3) === "Value is less than the lower bound")
    assert(out(1).getLong(1) === 3L)
    assert(out(1).getString(3) === "Value is greater than the upper bound")
  }

  test("bound = 0 stays active (documented deviation from the reference truthiness bug)") {
    val r = rep(Seq(Row(1L, "O", -1.0), Row(2L, "O", 1.0)),
      Map("amount" -> ColumnRules(range = Some(Bounds(Some(0.0), None)))))
    assert(r.validate().count() === 1)
  }

  test("findings ordered by (column, index, function) (exploration.py:116-124)") {
    val r = rep(Seq(Row(2L, "X", 999.0), Row(1L, "X", -1.0)),
      Map(
        "status" -> ColumnRules(accepted = Some(Seq("O"))),
        "amount" -> ColumnRules(range = Some(Bounds(Some(0.0), Some(100.0))))))
    val out = r.validate().collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq === Seq(("amount", 1L), ("amount", 2L), ("status", 1L), ("status", 2L)))
  }

  test("verbose joins findings back to source rows by index (exploration.py:139-141)") {
    val r = rep(Seq(Row(1L, "X", 42.0)),
      Map("status" -> ColumnRules(accepted = Some(Seq("O")))))
    val out = r.validate(verbose = true).collect()
    assert(out.length === 1)
    val row = out.head
    assert(row.getAs[Double]("amount") === 42.0) // source columns present
    assert(row.getAs[String]("notes") === "Value not within the accepted range")
  }

  test("validateAsMap renders the nested column -> index -> function -> notes dict") {
    val r = rep(Seq(Row(1L, "X", -5.0), Row(2L, "O", 1.0)),
      Map(
        "status" -> ColumnRules(accepted = Some(Seq("O"))),
        "amount" -> ColumnRules(range = Some(Bounds(Some(0.0), None)))))
    val m = r.validateAsMap()
    assert(m("status")(1L)("accepted") === "Value not within the accepted range")
    assert(m("amount")(1L)("range") === "Value is less than the lower bound")
    assert(!m.contains("id"))
  }

  test("dropAllNullRows drops rows whose values are all null (exploration.py:164)") {
    val df = spark.createDataFrame(Seq(
      Row(null, null), Row("a", null)).asJava,
      StructType(Seq(StructField("x", StringType), StructField("y", StringType))))
    assert(Report.dropAllNullRows(df).count() === 1)
  }

  test("columns without rules produce no findings; unmatched rules yield empty frame") {
    val r = rep(Seq(Row(1L, "O", 1.0)),
      Map("status" -> ColumnRules(accepted = Some(Seq("O")))))
    assert(r.validate().count() === 0)
  }

  test("iqrOutliers: Tukey fences from exact quartiles, sides labeled, nulls out") {
    val s = spark
    import s.implicits._
    // 1..11 plus two planted extremes; type-7 quartiles of the 13 values:
    // q1 = 3, q3 = 9 -> IQR 6, fences [-6, 18]
    val df = ((1 to 11).map(_.toDouble) ++ Seq(-50.0, 50.0))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val out = Validation.iqrOutliers(df, "id", "v", 1.5).collect()
      .map(r => r.getDouble(1) -> r.getString(2)).toMap
    assert(out === Map(-50.0 -> "below", 50.0 -> "above"), out.toString)
    // nulls never flag
    val withNull = spark.createDataFrame(Seq(
      Row(1L, 1.0), Row(2L, null), Row(3L, 100.0), Row(4L, 2.0), Row(5L, 3.0)).asJava,
      StructType(Seq(StructField("id", LongType), StructField("v", DoubleType))))
    val flagged = Validation.iqrOutliers(withNull, "id", "v", 1.5).collect()
    assert(flagged.forall(!_.isNullAt(1)))
  }
}
