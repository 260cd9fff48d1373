package graft.core

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

class ReportSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def df(rows: Seq[Row], schema: StructType) =
    spark.createDataFrame(rows.asJava, schema)

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("s", StringType),
    StructField("d", DoubleType)))

  test("canonical null sentinels: 'null', '' and NaN become SQL null") {
    val data = df(Seq(
      Row(1L, "null", 1.0), Row(2L, "", 2.0), Row(3L, "ok", Double.NaN),
      Row(4L, null, 4.0)), schema)
    val rep = Report(data, key = Some("id"))
    val out = rep.df.orderBy("id").collect()
    assert(out.map(_.isNullAt(2)) === Array(true, true, false, true)) // s
    assert(out.map(_.isNullAt(3)) === Array(false, false, true, false)) // d
  }

  test("schema-declared extra sentinels are type-filtered like pandas replace") {
    val data = df(Seq(Row(1L, "N/A", -1.0), Row(2L, "x", 2.0)), schema)
    val rules = Map(
      "s" -> ColumnRules(nulls = Seq("N/A", -1)), // -1 mismatches string: no-op
      "d" -> ColumnRules(nulls = Seq(-1, "N/A"))) // "N/A" mismatches double: no-op
    val rep = Report(data, schema = rules, key = Some("id"))
    val out = rep.df.orderBy("id").collect()
    assert(out(0).isNullAt(2) && out(0).isNullAt(3))
    assert(!out(1).isNullAt(2) && !out(1).isNullAt(3))
  }

  test("schema assert rejects unknown columns (exploration.py:20)") {
    val data = df(Seq(Row(1L, "a", 1.0)), schema)
    val e = intercept[IllegalArgumentException] {
      Report(data, schema = Map("nope" -> ColumnRules()))
    }
    assert(e.getMessage.contains("nope"))
  }

  test("describe memoizes per column (exploration.py:73-75)") {
    val data = df(Seq(Row(1L, "a", 1.0), Row(2L, "b", 2.0)), schema)
    val rep = Report(data, key = Some("id"))
    val first = rep.describe(Seq("d")).head
    val again = rep.describe(Seq("d")).head
    assert(first eq again) // same cached instance, no recompute
  }

  test("a data column named 'index' is rejected unless it IS the key") {
    val s = StructType(Seq(StructField("index", LongType), StructField("v", DoubleType)))
    val data = df(Seq(Row(1L, 1.0), Row(2L, 2.0)), s)
    val e = intercept[IllegalArgumentException](Report(data))
    assert(e.getMessage.contains("collides"))
    // choosing it as the key is fine: key and column coincide by request
    val rep = Report(data, key = Some("index"))
    assert(rep.describe(Seq("v")).head.stats("count") === 2L)
  }

  test("verbose validate stays (column, index, function, notes)-ordered after the join") {
    val s = StructType(Seq(StructField("id", LongType), StructField("v", DoubleType)))
    val data = df((1L to 40L).map(i => Row(41L - i, i.toDouble)), s)
    val rep = Report(data, schema = Map("v" -> ColumnRules(
      range = Some(Bounds(Some(100.0), None)))), key = Some("id"))
    val out = rep.validate(verbose = true).select("index").collect().map(_.getLong(0))
    assert(out.toSeq === out.sorted.toSeq)
    assert(out.length === 40)
  }

  test("findColumns default-all and missing assert (exploration.py:128-137)") {
    val data = df(Seq(Row(1L, "a", 1.0)), schema)
    val rep = Report(data, key = Some("id"))
    assert(rep.describe().map(_.column) === Seq("id", "s", "d"))
    val e = intercept[IllegalArgumentException](rep.describe(Seq("ghost")))
    assert(e.getMessage.contains("ghost"))
  }
}
