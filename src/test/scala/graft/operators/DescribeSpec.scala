package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.core.{Report, SemanticType}

class DescribeSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def make(rows: Seq[Row], fields: (String, DataType)*) =
    spark.createDataFrame(rows.asJava,
      StructType(fields.map { case (n, t) => StructField(n, t) }))

  // Ground truth from pandas on [1.0, 2.5, 3.7, 4.2, 10.0, 2.2, 8.8, 0.5]
  // (see SURVEY.md §5.2: kurt/skew are bias-corrected G2/G1, std ddof=1).
  test("numeric kernel matches pandas definitions on a hand-checked series") {
    val vals = Seq(1.0, 2.5, 3.7, 4.2, 10.0, 2.2, 8.8, 0.5)
    val data = make(vals.zipWithIndex.map { case (v, i) => Row(i.toLong, v) },
      "id" -> LongType, "x" -> DoubleType)
    val s = Report(data, key = Some("id")).describe(Seq("x")).head.stats
    def d(k: String) = s(k).asInstanceOf[Double]
    assert(math.abs(d("kurtosis") - -0.4083215073671873) < 1e-9)
    assert(math.abs(d("skewness") - 0.9697949276087013) < 1e-9)
    assert(math.abs(d("std") - 3.5011987742975776) < 1e-12)
    assert(math.abs(d("mad") - 2.665625) < 1e-12)
    assert(math.abs(d("25%") - 1.9) < 1e-12) // type-7 interpolation
    assert(math.abs(d("mean") - vals.sum / 8) < 1e-12)
    assert(d("iqr") === d("75%") - d("25%"))
    assert(math.abs(d("cv") - d("std") / d("mean")) < 1e-15)
  }

  test("is_unique compares distinct against SIZE: a null breaks uniqueness (tools.py:33)") {
    val data = make(Seq(Row(1L, "a"), Row(2L, "b"), Row(3L, null)),
      "id" -> LongType, "s" -> StringType)
    val s = Report(data, key = Some("id")).describe(Seq("s")).head.stats
    assert(s("distinct_count") === 2L)
    assert(s("is_unique") === false) // 2 distinct vs size 3
    assert(s("p_unique") === 2.0 / 3)
  }

  test("n_zeros counts exact zeros; nulls are not zeros (tools.py:51)") {
    val data = make(Seq(Row(1L, 0.0), Row(2L, 0.0), Row(3L, Double.NaN), Row(4L, 5.0)),
      "id" -> LongType, "x" -> DoubleType)
    val s = Report(data, key = Some("id")).describe(Seq("x")).head.stats
    assert(s("n_zeros") === 2L)
    assert(s("p_zeros") === 0.5)
    assert(s("n_null") === 1L) // the NaN, canonicalized
  }

  test("all-null column classifies EMPTY before its physical type (tools.py:87-91)") {
    val data = make(Seq(Row(1L, null), Row(2L, null)), "id" -> LongType, "x" -> DoubleType)
    val p = Report(data, key = Some("id")).describe(Seq("x")).head
    assert(p.contentType === SemanticType.Empty)
    assert(p.stats("count") === 0L)
    assert(p.stats("distinct_count") === 0L)
    assert(!p.stats.contains("mean")) // EMPTY keeps only base + distinct block
    assert(!p.stats.contains("min"))
  }

  test("boolean ladder: mean is the fraction true (tools.py:37-40)") {
    val data = make(Seq(Row(1L, true), Row(2L, false), Row(3L, true), Row(4L, true)),
      "id" -> LongType, "b" -> BooleanType)
    val p = Report(data, key = Some("id")).describe(Seq("b")).head
    assert(p.contentType === SemanticType.Boolean)
    assert(p.stats("mean") === 0.75)
    assert(!p.stats.contains("min")) // bools get no min/max block
  }

  test("date ladder gets min/max/quantiles but no moments (tools.py:41-48)") {
    val ts = (1 to 5).map(i => java.time.LocalDateTime.of(2024, 1, i, 0, 0))
    val data = make(ts.zipWithIndex.map { case (t, i) => Row(i.toLong, t) },
      "id" -> LongType, "t" -> TimestampNTZType)
    val p = Report(data, key = Some("id")).describe(Seq("t")).head
    assert(p.contentType === SemanticType.Date)
    assert(p.stats.contains("min") && p.stats.contains("50%"))
    assert(!p.stats.contains("std"))
    // median of 5 evenly spaced days = the 3rd
    assert(p.stats("50%").toString.startsWith("2024-01-03"))
  }

  test("constant column: is_constant, zero variance") {
    val data = make((1 to 4).map(i => Row(i.toLong, 7.0)), "id" -> LongType, "x" -> DoubleType)
    val s = Report(data, key = Some("id")).describe(Seq("x")).head.stats
    assert(s("is_constant") === true)
    assert(s("std") === 0.0)
    assert(s("variance") === 0.0)
    assert(s("cv") === 0.0) // std/mean = 0/7
  }

  test("empty input: zero counts, no stat blocks, no crash") {
    val data = make(Seq.empty[Row], "id" -> LongType, "x" -> DoubleType, "s" -> StringType)
    val ps = Report(data, key = Some("id")).describe(Seq("x", "s"))
    ps.foreach { p =>
      assert(p.stats("count") === 0L)
      assert(p.stats("n_null") === 0L)
      assert(p.stats("p_null") === 0.0)
      assert(p.stats("distinct_count") === 0L)
      assert(!p.stats.contains("mean"))
      assert(!p.stats.contains("min"))
    }
  }

  test("whole-table profile covers every column/type in one call") {
    val out = graft.queries.ProfilingQueries.describeFullLineitem(spark, "/root/testdata/sf0.001")
    val byCol = out.collect().groupBy(_.getString(0))
    assert(byCol.keySet.size === 11)
    assert(byCol("l_extendedprice").exists(_.getString(1) == "kurtosis"))
    assert(byCol("l_shipdate").exists(_.getString(1) == "min"))
    assert(byCol("l_returnflag").exists(_.getString(1) == "distinct_count"))
  }

  test("family columns stay exact at any cardinality threshold (distributed quantile chain)") {
    val data = make((1 to 1000).map(i => Row(i.toLong, i.toDouble)),
      "id" -> LongType, "x" -> DoubleType)
    // type-7 median of 1..1000 interpolates to 500.5 — and the family
    // path never routes through a whole-column Percentile buffer, so a
    // tiny threshold changes nothing
    val exact = Describe.profile(data, Seq("x")).head.stats
    assert(exact("50%").asInstanceOf[Number].doubleValue() === 500.5)
    assert(exact("distinct_count") === 1000L)
    val tiny = Describe.profile(data, Seq("x"), exactQuantileMaxDistinct = 10).head.stats
    assert(tiny("50%").asInstanceOf[Number].doubleValue() === 500.5)
  }

  test("forced bracket chain matches the buffered percentile bit for bit") {
    // percentileBufferMaxDistinct = 0 forces every family column through
    // the distributed prefix-sum bracket chain; the result must equal the
    // default (buffered Percentile) route exactly — including dates and a
    // multi-column family in one pass
    val rnd = new scala.util.Random(7)
    val rows = (1 to 500).map { i =>
      Row(i.toLong, rnd.nextDouble() * 1000 - 500, (rnd.nextInt(300) + 1).toLong,
        java.sql.Date.valueOf(f"2024-01-${rnd.nextInt(28) + 1}%02d"))
    }
    val data = make(rows, "id" -> LongType, "x" -> DoubleType,
      "y" -> LongType, "d" -> DateType)
    val cols = Seq("x", "y", "d")
    val viaBuffer = Describe.profile(data, cols)
    val viaChain = Describe.profile(data, cols, percentileBufferMaxDistinct = 0)
    viaBuffer.zip(viaChain).foreach { case (b, c) =>
      assert(b.stats.keySet === c.stats.keySet, s"column ${b.column}")
      b.stats.foreach { case (k, bv) =>
        val cv = c.stats(k)
        (bv, cv) match {
          // mad rides different aggregation operators in the two routes
          // (ObjectHashAggregate with the Percentile vs codegen
          // HashAggregate), whose partial-merge order differs at last
          // ULP — everything else, quantiles included, is bit-identical
          case (x: Double, y: Double) if k == "mad" =>
            assert(math.abs(x - y) <= math.ulp(x) * 8, s"${b.column}.$k: $x vs $y")
          case _ => assert(bv === cv, s"${b.column}.$k")
        }
      }
    }
  }

  test("forced bracket chain handles NaN and infinities like the buffered route") {
    val vals: Seq[Double] = Seq(1.0, 2.0, 3.0, Double.NaN,
      Double.PositiveInfinity, Double.NegativeInfinity, -7.5, 4.25)
    val data = make(vals.zipWithIndex.map { case (v, i) => Row(i.toLong, v) },
      "id" -> LongType, "x" -> DoubleType)
    // NaN is canonicalized to null by Report normalization in the real
    // pipeline; here we call the kernel raw, so Percentile's NaN-last
    // ordering vs the chain's NaN edge slice must agree
    val b = Describe.profile(data, Seq("x")).head.stats
    val c = Describe.profile(data, Seq("x"), percentileBufferMaxDistinct = 0).head.stats
    Describe.QuantileNames.foreach { q =>
      val bv = b(q).asInstanceOf[Double]; val cv = c(q).asInstanceOf[Double]
      assert(bv == cv || (bv.isNaN && cv.isNaN), s"$q: $bv vs $cv")
    }
    assert(b("distinct_count") === c("distinct_count"))
  }

  test("non-family column above the distinct threshold falls back to sketch quantiles") {
    // DecimalType has no unpivot family → per-column fallback path, where
    // the Percentile-buffer gate still applies
    val data = make((1 to 1000).map(i => Row(i.toLong, BigDecimal(i))),
      "id" -> LongType, "x" -> DecimalType(10, 2))
    val exact = Describe.profile(data, Seq("x")).head.stats
    assert(exact("50%").asInstanceOf[Number].doubleValue() === 500.5)
    assert(exact("distinct_count") === 1000L)
    // guard fired (threshold 10 << 1000 distinct): t-digest returns an
    // ACTUAL element, never an interpolated value — proof the sketch ran
    val guarded = Describe.profile(data, Seq("x"), exactQuantileMaxDistinct = 10).head.stats
    val q50 = guarded("50%").asInstanceOf[Number].doubleValue()
    assert(q50 === 500.0 || q50 === 501.0)
    assert(guarded("distinct_count") === 1000L) // distinct stays exact
    assert(guarded("mad").asInstanceOf[Number].doubleValue() === 250.0)
  }

  test("small-n guards: kurtosis undefined below 4, skewness below 3 (pandas parity)") {
    assert(Describe.kurtosisG2(3, 1.0).isEmpty)
    assert(Describe.skewnessG1(2, 1.0).isEmpty)
    assert(Describe.kurtosisG2(4, 0.0).isDefined)
    // correction formulas
    val g2 = -1.2; val n = 100L
    val expected = (n - 1.0) / ((n - 2.0) * (n - 3.0)) * ((n + 1.0) * g2 + 6.0)
    assert(Describe.kurtosisG2(n, g2).get === expected)
  }
}
