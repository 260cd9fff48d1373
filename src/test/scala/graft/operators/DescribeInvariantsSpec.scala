package graft.operators

import scala.util.Random

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.core.Report

/** Property-style invariant checks over randomized inputs (SURVEY.md
  * §5.2 row 3), seeded for reproducibility. */
class DescribeInvariantsSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("x", DoubleType)))

  private def randomFrame(rnd: Random, n: Int) = {
    val rows = (0 until n).map { i =>
      val v: java.lang.Double =
        if (rnd.nextDouble() < 0.15) null
        else rnd.nextDouble() * rnd.nextInt(1000) - 200
      Row(i.toLong, v)
    }
    spark.createDataFrame(rows.asJava, schema)
  }

  test("invariants hold across randomized frames") {
    val rnd = new Random(42)
    for (trial <- 1 to 8) {
      val n = 5 + rnd.nextInt(60)
      val df = randomFrame(rnd, n)
      val s = Report(df, key = Some("id")).describe(Seq("x")).head.stats
      def d(k: String) = s(k).asInstanceOf[Double]
      def ratio(k: String) = { val v = d(k); assert(v >= 0.0 && v <= 1.0, s"$k=$v trial $trial") }
      ratio("p_null"); ratio("p_unique"); ratio("p_zeros"); ratio("p_infinite")
      if (s.contains("min")) {
        val ordered = Seq(d("min"), d("5%"), d("25%"), d("50%"), d("75%"), d("95%"), d("max"))
        assert(ordered.zip(ordered.tail).forall { case (a, b) => a <= b + 1e-12 },
          s"quantile ordering broken: $ordered trial $trial")
        assert(d("iqr") >= -1e-12)
        assert(d("variance") >= -1e-12)
        assert(d("std") >= -1e-12)
      }
      assert(s("n_null").asInstanceOf[Long] + s("count").asInstanceOf[Long] === n.toLong)
    }
  }

  test("describe is invariant under row permutation") {
    val rnd = new Random(7)
    val df = randomFrame(rnd, 40)
    val shuffled = df.orderBy(org.apache.spark.sql.functions.rand(99))
    val a = Report(df, key = Some("id")).describe(Seq("x")).head.stats
    val b = Report(shuffled, key = Some("id")).describe(Seq("x")).head.stats
    // moments may differ at ULP level across accumulation orders; compare
    // with tight tolerance, exact for counts
    a.foreach { case (k, v) =>
      (v, b(k)) match {
        case (x: Double, y: Double) => assert(math.abs(x - y) <= 1e-9 * (1 + math.abs(x)), k)
        case (x, y) => assert(x === y, k)
      }
    }
  }

  test("approximate mode: single-pass sketches track exact stats") {
    val rnd = new Random(11)
    val df = randomFrame(rnd, 2000)
    val exact = Report(df, key = Some("id")).describe(Seq("x")).head.stats
    val approx = Report(df, key = Some("id"), approximate = true).describe(Seq("x")).head.stats
    // counts/moments identical (same pass); distinct within HLL++ error;
    // quantiles within a loose band
    assert(approx("count") === exact("count"))
    assert(approx("mean") === exact("mean"))
    val dExact = exact("distinct_count").asInstanceOf[Long].toDouble
    val dApprox = approx("distinct_count").asInstanceOf[Long].toDouble
    assert(math.abs(dApprox - dExact) / dExact < 0.1)
    val qExact = exact("50%").asInstanceOf[Double]
    val qApprox = approx("50%").asInstanceOf[Double]
    assert(math.abs(qApprox - qExact) <= math.abs(qExact) * 0.1 + 10)
  }
}
