package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** OLS normal-equations fit: exact recovery, null exclusion, and the
  * singular-design guard. */
class RegressionSpec extends SparkSpec {

  private def data(rows: (Double, Double, Double)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("x1", "x2", "y")
  }

  test("recovers planted linear weights exactly (residual-free design)") {
    // y = 3 - 2*x1 + 0.5*x2, no noise: OLS must interpolate
    val rows = for (a <- 1 to 6; b <- 1 to 4)
      yield (a.toDouble, b.toDouble, 3.0 - 2.0 * a + 0.5 * b)
    val w = Regression.fitOls(data(rows: _*), Seq(col("x1"), col("x2")), col("y"))
    assert(math.abs(w(0) - 3.0) < 1e-9)
    assert(math.abs(w(1) - -2.0) < 1e-9)
    assert(math.abs(w(2) - 0.5) < 1e-9)
    // and predict reproduces the target
    val out = Regression.predict(data(rows: _*), Seq(col("x1"), col("x2")), w, "yhat")
      .select(abs(col("y") - col("yhat"))).agg(max("abs((y - yhat))")).head().getDouble(0)
    assert(out < 1e-9)
  }

  test("rows with a null feature or target are excluded from the fit") {
    val s = spark
    import s.implicits._
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, 2.0), (2.0, 4.0), (3.0, 6.0), (null, 100.0), (4.0, null))
      .toDF("x1", "y")
    val w = Regression.fitOls(df, Seq(col("x1")), col("y"))
    assert(math.abs(w(0)) < 1e-9 && math.abs(w(1) - 2.0) < 1e-9)
  }

  test("singular (collinear) design fails loudly") {
    // x2 = 2*x1 exactly: the Gram matrix is rank-deficient
    val rows = (1 to 10).map(i => (i.toDouble, 2.0 * i, i * 3.0))
    val e = intercept[IllegalArgumentException] {
      Regression.fitOls(data(rows: _*), Seq(col("x1"), col("x2")), col("y"))
    }
    assert(e.getMessage.contains("singular"))
  }
}
