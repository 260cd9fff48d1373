package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed ordinary-least-squares fit via NORMAL EQUATIONS — the
  * "distill an expensive quality signal into cheap features" step of a
  * training-data pipeline (score a sample with the expensive signal,
  * fit a linear surrogate over cheap surface features, then filter the
  * full corpus with the surrogate at a fraction of the cost).
  *
  * Scale shape: ONE codegen'd aggregation computes the k(k+1)/2 Gram
  * sums Σxᵢxⱼ and the k moment sums Σxᵢy (k = features + intercept) —
  * a single scan with map-side combine, collecting one k²-sized row.
  * The k×k solve is driver-side Gaussian elimination with partial
  * pivoting: O(k³) on literally a handful of doubles. Normal equations
  * are the right construction for the small-k surrogate case; a
  * large-k fit would switch to distributed QR or L-BFGS instead of
  * growing this.
  *
  * Determinism: the Gram sums are plain double sums (partial-merge
  * order can drift the last ULP, the same property every mean/std agg
  * in the engine has — consumers round before hashing); the solve is
  * sequential driver arithmetic, a pure function of the sums.
  *
  * Not in the reference (petk profiles a single table); mandated
  * training-pipeline surface (SURVEY.md §2.C, quality scoring). */
object Regression {

  /** Fit y ≈ w·[1, features...] by OLS. Returns the weight vector, with
    * w(0) the intercept. Rows where any feature or the target is null
    * are excluded. Fails loudly on a singular (collinear) design. */
  def fitOls(df: DataFrame, features: Seq[Column], target: Column): Seq[Double] = {
    require(features.nonEmpty, "need at least one feature")
    val xs = lit(1.0) +: features.map(_.cast("double"))
    val y = target.cast("double")
    val ok = xs.map(_.isNotNull).reduce(_ && _) && y.isNotNull
    val rows = df.filter(ok)
    val k = xs.size
    val gram = for (i <- 0 until k; j <- i until k)
      yield sum(xs(i) * xs(j)).as(s"g_${i}_$j")
    val mom = (0 until k).map(i => sum(xs(i) * y).as(s"b_$i"))
    val all = gram ++ mom
    val r = rows.agg(all.head, all.tail: _*).head()
    require(!r.isNullAt(0), "fitOls: no complete rows to fit on")
    val a = Array.ofDim[Double](k, k + 1) // augmented [G | b]
    var idx = 0
    for (i <- 0 until k; j <- i until k) {
      a(i)(j) = r.getDouble(idx); a(j)(i) = a(i)(j); idx += 1
    }
    (0 until k).foreach(i => a(i)(k) = r.getDouble(idx + i))
    // Gaussian elimination, partial pivoting — deterministic driver math
    for (c <- 0 until k) {
      val p = (c until k).maxBy(r2 => math.abs(a(r2)(c)))
      require(a(p)(c) != 0.0, "fitOls: singular design matrix (collinear features)")
      if (p != c) { val t = a(p); a(p) = a(c); a(c) = t }
      for (r2 <- 0 until k if r2 != c) {
        val f = a(r2)(c) / a(c)(c)
        for (j <- c to k) a(r2)(j) -= f * a(c)(j)
      }
    }
    (0 until k).map(i => a(i)(k) / a(i)(i))
  }

  /** Append `predCol` = w·[1, features...] (w from [[fitOls]], shipped
    * as literals — a narrow, shuffle-free projection). */
  def predict(df: DataFrame, features: Seq[Column], w: Seq[Double],
      predCol: String): DataFrame = {
    require(w.size == features.size + 1, s"need ${features.size + 1} weights, got ${w.size}")
    val terms = lit(w.head) +: features.zip(w.tail).map { case (f, wi) =>
      f.cast("double") * lit(wi)
    }
    df.withColumn(predCol, terms.reduce(_ + _))
  }
}
