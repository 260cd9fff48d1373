package graft.operators

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.SemanticType

/** Per-column statistics kernel — the Spark-native equivalent of the
  * reference's `get_description` (petk/tools.py:14-70).
  *
  * Design (SURVEY.md §4.2): the naive port runs one job per stat per column
  * (~20 jobs/column); this kernel folds EVERY stat for EVERY requested
  * column into ONE wide aggregation (partial + final hash agg, no shuffle
  * besides the single final-agg exchange), plus one dependent second pass
  * for `mad` (mean absolute deviation needs the mean first). At 100 TB this
  * is two scans total, independent of column count, and with
  * `approximate = true` the two exact O(distinct)/O(sort) aggregates
  * (`count_distinct`, `percentile`) switch to HLL++ and t-digest sketches.
  *
  * Stat-definition parity with the reference (pandas):
  *  - quantiles: linear (type-7) interpolation — Spark `percentile` matches
  *    pandas `Series.quantile` (petk/tools.py:47-48).
  *  - std/variance: sample (ddof=1) — `stddev_samp`/`var_samp`
  *    (petk/tools.py:56-57).
  *  - kurtosis/skewness: pandas returns bias-corrected G2/G1
  *    (petk/tools.py:59-60); Spark returns population g2/g1, so we apply
  *    the standard corrections driver-side:
  *      G1 = g1 * sqrt(n(n-1)) / (n-2)               (n > 2)
  *      G2 = (n-1)/((n-2)(n-3)) * ((n+1) g2 + 6)     (n > 3)
  *  - mad: mean absolute deviation around the mean (petk/tools.py:62,
  *    removed in pandas >= 2.0) — dependent second aggregation pass.
  *  - n_zeros counts exact zeros; nulls/NaN are NOT zeros
  *    (petk/tools.py:51: `size - np.count_nonzero`, NaN is nonzero).
  *  - is_unique compares distinct to SIZE not count, so any null makes a
  *    column non-unique (petk/tools.py:33).
  */
object Describe {

  /** Reference quantile labels: '{:.0%}'.format(p) (petk/tools.py:48). */
  val QuantilePs: Seq[Double] = Seq(0.05, 0.25, 0.5, 0.75, 0.95)
  val QuantileNames: Seq[String] = Seq("5%", "25%", "50%", "75%", "95%")

  /** One profiled column: reference-ordered stat map (petk/tools.py:18-68).
    * Values are Any (Long / Double / Boolean / String / java.sql.Timestamp)
    * exactly as heterogeneous as the reference's pandas Series. */
  final case class ColumnProfile(
      column: String,
      contentType: SemanticType,
      stats: ListMap[String, Any])

  private val SEP = ""

  private def isFloating(dt: DataType) = dt match {
    case DoubleType | FloatType => true
    case _ => false
  }

  /** Profile `columns` of `df` in one aggregation job (+ one dependent pass
    * for mad). `df` must already be null-normalized (graft.core.Report). */
  def profile(
      df: DataFrame,
      columns: Seq[String],
      approximate: Boolean = false): Seq[ColumnProfile] = {
    val fields = df.schema.fields.map(f => f.name -> f).toMap
    val static = columns.map(c => c -> SemanticType.ofField(fields(c))).toMap

    def cnt(cond: Column): Column = count(when(cond, lit(1)))
    def nDistinct(c: Column): Column =
      if (approximate) approx_count_distinct(c) else count_distinct(c)
    def quantiles(c: Column): Column =
      if (approximate) percentile_approx(c, typedLit(QuantilePs), lit(10000))
      else percentile(c, typedLit(QuantilePs))

    // ---- pass 1: one wide agg ------------------------------------------
    val aggs = Seq.newBuilder[Column]
    aggs += count(lit(1)).as(s"${SEP}n")
    columns.foreach { name =>
      val f = fields(name)
      val c = col(name)
      def a(stat: String, e: Column): Unit = aggs += e.as(s"$name$SEP$stat")
      a("count", count(c))
      f.dataType match { // memory estimate: var-width measured, fixed-width derived
        case StringType | BinaryType => a("bytes", sum(octet_length(c)))
        case _ => ()
      }
      static(name) match {
        case SemanticType.Unsupported | SemanticType.Geometry => ()
        case st =>
          a("distinct_count", nDistinct(c))
          st match {
            case SemanticType.Boolean =>
              a("mean", avg(c.cast(IntegerType)))
            case SemanticType.Date =>
              a("min", min(c)); a("max", max(c))
              // NTZ timestamps cast through TimestampType under the UTC
              // session zone; Date through epoch days — both lossless.
              a("quantiles", quantiles(unix_micros(c.cast(TimestampType))))
            case SemanticType.Numeric =>
              val d = c.cast(DoubleType)
              a("min", min(c)); a("max", max(c))
              a("quantiles", quantiles(d))
              a("mean", avg(c)); a("std", stddev_samp(c)); a("variance", var_samp(c))
              a("kurtosis", kurtosis(c)); a("skewness", skewness(c)); a("sum", sum(c))
              if (isFloating(f.dataType)) {
                a("n_infinite", cnt(d === Double.PositiveInfinity || d === Double.NegativeInfinity))
              }
              a("n_zeros", cnt(c === lit(0)))
            case _ => () // STRING/TEXT/VECTOR/EMPTY: distinct block only
          }
      }
    }
    val row = df.agg(aggs.result().head, aggs.result().tail: _*).head()
    val idx = row.schema.fieldNames.zipWithIndex.toMap
    def get(name: String, stat: String): Option[Any] = {
      val k = s"$name$SEP$stat"
      idx.get(k).map(row.get).filter(_ != null)
    }
    val n = row.getLong(idx(s"${SEP}n"))

    // ---- pass 2: mad (needs pass-1 means) ------------------------------
    val numericWithMean = columns.filter { name =>
      static(name) == SemanticType.Numeric &&
        get(name, "mean").isDefined
    }
    val madByCol: Map[String, Any] =
      if (numericWithMean.isEmpty) Map.empty
      else {
        val madAggs = numericWithMean.map { name =>
          val mean = get(name, "mean").get.asInstanceOf[Number].doubleValue()
          avg(abs(col(name).cast(DoubleType) - lit(mean))).as(s"$name$SEP")
        }
        val madRow = df.agg(madAggs.head, madAggs.tail: _*).head()
        numericWithMean.zipWithIndex.flatMap { case (name, i) =>
          Option(madRow.get(i)).map(name -> _)
        }.toMap
      }

    // ---- driver-side assembly, reference stat order --------------------
    columns.map { name =>
      val f = fields(name)
      val cn = get(name, "count").map(_.asInstanceOf[Number].longValue()).getOrElse(0L)
      val tpe = SemanticType.refineEmpty(static(name), cn, n)
      val s = ListMap.newBuilder[String, Any]
      s += "content_type" -> tpe.name
      s += "memory_usage" -> memoryEstimate(f, n, get(name, "bytes"))
      s += "count" -> cn
      s += "p_null" -> (if (n == 0) 0.0 else (n - cn).toDouble / n)
      s += "n_null" -> (n - cn)

      if (tpe != SemanticType.Unsupported && tpe != SemanticType.Geometry) {
        val nd = get(name, "distinct_count").map(_.asInstanceOf[Number].longValue()).getOrElse(0L)
        s += "distinct_count" -> nd
        s += "is_constant" -> (nd == 1L)
        s += "is_unique" -> (nd == n) // vs size, petk/tools.py:33
        s += "p_unique" -> (if (n == 0) 0.0 else nd.toDouble / n)

        // EMPTY columns keep only the base + distinct block, matching the
        // reference ladder where EMPTY preempts the dtype branches.
        if (tpe == SemanticType.Boolean) {
          get(name, "mean").foreach(m => s += "mean" -> m)
        } else if (tpe == SemanticType.Date || tpe == SemanticType.Numeric) {
          get(name, "min").foreach(v => s += "min" -> v)
          get(name, "max").foreach(v => s += "max" -> v)
          val qs = get(name, "quantiles").map(_.asInstanceOf[scala.collection.Seq[Any]])
          qs.foreach { q =>
            QuantileNames.zip(q).foreach { case (qn, v) =>
              val vv = if (tpe == SemanticType.Date && v != null)
                microsToTimestamp(v.asInstanceOf[Number].doubleValue())
              else v
              if (vv != null) s += qn -> vv
            }
          }
          if (tpe == SemanticType.Numeric) {
            val mean = get(name, "mean").map(_.asInstanceOf[Number].doubleValue())
            val std = get(name, "std").map(_.asInstanceOf[Number].doubleValue())
            mean.foreach(m => s += "mean" -> m)
            std.foreach(v => s += "std" -> v)
            get(name, "variance").foreach(v => s += "variance" -> v)
            qs.foreach { q =>
              if (q(3) != null && q(1) != null)
                s += "iqr" -> (q(3).asInstanceOf[Number].doubleValue() -
                  q(1).asInstanceOf[Number].doubleValue())
            }
            get(name, "kurtosis").foreach { g2 =>
              kurtosisG2(cn, g2.asInstanceOf[Number].doubleValue())
                .foreach(v => s += "kurtosis" -> v)
            }
            get(name, "skewness").foreach { g1 =>
              skewnessG1(cn, g1.asInstanceOf[Number].doubleValue())
                .foreach(v => s += "skewness" -> v)
            }
            get(name, "sum").foreach(v => s += "sum" -> v)
            madByCol.get(name).foreach(v => s += "mad" -> v)
            for (m <- mean; v <- std if m != 0.0) s += "cv" -> v / m
            val nInf =
              get(name, "n_infinite").map(_.asInstanceOf[Number].longValue()).getOrElse(0L)
            s += "p_infinite" -> (if (n == 0) 0.0 else nInf.toDouble / n)
            s += "n_infinite" -> nInf
            val nZeros = get(name, "n_zeros").map(_.asInstanceOf[Number].longValue()).getOrElse(0L)
            s += "n_zeros" -> nZeros
            s += "p_zeros" -> (if (n == 0) 0.0 else nZeros.toDouble / n)
          }
        }
      }
      ColumnProfile(name, tpe, s.result())
    }
  }

  /** Bias-corrected sample excess kurtosis (pandas `Series.kurt`) from
    * Spark's population excess kurtosis g2. */
  def kurtosisG2(n: Long, g2: Double): Option[Double] =
    if (n < 4 || g2.isNaN) None
    else Some((n - 1.0) / ((n - 2.0) * (n - 3.0)) * ((n + 1.0) * g2 + 6.0))

  /** Bias-corrected sample skewness (pandas `Series.skew`) from Spark's
    * population skewness g1. */
  def skewnessG1(n: Long, g1: Double): Option[Double] =
    if (n < 3 || g1.isNaN) None
    else Some(g1 * math.sqrt(n * (n - 1.0)) / (n - 2.0))

  private def microsToTimestamp(us: Double): java.sql.Timestamp = {
    val micros = math.rint(us).toLong
    val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
    ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
    ts
  }

  /** Spark-side size estimate (exact pandas byte parity is impossible and
    * not required — SURVEY.md A7/A19). Fixed-width types: n * width + null
    * bitmap; var-width: measured bytes from the profiling agg. */
  private def memoryEstimate(f: StructField, n: Long, measured: Option[Any]): Long = {
    val varBytes = measured.map(_.asInstanceOf[Number].longValue())
    varBytes match {
      case Some(b) => b + n / 8 + 16
      case None => n * f.dataType.defaultSize + n / 8 + 16
    }
  }
}
