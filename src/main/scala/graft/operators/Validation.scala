package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{Bounds, ColumnRules}

/** Schema-driven validation rules — Spark equivalents of
  * petk/validation.py. Each rule is a lazy filter+project over the keyed,
  * normalized input producing per-row findings
  * `(column, index, function, notes)` (petk/exploration.py:107-114); rules
  * never collect, so findings stay distributed and Catalyst pushes the
  * predicates into the scan.
  *
  * Dispatch is an explicit registry rather than the reference's
  * module-introspection (`np.intersect1d(schema keys, module callables)`,
  * petk/exploration.py:88-91) — same rule names, no reflection.
  */
object Validation {

  def findingsSchema(keyType: DataType): StructType = StructType(Seq(
    StructField("column", StringType, nullable = false),
    StructField("index", keyType),
    StructField("function", StringType, nullable = false),
    StructField("notes", StringType)))

  /** All findings for one column's rules, unioned (petk/exploration.py:
    * 101-114). */
  def findingsFor(df: DataFrame, keyCol: String, column: String, rules: ColumnRules): DataFrame = {
    val parts = Seq.newBuilder[DataFrame]
    // implicit validity audit for the column literally named `geometry`
    // (petk/exploration.py:95-99 — runs whenever that column has a schema
    // entry, regardless of which rules it declares)
    if (column == "geometry") parts += Geo.geospatial(df, keyCol, column)
    rules.accepted.foreach(vs => parts += accepted(df, keyCol, column, vs))
    rules.range.foreach(b => parts += range(df, keyCol, column, b))
    rules.boundingBox.foreach(b => parts += Geo.boundingBox(df, keyCol, column, b))
    rules.sliver.foreach(p => parts += Geo.sliver(df, keyCol, column, p))
    val all = parts.result()
    if (all.isEmpty)
      df.sparkSession.createDataFrame(
        df.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        findingsSchema(df.schema(keyCol).dataType))
    else all.reduce(_ unionByName _)
  }

  private def shape(df: DataFrame, keyCol: String, column: String,
      function: String, cond: Column, notes: Column): DataFrame =
    df.filter(cond).select(
      lit(column).as("column"),
      col(keyCol).as("index"),
      lit(function).as("function"),
      notes.as("notes"))

  /** petk/validation.py:47-51 — value outside the accepted list. pandas
    * `~series.isin(values)` is TRUE for NaN, so the reference flags nulls
    * too; `!coalesce(isin, false)` replicates that exactly. */
  def accepted(df: DataFrame, keyCol: String, column: String, values: Seq[Any]): DataFrame =
    shape(df, keyCol, column, "accepted",
      !coalesce(col(column).isin(values: _*), lit(false)),
      lit("Value not within the accepted range"))

  /** petk/validation.py:36-45 + petk/tools.py:104-110 — per-row bound
    * check. Nulls never compare true, matching pandas (NaN < x is False).
    * Deviation (documented, SURVEY.md A47): the reference's truthiness test
    * also disables a bound equal to 0; we only disable absent bounds. */
  def range(df: DataFrame, keyCol: String, column: String, bounds: Bounds): DataFrame = {
    val c = col(column)
    // lower-bound check first, matching the reference's if/elif order
    var notes: Column = when(lit(false), lit(null).cast(StringType))
    bounds.lower.foreach(l => notes = notes.when(c < lit(l), lit("Value is less than the lower bound")))
    bounds.upper.foreach(u => notes = notes.when(c > lit(u), lit("Value is greater than the upper bound")))
    shape(df, keyCol, column, "range", notes.isNotNull, notes)
  }

  /** DATA-DRIVEN fence validation: rows outside the Tukey fences
    * [q1 − k·IQR, q3 + k·IQR] — [[range]]'s cousin where the bounds come
    * from the column's own quartiles instead of the schema (the screen a
    * profiler suggests when no domain bounds exist; k = 1.5 is the
    * boxplot convention, 3.0 the "far out" variant).
    *
    * Two passes total: exact type-7 quartiles via the distributed
    * bracket chain ([[Stats.exactQuantiles]] — bounded driver traffic,
    * never a whole-column percentile buffer), whose two doubles come
    * back as literals into one filtered scan — so the fence predicate
    * pushes into the column scan like any static range rule. Returns
    * (keyCol, value, side, fence_lo, fence_hi), nulls excluded. */
  def iqrOutliers(df: DataFrame, keyCol: String, column: String,
      k: Double = 1.5): DataFrame = {
    val Seq(q1, q3) = Stats.exactQuantiles(df, column, Seq(0.25, 0.75))
    val iqr = q3 - q1
    val lo = q1 - k * iqr
    val hi = q3 + k * iqr
    val v = col(column).cast("double")
    df.filter(v.isNotNull && (v < lo || v > hi))
      .select(col(keyCol), v.as("value"),
        when(v < lo, lit("below")).otherwise(lit("above")).as("side"),
        lit(lo).as("fence_lo"), lit(hi).as("fence_hi"))
  }
}
