package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join — an operator Spark's built-in join types
  * lack (SURVEY.md §2.C joins row). For every left row, attach the single
  * right row with the GREATEST rightTime <= leftTime within the same key
  * (inclusive), or nulls when none exists — matching DuckDB/kdb ASOF LEFT
  * JOIN semantics, which the oracle checks natively.
  *
  * Implementation is the scale-correct sort-based shape, composed from
  * built-ins (preference (a) of the custom-operator ladder): tag both
  * sides, union, one shuffle+sort by (key, time, side) and a running
  * `last(right_row, ignoreNulls)` window — right rows sort before left
  * rows at equal times so the inclusive bound holds. Cost is one exchange
  * of |L|+|R| rows; there is no range-join explosion and no per-key
  * collect.
  *
  * Determinism: if several right rows share (key, time), the last one in
  * the (unspecified) shuffle order wins — dedupe the right side to one
  * row per (key, time) first for reproducible output.
  */
object AsofJoin {

  /** @param tolerance pandas-merge_asof-style bound: the match is kept
    *   only when leftTime - rightTime <= tolerance (same comparison
    *   domain as the time columns — a numeric difference for numeric
    *   times, an `expr("INTERVAL ...")` for timestamps); matches beyond
    *   it become nulls, exactly like no match at all. */
  def asofLeft(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightPrefix: String = "asof_",
      tolerance: Option[Column] = None): DataFrame = {
    val leftStruct = struct(left.columns.map(col): _*)
    val rightStruct = struct(right.columns.map(col): _*)
    val lType = left.select(leftStruct).schema.head.dataType
    val rType = right.select(rightStruct).schema.head.dataType

    val l = left.select(
      col(leftKey).as("__k"), col(leftTime).as("__t"), lit(1).as("__side"),
      leftStruct.as("__l"), lit(null).cast(rType).as("__r"))
    val r = right.select(
      col(rightKey).as("__k"), col(rightTime).as("__t"), lit(0).as("__side"),
      lit(null).cast(lType).as("__l"), rightStruct.as("__r"))

    val w = Window.partitionBy("__k")
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched0 = l.unionByName(r)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val matched = tolerance match {
      case Some(tol) => matched0.withColumn("__match",
        when(col("__t") - col(s"__match.$rightTime") <= tol, col("__match")))
      case None => matched0
    }

    val leftCols = left.columns.map(c => col(s"__l.$c").as(c))
    val rightCols = right.columns.map(c => col(s"__match.$c").as(s"$rightPrefix$c"))
    matched.select(leftCols ++ rightCols: _*)
  }
}
