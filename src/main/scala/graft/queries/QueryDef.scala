package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One oracle-checked query: a Spark DataFrame program plus (when
  * SQL-expressible) the equivalent ANSI SQL the driver runs in DuckDB on
  * the same parquet tables. Column names/types and row order must match
  * exactly (BASELINE.md t2 gate). */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {

  /** Deterministic rounding used on BOTH sides of the oracle compare.
    *
    * Spark and DuckDB implement `round()` with different tie conventions
    * and, worse, different scaling arithmetic — so two values that differ
    * only in the last ULP could round differently. Using the identical
    * `floor(x * 1eD + 0.5) / 1eD` formula on both engines means identical
    * IEEE-754 operations on near-identical inputs: the compare can only
    * diverge if the pre-rounded values differ enough to cross a floor
    * boundary (~1e-12 relative for these aggregates). */
  def r(c: Column, digits: Int): Column = {
    val s = math.pow(10, digits)
    floor(c * s + 0.5) / s
  }

  /** SQL half of [[r]] for the DuckDB oracle. */
  def rSql(e: String, digits: Int): String = s"floor(($e)*1e$digits + 0.5)/1e$digits"
}
