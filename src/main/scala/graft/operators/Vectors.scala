package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** VECTOR-modality profiling (SURVEY.md §2.C row 12 extension ladder):
  * dimension and norm statistics for an ArrayType(Numeric) column — the
  * describe() analog for embedding columns. One aggregation job. */
object Vectors {

  /** Per-vector dimension + L2 norm. */
  def norms(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol),
      size(col(vecCol)).cast("long").as("dim"),
      VectorFunctions.norm(col(vecCol)).as("norm"))

  /** One-row profile: count, nulls, dimension range, norm stats. */
  def profile(df: DataFrame, vecCol: String): DataFrame = {
    val v = col(vecCol)
    val n = VectorFunctions.norm(v)
    df.agg(
      count(lit(1)).as("n"),
      count(v).as("count"),
      min(size(v)).cast("long").as("dim_min"),
      max(size(v)).cast("long").as("dim_max"),
      avg(n).as("avg_norm"),
      min(n).as("min_norm"),
      max(n).as("max_norm"))
  }
}
