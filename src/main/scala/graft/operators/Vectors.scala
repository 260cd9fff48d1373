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

  /** Symmetric per-vector int8 quantization — the 100 TB memory lever for
    * embedding search: scale = 127 / max|v| per vector, q_i = ⌊v_i·scale
    * + 0.5⌋ (the same portable round-half-up formula the SQL oracle uses,
    * never engine `round()`). Cosine is invariant to per-vector positive
    * scaling, so ranking over quantized vectors approximates the float
    * ranking at one quarter of the footprint — and because the quantized
    * components are small integers, cosine sums over them are EXACT in
    * IEEE double, which is what lets an independent engine reproduce
    * similarity scores bit-for-bit. Zero vectors quantize to zeros.
    *
    * The per-element map is an interpreted HOF — fine for an O(dim)
    * transform per row (dim is 64 here, not corpus-sized); the bulk
    * statistics over quantized components should use posexplode + hash
    * aggregation (see the quantize_vectors query), not array HOFs.
    *
    * `scale` is materialized as a bound column in a FIRST projection and
    * only then referenced inside the lambda: embedding the scale
    * expression tree (which itself contains an O(dim) array_max) in the
    * per-element lambda re-evaluates it for every element — O(dim²)
    * interpreted work per row. CollapseProject keeps the two projections
    * apart because the alias is non-cheap and referenced twice.
    *
    * Caveat for callers: do NOT posexplode the returned qvec —
    * InferFiltersFromGenerate infers `size(qvec)>0 AND isnotnull(qvec)`
    * and pushes it below this projection with the scale tree re-inlined,
    * bringing the O(dim²) work back (measured 8.45 s vs 0.55 s at sf0.1
    * for the quantize_vectors stats query). For bulk component stats,
    * explode the RAW vector and apply ⌊x·scale+0.5⌋ post-explode as a
    * scalar codegen'd expression (see LlmQueries.quantizeVectors). */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val maxAbs = array_max(transform(col(vecCol), x => abs(x.cast("double"))))
    val scale = when(maxAbs > 0, lit(127.0) / maxAbs).otherwise(lit(0.0))
    df.select(col(idCol), col(vecCol), scale.as("scale"))
      .select(col(idCol), col("scale"),
        transform(col(vecCol), x => floor(x.cast("double") * col("scale") + 0.5)).as("qvec"))
  }

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
