package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.KllSketchAgg

/** Mergeable per-shard profiles — the incremental 100 TB describe story.
  *
  * A corpus that arrives shard-by-shard (an ingest pipeline writing
  * training shards, [[graft.sources.Sinks]]) should be profiled
  * shard-by-shard ONCE, with the per-shard profiles stored next to the
  * data; the corpus-wide profile is then a UNION of profiles — a few
  * rows per (shard, column) — never a rescan of the corpus. Every field
  * here is chosen to be mergeable:
  *
  *   - `n`, `n_null`, `sum`: add; `min`/`max`: min/max.
  *   - dispersion: the centered second moment `m2` (= var_pop · n)
  *     merges by the parallel-variance rule (Chan, Golub, LeVeque 1983):
  *     M2 = Σ m2_i + Σ n_i·mean_i² − (Σ n_i·mean_i)²/N — algebraically
  *     exact, so the merged mean/std equal the whole-corpus values up to
  *     float association (the shard_profile_merge oracle checks them
  *     against single-pass DuckDB at 6-digit rounding).
  *   - quantiles: a serialized KLL sketch per shard ([[KllSketchAgg]]),
  *     merged with [[graft.plans.KllUnionAgg]] — bounded rank error.
  *   - distinct: a DataSketches HLL sketch (Spark's `hll_sketch_agg`,
  *     register-max merge — order- and shard-invariant estimate).
  *
  * The profile frame is |shards| × |cols| rows — broadcast-sized for any
  * realistic shard count; merging it is driver-trivial no matter how big
  * the corpus was. */
object Profiles {

  /** One profile row per (shard, column): exact mergeable stats plus the
    * KLL and HLL sketch bytes. `cols` are profiled as DOUBLE (the
    * numeric-profile contract; HLL hashes the string rendering, which is
    * injective on distinct doubles). One narrow pass over the data:
    * melt → hash-aggregate, map-side partial per shard. */
  def shardProfiles(df: DataFrame, shardCol: Column, cols: Seq[String], k: Int = 200): DataFrame = {
    require(cols.nonEmpty, "shardProfiles requires at least one column")
    val melted = melt(df, shardCol, cols)
    melted.groupBy("shard", "col").agg(
      count(col("v")).as("n"),
      sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"),
      min("v").as("min"),
      max("v").as("max"),
      sum("v").as("sum"),
      avg("v").as("mean"),
      coalesce(var_pop(col("v")) * count(col("v")), lit(0.0)).as("m2"),
      KllSketchAgg.kllSketch(col("v"), k).as("kll"),
      hll_sketch_agg(col("v").cast("string")).as("hll"))
  }

  /** Merge a profile frame (any subset of shards, any order) into one
    * row per column. Exact fields reproduce the whole-data stats; `q`
    * holds KLL quantile estimates at `probs` and `distinct_est` the HLL
    * estimate — both with documented error bounds (see class doc). */
  def mergeProfiles(profiles: DataFrame, probs: Seq[Double], k: Int = 200): DataFrame = {
    val nTot = sum("n")
    profiles.groupBy("col").agg(
      nTot.as("n"),
      sum("n_null").as("n_null"),
      min("min").as("min"),
      max("max").as("max"),
      sum("sum").as("sum"),
      (sum("sum") / nTot).as("mean"),
      sqrt((sum("m2") + sum(col("n") * col("mean") * col("mean")) -
        pow(sum(col("n") * col("mean")), 2) / nTot) /
        (nTot - 1L)).as("std"),
      KllSketchAgg.kllUnionQuantiles(col("kll"), probs, k).as("q"),
      hll_sketch_estimate(hll_union_agg(col("hll"))).as("distinct_est"))
  }

  /** Long-form melt: (shard, col, v as double) — the narrow projection
    * both the profile pass and its verification pass scan. */
  def melt(df: DataFrame, shardCol: Column, cols: Seq[String]): DataFrame =
    df.select(shardCol.as("shard"),
        explode(array(cols.map(c =>
          struct(lit(c).as("col"), col(c).cast("double").as("v"))): _*)).as("x"))
      .select(col("shard"), col("x.col").as("col"), col("x.v").as("v"))
}
