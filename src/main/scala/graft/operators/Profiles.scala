package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.{FreqItemsAgg, KllSketchAgg}

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
    meltTyped(df, shardCol, cols, "double")

  /** Melt with an explicit target type (string/date/boolean melts for the
    * typed profile ladders below and their verification passes). */
  def meltTyped(df: DataFrame, shardCol: Column, cols: Seq[String],
      dt: String): DataFrame =
    df.select(shardCol.as("shard"),
        explode(array(cols.map(c =>
          struct(lit(c).as("col"), col(c).cast(dt).as("v"))): _*)).as("x"))
      .select(col("shard"), col("x.col").as("col"), col("x.v").as("v"))

  // ---- typed modality ladders ------------------------------------------
  // The reference's describe ladder covers bool/date/string columns, not
  // just numerics (reference petk/tools.py:27-48); the shard-profile
  // union story does too. Each modality keeps the same contract: every
  // field of a profile row merges exactly (add / min / max / sketch
  // union), so the corpus-wide profile is a union of |shards| × |cols|
  // rows, never a rescan.

  /** One STRING profile row per (shard, column): exact length ladder
    * (count/null/empty/min/max/sum of lengths) + an HLL distinct sketch +
    * a Misra–Gries top-values sketch of `mgCapacity` counters. MG
    * counters are LOWER bounds in general, and EXACT counts whenever a
    * column's per-shard distinct count stays ≤ mgCapacity (no decrement
    * ever fires) — low-cardinality categorical columns get exact top
    * values out of the sketch for free. */
  def stringShardProfiles(df: DataFrame, shardCol: Column, cols: Seq[String],
      mgCapacity: Int = 64): DataFrame = {
    require(cols.nonEmpty, "stringShardProfiles requires at least one column")
    meltTyped(df, shardCol, cols, "string").groupBy("shard", "col").agg(
      count(col("v")).as("n"),
      sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"),
      sum(when(length(col("v")) === 0, 1L).otherwise(0L)).as("n_empty"),
      min(length(col("v"))).as("len_min"),
      max(length(col("v"))).as("len_max"),
      sum(length(col("v")).cast("long")).as("len_sum"),
      hll_sketch_agg(col("v")).as("hll"),
      FreqItemsAgg.freqItems(col("v"), mgCapacity).as("mg"))
  }

  /** Merge string profiles into one row per column (exact length ladder +
    * HLL-union distinct estimate). Top values merge separately via
    * [[mergeTopValues]] — they are per-value rows, not per-column. */
  def mergeStringProfiles(profiles: DataFrame): DataFrame = {
    val nTot = sum("n")
    profiles.groupBy("col").agg(
      nTot.as("n"),
      sum("n_null").as("n_null"),
      sum("n_empty").as("n_empty"),
      min("len_min").as("len_min"),
      max("len_max").as("len_max"),
      sum("len_sum").as("len_sum"),
      (sum("len_sum").cast("double") / when(nTot =!= 0, nTot)).as("avg_len"),
      hll_sketch_estimate(hll_union_agg(col("hll"))).as("distinct_est"))
  }

  /** Union the per-shard Misra–Gries counters and rank the top `k` values
    * per column. The merge is the mergeable-summaries rule minus the
    * final compression: counters sum per (col, value) — missing keys
    * contribute 0 — so merged counts stay lower bounds with summed error,
    * and are exact whenever each shard's sketch was exact. Input is
    * |shards| × capacity rows per column — bounded; ranking rides
    * [[GroupTopK]], never a single-task global sort. */
  def mergeTopValues(profiles: DataFrame, k: Int): DataFrame =
    GroupTopK.topK(
      profiles.select(col("col"), explode(col("mg")).as("e"))
        .select(col("col"), col("e.item").as("value"), col("e.est").as("est"))
        .groupBy("col", "value").agg(sum("est").as("cnt")),
      Seq("col"), Seq(col("cnt").desc, col("value").asc), k, rankCol = "rank")
      .select(col("col"), col("value"), col("cnt"),
        col("rank").cast("int").as("rank"))

  /** One DATE profile row per (shard, column): count/null/min/max — all
    * exactly mergeable. */
  def dateShardProfiles(df: DataFrame, shardCol: Column, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "dateShardProfiles requires at least one column")
    meltTyped(df, shardCol, cols, "date").groupBy("shard", "col").agg(
      count(col("v")).as("n"),
      sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"),
      min("v").as("min"),
      max("v").as("max"))
  }

  /** Merge date profiles: add counts, min of mins, max of maxes. */
  def mergeDateProfiles(profiles: DataFrame): DataFrame =
    profiles.groupBy("col").agg(
      sum("n").as("n"),
      sum("n_null").as("n_null"),
      min("min").as("min"),
      max("max").as("max"))

  /** One BOOLEAN profile row per (shard, column): count/null/true-count. */
  def boolShardProfiles(df: DataFrame, shardCol: Column, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "boolShardProfiles requires at least one column")
    meltTyped(df, shardCol, cols, "boolean").groupBy("shard", "col").agg(
      count(col("v")).as("n"),
      sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"),
      sum(when(col("v"), 1L).otherwise(0L)).as("n_true"))
  }

  /** Merge boolean profiles: add counts; true_rate over non-null rows
    * (null for an all-null column — ANSI-safe). */
  def mergeBoolProfiles(profiles: DataFrame): DataFrame = {
    val nTot = sum("n")
    profiles.groupBy("col").agg(
      nTot.as("n"),
      sum("n_null").as("n_null"),
      sum("n_true").as("n_true"),
      (sum("n_true").cast("double") / when(nTot =!= 0, nTot)).as("true_rate"))
  }

  /** Mergeable CO-MOMENT profile rows for a numeric column PAIR: per
    * shard (n, means, centered second moments, centered co-moment
    * Cxy = covar_pop · n). Rows with either side null are excluded
    * (pairwise-complete, matching `corr` semantics). The co-moment
    * merges by the same parallel rule as m2 (Bennett, Grove, Pébay
    * 2009, the two-variable extension of Chan–Golub–LeVeque):
    * Cxy = Σ cxy_i + Σ n_i·mx_i·my_i − (Σ n_i·mx_i)(Σ n_i·my_i)/N —
    * algebraically exact, so merged covariance/correlation equal the
    * whole-corpus values up to float association. */
  def pairShardProfiles(df: DataFrame, shardCol: Column, xCol: String,
      yCol: String): DataFrame = {
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    df.select(shardCol.as("shard"), x.as("_x"), y.as("_y"))
      .filter(col("_x").isNotNull && col("_y").isNotNull)
      .groupBy("shard").agg(
        count(lit(1)).as("n"),
        avg("_x").as("mx"),
        avg("_y").as("my"),
        coalesce(var_pop(col("_x")) * count(lit(1)), lit(0.0)).as("m2x"),
        coalesce(var_pop(col("_y")) * count(lit(1)), lit(0.0)).as("m2y"),
        coalesce(covar_pop(col("_x"), col("_y")) * count(lit(1)), lit(0.0)).as("cxy"))
  }

  /** Merge pair profiles into one row: (n, mean_x, mean_y, cov_samp,
    * corr) — exactly the whole-data `covar_samp`/`corr` up to float
    * association. Degenerate inputs (n ≤ 1, zero variance on either
    * side) yield null cov/corr — ANSI-safe. */
  def mergePairProfiles(profiles: DataFrame): DataFrame = {
    val n = sum("n")
    val sx = sum(col("n") * col("mx"))
    val sy = sum(col("n") * col("my"))
    val m2x = sum("m2x") + sum(col("n") * col("mx") * col("mx")) - sx * sx / n
    val m2y = sum("m2y") + sum(col("n") * col("my") * col("my")) - sy * sy / n
    val cxy = sum("cxy") + sum(col("n") * col("mx") * col("my")) - sx * sy / n
    profiles.agg(
      n.as("n"),
      (sx / when(n =!= 0, n)).as("mean_x"),
      (sy / when(n =!= 0, n)).as("mean_y"),
      (cxy / when(n > 1, n - 1)).as("cov_samp"),
      (cxy / when(sqrt(m2x * m2y) =!= 0, sqrt(m2x * m2y))).as("corr"))
  }

  /** Shard ANOMALY SCREEN from the profile frame alone — the "which
    * ingest shard is broken?" question answered WITHOUT rescanning the
    * corpus: each shard's mean is z-scored against the cross-shard
    * distribution of shard means, per column. A shard whose upstream
    * silently switched units, dropped a field, or truncated values
    * shows up as |z| > threshold here, on |shards| × |cols| rows of
    * input — driver-trivial at any corpus size, which is exactly why
    * the profiles are stored next to the data. Windows run over the
    * bounded per-column shard frame. Null z for a degenerate (≤1 shard
    * or zero-spread) column — ANSI-safe, nothing to compare against. */
  def shardDriftScreen(profiles: DataFrame, zThreshold: Double = 3.0): DataFrame = {
    val m = profiles.select(col("shard"), col("col"), col("n"),
      (col("sum") / when(col("n") =!= 0, col("n"))).as("shard_mean"))
    val w = Window.partitionBy("col")
    m.withColumn("mu", avg("shard_mean").over(w))
      .withColumn("sd", stddev_samp("shard_mean").over(w))
      .select(col("col"), col("shard"), col("n"), col("shard_mean"),
        col("mu"),
        when(col("sd") =!= 0, (col("shard_mean") - col("mu")) / col("sd")).as("z"))
      .withColumn("flagged", abs(col("z")) > zThreshold)
  }
}
