package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

/** Scale-safe per-group top-k for LOW-CARDINALITY group keys
  * (SURVEY.md §2.C row 5; 100 TB design notes).
  *
  * The hazard: `row_number over (partition by key order by ...)` with 5
  * distinct keys naively shuffles every row of a group to ONE task — a
  * straggler by construction at scale. Two plans avoid it:
  *
  *  - [[topK]] (the default): the plain ranked window, BECAUSE Catalyst
  *    already plans the rank filter as a two-phase `WindowGroupLimit` —
  *    a Partial group-limit caps every input partition at k rows per
  *    group BEFORE the exchange, the Final limit + window run over the
  *    ≤ partitions·k survivors. The straggler never materializes: the
  *    per-key task sees k·(upstream partitions) rows, not the group.
  *    Measured head-to-head at 60M rows with a planted 20%-hot group
  *    (SkewBench, BASELINE.md round 12), this native plan beats the
  *    hand-salted one ~1.8x — the salting duplicated the pruning the
  *    optimizer already did and paid an extra exchange for it.
  *
  *  - [[topKSalted]]: the explicit salted two-phase plan, kept for rank
  *    filters an optimizer cannot push into a group limit (non-literal
  *    k, rank expressions wrapped in non-trivial predicates, engines
  *    without group-limit pushdown). Semantics identical; equivalence
  *    is unit- and property-tested, and the salted physical shape is
  *    pinned in PlanSpec via the window_topk_scaled gate query.
  *
  * The ordering should be a total order (add a unique tie-break column,
  * e.g. the row id) — the window form is otherwise nondeterministic at
  * the rank-k boundary.
  */
object GroupTopK {

  /** Top `k` rows per group of `keys`, ranked by `ordering`, with the
    * rank exposed as `rankCol`. Plans as a two-phase WindowGroupLimit
    * (partial map-side pruning before the shuffle — asserted in
    * PlanSpec); see the object doc for why this beats hand-salting.
    *
    * Catalyst's InferWindowGroupLimit only fires when k is at most
    * `spark.sql.optimizer.windowGroupLimitThreshold` (default 1000; -1
    * disables the rule) — past it the "plain" window is the single-task-
    * per-key straggler this operator exists to avoid, so large-k calls
    * route to [[topKSalted]] instead of silently losing the map-side
    * prune. Callers with caller-supplied k (Profiles.mergeTopValues,
    * Stats.topValues, Sampling.capPerGroup) get the right plan either
    * way. */
  def topK(
      df: DataFrame, keys: Seq[String], ordering: Seq[Column], k: Int,
      rankCol: String = "rn"): DataFrame = {
    require(k > 0)
    val threshold =
      try df.sparkSession.conf
        .get("spark.sql.optimizer.windowGroupLimitThreshold", "1000").toInt
      catch { case _: NumberFormatException => 1000 }
    if (threshold < 0 || k > threshold) topKSalted(df, keys, ordering, k, rankCol)
    else {
      val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
      df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= k)
    }
  }

  /** [[topK]] as an EXPLICIT salted two-phase plan — the fallback for
    * rank filters the optimizer cannot push into a group limit.
    * `salts` = local-phase fan-out per key; size it to
    * (rows per hot key / target rows per task).
    *
    *  1. local phase — rank within (key, salt) where salt is a
    *     deterministic hash of the row mod `salts`; parallelism is
    *     #keys x salts; survivors per (key, salt) bucket: k.
    *  2. merge phase — rank the <= salts*k survivors per key; this
    *     window IS single-task-per-key, but over a bounded, tiny input.
    *
    * The result is independent of the salt assignment: every global
    * top-k row ranks <= k inside whatever bucket it lands in (a bucket
    * holds a subset of its key's rows), so phase 1 never discards a
    * global top-k row, and phase 2 computes the exact final ranking. */
  def topKSalted(
      df: DataFrame, keys: Seq[String], ordering: Seq[Column], k: Int,
      rankCol: String = "rn", salts: Int = 32): DataFrame = {
    require(k > 0 && salts > 0)
    // deterministic salt: hash of the full row (as in SkewJoin.saltedJoin)
    // — stable under retry/replay, uniform on any non-degenerate data.
    // Map-typed columns are not hashable in Spark; skip them (any other
    // column set still spreads, and with NO hashable columns the salt
    // degenerates to 0 = the plain window plan, which stays correct).
    val hashable = df.schema.fields
      .filterNot(f => hasMapType(f.dataType)).map(f => col(f.name)).toSeq
    val saltExpr =
      if (hashable.isEmpty) lit(0)
      else pmod(xxhash64(hashable: _*), lit(salts)).cast("int")
    val salted = df.withColumn("__salt", saltExpr)
    val local = Window.partitionBy((keys.map(col) :+ col("__salt")): _*)
      .orderBy(ordering: _*)
    val survivors = salted
      .withColumn("__local_rn", row_number().over(local))
      .filter(col("__local_rn") <= k)
      .drop("__salt", "__local_rn")
    val merge = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    survivors.withColumn(rankCol, row_number().over(merge))
      .filter(col(rankCol) <= k)
  }

  private def hasMapType(dt: DataType): Boolean = dt match {
    case _: MapType => true
    case ArrayType(e, _) => hasMapType(e)
    case s: StructType => s.fields.exists(f => hasMapType(f.dataType))
    case _ => false
  }
}
