package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as a BOUNDED
  * group-by — point-frequency upper bounds and join-size estimates over
  * key universes too large to count exactly.
  *
  * Deliberately NOT a custom aggregate: a CMS is a d×w counter matrix,
  * and on Spark that matrix IS `groupBy(row, bucket).count()` over a key
  * space of at most d·w cells. Partial (map-side) aggregation bounds the
  * shuffle at d·w rows per partition regardless of input size — the same
  * economics a hand-rolled TypedImperativeAggregate buffer would buy,
  * with whole-stage codegen for free and none of the buffer plumbing
  * ([[graft.plans.FreqItemsAgg]] needed the custom route because
  * Misra–Gries eviction is not expressible as a group-by; cell-wise
  * summation is). Merging two sketches of the same shape is a union +
  * re-group over ≤ 2·d·w rows.
  *
  * Guarantees (depth d, width w, total weight n): est ≥ true always
  * (counters only overcount), and est ≤ true + e·n/w with probability
  * ≥ 1 − e^−d per query. The bucket hash is md5-digit arithmetic — a
  * pure function of the key an independent engine replays
  * digit-for-digit, so the gate verifies the ESTIMATES value-for-value
  * (the [[graft.plans.KmvSketchAgg]] oracle style), not just an error
  * bound.
  *
  * The reference has no sketch surface (eager pandas, exact only,
  * `petk/exploration.py`); this is part of the mergeable-sketch layer
  * mandated for the 100 TB profiling story (SURVEY §2.C). */
object CountMin {

  /** Row-`i` bucket of `key` in [0, width): first 15 md5 hex digits of
    * `"i#key"` as a 60-bit integer, mod width. Cryptographic digits are
    * uniform and rows are independent via the salt prefix. */
  def bucket(i: Int, key: Column, width: Int): Column =
    pmod(
      conv(substring(md5(concat_ws("#", lit(i), key.cast("string"))), 1, 15), 16, 10)
        .cast("long"),
      lit(width.toLong))

  private def cells(key: Column, depth: Int, width: Int): Column =
    array((0 until depth).map(i =>
      struct(lit(i).as("row"), bucket(i, key, width).as("bucket"))): _*)

  /** The sketch as its non-zero cell rows `(row, bucket, cnt)` —
    * ≤ d·w rows however large the input. One narrow scan, one bounded
    * shuffle. */
  def sketch(df: DataFrame, key: Column, depth: Int, width: Int): DataFrame =
    df.select(explode(cells(key, depth, width)).as("cell"))
      .groupBy(col("cell.row").as("row"), col("cell.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Merge sketches of the SAME (depth, width): cell-wise sum — a union
    * + re-group over ≤ Σ d·w rows. This is the mergeable-profile
    * contract ([[Profiles]]): sketch per shard at ingest, merge
    * sidecars to answer for any shard subset without rescanning. */
  def merge(sketches: Seq[DataFrame]): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy("row", "bucket").agg(sum("cnt").as("cnt"))

  /** Point-frequency estimate per distinct key in `keys`: the minimum
    * over the d cells the key hashes to. The sketch (≤ d·w rows) is
    * broadcast; the keys side never shuffles. Keys absent from the
    * stream still land in cells, so an inner join is total as long as
    * the queried cells are non-empty; a left join + zero-fill covers
    * keys whose cells saw nothing at all. */
  def estimates(sk: DataFrame, keys: DataFrame, keyCol: String,
      depth: Int, width: Int): DataFrame =
    keys.select(col(keyCol), explode(cells(col(keyCol), depth, width)).as("cell"))
      .select(col(keyCol), col("cell.row").as("row"), col("cell.bucket").as("bucket"))
      .join(broadcast(sk), Seq("row", "bucket"), "left")
      .groupBy(keyCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))

  /** Equi-join cardinality estimate of `a ⋈ b` on their sketched keys:
    * the CMS inner product — min over rows of Σ_bucket cellA·cellB
    * (Cormode & Muthukrishnan §4.2). Always ≥ the true size; the
    * optimizer-side use is deciding broadcast vs shuffle vs skew
    * handling BEFORE paying the join. Returns one row `(est)`. */
  def joinSizeEstimate(skA: DataFrame, skB: DataFrame): DataFrame =
    skA.join(skB.withColumnRenamed("cnt", "cnt_b"), Seq("row", "bucket"))
      .groupBy("row")
      .agg(sum(col("cnt") * col("cnt_b")).as("dot"))
      .agg(min("dot").as("est"))

  /** [[joinSizeEstimate]] of a table with itself (self-join size =
    * Σ count², the aggregate that also governs skew and group-by output
    * sizing): min over rows of Σ cell² — no join and ONE pass over the
    * sketch lineage, where `joinSizeEstimate(sk, sk)` would execute the
    * sketch's upstream scan twice (self-joins defeat ReuseExchange
    * across the rename). */
  def selfJoinSizeEstimate(sk: DataFrame): DataFrame =
    sk.groupBy("row")
      .agg(sum(col("cnt") * col("cnt")).as("dot"))
      .agg(min("dot").as("est"))
}
