package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.broadcast

/** Size-gated broadcast hints for dimension frames whose cardinality
  * GROWS WITH THE CORPUS (distinct-string tables, vocabulary tables,
  * verified pair graphs). A forced `broadcast()` on such a frame is
  * correct and fast at gate scale and a driver/executor-memory killer at
  * 100 TB — every executor holds a full copy and the driver builds it.
  * The guard measures the actual row count (callers pass frames that are
  * already materialized — localCheckpoint / Memo — so the count is a
  * metadata-cheap action) and broadcasts only below a bound; above it
  * the frame is returned unhinted and Catalyst plans a shuffled
  * equi-join, which is the scale path.
  *
  * The hint-audit taxonomy for every other `broadcast(` site in this
  * repo (the bounded-frames list):
  *  - 1-row / O(1)-row totals and constants (`crossJoin(broadcast(...))`
  *    in Stats, Drift, TextAnalysis, SketchQueries, Contamination,
  *    Sampling): bounded by construction, never guarded.
  *  - frames bounded by a fixed domain — languages, probs, sketch cells,
  *    group budgets, per-slice bases (Packing, Sampling, CountMin,
  *    LlmQueries threshold tables): bounded by the domain, not the
  *    corpus; documented at each site.
  *  - TPC-H dimension tables: nation/region are spec-bounded (25/5
  *    rows) and stay forced broadcasts; customer/part scale with SF and
  *    ride [[broadcastIfSmall]] (joinBroadcastRevenue/joinPartRevenue) —
  *    the gate-scale plan shape (BroadcastHashJoin) is unchanged, the
  *    100 TB path shuffles.
  *  - corpus-growing frames (distinct strings, λ vocabulary, pair
  *    graphs): MUST come through [[broadcastIfSmall]] / [[fits]].
  */
object SizeGuard {

  /** Default row bound: 2^20 rows ≈ tens of MB for (string, long) rows —
    * comfortable for an explicit broadcast on any executor profile, and
    * small enough that 1000 executor copies stay irrelevant. Override
    * per-session with `graft.broadcast.maxRows` (tests use this to force
    * the over-threshold shuffle path on small fixtures). */
  val DefaultMaxRows: Long = 1L << 20

  def maxRows(spark: SparkSession): Long =
    spark.conf.getOption("graft.broadcast.maxRows").map(_.toLong)
      .getOrElse(DefaultMaxRows)

  /** True when a frame of `rows` rows may be broadcast in this session. */
  def fits(spark: SparkSession, rows: Long): Boolean = rows <= maxRows(spark)

  /** Broadcast `dim` only when its measured row count fits; otherwise
    * return it unhinted (Catalyst plans a shuffled equi-join). `dim`
    * should already be materialized — the count is an action. */
  def broadcastIfSmall(dim: DataFrame): DataFrame =
    if (fits(dim.sparkSession, dim.count())) broadcast(dim) else dim
}
