package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics as chained DataFrame joins.
  *
  * The reference engine has no graph surface; this extends the repo's
  * dedup connected-components machinery (`Dedup.connectedComponents`)
  * with the other staple of corpus-graph curation: PageRank-style
  * centrality over a similarity/co-occurrence graph (used to pick
  * canonical documents inside near-dup clusters and to weight sources
  * in mixing).
  *
  * Scale shape: one iteration = one equi-join (edges ⋈ ranks on `src`)
  * plus one grouped sum on `dst` — both shuffles key on node ids, so a
  * cluster co-partitions the standing edge frame once and every
  * iteration reuses that layout. The edge frame is checkpointed ONCE
  * up front; every rank frame is `localCheckpoint`ed so the plan stays
  * O(1) per iteration instead of growing exponentially with the loop
  * (the classic iterative-DataFrame failure mode). No driver-side
  * state: ranks never leave the cluster.
  */
object Graph {

  /** Fixed-iteration PageRank (Page et al. 1999, the `0.15 + 0.85·Σ`
    * form with rank₀ = 1) in INTEGER FIXED-POINT: ranks are carried as
    * BIGINT multiples of 1/`scale`, every per-edge contribution is an
    * exact integer division and every fan-in a long sum. Floating-point
    * PageRank is not partition-invariant (the Σ over in-neighbors is an
    * order-dependent double sum); the fixed-point form is — long
    * addition commutes exactly — so the result is a pure function of
    * the edge set under ANY partitioning, the same reproducibility
    * contract the repo's prefix-sum/packing operators keep
    * (DeterminismStressSpec). Resolution is 1/scale per hop, plenty for
    * ranking/weighting use.
    *
    * `edges` must carry BOTH directions of an undirected edge (or the
    * true directions of a directed graph). Fixed iteration count — no
    * convergence test. Nodes never appearing as `src` are dropped
    * (they'd hold the base rank and contribute nothing).
    */
  def pageRank(
      edges: DataFrame,
      src: String,
      dst: String,
      iters: Int = 5,
      dampingPct: Int = 85,
      scale: Long = 1000000L): DataFrame = {
    require(dampingPct > 0 && dampingPct < 100, "dampingPct in (0,100)")
    val e = edges.select(col(src).as("src"), col(dst).as("dst"))
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // standing (src, dst, outdeg) frame: paid once, joined every round
    val ed = e.join(deg, "src").localCheckpoint()
    val nodes = e.select(col("src").as("node")).distinct().localCheckpoint()
    val base = scale * (100L - dampingPct) / 100L
    var ranks = nodes.withColumn("rank", lit(scale))
    for (_ <- 1 to iters) {
      val contribs = ed.join(ranks, col("src") === col("node"))
        .select(col("dst").as("node"), expr("rank div outdeg").as("c"))
        .groupBy("node").agg(sum("c").as("csum"))
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr(s"(coalesce(csum, 0L) * $dampingPct) div 100"))
            .as("rank"))
        .localCheckpoint()
    }
    ranks
  }

  /** Undirected degree census per node over a one-direction pair list. */
  def degrees(pairs: DataFrame, a: String, b: String): DataFrame =
    pairs.select(col(a).as("node"))
      .unionAll(pairs.select(col(b).as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
}
