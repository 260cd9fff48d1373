package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Contiguous sequence packing for LLM training batches: documents are
  * laid end-to-end in a deterministic total order and the token stream is
  * chunked into fixed-size context windows ("concat-and-chunk" packing).
  * Each document gets its global token start offset, its window (seq_id),
  * and a flag for whether it straddles a window boundary.
  *
  * The global running sum is the scale problem: a single
  * `Window.orderBy(id)` moves the whole table into ONE partition (Spark
  * even warns "No Partition Defined for Window operation"). This
  * implementation is the two-phase shape that survives 100 TB:
  *
  *   1. range-repartition by id, so each partition holds a contiguous id
  *      span; the local running sum is a window PER PARTITION — parallel;
  *   2. the per-partition token totals (one row per partition) are
  *      cumulated on a single tiny partition and broadcast back as each
  *      partition's base offset.
  *
  * The result depends only on the total order of `idCol`, not on where
  * the range partitioner happened to place boundaries, so the output is
  * deterministic even though the partitioning is sampled.
  *
  * Greedy never-split packing (close the window when the next document
  * would overflow) requires a running sum with data-dependent resets —
  * inherently sequential, not a window function. Contiguous packing is
  * what large-scale training pipelines use precisely because it is a
  * pure prefix sum; documents longer than the budget simply span
  * multiple windows.
  */
object Packing {

  /** Fixed-size token-window chunking with overlap — the other standard
    * training-example shape (RAG indexing, long-doc splitting): each
    * document is cut into windows of `size` tokens starting every
    * `stride` tokens (stride < size ⇒ overlapping context). Chunk k
    * covers tokens [k·stride, k·stride + size); starts run while they
    * still index a token, so the final chunk may be short. Token-less
    * documents emit no chunks.
    *
    * Scale shape: tokenize → generate chunk ids (sequence + explode) →
    * slice — one narrow, fully codegen'd stage; no shuffle, no UDF, and
    * chunk rows never leave the partition that read the document. */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
      size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0, s"size/stride must be positive, got $size/$stride")
    require(stride <= size, s"stride $stride > size $size would skip tokens")
    val toks = TextAnalysis.tokens(col(textCol))
    df.select(col(idCol), toks.as("_t"))
      .withColumn("_n", org.apache.spark.sql.functions.size(col("_t")))
      .filter(col("_n") > 0)
      .select(col(idCol),
        explode(sequence(lit(0), floor((col("_n") - 1) / stride).cast("int")))
          .as("chunk_id"),
        col("_t"))
      .select(col(idCol), col("chunk_id"),
        array_join(slice(col("_t"), col("chunk_id") * stride + 1, lit(size)), " ")
          .as("chunk_text"),
        org.apache.spark.sql.functions
          .size(slice(col("_t"), col("chunk_id") * stride + 1, lit(size)))
          .cast("long").as("n_chunk_tokens"))
  }

  /** PER-GROUP exclusive prefix sum of `valueCol` in `orderCol` order —
    * [[packContiguous]]'s two-phase shape generalized to grouped running
    * sums (the building block for per-source token budgeting, grouped
    * packing, per-domain cumulative caps). A plain
    * `Window.partitionBy(group).orderBy(order)` puts each WHOLE group in
    * one task — groups like "source" or "language" are low-cardinality
    * and huge, the same hot-key shape GroupTopK exists to avoid. Here:
    *
    *   1. range-repartition by (group, order) so each partition holds a
    *      contiguous slice of one-or-more groups; the local running sum
    *      windows over (group, partition) — parallel;
    *   2. per-(group, partition) totals (groups × partitions rows,
    *      tiny) are cumulated per group and broadcast back as bases.
    *
    * `orderCol` must be unique within its group (it is the total order
    * that makes the sum deterministic). Adds `cumBeforeCol`. */
  def groupedPrefixSum(df: DataFrame, groupCol: String, orderCol: String,
      valueCol: String, cumBeforeCol: String = "cum_before"): DataFrame = {
    val parts = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = df.repartitionByRange(parts, col(groupCol), col(orderCol))
      .withColumn("_pid", spark_partition_id())
    val local = Window.partitionBy(groupCol, "_pid").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // persist() is CORRECTNESS here, not caching: this plan feeds both
    // the offsets aggregation and the final join, and repartitionByRange
    // SAMPLES its boundaries with a seed derived from the physical RDD —
    // two separate instantiations of the exchange can draw DIFFERENT
    // boundaries, making _pid disagree between the branches and
    // attaching base offsets to the wrong slices (caught at sf0.1:
    // shuffle_order drifted by whole-slice deltas; invisible at small
    // SFs where the sample always captures every row). Materializing one
    // copy pins a single partitioning for every consumer — and halves
    // the compute. Bench/Verify drop the blocks between queries.
    val withLocal = ranged.withColumn("_local_cum", sum(col(valueCol)).over(local))
      .persist()
    // ordered by each slice's min ORDER value, never by partition id
    val offsets = withLocal.groupBy(groupCol, "_pid")
      .agg(min(col(orderCol)).as("_min_o"), sum(col(valueCol)).as("_ptotal"))
    val offW = Window.partitionBy(groupCol).orderBy("_min_o")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bases = offsets
      .withColumn("_base", sum(col("_ptotal")).over(offW) - col("_ptotal"))
      .select(col(groupCol), col("_pid"), col("_base"))
    withLocal.join(broadcast(bases), Seq(groupCol, "_pid"))
      .withColumn(cumBeforeCol, col("_base") + col("_local_cum") - col(valueCol))
      .drop("_pid", "_local_cum", "_base")
  }

  /** Pack by a precomputed token-count column. Returns the input columns
    * plus start_offset (global tokens before this doc), seq_id
    * (floor(start_offset / budget)) and crosses_boundary (true when the
    * document's tokens span two or more windows). */
  def packContiguous(df: DataFrame, idCol: String, tokenCol: String,
      budget: Int): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val parts = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = df.repartitionByRange(parts, col(idCol))
      .withColumn("_pid", spark_partition_id())
    // phase 1: per-partition running sum — parallel across partitions
    val local = Window.partitionBy("_pid").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // persist() pins ONE sampled range partitioning for both consumers —
    // see groupedPrefixSum for the cross-instantiation _pid hazard this
    // prevents (whole-slice base drift, caught at sf0.1)
    val withLocal = ranged.withColumn("_local_cum",
      sum(col(tokenCol)).over(local))
      .persist()
    // phase 2: one row per partition; cumulate on the tiny side and
    // broadcast the base offsets back. Ordered by each partition's min
    // id, not _pid, so correctness never leans on partition-id order.
    val offsets = withLocal.groupBy("_pid")
      .agg(min(col(idCol)).as("_min_id"), sum(col(tokenCol)).as("_ptotal"))
    val offW = Window.orderBy("_min_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bases = offsets
      .withColumn("_base", sum(col("_ptotal")).over(offW) - col("_ptotal"))
      .select("_pid", "_base")
    val packed = withLocal.join(broadcast(bases), Seq("_pid"))
      .withColumn("start_offset", col("_base") + col("_local_cum") - col(tokenCol))
      .withColumn("seq_id", floor(col("start_offset") / budget.toLong))
      .withColumn("crosses_boundary",
        col(tokenCol) > 0 &&
          floor((col("start_offset") + col(tokenCol) - 1) / budget.toLong) > col("seq_id"))
    packed.drop("_pid", "_local_cum", "_base")
  }
}
