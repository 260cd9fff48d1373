package graft.operators

import org.apache.spark.sql.DataFrame

/** Partitioning guard for CPU-BOUND per-row extraction (char-n-gram
  * explosion, signature hashing): when the source is a small number of
  * parquet files, the scan yields fewer partitions than cores
  * (`spark.sql.files.maxPartitionBytes` ≈ 128 MB per split), and an
  * extraction that costs milliseconds per row runs on ONE core while 31
  * idle — measured 22.4 s for the sf≈1 language-ID trigram explode on a
  * single-file documents table vs ~1 s spread across local[32].
  *
  * The guard widens only when the source is NARROWER than the session's
  * parallelism: at cluster scale a 100 TB input is already thousands of
  * splits, so the branch is a no-op there and the shuffle it would cost
  * is never paid. Locally (and for any genuinely small single-file
  * input) the repartition moves only the source rows — text columns of
  * a corpus small enough to sit in one split — to unlock every core.
  * SAFETY CONTRACT — integer/set semantics only: the exchange changes
  * which rows each partial aggregate sees AND the final merge order, so
  * a consumer whose outputs round FLOATING-POINT accumulations (mean/
  * std/mad) can flip a rounding-boundary digit (measured: widening the
  * describe wide-agg flipped describe_long's rd6 mean — l_discount's
  * true mean is exactly 0.0499185, the verify-notes bridge class).
  * Callers must aggregate counts, distinct sets, maxima or other
  * order-insensitive values over the extracted rows (the language-ID
  * fit's doc-frequency counts are the model citizen). The determinism
  * grid's spark_partition_id prohibition is also unaffected — nothing
  * here derives ids from partitioning. */
object Parallelize {

  /** Repartition `df` to the session default parallelism when its
    * planned partitioning is narrower; otherwise return it unchanged. */
  def cpuBound(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
