package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Train/eval decontamination: find training documents that share word
  * n-grams with a benchmark/eval set (the standard 13-gram overlap check
  * run before LLM training; n is a parameter here).
  *
  * Scale shape: the corpus side is the 100 TB table, the benchmark side
  * is a few thousand eval documents (MBs). Both sides are reduced to
  * DISTINCT n-gram ROWS (codegen'd posexplode + window lead — see
  * [[Dedup.shingleRows]]); the benchmark gram set is then BROADCAST, so
  * the corpus grams are matched map-side with no shuffle of the big side
  * at all. The per-document aggregation that follows shuffles only
  * (id, flag) pairs with map-side combine.
  *
  * Not in the reference (petk is a single-table profiler); this is part
  * of the mandated training-data-pipeline surface (SURVEY.md §2.C).
  */
object Contamination {

  /** Per-pair overlap: (corpus_id, bench_id, n_shared) for every
    * corpus/bench document pair sharing at least one distinct word
    * n-gram. Exact — a pair is counted from a shared-gram equi-join,
    * never a similarity estimate. */
  def overlapPairs(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    val cg = Dedup.shingleRows(corpus, idCol, textCol, n)
    val bg = Dedup.shingleRows(bench, idCol, textCol, n)
    cg.select(col("id").as("corpus_id"), col("s"))
      .join(broadcast(bg.select(col("id").as("bench_id"), col("s"))), Seq("s"))
      .groupBy("corpus_id", "bench_id")
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Per-document contamination report: for every corpus document with at
    * least one n-gram found anywhere in the benchmark set, its distinct
    * n-gram count, the number of those grams that are contaminated, and
    * the contaminated fraction. One broadcast left join + one hash
    * aggregation over the corpus gram rows. */
  def report(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    val cg = Dedup.shingleRows(corpus, idCol, textCol, n)
    val bset = Dedup.shingleRows(bench, idCol, textCol, n)
      .select("s").distinct().withColumn("hit", lit(1L))
    cg.join(broadcast(bset), Seq("s"), "left")
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("hit"), lit(0L))).as("n_contaminated"))
      .withColumn("contamination",
        col("n_contaminated").cast("double") / col("n_grams"))
      .filter(col("n_contaminated") > 0)
  }
}
