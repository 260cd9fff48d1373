package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only scratch main for ad-hoc plan inspection. Not part of the
  * engine; edit freely (see .claude/skills/verify/SKILL.md). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"

    def dropCaches(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    val q = graft.SparkEntry.queries
    def passes(label: String, n: Int)(f: => Unit): Unit = {
      f; dropCaches() // warmup (memoized writes + codegen)
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime(); f; dropCaches(); (System.nanoTime() - t0) / 1e9
      }
      val spread = ts.max / ts.min
      println(f"$label%-28s ${ts.map(t => f"$t%.2f").mkString(", ")}  spread=${spread}%.2fx")
    }
    passes("winnow_candidate_pairs", 5) { q("winnow_candidate_pairs")(spark, dir).count() }
    passes("cross_dedup_batch", 5) { q("cross_dedup_batch")(spark, dir).count() }
    passes("kll_quantile_check", 5) { q("kll_quantile_check")(spark, dir).count() }
    passes("heavy_hitters_terms", 5) { q("heavy_hitters_terms")(spark, dir).count() }
    passes("kmv_overlap_docs", 5) { q("kmv_overlap_docs")(spark, dir).count() }
    passes("shard_profile_merge", 5) { q("shard_profile_merge")(spark, dir).count() }
    spark.stop()
  }
}
