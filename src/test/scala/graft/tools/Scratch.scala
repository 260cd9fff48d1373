package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only scratch main for ad-hoc plan inspection. Not part of the
  * engine; edit freely (see the repo verify workflow). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Bench.quietAuditedWindowWarn()
    graft.Bench.quietAuditedCheckpointWarn()
    val dir = "/tmp/graft_sf1"

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
      println(f"$label%-28s ${ts.map(t => f"$t%.2f").mkString(", ")}")
    }
    for (name <- Seq("quality_filter_by_lang", "quality_regression",
        "corpus_filter", "pipeline_funnel", "novelty_docs", "term_burstiness",
        "repeated_spans_docs", "contamination_pairs", "decon_spans",
        "geo_sliver", "text_quality"))
      passes(name, 2) { q(name)(spark, dir).count() }
    spark.stop()
  }
}
