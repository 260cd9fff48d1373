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
    // cumulative-chain cost of the pipeline funnel (each closure is
    // self-contained; differences give per-stage costs)
    import org.apache.spark.sql.functions._
    import graft.operators.{Contamination, Dedup, TextAnalysis}
    import graft.sources.Tables
    def docs = Tables.documents(spark, dir).select("doc_id", "lang", "text")
    val Stopwords = Seq("the", "a", "of", "and", "to")
    def ddF = Dedup.exact(docs, Seq("text"), "doc_id")
      .select("doc_id", "lang", "text").localCheckpoint()
    def gatedF(dd: org.apache.spark.sql.DataFrame) = {
      val quality = TextAnalysis.qualityMetrics(dd, "doc_id", "text", Stopwords)
        .select(col("doc_id"),
          (floor(col("quality_score") * 1e6 + 0.5) / 1e6).as("qs"))
      dd.join(quality, Seq("doc_id"))
        .filter(col("lang").isin("en", "de") &&
          TextAnalysis.tokenCount(col("text")).between(5, 180) && col("qs") >= 0.5)
        .select("doc_id", "lang", "text").localCheckpoint()
    }
    passes("A dedup+ckpt", 2) { ddF.count() }
    passes("B +quality+ckpt", 2) { gatedF(ddF).count() }
    passes("C +bloomKeep", 2) {
      val bench = docs.filter(col("doc_id") % 31 === 0).select("doc_id", "text")
      Contamination.bloomKeep(gatedF(ddF), bench, "doc_id", "text", 8).count()
    }
    passes("D full funnel", 3) { q("pipeline_funnel")(spark, dir).count() }
    spark.stop()
  }
}
