package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only scratch main for ad-hoc plan inspection. Not part of the
  * engine; edit freely (see the repo verify workflow). Current probe:
  * un-memoized BPE fit cost vs corpus scale (the query rides the Memo,
  * so ScaleBench times the memo READ — this times the FIT). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq("/root/testdata/sf0.1", "/tmp/graft_sf1")) {
      val docs = graft.sources.Tables.documents(spark, dir)
      // warm the input
      docs.count()
      (1 to 2).foreach { pass =>
        val t0 = System.nanoTime()
        val m = graft.operators.TextAnalysis.bpeFitMerges(docs, "text", 10)
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"""{"probe":"bpe_fit_unmemoized","dir":"$dir","pass":$pass,"sec":$dt%.3f,"rules":${m.size}}""")
      }
    }
    spark.stop()
  }
}
