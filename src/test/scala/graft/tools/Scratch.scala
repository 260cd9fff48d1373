package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only scratch main for ad-hoc plan inspection. Not part of the
  * engine; edit freely (see the repo verify workflow). Current probe:
  * per-job wall/stage breakdown of a single query (r17 optimization
  * round) — which of a query's sequential jobs carry the time. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val qname = args.headOption.getOrElse("describe_numeric_lineitem")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Bench.quietAuditedWindowWarn()
    graft.Bench.quietAuditedCheckpointWarn()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    @volatile var stageCpu = Map.empty[Int, Long] // jobId -> cpuNs (approx: attribute by time)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.put(j.jobId, (System.nanoTime(),
          Option(j.properties.getProperty("spark.job.description")).getOrElse("") +
            " stages=" + j.stageInfos.size))
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val (t0, desc) = starts.getOrDefault(j.jobId, (0L, "?"))
        println(f"  job ${j.jobId}%3d ${(System.nanoTime() - t0) / 1e3}%9.0f us  $desc")
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        println(f"    stage ${i.stageId}%3d tasks=${i.numTasks}%3d cpu=${i.taskMetrics.executorCpuTime / 1e6}%8.1f ms run=${i.taskMetrics.executorRunTime}%6d ms  ${i.name.take(60)}")
      }
    }
    val fn = graft.SparkEntry.queries(qname)
    // warmup
    fn(spark, sfDir).count()
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    Thread.sleep(300)
    spark.sparkContext.addSparkListener(listener)
    println(s"=== $qname measured pass ===")
    val t0 = System.nanoTime()
    fn(spark, sfDir).count()
    println(f"TOTAL ${(System.nanoTime() - t0) / 1e9}%.3f s")
    Thread.sleep(500)
    spark.stop()
  }
}
