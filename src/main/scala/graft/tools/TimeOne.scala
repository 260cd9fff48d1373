package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only single-query timer (same methodology as Bench: warmup pass,
  * then best-of-2). Usage:
  *   sbt "runMain graft.tools.TimeOne <query> [sfDir] [passes]"
  * Not part of the engine (see the repo verify workflow). */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "q1_agg"
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val passes = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    def dropCaches(): Unit = { // mirror Bench: every pass self-contained
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    fn(spark, dir).count() // warmup: plan + codegen compile
    dropCaches()
    val times = (1 to passes).map { _ =>
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      val s = (System.nanoTime() - t0) / 1e9
      dropCaches()
      println(f"$name%s: $s%.3f s ($n rows)")
      s
    }
    println(f"best: ${times.min}%.3f s")
    spark.stop()
  }
}
