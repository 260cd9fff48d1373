package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only scratch main for ad-hoc plan inspection. Not part of the
  * engine; edit freely (see .claude/skills/verify/SKILL.md). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = sys.env.getOrElse("Q", "kmeans_assign").split(',')
    for (name <- names; fn <- graft.SparkEntry.queries.get(name)) {
      fn(spark, dir).count() // warmup
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      println(f"TIMED $name ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    spark.stop()
  }
}
