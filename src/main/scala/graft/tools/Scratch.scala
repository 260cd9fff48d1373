package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only scratch main for ad-hoc plan inspection. Not part of the
  * engine; edit freely (see .claude/skills/verify/SKILL.md). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    graft.SparkEntry.queries.get(sys.env.getOrElse("Q", "q1_agg")).foreach { fn =>
      val df = fn(spark, dir)
      df.explain("formatted")
      df.show(5, truncate = false)
    }
    spark.stop()
  }
}
