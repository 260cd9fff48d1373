package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only scratch main for iterating locally. Not part of the engine. */
object Scratch {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[time] $label%-35s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = graft.SparkEntry.queries
    time("full describe sf0.01 (60k rows)")(println(q("describe_full_lineitem")(spark, "/root/testdata/sf0.01").count()))
    time("full describe sf0.1 (600k rows)")(println(q("describe_full_lineitem")(spark, "/root/testdata/sf0.1").count()))
    spark.stop()
  }
}
