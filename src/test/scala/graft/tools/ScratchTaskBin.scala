package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: attribute "Broadcasting large task binary" warnings to
  * queries by bracketing each query with stderr markers. */
object ScratchTaskBin {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def dropCaches(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      System.err.println(s"###QUERY $name")
      try { fn(spark, sfDir).count() } catch { case e: Throwable =>
        System.err.println(s"###FAIL $name ${e.getClass.getSimpleName}") }
      dropCaches()
    }
    spark.stop()
  }
}
