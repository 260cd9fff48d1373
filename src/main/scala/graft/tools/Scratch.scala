package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scratch main for ad-hoc plan inspection. Not part of the
  * engine; edit freely (see .claude/skills/verify/SKILL.md). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.001")
    println("DTYPE " + li.schema("l_shipdate").dataType)
    li.select(min("l_shipdate"), max("l_shipdate")).show(false)
    println("LT-DATE " + li.filter(col("l_shipdate") < lit("1995-01-01").cast("date")).count())
    println("LT-NTZ  " + li.filter(col("l_shipdate") < to_timestamp_ntz(lit("1995-01-01"))).count())
    spark.stop()
  }
}
