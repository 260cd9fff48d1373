package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

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
    val dir = "/tmp/graft_sf10"
    val li = graft.sources.Tables.lineitem(spark, dir)
      .withColumn("grp",
        when(pmod(col("l_orderkey"), lit(5L)) === 0L, lit("HOT"))
          .otherwise(col("l_returnflag")))
      .select("grp", "l_orderkey", "l_linenumber", "l_extendedprice")
    val ord = Seq(col("l_extendedprice").desc, col("l_orderkey").asc,
      col("l_linenumber").asc)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(ord: _*)
    val plain = li.withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
    plain.explain("formatted")
    spark.stop()
  }
}
