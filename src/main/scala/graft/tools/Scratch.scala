package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only scratch main for iterating locally. Not part of the engine. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"

    val events = graft.sources.Tables.events(spark, sf)
    events.printSchema()
    events.show(3, truncate = false)

    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val rep = graft.core.Report(li, key = Some("l_orderkey"))
    rep.describe(Seq("l_extendedprice", "l_returnflag", "l_shipdate")).foreach { p =>
      println(s"== ${p.column} (${p.contentType})")
      p.stats.foreach { case (k, v) => println(f"  $k%-15s $v") }
    }
    rep.introduce().show(30, truncate = false)
    spark.stop()
  }
}
