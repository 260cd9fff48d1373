package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

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
    val dir = "/root/testdata/sf0.001"
    graft.sources.Tables.customer(spark, dir).createOrReplaceTempView("customer")
    graft.sources.Tables.orders(spark, dir).createOrReplaceTempView("orders")
    val df = spark.sql(
      """SELECT c.c_custkey, o.o_orderkey, o.o_price
        |FROM customer c,
        |LATERAL (
        |  SELECT o_orderkey, o_price FROM (
        |    SELECT o_orderkey,
        |      floor(o_totalprice * 100 + 0.5) / 100 AS o_price,
        |      row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |    FROM orders
        |    WHERE o_custkey = c.c_custkey)
        |  WHERE rn <= 2) o
        |WHERE c.c_custkey % 10 = 0
        |ORDER BY c.c_custkey, o.o_price DESC, o.o_orderkey""".stripMargin)
    println(df.queryExecution.explainString(ExplainMode.fromString("simple")))
    df.show(6, false)
  }
}
