package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Dev-only scratch main for ad-hoc plan inspection. Not part of the
  * engine; edit freely (see .claude/skills/verify/SKILL.md). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val li = graft.sources.Tables.lineitem(spark, dir)
    val c = "l_extendedprice"

    def time(label: String)(f: => Unit): Unit = {
      // warm once, then best of 2
      f
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-40s ${ts.min}%.3f s")
    }

    println("distinct count: " + li.select(c).distinct.count())

    time("pass1 wide moments agg") {
      li.agg(count(lit(1)), count(col(c)), min(col(c)), max(col(c)),
        avg(col(c)), stddev_samp(col(c)), var_samp(col(c)),
        kurtosis(col(c)), skewness(col(c)), sum(col(c)),
        count(when(col(c) === 0, 1))).head()
    }
    time("freq build + count only") {
      li.filter(col(c).isNotNull).groupBy(col(c).cast(DoubleType).as("v"))
        .agg(count(lit(1)).as("f")).agg(count(lit(1))).head()
    }
    time("freq + weighted percentile") {
      li.filter(col(c).isNotNull).groupBy(col(c).cast(DoubleType).as("v"))
        .agg(count(lit(1)).as("f"))
        .agg(count(lit(1)),
          percentile(col("v"), typedLit(Seq(0.05, 0.25, 0.5, 0.75, 0.95)), col("f"))).head()
    }
    time("freq + weighted percentile + weighted mad") {
      li.filter(col(c).isNotNull).groupBy(col(c).cast(DoubleType).as("v"))
        .agg(count(lit(1)).as("f"))
        .agg(count(lit(1)),
          percentile(col("v"), typedLit(Seq(0.05, 0.25, 0.5, 0.75, 0.95)), col("f")),
          (sum(col("f") * abs(col("v") - lit(38237.15))) / sum(col("f"))).as("mad")).head()
    }
    time("mad raw-row scan") {
      li.agg(avg(abs(col(c).cast(DoubleType) - lit(38237.15)))).head()
    }
    spark.stop()
  }
}
