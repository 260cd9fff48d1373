package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

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

    def dropCaches(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    def time(label: String)(f: => Unit): Unit = {
      f; dropCaches()
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; dropCaches(); (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-44s ${ts.min}%.3f s  (${ts.map(t => f"$t%.2f").mkString(", ")})")
    }

    import graft.operators.Profiles
    import graft.queries.QueryDef.r
    val li = graft.sources.Tables.lineitem(spark, dir)
    val cols = Seq("l_discount", "l_extendedprice", "l_quantity")
    val shard = pmod(conv(substring(md5(col("l_orderkey").cast("string")), 1, 4), 16, 10).cast("long"), lit(8L))

    def variant(checkpoint: Boolean) = {
      val m0 = Profiles.mergeProfiles(
        Profiles.shardProfiles(li, shard, cols, 200), Seq(0.5), 200)
        .select(col("col"), col("n"), col("n_null"), col("min"), col("max"),
          col("sum"), col("mean"), col("std"),
          element_at(col("q"), 1).as("med"), col("distinct_est"))
      val merged = if (checkpoint) m0.localCheckpoint(true) else m0
      val half = lit(0.5)
      val checks = Profiles.melt(li, lit(0L), cols)
        .join(broadcast(merged.select("col", "med", "distinct_est")), "col")
        .groupBy("col", "med", "distinct_est")
        .agg(count(when(col("v") < col("med"), 1)).as("lt"),
          count(when(col("v") <= col("med"), 1)).as("le"),
          countDistinct(col("v")).as("nd"),
          count(col("v")).as("nn"))
        .select(col("col"),
          ((col("lt") / col("nn") - 0.05 <= half) && (col("le") / col("nn") + 0.05 >= half)).as("median_ok"),
          (abs(col("distinct_est") / col("nd") - 1.0) <= 0.1).as("distinct_ok"))
      merged.select(col("col"), col("n"), col("n_null"),
        r(col("min"), 6).as("min"), r(col("max"), 6).as("max"),
        r(col("sum"), 2).as("sum"), r(col("mean"), 7).as("mean"), r(col("std"), 6).as("std"))
        .join(checks, "col").orderBy("col")
    }

    time("profile pass floor") { Profiles.shardProfiles(li, shard, cols).count() }
    time("variant NO barrier") { variant(false).count() }
    time("variant localCheckpoint") { variant(true).count() }
    time("variant NO barrier (2)") { variant(false).count() }
    time("variant localCheckpoint (2)") { variant(true).count() }
    spark.stop()
  }
}
