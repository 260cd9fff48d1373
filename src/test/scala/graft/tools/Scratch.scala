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
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; dropCaches(); (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-44s ${ts.min}%.3f s")
    }

    val li = graft.sources.Tables.lineitem(spark, dir)
    println("distinct l_extendedprice: " + li.select("l_extendedprice").distinct.count())
    println("distinct l_shipdate: " + li.select("l_shipdate").distinct.count())

    val q = graft.SparkEntry.queries
    time("describe_date_lineitem") { q("describe_date_lineitem")(spark, dir).count() }
    time("describe_numeric_lineitem") { q("describe_numeric_lineitem")(spark, dir).count() }
    time("describe_long_lineitem") { q("describe_long_lineitem")(spark, dir).count() }
    time("describe_bool_lineitem") { q("describe_bool_lineitem")(spark, dir).count() }

    // pieces: what does the date profile spend its time on?
    import graft.operators.Describe
    time("profile(l_shipdate) alone") {
      Describe.profile(li, Seq("l_shipdate")).size
    }
    time("profile(l_extendedprice) alone") {
      Describe.profile(li, Seq("l_extendedprice")).size
    }
    time("profile(l_extendedprice) forced bracket") {
      Describe.profile(li, Seq("l_extendedprice"), percentileBufferMaxDistinct = 0).size
    }
    time("profile(l_extendedprice) forced BUFFERED") {
      Describe.profile(li, Seq("l_extendedprice"),
        percentileBufferMaxDistinct = Long.MaxValue).size
    }
    time("profile(l_shipdate) forced bracket") {
      Describe.profile(li, Seq("l_shipdate"), percentileBufferMaxDistinct = 0).size
    }
    spark.stop()
  }
}
