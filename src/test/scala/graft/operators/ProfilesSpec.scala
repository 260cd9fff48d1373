package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Shard-profile merge: the exact fields must be shard-partitioning
  * invariants equal to the whole-data stats; the sketch fields must meet
  * their error bounds after union. */
class ProfilesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = {
    val rnd = new scala.util.Random(17)
    Seq.tabulate(40000) { i =>
      (i.toLong,
        rnd.nextDouble() * 1000.0,
        (i % 97).toDouble,
        if (i % 10 == 0) Option.empty[Double] else Some(rnd.nextGaussian()))
    }.toDF("id", "a", "b", "c")
  }
  private val cols = Seq("a", "b", "c")

  test("merged exact fields equal whole-data stats for any shard count") {
    val global = df.select(
      count(col("a")).as("n_a"), sum("a").as("s_a"), avg("a").as("m_a"),
      stddev_samp(col("a")).as("sd_a"),
      count(col("c")).as("n_c"), stddev_samp(col("c")).as("sd_c")).head

    for (shards <- Seq(1, 2, 16)) {
      val merged = Profiles.mergeProfiles(
          Profiles.shardProfiles(df, pmod(col("id"), lit(shards.toLong)), cols), Seq(0.5))
        .collect().map(r => r.getString(0) -> r).toMap
      assert(merged("a").getAs[Long]("n") === global.getAs[Long]("n_a"))
      assert(math.abs(merged("a").getAs[Double]("sum") - global.getAs[Double]("s_a")) < 1e-6)
      assert(math.abs(merged("a").getAs[Double]("mean") - global.getAs[Double]("m_a")) < 1e-9)
      assert(math.abs(merged("a").getAs[Double]("std") - global.getAs[Double]("sd_a")) < 1e-8)
      // null accounting survives the merge
      assert(merged("c").getAs[Long]("n") === global.getAs[Long]("n_c"))
      assert(merged("c").getAs[Long]("n_null") === 4000L)
      assert(math.abs(merged("c").getAs[Double]("std") - global.getAs[Double]("sd_c")) < 1e-10)
    }
  }

  test("unioned sketches meet their bounds: KLL median rank ±2.5%, HLL distinct ±5%") {
    val merged = Profiles.mergeProfiles(
        Profiles.shardProfiles(df, pmod(col("id"), lit(8L)), cols), Seq(0.25, 0.5, 0.75))
      .collect().map(r => r.getString(0) -> r).toMap

    val aVals = df.select("a").as[Double].collect().sorted
    Seq(0.25, 0.5, 0.75).zipWithIndex.foreach { case (p, i) =>
      val est = merged("a").getSeq[Double](merged("a").fieldIndex("q"))(i)
      val rank = aVals.count(_ <= est).toDouble / aVals.length
      assert(math.abs(rank - p) <= 0.025, s"p=$p rank=$rank")
    }

    val exactDistinctA = df.select(countDistinct(col("a"))).head.getLong(0)
    val estA = merged("a").getAs[Long]("distinct_est").toDouble
    assert(math.abs(estA / exactDistinctA - 1.0) <= 0.05, s"hll $estA vs $exactDistinctA")
    // low-cardinality column: HLL is exact in sparse mode
    assert(merged("b").getAs[Long]("distinct_est") === 97L)
  }

  test("profile frame is small and profile-of-profiles is one narrow pass") {
    val prof = Profiles.shardProfiles(df, pmod(col("id"), lit(8L)), cols)
    assert(prof.count() === 8L * cols.length)
    // the merge reads only the profile frame, never df
    val merged = Profiles.mergeProfiles(prof, Seq(0.5))
    assert(merged.count() === cols.length.toLong)
  }
}
