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

  // typed modality fixture: a categorical string (8 values, so MG with
  // capacity ≥ 8 is exact), an empty-able string with nulls, a date with
  // nulls, and two booleans (one all-null)
  private lazy val typed = Seq.tabulate(5000) { i =>
    (i.toLong,
      s"cat_${i % 8}",
      if (i % 13 == 0) null else if (i % 7 == 0) "" else s"v$i",
      if (i % 11 == 0) Option.empty[java.sql.Date]
      else Some(java.sql.Date.valueOf(s"2024-01-${i % 28 + 1}")),
      i % 3 == 0,
      Option.empty[Boolean])
  }.toDF("id", "cat", "txt", "d", "flag", "nob")

  test("string profiles: shard merge equals global ladder; MG top values exact under capacity") {
    for (shards <- Seq(1, 4, 16)) {
      val prof = Profiles.stringShardProfiles(typed, pmod(col("id"), lit(shards.toLong)),
        Seq("cat", "txt"), mgCapacity = 16)
      val m = Profiles.mergeStringProfiles(prof).collect()
        .map(r => r.getString(0) -> r).toMap
      // global ladder, computed directly
      assert(m("cat").getAs[Long]("n") === 5000L && m("cat").getAs[Long]("n_null") === 0L)
      assert(m("cat").getAs[Long]("n_empty") === 0L)
      assert(m("cat").getAs[Int]("len_min") === 5 && m("cat").getAs[Int]("len_max") === 5)
      assert(m("cat").getAs[Long]("len_sum") === 25000L)
      assert(math.abs(m("cat").getAs[Double]("avg_len") - 5.0) < 1e-12)
      assert(m("cat").getAs[Long]("distinct_est") === 8L) // sparse HLL is exact here
      val nNull = (0 until 5000).count(_ % 13 == 0)
      val nEmpty = (0 until 5000).count(i => i % 13 != 0 && i % 7 == 0)
      assert(m("txt").getAs[Long]("n") === (5000L - nNull))
      assert(m("txt").getAs[Long]("n_null") === nNull.toLong)
      assert(m("txt").getAs[Long]("n_empty") === nEmpty.toLong)
      assert(m("txt").getAs[Int]("len_min") === 0)
      // MG exact under capacity: merged top values are exact counts
      val top = Profiles.mergeTopValues(prof, 2).collect()
        .filter(_.getString(0) === "cat")
        .map(r => (r.getString(1), r.getLong(2), r.getInt(3)))
      // 5000 rows over 8 categories: cat_0..cat_7 get 625 each; ties break
      // by value asc
      assert(top.toSeq === Seq(("cat_0", 625L, 1), ("cat_1", 625L, 2)))
    }
  }

  test("date profiles: shard merge equals global count/null/min/max") {
    for (shards <- Seq(1, 4, 16)) {
      val m = Profiles.mergeDateProfiles(
          Profiles.dateShardProfiles(typed, pmod(col("id"), lit(shards.toLong)), Seq("d")))
        .collect().head
      val nNull = (0 until 5000).count(_ % 11 == 0)
      assert(m.getAs[Long]("n") === (5000L - nNull))
      assert(m.getAs[Long]("n_null") === nNull.toLong)
      assert(m.getAs[java.sql.Date]("min") === java.sql.Date.valueOf("2024-01-01"))
      assert(m.getAs[java.sql.Date]("max") === java.sql.Date.valueOf("2024-01-28"))
    }
  }

  test("pair profiles: merged covariance/correlation equal whole-data values; planted r=1") {
    val s = spark
    import s.implicits._
    val global = df.agg(covar_samp(col("a"), col("b")).as("cov"),
      corr(col("a"), col("b")).as("r")).head
    for (shards <- Seq(1, 4, 16)) {
      val m = Profiles.mergePairProfiles(
          Profiles.pairShardProfiles(df, pmod(col("id"), lit(shards.toLong)), "a", "b"))
        .head
      assert(m.getLong(0) === 40000L)
      assert(math.abs(m.getAs[Double]("cov_samp") - global.getDouble(0)) <
        math.abs(global.getDouble(0)) * 1e-10 + 1e-10, s"shards=$shards")
      assert(math.abs(m.getAs[Double]("corr") - global.getDouble(1)) < 1e-10)
    }
    // planted exact linear relation: merged r = 1 whatever the sharding
    val lin = (1 to 999).map(i => (i.toLong, i.toDouble, 3.0 * i + 7.0)).toDF("id", "x", "y")
    val r1 = Profiles.mergePairProfiles(
      Profiles.pairShardProfiles(lin, pmod(col("id"), lit(7L)), "x", "y")).head
    assert(math.abs(r1.getAs[Double]("corr") - 1.0) < 1e-12)
    // degenerate: constant side yields null corr, not DIVIDE_BY_ZERO
    val const = (1 to 10).map(i => (i.toLong, 5.0, i.toDouble)).toDF("id", "x", "y")
    val d = Profiles.mergePairProfiles(
      Profiles.pairShardProfiles(const, lit(0L), "x", "y")).head
    assert(d.isNullAt(d.fieldIndex("corr")))
  }

  test("shard drift screen flags a planted unit-switched shard from profiles alone") {
    val s = spark
    import s.implicits._
    // 8 shards of N(~const) values; shard 5's upstream "switched units"
    val rnd = new scala.util.Random(7)
    val drifted = Seq.tabulate(8000) { i =>
      val shard = i % 8
      val base = 50.0 + rnd.nextGaussian()
      (i.toLong, if (shard == 5) base * 100.0 else base)
    }.toDF("id", "v")
    val prof = Profiles.shardProfiles(drifted, pmod(col("id"), lit(8L)), Seq("v"))
    val out = Profiles.shardDriftScreen(prof, zThreshold = 2.0).collect()
      .map(r => r.getLong(1) -> r.getBoolean(6)).toMap
    assert(out(5L) && out.filterKeys(_ != 5L).values.forall(!_),
      s"only the planted shard flags: $out")
    // degenerate single-shard frame: z and flagged stay null-safe
    val one = Profiles.shardProfiles(drifted.filter(col("id") % 8 === 0),
      lit(0L), Seq("v"))
    val row = Profiles.shardDriftScreen(one, 2.0).collect().head
    assert(row.isNullAt(row.fieldIndex("z")))
  }

  test("bool profiles: shard merge equals global true-count; all-null column rates null") {
    for (shards <- Seq(1, 4, 16)) {
      val m = Profiles.mergeBoolProfiles(
          Profiles.boolShardProfiles(typed, pmod(col("id"), lit(shards.toLong)),
            Seq("flag", "nob")))
        .collect().map(r => r.getString(0) -> r).toMap
      val nTrue = (0 until 5000).count(_ % 3 == 0)
      assert(m("flag").getAs[Long]("n") === 5000L)
      assert(m("flag").getAs[Long]("n_true") === nTrue.toLong)
      assert(math.abs(m("flag").getAs[Double]("true_rate") - nTrue / 5000.0) < 1e-12)
      assert(m("nob").getAs[Long]("n") === 0L && m("nob").isNullAt(m("nob").fieldIndex("true_rate")))
    }
  }
}
