package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FuzzySpec extends SparkSpec {

  /** Reference Levenshtein DP for brute-force ground truth. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(
        math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  // planted edit families around shared stems + unrelated strings
  private val words = Seq(
    "spark", "spork", "sparks", "spar", "stark", "shark",
    "kitten", "sitten", "sittin", "mitten", "kittens",
    "table", "cable", "tale", "tabled", "stable",
    "query", "quern", "queue", "quiet",
    "alpha", "omega", "delta", "gamma", "gamm", "gammaa",
    "", "a", "b", "ab", "ba")

  test("deletionVariants enumerates every <=k-deletion string including the input") {
    val s = spark
    import s.implicits._
    val got = Seq("abc").toDF("s")
      .select(Fuzzy.deletionVariants(col("s"), 1).as("v"))
      .collect().head.getSeq[String](0).toSet
    assert(got === Set("abc", "bc", "ac", "ab"))
    val got2 = Seq("abc").toDF("s")
      .select(Fuzzy.deletionVariants(col("s"), 2).as("v"))
      .collect().head.getSeq[String](0).toSet
    assert(got2 === Set("abc", "bc", "ac", "ab", "a", "b", "c"))
    // empty string: no positions to delete — just itself, no fabricated keys
    val empty = Seq("").toDF("s")
      .select(Fuzzy.deletionVariants(col("s"), 2).as("v"))
      .collect().head.getSeq[String](0).toSet
    assert(empty === Set(""))
  }

  test("fuzzyPairs equals brute-force Levenshtein pairs at maxDist 1 and 2") {
    val s = spark
    import s.implicits._
    val df = words.toDF("w")
    for (k <- Seq(1, 2)) {
      val got = Fuzzy.fuzzyPairs(df, "w", maxDist = k)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      val want = (for {
        a <- words; b <- words if a < b
        d = lev(a, b) if d <= k
      } yield (a, b, d.toLong)).toSet
      assert(got === want, s"maxDist=$k")
    }
  }

  test("size guard: over-threshold string tables resolve via shuffle join, same pairs") {
    val s = spark
    import s.implicits._
    val df = words.toDF("w")
    val want = Fuzzy.fuzzyPairs(df, "w", maxDist = 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // drop the guard bound to 0 AND disable Catalyst's stats-based auto
    // broadcast (at real scale the stats themselves rule it out; the tiny
    // fixture would otherwise re-broadcast on size)
    val prevAuto = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("graft.broadcast.maxRows", "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val guarded = Fuzzy.fuzzyPairs(df, "w", maxDist = 1)
      val plan = guarded.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        s"over-threshold resolution must not broadcast:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"over-threshold resolution must shuffle equi-join:\n$plan")
      val got = guarded
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(got === want)
    } finally {
      spark.conf.unset("graft.broadcast.maxRows")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevAuto)
    }
  }

  test("maxKeyDf guard drops pairs that only meet in hot variant keys") {
    val s = spark
    import s.implicits._
    // 6 single-char strings: every pair is distance 1 and meets ONLY in
    // the hot empty-string variant key (df = 6)
    val df = Seq("a", "b", "c", "d", "e", "f").toDF("w")
    assert(Fuzzy.fuzzyPairs(df, "w", 1).count() === 15)
    assert(Fuzzy.fuzzyPairs(df, "w", 1, maxKeyDf = 5).count() === 0)
  }

  test("sortedNeighborPairs: window bounds candidates, gaps and distances exact") {
    val s = spark
    import s.implicits._
    // sort order: aa, ab, ac, zz — window 2 pairs only adjacent ranks
    val df = Seq("ab", "zz", "aa", "ac").toDF("w")
    val w2 = Fuzzy.sortedNeighborPairs(df, "w", window = 2, maxDist = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    // (ac, zz) is adjacent but distance 2 at most? lev(ac,zz)=2 -> kept
    assert(w2 === Set(("aa", "ab", 1L, 1L), ("ab", "ac", 1L, 1L), ("ac", "zz", 1L, 2L)))
    // window 3 adds the gap-2 pair (aa, ac); (ab, zz) stays out at dist 2? lev(ab,zz)=2 kept
    val w3 = Fuzzy.sortedNeighborPairs(df, "w", window = 3, maxDist = 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(w3 === Set(("aa", "ab", 1L), ("ab", "ac", 1L), ("aa", "ac", 2L)))
    // distance cutoff verifies candidates: maxDist 1 drops (ac, zz)
    assert(!w3.exists(_._2 == "zz"))
  }
}
