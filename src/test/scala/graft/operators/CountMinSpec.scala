package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CountMinSpec extends SparkSpec {

  private val D = 3
  private val W = 64

  private def skewed = {
    val s = spark
    import s.implicits._
    // zipf-ish: key k appears 200/k times over 400 keys — heavy head,
    // long tail, far more keys than sketch width
    (1 to 400).flatMap(k => Seq.fill(200 / k max 1)(s"key-$k")).toDF("k")
  }

  test("sketch is bounded by d*w cells and conserves total mass per row") {
    val df = skewed
    val n = df.count()
    val sk = CountMin.sketch(df, col("k"), D, W)
    assert(sk.count() <= D.toLong * W)
    val perRow = sk.groupBy("row").agg(sum("cnt").as("m")).collect()
    assert(perRow.length === D && perRow.forall(_.getLong(1) === n))
  }

  test("estimates never undercount, and bound the error by e*n/w per row") {
    val df = skewed
    val n = df.count()
    val sk = CountMin.sketch(df, col("k"), D, W)
    val exact = df.groupBy("k").agg(count(lit(1)).as("exact"))
    val joined = CountMin.estimates(sk, exact.select("k"), "k", D, W)
      .join(exact, "k").select("k", "exact", "est").collect()
    assert(joined.length === 400)
    joined.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1), s"undercount at ${r.getString(0)}")
    }
    // the CMS guarantee holds per query w.p. 1-e^-d; with 400 queries a
    // few excursions are expected — check the 95th percentile instead
    val slack = math.ceil(math.E * n / W).toLong
    val overs = joined.map(r => r.getLong(2) - r.getLong(1)).sorted
    assert(overs(379) <= slack, s"p95 overcount ${overs(379)} > $slack")
  }

  test("merging per-shard sketches equals the sketch of the union") {
    val df = skewed.withColumn("shard", pmod(crc32(col("k")), lit(4)))
    val shards = (0 until 4).map(i =>
      CountMin.sketch(df.filter(col("shard") === i), col("k"), D, W))
    val merged = CountMin.merge(shards)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val whole = CountMin.sketch(df, col("k"), D, W)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(merged === whole)
  }

  test("inner product upper-bounds the exact equi-join size") {
    val df = skewed
    val sk = CountMin.sketch(df, col("k"), D, W)
    val est = CountMin.selfJoinSizeEstimate(sk).collect().head.getLong(0)
    val exact = df.groupBy("k").agg(count(lit(1)).as("c"))
      .agg(sum(col("c") * col("c"))).collect().head.getLong(0)
    assert(est >= exact)
    // sanity: the bound is not vacuous — within e*n^2/w of the truth
    val n = df.count().toDouble
    assert(est <= exact + math.E * n * n / W)
    // the general two-sided form agrees with the self form on A = B
    val est2 = CountMin.joinSizeEstimate(sk, sk).collect().head.getLong(0)
    assert(est2 === est)
    // and bounds a genuine two-table join: head half vs tail half
    val a = df.filter(length(col("k")) <= 5) // key-1..9 (heavy head)
    val b = df // full table
    val skA = CountMin.sketch(a, col("k"), D, W)
    val ab = CountMin.joinSizeEstimate(skA, sk).collect().head.getLong(0)
    val abExact = a.groupBy("k").agg(count(lit(1)).as("ca"))
      .join(b.groupBy("k").agg(count(lit(1)).as("cb")), "k")
      .agg(sum(col("ca") * col("cb"))).collect().head.getLong(0)
    assert(ab >= abExact)
  }
}
