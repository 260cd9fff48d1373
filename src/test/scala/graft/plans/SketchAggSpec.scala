package graft.plans

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** KLL quantile sketch + Misra–Gries frequent-items: error contracts,
  * mergeability, serialization. Data is seeded-PRNG synthetic so the
  * assertions are replayable. */
class SketchAggSpec extends SparkSpec {
  import spark.implicits._

  private def exactRank(sorted: Array[Double], x: Double): Double = {
    // normalized inclusive rank: |{v <= x}| / n
    var lo = 0; var hi = sorted.length
    while (lo < hi) { val m = (lo + hi) >>> 1; if (sorted(m) <= x) lo = m + 1 else hi = m }
    lo.toDouble / sorted.length
  }

  private def rankErr(sorted: Array[Double], p: Double, est: Double): Double = {
    // distance from p to the [rank(v < est), rank(v <= est)] interval
    var lo = 0; var hi = sorted.length
    while (lo < hi) { val m = (lo + hi) >>> 1; if (sorted(m) < est) lo = m + 1 else hi = m }
    val rLt = lo.toDouble / sorted.length
    val rLe = exactRank(sorted, est)
    if (p < rLt) rLt - p else if (p > rLe) p - rLe else 0.0
  }

  private val probs = Seq(0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99)

  test("KllState: rank error <= 2.5% at k=200 on uniform and heavy-tailed streams") {
    val rnd = new scala.util.Random(42)
    for (data <- Seq(
        Array.fill(60000)(rnd.nextDouble()),
        Array.fill(60000)(math.exp(4.0 * rnd.nextGaussian())), // heavy tail
        Array.tabulate(60000)(i => (i % 50).toDouble))) { // discrete, massy values
      val st = new KllState(200)
      data.foreach(st.update)
      val sorted = data.sorted
      probs.foreach { p =>
        val e = rankErr(sorted, p, st.quantile(p))
        assert(e <= 0.025, s"rank error $e at p=$p")
      }
      assert(st.n === data.length)
    }
  }

  test("KllState: merge of disjoint shards meets the same bound, any merge order") {
    val rnd = new scala.util.Random(7)
    val data = Array.fill(80000)(rnd.nextGaussian())
    val shards = data.grouped(10000).toArray
    val sketches = shards.map { s => val st = new KllState(200); s.foreach(st.update); st }
    // left fold and reversed fold — both must satisfy the contract
    for (order <- Seq(sketches, sketches.reverse)) {
      val merged = new KllState(200)
      order.foreach(s => merged.merge(KllState.deserialize(s.serialize()))) // merge consumes
      assert(merged.n === data.length)
      val sorted = data.sorted
      probs.foreach { p =>
        val e = rankErr(sorted, p, merged.quantile(p))
        assert(e <= 0.025, s"merged rank error $e at p=$p")
      }
    }
  }

  test("KllState: serialization round-trips exactly and stays sublinear in n") {
    val rnd = new scala.util.Random(3)
    val st = new KllState(200)
    Array.fill(100000)(rnd.nextDouble()).foreach(st.update)
    val bytes = st.serialize()
    val back = KllState.deserialize(bytes)
    probs.foreach(p => assert(back.quantile(p) === st.quantile(p)))
    assert(back.n === st.n)
    // ~k log(n/k) doubles, not n: the whole point of the sketch
    assert(bytes.length < 100000, s"sketch is ${bytes.length} bytes for n=100000")
  }

  test("kll_quantiles and kll_sketch/kll_union agree through DataFrames") {
    val rnd = new scala.util.Random(11)
    val data = Seq.fill(20000)(rnd.nextDouble() * 100.0)
    val df = data.zipWithIndex.map { case (v, i) => (i % 16, v) }.toDF("g", "v")
    val direct = df.agg(KllSketchAgg.kllQuantiles(col("v"), probs, 200)).head
      .getSeq[Double](0)
    val viaUnion = df.groupBy("g")
      .agg(KllSketchAgg.kllSketch(col("v"), 200).as("sk"))
      .agg(KllSketchAgg.kllUnionQuantiles(col("sk"), probs, 200)).head
      .getSeq[Double](0)
    val sorted = data.toArray.sorted
    probs.zipWithIndex.foreach { case (p, i) =>
      assert(rankErr(sorted, p, direct(i)) <= 0.025, s"direct p=$p")
      assert(rankErr(sorted, p, viaUnion(i)) <= 0.025, s"union p=$p")
    }
    // nulls and NaNs are skipped, not ranked
    val withJunk = df.union(Seq((99, Double.NaN)).toDF("g", "v"))
      .union(Seq((99, Option.empty[Double])).toDF("g", "v"))
    val est = withJunk.agg(KllSketchAgg.kllQuantiles(col("v"), Seq(0.5), 200)).head.getSeq[Double](0)
    assert(rankErr(sorted, 0.5, est.head) <= 0.025)
  }

  test("FreqItemsAgg: guaranteed superset of items above n/(capacity+1), counts are lower bounds") {
    val rnd = new scala.util.Random(5)
    // Zipf-ish: item i with weight ~ 1/(i+1); far more distinct items than capacity
    val universe = 5000
    val stream = Array.fill(120000) {
      val u = rnd.nextDouble()
      s"item_${math.min(universe - 1, math.floor(math.exp(u * math.log(universe.toDouble))).toInt - 1)}"
    }
    val cap = 64
    val exact = stream.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val sketch = stream.toSeq.toDF("t").repartition(8)
      .agg(FreqItemsAgg.freqItems(col("t"), cap)).head
      .getSeq[Row](0).map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = stream.length.toLong
    val blind = n / (cap + 1)
    exact.filter(_._2 > blind).keys.foreach { hh =>
      assert(sketch.contains(hh), s"heavy hitter $hh (cnt=${exact(hh)}) missing")
    }
    sketch.foreach { case (item, est) =>
      assert(est <= exact(item), s"$item over-counted: $est > ${exact(item)}")
      assert(exact(item) - est <= blind, s"$item error ${exact(item) - est} > $blind")
    }
    assert(sketch.size <= cap)
  }

  test("weighted KLL tracks exact weighted quantiles; bit-decomposition equals replication") {
    val rnd = new scala.util.Random(29)
    val rows = Array.fill(20000)((rnd.nextDouble() * 1000.0, 1L + rnd.nextInt(20)))
    // exact weighted rank over the expanded distribution
    val sorted = rows.sortBy(_._1)
    val total = rows.map(_._2).sum
    def weightedErr(p: Double, est: Double): Double = {
      var lt = 0L; var le = 0L
      sorted.foreach { case (v, w) => if (v < est) lt += w; if (v <= est) le += w }
      val (rLt, rLe) = (lt.toDouble / total, le.toDouble / total)
      if (p < rLt) rLt - p else if (p > rLe) p - rLe else 0.0
    }
    val st = new KllState(200)
    rows.foreach { case (v, w) => st.updateWeighted(v, w) }
    assert(st.n === total)
    probs.foreach { p =>
      assert(weightedErr(p, st.quantile(p)) <= 0.025, s"weighted p=$p")
    }
    // replicated stream: same distribution, bound must also hold, and the
    // two sketches must agree with each other within combined bounds
    val repl = new KllState(200)
    rows.foreach { case (v, w) => var i = 0L; while (i < w) { repl.update(v); i += 1 } }
    assert(repl.n === total)
    probs.foreach { p =>
      assert(weightedErr(p, repl.quantile(p)) <= 0.025, s"replicated p=$p")
    }
    // zero weight contributes nothing
    val z = new KllState(200)
    z.updateWeighted(42.0, 0L)
    assert(z.n === 0L)
    // weighted sketch unions with an unweighted one
    st.merge(repl)
    assert(st.n === 2L * total)
    probs.foreach(p => assert(weightedErr(p, st.quantile(p)) <= 0.025, s"merged p=$p"))
  }

  test("kllWeightedQuantiles through DataFrames: length-biased median shifts right") {
    // values 1..100 each with weight = value: weighted median ~ 71
    // (sum(1..x) >= 0.5*sum(1..100) at x = 71), unweighted median ~ 50
    val df = (1 to 100).map(i => (i.toDouble, i.toLong)).toDF("v", "w")
    val wq = df.agg(KllSketchAgg.kllWeightedQuantiles(col("v"), col("w"), Seq(0.5), 200))
      .head.getSeq[Double](0).head
    val uq = df.agg(KllSketchAgg.kllQuantiles(col("v"), Seq(0.5), 200))
      .head.getSeq[Double](0).head
    assert(math.abs(wq - 71.0) <= 3.0, s"weighted median $wq")
    assert(math.abs(uq - 50.0) <= 3.0, s"unweighted median $uq")
  }

  test("KmvSketchAgg: pure function of the hash set — partition/order invariant") {
    val rnd = new scala.util.Random(19)
    val hashes = Seq.fill(50000)(rnd.nextLong() >>> 4) // non-negative 60-bit
    val expected = hashes.distinct.sorted.take(512)
    for (parts <- Seq(1, 7, 32); data <- Seq(hashes, hashes.reverse)) {
      val got = data.toDF("h").repartition(parts)
        .agg(KmvSketchAgg.kmvSketch(col("h"), 512)).head.getSeq[Long](0)
      assert(got === expected, s"parts=$parts")
    }
  }

  test("KMV overlap estimates meet ~1/sqrt(k) error; under-full sketches are exact") {
    val s = spark
    import graft.operators.Contamination
    // |A|=40000, |B|=25000, |A∩B|=10000 — ids hashed to uniform longs
    def h(i: Int): Long = {
      var z = i.toLong + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      (z ^ (z >>> 31)) >>> 4
    }
    val a = (0 until 40000).map(h).toDF("h")
    val b = (30000 until 55000).map(h).toDF("h")
    val k = 1024
    val row = Contamination.kmvOverlapEstimate(a, col("h"), b, col("h"), k).head
    val tol = 5.0 / math.sqrt(k) // ~0.156 relative
    assert(math.abs(row.getAs[Double]("d_a_est") / 40000.0 - 1.0) <= tol)
    assert(math.abs(row.getAs[Double]("d_b_est") / 25000.0 - 1.0) <= tol)
    assert(math.abs(row.getAs[Double]("d_union_est") / 55000.0 - 1.0) <= tol)
    assert(math.abs(row.getAs[Double]("d_inter_est") / 10000.0 - 1.0) <= 2 * tol)
    assert(math.abs(row.getAs[Double]("jaccard_est") - 10000.0 / 55000.0) <= 0.05)
    // sets smaller than k: everything exact
    val smallA = (0 until 600).map(h).toDF("h")
    val smallB = (400 until 900).map(h).toDF("h")
    val ex = Contamination.kmvOverlapEstimate(smallA, col("h"), smallB, col("h"), k).head
    assert(ex.getAs[Double]("d_a_est") === 600.0)
    assert(ex.getAs[Double]("d_b_est") === 500.0)
    assert(ex.getAs[Double]("d_union_est") === 900.0)
    assert(math.abs(ex.getAs[Double]("d_inter_est") - 200.0) < 1e-9)
    assert(math.abs(ex.getAs[Double]("jaccard_est") - 200.0 / 900.0) < 1e-12)
  }

  test("exactHeavyHitters equals the full groupBy answer despite a lossy sketch") {
    val rnd = new scala.util.Random(13)
    val words = Array.tabulate(400)(i => s"w$i")
    val docs = Seq.tabulate(300) { d =>
      // per doc: skewed draws so a few words clear 1.5% share, most don't
      (d, Seq.fill(80)(words(math.min(399, (math.abs(rnd.nextGaussian()) * 25).toInt))).mkString(" "))
    }.toDF("doc_id", "text")
    val fast = graft.operators.TextAnalysis
      .exactHeavyHitters(docs, "text", minShare = 0.015, sketchCapacity = 80)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val toks = docs.select(explode(graft.operators.TextAnalysis.tokens(col("text"))).as("t"))
    val n = toks.count()
    val slow = toks.groupBy("t").count()
      .filter(col("count").cast("double") > lit(n * 0.015))
      .orderBy(col("count").desc, col("t").asc)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(fast.toSeq === slow.toSeq)
    assert(fast.nonEmpty) // the test must actually exercise the threshold
  }
}
