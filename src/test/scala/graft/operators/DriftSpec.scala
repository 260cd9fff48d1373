package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DriftSpec extends SparkSpec {

  test("psi is ~0 for identically distributed slices, large for shifted ones") {
    val s = spark
    import s.implicits._
    // interleave ids so both slices see the same uniform values
    val same = (0 until 2000).map(i => (i.toLong, (i % 100).toDouble)).toDF("id", "v")
    val psiSame = Drift.psi(same, "v", pmod(col("id"), lit(2)) === 0)
      .head.getDouble(0)
    assert(psiSame < 0.01, s"identical slices must be stable, got $psiSame")
    // base uniform on [0,100), other shifted to [50,150) — a clear break
    val shifted = ((0 until 1000).map(i => (i.toLong, (i % 100).toDouble)) ++
      (1000 until 2000).map(i => (i.toLong, 50.0 + (i % 100)))).toDF("id", "v")
    val psiShift = Drift.psi(shifted, "v", col("id") < 1000)
      .head.getDouble(0)
    assert(psiShift > 0.25, s"a half-range shift must flag as a break, got $psiShift")
  }

  test("psi returns null counts-intact when one slice is empty, and ignores nulls") {
    val s = spark
    import s.implicits._
    val df = (0 until 100).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val row = Drift.psi(df, "v", lit(false)).head
    assert(row.isNullAt(0), "psi must be null for an empty base slice")
    assert(row.getLong(1) === 0L && row.getLong(2) === 100L)
    val withNulls = ((0 until 100).map(i => (i.toLong, Some(i.toDouble))) :+
      (100L, Option.empty[Double])).toDF("id", "v")
    val n = Drift.psi(withNulls, "v", col("id") < 50).head
    assert(n.getLong(1) + n.getLong(2) === 100L, "null values must be excluded")
  }

  test("statDrift reports per-column long-form deltas") {
    val s = spark
    import s.implicits._
    val base = Seq((1.0, 10.0), (2.0, 20.0), (3.0, 30.0)).toDF("a", "b")
    val other = Seq((2.0, 10.0), (3.0, 20.0), (4.0, 30.0), (5.0, 40.0)).toDF("a", "b")
    val out = Drift.statDrift(base, other, Seq("a", "b"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out.size === 8) // 2 columns x 4 metrics
    val (cb, co, cd) = out(("a", "count"))
    assert(cb === 3.0 && co === 4.0 && cd === 1.0)
    val (mb, mo, md) = out(("a", "mean"))
    assert(mb === 2.0 && mo === 3.5 && math.abs(md - 1.5) < 1e-12)
    assert(out(("b", "null_fraction"))._3 === 0.0)
  }

  test("jsd: identical slices = 0, disjoint slices = ln 2, empty slice = null") {
    val s = spark
    import s.implicits._
    // identical distributions across the split: every bin 50/50
    val same = (1 to 100).map(i => (i.toLong, (i % 10).toDouble)).toDF("id", "v")
    val z = Drift.jsDivergence(same, "v", col("id") <= 50).head
    assert(math.abs(z.getDouble(0)) < 1e-12)
    assert(z.getLong(1) === 50L && z.getLong(2) === 50L)
    // disjoint supports saturate at ln 2 (no epsilon blow-up)
    val disjoint = ((1 to 50).map(i => (i.toLong, 0.0)) ++
      (51 to 100).map(i => (i.toLong, 100.0))).toDF("id", "v")
    val d = Drift.jsDivergence(disjoint, "v", col("id") <= 50).head
    assert(math.abs(d.getDouble(0) - math.log(2.0)) < 1e-12, s"got ${d.getDouble(0)}")
    // one empty slice: null jsd, counts still reported
    val e = Drift.jsDivergence(same, "v", lit(true)).head
    assert(e.isNullAt(0) && e.getLong(1) === 100L && e.getLong(2) === 0L)
  }

  test("categorical psi: identical = 0, shifted > 0, tail pools, empty slice = null") {
    val s2 = spark
    import s2.implicits._
    // identical category mix on both sides of the split
    val same = (1 to 200).map(i => (i.toLong, s"c${i % 4}")).toDF("id", "cat")
    val z = Drift.categoricalPsi(same, "cat", col("id") <= 100).head
    assert(math.abs(z.getDouble(0)) < 1e-12)
    assert(z.getLong(1) === 100L && z.getLong(2) === 100L && z.getLong(3) === 4L)
    // a category present only in the base slice drives psi up
    val shifted = ((1 to 100).map(i => (i.toLong, "only_base")) ++
      (101 to 200).map(i => (i.toLong, "only_other"))).toDF("id", "cat")
    val d = Drift.categoricalPsi(shifted, "cat", col("id") <= 100).head
    assert(d.getDouble(0) > 10.0, s"disjoint categories must scream: ${d.getDouble(0)}")
    // tail pooling: 2000 singleton categories + one head category; with
    // maxShareDenom=100 every singleton (share 1/4000 < 1/100) pools,
    // leaving head + __other
    val longTail = ((1 to 2000).map(i => (i.toLong, s"u$i")) ++
      (2001 to 4000).map(i => (i.toLong, "head"))).toDF("id", "cat")
    val pooledRow = Drift.categoricalPsi(longTail, "cat", col("id") % 2 === 0,
      maxShareDenom = 100).head
    assert(pooledRow.getLong(3) === 2L, s"expected head + __other: $pooledRow")
    // empty base slice: null psi, counts intact; nulls excluded
    val withNull = (1 to 10).map(i =>
      (i.toLong, if (i == 1) null else "x")).toDF("id", "cat")
    val e = Drift.categoricalPsi(withNull, "cat", lit(false)).head
    assert(e.isNullAt(0) && e.getLong(1) === 0L && e.getLong(2) === 9L)
  }

  test("ks: identical = 0, disjoint = 1, hand case exact, empty slice = null") {
    val s2 = spark
    import s2.implicits._
    val same = (1 to 100).map(i => (i.toLong, (i % 10).toDouble)).toDF("id", "v")
    val z = Drift.ksDrift(same, "v", col("id") <= 50).head
    assert(math.abs(z.getDouble(0)) < 1e-15)
    assert(z.getLong(1) === 50L && z.getLong(2) === 50L)
    // fully separated supports: the gap reaches 1 at the base max
    val disjoint = ((1 to 50).map(i => (i.toLong, i.toDouble)) ++
      (51 to 100).map(i => (i.toLong, 1000.0 + i))).toDF("id", "v")
    val d = Drift.ksDrift(disjoint, "v", col("id") <= 50).head
    assert(math.abs(d.getDouble(0) - 1.0) < 1e-15)
    // hand case: base {1,2,3,4}, other {3,4,5,6} -> sup gap = 1/2 at x=2
    val hand = (Seq(1.0, 2.0, 3.0, 4.0).map(("b", _)) ++
      Seq(3.0, 4.0, 5.0, 6.0).map(("o", _))).zipWithIndex
      .map { case ((side, v), i) => (i.toLong, side, v) }.toDF("id", "side", "v")
    val h = Drift.ksDrift(hand, "v", col("side") === "b").head
    assert(math.abs(h.getDouble(0) - 0.5) < 1e-15, s"got ${h.getDouble(0)}")
    // empty other slice: null ks, counts intact
    val e = Drift.ksDrift(same, "v", lit(true)).head
    assert(e.isNullAt(0) && e.getLong(1) === 100L && e.getLong(2) === 0L)
  }

  test("ks by group: per-group statistics independent, empty-side group null") {
    val s2 = spark
    import s2.implicits._
    // group A: hand case with KS 1/2; group B: identical slices (KS 0);
    // group C: only base rows (null ks)
    val rows =
      (Seq(1.0, 2.0, 3.0, 4.0).map(("A", "b", _)) ++
        Seq(3.0, 4.0, 5.0, 6.0).map(("A", "o", _)) ++
        (1 to 10).flatMap(i => Seq(("B", "b", i.toDouble), ("B", "o", i.toDouble))) ++
        Seq(("C", "b", 1.0), ("C", "b", 2.0)))
        .zipWithIndex.map { case ((g, side, v), i) => (i.toLong, g, side, v) }
        .toDF("id", "g", "side", "v")
    val out = Drift.ksDriftByGroup(rows, "g", "v", col("side") === "b")
      .collect().map(r => r.getString(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Double]), r.getLong(2), r.getLong(3))).toMap
    assert(math.abs(out("A")._1.get - 0.5) < 1e-15, out.toString)
    assert(math.abs(out("B")._1.get) < 1e-15)
    assert(out("C")._1.isEmpty && out("C")._2 === 2L && out("C")._3 === 0L)
    // agrees with the global operator when restricted to one group
    val only = Drift.ksDrift(rows.filter(col("g") === "A"), "v",
      col("side") === "b").head.getDouble(0)
    assert(math.abs(only - out("A")._1.get) < 1e-15)
  }
}
