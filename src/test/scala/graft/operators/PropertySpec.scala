package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}

import graft.SparkSpec

/** Property-based invariants over randomized inputs — the operators whose
  * correctness argument is an algebraic claim (equivalence, exactness,
  * idempotence) get that claim checked across generated cases, not just
  * hand-picked fixtures. Sizes are kept small: each property still runs
  * Spark jobs. */
class PropertySpec extends SparkSpec {

  private val smallN = 6 // scalacheck cases per property (Spark jobs are slow)

  private def check(prop: Prop, minSuccessful: Int): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default
        .withMinSuccessfulTests(minSuccessful).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }

  test("GroupTopK equals the ranked window for random data, k and salts") {
    val s = spark
    import s.implicits._
    val gen = for {
      n <- Gen.choose(1, 120)
      keys <- Gen.choose(1, 4)
      k <- Gen.choose(1, 6)
      salts <- Gen.oneOf(1, 3, 16)
      seed <- Gen.choose(0L, 1000L)
    } yield (n, keys, k, salts, seed)
    check(Prop.forAllNoShrink(gen) { case (n, keys, k, salts, seed) =>
      val rnd = new scala.util.Random(seed)
      val df = (1 to n).map(i => (i.toLong, s"k${rnd.nextInt(keys)}", rnd.nextInt(5)))
        .toDF("id", "key", "score")
      val w = Window.partitionBy("key").orderBy(col("score").desc, col("id").asc)
      val expected = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k)
        .select("key", "rn", "id").orderBy("key", "rn").collect().toSeq
      val actual = GroupTopK.topKSalted(df, Seq("key"),
        Seq(col("score").desc, col("id").asc), k, salts = salts)
        .select("key", "rn", "id").orderBy("key", "rn").collect().toSeq
      actual == expected
    }, smallN)
  }

  test("streaming Welford state matches the batch two-pass variance") {
    val gen = for {
      n <- Gen.choose(2, 60)
      seed <- Gen.choose(0L, 1000L)
    } yield (n, seed)
    check(Prop.forAllNoShrink(gen) { case (n, seed) =>
      val rnd = new scala.util.Random(seed)
      val xs = Seq.fill(n)(rnd.nextDouble() * 100 - 50)
      // fold through the same per-element merge the streaming state uses
      var cnt = 0L; var mean = 0.0; var m2 = 0.0
      xs.foreach { v =>
        cnt += 1; val d = v - mean; mean += d / cnt; m2 += d * (v - mean)
      }
      val variance = m2 / (cnt - 1)
      val mu = xs.sum / n
      val expectedVar = xs.map(x => (x - mu) * (x - mu)).sum / (n - 1)
      math.abs(mean - mu) < 1e-9 && math.abs(variance - expectedVar) < 1e-6
    }, 20)
  }

  test("jaccard is exact set algebra for random token sets") {
    val s = spark
    import s.implicits._
    val gen = for {
      a <- Gen.listOfN(12, Gen.choose(0, 9))
      b <- Gen.listOfN(12, Gen.choose(0, 9))
    } yield (a.map(i => s"t$i"), b.map(i => s"t$i"))
    check(Prop.forAllNoShrink(gen) { case (a, b) =>
      val sa = a.toSet; val sb = b.toSet
      val expected = sa.intersect(sb).size.toDouble / sa.union(sb).size
      val got = Seq((a.distinct, b.distinct)).toDF("a", "b")
        .select(Dedup.jaccard(col("a"), col("b"))).head().getDouble(0)
      math.abs(got - expected) < 1e-12
    }, smallN)
  }

  test("transverse mercator is monotone and symmetric inside the zone") {
    import graft.functions.Projections
    val utm = Projections.forEpsg(32633).get // CM 15E
    val gen = for {
      lat <- Gen.choose(-80.0, 80.0)
      dLon <- Gen.choose(0.01, 2.9)
    } yield (lat, dLon)
    check(Prop.forAllNoShrink(gen) { case (lat, dLon) =>
      val (xe, ye) = utm(15 + dLon, lat)
      val (xw, yw) = utm(15 - dLon, lat)
      val eastOfCm = xe > 500000 && xw < 500000
      val symmetric = math.abs((xe - 500000) + (xw - 500000)) < 1e-4
      val sameNorthing = math.abs(ye - yw) < 1e-4
      eastOfCm && symmetric && sameNorthing
    }, 50)
  }

  test("prefix sum equals the global window for arbitrary numeric and string keys") {
    val s = spark
    import s.implicits._
    // unique order keys (the operator's contract), arbitrary magnitudes
    // incl. negatives and sub-unit spans; value weights 0..9
    val gen = for {
      n <- Gen.choose(1, 80)
      scale <- Gen.oneOf(1e-6, 1.0, 1e9)
      offset <- Gen.oneOf(-1e9, -1.0, 0.0, 3.14)
      seed <- Gen.choose(0L, 10000L)
      asString <- Gen.oneOf(true, false)
    } yield (n, scale, offset, seed, asString)
    check(Prop.forAllNoShrink(gen) { case (n, scale, offset, seed, asString) =>
      val rnd = new scala.util.Random(seed)
      val keys = rnd.shuffle((1 to n).toList).map(i => i * scale + offset)
      val rows = keys.map(k => (k, rnd.nextInt(10).toLong))
      val df =
        // %.17e round-trips doubles: %.9e collapsed 1e-6 steps at 1e9
        // magnitude into DUPLICATE ids, breaking the unique-key contract
        // (and making the reference window's tie order nondeterministic)
        if (asString) rows.map { case (k, v) => (f"k${k}%.17e", v) }.toDF("id", "tok")
        else rows.toDF("id", "tok")
      val out = Packing.packContiguous(df.repartition(1 + rnd.nextInt(7)), "id", "tok",
          budget = Int.MaxValue)
        .select("id", "start_offset").orderBy("id").collect()
        .map(r => (r.get(0), r.getLong(1))).toSeq
      val w = Window.orderBy("id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val ref = df.select(col("id"), coalesce(sum("tok").over(w), lit(0L)).as("o"))
        .orderBy("id").collect().map(r => (r.get(0), r.getLong(1))).toSeq
      out == ref
    }, smallN)
  }

  test("null normalization is idempotent") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.types.{DoubleType, StringType}
    val gen = Gen.listOfN(8, Gen.oneOf[Any]("x", "null", "", null, "ok"))
    check(Prop.forAllNoShrink(gen) { vals =>
      val df = vals.map(v => Option(v).map(_.toString).orNull).toDF("s")
      val once = df.select(
        graft.core.Report.normalize(col("s"), StringType, Nil).as("s"))
      val twice = once.select(
        graft.core.Report.normalize(col("s"), StringType, Nil).as("s"))
      once.collect().map(_.getString(0)).toSeq ==
        twice.collect().map(_.getString(0)).toSeq
    }, smallN)
  }

  test("fuzzyPairs equals brute-force Levenshtein over random strings at k=1 and k=2") {
    val s = spark
    import s.implicits._
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(
          math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val gen = for {
      n <- Gen.choose(5, 30)
      maxLen <- Gen.choose(1, 8)
      alpha <- Gen.choose(2, 3) // tiny alphabet -> dense near-pairs
      k <- Gen.oneOf(1, 2)
      seed <- Gen.choose(0L, 10000L)
    } yield (n, maxLen, alpha, k, seed)
    check(Prop.forAllNoShrink(gen) { case (n, maxLen, alpha, k, seed) =>
      val rnd = new scala.util.Random(seed)
      val words = (1 to n).map(_ =>
        new String(Array.fill(rnd.nextInt(maxLen + 1))(('a' + rnd.nextInt(alpha)).toChar)))
        .distinct
      val got = Fuzzy.fuzzyPairs(words.toDF("w"), "w", maxDist = k)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      val want = (for {
        a <- words; b <- words if a < b
        d = lev(a, b) if d <= k
      } yield (a, b, d.toLong)).toSet
      got == want
    }, smallN)
  }
}
