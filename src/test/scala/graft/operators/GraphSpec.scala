package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Fixed-point PageRank: hand-checked values on a tiny graph, the
  * partition-invariance contract, and the dangling/base-rank edge
  * cases. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  // triangle a-b-c plus pendant d attached to a (undirected, so both
  // directions are materialized)
  private def tinyEdges = Seq(
    ("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"),
    ("a", "c"), ("c", "a"), ("a", "d"), ("d", "a")
  ).toDF("src", "dst")

  test("pageRank matches the hand-unrolled fixed-point iteration") {
    val got = Graph.pageRank(tinyEdges, "src", "dst", iters = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    // replicate in exact integer arithmetic: rank0 = 1_000_000
    // outdeg: a=3, b=2, c=2, d=1
    def step(r: Map[String, Long]): Map[String, Long] = {
      val deg = Map("a" -> 3L, "b" -> 2L, "c" -> 2L, "d" -> 1L)
      val in = Map(
        "a" -> Seq("b", "c", "d"), "b" -> Seq("a", "c"),
        "c" -> Seq("a", "b"), "d" -> Seq("a"))
      in.map { case (n, srcs) =>
        val csum = srcs.map(s => r(s) / deg(s)).sum
        n -> (150000L + csum * 85L / 100L)
      }
    }
    val expected = step(step(Map("a" -> 1000000L, "b" -> 1000000L,
      "c" -> 1000000L, "d" -> 1000000L)))
    assert(got === expected)
  }

  test("pageRank is partition-invariant") {
    val e = tinyEdges
    val r1 = Graph.pageRank(e.repartition(1), "src", "dst", iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val r7 = Graph.pageRank(e.repartition(7, col("dst")), "src", "dst", iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(r1 === r7)
  }

  test("a node with in-edges but no out-edges is dropped; isolated base rank holds") {
    // directed: x -> y only; y never appears as src so it is dropped,
    // x keeps the base rank after one round (no in-edges)
    val e = Seq(("x", "y")).toDF("src", "dst")
    val got = Graph.pageRank(e, "src", "dst", iters = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("x" -> 150000L))
  }

  test("pageRankWeighted splits mass by edge weight exactly") {
    // a -> b (w 3), a -> c (w 1): after 1 iter b gets rank*3 div 4,
    // c gets rank div 4; b/c have no out-edges so only 'a' (base) and
    // the two targets... but targets never appear as src -> dropped.
    // Use a symmetric pair instead: a <-> b with w 2 and a <-> c w 1.
    val e = Seq(("a", "b", 2L), ("b", "a", 2L), ("a", "c", 1L), ("c", "a", 1L))
      .toDF("s", "d", "w")
    val got = Graph.pageRankWeighted(e, "s", "d", "w", iters = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // a receives full rank of b (2/2) and c (1/1): 150000 + 85% of 2_000_000
    // b receives 1_000_000*2 div 3; c receives 1_000_000 div 3
    assert(got("a") === 150000L + 2000000L * 85L / 100L)
    assert(got("b") === 150000L + (2000000L / 3L) * 85L / 100L)
    assert(got("c") === 150000L + (1000000L / 3L) * 85L / 100L)
  }

  test("triangleCensus counts the one triangle and its wedges on the pendant graph") {
    // triangle a-b-c plus pendant a-d: triangles = 1;
    // degrees a=3,b=2,c=2,d=1 -> wedges = 3+1+1+0 = 5; coeff = 3/5
    val pairs = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("a", "d")).toDF("x", "y")
    val row = Graph.triangleCensus(pairs, "x", "y").collect().head
    assert(row.getLong(0) === 1L)
    assert(row.getLong(1) === 5L)
    assert(math.abs(row.getDouble(2) - 0.6) < 1e-12)
  }

  test("triangleCensus: triangle-free graph has zero triangles, null coeff when no wedges") {
    val path = Seq(("a", "b"), ("b", "c")).toDF("x", "y") // one wedge, no triangle
    val r1 = Graph.triangleCensus(path, "x", "y").collect().head
    assert(r1.getLong(0) === 0L && r1.getLong(1) === 1L)
    val single = Seq(("a", "b")).toDF("x", "y") // no wedges at all
    val r2 = Graph.triangleCensus(single, "x", "y").collect().head
    assert(r2.getLong(0) === 0L && r2.getLong(1) === 0L && r2.isNullAt(2))
  }

  test("labelPropagation converges two disjoint triangles to their min labels") {
    def tri(a: Long, b: Long, c: Long) =
      Seq((a, b), (b, a), (b, c), (c, b), (a, c), (c, a))
    val e = (tri(1L, 2L, 3L) ++ tri(10L, 11L, 12L)).toDF("s", "d")
    val got = Graph.labelPropagation(e, "s", "d", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("labelPropagation is partition-invariant") {
    val e = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 4L), (4L, 3L))
      .toDF("s", "d")
    val r1 = Graph.labelPropagation(e.repartition(1), "s", "d", iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val r7 = Graph.labelPropagation(e.repartition(7), "s", "d", iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 === r7)
  }

  test("degrees counts both endpoints of a one-direction pair list") {
    val pairs = Seq(("a", "b"), ("a", "c")).toDF("x", "y")
    val got = Graph.degrees(pairs, "x", "y")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 2L, "b" -> 1L, "c" -> 1L))
  }
}
