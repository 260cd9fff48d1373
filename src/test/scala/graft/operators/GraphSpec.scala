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

  test("degrees counts both endpoints of a one-direction pair list") {
    val pairs = Seq(("a", "b"), ("a", "c")).toDF("x", "y")
    val got = Graph.degrees(pairs, "x", "y")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 2L, "b" -> 1L, "c" -> 1L))
  }
}
