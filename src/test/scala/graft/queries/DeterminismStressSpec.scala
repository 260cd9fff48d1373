package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Same-session replay stress for the prefix-sum consumers.
  *
  * Round 6 shipped an INTERMITTENT wrong answer: `mix_corpus` failed the
  * driver's hash gate while standalone replays were green, because slice
  * ids came from `spark_partition_id()` over a sampled range exchange —
  * whichever consumer re-instantiated the exchange could observe different
  * sampled boundaries. A flake by nature escapes single-run tests, so this
  * spec reproduces the driver's harness shape: the same SparkSession runs
  * each consumer query MANY times with caches dropped between runs, and
  * every run must produce the identical canonical result. With
  * deterministic-by-construction slice ids (Packing.deterministicSlice)
  * this is exact, not probabilistic. */
class DeterminismStressSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val Runs = 20

  private def dropCaches(): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
  }

  /** Order-insensitive canonical form of a query result. */
  private def canonical(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect().map(_.toString).sorted.mkString("\n")
  }

  for (q <- Seq("mix_corpus", "shuffle_order", "pack_sequences",
                "spearman_lineitem", "chunk_docs")) {
    test(s"$q is bit-identical across $Runs same-session runs with caches dropped") {
      val first = canonical(q)
      dropCaches()
      for (i <- 2 to Runs) {
        val again = canonical(q)
        dropCaches()
        assert(again === first, s"$q drifted on run $i of $Runs")
      }
    }

    test(s"$q is invariant under shuffle-partition count (cluster-topology proxy)") {
      // changing spark.sql.shuffle.partitions changes slice granularity,
      // exchange fan-out and task boundaries — results must not move
      val key = "spark.sql.shuffle.partitions"
      val orig = spark.conf.get(key)
      try {
        val results = Seq("2", "7", "23").map { parts =>
          spark.conf.set(key, parts)
          val r = canonical(q)
          dropCaches()
          r
        }
        assert(results.distinct.size === 1,
          s"$q differs across shuffle-partition counts 2/7/23")
      } finally spark.conf.set(key, orig)
    }
  }
}
