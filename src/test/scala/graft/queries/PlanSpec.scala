package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

import graft.SparkSpec

/** Physical-plan audits: the optimizations the engine is designed around
  * must actually appear in the executed plans (SURVEY.md §4.2) — filter
  * and projection pushdown into the parquet scan, broadcast joins for
  * dimensions, TakeOrderedAndProject for global top-k, partial (map-side)
  * aggregation, and whole-stage codegen on the hot paths. Guards against
  * regressions that stay correct but stop scaling. */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("filter_project pushes predicate and projection into the parquet scan") {
    val plan = planOf(RelationalQueries.filterProject(spark, dir))
    assert(plan.contains("PushedFilters:"))
    assert(plan.contains("GreaterThanOrEqual(l_quantity,45.0)"))
    // column pruning: the scan reads exactly the 4 projected columns
    val readSchema = plan.linesIterator.find(_.trim.startsWith("ReadSchema:")).get
    assert(readSchema.contains("l_quantity") && readSchema.contains("l_discount"))
    assert(!readSchema.contains("l_extendedprice") && !readSchema.contains("l_shipdate"))
  }

  test("star join broadcasts every dimension — no sort-merge join") {
    val plan = planOf(RelationalQueries.joinBroadcastRevenue(spark, dir))
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("star join customer falls back to shuffle past the size bound") {
    // customer scales with SF; above graft.broadcast.maxRows the SizeGuard
    // must yield a shuffled equi-join (the 100 TB path). nation/region stay
    // broadcast — they are spec-bounded, so BroadcastHashJoin may appear;
    // the assert is that a shuffle join carries the o_custkey = c_custkey key.
    val prevAuto = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("graft.broadcast.maxRows", "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = planOf(RelationalQueries.joinBroadcastRevenue(spark, dir))
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"over-bound customer join must shuffle:\n$plan")
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"), plan)
    } finally {
      spark.conf.unset("graft.broadcast.maxRows")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevAuto)
    }
  }

  test("part revenue join: broadcast below the bound, shuffle above it") {
    val below = planOf(RelationalQueries.joinPartRevenue(spark, dir))
    assert(below.contains("BroadcastHashJoin"),
      s"gate-scale part dim must broadcast:\n$below")
    val prevAuto = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("graft.broadcast.maxRows", "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val above = planOf(RelationalQueries.joinPartRevenue(spark, dir))
      assert(above.contains("SortMergeJoin") || above.contains("ShuffledHashJoin"),
        s"over-bound part join must shuffle:\n$above")
      assert(!above.contains("BroadcastHashJoin"),
        s"over-bound part must not broadcast:\n$above")
    } finally {
      spark.conf.unset("graft.broadcast.maxRows")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevAuto)
    }
  }

  test("global top-k plans TakeOrderedAndProject, not a full sort") {
    val plan = planOf(RelationalQueries.topkOrders(spark, dir))
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("q3 shipping priority: pushed filters, hash joins only, distributed top-10") {
    val plan = planOf(RelationalQueries.q3ShippingPriority(spark, dir))
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-10 must be distributed top-k, not a global sort:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"equi-joins only:\n$plan")
    // the segment and both date filters reach the scans
    assert(plan.contains("PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)")
      || plan.contains("EqualTo(c_mktsegment,BUILDING)"), s"segment filter must push:\n$plan")
  }

  test("partition_pruned_join injects a dynamic partition pruning filter into the scan") {
    val plan = planOf(RelationalQueries.partitionPrunedJoin(spark, dir))
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"the selective dim join must prune fact partitions at runtime:\n$plan")
    // and the fact scan is the partitioned layout (event_type is a
    // partition column, not a data column)
    assert(plan.contains("PartitionFilters"), s"expected partition filters:\n$plan")
  }

  test("q18 aggregate-as-filter: distributed top-20, hash joins only") {
    val plan = planOf(RelationalQueries.q18LargeOrders(spark, dir))
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-20 must be distributed top-k:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"equi-joins only:\n$plan")
  }

  test("q9 product profit: nation broadcasts, no nested-loop join anywhere") {
    val plan = planOf(RelationalQueries.q9ProductProfit(spark, dir))
    assert(plan.contains("BroadcastHashJoin"), s"nation must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"equi-joins only:\n$plan")
    // the part-name filter reaches the part scan
    assert(plan.contains("StringContains(p_name,red)"),
      s"part filter must push:\n$plan")
  }

  test("q1 aggregation is partial+final hash agg (map-side combine)") {
    val plan = planOf(RelationalQueries.q1Agg(spark, dir))
    // partial aggregation: two HashAggregate nodes around the exchange
    // (WholeStageCodegen spans only appear in the post-execution AQE plan)
    assert("HashAggregate".r.findAllIn(plan).size >= 2)
    assert(plan.contains("Exchange"))
  }

  test("semi and anti joins plan as join types, not filters over subquery scans") {
    val semi = planOf(RelationalQueries.joinSemiCustomers(spark, dir))
    assert(semi.contains("LeftSemi"))
    val anti = planOf(RelationalQueries.joinAntiCustomers(spark, dir))
    assert(anti.contains("LeftAnti"))
  }

  test("scaled group top-k never sorts a whole group in one task") {
    // simple mode prints root-first, so the LAST key exchange in the text
    // is the deepest one — the exchange over the full table
    val plan = RelationalQueries.windowTopkScaled(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    val keyExchanges = plan.linesIterator
      .filter(l => l.contains("hashpartitioning") && l.contains("o_orderpriority"))
      .toSeq
    assert(keyExchanges.nonEmpty)
    assert(keyExchanges.last.contains("__salt"),
      s"the full-data exchange must include the salt:\n${keyExchanges.last}")
    // both phases plan as ranked windows
    assert("\\bWindow\\b".r.findAllIn(plan).size >= 2)
  }

  test("native group top-k plans a partial WindowGroupLimit before the exchange") {
    // GroupTopK.topK relies on Catalyst's two-phase group-limit: a
    // Partial WindowGroupLimit must cap every input partition at k rows
    // per group BEFORE the key exchange (the map-side pruning that makes
    // the plain window scale-safe — measured faster than hand-salting,
    // BASELINE.md round 12), with the Final limit + window after it.
    val df = graft.operators.GroupTopK.topK(
      graft.sources.Tables.orders(spark, dir),
      Seq("o_orderpriority"),
      Seq(org.apache.spark.sql.functions.col("o_totalprice").desc,
        org.apache.spark.sql.functions.col("o_orderkey").asc), k = 3)
    val plan = df.queryExecution.explainString(ExplainMode.fromString("simple"))
    assert("WindowGroupLimit".r.findAllIn(plan).size >= 2,
      s"expected partial+final WindowGroupLimit:\n$plan")
    assert(!plan.contains("__salt"), "the native plan must not salt")
  }

  test("large-k group top-k routes to the explicit salted plan") {
    // past spark.sql.optimizer.windowGroupLimitThreshold Catalyst cannot
    // infer a group limit — the plain window would be the single-task
    // straggler, so topK must hand the call to topKSalted (ADVICE r12)
    val threshold = spark.conf
      .get("spark.sql.optimizer.windowGroupLimitThreshold", "1000").toInt
    val df = graft.operators.GroupTopK.topK(
      graft.sources.Tables.orders(spark, dir),
      Seq("o_orderpriority"),
      Seq(org.apache.spark.sql.functions.col("o_totalprice").desc,
        org.apache.spark.sql.functions.col("o_orderkey").asc),
      k = threshold + 1)
    val plan = df.queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(plan.contains("__salt"),
      s"k above the group-limit threshold must salt:\n$plan")
  }

  test("skew join splits hot keys onto a salted branch and unions the plain branch") {
    val df = RelationalQueries.skewJoinEvents(spark, dir)
    val plan = planOf(df)
    // split-and-union physical shape: the salted branch replicates the
    // hot dim rows via explode(sequence(0, buckets-1)), the plain branch
    // keeps the untouched join, and a Union merges them
    assert(plan.contains("Union"), plan)
    assert(plan.toLowerCase.contains("explode"), plan)
    assert(plan.contains("__salt"), plan)
    // detection fires at this SF: exactly the three planted hot keys
    import org.apache.spark.sql.functions.{col, lit, pmod, when}
    val k = when(pmod(col("user_id"), lit(97)) === 0, lit(null))
      .otherwise(when(pmod(col("user_id"), lit(10)) < 6,
        pmod(col("user_id"), lit(3))).otherwise(col("user_id")))
    val fact = graft.sources.Tables.events(spark, dir)
      .select(k.cast("long").as("k"), col("value"))
    val hot = graft.operators.SkewJoin.hotKeys(fact, "k", 0.05)
    // the three PLANTED hot keys are above threshold at every SF; at
    // smoke SF the natural user ids are few enough that some of them
    // legitimately cross 5% too — subset, not equality
    assert(Set[Any](0L, 1L, 2L).subsetOf(hot.toSet), s"hot=$hot")
  }

  test("range join keeps the equi key as the join key with the range as post-condition") {
    val plan = planOf(RelationalQueries.rangeJoinEvents(spark, dir))
    // equi part hashed (broadcast or shuffled), never a pure nested loop
    assert(plan.contains("HashJoin"))
  }

  test("banded range join without an equi key still plans an equi join, never a nested loop") {
    val plan = planOf(RelationalQueries.rangeJoinBanded(spark, dir))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"banded plan fell back to a nested loop:\n$plan")
    assert(plan.contains("Join") && plan.contains("__band"))
  }

  test("Q5-shape deep join broadcasts the tiny dims and pushes the region filter") {
    val plan = planOf(RelationalQueries.q5RegionRevenue(spark, dir))
    // nation and region ride broadcast joins; the selective r_name filter
    // reaches the region parquet scan, not a post-join Filter
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      s"nation and region must broadcast:\n$plan")
    assert(plan.contains("EqualTo(r_name,ASIA)"), "r_name filter must push to the scan")
    // the date filter prunes orders at the scan
    assert(plan.contains("o_orderdate"), "order-date predicate must reach the orders side")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("semantic decon joins on the bucket key, never a cartesian") {
    val plan = planOf(LlmQueries.semanticDecon(spark, dir))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"LSH bucketing must stay an equi-join:\n$plan")
    assert(plan.contains("__bucket"), "bucket key must be the join key")
    // semanticDedupKeep's bucket join is invisible to explain (connected
    // components localCheckpoints eagerly, truncating lineage), so only
    // the candidate generator is asserted here — it shares this code path
  }

  test("tfidf cosine pairs: postings materialized once, no cartesian/NLJ in the pair plan") {
    val plan = planOf(LlmQueries.tfidfCosinePairs(spark, dir))
    assert(!plan.contains("CartesianProduct"))
    // the posting table is localCheckpointed (r17: the lazy persist
    // pinned all four consumer stages at full shuffle width and let the
    // concurrently-submitted consumers race the first materialization):
    // all four consuming branches (both pair-join sides + both norm
    // lookups) must read the SAME materialized RDD — visible as
    // checkpoint scans, never a re-derived tf/idf lineage.
    val scans = "(?m)^\\(\\d+\\) Scan ExistingRDD".r.findAllIn(plan).size
    assert(scans >= 4, s"posting checkpoint must be read by all four branches (got $scans scans):\n$plan")
    // the designed 1-row n_docs cross-broadcast now lives INSIDE the
    // checkpointed lineage (paid once at materialization), so the pair
    // plan itself must contain NO nested-loop join at all
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"no NLJ may survive in the post-checkpoint pair plan:\n$plan")
    assert(plan.contains("term"), "postings must join on the term")
  }

  test("lateral top-orders decorrelates to an ORDERED ranked-window join, no per-row re-execution") {
    val plan = RelationalQueries.lateralTopOrders(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    // decorrelated: a window + filter + hash join, never a nested loop
    // re-executing the subquery per outer row
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"lateral must decorrelate, not nested-loop:\n$plan")
    assert(plan.contains("BroadcastHashJoin"))
    val winLine = plan.linesIterator.find(_.contains("row_number()")).get
    // the window spec must CARRY its ordering (o_totalprice DESC): the
    // ORDER BY + LIMIT decorrelation plants an order-less row_number over
    // a pre-sorted child, whose top-2 pick rides on sort order surviving
    // a hash exchange — nondeterministic on a real cluster
    assert(winLine.contains("o_totalprice") && winLine.contains("DESC"),
      s"row_number window must order by price itself:\n$winLine")
  }

  test("vocab growth's cumulative window runs over bucket rows only, after aggregation") {
    val plan = LlmQueries.vocabGrowthDocs(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    val lines = plan.linesIterator.toSeq
    val winIdx = lines.indexWhere(l => l.contains("Window [") && l.contains("cum_tokens"))
    assert(winIdx >= 0, s"cumulative window missing:\n$plan")
    // simple mode prints root-first: everything BELOW the window (higher
    // index) is its input, which must already be the per-bucket aggregate
    // — the single-partition exchange may carry at most `buckets` rows
    val aggIdx = lines.indexWhere(_.contains("HashAggregate(keys=[bucket"), winIdx)
    val scanIdx = lines.indexWhere(_.contains("FileScan"), winIdx)
    assert(aggIdx >= 0 && scanIdx >= 0 && aggIdx < scanIdx,
      s"window input must be the bucket aggregate, not raw token rows:\n$plan")
  }

  test("psi is one pass over the data per side: a single bin exchange pair, totals via hist window") {
    val plan = ProfilingQueries.psiLineitem(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    // one histogram lineage: bin-key exchanges appear once per slice
    // pairing (partial+final agg share one exchange); a totals frame
    // recomputing the binning would double them
    val binExchanges = plan.linesIterator
      .count(l => l.contains("Exchange hashpartitioning(bin"))
    assert(binExchanges === 1,
      s"psi must bin once, got $binExchanges bin exchanges:\n$plan")
    // the only window is over the bins-sized histogram (constant key)
    assert(plan.contains("Window"), "totals must ride a hist window")
  }

  test("merge upsert plans one anti join on the key and no extra shuffle of the base") {
    val plan = planOf(RelationalQueries.mergeUpsertOrders(spark, dir))
    assert(plan.contains("LeftAnti"), s"upsert must anti-join base on the merge key:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("embedding outliers plan TakeOrderedAndProject, never a global window sort") {
    val plan = planOf(LlmQueries.embeddingOutliers(spark, dir))
    assert(plan.contains("TakeOrderedAndProject"),
      s"global top-N must be distributed top-k:\n$plan")
  }

  test("bloom decontamination probes the corpus grams BEFORE any exchange") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val corpus = Seq((1L, "a b c d e f"), (2L, "m n o p q r")).toDF("doc_id", "text")
    val bench = Seq((9L, "a b c d e")).toDF("doc_id", "text")
    val plan = planOf(graft.operators.Contamination.bloomKeep(
      corpus, bench, "doc_id", "text", 3))
    assert(plan.contains("might_contain"), s"bloom probe missing:\n$plan")
    // the probe is a filter in the map stage: in the formatted plan the
    // might_contain Filter node sits below (higher node number than) the
    // first Exchange in its subtree — cheap proxy: the filter's condition
    // string appears, and no CartesianProduct/NestedLoop anywhere
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"unexpected product join:\n$plan")
  }

  test("kmeans assignment is a narrow projection: no shuffle between scan and cell") {
    val plan = planOf(LlmQueries.kmeansAssignEmb(spark, dir))
    assert(plan.contains("sq_l2"), s"SqL2Expr missing from plan:\n$plan")
    // one codegen'd distance node per centroid, argmin via array_min;
    // the assignment itself must add no exchange (only the final
    // orderBy's range exchange is expected)
    val exchanges = plan.linesIterator.count(_.matches("""\(\d+\) Exchange.*"""))
    assert(exchanges <= 1, s"assignment added shuffles:\n$plan")
  }

  test("OLS Gram sums are one partial+final aggregation, no Expand") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val df = (1 to 100).map(i => (i.toDouble, (i % 7).toDouble, i * 2.0))
      .toDF("x1", "x2", "y")
    // capture the aggregation plan via the same expressions fitOls builds
    val xs = Seq(lit(1.0), col("x1"), col("x2"))
    val aggs = (for (i <- xs.indices; j <- i until xs.size)
      yield sum(xs(i) * xs(j)).as(s"g_${i}_$j")) ++
      xs.indices.map(i => sum(xs(i) * col("y")).as(s"b_$i"))
    val plan = planOf(df.agg(aggs.head, aggs.tail: _*))
    assert(plan.contains("HashAggregate"), plan)
    assert(!plan.contains("Expand"), s"Gram sums must not Expand:\n$plan")
    val exchanges = plan.linesIterator.count(_.matches("""\(\d+\) Exchange.*"""))
    assert(exchanges === 1, s"expected exactly one exchange:\n$plan")
  }

  test("bm25 broadcasts df/constants, top-k is TakeOrderedAndProject, no product joins") {
    val plan = planOf(LlmQueries.bm25TopDocs(spark, dir))
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must be distributed top-k, not a global sort:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"df join must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"unexpected cartesian:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"tiny sides must never sort-merge:\n$plan")
  }

  test("dsir scoring broadcasts the ratio table; only the 1-row totals NLJ") {
    val plan = planOf(LlmQueries.dsirWeights(spark, dir))
    assert(plan.contains("BroadcastHashJoin"),
      s"λ join must broadcast the vocabulary table below the size bound:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"unexpected cartesian:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"under-bound vocabulary must not sort-merge:\n$plan")
  }

  test("dsir λ join falls back to a shuffle equi-join past the size bound") {
    // bound → 0 and stats-based auto-broadcast off: at real scale the
    // stats themselves rule broadcast out; the tiny fixture needs the knob
    val prevAuto = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("graft.broadcast.maxRows", "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = planOf(LlmQueries.dsirWeights(spark, dir))
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"over-bound λ join must shuffle on the term:\n$plan")
      assert(!plan.contains("BroadcastHashJoin"),
        s"over-bound vocabulary must not broadcast:\n$plan")
      assert(!plan.contains("CartesianProduct"), s"unexpected cartesian:\n$plan")
    } finally {
      spark.conf.unset("graft.broadcast.maxRows")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevAuto)
    }
  }

  test("repeated spans: per-document windows only, gram join is an equi join") {
    val plan = planOf(LlmQueries.repeatedSpansDocs(spark, dir))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"gram match must be an equi join:\n$plan")
    // every window partitions on the document id — bounded frames
    val windowed = plan.linesIterator
      .filter(_.contains("windowspecdefinition(")).toSeq
    assert(windowed.nonEmpty && windowed.forall(_.contains("doc_id")),
      s"span-merge windows must partition per document:\n${windowed.mkString("\n")}")
  }

  test("per-language quality gate broadcasts the 5-row threshold table") {
    val plan = planOf(LlmQueries.qualityFilterByLang(spark, dir))
    assert(plan.contains("BroadcastHashJoin"),
      s"threshold join must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"unexpected cartesian:\n$plan")
  }

  test("unimax mix broadcasts budgets; the data-sized prefix-sum window is sliced") {
    val plan = planOf(LlmQueries.mixUniMax(spark, dir))
    assert(plan.contains("BroadcastHashJoin"),
      s"budget join must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"unexpected cartesian:\n$plan")
    // waterfill windows run on the |groups|-row totals table (bounded);
    // the corpus-sized running sum must still be the sliced two-phase plan
    val windowed = plan.linesIterator
      .filter(_.contains("windowspecdefinition(")).toSeq
    assert(windowed.exists(_.contains("_slice")),
      s"prefix-sum window must be sliced:\n${windowed.mkString("\n")}")
    assert(!plan.contains("spark_partition_id"),
      s"slice ids must be pure row functions:\n$plan")
  }

  test("novelty: gram first-owner join is an equi join, windows per document only") {
    val plan = planOf(LlmQueries.noveltyDocs(spark, dir))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"first-owner match must be an equi join:\n$plan")
    // the only windows are shingleRows' per-document gram builders
    val windowed = plan.linesIterator
      .filter(_.contains("windowspecdefinition(")).toSeq
    assert(windowed.nonEmpty && windowed.forall(_.contains("id")),
      s"gram windows must partition per document:\n${windowed.mkString("\n")}")
  }

  test("soft dedup weights: cluster-size join is an equi join on the component key") {
    val plan = planOf(LlmQueries.dupWeightDocs(spark, dir))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"size join must be an equi join:\n$plan")
  }

  test("content-defined chunking: per-row only, plus at most the widening exchange") {
    // the OPERATOR, not the registered query — the driver contract's
    // deterministic output orderBy adds one legitimate range exchange.
    // Since round 11 a narrow (few-file) source is widened ONCE by
    // Parallelize.cpuBound before the per-position md5 probe (one
    // round-robin exchange of the raw rows); past that the chunking must
    // stay per-row — no aggregation, no join, no second exchange.
    val plan = planOf(graft.operators.Packing.chunkContentDefined(
      graft.sources.Tables.documents(spark, dir), "doc_id", "text", 4, 1))
    // formatted plans print each node twice (tree + detail header); count
    // the detail headers "(n) Exchange"
    def nExchanges(p: String) = """\(\d+\) Exchange""".r.findAllIn(p).length
    assert(nExchanges(plan) <= 1, s"at most the one widening exchange:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("HashAggregate"),
      s"chunking must stay per-row:\n$plan")

    // a source already at session parallelism is NOT re-exchanged
    val wide = graft.sources.Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
    val widePlan = planOf(graft.operators.Packing.chunkContentDefined(
      wide, "doc_id", "text", 4, 1))
    assert(nExchanges(widePlan) <= 1,
      s"cpuBound must no-op on an already-wide source:\n$widePlan")
  }

  test("winnowing resolves the argmin through an equi join, never a nested loop") {
    val plan = planOf(LlmQueries.winnowDocs(spark, dir))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"(id, hash) must be the join key with the range as post-condition:\n$plan")
  }

  test("bigram LM joins count tables by key and never products the corpus") {
    val plan = planOf(LlmQueries.lmBigramDocs(spark, dir))
    assert(!plan.contains("CartesianProduct"), s"unexpected cartesian:\n$plan")
    // only the 1-row totals may ride a nested loop (broadcast cross
    // join); count TREE lines only — the formatted details section
    // repeats every node name once more
    val bnlj = plan.linesIterator.count(_.contains("- BroadcastNestedLoopJoin"))
    assert(bnlj <= 1, s"count-table joins must be equi joins:\n$plan")
  }

  test("epoch expansion broadcasts the parts table; prefix sum stays sliced") {
    val plan = planOf(LlmQueries.mixUniMaxEpochs(spark, dir))
    assert(plan.contains("BroadcastHashJoin"),
      s"budget/parts join must broadcast:\n$plan")
    val windowed = plan.linesIterator
      .filter(_.contains("windowspecdefinition(")).toSeq
    assert(windowed.exists(_.contains("_slice")),
      s"prefix-sum window must be sliced:\n${windowed.mkString("\n")}")
  }

  test("temperature mix broadcasts budgets and never windows a whole group in one task") {
    val plan = planOf(LlmQueries.mixTemperature(spark, dir))
    assert(plan.contains("BroadcastHashJoin"),
      s"budget join must broadcast:\n$plan")
    // the data-sized window must partition by (group, slice), never the
    // bare group — the single-task-per-group shape the two-phase prefix
    // sum exists to avoid
    val windowed = plan.linesIterator
      .filter(_.contains("windowspecdefinition(")).toSeq
    assert(windowed.nonEmpty && windowed.forall(_.contains("_slice")),
      s"window must be sliced:\n${windowed.mkString("\n")}")
    assert(!plan.contains("spark_partition_id"),
      s"slice ids must be pure row functions:\n$plan")
  }

  test("fuzzy pairs: candidates meet only in hash equi-joins, no cartesian anywhere") {
    val plan = planOf(LlmQueries.fuzzyNamePairs(spark, dir))
    assert(!plan.contains("CartesianProduct"), plan)
    // the only nested-loop join permitted is none: candidate generation,
    // collision branch and both resolutions are hash joins
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    // below the size bound the string resolutions broadcast
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("fuzzy pairs resolution falls back to shuffle equi-joins past the size bound") {
    val prevAuto = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("graft.broadcast.maxRows", "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = planOf(LlmQueries.fuzzyNamePairs(spark, dir))
      assert(!plan.contains("BroadcastHashJoin"),
        s"over-bound string table must not broadcast:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"over-bound resolution must shuffle equi-join:\n$plan")
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"), plan)
    } finally {
      spark.conf.unset("graft.broadcast.maxRows")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevAuto)
    }
  }

  test("cms sketch aggregates partially before the bounded-cell exchange") {
    val plan = planOf(SketchQueries.cmsFreqCheck(spark, dir))
    // partial+final pairs: d*w cells bound the shuffle, map-side combine on
    val hashAggs = plan.linesIterator.count(_.contains("HashAggregate"))
    assert(hashAggs >= 2, s"expected partial+final HashAggregate pairs:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("systematic sample: prefix sum is sliced, total is a broadcast 1-row side") {
    val plan = planOf(LlmQueries.systematicSampleDocs(spark, dir))
    // the per-row running sum windows over _slice, never one global task
    assert(plan.contains("_slice"), plan)
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("pipeline funnel: stage censuses are monotone and the chain stays join-shaped") {
    val out = LlmQueries.pipelineFunnel(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.keySet === Set("1_raw", "2_dedup", "3_quality", "4_decon", "5_mix"))
    // every stage can only shrink the corpus, and nothing empties at sf0.001
    val order = Seq("1_raw", "2_dedup", "3_quality", "4_decon", "5_mix")
    order.sliding(2).foreach { case Seq(a, b) =>
      assert(out(b)._1 <= out(a)._1, s"$b docs grew past $a: $out")
      assert(out(b)._2 <= out(a)._2, s"$b tokens grew past $a: $out")
    }
    assert(out("5_mix")._1 > 0, s"funnel emptied: $out")
    val plan = planOf(LlmQueries.pipelineFunnel(spark, dir))
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("co-occurrence: basket arrays materialized once, join-free pairs, no cartesian") {
    val plan = planOf(ProfilingQueries.copurchaseParts(spark, dir))
    assert(!plan.contains("CartesianProduct"), plan)
    // every consumer of the basket-array substrate reads the
    // checkpoint, not a rebuilt scan+groupBy lineage: the ONLY parquet
    // scan in this plan would be a recompute leak
    assert(!plan.contains("FileScan"), s"basket diamond recomputed:\n$plan")
    assert(plan.contains("ExistingRDD"), plan)
    // pair generation is per-row array expansion (r13): no join keyed
    // on the basket id anywhere in the pair pass
    assert(plan.contains("Generate"), plan)
  }

  test("sorted-neighborhood pairs meet on an equi anchor-rank join, never a range join") {
    val plan = planOf(LlmQueries.sortedNeighborNames(spark, dir))
    assert(!plan.contains("CartesianProduct"), plan)
    // the window trick turns rank distance into a plain equi key: the
    // candidate join must be hash/sort-merge on rk, not a nested loop
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("association: the only windows run over the contingency-cell frame") {
    val plan = planOf(ProfilingQueries.assocCategorical(spark, dir))
    // the full scans are the two groupBy contingency passes; the window
    // inputs are their outputs (post-aggregation), never the base tables
    assert(plan.contains("Window"), plan)
    val hashAggs = plan.linesIterator.count(_.contains("HashAggregate"))
    assert(hashAggs >= 4, s"expected partial+final contingency aggs:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("quality gates compute the score in one scan — no self-join back on the id") {
    // round 11: qualityColumns lets the gated queries project the
    // row-local score next to the other columns of the SAME row; the
    // former qualityMetrics ⋈ docs shuffle join must stay gone
    val qfPlan = planOf(LlmQueries.qualityFilterByLang(spark, dir))
    // the only join left is the 5-row per-language threshold broadcast
    assert(!qfPlan.contains("SortMergeJoin"),
      s"threshold join must be broadcast, score join must not exist:\n$qfPlan")
    assert(qfPlan.contains("BroadcastHashJoin"), qfPlan)

    // regression + filter have NO join at all once the score is inline
    for (q <- Seq(LlmQueries.qualityRegression(spark, dir),
        LlmQueries.corpusFilter(spark, dir))) {
      val plan = planOf(q)
      assert(!plan.contains("Join"), s"score must ride the scan projection:\n$plan")
    }
  }

  test("cross-dedup probe: candidate-id In filter reaches the index parquet scan") {
    // the micro-batch probe plan's verify side must read only candidate
    // docs' shingle rows — the isInCollection reduction has to survive
    // to the scan as a pushed In filter (with the range-sharded
    // generation layout, that is what prunes files at ingest time); a
    // regression to a post-scan filter stays correct but re-reads the
    // whole standing index per batch
    val plan = planOf(LlmQueries.crossDedupProbe(spark, dir))
    val pushed = plan.linesIterator
      .filter(_.contains("PushedFilters:")).mkString("\n")
    assert(pushed.contains("In(id"),
      s"candidate-id In pushdown missing from every scan:\n$pushed")
    // the localized candidate pairs ride broadcast joins — the standing
    // index must never be the shuffled side of a sort-merge join here
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("bpe encode: one corpus scan, the merge chain stays in the map stage") {
    // the encode chain is nested literal replaces — it must run INSIDE
    // the scan's stage with the ONLY exchange being the final per-doc
    // hash aggregation's shuffle (partial -> final). A regression that
    // shuffles words before encoding (or re-scans per merge rank) stays
    // correct but multiplies corpus I/O by the merge count.
    val merges = Seq(("e", "r"), ("o", "r"), ("i", "n"), ("s", "t"))
    val df = graft.operators.TextAnalysis.bpeEncodeCounts(
      graft.sources.Tables.documents(spark, dir), "doc_id", "text", merges)
    val plan = planOf(df)
    // tree lines only: the formatted details section repeats each node
    // as a "(N) Scan parquet" header without the trailing id
    val scans = plan.linesIterator.count(l =>
      l.contains("Scan parquet") && l.trim.matches(""".*\(\d+\)$"""))
    assert(scans == 1, s"bpe encode must scan the corpus once:\n$plan")
    val exchanges = plan.linesIterator.count(l =>
      l.trim.matches("""^[*+:\- ]*Exchange.*\(\d+\)$"""))
    assert(exchanges == 1,
      s"only the final aggregation may shuffle, found $exchanges:\n$plan")
    // both aggregation halves exist: map-side partial + final
    assert(plan.contains("HashAggregate"), plan)
  }
}
