package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Train/eval decontamination: find training documents that share word
  * n-grams with a benchmark/eval set (the standard 13-gram overlap check
  * run before LLM training; n is a parameter here).
  *
  * Scale shape: the corpus side is the 100 TB table, the benchmark side
  * is a few thousand eval documents (MBs). Both sides are reduced to
  * DISTINCT n-gram ROWS (codegen'd posexplode + window lead — see
  * [[Dedup.shingleRows]]); the benchmark gram set is then BROADCAST, so
  * the corpus grams are matched map-side with no shuffle of the big side
  * at all. The per-document aggregation that follows shuffles only
  * (id, flag) pairs with map-side combine.
  *
  * Not in the reference (petk is a single-table profiler); this is part
  * of the mandated training-data-pipeline surface (SURVEY.md §2.C).
  */
object Contamination {

  /** SURGICAL span-level decontamination — the middle ground between
    * dropping a whole contaminated document ([[report]] / [[bloomKeep]])
    * and keeping it verbatim: for each corpus document, the maximal
    * token spans in which every token is covered by at least one
    * eval-set n-gram. (Weaker than "every covering n-gram is in the
    * eval set": gaps-and-islands merges touching hit windows, and a
    * gram straddling two touching windows need not itself match.)
    * Cut these spans and the document contributes its clean remainder
    * to training instead of being discarded for one quoted benchmark
    * line. Returns one row per span: (idCol, span_start, span_end,
    * span_tokens) with span_end exclusive, positions 0-based over the
    * whitespace tokens.
    *
    * Scale shape: corpus gram occurrences ride the codegen'd positional
    * substrate ([[Dedup.positionalGramRows]]); the eval gram set is
    * DISTINCT rows broadcast to the match join (map-side, no shuffle of
    * the big side); span merging is the shared gaps-and-islands pass in
    * per-document windows ([[Dedup.mergeSpans]]). Integer arithmetic
    * end to end. */
  def contaminatedSpans(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    val cg = Dedup.positionalGramRows(corpus, idCol, textCol, n)
    // eval sets are usually MBs but CAN reach millions of grams
    // (stacked benchmark suites) — size-guard like every corpus-growing
    // frame; checkpoint first so the guard's count is paid once
    val bg = Dedup.shingleRows(bench, idCol, textCol, n)
      .select(col("s").as("__g")).distinct().localCheckpoint()
    val hits = cg.join(SizeGuard.broadcastIfSmall(bg), Seq("__g"))
      .select(col(idCol), col("__pos"))
    Dedup.mergeSpans(hits, idCol, n)
      .select(col(idCol), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start")).cast("long").as("span_tokens"))
  }

  /** Per-pair overlap: (corpus_id, bench_id, n_shared) for every
    * corpus/bench document pair sharing at least one distinct word
    * n-gram. Exact — a pair is counted from a shared-gram equi-join,
    * never a similarity estimate. */
  def overlapPairs(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    val cg = Dedup.shingleRows(corpus, idCol, textCol, n)
    val bg = Dedup.shingleRows(bench, idCol, textCol, n)
      .select(col("id").as("bench_id"), col("s")).localCheckpoint()
    cg.select(col("id").as("corpus_id"), col("s"))
      .join(SizeGuard.broadcastIfSmall(bg), Seq("s"))
      .groupBy("corpus_id", "bench_id")
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Per-document contamination report: for every corpus document with at
    * least one n-gram found anywhere in the benchmark set, its distinct
    * n-gram count, the number of those grams that are contaminated, and
    * the contaminated fraction. One broadcast left join + one hash
    * aggregation over the corpus gram rows. */
  def report(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    val cg = Dedup.shingleRows(corpus, idCol, textCol, n)
    val bset = Dedup.shingleRows(bench, idCol, textCol, n)
      .select("s").distinct().withColumn("hit", lit(1L)).localCheckpoint()
    cg.join(SizeGuard.broadcastIfSmall(bset), Seq("s"), "left")
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("hit"), lit(0L))).as("n_contaminated"))
      .withColumn("contamination",
        col("n_contaminated").cast("double") / col("n_grams"))
      .filter(col("n_contaminated") > 0)
  }

  /** Decontaminated KEEP list via a Bloom-filter prefilter — the scale
    * path for when the benchmark gram set is too large to broadcast
    * exactly (billions of eval grams at full scale): only the bloom BITS
    * ship to the scan (optimalNumOfBits(expected, fpp) / 8 bytes — ~1 MB
    * per 10^6 grams at 1%), and the corpus side is pruned MAP-SIDE by a
    * codegen'd might-contain probe before anything shuffles.
    *
    * Exactness: the bloom has no false negatives, and its false positives
    * are eliminated by the exact gram equi-join that follows — so the
    * output is bit-identical to [[report]]-style exact decontamination
    * regardless of `fpp`, and the DuckDB oracle is the plain exact SQL.
    * Determinism: the bloom is built by Spark's own BloomFilterAggregate
    * (fixed-seed hashing; merge is a bitwise OR — commutative and
    * associative, so partial-aggregation order cannot change the bits),
    * probed by its codegen pair BloomFilterMightContain over the same
    * xxhash64 values.
    *
    * Shuffle budget at 100 TB: one scan of the corpus grams (pruned in
    * the scan stage), a shuffle of only the candidate grams (true hits +
    * fpp-bounded noise) against the bench grams, and a broadcast-sized
    * anti-join of contaminated ids. The full corpus gram table never
    * shuffles. Returns (idCol, n_grams) for every surviving corpus
    * document, n_grams = 0 for documents shorter than n words.
    *
    * Not in the reference (petk profiles a single table); mandated
    * training-pipeline surface (SURVEY.md §2.C, decontamination). */
  def bloomKeep(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int, expectedGrams: Long = 1L << 17,
      fpp: Double = 0.03): DataFrame = {
    require(expectedGrams > 0 && fpp > 0 && fpp < 1)
    // The corpus gram table is consumed EXACTLY ONCE (the single
    // aggregate below) — no persist, no diamond. The previous shape
    // (separate count pass + probe pass over a persisted cg) computed
    // the expensive shingle-window lineage twice anyway: the two
    // branches' shuffle-map stages are submitted concurrently within
    // the one action, so both missed the still-empty cache.
    val cg = Dedup.shingleRows(corpus, idCol, textCol, n)
    val bg = Dedup.shingleRows(bench, idCol, textCol, n).select("s").distinct()
    // distributed build: partial blooms per partition, OR-merged — the
    // driver only ever sees the finished bit array (bg is bench-sized,
    // recomputing it for the verify join below is one small scan)
    val numBits = BloomFilter.optimalNumOfBits(expectedGrams, fpp)
    val bloomAgg = new BloomFilterAggregate(
      Bridge.expression(xxhash64(col("s"))),
      Literal(expectedGrams), Literal(numBits)).toAggregateExpression()
    val bytes = bg.select(Bridge.column(bloomAgg).as("bf"))
      .head().getAs[Array[Byte]](0)
    val base = corpus.select(col(idCol).as("id")).distinct()
    val kept =
      if (bytes == null) { // empty bench: nothing can be contaminated
        val perDoc = cg.groupBy(col("id")).agg(count(lit(1)).as("n_grams"))
        base.join(perDoc, Seq("id"), "left")
          .select(col("id"), coalesce(col("n_grams"), lit(0L)).as("n_grams"))
      } else {
        val might = Bridge.column(BloomFilterMightContain(
          Literal.create(bytes, BinaryType),
          Bridge.expression(xxhash64(col("s")))))
        // ONE pass over the corpus grams: per-doc gram count plus the
        // bloom-candidate grams (true hits + fpp-bounded noise, so the
        // collected set is ~fpp·n_grams + hits per document — bytes per
        // doc at fpp=3%, never the full gram list)
        val perDoc = cg.groupBy(col("id")).agg(
          count(lit(1)).as("n_grams"),
          collect_set(when(might, col("s"))).as("cand"))
        // exact verify of ONLY the candidate grams: bloom false
        // positives die on the equi-join, so the verdict is bit-
        // identical to exact decontamination regardless of fpp.
        // explode_outer keeps candidate-free docs (null gram never
        // matches) — perDoc is consumed once, no diamond.
        val verdict = perDoc
          .select(col("id"), col("n_grams"), explode_outer(col("cand")).as("s"))
          .join(bg.withColumn("hit", lit(1L)), Seq("s"), "left")
          .groupBy("id").agg(max(col("n_grams")).as("n_grams"),
            max(coalesce(col("hit"), lit(0L))).as("contam"))
        base.join(verdict, Seq("id"), "left")
          .filter(coalesce(col("contam"), lit(0L)) === 0L)
          .select(col("id"), coalesce(col("n_grams"), lit(0L)).as("n_grams"))
      }
    kept.select(col("id").as(idCol), col("n_grams"))
  }

  /** A STANDING eval-gram filter: the distinct bench gram table
    * (checkpointed — built once, probed many times) plus the OR-merged
    * Bloom bits over it. This is the reusable half of [[bloomKeep]],
    * split out for consumers that probe the SAME eval set repeatedly —
    * the streaming decontamination sink probes it every micro-batch.
    * `bloom` is None when the bench set is empty (nothing can be
    * contaminated). */
  final case class EvalGramIndex(grams: DataFrame, bloom: Option[Array[Byte]], n: Int)

  /** Build an [[EvalGramIndex]] once. Bench-sized work: one shingle
    * pass, one distinct, one distributed Bloom build (partial blooms
    * per partition, bitwise-OR merge — deterministic bits). */
  def evalGramIndex(bench: DataFrame, idCol: String, textCol: String, n: Int,
      expectedGrams: Long = 1L << 17, fpp: Double = 0.03): EvalGramIndex = {
    require(expectedGrams > 0 && fpp > 0 && fpp < 1)
    val bg = Dedup.shingleRows(bench, idCol, textCol, n)
      .select("s").distinct().localCheckpoint()
    val numBits = BloomFilter.optimalNumOfBits(expectedGrams, fpp)
    val bloomAgg = new BloomFilterAggregate(
      Bridge.expression(xxhash64(col("s"))),
      Literal(expectedGrams), Literal(numBits)).toAggregateExpression()
    val bytes = bg.select(Bridge.column(bloomAgg).as("bf"))
      .head().getAs[Array[Byte]](0)
    EvalGramIndex(bg, Option(bytes), n)
  }

  /** EXACT contaminated-id set of `df` against a standing index: ids of
    * documents sharing at least one distinct word n-gram with the eval
    * set. The Bloom bits prune the document grams MAP-SIDE (codegen'd
    * might-contain — the full gram table never shuffles); the equi-join
    * against the stored gram table kills false positives, so the result
    * is exact regardless of fpp. */
  def contaminatedIds(df: DataFrame, idCol: String, textCol: String,
      index: EvalGramIndex): DataFrame = index.bloom match {
    case None => df.select(col(idCol)).limit(0)
    case Some(bytes) =>
      val might = Bridge.column(BloomFilterMightContain(
        Literal.create(bytes, BinaryType),
        Bridge.expression(xxhash64(col("s")))))
      Dedup.shingleRows(df, idCol, textCol, index.n)
        .filter(might)
        .join(index.grams, Seq("s"))
        .select(col("id").as(idCol)).distinct()
  }

  /** CORPUS-OVERLAP TRIAGE by KMV sketches ([[graft.plans.KmvSketchAgg]]):
    * estimate |A|, |B|, |A∪B|, |A∩B| and Jaccard of two distinct-hash
    * sets (n-gram sets of two corpora) WITHOUT a distinct-join — each
    * side folds to one ≤k-long sketch (a tiny aggregation with map-side
    * partials), and every estimate is array arithmetic on the two
    * sketches. This is the question one asks BEFORE running full
    * decontamination ([[report]]): "does corpus B overlap corpus A
    * enough to care?" at the cost of two scans and no shuffle of gram
    * sets. Relative error ~1/sqrt(k); sets smaller than k are exact.
    *
    * `hashA`/`hashB` must be uniform NON-NEGATIVE long hashes in
    * [0, 2^bits) — `conv(substring(md5(s),1,15),16,10)` (60-bit,
    * engine-reproducible: the kmv_overlap oracle replays it) or
    * `xxhash64(s) >>> 4` for the cheap path. The sketch is a pure
    * function of the hash SET, so the estimates are deterministic across
    * partitionings and replays.
    *
    * Returns ONE row: (d_a_est, d_b_est, d_union_est, d_inter_est,
    * jaccard_est). */
  def kmvOverlapEstimate(a: DataFrame, hashA: org.apache.spark.sql.Column,
      b: DataFrame, hashB: org.apache.spark.sql.Column,
      k: Int, bits: Int = 60): DataFrame = {
    require(bits >= 1 && bits <= 62, s"bits must be in [1, 62]: $bits")
    val scale = math.pow(2.0, bits) // exactly representable
    val sa = a.agg(graft.plans.KmvSketchAgg.kmvSketch(hashA, k).as("ka"))
    val sb = b.agg(graft.plans.KmvSketchAgg.kmvSketch(hashB, k).as("kb"))
    // (k-1)/u_(k) when the sketch is full; an under-full sketch holds the
    // whole set, so its size IS the distinct count
    def dEst(arr: org.apache.spark.sql.Column) =
      when(size(arr) < k, size(arr).cast("double"))
        .otherwise(lit((k - 1).toDouble) / (element_at(arr, k).cast("double") / lit(scale)))
    sa.crossJoin(broadcast(sb)) // two 1-row frames
      // the k smallest of A∪B are all in ka ∪ kb (anything in the union's
      // top-k is in its own side's top-k), so ku is a true KMV of A∪B
      .withColumn("ku", slice(array_sort(array_union(col("ka"), col("kb"))), 1, k))
      // h ∈ ku present in BOTH side sketches ⟺ h ∈ A∩B (an A∩B member of
      // the union's top-k ranks ≤ k in each side) — ρ estimates Jaccard
      .withColumn("rho",
        size(array_intersect(array_intersect(col("ku"), col("ka")), col("kb"))).cast("double")
          / size(col("ku")))
      .select(
        dEst(col("ka")).as("d_a_est"),
        dEst(col("kb")).as("d_b_est"),
        dEst(col("ku")).as("d_union_est"),
        (col("rho") * dEst(col("ku"))).as("d_inter_est"),
        col("rho").as("jaccard_est"))
  }
}
