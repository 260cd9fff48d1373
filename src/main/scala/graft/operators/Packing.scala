package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Contiguous sequence packing for LLM training batches: documents are
  * laid end-to-end in a deterministic total order and the token stream is
  * chunked into fixed-size context windows ("concat-and-chunk" packing).
  * Each document gets its global token start offset, its window (seq_id),
  * and a flag for whether it straddles a window boundary.
  *
  * The global running sum is the scale problem: a single
  * `Window.orderBy(id)` moves the whole table into ONE partition (Spark
  * even warns "No Partition Defined for Window operation"). This
  * implementation is the two-phase shape that survives 100 TB:
  *
  *   1. assign every row a SLICE id — a deterministic, monotone function
  *      of the order key (see [[deterministicSlice]]), so each slice is a
  *      contiguous span of the total order; the local running sum is a
  *      window PER SLICE — parallel;
  *   2. the per-slice totals (at most slices+2 rows, tiny) are cumulated
  *      in slice order on a single small partition and broadcast back as
  *      each slice's base offset.
  *
  * Slice ids are a PURE FUNCTION OF THE ROW (order value + literal
  * bounds computed once, eagerly, from exact min/max — never sampled):
  * every consumer of the plan assigns identical slices on every
  * recompute, so no `persist()` is needed for correctness and no
  * recompute path (cache eviction, AQE replan, speculative retry) can
  * disagree with another. This replaces the round-6 construction
  * (`spark_partition_id()` over a sampled `repartitionByRange`, pinned
  * by `persist()`), whose slice ids depended on WHICH materialization a
  * consumer observed — the intermittent `mix_corpus` hash drift.
  *
  * Greedy never-split packing (close the window when the next document
  * would overflow) requires a running sum with data-dependent resets —
  * inherently sequential, not a window function. Contiguous packing is
  * what large-scale training pipelines use precisely because it is a
  * pure prefix sum; documents longer than the budget simply span
  * multiple windows.
  */
object Packing {

  /** Fixed-size token-window chunking with overlap — the other standard
    * training-example shape (RAG indexing, long-doc splitting): each
    * document is cut into windows of `size` tokens starting every
    * `stride` tokens (stride < size ⇒ overlapping context). Chunk k
    * covers tokens [k·stride, k·stride + size); starts run while they
    * still index a token, so the final chunk may be short. Token-less
    * documents emit no chunks.
    *
    * Scale shape: tokenize → generate chunk ids (sequence + explode) →
    * slice — one narrow, fully codegen'd stage; no shuffle, no UDF, and
    * chunk rows never leave the partition that read the document. */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
      size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0, s"size/stride must be positive, got $size/$stride")
    require(stride <= size, s"stride $stride > size $size would skip tokens")
    val toks = TextAnalysis.tokens(col(textCol))
    df.select(col(idCol), toks.as("_t"))
      .withColumn("_n", org.apache.spark.sql.functions.size(col("_t")))
      .filter(col("_n") > 0)
      .select(col(idCol),
        explode(sequence(lit(0), floor((col("_n") - 1) / stride).cast("int")))
          .as("chunk_id"),
        col("_t"))
      .select(col(idCol), col("chunk_id"),
        array_join(slice(col("_t"), col("chunk_id") * stride + 1, lit(size)), " ")
          .as("chunk_text"),
        org.apache.spark.sql.functions
          .size(slice(col("_t"), col("chunk_id") * stride + 1, lit(size)))
          .cast("long").as("n_chunk_tokens"))
  }

  /** CONTENT-DEFINED chunking (the dedup-stable alternative to fixed
    * windows): a chunk boundary falls after token position i whenever the
    * md5 of the `gramWords`-token gram ENDING at i starts with
    * `zeroHexDigits` zero hex digits — an expected chunk length of
    * 16^zeroHexDigits tokens. Because boundaries depend only on a local
    * content window, inserting or deleting text resynchronizes within one
    * gram: every later chunk keeps its exact text, so chunk-level exact
    * dedup still matches across document revisions — the property fixed
    * [[chunkTokens]] windows lose (one insertion shifts every subsequent
    * chunk). The md5-prefix rule keeps the boundary decision replayable
    * by any engine (no xxhash in the cut path).
    *
    * Boundary candidates stop at n-1, so no empty trailing chunk; docs
    * shorter than gramWords+1 tokens emit one whole-doc chunk; token-less
    * docs emit nothing. Production CDC adds min/max chunk clamps —
    * deliberately omitted here to keep the cut rule a pure per-position
    * predicate (clamps reintroduce sequential state).
    *
    * Scale shape: identical to [[chunkTokens]] — tokenize → per-position
    * boundary predicate → span assembly, all array expressions in one
    * narrow projection; chunks never leave the partition that holds the
    * document. A narrow (few-split) source is first widened once by
    * [[Parallelize.cpuBound]] (no-op at cluster scale where the input is
    * already thousands of splits); the cut rule itself is a row-local
    * deterministic hash predicate, so the safety contract holds. */
  def chunkContentDefined(df: DataFrame, idCol: String, textCol: String,
      gramWords: Int = 4, zeroHexDigits: Int = 1): DataFrame = {
    require(gramWords > 0 && zeroHexDigits > 0)
    val zeros = "0" * zeroHexDigits
    val toks = TextAnalysis.tokens(col(textCol))
    // the per-position md5 boundary probe is an interpreted HOF over
    // every token window — CPU-bound per row and fused into the scan
    // stage, so widen a narrow source (Parallelize; boundaries are
    // row-local deterministic hash predicates)
    Parallelize.cpuBound(df.select(col(idCol), col(textCol)))
      .select(col(idCol), toks.as("_t"))
      .withColumn("_n", org.apache.spark.sql.functions.size(col("_t")))
      .filter(col("_n") > 0)
      // sequence(a, b) descends when a > b — guard short docs to an
      // empty candidate list instead
      .withColumn("_b", when(col("_n") - 1 >= gramWords,
        filter(sequence(lit(gramWords), col("_n") - 1), i =>
          substring(md5(array_join(
            slice(col("_t"), i - (gramWords - 1), lit(gramWords)), " ")),
            1, zeroHexDigits) === lit(zeros)))
        .otherwise(array().cast("array<int>")))
      .withColumn("_starts",
        concat(array(lit(1)), transform(col("_b"), b => b + 1)))
      .withColumn("_ends",
        concat(transform(col("_b"), b => b), array(col("_n"))))
      .select(col(idCol), col("_t"),
        posexplode(arrays_zip(col("_starts"), col("_ends"))).as(Seq("chunk_id", "_se")))
      .select(col(idCol), col("chunk_id").cast("long").as("chunk_id"),
        array_join(slice(col("_t"), col("_se._starts"),
          col("_se._ends") - col("_se._starts") + 1), " ").as("chunk_text"),
        (col("_se._ends") - col("_se._starts") + 1).cast("long").as("n_chunk_tokens"))
  }

  // ---------------------------------------------------------------------
  // Deterministic slicing: the foundation both prefix sums stand on.
  // ---------------------------------------------------------------------

  private val CpBase = 2097152.0          // 2^21 > max code point 0x10FFFF
  private val CpBase2 = CpBase * CpBase   // 2^42 — three digits fit a double

  /** Code point at index `i` of `cps`, or 0 past the end (the empty
    * suffix sorts first, matching lexicographic order). */
  private def cpAt(cps: Array[Int], i: Int): Double =
    if (i >= 0 && i < cps.length) cps(i).toDouble else 0.0

  /** Driver-side monotone proxy of a string's 3 code points starting at
    * `skip` — used ONLY to interpolate boundary literals; executors never
    * evaluate it, so it cannot disagree with executor semantics. */
  private def proxyVal(s: String, skip: Int): Double = {
    val cps = s.codePoints().toArray
    cpAt(cps, skip) * CpBase2 + cpAt(cps, skip + 1) * CpBase + cpAt(cps, skip + 2)
  }

  /** Interpolated slice-boundary strings between the corpus min and max:
    * shared prefix + 3 code points unpacked from an evenly spaced proxy
    * value. Boundary QUALITY only affects balance; slice assignment
    * compares rows against these literals with Spark's own string
    * comparator, so monotonicity (hence correctness) holds for any
    * encoding. Clamped to below the surrogate range so every boundary is
    * a well-formed BMP string. */
  private def stringBoundaries(mnS: String, mxS: String, n: Int): Seq[String] = {
    val mnCps = mnS.codePoints().toArray
    val mxCps = mxS.codePoints().toArray
    var lcp = 0
    while (lcp < mnCps.length && lcp < mxCps.length && mnCps(lcp) == mxCps(lcp)) lcp += 1
    val prefix = new String(mnCps, 0, lcp)
    val lo = proxyVal(mnS, lcp)
    val hi = proxyVal(mxS, lcp)
    if (!(hi > lo)) return Seq.empty // degenerate: one slice, still correct
    def unpack(v: Double): String = {
      def clampCp(d: Double): Int = {
        val c = math.max(0, math.min(0xD7FF, d.toInt)) // BMP, below surrogates
        c
      }
      val d1 = clampCp(v / CpBase2)
      val d2 = clampCp((v % CpBase2) / CpBase)
      val d3 = clampCp(v % CpBase)
      prefix + new String(Array(d1, d2, d3), 0, 3)
    }
    (1 until n).map(i => unpack(lo + (hi - lo) * i / n)).distinct
  }

  /** Slice id for the two-phase prefix sum: a deterministic, monotone
    * (w.r.t. the order column's sort order) bucketing of `orderCol` into
    * ~`nSlices` contiguous spans. Pure function of the row given literal
    * bounds computed HERE, eagerly, from one exact min/max aggregation —
    * deterministic across recomputes, runs, partitionings and engines
    * (unlike `spark_partition_id()` over a sampled range exchange).
    *
    * Monotone non-strict is all correctness needs (within-slice order is
    * resolved exactly by the window's `orderBy`); balance is a
    * performance property and holds for roughly uniform keys (md5-hex
    * order keys, dense ids). Edge slices: nulls (sort first) → -1,
    * numeric NaN/+Inf (sort last) → nSlices; -Inf shares the null slice,
    * adjacent in the total order so contiguity is preserved.
    *
    *   - numeric / date / timestamp: linear bucketing between exact
    *     min/max literals of a monotone double proxy (clamped to half
    *     the double range so the span never overflows);
    *   - string: count of driver-interpolated boundary literals ≤ the
    *     value, evaluated with Spark's own comparator — monotone by
    *     construction for any encoding;
    *   - other types: unsupported (fail loudly — add a monotone proxy
    *     before widening this).
    */
  private[operators] def deterministicSlice(df: DataFrame, orderCol: String,
      nSlices: Int): Column = {
    val c = col(orderCol)
    df.schema(orderCol).dataType match {
      case StringType =>
        val b = df.agg(min(c), max(c)).head()
        if (b.isNullAt(0) || b.getString(0) == b.getString(1)) {
          when(c.isNull, lit(-1)).otherwise(lit(0))
        } else {
          val bounds = stringBoundaries(b.getString(0), b.getString(1), nSlices)
          val rank = bounds.foldLeft(lit(0)) { (acc, bd) =>
            acc + when(c >= lit(bd), 1).otherwise(0)
          }
          when(c.isNull, lit(-1)).otherwise(rank)
        }
      case dt =>
        val p = numericProxy(c, dt).getOrElse(throw new IllegalArgumentException(
          s"prefix-sum order column '$orderCol' must be string, numeric, date or timestamp, got $dt"))
        val negInf = lit(Double.NegativeInfinity)
        val posInf = lit(Double.PositiveInfinity)
        // clamp the BUCKETING proxy to half the double range: clamping is
        // monotone (slice balance only), and it keeps max-min from
        // overflowing to Infinity (span Inf ⇒ NaN ratios ⇒ an ANSI cast
        // failure, or silent mis-slicing with ANSI off)
        val half = Double.MaxValue / 2
        val pb = greatest(least(p, lit(half)), lit(-half))
        val finite = when(p.isNull || isnan(p) || p === negInf || p === posInf, lit(null))
          .otherwise(pb)
        val b = df.agg(min(finite), max(finite)).head()
        val bucket =
          if (b.isNullAt(0) || !(b.getDouble(0) < b.getDouble(1))) lit(0)
          else {
            val mn = b.getDouble(0)
            val span = b.getDouble(1) - mn
            least(floor((pb - lit(mn)) / lit(span) * nSlices).cast("int"), lit(nSlices - 1))
          }
        when(p.isNull || p === negInf, lit(-1))
          .when(isnan(p) || p === posInf, lit(nSlices))
          .otherwise(bucket)
    }
  }

  /** Monotone double proxy of an orderable non-string key, or None for
    * unsupported types. Long→double rounding is monotone (round-to-
    * nearest preserves non-strict order), and NTZ→timestamp conversion
    * uses one fixed session zone, so order is preserved there too. */
  private def numericProxy(c: Column, dt: DataType): Option[Column] = dt match {
    case _: NumericType => Some(c.cast("double"))
    case DateType => Some(unix_date(c).cast("double"))
    case TimestampType => Some(unix_micros(c).cast("double"))
    case TimestampNTZType => Some(unix_micros(c.cast(TimestampType)).cast("double"))
    case _ => None
  }

  /** PER-GROUP exclusive prefix sum of `valueCol` in `orderCol` order —
    * [[packContiguous]]'s two-phase shape generalized to grouped running
    * sums (the building block for per-source token budgeting, grouped
    * packing, per-domain cumulative caps). A plain
    * `Window.partitionBy(group).orderBy(order)` puts each WHOLE group in
    * one task — groups like "source" or "language" are low-cardinality
    * and huge, the same hot-key shape GroupTopK exists to avoid. Here:
    *
    *   1. every row gets a deterministic slice id (monotone in
    *      `orderCol` — see [[deterministicSlice]]); the local running
    *      sum windows over (group, slice) — parallel;
    *   2. per-(group, slice) totals (groups × slices rows, tiny) are
    *      cumulated per group in slice order and broadcast back as
    *      bases.
    *
    * Both phases read the same pure plan — slice assignment cannot
    * differ between them, whatever gets recomputed where, so there is no
    * `persist()` and no correctness dependence on one materialization.
    *
    * `orderCol` must be unique within its group (it is the total order
    * that makes the sum deterministic). Adds `cumBeforeCol`. */
  def groupedPrefixSum(df: DataFrame, groupCol: String, orderCol: String,
      valueCol: String, cumBeforeCol: String = "cum_before"): DataFrame = {
    val nSlices = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    groupedPrefixSumSliced(df, groupCol, orderCol, valueCol,
      deterministicSlice(df, orderCol, nSlices), cumBeforeCol)
  }

  /** [[groupedPrefixSum]] with a CALLER-SUPPLIED slice column, for
    * callers that can build a better-balanced (or cheaper) deterministic
    * monotone bucketing than [[deterministicSlice]] — e.g. Describe's
    * per-column quantile chain, which already holds exact per-group
    * bounds and bucket-normalizes each group to its own range. The
    * contract the slice column must honor is exactly
    * [[deterministicSlice]]'s: a PURE function of the row (literals
    * only, no sampling, no partition ids), monotone non-strict in
    * `orderCol` within every group. */
  private[operators] def groupedPrefixSumSliced(df: DataFrame,
      groupCol: String, orderCol: String, valueCol: String, slice: Column,
      cumBeforeCol: String = "cum_before"): DataFrame = {
    // The input lineage feeds three consumers (bounds aggregation,
    // window branch, offsets branch). Correctness never depends on
    // materialization — slice ids are pure row functions — so whether
    // to persist is the CALLER's economics: persist upstream when the
    // lineage is expensive (measured here: a persist costs more than it
    // saves for plain scan+hash lineages).
    val sliced = df.withColumn("_slice", slice)
    val local = Window.partitionBy(groupCol, "_slice").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withLocal = sliced.withColumn("_local_cum", sum(col(valueCol)).over(local))
    // slice ids are numeric and monotone in the order key, so cumulating
    // per-slice totals IN SLICE ORDER yields each slice's base offset
    val offsets = sliced.groupBy(groupCol, "_slice")
      .agg(sum(col(valueCol)).as("_ptotal"))
    val offW = Window.partitionBy(groupCol).orderBy("_slice")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bases = offsets
      .withColumn("_base", sum(col("_ptotal")).over(offW) - col("_ptotal"))
      .select(col(groupCol), col("_slice"), col("_base"))
    withLocal.join(broadcast(bases), Seq(groupCol, "_slice"))
      .withColumn(cumBeforeCol, col("_base") + col("_local_cum") - col(valueCol))
      .drop("_slice", "_local_cum", "_base")
  }

  /** SEVERAL exclusive prefix sums in ONE two-phase pass — the
    * [[groupedPrefixSumSliced]] plan with every value column riding the
    * same slice window / offsets aggregate / broadcast join.
    * `groupCols` may be empty (global running sums). Callers that need
    * k running sums over the SAME order (Drift's two-sided KS CDFs) pay
    * one slice-bounds action, one window exchange and one offsets
    * aggregate instead of k of each — and, more importantly, no join to
    * re-align the k results afterwards (r17: ksDrift previously ran two
    * [[packContiguous]] passes and re-joined 600k-row outputs on the
    * value key — a sort-merge exchange pair that existed only to undo
    * the split this method avoids). Semantics per column are exactly
    * [[groupedPrefixSum]]'s: integer/long sums, deterministic for a
    * unique `orderCol` within each group. Adds `cumBeforeCols` (same
    * arity as `valueCols`). */
  private[operators] def prefixSums(df: DataFrame, groupCols: Seq[String],
      orderCol: String, valueCols: Seq[String],
      cumBeforeCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty && valueCols.size == cumBeforeCols.size)
    val nSlices = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val sliced = df.withColumn("_slice",
      deterministicSlice(df, orderCol, nSlices))
    val gCols = groupCols.map(col)
    val local = Window.partitionBy(gCols :+ col("_slice"): _*).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // identical window spec for every column -> Catalyst plans ONE
    // Window node (one sort), k running-sum frames inside it
    val withLocal = valueCols.zipWithIndex.foldLeft(sliced) {
      case (d, (v, i)) => d.withColumn(s"_lc_$i", sum(col(v)).over(local))
    }
    val ptAggs = valueCols.zipWithIndex.map { case (v, i) =>
      sum(col(v)).as(s"_pt_$i") }
    val offsets = sliced.groupBy(gCols :+ col("_slice"): _*)
      .agg(ptAggs.head, ptAggs.tail: _*)
    // AUDITED GLOBAL WINDOW (empty groupCols): ≤ nSlices+2 rows by
    // construction — see packContiguous
    val offW = Window.partitionBy(gCols: _*).orderBy("_slice")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bases = valueCols.indices.foldLeft(offsets) { (d, i) =>
        d.withColumn(s"_b_$i", sum(col(s"_pt_$i")).over(offW) - col(s"_pt_$i"))
      }
      .select(gCols ++ Seq(col("_slice")) ++
        valueCols.indices.map(i => col(s"_b_$i")): _*)
    val joined = withLocal.join(broadcast(bases),
      groupCols :+ "_slice")
    val withCums = valueCols.indices.foldLeft(joined) { (d, i) =>
      d.withColumn(cumBeforeCols(i),
        col(s"_b_$i") + col(s"_lc_$i") - col(valueCols(i)))
    }
    withCums.drop("_slice" +:
      valueCols.indices.flatMap(i => Seq(s"_lc_$i", s"_b_$i")): _*)
  }

  /** Pack by a precomputed token-count column. Returns the input columns
    * plus start_offset (global tokens before this doc), seq_id
    * (floor(start_offset / budget)) and crosses_boundary (true when the
    * document's tokens span two or more windows). */
  def packContiguous(df: DataFrame, idCol: String, tokenCol: String,
      budget: Int): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val nSlices = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    // input consumed by three branches — persist upstream only when the
    // lineage is expensive (see groupedPrefixSum); results are identical
    // either way (slice ids are pure row functions)
    val sliced = df.withColumn("_slice", deterministicSlice(df, idCol, nSlices))
    // phase 1: per-slice running sum — parallel across slices
    val local = Window.partitionBy("_slice").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withLocal = sliced.withColumn("_local_cum",
      sum(col(tokenCol)).over(local))
    // phase 2: one row per slice; cumulate on the tiny side in slice
    // order and broadcast the base offsets back. Slice assignment is a
    // pure row function, so this branch agrees with phase 1 by
    // construction — no persist(), no cross-instantiation hazard.
    val offsets = sliced.groupBy("_slice")
      .agg(sum(col(tokenCol)).as("_ptotal"))
    // AUDITED GLOBAL WINDOW: the frame is ≤ nSlices+2 rows by
    // construction (one per slice), so WindowExec's "No Partition
    // Defined" WARN — aimed at corpus-sized frames — is benign here.
    // A constant partition key does not silence it (foldable keys are
    // optimized out of the spec); Bench/Verify drop that one logger to
    // ERROR instead so driver logs stay readable.
    val offW = Window.orderBy("_slice")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bases = offsets
      .withColumn("_base", sum(col("_ptotal")).over(offW) - col("_ptotal"))
      .select("_slice", "_base")
    val packed = withLocal.join(broadcast(bases), Seq("_slice"))
      .withColumn("start_offset", col("_base") + col("_local_cum") - col(tokenCol))
      .withColumn("seq_id", floor(col("start_offset") / budget.toLong))
      .withColumn("crosses_boundary",
        col(tokenCol) > 0 &&
          floor((col("start_offset") + col(tokenCol) - 1) / budget.toLong) > col("seq_id"))
    packed.drop("_slice", "_local_cum", "_base")
  }
}
