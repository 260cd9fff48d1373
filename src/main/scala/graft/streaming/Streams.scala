package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Running per-key numeric profile state: Welford-merged moments +
  * extrema. The streaming counterpart of the describe() numeric kernel's
  * count/mean/variance/min/max block. */
case class ProfileState(
    n: Long, nNull: Long, mean: Double, m2: Double, min: Double, max: Double)

/** One emitted profile update (per key, per micro-batch). */
case class ProfileUpdate(
    key: String, count: Long, n_null: Long,
    mean: Double, variance: Double, min: Double, max: Double)

/** One emitted quantile update (per key, per micro-batch): current KLL
  * estimates at the monitor's probs, plus the sketch bytes themselves so
  * a downstream consumer can union them with batch shard profiles. */
case class QuantileUpdate(
    key: String, count: Long, quantiles: Seq[Double], sketch: Array[Byte])

/** One emitted trending-terms update (per key, per micro-batch): the
  * current Misra–Gries counters sorted by residual count — a guaranteed
  * superset of every term above a 1/(capacity+1) share of the stream so
  * far, with counts as lower bounds. */
case class TrendingUpdate(
    key: String, processed: Long, terms: Seq[(String, Long)])

/** One emitted engagement update (per key, per micro-batch): the decayed
  * sum AS OF `last_seen_us` (each key's own latest event). A consumer
  * comparing keys at instant `now` decays each score once more:
  * score·2^(−(now − last_seen_us)/halfLife) — the state never needs a
  * wall clock. */
case class EngagementUpdate(
    key: String, n_events: Long, decayed_sum: Double, last_seen_us: Long)

/** One emitted rate verdict (per key × touched hour, per micro-batch):
  * the hour's running count, the trailing-baseline size, and the
  * z-score against that baseline (None while the baseline is degenerate
  * — fewer than 2 trailing hours or zero variance). */
case class RateUpdate(
    key: String, hour_us: Long, cnt: Long, n_baseline: Long, z: Option[Double])

/** Structured-Streaming operators (SURVEY.md §2.C row 14). Each transform
  * is written against the unified DataFrame API, so the same function
  * serves the batch table and the `readStream` source: in streaming mode
  * Spark plans incremental stateful aggregation with watermark-driven
  * state eviction; in batch mode the identical plan is a one-shot
  * aggregation (which is what the DuckDB oracle checks — see
  * graft.queries.StreamShapeQueries).
  */
object Streams {

  /** Tumbling event-time windows: count + sum per (window, key). */
  def tumblingAgg(df: DataFrame, tsCol: String, duration: String, keyCol: String): DataFrame =
    df.groupBy(window(col(tsCol), duration), col(keyCol))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
      .select(col("window.start").as("wstart"), col("window.end").as("wend"),
        col(keyCol), col("n"), col("total_value"))

  /** Sliding event-time windows (each event lands in duration/slide
    * overlapping windows). */
  def slidingAgg(df: DataFrame, tsCol: String, duration: String, slide: String): DataFrame =
    df.groupBy(window(col(tsCol), duration, slide))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
      .select(col("window.start").as("wstart"), col("n"), col("total_value"))

  /** Session windows per key: events closer than `gap` merge into one
    * session (stateful merging session aggregation in streaming mode). */
  def sessionAgg(df: DataFrame, tsCol: String, gap: String, keyCol: String): DataFrame =
    df.groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol), col("session_window.start").as("session_start"), col("n_events"))

  /** Streaming wrapper: watermarked tumbling aggregation — late events
    * beyond `watermark` are dropped and window state is evicted. */
  def watermarkedTumbling(stream: DataFrame, tsCol: String, watermark: String,
      duration: String, keyCol: String): DataFrame =
    tumblingAgg(stream.withWatermark(tsCol, watermark), tsCol, duration, keyCol)

  /** Streaming dedup on ids within the watermark horizon — bounded state,
    * unlike a global dropDuplicates. */
  def streamingDedup(stream: DataFrame, tsCol: String, watermark: String,
      idCols: Seq[String]): DataFrame =
    stream.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(idCols)

  /** Incremental per-key describe(): custom keyed state via
    * mapGroupsWithState maintaining Welford-merged running moments
    * (numerically stable single-pass mean/variance), null counts and
    * extrema; every micro-batch emits the updated profile for the keys it
    * touched (run the sink in Update mode). This is the streaming
    * counterpart of the batch numeric kernel — the same stat definitions
    * (ddof=1 variance) emerge from state instead of a rescan, with state
    * size O(keys), independent of stream length. Works identically on a
    * batch Dataset (one "batch" = the whole input). */
  def incrementalProfile(stream: DataFrame, keyCol: String, valueCol: String): Dataset[ProfileUpdate] = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .select(col(keyCol).cast("string").as("_1"), col(valueCol).cast("double").as("_2"))
      .as[(String, Option[Double])]
      .groupByKey(_._1)
      .mapGroupsWithState[ProfileState, ProfileUpdate](GroupStateTimeout.NoTimeout) {
        (key, rows, state) =>
          var s = state.getOption.getOrElse(emptyState)
          rows.foreach { case (_, v) => s = welford(s, v) }
          state.update(s)
          render(key, s)
      }
  }

  /** Incremental per-key QUANTILES: [[incrementalProfile]] covers the
    * moment block, but running medians/percentiles have no
    * constant-space exact form — the state here is a serialized KLL
    * sketch ([[graft.plans.KllState]], ~k log(n/k) doubles per key,
    * independent of stream length), folded forward each micro-batch and
    * emitted with the current estimates (Update-mode sink).
    *
    * The emitted `sketch` bytes are the SAME object
    * [[graft.operators.Profiles]] stores per batch shard, so a streaming
    * ingest monitor and a batch backfill produce union-compatible
    * summaries: corpus quantiles = KllUnionAgg over both. Works
    * identically on a batch Dataset (one "batch" = the whole input). */
  def quantileMonitor(stream: DataFrame, keyCol: String, valueCol: String,
      probs: Seq[Double], k: Int = 200): Dataset[QuantileUpdate] = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .select(col(keyCol).cast("string").as("_1"), col(valueCol).cast("double").as("_2"))
      .as[(String, Option[Double])]
      .groupByKey(_._1)
      .mapGroupsWithState[Array[Byte], QuantileUpdate](GroupStateTimeout.NoTimeout) {
        (key, rows, state) =>
          val st = state.getOption.map(graft.plans.KllState.deserialize)
            .getOrElse(new graft.plans.KllState(k))
          rows.foreach { case (_, v) =>
            v.foreach(d => if (!d.isNaN) st.update(d))
          }
          val bytes = st.serialize()
          state.update(bytes)
          QuantileUpdate(key, st.n, probs.map(st.quantile), bytes)
      }
  }

  /** Streaming recency-weighted engagement: the incremental twin of
    * [[graft.operators.Stats.decayedSum]]. Per-key state is THREE
    * numbers — (n_events, decayed_sum as of last_seen, last_seen_us) —
    * folded forward by re-referencing both sides to the later instant:
    *   ref' = max(last_seen, t);
    *   s'   = s·e^(−λ(ref'−last_seen)) + v·e^(−λ(ref'−t))
    * Exponential decay to a common reference composes, so the fold is
    * ORDER-INVARIANT across events and micro-batches (late events decay
    * themselves instead of corrupting the running sum) and the final
    * state equals the batch Σ v·e^(−λ(last_seen−t)) exactly (up to
    * float association). O(keys) state, no window, no event retention.
    * Works identically on a batch Dataset. */
  def engagementMonitor(stream: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, halfLifeDays: Double): Dataset[EngagementUpdate] = {
    require(halfLifeDays > 0, s"half-life must be positive, got $halfLifeDays")
    val lambdaUs = math.log(2.0) / (halfLifeDays * 86400.0 * 1e6)
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .select(col(keyCol).cast("string").as("_1"),
        unix_micros(col(tsCol)).as("_2"), col(valueCol).cast("double").as("_3"))
      .as[(String, Option[Long], Option[Double])]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Double, Long), EngagementUpdate](
          OutputMode.Update(), GroupStateTimeout.NoTimeout) { (key, rows, state) =>
        var (n, s, last) = state.getOption.getOrElse((0L, 0.0, Long.MinValue))
        rows.foreach {
          case (_, Some(t), Some(v)) =>
            val ref = math.max(last, t)
            s = (if (last == Long.MinValue) 0.0
                 else s * math.exp(-lambdaUs * (ref - last))) +
              v * math.exp(-lambdaUs * (ref - t).toDouble)
            last = ref
            n += 1
          case _ => // null ts or value: excluded, matching the batch op
        }
        // A key whose every event so far was null-ts/null-value has never
        // folded anything: emitting would leak the Long.MinValue last_seen
        // sentinel (and n=0, s=0) to consumers who'd compute a garbage
        // now−last_seen decay delta. Keep it silent until a real event.
        if (last == Long.MinValue) Iterator.empty
        else { state.update((n, s, last)); Iterator(EngagementUpdate(key, n, s, last)) }
      }
  }

  /** Streaming event-rate anomaly monitor: the incremental twin of
    * [[graft.operators.Sequences.rateAnomalies]]. Per-key state is the
    * map hourBucket → running count, bounded to the trailing
    * `trailingHours` + 1 buckets behind the key's LATEST hour (older
    * buckets evict each batch) — O(keys · trailingHours), independent
    * of stream length. Each micro-batch folds its per-hour increments,
    * then re-scores every TOUCHED hour against the trailing buckets
    * present in state (same mean/stddev_samp/z as the batch operator;
    * z = None on a degenerate baseline). Late events within the
    * retained span fold into their own hour exactly; events older than
    * the span are dropped (the state's watermark, mirroring the batch
    * RANGE frame's horizon). Works identically on a batch Dataset. */
  def rateMonitor(stream: DataFrame, keyCol: String, tsCol: String,
      trailingHours: Int = 24): Dataset[RateUpdate] = {
    require(trailingHours > 0, s"trailingHours must be positive")
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .select(col(keyCol).cast("string").as("_1"),
        expr(s"unix_micros(`$tsCol`) div 3600000000L").as("_2"))
      .as[(String, Option[Long])]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Map[Long, Long], RateUpdate](
          OutputMode.Update(), GroupStateTimeout.NoTimeout) { (key, rows, state) =>
        var counts = state.getOption.getOrElse(Map.empty[Long, Long])
        val touched = scala.collection.mutable.Set[Long]()
        rows.foreach {
          case (_, Some(h)) =>
            val newest = counts.keysIterator.foldLeft(h)(math.max)
            if (h >= newest - trailingHours) {
              counts = counts.updated(h, counts.getOrElse(h, 0L) + 1L)
              touched += h
            }
          case _ => // null ts: excluded, matching the batch op
        }
        if (touched.isEmpty) Iterator.empty
        else {
          val newest = counts.keysIterator.max
          counts = counts.filter { case (h, _) => h >= newest - trailingHours }
          state.update(counts)
          touched.iterator.filter(counts.contains).map { h =>
            val base = counts.collect {
              case (b, c) if b >= h - trailingHours && b < h => c.toDouble
            }.toSeq
            val z =
              if (base.size < 2) None
              else {
                val m = base.sum / base.size
                val v = base.map(x => (x - m) * (x - m)).sum / (base.size - 1)
                if (v > 0) Some((counts(h) - m) / math.sqrt(v)) else None
              }
            RateUpdate(key, h * 3600000000L, counts(h), base.size, z)
          }.toList.sortBy(_.hour_us).iterator
        }
      }
  }

  /** Streaming trending terms: the frequent-items twin of
    * [[quantileMonitor]]. Per-key state is a Misra–Gries counter map of
    * at most `capacity` entries ([[graft.plans.FreqItemsAgg]] — the same
    * sketch the batch heavy-hitters pass folds map-side), advanced one
    * MG step per token each micro-batch. State is O(keys · capacity),
    * independent of stream length and of the (unbounded) term universe —
    * the monitor never holds a full term count map. Each update emits the
    * current counters (superset guarantee + lower-bound counts as in the
    * batch sketch); an exact recount of the emitted candidates, as in
    * [[graft.operators.TextAnalysis.exactHeavyHitters]] pass 2, turns
    * any snapshot into exact trending counts. Works identically on a
    * batch Dataset. */
  def trendingTermsMonitor(stream: DataFrame, keyCol: String, textCol: String,
      capacity: Int = 256): Dataset[TrendingUpdate] = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .select(col(keyCol).cast("string").as("_1"),
        graft.operators.TextAnalysis.tokens(col(textCol)).as("_2"))
      .as[(String, Seq[String])]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Array[Byte]), TrendingUpdate](GroupStateTimeout.NoTimeout) {
        (key, rows, state) =>
          val (seen0, bytes0) = state.getOption.getOrElse((0L, Array.empty[Byte]))
          val counts =
            if (bytes0.isEmpty) scala.collection.mutable.HashMap.empty[String, Long]
            else graft.plans.FreqItemsAgg.deserializeCounts(bytes0)
          var seen = seen0
          rows.foreach { case (_, toks) =>
            toks.foreach { t =>
              graft.plans.FreqItemsAgg.mgUpdate(counts, t, capacity)
              seen += 1L
            }
          }
          state.update((seen, graft.plans.FreqItemsAgg.serializeCounts(counts)))
          TrendingUpdate(key, seen,
            counts.toSeq.sortBy { case (t, c) => (-c, t) })
      }
  }

  /** The 100 TB form of [[incrementalProfile]]: per-key state is DROPPED
    * once a key has been idle past `idleGap` of event time — an
    * EventTimeTimeout fires when the stream's watermark passes
    * (last event time seen for the key + idleGap); the final profile is
    * emitted once more and the state removed, so a later event restarts
    * the key from zero. State size is O(keys active within the idle
    * horizon), not O(keys ever seen) — the difference between a bounded
    * and an unbounded state store on an unbounded key space. */
  def incrementalProfileEvicting(
      stream: DataFrame, tsCol: String, watermark: String,
      keyCol: String, valueCol: String, idleGapMs: Long): Dataset[ProfileUpdate] = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream.withWatermark(tsCol, watermark)
      // no cast on the event-time column: a cast would strip the watermark
      // metadata the EventTimeTimeout checker looks for
      .select(col(keyCol).cast("string").as("_1"),
        col(valueCol).cast("double").as("_2"),
        col(tsCol).as("_3"))
      .as[(String, Option[Double], java.sql.Timestamp)]
      .groupByKey(_._1)
      .mapGroupsWithState[ProfileState, ProfileUpdate](GroupStateTimeout.EventTimeTimeout) {
        (key, rows, state) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove() // eviction: the watermark passed the idle horizon
            render(key, s)
          } else {
            var s = state.getOption.getOrElse(emptyState)
            var lastSeen = Long.MinValue
            rows.foreach { case (_, v, t) =>
              lastSeen = math.max(lastSeen, t.getTime)
              s = welford(s, v)
            }
            state.update(s)
            // timeout must sit beyond the current watermark: a key fed only
            // watermark-old events still gets a (near-immediate) horizon
            state.setTimeoutTimestamp(
              math.max(lastSeen + idleGapMs, state.getCurrentWatermarkMs + 1))
            render(key, s)
          }
      }
  }

  /** Watermarked stream-stream interval join (the impression/click shape):
    * inner-join rows of the same `key` where the right event time falls in
    * [left.ts - beforeMs, left.ts + afterMs]. Both sides carry watermarks
    * and the join condition bounds event time in BOTH directions, which is
    * what lets Spark evict each side's join state once the other side's
    * watermark passes the interval — bounded state on unbounded streams.
    * Right-side columns come back suffixed `_r`. Works identically in
    * batch (a plain interval join). */
  def intervalJoin(
      left: DataFrame, right: DataFrame, key: String, tsCol: String,
      watermark: String, beforeMs: Long, afterMs: Long): DataFrame = {
    val l = left.withWatermark(tsCol, watermark)
    val r0 = right.columns.foldLeft(right)((d, c) => d.withColumnRenamed(c, c + "_r"))
    val r = r0.withWatermark(tsCol + "_r", watermark)
    l.join(r,
      col(key) === col(key + "_r") &&
        col(tsCol + "_r") >= col(tsCol) - expr(s"INTERVAL $beforeMs MILLISECONDS") &&
        col(tsCol + "_r") <= col(tsCol) + expr(s"INTERVAL $afterMs MILLISECONDS"))
  }

  /** LEFT OUTER stream-stream interval join: like [[intervalJoin]] but a
    * left event with no right match within the interval is EMITTED with
    * null right columns ONCE the watermark passes its join window —
    * the "order with no payment within an hour" alert shape. Outer
    * emission is watermark-driven by the engine: a missing match is only
    * provable when no qualifying right event can still arrive, so
    * unmatched rows surface with watermark latency (exactly the
    * documented Structured Streaming contract), while matches emit as
    * they meet. State on both sides is bounded by watermark + interval. */
  def intervalJoinLeftOuter(
      left: DataFrame, right: DataFrame, key: String, tsCol: String,
      watermark: String, beforeMs: Long, afterMs: Long): DataFrame = {
    val l = left.withWatermark(tsCol, watermark)
    val r0 = right.columns.foldLeft(right)((d, c) => d.withColumnRenamed(c, c + "_r"))
    val r = r0.withWatermark(tsCol + "_r", watermark)
    l.join(r,
      col(key) === col(key + "_r") &&
        col(tsCol + "_r") >= col(tsCol) - expr(s"INTERVAL $beforeMs MILLISECONDS") &&
        col(tsCol + "_r") <= col(tsCol) + expr(s"INTERVAL $afterMs MILLISECONDS"),
      "leftOuter")
  }

  /** Stream-static enrichment: every micro-batch joins the static
    * dimension with an explicit broadcast hint — stateless (nothing to
    * evict; the static side is re-resolved per batch, so a refreshed
    * dimension snapshot is picked up on the next batch). The 100 TB
    * shape: the stream never shuffles, the dimension ships once per
    * executor. Left join keeps un-enrichable events (null dim columns)
    * rather than silently dropping them. */
  def enrichWithStatic(stream: DataFrame, static: DataFrame,
      streamKey: String, staticKey: String): DataFrame =
    stream.join(broadcast(static), col(streamKey) === col(staticKey), "left")

  /** Streaming CDC maintenance: maintain a keyed table under
    * [[graft.operators.Merge.upsert]] semantics as DELTA dirs plus
    * periodic full snapshots — the checkpoint + WAL layout (VERDICT r15
    * #2). Every micro-batch appends ONLY its deduped rows as
    * `d=<batchId>` (O(batch) write I/O); every `snapshotEvery` deltas
    * the state folds into a full snapshot `v=<id>`. The r14 design
    * wrote a complete base copy PER BATCH, so cumulative write I/O was
    * O(batches × base size) even after retention GC bounded storage;
    * here it is O(batches × delta + batches/K × base) — the same
    * amplification class tiered compaction cut for the dedup index.
    *
    * Readers resolve [[latestTable]] (newest complete snapshot + the
    * complete deltas above it, later delta winning per key); a
    * pre-delta layout (only `v=` dirs) reads through it unchanged.
    * `snapshotEvery = 1` reproduces the r14 per-batch-snapshot write
    * profile — kept as the measured A/B control arm.
    *
    * Replay safety: a recovering batch overwrites its own `d=<id>`;
    * the fold derives from the newest complete snapshot STRICTLY BELOW
    * the current id (its own possibly-crashed `v=<id>` is never read)
    * plus the committed deltas above it, all immutable — idempotent.
    * GC (inside the fold step) keeps the newest `keepVersions`
    * complete snapshots, and deletes deltas only at or below the
    * SECOND-newest kept snapshot — exactly the window a replayed fold
    * still reads. In-batch duplicate keys collapse via dropDuplicates
    * BEFORE the delta lands (last-writer-wins needs an explicit
    * priority column; callers with one should pre-dedup). */
  def upsertSink(stream: DataFrame, keys: Seq[String], targetDir: String,
      keepVersions: Int = 4, snapshotEvery: Int = 8)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    // K >= 2: a replayed fold derives from the PREVIOUS snapshot, so GC
    // must never leave fewer than two complete snapshots (VERDICT r14 #3)
    require(keepVersions >= 2, s"keepVersions must be >= 2, got $keepVersions")
    require(snapshotEvery >= 1, s"snapshotEvery must be >= 1, got $snapshotEvery")
    // __b/__rn are foldState's working columns; withColumn would
    // silently REPLACE same-named user columns and the post-fold drop
    // would then delete user data (ADVICE r16)
    Seq("__b", "__rn").foreach(c => require(!stream.columns.contains(c),
      s"column name '$c' is reserved by upsertSink's fold"))
    stream.writeStream.foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        val spark = batch.sparkSession
        val dedup = batch.dropDuplicates(keys)
        // (1) the WAL write: this batch's upsert delta, O(batch) bytes.
        // Overwrite + marker-after-write make replay idempotent.
        dedup.write.mode("overwrite").parquet(s"$targetDir/d=$id")
        IndexStore.markCommitted(spark, s"$targetDir/d=$id")
        // (2) the checkpoint write: once snapshotEvery deltas sit above
        // the newest complete snapshot STRICTLY BELOW this id (a crashed
        // previous attempt's own v=<id> must not serve as the fold base
        // — its content embeds the OLD attempt's in-batch dedup picks,
        // while d=<id> was just rewritten with this attempt's), fold.
        val fs = IndexStore.hadoopFs(spark, targetDir)
        val snapBase = completeDirIds(fs, targetDir, "v=").filter(_ < id)
          .maxOption
        val floor = snapBase.getOrElse(-1L)
        val deltaIds = completeDirIds(fs, targetDir, "d=")
          .filter(i => i > floor && i <= id).sorted
        if (deltaIds.size >= snapshotEvery) {
          val base = snapBase.map(s0 => spark.read.parquet(s"$targetDir/v=$s0"))
          foldState(spark, base, deltaIds.map(i =>
              (i, spark.read.parquet(s"$targetDir/d=$i"))), keys)
            .write.mode("overwrite").parquet(s"$targetDir/v=$id")
          IndexStore.markCommitted(spark, s"$targetDir/v=$id")
          // (3) retention GC, crash-safe at any point: snapshots at or
          // above the keepVersions-th newest complete one are untouched;
          // a crash mid-delete leaves only superseded dirs for the next
          // fold's GC to re-sweep.
          val snapsNow = completeDirIds(fs, targetDir, "v=")
            .sorted(Ordering[Long].reverse)
          if (snapsNow.size > keepVersions) {
            val keepFloor = snapsNow(keepVersions - 1)
            dirIds(fs, targetDir, "v=").filter(_._1 < keepFloor)
              .foreach { case (_, p) => fs.delete(p, true) }
          }
          // deltas at or below the SECOND-newest surviving snapshot are
          // folded into every snapshot any replay can still read
          val kept = completeDirIds(fs, targetDir, "v=").sorted
          if (kept.size >= 2) {
            val dFloor = kept(kept.size - 2)
            dirIds(fs, targetDir, "d=").filter(_._1 <= dFloor)
              .foreach { case (_, p) => fs.delete(p, true) }
          }
        }
    }
  }

  /** Numbered `<prefix><n>` subdirectories of a maintained-table dir. */
  private def dirIds(fs: org.apache.hadoop.fs.FileSystem, dir: String,
      prefix: String): Seq[(Long, org.apache.hadoop.fs.Path)] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
      .flatMap(s => scala.util.Try(
        s.getPath.getName.stripPrefix(prefix).toLong).toOption
        .map(v => (v, s.getPath)))
  }

  private def completeDirIds(fs: org.apache.hadoop.fs.FileSystem, dir: String,
      prefix: String): Seq[Long] =
    dirIds(fs, dir, prefix).collect {
      case (v, p) if IndexStore.isComplete(fs, p) => v
    }

  /** Fold a base snapshot plus ordered upsert deltas into the current
    * state: deltas collapse FIRST by key precedence (later batch wins —
    * one window over the delta rows only, never the base), then one
    * [[graft.operators.Merge.upsert]] against the base. Cost is
    * O(base + Σ deltas) with a single anti-join touching the base —
    * never K chained joins. */
  private def foldState(spark: SparkSession, base: Option[DataFrame],
      deltas: Seq[(Long, DataFrame)], keys: Seq[String]): DataFrame = {
    val tagged = deltas.map { case (i, df) => df.withColumn("__b", lit(i)) }
      .reduce(_ unionByName _)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(col("__b").desc)
    // (key, __b) is unique — each delta is key-deduped — so the pick is
    // deterministic, not a partition-order artifact
    val collapsed = tagged.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn", "__b")
    base match {
      case Some(b) => graft.operators.Merge.upsert(b, collapsed, keys)
      case None => collapsed
    }
  }

  /** The maintained table's current state: the newest complete snapshot
    * strictly below `below` plus every complete delta above it (and
    * strictly below `below`), folded with later-delta-wins precedence.
    * None while the table is empty. Reads a pre-delta layout (only
    * `v=` dirs) unchanged — zero deltas fold to the snapshot itself. */
  def latestTable(spark: SparkSession, targetDir: String, keys: Seq[String],
      below: Long = Long.MaxValue): Option[DataFrame] = {
    val fs = IndexStore.hadoopFs(spark, targetDir)
    val snap = completeDirIds(fs, targetDir, "v=").filter(_ < below).maxOption
    val floor = snap.getOrElse(-1L)
    val deltaIds = completeDirIds(fs, targetDir, "d=")
      .filter(i => i > floor && i < below).sorted
    val base = snap.map(s0 => spark.read.parquet(s"$targetDir/v=$s0"))
    if (deltaIds.isEmpty) base
    else Some(foldState(spark, base,
      deltaIds.map(i => (i, spark.read.parquet(s"$targetDir/d=$i"))), keys))
  }

  /** Streaming INGESTION DEDUP — the arrival-time gate of a training
    * corpus, maintained as an APPEND-ONLY corpus plus a standing dedup
    * index (shingle rows + LSH band-key rows), so per-batch work is
    * batch signing + equi-joins against the stored index — the corpus
    * is NEVER re-shingled, re-signed, or rewritten. Each micro-batch:
    *
    *   1. self-dedup: any doc near-duplicating a lower-id doc of the
    *      same batch is dropped ([[graft.operators.Dedup.nearDupPairsFromRows]]);
    *   2. cross-dedup: batch docs near-duplicating the standing corpus
    *      are dropped — candidates meet only through band keys shared
    *      with the stored index
    *      ([[graft.operators.Dedup.crossNearDupPairsFromIndex]]);
    *   3. survivors (and THEIR index rows) are appended as
    *      `batch=<batchId>` subdirectories of `docs/`, `sh/` and `bk/`.
    *
    * Replay safety mirrors [[upsertSink]]: a recovering batch reads the
    * index restricted to batches STRICTLY BELOW its own id and
    * overwrites its own subdirectories — idempotent. `idCol` must be
    * unique within a batch; `batch` is a reserved column name in the
    * stored layout. The batch's persisted frames are unpersisted at the
    * end of every micro-batch (a streaming job must not accumulate
    * cache), and the one scan of the stored index per batch replaces
    * the previous design's full corpus recompute + rewrite.
    *
    * INDEX COMPACTION (`compactEvery`): appending small per-batch dirs
    * forever fragments the index into O(batches) part files, and the
    * per-batch index read pays listing + parquet footers for every one
    * of them — a sustained 1000-batch run measured per-batch latency
    * bending SUPERLINEAR (~6 s around batch 100 → >110 s by batch 700,
    * ~18× for ~7× index rows; run terminated as unbounded — BASELINE.md
    * round 14); with compaction the probe cost tracks index ROWS, not
    * index AGE. Whenever `compactEvery` live `batch=` dirs accumulate,
    * they fold into a `shc/gen=<lo>_<hi>` / `bkc/gen=<lo>_<hi>` RUN
    * (original `batch` kept as a data column), and `compactFanout`
    * adjacent same-tier runs merge one tier up — size-tiered/LSM-style,
    * so a row is rewritten O(log(batches)) times over the stream's
    * life, not O(batches/compactEvery) as the original single-level
    * full fold did (see [[compactIndexDir]]). Crash-safe at every
    * point: a run's content is a pure function of its batch range over
    * immutable committed inputs, so a replayed batch overwrites it
    * equivalently; a run without its completion marker is invisible to
    * readers; and the read path takes the complete runs plus only live
    * dirs AT OR ABOVE the coverage end, so a crash mid-cleanup can
    * never double-count a superseded dir. `docs/` is never compacted —
    * it is the append-only corpus, not read on the ingest path. */
  def dedupIngestSink(stream: DataFrame, idCol: String, textCol: String,
      targetDir: String, threshold: Double = 0.7,
      shingleWords: Int = 3, numHashes: Int = 128,
      bands: Int = 32, rowsPerBand: Int = 4, seed: Int = 42,
      compactEvery: Int = 64, probeBroadcastMaxRows: Long = 4L << 20,
      compactFanout: Int = 4, bloomFpp: Double = 0.0)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        val spark = batch.sparkSession
        import graft.operators.Dedup
        val (docsDir, shDir, bkDir) =
          (s"$targetDir/docs", s"$targetDir/sh", s"$targetDir/bk")
        val (shGen, bkGen) = (s"$targetDir/shc", s"$targetDir/bkc")
        val useBloom = bloomFpp > 0
        // per-sidecar share of the user-facing fpp — see noveltyMonitor
        val sidecarFpp =
          (if (useBloom) bloomFpp else 0.01) / (compactEvery + 8)
        // sh generations range-shard by doc id so the probe's candidate-id
        // pushdown prunes to matching files; bk generations cannot be
        // pruned by any layout (a batch's band keys cover the hash space
        // — see crossNearDupPairsFromIndexProbe) and stay hash-sharded.
        // bloomFpp > 0 additionally keeps a Bloom sidecar over bk and
        // prefilters the batch's band keys before the candidate join —
        // EXACT regardless of fpp (a false positive only survives to the
        // verify join; a false negative cannot happen; the 500-batch A/B
        // produced bit-identical corpora). OFF by default by
        // measurement: at the 10%-dup probe shape the sidecar
        // maintenance cost ~4% more than the prefilter saved, because
        // probable keys exist every batch and the candidate scan runs
        // anyway (BASELINE r16); the win case is a mostly-unique feed
        // whose batches can skip the index entirely.
        IndexStore.compactIndexDir(spark, shDir, shGen, id, compactEvery,
          rangeShardCol = Some("id"), fanout = compactFanout)
        IndexStore.compactIndexDir(spark, bkDir, bkGen, id, compactEvery,
          fanout = compactFanout,
          bloomCol = if (useBloom) Some("bk") else None,
          bloomFpp = sidecarFpp)
        val shB = Dedup.shingleRows(batch.toDF(), idCol, textCol, shingleWords)
          .persist()
        // band rows feed three consumers (self-dedup, the cross probe, the
        // index append) — persist so the signing aggregation runs once,
        // and so the probe's broadcast gate can count them cheaply
        var bkB: DataFrame = null
        var kept: DataFrame = null
        try {
          bkB = Dedup.bandRows(shB, numHashes, bands, rowsPerBand, seed)
            .persist()
          // (1) pairs emit a < b, so b is always the drop side
          val selfDup = Dedup.nearDupPairsFromRows(shB, bkB, threshold)
            .select(col("b").as(idCol)).distinct()
          val selfKept = batch.join(selfDup, Seq(idCol), "left_anti")
          // (2) against the stored index, batches strictly below this id:
          // the probe form scans the index in place (no per-batch full-
          // index shuffle) whenever the batch's band keys are broadcast-
          // sized; 0 disables it (the StreamBench A/B's control arm)
          val crossKept =
            (IndexStore.readIndexDir(spark, shDir, shGen, id),
              IndexStore.readIndexDir(spark, bkDir, bkGen, id)) match {
              case (Some(indexSh), Some(indexBk)) =>
                // BLOOM PREFILTER on the batch's band keys: keys the bk
                // sidecars reject exist nowhere in the index and cannot
                // produce candidates — drop them before anything joins.
                // Exact regardless of fpp (false positives die in the
                // verify join). Falls back to the unfiltered keys when
                // any index dir lacks its sidecar (legacy layout).
                val bkProbe =
                  (if (useBloom) IndexStore.bloomProbe(spark, bkDir, bkGen, id)
                   else None) match {
                    case Some(might) => bkB.filter(might(col("bk")))
                    case None => bkB
                  }
                val nProbe = bkProbe.count()
                if (nProbe == 0) selfKept // no key matches: no candidates
                else {
                  val probe = probeBroadcastMaxRows > 0 &&
                    nProbe <= probeBroadcastMaxRows
                  val pairs =
                    if (probe) Dedup.crossNearDupPairsFromIndexProbe(
                      shB, bkProbe, indexSh.select("id", "s"),
                      indexBk.select("id", "bk"), threshold)
                    else Dedup.crossNearDupPairsFromIndex(
                      shB, bkProbe, indexSh.select("id", "s"),
                      indexBk.select("id", "bk"), threshold)
                  val dupIds = pairs.select(col("a").as(idCol)).distinct()
                  selfKept.join(dupIds, Seq(idCol), "left_anti")
                }
              case _ => selfKept // index still empty: first batch(es)
            }
          // (3) survivors + their index rows, replay-safe per-batch dirs
          kept = crossKept.persist()
          kept.write.mode("overwrite").parquet(s"$docsDir/batch=$id")
          val keptIds = kept.select(col(idCol).as("id"))
          shB.join(keptIds, "id").write.mode("overwrite")
            .parquet(s"$shDir/batch=$id")
          bkB.join(keptIds, "id").write.mode("overwrite")
            .parquet(s"$bkDir/batch=$id")
          if (useBloom)
            IndexStore.writeBloomSidecar(spark, s"$bkDir/batch=$id", "bk", sidecarFpp)
        } finally {
          shB.unpersist(false)
          if (bkB != null) bkB.unpersist(false)
          if (kept != null) kept.unpersist(false)
        }
    }

  /** Streaming DECONTAMINATION — the eval-gram-set filter at ingest
    * time, the streaming twin of [[graft.operators.Contamination.bloomKeep]]:
    * every micro-batch's documents are probed against a STANDING
    * benchmark/eval gram index and any document sharing at least one
    * distinct word n-gram with the eval set is dropped BEFORE the batch
    * lands in the corpus. The index
    * ([[graft.operators.Contamination.evalGramIndex]]) is built ONCE at
    * sink construction — the eval set is fixed for the life of the sink
    * — so per-batch work is one shingle pass over the batch, a map-side
    * Bloom probe (the batch's gram table never shuffles), and the exact
    * verify join that kills Bloom false positives: the drop set is
    * EXACT per batch.
    *
    * Replay safety mirrors [[dedupIngestSink]]'s layout: survivors land
    * in `targetDir/docs/batch=<batchId>` and a recovering batch
    * OVERWRITES its own subdirectory — idempotent. (The filter itself is
    * stateless across batches — the eval set, unlike the dedup index,
    * never grows — so replay safety is just the per-batch dir.) A
    * contaminated document is dropped in WHICHEVER batch it arrives,
    * including re-arrivals in later batches. */
  def deconIngestSink(stream: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchIdCol: String, benchTextCol: String,
      targetDir: String, n: Int = 3,
      expectedGrams: Long = 1L << 17, fpp: Double = 0.03)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    import graft.operators.Contamination
    val index = Contamination.evalGramIndex(
      bench, benchIdCol, benchTextCol, n, expectedGrams, fpp)
    stream.writeStream.foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        val bad = Contamination.contaminatedIds(batch.toDF(), idCol, textCol, index)
        batch.join(bad, Seq(idCol), "left_anti")
          .write.mode("overwrite").parquet(s"$targetDir/docs/batch=$id")
    }
  }

  /** Streaming DRIFT MONITOR: every micro-batch is scored with
    * [[graft.operators.Drift.psi]] against a STATIC reference frame
    * (yesterday's corpus, the training distribution) and the one-row
    * result is appended to a parquet log — the alert feed that catches a
    * upstream distribution break while the batch is still in flight.
    * The reference is unioned in per batch with `isBase` marking it, so
    * the PSI bins span both sides consistently; the reference plan is
    * re-read per batch (cache it outside when it is hot). */
  def psiMonitor(stream: DataFrame, reference: DataFrame, valueCol: String,
      logDir: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        val tagged = reference.select(col(valueCol), lit(true).as("__base"))
          .unionByName(batch.select(col(valueCol), lit(false).as("__base")))
        graft.operators.Drift.psi(tagged, valueCol, col("__base"))
          .withColumn("batch_id", lit(id))
          .write.mode("append").parquet(logDir)
    }

  /** Streaming CATEGORICAL drift monitor — [[psiMonitor]]'s twin for
    * enum-shaped columns (language codes, sources, priorities): every
    * micro-batch is scored with
    * [[graft.operators.Drift.categoricalPsi]] against the STATIC
    * reference and the one-row verdict (psi, counts, category count,
    * batch id) is appended to a parquet log. The share-based tail
    * pooling inside the operator keeps each batch's category frame
    * bounded no matter the column's cardinality. The reference is
    * re-resolved per batch (cache it outside when hot), same as
    * [[psiMonitor]]. */
  def categoricalPsiMonitor(stream: DataFrame, reference: DataFrame,
      valueCol: String, logDir: String, maxShareDenom: Long = 1000)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        val tagged = reference.select(col(valueCol), lit(true).as("__base"))
          .unionByName(batch.select(col(valueCol), lit(false).as("__base")))
        graft.operators.Drift.categoricalPsi(tagged, valueCol, col("__base"),
            maxShareDenom = maxShareDenom)
          .withColumn("batch_id", lit(id))
          .write.mode("append").parquet(logDir)
    }

  /** Streaming NOVELTY monitor — the ingestion-time counterpart of
    * [[graft.operators.TextAnalysis.novelty]]: every micro-batch reports
    * what fraction of its distinct word n-grams the standing corpus has
    * never seen, and appends exactly those novel grams to the index. A
    * collapsing novelty curve is the live signal that an ingest feed has
    * started replaying content worth deduplicating or dropping —
    * visible while the batch is in flight, before any document-level
    * detector fires.
    *
    * Replay-safe like [[dedupIngestSink]]: both the gram index and the
    * log write per-batch `batch=<id>` dirs with overwrite, and a batch
    * reads only index rows from batches STRICTLY below its own id, so a
    * recovery replay recomputes identical rows instead of double
    * counting itself. Gram membership is one left-anti equi join against
    * the index — the index holds each gram once (first-seen batch only),
    * so it grows with vocabulary, not corpus size.
    *
    * INDEX COMPACTION (`compactEvery`): the gram index had the exact
    * per-batch-dir fragmentation pathology the 1000-batch dedup-ingest
    * probe measured going superlinear at batch ~700 (listing + footer
    * cost for O(batches) dirs on EVERY probe — VERDICT r14 #1), so it
    * routes through the same [[compactIndexDir]]/[[readIndexDir]]
    * machinery: every `compactEvery` live dirs fold into a
    * `gramsc/gen=<lo>_<hi>` run that KEEPS the original first-seen
    * `batch` column (the compactor preserves it as a data column, which
    * is what first-seen-only semantics need), runs merge tiered at
    * `compactFanout`, and the probe reads the complete runs plus live
    * dirs only.
    *
    * BLOOM FRONT (`bloomMode`, VERDICT r15 #1): compaction fixed the
    * fragmentation pathology, but the probe still SCANS the standing
    * gram index once per batch — the engine's last measured growth term
    * (500-batch probe: 1.87→4.93 s/batch tracking the ~7M-row index;
    * scan-dominated, and no storage layout can prune it because a
    * batch's grams cover any layout). Every index dir therefore carries
    * a `_BLOOM` sidecar over its grams ([[IndexStore.writeBloomSidecar]]
    * — per-run sizing, so the front never saturates as the index
    * grows), and the probe fronts the read with a membership test:
    *
    *  - `"off"` (DEFAULT): the exact r15 probe, no sidecars. Default by
    *    measurement, not caution: at the 500-batch shape, maintaining +
    *    probing the front WITHOUT trusting it costs ~25% over this arm
    *    (BASELINE r16) — the confirm scan remains either way.
    *  - `"approx"`: the bloom verdict IS the verdict — ZERO index reads
    *    per batch, per-batch cost O(batch grams) independent of index
    *    size. Documented error: a truly-novel gram is miscounted as
    *    seen (and not indexed) with probability ≤ bloomFpp (each
    *    sidecar gets bloomFpp/(compactEvery+8), so the OR across dirs
    *    sums to the user rate; measured 0.455% at the 1% default over
    *    500 batches). This is the 100 TB mode: per-batch latency
    *    measured FLAT (ratio 0.965) while the exact arms grew with the
    *    index.
    *  - `"exact"`: identical output to `"off"` (bit-identical index in
    *    the 500-batch A/B) while building and probing the sidecars —
    *    the MIGRATION mode that makes an existing index approx-ready;
    *    bloom-rejected grams skip the index, but the accepted
    *    remainder's confirm scan still grows with the index.
    *
    * A dir missing its sidecar (legacy layout) silently falls back to
    * the exact scan and self-heals as compaction folds old dirs into
    * sidecar-carrying runs. */
  def noveltyMonitor(stream: DataFrame, idCol: String, textCol: String,
      targetDir: String, n: Int = 3, compactEvery: Int = 64,
      compactFanout: Int = 4, probeBroadcastMaxGrams: Long = 4L << 20,
      bloomMode: String = "off", bloomFpp: Double = 0.01)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    require(Set("off", "exact", "approx")(bloomMode),
      s"bloomMode must be off|exact|approx, got $bloomMode")
    require(bloomFpp > 0 && bloomFpp < 1, s"bloomFpp must be in (0,1): $bloomFpp")
    val useBloom = bloomMode != "off"
    // a probe ORs across up to compactEvery live sidecars plus a
    // tier-bounded handful of runs, so the user-facing bloomFpp is the
    // SUM bound and each sidecar gets its share (the unscaled per-dir
    // rate measured a 26% novelty undercount over ~66 dirs — r16 A/B)
    val sidecarFpp = bloomFpp / (compactEvery + 8)
    stream.writeStream.foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        val spark = batch.sparkSession
        val (gramsDir, gramsGen, logDir) =
          (s"$targetDir/grams", s"$targetDir/gramsc", s"$targetDir/log")
        IndexStore.compactIndexDir(spark, gramsDir, gramsGen, id, compactEvery,
          fanout = compactFanout,
          bloomCol = if (useBloom) Some("s") else None, bloomFpp = sidecarFpp)
        val bg = graft.operators.Dedup.shingleRows(batch.toDF(), idCol, textCol, n)
          .select("s").distinct().persist()
        try {
          // materialize before the count/anti-join diamond
          val nBg = bg.count()
          val front =
            if (useBloom) IndexStore.bloomProbe(spark, gramsDir, gramsGen, id)
            else None
          val novel = IndexStore.readIndexDir(spark, gramsDir, gramsGen, id) match {
            case Some(index) => front match {
              case Some(might) if bloomMode == "approx" =>
                // bloom-only verdict: no index read at all this batch
                bg.filter(!might(col("s")))
              case Some(might) =>
                // exact mode: bloom-rejected grams are PROVEN novel;
                // only the accepted remainder needs the index confirm
                val probable = bg.filter(might(col("s")))
                if (probeBroadcastMaxGrams > 0 && nBg <= probeBroadcastMaxGrams) {
                  val seen = index.select("s")
                    .join(broadcast(probable), Seq("s"), "left_semi")
                  bg.join(broadcast(seen), Seq("s"), "left_anti")
                } else bg.filter(!might(col("s")))
                  .unionByName(probable.join(index.select("s"), Seq("s"), "left_anti"))
              case None =>
                if (probeBroadcastMaxGrams > 0 && nBg <= probeBroadcastMaxGrams) {
                  // SEEN-SET FLIP — the same shape as the dedup-ingest
                  // probe plan: a plain left_anti against the standing
                  // index shuffles EVERY stored gram row per micro-batch
                  // (the join's right side cannot broadcast — it is the
                  // unbounded one). Instead broadcast the micro-batch's
                  // grams to an in-place semi-join scan of the index
                  // (never shuffled), and anti-join the batch against the
                  // resulting SEEN set, which is ≤ the batch's gram count
                  // by construction (the index holds each gram once).
                  val seen = index.select("s")
                    .join(broadcast(bg), Seq("s"), "left_semi")
                  bg.join(broadcast(seen), Seq("s"), "left_anti")
                } else bg.join(index.select("s"), Seq("s"), "left_anti")
            }
            case None => bg // index still empty: first batch(es)
          }
          novel.write.mode("overwrite").parquet(s"$gramsDir/batch=$id")
          val nGrams = bg.count()
          val nNovel = spark.read.parquet(s"$gramsDir/batch=$id").count()
          if (useBloom)
            IndexStore.writeBloomSidecar(spark, s"$gramsDir/batch=$id", "s",
              sidecarFpp, expectedRows = Some(nNovel))
          import spark.implicits._
          Seq((id, nGrams, nNovel,
              if (nGrams == 0) 0.0 else nNovel.toDouble / nGrams))
            .toDF("batch_id", "n_grams", "n_novel", "novelty")
            .write.mode("overwrite").parquet(s"$logDir/batch=$id")
        } finally bg.unpersist(false)
    }
  }

  /** Highest-numbered `v=<n>` subdirectory of an [[upsertSink]] target,
    * optionally restricted to versions strictly below `below` (recovery
    * replays pass the current batch id). Resolved through the path's
    * Hadoop FileSystem so remote targets (s3://, hdfs://) work —
    * java.io.File returns null for non-local URIs, which would silently
    * discard the maintained base table on remote storage. */
  def latestVersion(targetDir: String, below: Long = Long.MaxValue): Option[String] = {
    val path = new org.apache.hadoop.fs.Path(targetDir)
    val fs = path.getFileSystem(
      org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())
    if (!fs.exists(path)) None
    else fs.listStatus(path).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v="))
      .flatMap(st => scala.util.Try(st.getPath.getName.stripPrefix("v=").toLong)
        .toOption.filter(_ < below).map(v => (v, st.getPath.toString)))
      .sortBy(_._1).lastOption.map(_._2)
  }

  private val emptyState =
    ProfileState(0L, 0L, 0.0, 0.0, Double.PositiveInfinity, Double.NegativeInfinity)

  /** One Welford step (numerically stable running mean/M2). */
  private def welford(s: ProfileState, v: Option[Double]): ProfileState = v match {
    case None => s.copy(nNull = s.nNull + 1)
    case Some(x) =>
      val n1 = s.n + 1
      val d = x - s.mean
      val mean = s.mean + d / n1
      ProfileState(n1, s.nNull, mean, s.m2 + d * (x - mean),
        math.min(s.min, x), math.max(s.max, x))
  }

  private def render(key: String, s: ProfileState): ProfileUpdate =
    ProfileUpdate(key, s.n, s.nNull, s.mean,
      if (s.n > 1) s.m2 / (s.n - 1) else Double.NaN, s.min, s.max)
}
