package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence analytics over keyed, timestamped streams (the events
  * table shape): first-order transition structure and ordered-funnel
  * conversion. Both are single-pass shapes — the only windows run inside
  * per-key partitions (bounded by one key's event history, the standard
  * sessionization partitioning) or over the |states|²-cell transition
  * frame; nothing sorts the table globally.
  *
  * Not in the reference (petk profiles static tables); part of the
  * pipeline-extension surface (SURVEY.md §2.C) alongside sessionization
  * ([[graft.streaming.Streams.sessionAgg]]) and the decayed-engagement
  * feature ([[Stats.decayedSum]]).
  */
object Sequences {

  /** First-order Markov transition census: adjacent (from → to) state
    * pairs per key in event-time order, with transition counts and the
    * per-source conditional probability p(to | from). The successor
    * comes from `lead` over (key, ts, tieBreak) — `tieBreakCol` makes
    * the order TOTAL when timestamps tie, so the result is deterministic
    * and an independent engine replays it. Rows with a null state or
    * timestamp are excluded; each key's final event has no successor and
    * emits nothing. The probability divides by the per-source total via
    * a window over the transition-cell frame (≤ |states|² rows). */
  def transitionMatrix(df: DataFrame, keyCol: String, tsCol: String,
      stateCol: String, tieBreakCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieBreakCol))
    val steps = df
      .filter(col(stateCol).isNotNull && col(tsCol).isNotNull)
      .select(col(stateCol).as("from_state"),
        lead(col(stateCol), 1).over(w).as("to_state"))
      .filter(col("to_state").isNotNull)
    steps.groupBy("from_state", "to_state").agg(count(lit(1)).as("n"))
      .withColumn("p",
        col("n") / sum("n").over(Window.partitionBy("from_state")))
  }

  /** Top event PATHS: the `length`-step sliding windows of each key's
    * state sequence as ">"-joined path strings with corpus counts —
    * [[transitionMatrix]]'s higher-order sibling (first-order
    * transitions can't see that a→b→c dominates while a→b→d never
    * happens). Successors come from stacked `lead`s over the same
    * totally-ordered per-key window; a window is complete iff its LAST
    * lead is non-null (earlier leads then can't be null — they read
    * nearer rows of the same filtered partition). `minCount` bounds the
    * output; rank in the caller. */
  def topPaths(df: DataFrame, keyCol: String, tsCol: String,
      stateCol: String, tieBreakCol: String, length: Int,
      minCount: Long): DataFrame = {
    require(length >= 2, s"path length must be at least 2, got $length")
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieBreakCol))
    val steps = col(stateCol) +:
      (1 until length).map(i => lead(col(stateCol), i).over(w))
    df.filter(col(stateCol).isNotNull && col(tsCol).isNotNull)
      .select(steps.last.as("__last"), concat_ws(">", steps: _*).as("path"))
      .filter(col("__last").isNotNull)
      .groupBy("path").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
  }

  /** Cohort RETENTION: keys grouped by their first-active period (the
    * cohort), then counted per (cohort, period-offset) they came back
    * in — the classic retention triangle. Periods are
    * `floor((t − t_min)/periodDays)` against the frame's earliest
    * timestamp (1-row broadcast), so the binning is engine-replayable
    * with no wall-clock anchor; the quotient stays far inside double
    * precision for any real time range (µs offsets < 2^53). Shape: one
    * distinct over (key, period) — the activity matrix, bounded by
    * keys × periods, much smaller than the event table — then a per-key
    * window for the cohort (bounded by one key's periods) and one hash
    * agg; the retention rate divides by the cohort's offset-0 size via
    * a window over the (cohort × offset) frame. Returns
    * (cohort, offset, n_active, retention); offset 0 rows carry
    * retention 1 by construction. */
  def retentionCohorts(df: DataFrame, keyCol: String, tsCol: String,
      periodDays: Int): DataFrame = {
    require(periodDays > 0, s"period must be positive, got $periodDays")
    val periodUs = periodDays * 86400L * 1000000L
    val anchor = df.agg(min(unix_micros(col(tsCol))).as("__t0"))
    val activity = df
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .crossJoin(broadcast(anchor))
      .select(col(keyCol).as("k"),
        floor((unix_micros(col(tsCol)) - col("__t0")) / periodUs).cast("long")
          .as("period"))
      .distinct()
    val withCohort = activity
      .withColumn("cohort", min("period").over(Window.partitionBy("k")))
    val counts = withCohort
      .groupBy(col("cohort"), (col("period") - col("cohort")).as("offset"))
      .agg(count(lit(1)).as("n_active")) // (k, period) distinct ⇒ count = distinct keys
    counts
      .withColumn("__size",
        max(when(col("offset") === 0, col("n_active")))
          .over(Window.partitionBy("cohort")))
      .select(col("cohort"), col("offset"), col("n_active"),
        (col("n_active") / when(col("__size") > 0, col("__size")))
          .as("retention"))
  }

  /** Ordered-funnel conversion: how many keys reached each stage of
    * `stages` IN ORDER — stage i counts iff the key's FIRST touch of
    * stage i happened strictly after its first touch of stage i−1 (the
    * first-touch funnel convention; re-orderings don't convert). One
    * hash aggregation builds every per-key first-touch instant
    * (min-when, integral microseconds), the stage flags are a scalar
    * fold over those, and one closing aggregate emits the funnel — two
    * aggregations total regardless of stage count, no joins, no
    * windows. Returns (stage_idx, stage, n_converted, rate) with rate
    * relative to stage 1 (null when stage 1 converted nobody). */
  def conversionFunnel(df: DataFrame, keyCol: String, tsCol: String,
      stageCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "conversionFunnel needs at least one stage")
    val firstTouch = stages.zipWithIndex.map { case (s, i) =>
      min(when(col(stageCol) === s, unix_micros(col(tsCol)))).as(s"__t$i")
    }
    val perKey = df.groupBy(col(keyCol)).agg(firstTouch.head, firstTouch.tail: _*)
    val flags = stages.indices.foldLeft(Seq.empty[Column]) { (acc, i) =>
      val reached =
        if (i == 0) col(s"__t$i").isNotNull
        else acc.last && col(s"__t$i").isNotNull && col(s"__t$i") > col(s"__t${i - 1}")
      acc :+ reached
    }
    val counts = perKey.agg(
      sum(when(flags.head, 1L).otherwise(0L)).as("__c0"),
      flags.tail.zipWithIndex.map { case (f, i) =>
        sum(when(f, 1L).otherwise(0L)).as(s"__c${i + 1}") }: _*)
    val rows = stages.zipWithIndex.map { case (s, i) =>
      struct(lit(i + 1).as("stage_idx"), lit(s).as("stage"),
        col(s"__c$i").as("n_converted"),
        (col(s"__c$i") / when(col("__c0") > 0, col("__c0"))).as("rate"))
    }
    counts.select(explode(array(rows: _*)).as("f")).select("f.*")
  }

  /** User survival curve: for each horizon day d, the fraction of keys
    * whose observed LIFETIME (last active day − first active day)
    * reaches d — the churn/retention readout by engagement span.
    * One corpus-scale hash agg to per-key lifetimes; the distinct
    * lifetime values collapse to a bounded frame (≤ elapsed days),
    * against which the `horizonDays`+1-row horizon frame broadcasts.
    * Returns (d, n_surviving, survival). */
  def survivalCurve(df: DataFrame, keyCol: String, tsCol: String,
      horizonDays: Int): DataFrame = {
    val lt = df.filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(datediff(max(to_date(col(tsCol))), min(to_date(col(tsCol))))
        .as("lifetime"))
    val lc = lt.groupBy("lifetime").agg(count(lit(1)).as("n_at"))
    val tot = lt.agg(count(lit(1)).as("__n"))
    df.sparkSession.range(0, horizonDays + 1L)
      .select(col("id").cast("int").as("d"))
      .join(broadcast(lc), col("lifetime") >= col("d"), "left")
      .groupBy("d")
      .agg(coalesce(sum("n_at"), lit(0L)).as("n_surviving"))
      .crossJoin(broadcast(tot))
      .select(col("d"), col("n_surviving"),
        (col("n_surviving") / when(col("__n") > 0, col("__n"))).as("survival"))
  }

  /** CUSUM change-point screen over the daily count series: cumulative
    * sum of deviations from the global daily mean — a level shift in
    * the rate bends the cumulative path, and the |CUSUM| peak marks
    * the most likely change day (Page 1954's classic chart, reduced to
    * its batch screen). Corpus-scale work is one hash agg to the daily
    * frame; the running sum and the peak flag run over the
    * calendar-bounded day frame. Returns
    * (day, cnt, cusum, is_peak). */
  def cusumChangePoint(df: DataFrame, tsCol: String): DataFrame = {
    val daily = df.filter(col(tsCol).isNotNull)
      .groupBy(to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("cnt"))
    val mean = daily.agg(avg("cnt").as("__mean"))
    val w = Window.orderBy("day").rowsBetween(Long.MinValue, 0L)
    val withCusum = daily.crossJoin(broadcast(mean))
      .withColumn("cusum", sum(col("cnt") - col("__mean")).over(w))
    val peak = withCusum.agg(max(abs(col("cusum"))).as("__peak"))
    withCusum.crossJoin(broadcast(peak))
      .select(col("day"), col("cnt"), col("cusum"),
        (abs(col("cusum")) === col("__peak")).as("is_peak"))
  }

  /** Debounce: keep only the FIRST event per key per tumbling bucket —
    * the standard event-stream thinning (dedup of retry storms,
    * double-clicks, at-least-once replays) in batch form. One window
    * per (keys, bucket) partition ordered by (ts, tieCol) — bounded by
    * a key's events inside one bucket; the bucket id is a pure
    * function of the timestamp, so the result is partition-invariant
    * and append-stable. `tieCol` must make the order total within a
    * bucket. */
  def debounce(df: DataFrame, keyCols: Seq[String], tsCol: String,
      tieCol: String, bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    // exact integer division — no float-floor boundary cases
    val bucket = expr(s"unix_micros(`$tsCol`) div ${bucketSeconds * 1000000L}L")
    val w = Window.partitionBy(keyCols.map(col) :+ bucket: _*)
      .orderBy(col(tsCol), col(tieCol))
    df.filter(col(tsCol).isNotNull)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Hourly event-rate anomaly screen: counts per (type, hour), each
    * hour z-scored against its type's TRAILING window (RANGE frame on
    * epoch seconds, so calendar gaps don't shift the baseline the way a
    * ROWS frame would). Window partitions are per type over the HOURLY
    * frame — bounded by elapsed wall-clock, not corpus size; the only
    * corpus-scale operation is the first hash aggregation. Hours with a
    * degenerate baseline (fewer than 2 trailing points, or zero
    * variance) emit null z — ANSI-safe, and a null never flags.
    * Returns (typeCol, hour, cnt, base_mean, base_std, z). */
  def rateAnomalies(df: DataFrame, tsCol: String, typeCol: String,
      trailingHours: Int = 24): DataFrame = {
    val hourly = df
      .filter(col(typeCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(typeCol),
        date_trunc("hour", col(tsCol)).cast("timestamp_ntz").as("hour"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("__e", unix_timestamp(col("hour").cast("timestamp")))
    val w = Window.partitionBy(col(typeCol)).orderBy(col("__e"))
      .rangeBetween(-trailingHours.toLong * 3600L, -1L)
    hourly
      .withColumn("base_mean", avg(col("cnt")).over(w))
      .withColumn("base_std", stddev_samp(col("cnt")).over(w))
      .withColumn("z",
        (col("cnt") - col("base_mean")) /
          when(col("base_std") > 0, col("base_std")))
      .drop("__e")
  }

  /** Stage-to-stage conversion latency: per-key FIRST-touch instants of
    * the two stages (one hash aggregation, the [[conversionFunnel]]
    * substrate), deltas only for keys whose `to` touch strictly follows
    * their `from` touch, reduced to count / mean / exact median
    * seconds. The quantile runs over the |converted keys| frame. */
  def funnelLatency(df: DataFrame, keyCol: String, tsCol: String,
      stageCol: String, from: String, to: String): DataFrame = {
    val perKey = df.groupBy(col(keyCol)).agg(
      min(when(col(stageCol) === from, unix_micros(col(tsCol)))).as("__tf"),
      min(when(col(stageCol) === to, unix_micros(col(tsCol)))).as("__tt"))
    perKey
      .filter(col("__tf").isNotNull && col("__tt").isNotNull &&
        col("__tt") > col("__tf"))
      .select(((col("__tt") - col("__tf")) / 1000000.0).as("delta_s"))
      .agg(count(lit(1)).as("n_converted"),
        avg("delta_s").as("mean_s"),
        percentile(col("delta_s"), lit(0.5)).as("median_s"))
  }

  /** Longest consecutive-day activity streak per key — the classic
    * gaps-and-islands shape: reduce to distinct (key, day), island id =
    * day − row_number days (consecutive days collapse to one constant),
    * longest island per key. The distinct() is the only corpus-scale
    * shuffle; the window partitions PER KEY over that key's distinct
    * days (bounded by the calendar, not the corpus), and the final
    * longest-per-key cut rides [[GroupTopK]] rather than a global sort.
    * Ties on length resolve to the LATEST streak start —
    * (len desc, start desc) is a total order within a key. Returns
    * (k, streak_len, streak_start). */
  def activityStreaks(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val days = df
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).as("k"), to_date(col(tsCol)).as("day")).distinct()
    val w = Window.partitionBy("k").orderBy("day")
    val islands = days
      .withColumn("grp", date_sub(col("day"), row_number().over(w)))
      .groupBy("k", "grp")
      .agg(count(lit(1)).as("streak_len"), min("day").as("streak_start"))
    GroupTopK.topK(islands, Seq("k"),
        Seq(col("streak_len").desc, col("streak_start").desc), 1, rankCol = "__rk")
      .select(col("k"), col("streak_len"), col("streak_start"))
  }
}
