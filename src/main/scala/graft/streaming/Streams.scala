package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Running per-key numeric profile state: Welford-merged moments +
  * extrema. The streaming counterpart of the describe() numeric kernel's
  * count/mean/variance/min/max block. */
case class ProfileState(
    n: Long, nNull: Long, mean: Double, m2: Double, min: Double, max: Double)

/** One emitted profile update (per key, per micro-batch). */
case class ProfileUpdate(
    key: String, count: Long, n_null: Long,
    mean: Double, variance: Double, min: Double, max: Double)

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
          var s = state.getOption.getOrElse(
            ProfileState(0L, 0L, 0.0, 0.0, Double.PositiveInfinity, Double.NegativeInfinity))
          rows.foreach {
            case (_, None) => s = s.copy(nNull = s.nNull + 1)
            case (_, Some(v)) =>
              val n1 = s.n + 1
              val d = v - s.mean
              val mean = s.mean + d / n1
              s = ProfileState(n1, s.nNull, mean, s.m2 + d * (v - mean),
                math.min(s.min, v), math.max(s.max, v))
          }
          state.update(s)
          ProfileUpdate(key, s.n, s.nNull, s.mean,
            if (s.n > 1) s.m2 / (s.n - 1) else Double.NaN, s.min, s.max)
      }
  }
}
