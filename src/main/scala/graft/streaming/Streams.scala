package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
