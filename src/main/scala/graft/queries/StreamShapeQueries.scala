package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.QueryDef.{r, rSql}
import graft.sources.Tables
import graft.streaming.Streams

/** Batch executions of the streaming window operators (SURVEY.md §2.C
  * row 14): the exact same graft.streaming.Streams transforms run here
  * over the batch events table so the DuckDB oracle can check their
  * semantics; true incremental execution (watermarks, state eviction,
  * dropDuplicatesWithinWatermark) is driven by the streaming test suite
  * over MemoryStream sources. */
object StreamShapeQueries {

  /** Tumbling 1-hour windows per event type via window(). */
  def windowTumbling(spark: SparkSession, dir: String): DataFrame =
    Streams.tumblingAgg(Tables.events(spark, dir), "ts", "1 hour", "event_type")
      .select(
        col("wstart").cast("timestamp_ntz").as("wstart"),
        col("wend").cast("timestamp_ntz").as("wend"),
        col("event_type"), col("n"), r(col("total_value"), 2).as("total_value"))
      .orderBy("wstart", "event_type")

  private val windowTumblingOracle: String =
    s"""SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS wstart,
       | CAST(date_trunc('hour', ts) + INTERVAL 1 HOUR AS TIMESTAMP) AS wend,
       | event_type, count(*) AS n, ${rSql("sum(value)", 2)} AS total_value
       |FROM events GROUP BY 1, 2, 3
       |ORDER BY wstart, event_type""".stripMargin

  /** Sliding 1-hour windows every 30 minutes: every event lands in two
    * overlapping windows. */
  def windowSliding(spark: SparkSession, dir: String): DataFrame =
    Streams.slidingAgg(Tables.events(spark, dir), "ts", "1 hour", "30 minutes")
      .select(col("wstart").cast("timestamp_ntz").as("wstart"),
        col("n"), r(col("total_value"), 2).as("total_value"))
      .orderBy("wstart")

  private val windowSlidingOracle: String =
    s"""SELECT wstart, count(*) AS n, ${rSql("sum(value)", 2)} AS total_value
       |FROM (
       | SELECT unnest([
       |   make_timestamp(CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT) * 1000000),
       |   make_timestamp(CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT) * 1000000)
       |     - INTERVAL 30 MINUTE]) AS wstart,
       |  value
       | FROM events)
       |GROUP BY wstart
       |ORDER BY wstart""".stripMargin

  /** 10-minute-gap session windows per user via session_window(); the
    * oracle is the classic gaps-and-islands rewrite. */
  def sessionWindows(spark: SparkSession, dir: String): DataFrame =
    Streams.sessionAgg(Tables.events(spark, dir), "ts", "10 minutes", "user_id")
      .select(col("user_id"),
        col("session_start").cast("timestamp_ntz").as("session_start"),
        col("n_events"))
      .orderBy("user_id", "session_start")

  private val sessionWindowsOracle: String =
    """WITH flagged AS (
      | SELECT user_id, ts,
      |  CASE WHEN lag(ts) OVER w IS NULL
      |        OR ts - lag(ts) OVER w >= INTERVAL 10 MINUTE
      |       THEN 1 ELSE 0 END AS new_session
      | FROM events
      | WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |numbered AS (
      | SELECT user_id, ts,
      |  sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      | FROM flagged)
      |SELECT user_id, CAST(min(ts) AS TIMESTAMP) AS session_start,
      | count(*) AS n_events
      |FROM numbered GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  /** Batch twin of Streams.intervalJoin (the impression/click shape):
    * 1%-sampled left events joined to all same-user events within the
    * following 12 hours (sized to the corpus's per-user event density —
    * 10 minutes finds zero pairs). The oracle canonicalizes DuckDB's nanosecond
    * timestamps to microseconds first, matching the engine's
    * nanos-div-1000 ingest rescue, so boundary comparisons agree. */
  def intervalJoinEvents(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val left = ev.filter(col("event_id") % 100 === 0)
    Streams.intervalJoin(left, ev, "user_id", "ts", "10 minutes",
      beforeMs = 0L, afterMs = 12 * 3600 * 1000L)
      .filter(col("event_id") =!= col("event_id_r"))
      .select(col("user_id"), col("event_id"), col("event_id_r"),
        (unix_micros(col("ts_r")) - unix_micros(col("ts"))).as("lag_us"))
      .orderBy("user_id", "event_id", "event_id_r")
  }

  private val intervalJoinOracle: String =
    """WITH e AS (
      | SELECT user_id, event_id, make_timestamp(epoch_us(ts)) AS ts FROM events)
      |SELECT l.user_id, l.event_id, r.event_id AS event_id_r,
      | epoch_us(r.ts) - epoch_us(l.ts) AS lag_us
      |FROM e l JOIN e r ON l.user_id = r.user_id
      |WHERE l.event_id % 100 = 0 AND r.event_id <> l.event_id
      | AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 12 HOUR
      |ORDER BY l.user_id, l.event_id, event_id_r""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("window_tumbling", windowTumbling, Some(windowTumblingOracle)),
    QueryDef("window_sliding", windowSliding, Some(windowSlidingOracle)),
    QueryDef("session_windows", sessionWindows, Some(sessionWindowsOracle)),
    QueryDef("interval_join_events", intervalJoinEvents, Some(intervalJoinOracle)))
}
