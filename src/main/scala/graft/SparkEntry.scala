package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{GeoQueries, LlmQueries, ProfilingQueries, QueryDef, RelationalQueries, SketchQueries, StreamShapeQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is exposed as a named query
  * over /root/testdata parquet plus (when SQL-expressible) a DuckDB oracle
  * equivalent; the driver hash-compares the two (BASELINE.md t2 gate).
  */
object SparkEntry {

  private def registry: Seq[QueryDef] =
    ProfilingQueries.all ++ RelationalQueries.all ++ LlmQueries.all ++
      StreamShapeQueries.all ++ GeoQueries.all ++ SketchQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Since round 11 the customer dimension inside rides
    * [[graft.operators.SizeGuard.broadcastIfSmall]]: at smoke scale the
    * plan is the same broadcast star join (rows > 0 unchanged); past
    * `graft.broadcast.maxRows` it becomes a shuffled equi-join. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.joinBroadcastRevenue(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
