package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{ColumnRules, Report, SliverParams}
import graft.operators.Geo
import graft.queries.QueryDef.{r, rSql}
import graft.sources.Tables

/** Geospatial operator queries (SURVEY.md A13–A17, A48–A50). The corpus
  * ships no geometry table, so geometries are constructed as WKT from
  * customer columns — deterministically on BOTH sides, which makes the
  * JTS-backed bounds/census oracle-checkable against plain arithmetic.
  * Validity reasons come from CONSTANT planted geometries, so the JTS
  * reason strings are golden constants the oracle pins verbatim —
  * geo_validate and the reason census are fully oracle-checked. */
object GeoQueries {

  /** POINT(c_acctbal/1000, c_custkey % 90); every 10th customer gets a
    * 0.2-degree square POLYGON instead. */
  private def geomCustomers(spark: SparkSession, dir: String): DataFrame = {
    val x = col("c_acctbal") / 1000.0
    val y = (col("c_custkey") % 90).cast("double")
    val point = concat(lit("POINT ("), x, lit(" "), y, lit(")"))
    val square = concat(
      lit("POLYGON (("), x, lit(" "), y, lit(", "),
      x + 0.2, lit(" "), y, lit(", "),
      x + 0.2, lit(" "), y + 0.2, lit(", "),
      x, lit(" "), y + 0.2, lit(", "),
      x, lit(" "), y, lit("))"))
    Tables.customer(spark, dir)
      .withColumn("geometry", when(col("c_custkey") % 10 === 0, square).otherwise(point))
  }

  /** Dataset bounds through the JTS envelope aggregation, checked against
    * plain min/max arithmetic (petk/exploration.py:59 total_bounds). */
  def geoBounds(spark: SparkSession, dir: String): DataFrame =
    Geo.totalBounds(geomCustomers(spark, dir), "geometry")
      .select(r(col("minx"), 6).as("minx"), r(col("miny"), 6).as("miny"),
        r(col("maxx"), 6).as("maxx"), r(col("maxy"), 6).as("maxy"))

  private val geoBoundsOracle: String =
    s"""SELECT
       | ${rSql("min(c_acctbal / 1000.0)", 6)} AS minx,
       | ${rSql("min(CAST(c_custkey % 90 AS DOUBLE))", 6)} AS miny,
       | ${rSql("max(CASE WHEN c_custkey % 10 = 0 THEN c_acctbal / 1000.0 + 0.2 ELSE c_acctbal / 1000.0 END)", 6)} AS maxx,
       | ${rSql("max(CASE WHEN c_custkey % 10 = 0 THEN CAST(c_custkey % 90 AS DOUBLE) + 0.2 ELSE CAST(c_custkey % 90 AS DOUBLE) END)", 6)} AS maxy
       |FROM customer""".stripMargin

  /** Geometry-type census through JTS (petk/exploration.py:64-66), checked
    * against the modular construction rule. */
  def geoCensus(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.GeoFunctions.stGeometryType
    geomCustomers(spark, dir)
      .groupBy(stGeometryType(col("geometry")).as("gtype"))
      .agg(count(lit(1)).as("n"))
      .orderBy("gtype")
  }

  private val geoCensusOracle: String =
    """SELECT 'Point' AS gtype, count(*) AS n FROM customer WHERE c_custkey % 10 <> 0
      |UNION ALL
      |SELECT 'Polygon', count(*) FROM customer WHERE c_custkey % 10 = 0
      |ORDER BY gtype""".stripMargin

  /** Validity audit with planted self-intersecting bowties (every 25th
    * customer). The planted bowtie is one CONSTANT geometry, so its JTS
    * validity reason is one constant string — pinned in the oracle as a
    * golden value (and unit-pinned in GeoSpec), which makes the full
    * (column, index, function, notes) row oracle-checkable. */
  def geoValidate(spark: SparkSession, dir: String): DataFrame = {
    val bowtie = "POLYGON ((0 0, 2 2, 0 2, 2 0, 0 0))"
    val df = geomCustomers(spark, dir)
      .withColumn("geometry",
        when(col("c_custkey") % 25 === 0, lit(bowtie)).otherwise(col("geometry")))
    Report(df, schema = Map("geometry" -> ColumnRules()), key = Some("c_custkey"))
      .validate()
  }

  private val geoValidateOracle: String =
    """SELECT 'geometry' AS "column", c_custkey AS "index",
      | 'geospatial' AS "function",
      | 'Self-intersection at or near point (1.0, 1.0, NaN)' AS notes
      |FROM customer WHERE c_custkey % 25 = 0
      |ORDER BY "index"""".stripMargin

  /** Reason-string census over a planted mix of invalidity classes —
    * the A48 reason-path coverage a no-geometry corpus can't give for
    * free: a self-intersecting bowtie, a hole-outside-shell polygon, a
    * null geometry and a multipolygon with overlapping components, each
    * a CONSTANT whose JTS explanation is a constant string, so the
    * (reason, count) census is exact arithmetic on c_custkey mod 25. */
  def geoValidityCensus(spark: SparkSession, dir: String): DataFrame = {
    val bowtie = "POLYGON ((0 0, 2 2, 0 2, 2 0, 0 0))"
    val holeOut = "POLYGON ((0 0, 3 0, 3 3, 0 3, 0 0), (4 4, 5 4, 5 5, 4 5, 4 4))"
    val overlap = "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), " +
      "((0.5 0.5, 2 0.5, 2 2, 0.5 2, 0.5 0.5)))"
    val m = col("c_custkey") % 25
    val df = geomCustomers(spark, dir)
      .withColumn("geometry",
        when(m === 0, lit(bowtie))
          .when(m === 7, lit(holeOut))
          .when(m === 13, lit(null).cast("string"))
          .when(m === 19, lit(overlap))
          .otherwise(col("geometry")))
    Report(df, schema = Map("geometry" -> ColumnRules()), key = Some("c_custkey"))
      .validate()
      .groupBy("function", "notes")
      .agg(count(lit(1)).as("n"))
      .orderBy("notes")
  }

  private val geoValidityCensusOracle: String =
    """WITH m AS (SELECT c_custkey % 25 AS k FROM customer)
      |SELECT 'geospatial' AS "function", notes, n FROM (
      | SELECT 'Self-intersection at or near point (1.0, 1.0, NaN)' AS notes,
      |   count(*) AS n FROM m WHERE k = 0
      | UNION ALL
      | SELECT 'Hole lies outside shell at or near point (4.0, 4.0, NaN)',
      |   count(*) FROM m WHERE k = 7
      | UNION ALL
      | SELECT 'Null geometry', count(*) FROM m WHERE k = 13
      | UNION ALL
      | SELECT 'Self-intersection at or near point (1.0, 0.5, NaN)',
      |   count(*) FROM m WHERE k = 19
      |)
      |ORDER BY notes""".stripMargin

  /** Notes-free projection of [[geoValidate]]: the planted-bowtie
    * population (c_custkey % 25 = 0) is pure arithmetic, so the
    * (column, index, function) triple is oracle-checkable — the JTS
    * validity REASONS stay in the rows-only variant above. */
  def geoValidateKeys(spark: SparkSession, dir: String): DataFrame =
    geoValidate(spark, dir).select("column", "index", "function")

  private val geoValidateKeysOracle: String =
    """SELECT 'geometry' AS "column", c_custkey AS "index",
      | 'geospatial' AS "function"
      |FROM customer WHERE c_custkey % 25 = 0
      |ORDER BY "index"""".stripMargin

  /** Sliver detection under a TRUE Web Mercator (EPSG:3857) reprojection:
    * every 4th customer's square shrinks to 0.002 degrees; its projected
    * area ranges from ~5.0e4 m2 (y=0) to ~2.9e6 m2 (y=89, where the
    * ln-tan stretching inflates the north-south span by 1/cos(89) ~ 57x),
    * while the 0.5-degree squares measure at least ~3.1e9 m2 (y=0) — the
    * 1e8 threshold splits the two planted populations with >30x margin on
    * both sides at every latitude in range. The planted population (% 4)
    * and the per-geometry sliver count (always 1 — single-part polygons)
    * are therefore pure arithmetic, giving the JTS+projection pipeline an
    * exact DuckDB oracle. */
  def geoSliver(spark: SparkSession, dir: String): DataFrame = {
    val x = col("c_acctbal") / 1000.0
    val y = (col("c_custkey") % 90).cast("double")
    def square(side: Double) = concat(
      lit("POLYGON (("), x, lit(" "), y, lit(", "),
      x + side, lit(" "), y, lit(", "),
      x + side, lit(" "), y + side, lit(", "),
      x, lit(" "), y + side, lit(", "),
      x, lit(" "), y, lit("))"))
    val df = Tables.customer(spark, dir)
      .withColumn("geometry",
        when(col("c_custkey") % 4 === 0, square(0.002)).otherwise(square(0.5)))
    Report(df,
      schema = Map("geometry" -> ColumnRules(
        sliver = Some(SliverParams(projectedEpsg = 3857, threshold = 1e8)))),
      key = Some("c_custkey"))
      .validate()
      .filter(col("function") === "sliver") // drop the implicit validity audit
  }

  private val geoSliverOracle: String =
    """SELECT 'geometry' AS "column", c_custkey AS "index",
      | 'sliver' AS "function",
      | '1 slivers found within geometry' AS notes
      |FROM customer WHERE c_custkey % 4 = 0
      |ORDER BY "index"""".stripMargin

  /** bounding_box rule under the `.cx` envelope-intersection semantics:
    * points sit outside bbox(0, 10, 0, 90) exactly when c_acctbal < 0
    * (x = acctbal/1000 ∈ [-1, 10); y ∈ [0, 89] is always inside), squares
    * when their right edge x+0.2 < 0 i.e. acctbal < -200 — both pure
    * arithmetic, so the JTS envelope pipeline gets an exact oracle. */
  def geoBbox(spark: SparkSession, dir: String): DataFrame =
    Report(geomCustomers(spark, dir),
      schema = Map("geometry" -> ColumnRules(
        boundingBox = Some((0.0, 10.0, 0.0, 90.0)))),
      key = Some("c_custkey"))
      .validate()
      .filter(col("function") === "bounding_box")

  private val geoBboxOracle: String =
    """SELECT 'geometry' AS "column", c_custkey AS "index",
      | 'bounding_box' AS "function",
      | 'Geometry outside of bbox(0.0, 10.0, 0.0, 90.0)' AS notes
      |FROM customer
      |WHERE (c_custkey % 10 <> 0 AND c_acctbal < 0)
      |   OR (c_custkey % 10 = 0 AND c_acctbal < -200)
      |ORDER BY "index"""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("geo_bounds", geoBounds, Some(geoBoundsOracle)),
    QueryDef("geo_bbox", geoBbox, Some(geoBboxOracle)),
    QueryDef("geo_census", geoCensus, Some(geoCensusOracle)),
    QueryDef("geo_validate", geoValidate, Some(geoValidateOracle)),
    QueryDef("geo_validate_keys", geoValidateKeys, Some(geoValidateKeysOracle)),
    QueryDef("geo_validity_census", geoValidityCensus, Some(geoValidityCensusOracle)),
    QueryDef("geo_sliver", geoSliver, Some(geoSliverOracle)))
}
