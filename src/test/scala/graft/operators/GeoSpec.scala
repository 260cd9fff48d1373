package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.SliverParams
import graft.functions.GeoFunctions._

class GeoSpec extends SparkSpec {

  private def wkts(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("id", "geometry")
  }

  test("validity: bowtie polygon invalid with a self-intersection reason; point valid") {
    val df = wkts(
      (1L, "POLYGON ((0 0, 2 2, 0 2, 2 0, 0 0))"),
      (2L, "POINT (1 1)"))
    val out = df.select(col("id"), stIsValid(col("geometry")).as("v"),
      stIsValidReason(col("geometry")).as("r")).orderBy("id").collect()
    assert(out(0).getBoolean(1) === false)
    assert(out(0).getString(2).toLowerCase.contains("self-intersection"))
    assert(out(1).getBoolean(1) === true)
  }

  test("geospatial rule flags invalid + null geometries with reference messages") {
    val df = wkts((1L, "POLYGON ((0 0, 2 2, 0 2, 2 0, 0 0))"), (2L, null), (3L, "POINT (0 0)"))
    val out = Geo.geospatial(df, "id", "geometry").orderBy("index").collect()
    assert(out.length === 2)
    assert(out(0).getLong(1) === 1L)
    assert(out(1).getLong(1) === 2L)
    assert(out(1).getString(3) === "Null geometry") // petk/validation.py:34
  }

  test("introduce reads crs from column metadata, falling back to the parameter") {
    val df = wkts((1L, "POINT (1 2)"))
    def crsRow(d: org.apache.spark.sql.DataFrame) =
      Geo.introduceGeo(d, "geometry", crs = "epsg:4326")
        .filter(col("metric") === "crs").head().getString(2)
    // unstamped: the parameter
    assert(crsRow(df) === "epsg:4326")
    // stamped: metadata wins (the reference reads df.crs, exploration.py:57)
    val stamped = graft.core.SemanticType.asGeometry(df, "geometry", Some("epsg:2952"))
    assert(graft.core.SemanticType.crsOf(stamped, "geometry") === Some("epsg:2952"))
    assert(crsRow(stamped) === "epsg:2952")
    // the stamp also classifies the column GEOMETRY
    assert(graft.core.SemanticType.ofField(stamped.schema("geometry")) ===
      graft.core.SemanticType.Geometry)
  }

  test("envelope/bounds math matches the coordinates") {
    val df = wkts((1L, "POINT (3 4)"), (2L, "POLYGON ((0 1, 2 1, 2 5, 0 5, 0 1))"))
    val b = Geo.totalBounds(df, "geometry").head()
    assert((b.getDouble(0), b.getDouble(1), b.getDouble(2), b.getDouble(3)) === ((0.0, 1.0, 3.0, 5.0)))
  }

  test("bounding_box rule uses envelope-intersection (.cx) semantics, not containment") {
    val df = wkts(
      (1L, "POINT (5 5)"), // inside
      (2L, "POINT (20 20)"), // outside
      (3L, "POLYGON ((9 9, 11 9, 11 11, 9 11, 9 9))")) // straddles the edge -> intersects
    val out = Geo.boundingBox(df, "id", "geometry", (0.0, 10.0, 0.0, 10.0)).collect()
    assert(out.map(_.getLong(1)).toSeq === Seq(2L))
    assert(out.head.getString(3) === "Geometry outside of bbox(0.0, 10.0, 0.0, 10.0)")
  }

  test("bounding_box rejects an invalid box") {
    val df = wkts((1L, "POINT (0 0)"))
    val e = intercept[IllegalArgumentException](
      Geo.boundingBox(df, "id", "geometry", (10.0, 0.0, 0.0, 10.0)))
    assert(e.getMessage.contains("Invalid bounding box"))
  }

  test("sliver rule explodes multi-part geometries and counts slivers per row") {
    // two tiny squares + one big square in a multipolygon at the equator
    val tiny = "((0 0, 0.001 0, 0.001 0.001, 0 0.001, 0 0))"
    val tiny2 = "((1 0, 1.001 0, 1.001 0.001, 1 0.001, 1 0))"
    val big = "((0 10, 1 10, 1 11, 0 11, 0 10))"
    val df = wkts(
      (1L, s"MULTIPOLYGON ($tiny, $tiny2, $big)"),
      (2L, s"MULTIPOLYGON ($big)"))
    val out = Geo.sliver(df, "id", "geometry", SliverParams(3857, 1e6)).collect()
    assert(out.length === 1)
    assert(out.head.getLong(1) === 1L)
    assert(out.head.getString(3) === "2 slivers found within geometry")
  }

  test("points are never slivers (tools.py:117-118)") {
    val df = wkts((1L, "POINT (0 0)"))
    assert(Geo.sliver(df, "id", "geometry", SliverParams(3857, 1e12)).count() === 0)
  }

  test("geo introduce section: census pluralizes lowercase type names") {
    val df = wkts((1L, "POINT (1 2)"), (2L, "POINT (3 4)"),
      (3L, "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"))
    val rows = Geo.introduceGeo(df, "geometry").collect()
      .map(r => (r.getString(1), r.getString(2))).toMap
    assert(rows("points") === "2")
    assert(rows("polygons") === "1")
    assert(rows("crs") === "epsg:4326")
    assert(rows("3d_shapes") === "0")
    assert(rows("bounds") === "[0.0, 0.0, 3.0, 4.0]")
  }
}
