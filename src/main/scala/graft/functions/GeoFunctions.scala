package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

import org.locationtech.jts.geom.Geometry
import org.locationtech.jts.io.WKTReader
import org.locationtech.jts.operation.valid.IsValidOp

/** Geometry expressions over WKT string columns, backed by JTS (the only
  * geometry library on the Spark classpath — SURVEY.md §1.4). Spark
  * 4.1's native GeometryType has no usable ST expression surface yet, so
  * columns are WKT strings (mark them with SemanticType.GeometryKey
  * metadata) and these scalar UDFs provide the operator surface the
  * reference uses (petk/tools.py:72-118, petk/validation.py:11-60).
  *
  * Scalar UDFs are executor-local and shuffle-free; they are not
  * codegen'd, which is acceptable off the hot path (profiling/validation
  * of geometry columns) — a custom Catalyst Expression is the upgrade
  * path if geometry ever dominates a benchmark (SURVEY.md §4.2).
  */
object GeoFunctions {

  // WKTReader is not thread-safe; one per executor thread.
  private val readers: ThreadLocal[WKTReader] =
    ThreadLocal.withInitial(() => new WKTReader())

  private def parse(wkt: String): Geometry = readers.get().read(wkt)

  private def g1[T](f: Geometry => T): String => Option[T] =
    (wkt: String) =>
      if (wkt == null) None
      else try Some(f(parse(wkt))) catch { case _: Exception => None }

  val stIsValid: UserDefinedFunction = udf((wkt: String) => g1(_.isValid)(wkt))

  /** JTS explanation of invalidity (petk/validation.py:31-34 uses
    * shapely's explain_validity, which wraps the same JTS logic). */
  val stIsValidReason: UserDefinedFunction = udf((wkt: String) =>
    g1 { g =>
      val err = new IsValidOp(g).getValidationError
      if (err == null) "Valid Geometry" else err.toString
    }(wkt))

  val stArea: UserDefinedFunction = udf((wkt: String) => g1(_.getArea)(wkt))
  val stLength: UserDefinedFunction = udf((wkt: String) => g1(_.getLength)(wkt))
  val stGeometryType: UserDefinedFunction = udf((wkt: String) => g1(_.getGeometryType)(wkt))
  val stNumGeometries: UserDefinedFunction = udf((wkt: String) => g1(_.getNumGeometries)(wkt))

  val stCentroidX: UserDefinedFunction = udf((wkt: String) => g1(_.getCentroid.getX)(wkt))
  val stCentroidY: UserDefinedFunction = udf((wkt: String) => g1(_.getCentroid.getY)(wkt))

  /** Envelope [minx, miny, maxx, maxy]. */
  val stEnvelope: UserDefinedFunction = udf((wkt: String) =>
    g1 { g =>
      val e = g.getEnvelopeInternal
      Seq(e.getMinX, e.getMinY, e.getMaxX, e.getMaxY)
    }(wkt))

  /** Z-dimension presence (petk/exploration.py:53 `has_z`). */
  val stHasZ: UserDefinedFunction = udf((wkt: String) =>
    g1(g => !java.lang.Double.isNaN(g.getCoordinate.getZ))(wkt))

  /** One-pass per-row geometry profile — everything `introduceGeo` needs
    * from a single WKT parse (the naive per-metric UDFs parse the same
    * string 4–5 times per row; at 100 TB the parse IS the cost). Fields
    * are Options so one degenerate aspect (e.g. an EMPTY geometry's
    * centroid) nulls that field alone, preserving the per-metric UDFs'
    * independent-failure semantics. */
  case class GeoProfile(cx: Option[Double], cy: Option[Double],
      minx: Option[Double], miny: Option[Double],
      maxx: Option[Double], maxy: Option[Double],
      has_z: Option[Boolean], gtype: String)

  private def opt[T](f: => T): Option[T] =
    try Option(f) catch { case _: Exception => None }

  val stProfile: UserDefinedFunction = udf((wkt: String) =>
    if (wkt == null) None
    else try {
      val g = parse(wkt)
      val env = if (g.isEmpty) None else Some(g.getEnvelopeInternal)
      val cen = opt(g.getCentroid)
      Some(GeoProfile(
        cen.flatMap(c => opt(c.getX)), cen.flatMap(c => opt(c.getY)),
        env.map(_.getMinX), env.map(_.getMinY),
        env.map(_.getMaxX), env.map(_.getMaxY),
        opt(!java.lang.Double.isNaN(g.getCoordinate.getZ)),
        g.getGeometryType))
    } catch { case _: Exception => None })

  /** One-pass validity check: null when the input WKT is null, otherwise
    * (valid, reason) from a single parse — `reason` is the JTS validation
    * error for invalid geometries, "Valid Geometry" for valid ones, and
    * null when the WKT does not parse (matching the independent
    * stIsValid/stIsValidReason pair the validation rule used to call,
    * which each returned null on a parse failure). */
  case class GeoValidity(valid: Option[Boolean], reason: Option[String])

  val stValidity: UserDefinedFunction = udf((wkt: String) =>
    if (wkt == null) None
    else try {
      val g = parse(wkt)
      val err = new IsValidOp(g).getValidationError
      Some(GeoValidity(Some(err == null),
        Some(if (err == null) "Valid Geometry" else err.toString)))
    } catch { case _: Exception => Some(GeoValidity(None, None)) })

  /** Multi-part explode (petk/validation.py:54 `.explode()`): component
    * WKTs of a (multi-)geometry. */
  val stDump: UserDefinedFunction = udf((wkt: String) =>
    if (wkt == null) Seq.empty[String]
    else try {
      val g = parse(wkt)
      (0 until g.getNumGeometries).map(i => g.getGeometryN(i).toText)
    } catch { case _: Exception => Seq.empty[String] })

  /** Envelope-vs-box intersection decided inside ONE UDF eval — the
    * bbox rule's hot path. The tempting compositional forms both pay
    * FOUR WKT parses per row: referencing [[stEnvelope]] once per box
    * edge in a filter duplicates the UDF verbatim, and materializing
    * the envelope in a project first does not survive the optimizer —
    * PushDownPredicates substitutes a deterministic projection back
    * into the pushed filter condition, one copy per reference. Measured
    * at sf≈100 (15M rows): 20.4 s for either 4-parse form vs 8.9 s for
    * a true single parse (BASELINE.md round 14). Null/unparseable WKT
    * returns null, so negated filters drop the row — identical to the
    * old element_at-on-null-envelope behavior. */
  val stEnvelopeIntersectsBox: UserDefinedFunction =
    udf((wkt: String, xmin: Double, xmax: Double, ymin: Double, ymax: Double) =>
      g1 { g =>
        val e = g.getEnvelopeInternal
        !(e.getMaxX < xmin || e.getMinX > xmax ||
          e.getMaxY < ymin || e.getMinY > ymax)
      }(wkt))

  /** Does the geometry's envelope intersect the box? — matches geopandas'
    * `.cx[minx:maxx, miny:maxy]` coordinate-slice semantics
    * (petk/validation.py:16: bbox-intersection, not containment). */
  def envelopeIntersects(wkt: Column,
      xmin: Double, xmax: Double, ymin: Double, ymax: Double): Column =
    stEnvelopeIntersectsBox(wkt, lit(xmin), lit(xmax), lit(ymin), lit(ymax))

  /** Reproject a copy of the geometry vertex-by-vertex. */
  private def reproject(g: Geometry, fwd: Projections.Forward): Geometry = {
    val c = g.copy()
    c.apply(new org.locationtech.jts.geom.CoordinateSequenceFilter {
      def filter(seq: org.locationtech.jts.geom.CoordinateSequence, i: Int): Unit = {
        val (x, y) = fwd(seq.getX(i), seq.getY(i))
        seq.setOrdinate(i, 0, x); seq.setOrdinate(i, 1, y)
      }
      def isDone: Boolean = false
      def isGeometryChanged: Boolean = true
    })
    c.geometryChanged()
    c
  }

  private def equirectAreaScale(g: Geometry): Double = {
    val latRad = math.toRadians(g.getCentroid.getY)
    111320.0 * 111320.0 * math.cos(latRad)
  }

  private def equirectLengthScale(g: Geometry): Double = {
    val latRad = math.toRadians(g.getCentroid.getY)
    111320.0 * math.sqrt(math.cos(latRad) max 0.0)
  }

  private def metricArea(g: Geometry, epsg: Int): Double =
    Projections.forEpsg(epsg) match {
      case Some(fwd) => reproject(g, fwd).getArea
      case None => g.getArea * equirectAreaScale(g)
    }

  private def metricLength(g: Geometry, epsg: Int): Double =
    Projections.forEpsg(epsg) match {
      case Some(fwd) => reproject(g, fwd).getLength
      case None => g.getLength * equirectLengthScale(g)
    }

  /** Metric area after reprojecting lon/lat to the given EPSG — the
    * reference's `to_crs(epsg).area` step (petk/validation.py:54). The
    * common projected families (Web Mercator, UTM WGS84/NAD83, MTM
    * NAD83(CSRS)) are vendored forward projections
    * (graft.functions.Projections); an unknown code falls back to the
    * equirectangular local approximation documented in SURVEY.md §7.8. */
  val stAreaIn: UserDefinedFunction = udf((wkt: String, epsg: Int) =>
    g1(metricArea(_, epsg))(wkt))

  /** Metric length, same projection dispatch as [[stAreaIn]]. */
  val stLengthIn: UserDefinedFunction = udf((wkt: String, epsg: Int) =>
    g1(metricLength(_, epsg))(wkt))

  /** Per-part sliver metrics from ONE WKT parse: for each top-level
    * component of the (multi-)geometry, its metric area (polygon
    * parts), metric length (linestring parts) or NaN (points — never
    * slivers, petk/tools.py:117-118; NaN compares false against any
    * threshold under Spark's NaN-is-largest ordering). Fuses the sliver
    * rule's old parse → dump → re-serialize → re-parse-per-part chain
    * (type probe + conditional metric = 3-4 JTS parses per part) into
    * one parse per row, operating on the SAME in-memory parts the dump
    * would have re-serialized — the round-14 geo sweep measured the
    * rule 3.9× faster at sf≈100 (23.3 → 5.9 s) for exactly this
    * eval-count reason (BASELINE.md). Unparseable/null WKT yields no
    * parts, matching stDump's empty-seq behavior. */
  val stSliverMetrics: UserDefinedFunction = udf((wkt: String, epsg: Int) =>
    if (wkt == null) Seq.empty[Double]
    else try {
      val g = parse(wkt)
      (0 until g.getNumGeometries).map { i =>
        val p = g.getGeometryN(i)
        val t = p.getGeometryType.toLowerCase
        if (t.contains("polygon")) metricArea(p, epsg)
        else if (t.contains("linestring")) metricLength(p, epsg)
        else Double.NaN
      }
    } catch { case _: Exception => Seq.empty[Double] })

  /** Equirectangular-only variants (no CRS known). */
  val stAreaMetric: UserDefinedFunction = udf((wkt: String) =>
    g1(g => g.getArea * equirectAreaScale(g))(wkt))

  val stLengthMetric: UserDefinedFunction = udf((wkt: String) =>
    g1(g => g.getLength * equirectLengthScale(g))(wkt))
}
