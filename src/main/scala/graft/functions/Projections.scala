package graft.functions

/** Minimal forward map projections for the sliver metric's `to_crs` step
  * (reference petk/validation.py:54 reprojects with geopandas/pyproj; no
  * proj library ships on this classpath, so the common projected CRS
  * families are vendored from the published formulas).
  *
  * Supported:
  *  - EPSG:3857 spherical Web Mercator (the de-facto web default)
  *  - EPSG:326xx / 327xx UTM on WGS84 (north / south)
  *  - EPSG:26901-26923 UTM on NAD83 (GRS80)
  *  - EPSG:2945-2952 MTM NAD83(CSRS) zones 3-10 (3-degree zones used by
  *    Ontario/Quebec open data, incl. Toronto's zone 10)
  *
  * The Transverse Mercator forward is Snyder's series (USGS Professional
  * Paper 1395, eq. 8-9..8-15 / 3-21) — the same truncation pyproj uses
  * for these zones' accuracy class (sub-mm inside a zone). Anything else
  * falls back to the equirectangular local approximation (documented in
  * GeoFunctions).
  */
object Projections {

  /** Forward projection: (lonDeg, latDeg) -> (x metres, y metres). */
  type Forward = (Double, Double) => (Double, Double)

  private val WebMercatorR = 6378137.0

  /** Spherical Web Mercator (EPSG:3857). Defined for |lat| < 90 — like
    * pyproj, no clamping to the tiling cutoff (~85.05): y grows without
    * bound toward the poles, which is the projection's real behavior. */
  val webMercator: Forward = (lonDeg, latDeg) => {
    val x = WebMercatorR * math.toRadians(lonDeg)
    val y = WebMercatorR * math.log(math.tan(math.Pi / 4 + math.toRadians(latDeg) / 2))
    (x, y)
  }

  /** Ellipsoidal Transverse Mercator forward (Snyder series). */
  def transverseMercator(
      lon0Deg: Double, k0: Double, falseEasting: Double, falseNorthing: Double,
      a: Double, invF: Double): Forward = {
    val f = 1.0 / invF
    val e2 = f * (2 - f)
    val e4 = e2 * e2
    val e6 = e4 * e2
    val ep2 = e2 / (1 - e2)
    // meridian arc coefficients (Snyder 3-21)
    val m0 = 1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256
    val m2 = 3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024
    val m4 = 15 * e4 / 256 + 45 * e6 / 1024
    val m6 = 35 * e6 / 3072
    (lonDeg, latDeg) => {
      val phi = math.toRadians(latDeg)
      val dLam = math.toRadians(lonDeg - lon0Deg)
      val sinP = math.sin(phi)
      val cosP = math.cos(phi)
      val tanP = math.tan(phi)
      val n = a / math.sqrt(1 - e2 * sinP * sinP)
      val t = tanP * tanP
      val c = ep2 * cosP * cosP
      val bigA = dLam * cosP
      val a2 = bigA * bigA
      val m = a * (m0 * phi - m2 * math.sin(2 * phi) +
        m4 * math.sin(4 * phi) - m6 * math.sin(6 * phi))
      val x = falseEasting + k0 * n * (bigA +
        (1 - t + c) * a2 * bigA / 6 +
        (5 - 18 * t + t * t + 72 * c - 58 * ep2) * a2 * a2 * bigA / 120)
      val y = falseNorthing + k0 * (m + n * tanP * (a2 / 2 +
        (5 - t + 9 * c + 4 * c * c) * a2 * a2 / 24 +
        (61 - 58 * t + t * t + 600 * c - 330 * ep2) * a2 * a2 * a2 / 720))
      (x, y)
    }
  }

  private val Wgs84 = (6378137.0, 298.257223563)
  private val Grs80 = (6378137.0, 298.257222101)

  /** The forward projection for an EPSG code, when vendored. */
  def forEpsg(epsg: Int): Option[Forward] = epsg match {
    case 3857 => Some(webMercator)
    case z if z >= 32601 && z <= 32660 => // UTM north, WGS84
      Some(transverseMercator(-183.0 + 6.0 * (z - 32600), 0.9996, 500000, 0,
        Wgs84._1, Wgs84._2))
    case z if z >= 32701 && z <= 32760 => // UTM south, WGS84
      Some(transverseMercator(-183.0 + 6.0 * (z - 32700), 0.9996, 500000, 10000000,
        Wgs84._1, Wgs84._2))
    case z if z >= 26901 && z <= 26923 => // UTM north, NAD83
      Some(transverseMercator(-183.0 + 6.0 * (z - 26900), 0.9996, 500000, 0,
        Grs80._1, Grs80._2))
    case z if z >= 2945 && z <= 2952 => // MTM NAD83(CSRS) zones 3-10
      // zone 3 central meridian 58.5W, stepping 3 degrees west per zone
      Some(transverseMercator(-58.5 - 3.0 * (z - 2945), 0.9999, 304800, 0,
        Grs80._1, Grs80._2))
    case _ => None
  }
}
