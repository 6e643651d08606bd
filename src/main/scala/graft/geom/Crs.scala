package graft.geom

import org.locationtech.jts.geom.{CoordinateFilter, Geometry}

/**
 * Closed-form CRS reprojection (SURVEY.md §2.5 catalog breadth; the
 * reference registers Sedona's ST_Transform for the same job). Supported:
 *
 *  - EPSG:4326 (WGS84 lon/lat degrees)
 *  - EPSG:3857 (WGS84 web/spherical mercator, meters)
 *  - EPSG:326zz / 327zz (WGS84 UTM zone zz north / south, meters)
 *
 * All conversions hub through 4326. Web mercator is the exact spherical
 * form (R=6378137); UTM is the standard Snyder transverse-mercator series
 * on the WGS84 ellipsoid (k0=0.9996), accurate to well under a millimeter
 * inside a zone — the same formulas every public GIS implements, written
 * from the published equations (Snyder, "Map Projections: A Working
 * Manual", USGS PP 1395, eqs 8-9..8-25).
 *
 * Degree→radian conversion is written `deg * (π/180)` (not Java's
 * `toRadians`, which computes `deg/180*π`) so the arithmetic matches SQL
 * engines' `radians()` bit-for-bit where possible.
 */
object Crs {

  private val R = 6378137.0 // WGS84 semi-major axis (also web-mercator sphere)
  private val Deg2Rad = math.Pi / 180.0
  private val Rad2Deg = 180.0 / math.Pi

  // WGS84 ellipsoid
  private val F = 1.0 / 298.257223563
  private val E2 = F * (2.0 - F)
  private val Ep2 = E2 / (1.0 - E2)
  private val K0 = 0.9996

  sealed trait Code { def epsg: Int }
  case object Wgs84 extends Code { val epsg = 4326 }
  case object WebMercator extends Code { val epsg = 3857 }
  final case class Utm(zone: Int, north: Boolean) extends Code {
    require(zone >= 1 && zone <= 60, s"UTM zone $zone out of range 1..60")
    def epsg: Int = (if (north) 32600 else 32700) + zone
    def lon0: Double = ((zone - 1) * 6 - 180 + 3) * Deg2Rad
  }

  def parse(crs: String): Code = {
    val code = crs.trim.toUpperCase match {
      case s if s.startsWith("EPSG:") => s.substring(5).toInt
      case s => s.toInt
    }
    code match {
      case 4326 => Wgs84
      case 3857 | 900913 => WebMercator
      case z if z >= 32601 && z <= 32660 => Utm(z - 32600, north = true)
      case z if z >= 32701 && z <= 32760 => Utm(z - 32700, north = false)
      case other => throw new IllegalArgumentException(
        s"unsupported CRS EPSG:$other (supported: 4326, 3857, 326zz/327zz UTM)")
    }
  }

  /** (x, y) in `code` -> (lon, lat) degrees. */
  def toWgs(code: Code, x: Double, y: Double): (Double, Double) = code match {
    case Wgs84 => (x, y)
    case WebMercator =>
      (x / R * Rad2Deg, (2.0 * math.atan(math.exp(y / R)) - math.Pi / 2.0) * Rad2Deg)
    case u: Utm => utmInverse(u, x, y)
  }

  /** (lon, lat) degrees -> (x, y) in `code`. */
  def fromWgs(code: Code, lon: Double, lat: Double): (Double, Double) = code match {
    case Wgs84 => (lon, lat)
    case WebMercator =>
      (R * (lon * Deg2Rad), R * math.log(math.tan(math.Pi / 4.0 + (lat * Deg2Rad) / 2.0)))
    case u: Utm => utmForward(u, lon, lat)
  }

  /** Reproject a copy of `g` from `src` to `dst`; output SRID = dst EPSG. */
  def transform(g: Geometry, src: Code, dst: Code): Geometry = {
    if (src == dst) return g
    val out = g.copy()
    out.apply(new CoordinateFilter {
      override def filter(c: org.locationtech.jts.geom.Coordinate): Unit = {
        val (lon, lat) = toWgs(src, c.x, c.y)
        val (x, y) = fromWgs(dst, lon, lat)
        c.x = x; c.y = y
      }
    })
    out.geometryChanged()
    out.setSRID(dst.epsg)
    out
  }

  // -------------------------------------------------------------------------
  // UTM transverse mercator (Snyder series, WGS84)
  // -------------------------------------------------------------------------

  /** Meridional arc length from the equator (Snyder eq 3-21). */
  private def arc(phi: Double): Double =
    R * ((1 - E2 / 4 - 3 * E2 * E2 / 64 - 5 * E2 * E2 * E2 / 256) * phi
      - (3 * E2 / 8 + 3 * E2 * E2 / 32 + 45 * E2 * E2 * E2 / 1024) * math.sin(2 * phi)
      + (15 * E2 * E2 / 256 + 45 * E2 * E2 * E2 / 1024) * math.sin(4 * phi)
      - (35 * E2 * E2 * E2 / 3072) * math.sin(6 * phi))

  private def utmForward(u: Utm, lonDeg: Double, latDeg: Double): (Double, Double) = {
    val phi = latDeg * Deg2Rad
    val lam = lonDeg * Deg2Rad
    val sinP = math.sin(phi); val cosP = math.cos(phi); val tanP = math.tan(phi)
    val n = R / math.sqrt(1 - E2 * sinP * sinP)
    val t = tanP * tanP
    val c = Ep2 * cosP * cosP
    val a = (lam - u.lon0) * cosP
    val a2 = a * a; val a3 = a2 * a; val a4 = a3 * a; val a5 = a4 * a; val a6 = a5 * a
    val x = K0 * n * (a + (1 - t + c) * a3 / 6
      + (5 - 18 * t + t * t + 72 * c - 58 * Ep2) * a5 / 120) + 500000.0
    val y0 = K0 * (arc(phi) + n * tanP * (a2 / 2
      + (5 - t + 9 * c + 4 * c * c) * a4 / 24
      + (61 - 58 * t + t * t + 600 * c - 330 * Ep2) * a6 / 720))
    (x, if (u.north) y0 else y0 + 10000000.0)
  }

  private def utmInverse(u: Utm, easting: Double, northing: Double): (Double, Double) = {
    val x = easting - 500000.0
    val y = if (u.north) northing else northing - 10000000.0
    val m = y / K0
    val mu = m / (R * (1 - E2 / 4 - 3 * E2 * E2 / 64 - 5 * E2 * E2 * E2 / 256))
    val e1 = (1 - math.sqrt(1 - E2)) / (1 + math.sqrt(1 - E2))
    // footpoint latitude (Snyder eq 3-26)
    val phi1 = mu + (3 * e1 / 2 - 27 * e1 * e1 * e1 / 32) * math.sin(2 * mu) +
      (21 * e1 * e1 / 16 - 55 * math.pow(e1, 4) / 32) * math.sin(4 * mu) +
      (151 * e1 * e1 * e1 / 96) * math.sin(6 * mu) +
      (1097 * math.pow(e1, 4) / 512) * math.sin(8 * mu)
    val sinP = math.sin(phi1); val cosP = math.cos(phi1); val tanP = math.tan(phi1)
    val c1 = Ep2 * cosP * cosP
    val t1 = tanP * tanP
    val n1 = R / math.sqrt(1 - E2 * sinP * sinP)
    val r1 = R * (1 - E2) / math.pow(1 - E2 * sinP * sinP, 1.5)
    val d = x / (n1 * K0)
    val d2 = d * d; val d3 = d2 * d; val d4 = d3 * d; val d5 = d4 * d; val d6 = d5 * d
    val phi = phi1 - (n1 * tanP / r1) * (d2 / 2
      - (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * Ep2) * d4 / 24
      + (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * Ep2 - 3 * c1 * c1) * d6 / 720)
    val lam = u.lon0 + (d - (1 + 2 * t1 + c1) * d3 / 6
      + (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * Ep2 + 24 * t1 * t1) * d5 / 120) / cosP
    (lam * Rad2Deg, phi * Rad2Deg)
  }

  /** The UTM zone containing (lon, lat) — convenience for auto-zoning. */
  def utmZoneFor(lon: Double, lat: Double): Utm =
    Utm(math.min(60, math.max(1, ((lon + 180.0) / 6.0).toInt + 1)), north = lat >= 0)
}
