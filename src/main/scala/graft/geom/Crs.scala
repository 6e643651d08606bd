package graft.geom

import org.locationtech.jts.geom.{CoordinateFilter, Geometry}

/**
 * Closed-form CRS reprojection (SURVEY.md §2.5 catalog breadth; the
 * reference registers Sedona's ST_Transform for the same job). Supported:
 *
 *  - EPSG:4326 (WGS84 lon/lat degrees)
 *  - EPSG:3857 (WGS84 web/spherical mercator, meters)
 *  - EPSG:326zz / 327zz (WGS84 UTM zone zz north / south, meters)
 *  - EPSG:32661 / 32761 (Universal Polar Stereographic north / south —
 *    the polar caps ST_BestSRID points at)
 *  - Lambert conformal conic 2SP: EPSG:2154 (RGF93 / Lambert-93),
 *    EPSG:3947 (CC47), EPSG:102100-style national grids via the table
 *  - Albers equal-area conic: EPSG:5070 (NAD83 / CONUS Albers)
 *  - Parametric transverse Mercator: EPSG:27700 (OSGB36 British National
 *    Grid, Airy 1830 + 7-param Helmert datum shift), EPSG:25832/25833
 *    (ETRS89 / UTM 32N, 33N on GRS80)
 *
 * All conversions hub through WGS84 lon/lat. Projections are the standard
 * closed forms from Snyder, "Map Projections: A Working Manual" (USGS PP
 * 1395): spherical mercator (eq 7-1..7-4), transverse mercator series
 * (8-9..8-25), Lambert conformal conic 2SP (15-1..15-11), Albers
 * equal-area (14-1..14-21). Datums that are not WGS84-equivalent carry a
 * 7-parameter Helmert transformation (position-vector convention) applied
 * in geocentric XYZ — accurate to a few meters, the same closed-form path
 * every public GIS offers short of grid-shift files.
 *
 * Degree→radian conversion is written `deg * (π/180)` (not Java's
 * `toRadians`, which computes `deg/180*π`) so the arithmetic matches SQL
 * engines' `radians()` bit-for-bit where possible.
 */
object Crs {

  private val R = 6378137.0 // WGS84 semi-major axis (also web-mercator sphere)
  private val Deg2Rad = math.Pi / 180.0
  private val Rad2Deg = 180.0 / math.Pi

  // WGS84 ellipsoid (kept as top-level constants: the UTM series below
  // predates the parametric path and its arithmetic must stay identical)
  private val F = 1.0 / 298.257223563
  private val E2 = F * (2.0 - F)
  private val Ep2 = E2 / (1.0 - E2)
  private val K0 = 0.9996

  /** Reference ellipsoid (semi-major axis a, inverse flattening 1/f). */
  final case class Ellipsoid(a: Double, invF: Double) {
    val f: Double = 1.0 / invF
    val e2: Double = f * (2.0 - f)
    val e: Double = math.sqrt(e2)
    val ep2: Double = e2 / (1.0 - e2)
  }
  object Ellipsoid {
    val Wgs84 = Ellipsoid(6378137.0, 298.257223563)
    val Grs80 = Ellipsoid(6378137.0, 298.257222101)
    val Airy1830 = Ellipsoid(6377563.396, 299.3249646)
  }

  /** 7-parameter Helmert transformation FROM this datum TO WGS84
    * (position-vector sign convention; translations m, rotations
    * arc-seconds, scale ppm). */
  final case class Helmert(tx: Double, ty: Double, tz: Double,
                           rxSec: Double, rySec: Double, rzSec: Double,
                           sPpm: Double) {
    private val Sec2Rad = Deg2Rad / 3600.0
    val rx: Double = rxSec * Sec2Rad
    val ry: Double = rySec * Sec2Rad
    val rz: Double = rzSec * Sec2Rad
    val s: Double = sPpm * 1e-6
  }

  sealed trait Code { def epsg: Int }
  case object Wgs84 extends Code { val epsg = 4326 }
  case object WebMercator extends Code { val epsg = 3857 }
  final case class Utm(zone: Int, north: Boolean) extends Code {
    require(zone >= 1 && zone <= 60, s"UTM zone $zone out of range 1..60")
    def epsg: Int = (if (north) 32600 else 32700) + zone
    def lon0: Double = ((zone - 1) * 6 - 180 + 3) * Deg2Rad
  }
  /** Lambert conformal conic, 2 standard parallels (Snyder §15). Angles in
    * degrees; falseE/falseN in meters; `datum` None when the geographic CRS
    * is WGS84-equivalent (RGF93, ETRS89, NAD83). */
  final case class Lcc(epsg: Int, ell: Ellipsoid, datum: Option[Helmert],
                       lat0: Double, lon0: Double, lat1: Double, lat2: Double,
                       falseE: Double, falseN: Double) extends Code
  /** Albers equal-area conic, 2 standard parallels (Snyder §14). */
  final case class Aea(epsg: Int, ell: Ellipsoid, datum: Option[Helmert],
                       lat0: Double, lon0: Double, lat1: Double, lat2: Double,
                       falseE: Double, falseN: Double) extends Code
  /** Parametric transverse Mercator (same series as UTM, arbitrary
    * ellipsoid / origin / scale / false offsets). */
  final case class Tmerc(epsg: Int, ell: Ellipsoid, datum: Option[Helmert],
                         lat0: Double, lon0: Double, k0: Double,
                         falseE: Double, falseN: Double) extends Code
  /** Universal Polar Stereographic (EPSG Polar Stereographic variant A on
    * WGS84: k0 = 0.994, FE = FN = 2,000,000) — the polar companion of UTM
    * and what [[graft.functions.StBestSrid]] returns beyond the UTM band. */
  final case class Ups(north: Boolean) extends Code {
    def epsg: Int = if (north) 32661 else 32761
  }

  /** Built-in projected-CRS parameter table (public EPSG registry values). */
  private val Registry: Map[Int, Code] = Map(
    // RGF93 / Lambert-93 (France) — LCC 2SP on GRS80, RGF93 ≡ WGS84
    2154 -> Lcc(2154, Ellipsoid.Grs80, None, 46.5, 3.0, 44.0, 49.0, 700000.0, 6600000.0),
    // NAD83 / Conus Albers — Albers on GRS80, NAD83 ≈ WGS84 at this accuracy
    5070 -> Aea(5070, Ellipsoid.Grs80, None, 23.0, -96.0, 29.5, 45.5, 0.0, 0.0),
    // OSGB36 / British National Grid — TM on Airy 1830 + Helmert OSGB36→WGS84
    // (negated WGS84→OSGB36 set published by Ordnance Survey)
    27700 -> Tmerc(27700, Ellipsoid.Airy1830,
      Some(Helmert(446.448, -125.157, 542.060, 0.1502, 0.2470, 0.8421, -20.4894)),
      49.0, -2.0, 0.9996012717, 400000.0, -100000.0),
    // ETRS89 / UTM zones 32N, 33N (GRS80; ETRS89 ≡ WGS84 at this accuracy)
    25832 -> Tmerc(25832, Ellipsoid.Grs80, None, 0.0, 9.0, 0.9996, 500000.0, 0.0),
    25833 -> Tmerc(25833, Ellipsoid.Grs80, None, 0.0, 15.0, 0.9996, 500000.0, 0.0))

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
      case 32661 => Ups(north = true)
      case 32761 => Ups(north = false)
      case other => Registry.getOrElse(other, throw new IllegalArgumentException(
        s"unsupported CRS EPSG:$other (supported: 4326, 3857, 326zz/327zz UTM, " +
          s"32661/32761 UPS, ${Registry.keys.toSeq.sorted.mkString(", ")})"))
    }
  }

  /** (x, y) in `code` -> (lon, lat) degrees. */
  def toWgs(code: Code, x: Double, y: Double): (Double, Double) = code match {
    case Wgs84 => (x, y)
    case WebMercator =>
      (x / R * Rad2Deg, (2.0 * math.atan(math.exp(y / R)) - math.Pi / 2.0) * Rad2Deg)
    case u: Utm => utmInverse(u, x, y)
    case u: Ups => upsInverse(u, x, y)
    case p: Lcc =>
      val (lon, lat) = lccInverse(p, x, y)
      geodToWgs(p.ell, p.datum, lon, lat)
    case p: Aea =>
      val (lon, lat) = aeaInverse(p, x, y)
      geodToWgs(p.ell, p.datum, lon, lat)
    case p: Tmerc =>
      val (lon, lat) = tmercInverse(p, x, y)
      geodToWgs(p.ell, p.datum, lon, lat)
  }

  /** (lon, lat) degrees -> (x, y) in `code`. */
  def fromWgs(code: Code, lon: Double, lat: Double): (Double, Double) = code match {
    case Wgs84 => (lon, lat)
    case WebMercator =>
      (R * (lon * Deg2Rad), R * math.log(math.tan(math.Pi / 4.0 + (lat * Deg2Rad) / 2.0)))
    case u: Utm => utmForward(u, lon, lat)
    case u: Ups => upsForward(u, lon, lat)
    case p: Lcc =>
      val (lo, la) = wgsToGeod(p.ell, p.datum, lon, lat)
      lccForward(p, lo, la)
    case p: Aea =>
      val (lo, la) = wgsToGeod(p.ell, p.datum, lon, lat)
      aeaForward(p, lo, la)
    case p: Tmerc =>
      val (lo, la) = wgsToGeod(p.ell, p.datum, lon, lat)
      tmercForward(p, lo, la)
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
  // UPS polar stereographic (EPSG Guidance Note 7-2 variant A, WGS84)
  // -------------------------------------------------------------------------

  private val UpsK0 = 0.994
  private val UpsFalse = 2000000.0
  private val E1 = math.sqrt(E2)
  // sqrt((1+e)^(1+e) * (1-e)^(1-e)) — constant of the variant-A rho
  private val UpsC = math.sqrt(math.pow(1 + E1, 1 + E1) * math.pow(1 - E1, 1 - E1))

  private def upsForward(u: Ups, lonDeg: Double, latDeg: Double): (Double, Double) = {
    val lam = lonDeg * Deg2Rad
    val phi = latDeg * Deg2Rad
    val esin = E1 * math.sin(phi)
    val t =
      if (u.north) math.tan(math.Pi / 4.0 - phi / 2.0) * math.pow((1 + esin) / (1 - esin), E1 / 2.0)
      else math.tan(math.Pi / 4.0 + phi / 2.0) / math.pow((1 + esin) / (1 - esin), E1 / 2.0)
    val rho = 2.0 * R * UpsK0 * t / UpsC
    val x = UpsFalse + rho * math.sin(lam)
    val y = if (u.north) UpsFalse - rho * math.cos(lam) else UpsFalse + rho * math.cos(lam)
    (x, y)
  }

  private def upsInverse(u: Ups, x: Double, y: Double): (Double, Double) = {
    val dx = x - UpsFalse
    val dy = y - UpsFalse
    val rho = math.hypot(dx, dy)
    val t = rho * UpsC / (2.0 * R * UpsK0)
    val chi =
      if (u.north) math.Pi / 2.0 - 2.0 * math.atan(t)
      else 2.0 * math.atan(t) - math.Pi / 2.0
    // conformal-latitude series (EPSG GN7-2 eq. for phi from chi)
    val e4 = E2 * E2; val e6 = e4 * E2; val e8 = e6 * E2
    val phi = chi +
      (E2 / 2.0 + 5.0 * e4 / 24.0 + e6 / 12.0 + 13.0 * e8 / 360.0) * math.sin(2.0 * chi) +
      (7.0 * e4 / 48.0 + 29.0 * e6 / 240.0 + 811.0 * e8 / 11520.0) * math.sin(4.0 * chi) +
      (7.0 * e6 / 120.0 + 81.0 * e8 / 1120.0) * math.sin(6.0 * chi) +
      (4279.0 * e8 / 161280.0) * math.sin(8.0 * chi)
    val lam =
      if (rho == 0.0) 0.0
      else if (u.north) math.atan2(dx, -dy)
      else math.atan2(dx, dy)
    (lam * Rad2Deg, phi * Rad2Deg)
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

  // -------------------------------------------------------------------------
  // Datum shift: geodetic <-> geocentric + 7-param Helmert (position vector)
  // -------------------------------------------------------------------------

  private def geodeticToXyz(ell: Ellipsoid, lonDeg: Double, latDeg: Double): (Double, Double, Double) = {
    val phi = latDeg * Deg2Rad; val lam = lonDeg * Deg2Rad
    val sinP = math.sin(phi); val cosP = math.cos(phi)
    val nu = ell.a / math.sqrt(1.0 - ell.e2 * sinP * sinP)
    (nu * cosP * math.cos(lam), nu * cosP * math.sin(lam), nu * (1.0 - ell.e2) * sinP)
  }

  private def xyzToGeodetic(ell: Ellipsoid, x: Double, y: Double, z: Double): (Double, Double) = {
    val p = math.sqrt(x * x + y * y)
    var phi = math.atan2(z, p * (1.0 - ell.e2))
    var i = 0
    while (i < 8) { // converges to sub-mm in ~4 iterations
      val sinP = math.sin(phi)
      val nu = ell.a / math.sqrt(1.0 - ell.e2 * sinP * sinP)
      phi = math.atan2(z + ell.e2 * nu * sinP, p)
      i += 1
    }
    (math.atan2(y, x) * Rad2Deg, phi * Rad2Deg)
  }

  /** Apply `h` forward (datum -> WGS84), small-angle position-vector form. */
  private def helmertFwd(h: Helmert, x: Double, y: Double, z: Double): (Double, Double, Double) =
    (h.tx + (1.0 + h.s) * (x - h.rz * y + h.ry * z),
      h.ty + (1.0 + h.s) * (h.rz * x + y - h.rx * z),
      h.tz + (1.0 + h.s) * (-h.ry * x + h.rx * y + z))

  /** Exact inverse of [[helmertFwd]]: un-translate, un-scale, transposed
    * small-angle rotation (the transpose IS the inverse of I + skew(r) up
    * to O(r²), far below the Helmert model's own accuracy). */
  private def helmertInv(h: Helmert, x: Double, y: Double, z: Double): (Double, Double, Double) = {
    val ux = (x - h.tx) / (1.0 + h.s)
    val uy = (y - h.ty) / (1.0 + h.s)
    val uz = (z - h.tz) / (1.0 + h.s)
    (ux + h.rz * uy - h.ry * uz, -h.rz * ux + uy + h.rx * uz, h.ry * ux - h.rx * uy + uz)
  }

  /** Geographic coords on (ell, datum) -> WGS84 lon/lat degrees. */
  private def geodToWgs(ell: Ellipsoid, datum: Option[Helmert],
                        lonDeg: Double, latDeg: Double): (Double, Double) = datum match {
    case None => (lonDeg, latDeg)
    case Some(h) =>
      val (x, y, z) = geodeticToXyz(ell, lonDeg, latDeg)
      val (wx, wy, wz) = helmertFwd(h, x, y, z)
      xyzToGeodetic(Ellipsoid.Wgs84, wx, wy, wz)
  }

  /** WGS84 lon/lat degrees -> geographic coords on (ell, datum). */
  private def wgsToGeod(ell: Ellipsoid, datum: Option[Helmert],
                        lonDeg: Double, latDeg: Double): (Double, Double) = datum match {
    case None => (lonDeg, latDeg)
    case Some(h) =>
      val (x, y, z) = geodeticToXyz(Ellipsoid.Wgs84, lonDeg, latDeg)
      val (dx, dy, dz) = helmertInv(h, x, y, z)
      xyzToGeodetic(ell, dx, dy, dz)
  }

  // -------------------------------------------------------------------------
  // Lambert conformal conic, 2SP (Snyder eqs 15-1..15-11)
  // -------------------------------------------------------------------------

  private def lccM(e2: Double, phi: Double): Double = {
    val s = math.sin(phi)
    math.cos(phi) / math.sqrt(1.0 - e2 * s * s)
  }

  private def lccT(e: Double, phi: Double): Double = {
    val s = math.sin(phi)
    math.tan(math.Pi / 4.0 - phi / 2.0) /
      math.pow((1.0 - e * s) / (1.0 + e * s), e / 2.0)
  }

  /** (n, F, rho0) — the projection constants; derived once per Lcc value. */
  private val lccConstsMemo = new java.util.concurrent.ConcurrentHashMap[Lcc, (Double, Double, Double)]()
  private def lccConsts(p: Lcc): (Double, Double, Double) =
    lccConstsMemo.computeIfAbsent(p, { q =>
      val e = q.ell.e; val e2 = q.ell.e2
      val phi0 = q.lat0 * Deg2Rad; val phi1 = q.lat1 * Deg2Rad; val phi2 = q.lat2 * Deg2Rad
      val m1 = lccM(e2, phi1); val m2 = lccM(e2, phi2)
      val t0 = lccT(e, phi0); val t1 = lccT(e, phi1); val t2 = lccT(e, phi2)
      val n = (math.log(m1) - math.log(m2)) / (math.log(t1) - math.log(t2))
      val bigF = m1 / (n * math.pow(t1, n))
      val rho0 = q.ell.a * bigF * math.pow(t0, n)
      (n, bigF, rho0)
    })

  private def lccForward(p: Lcc, lonDeg: Double, latDeg: Double): (Double, Double) = {
    val (n, bigF, rho0) = lccConsts(p)
    val rho = p.ell.a * bigF * math.pow(lccT(p.ell.e, latDeg * Deg2Rad), n)
    val theta = n * ((lonDeg - p.lon0) * Deg2Rad)
    (p.falseE + rho * math.sin(theta), p.falseN + rho0 - rho * math.cos(theta))
  }

  private def lccInverse(p: Lcc, x: Double, y: Double): (Double, Double) = {
    val (n, bigF, rho0) = lccConsts(p)
    val dx = x - p.falseE; val dy = rho0 - (y - p.falseN)
    val sign = if (n >= 0) 1.0 else -1.0
    val rho = sign * math.sqrt(dx * dx + dy * dy)
    val theta = math.atan2(sign * dx, sign * dy)
    val t = math.pow(rho / (p.ell.a * bigF), 1.0 / n)
    // phi from t by fixed-point iteration (Snyder eq 7-9; quick convergence)
    val e = p.ell.e
    var phi = math.Pi / 2.0 - 2.0 * math.atan(t)
    var i = 0
    while (i < 12) {
      val s = math.sin(phi)
      phi = math.Pi / 2.0 - 2.0 * math.atan(
        t * math.pow((1.0 - e * s) / (1.0 + e * s), e / 2.0))
      i += 1
    }
    ((theta / n) * Rad2Deg + p.lon0, phi * Rad2Deg)
  }

  // -------------------------------------------------------------------------
  // Albers equal-area conic, 2SP (Snyder eqs 14-1..14-21)
  // -------------------------------------------------------------------------

  private def aeaQ(ell: Ellipsoid, phi: Double): Double = {
    val e = ell.e; val e2 = ell.e2; val s = math.sin(phi)
    (1.0 - e2) * (s / (1.0 - e2 * s * s) -
      (1.0 / (2.0 * e)) * math.log((1.0 - e * s) / (1.0 + e * s)))
  }

  private val aeaConstsMemo = new java.util.concurrent.ConcurrentHashMap[Aea, (Double, Double, Double)]()
  private def aeaConsts(p: Aea): (Double, Double, Double) =
    aeaConstsMemo.computeIfAbsent(p, { q =>
      val phi0 = q.lat0 * Deg2Rad; val phi1 = q.lat1 * Deg2Rad; val phi2 = q.lat2 * Deg2Rad
      val m1 = lccM(q.ell.e2, phi1); val m2 = lccM(q.ell.e2, phi2)
      val q0 = aeaQ(q.ell, phi0); val q1 = aeaQ(q.ell, phi1); val q2 = aeaQ(q.ell, phi2)
      val n = (m1 * m1 - m2 * m2) / (q2 - q1)
      val c = m1 * m1 + n * q1
      val rho0 = q.ell.a * math.sqrt(c - n * q0) / n
      (n, c, rho0)
    })

  private def aeaForward(p: Aea, lonDeg: Double, latDeg: Double): (Double, Double) = {
    val (n, c, rho0) = aeaConsts(p)
    val rho = p.ell.a * math.sqrt(c - n * aeaQ(p.ell, latDeg * Deg2Rad)) / n
    val theta = n * ((lonDeg - p.lon0) * Deg2Rad)
    (p.falseE + rho * math.sin(theta), p.falseN + rho0 - rho * math.cos(theta))
  }

  private def aeaInverse(p: Aea, x: Double, y: Double): (Double, Double) = {
    val (n, c, rho0) = aeaConsts(p)
    val dx = x - p.falseE; val dy = rho0 - (y - p.falseN)
    val sign = if (n >= 0) 1.0 else -1.0
    val rho = math.sqrt(dx * dx + dy * dy)
    val theta = math.atan2(sign * dx, sign * dy)
    val qv = (c - (rho * rho * n * n) / (p.ell.a * p.ell.a)) / n
    // phi from q by Newton iteration (Snyder eq 3-16)
    val e = p.ell.e; val e2 = p.ell.e2
    var phi = math.asin(math.max(-1.0, math.min(1.0, qv / 2.0)))
    var i = 0
    while (i < 12) {
      val s = math.sin(phi); val cosP = math.cos(phi)
      val den = 1.0 - e2 * s * s
      if (math.abs(cosP) > 1e-12) {
        phi += den * den / (2.0 * cosP) * (qv / (1.0 - e2) - s / den +
          (1.0 / (2.0 * e)) * math.log((1.0 - e * s) / (1.0 + e * s)))
      }
      i += 1
    }
    ((theta / n) * Rad2Deg + p.lon0, phi * Rad2Deg)
  }

  // -------------------------------------------------------------------------
  // Parametric transverse Mercator (same Snyder series as UTM, arbitrary
  // ellipsoid / natural origin / scale factor / false offsets)
  // -------------------------------------------------------------------------

  private def arcP(ell: Ellipsoid, phi: Double): Double = {
    val e2 = ell.e2
    ell.a * ((1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * e2 * e2 * e2 / 256) * phi
      - (3 * e2 / 8 + 3 * e2 * e2 / 32 + 45 * e2 * e2 * e2 / 1024) * math.sin(2 * phi)
      + (15 * e2 * e2 / 256 + 45 * e2 * e2 * e2 / 1024) * math.sin(4 * phi)
      - (35 * e2 * e2 * e2 / 3072) * math.sin(6 * phi))
  }

  private def tmercForward(p: Tmerc, lonDeg: Double, latDeg: Double): (Double, Double) = {
    val ell = p.ell; val e2 = ell.e2; val ep2 = ell.ep2
    val phi = latDeg * Deg2Rad
    val lam = lonDeg * Deg2Rad
    val lam0 = p.lon0 * Deg2Rad
    val sinP = math.sin(phi); val cosP = math.cos(phi); val tanP = math.tan(phi)
    val n = ell.a / math.sqrt(1 - e2 * sinP * sinP)
    val t = tanP * tanP
    val c = ep2 * cosP * cosP
    val a = (lam - lam0) * cosP
    val a2 = a * a; val a3 = a2 * a; val a4 = a3 * a; val a5 = a4 * a; val a6 = a5 * a
    val x = p.k0 * n * (a + (1 - t + c) * a3 / 6
      + (5 - 18 * t + t * t + 72 * c - 58 * ep2) * a5 / 120) + p.falseE
    val m0 = arcP(ell, p.lat0 * Deg2Rad)
    val y = p.k0 * (arcP(ell, phi) - m0 + n * tanP * (a2 / 2
      + (5 - t + 9 * c + 4 * c * c) * a4 / 24
      + (61 - 58 * t + t * t + 600 * c - 330 * ep2) * a6 / 720)) + p.falseN
    (x, y)
  }

  private def tmercInverse(p: Tmerc, easting: Double, northing: Double): (Double, Double) = {
    val ell = p.ell; val e2 = ell.e2; val ep2 = ell.ep2
    val x = easting - p.falseE
    val m0 = arcP(ell, p.lat0 * Deg2Rad)
    val m = m0 + (northing - p.falseN) / p.k0
    val mu = m / (ell.a * (1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * e2 * e2 * e2 / 256))
    val e1 = (1 - math.sqrt(1 - e2)) / (1 + math.sqrt(1 - e2))
    val phi1 = mu + (3 * e1 / 2 - 27 * e1 * e1 * e1 / 32) * math.sin(2 * mu) +
      (21 * e1 * e1 / 16 - 55 * math.pow(e1, 4) / 32) * math.sin(4 * mu) +
      (151 * e1 * e1 * e1 / 96) * math.sin(6 * mu) +
      (1097 * math.pow(e1, 4) / 512) * math.sin(8 * mu)
    val sinP = math.sin(phi1); val cosP = math.cos(phi1); val tanP = math.tan(phi1)
    val c1 = ep2 * cosP * cosP
    val t1 = tanP * tanP
    val n1 = ell.a / math.sqrt(1 - e2 * sinP * sinP)
    val r1 = ell.a * (1 - e2) / math.pow(1 - e2 * sinP * sinP, 1.5)
    val d = x / (n1 * p.k0)
    val d2 = d * d; val d3 = d2 * d; val d4 = d3 * d; val d5 = d4 * d; val d6 = d5 * d
    val phi = phi1 - (n1 * tanP / r1) * (d2 / 2
      - (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * ep2) * d4 / 24
      + (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * ep2 - 3 * c1 * c1) * d6 / 720)
    val lam = p.lon0 * Deg2Rad + (d - (1 + 2 * t1 + c1) * d3 / 6
      + (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * ep2 + 24 * t1 * t1) * d5 / 120) / cosP
    (lam * Rad2Deg, phi * Rad2Deg)
  }
}
