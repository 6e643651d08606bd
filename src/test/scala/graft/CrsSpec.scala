package graft

import graft.geom.{Crs, Geom}

import org.apache.spark.sql.functions._

/** ST_Transform / ST_MakeValid / ST_GeomFromGeoJSON (SURVEY.md §2.5). */
class CrsSpec extends SparkSpec {
  import spark.implicits._

  test("web mercator forward matches the closed form and inverts") {
    // equator/meridian origin (up to tan(pi/4) FP noise ~1e-9 m)
    val (x0, y0) = Crs.fromWgs(Crs.WebMercator, 0.0, 0.0)
    assert(x0 == 0.0 && math.abs(y0) < 1e-8)
    // antimeridian easting is the canonical 20037508.34...
    val (x180, _) = Crs.fromWgs(Crs.WebMercator, 180.0, 0.0)
    assert(math.abs(x180 - 2.0037508342789244e7) < 1e-6)
    // roundtrip over a grid
    for (lon <- -170 to 170 by 35; lat <- -80 to 80 by 20) {
      val (x, y) = Crs.fromWgs(Crs.WebMercator, lon, lat)
      val (lo, la) = Crs.toWgs(Crs.WebMercator, x, y)
      assert(math.abs(lo - lon) < 1e-9 && math.abs(la - lat) < 1e-9, s"($lon,$lat)")
    }
  }

  test("UTM: central meridian maps to 500000 easting; known point; roundtrip both hemispheres") {
    // zone 31 central meridian = 3E; equator point is (500000, 0) exactly
    val (e0, n0) = Crs.fromWgs(Crs.Utm(31, north = true), 3.0, 0.0)
    assert(math.abs(e0 - 500000.0) < 1e-6 && math.abs(n0) < 1e-6)
    // absolute anchor: WGS84 meridian arc from equator to 45N is the
    // published 4,984,944.4 m; on the central meridian northing = k0 * arc
    val (_, n45) = Crs.fromWgs(Crs.Utm(31, north = true), 3.0, 45.0)
    assert(math.abs(n45 - 0.9996 * 4984944.4) < 2.0, s"northing $n45")
    // Eiffel Tower (2.2945E, 48.8584N) in UTM 31N ~ (448252, 5411954)
    val (ee, en) = Crs.fromWgs(Crs.Utm(31, north = true), 2.2945, 48.8584)
    assert(math.abs(ee - 448252.0) < 60.0, s"easting $ee")
    assert(math.abs(en - 5411954.0) < 60.0, s"northing $en")
    // roundtrip, both hemispheres, across each zone's width
    for (zone <- Seq(1, 17, 31, 56, 60); north <- Seq(true, false);
         dLon <- Seq(-2.5, 0.0, 2.5); lat <- Seq(-70.0, -30.0, -1.0, 1.0, 45.0, 70.0)
         if north == (lat >= 0)) {
      val u = Crs.Utm(zone, north)
      val lon = ((zone - 1) * 6 - 180 + 3) + dLon
      val (x, y) = Crs.fromWgs(u, lon, lat)
      val (lo, la) = Crs.toWgs(u, x, y)
      assert(math.abs(lo - lon) < 1e-8 && math.abs(la - lat) < 1e-8, s"z$zone $north ($lon,$lat)")
      if (!north) assert(y > 0, "false northing applies in the south")
    }
  }

  test("UPS (EPSG:32661/32761): pole at grid center, hemispheric symmetry, roundtrip") {
    val n = Crs.Ups(north = true)
    val s = Crs.Ups(north = false)
    // the pole itself sits at the false origin
    val (px, py) = Crs.fromWgs(n, 0.0, 90.0)
    assert(math.abs(px - 2000000.0) < 1e-6 && math.abs(py - 2000000.0) < 1e-6)
    // 84N on the 0 meridian: due south of the pole (x = FE, y < FN), with
    // rho in the published ~667.9 km band (NGA UPS grid extent)
    val (x84, y84) = Crs.fromWgs(n, 0.0, 84.0)
    assert(math.abs(x84 - 2000000.0) < 1e-6)
    val rho84 = 2000000.0 - y84
    assert(rho84 > 660000.0 && rho84 < 680000.0, s"rho(84N) = $rho84")
    // hemispheric mirror: same rho at 84S
    val (_, y84s) = Crs.fromWgs(s, 0.0, -84.0)
    assert(math.abs((y84s - 2000000.0) - rho84) < 1e-6)
    // roundtrip across both polar caps
    for (lon <- Seq(-179.0, -45.0, 0.0, 90.0, 135.0); lat <- Seq(80.5, 84.0, 88.0, 89.9)) {
      val (x, y) = Crs.fromWgs(n, lon, lat)
      val (lo, la) = Crs.toWgs(n, x, y)
      assert(math.abs(lo - lon) < 1e-8 && math.abs(la - lat) < 1e-8, s"UPS N ($lon,$lat)")
      val (xs, ys) = Crs.fromWgs(s, lon, -lat)
      val (los, las) = Crs.toWgs(s, xs, ys)
      assert(math.abs(los - lon) < 1e-8 && math.abs(las + lat) < 1e-8, s"UPS S ($lon,${-lat})")
    }
    // SQL leg: the SRIDs st_bestsrid emits now transform end-to-end
    assert(sql1("SELECT st_srid(st_transform(st_point(10.0, 87.0), 'EPSG:4326', 'EPSG:32661'))") == 32661)
    val back = sql1("""SELECT st_y(st_transform(
      st_transform(st_point(10.0, 87.0), 'EPSG:4326', 'EPSG:32661'),
      'EPSG:32661', 'EPSG:4326'))""").asInstanceOf[Double]
    assert(math.abs(back - 87.0) < 1e-7)
  }

  test("st_transform SQL: 4326->3857->4326 roundtrip and SRID stamping") {
    val r = spark.sql("""
      SELECT st_astext(st_transform(st_transform(st_point(10.0D, 45.0D),
               'EPSG:4326', 'EPSG:3857'), 'EPSG:3857', 'EPSG:4326')) AS rt,
             st_srid(st_transform(st_point(10.0D, 45.0D), 'EPSG:4326', 'EPSG:3857')) AS srid
    """).head
    assert(r.getString(0).startsWith("POINT (10 45")) // printer trims exact 10/45
    assert(r.getInt(1) == 3857)
    // unsupported CRS is a clean error (2154 moved to the supported table
    // in round 9; 3035 LAEA remains outside the closed-form set)
    val err = intercept[Exception](
      spark.sql("SELECT st_transform(st_point(0.0D, 0.0D), 'EPSG:4326', 'EPSG:3035')").collect())
    assert(err.getMessage.contains("unsupported CRS") || err.getCause != null)
  }

  test("st_transform to UTM agrees with Crs directly, including polygons") {
    val (ex, ey) = Crs.fromWgs(Crs.Utm(33, north = true), 13.4, 52.52) // Berlin, 33N
    val r = spark.sql(
      "SELECT st_x(g) AS x, st_y(g) AS y FROM (SELECT st_transform(st_point(13.4D, 52.52D), 'EPSG:4326', 'EPSG:32633') AS g)")
      .head
    assert(math.abs(r.getDouble(0) - ex) < 1e-9 && math.abs(r.getDouble(1) - ey) < 1e-9)
    // polygon: every vertex transformed; area scales ~k0^2 * sec(lat) (sanity only)
    val a = spark.sql("""
      SELECT st_area(st_transform(st_makeenvelope(13.0D, 52.0D, 13.1D, 52.1D),
             'EPSG:4326', 'EPSG:32633')) AS a""").head.getDouble(0)
    assert(a > 7.0e7 && a < 8.0e7, s"0.1x0.1 deg cell near Berlin ~ 7.5e7 m^2, got $a")
  }

  test("Lambert-93 (EPSG:2154): natural origin, standard-parallel scale, roundtrip over France") {
    val l93 = Crs.parse("EPSG:2154")
    // natural origin (3E, 46.5N) maps to the false origin exactly
    val (x0, y0) = Crs.fromWgs(l93, 3.0, 46.5)
    assert(math.abs(x0 - 700000.0) < 1e-6 && math.abs(y0 - 6600000.0) < 1e-6, s"($x0,$y0)")
    // scale factor along each standard parallel is 1: projected distance of
    // a small arc along the parallel equals a*m(phi)*dLam (the parallel's
    // radius on the ellipsoid — an independent formula from the projection)
    val e2 = 1.0 / 298.257222101 * (2.0 - 1.0 / 298.257222101)
    for (lat <- Seq(44.0, 49.0)) {
      val phi = math.toRadians(lat)
      val parallelR = 6378137.0 * math.cos(phi) / math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi))
      val dLam = 0.01 * math.Pi / 180.0
      val (xa, ya) = Crs.fromWgs(l93, 3.0, lat)
      val (xb, yb) = Crs.fromWgs(l93, 3.01, lat)
      val projected = math.hypot(xb - xa, yb - ya)
      val k = projected / (parallelR * dLam)
      assert(math.abs(k - 1.0) < 1e-7, s"scale at standard parallel $lat: $k")
    }
    // conformal cone: scale > 1 outside the parallels, < 1 between them
    def kAt(lat: Double): Double = {
      val phi = math.toRadians(lat)
      val parallelR = 6378137.0 * math.cos(phi) / math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi))
      val (xa, ya) = Crs.fromWgs(l93, 3.0, lat)
      val (xb, yb) = Crs.fromWgs(l93, 3.01, lat)
      math.hypot(xb - xa, yb - ya) / (parallelR * 0.01 * math.Pi / 180.0)
    }
    assert(kAt(46.5) < 1.0 && kAt(42.0) > 1.0 && kAt(51.0) > 1.0)
    // roundtrip grid over France at sub-0.1mm
    for (lon <- Seq(-4.0, -1.0, 2.0, 5.0, 8.0); lat <- Seq(42.0, 45.0, 47.5, 49.0, 51.0)) {
      val (x, y) = Crs.fromWgs(l93, lon, lat)
      val (lo, la) = Crs.toWgs(l93, x, y)
      assert(math.abs(lo - lon) < 1e-9 && math.abs(la - lat) < 1e-9, s"($lon,$lat)")
    }
  }

  test("CONUS Albers (EPSG:5070): origin, equal-area q relation, roundtrip") {
    val aea = Crs.parse("EPSG:5070")
    // projection origin (96W, 23N) maps to (0, 0)
    val (x0, y0) = Crs.fromWgs(aea, -96.0, 23.0)
    assert(math.abs(x0) < 1e-6 && math.abs(y0) < 1e-6, s"($x0,$y0)")
    // equal-area: the projected area of a small quad equals the ellipsoidal
    // area a^2 * dLam * (q(latB)-q(latA)) / 2 — independent integral formula
    val a = 6378137.0
    val f = 1.0 / 298.257222101; val e2 = f * (2 - f); val e = math.sqrt(e2)
    def q(latDeg: Double): Double = {
      val s = math.sin(math.toRadians(latDeg))
      (1 - e2) * (s / (1 - e2 * s * s) - (1 / (2 * e)) * math.log((1 - e * s) / (1 + e * s)))
    }
    for (lat <- Seq(30.0, 40.0, 48.0)) {
      val dLamDeg = 0.1; val dLatDeg = 0.1
      // densified ring of the quad (the projected edges curve)
      val n = 20
      val ringPts = Seq.newBuilder[(Double, Double)]
      for (i <- 0 until n) ringPts += ((-96.0 + dLamDeg * i / n, lat))
      for (i <- 0 until n) ringPts += ((-96.0 + dLamDeg, lat + dLatDeg * i / n))
      for (i <- 0 until n) ringPts += ((-96.0 + dLamDeg * (n - i) / n, lat + dLatDeg))
      for (i <- 0 until n) ringPts += ((-96.0, lat + dLatDeg * (n - i) / n))
      val proj = ringPts.result().map { case (lo, la) => Crs.fromWgs(aea, lo, la) }
      val shoelace = 0.5 * math.abs((proj :+ proj.head).sliding(2).map {
        case Seq((ax, ay), (bx, by)) => ax * by - bx * ay
      }.sum)
      val trueArea = a * a * (dLamDeg * math.Pi / 180.0) * (q(lat + dLatDeg) - q(lat)) / 2.0
      assert(math.abs(shoelace / trueArea - 1.0) < 1e-6,
        s"area ratio at lat $lat: ${shoelace / trueArea}")
    }
    // roundtrip over CONUS
    for (lon <- Seq(-120.0, -110.0, -96.0, -85.0, -75.0); lat <- Seq(25.0, 33.0, 41.0, 49.0)) {
      val (x, y) = Crs.fromWgs(aea, lon, lat)
      val (lo, la) = Crs.toWgs(aea, x, y)
      assert(math.abs(lo - lon) < 1e-9 && math.abs(la - lat) < 1e-9, s"($lon,$lat)")
    }
  }

  test("British National Grid (EPSG:27700): datum shift magnitude and roundtrip") {
    val bng = Crs.parse("EPSG:27700")
    // the OSGB36 true origin (2W, 49N in OSGB36 geographic) reads back in
    // WGS84 shifted by the well-known ~100 m datum offset — if the Helmert
    // step were skipped this would be exactly (-2, 49)
    val (lonW, latW) = Crs.toWgs(bng, 400000.0, -100000.0)
    val offM = math.hypot((lonW - (-2.0)) * 111320.0 * math.cos(math.toRadians(49)),
      (latW - 49.0) * 110574.0)
    assert(offM > 20.0 && offM < 200.0, s"datum offset $offM m (lon $lonW lat $latW)")
    // roundtrip over Great Britain at ~cm (Helmert small-angle inverse)
    for (lon <- Seq(-6.0, -4.0, -2.0, 0.0, 1.5); lat <- Seq(50.0, 52.5, 55.0, 58.5)) {
      val (x, y) = Crs.fromWgs(bng, lon, lat)
      val (lo, la) = Crs.toWgs(bng, x, y)
      assert(math.abs(lo - lon) < 1e-7 && math.abs(la - lat) < 1e-7, s"($lon,$lat)")
    }
  }

  test("ETRS89 UTM (EPSG:25832) agrees with the WGS84 UTM path to millimeters") {
    val etrs = Crs.parse("EPSG:25832")
    val wgsUtm = Crs.Utm(32, north = true)
    // GRS80 and WGS84 flattenings differ in the 10th digit; the parametric
    // transverse-Mercator path must agree with the legacy UTM series to mm
    for (lon <- Seq(6.5, 9.0, 11.5); lat <- Seq(47.0, 51.0, 55.0)) {
      val (xe, ye) = Crs.fromWgs(etrs, lon, lat)
      val (xw, yw) = Crs.fromWgs(wgsUtm, lon, lat)
      assert(math.abs(xe - xw) < 0.005 && math.abs(ye - yw) < 0.005,
        s"($lon,$lat): ETRS ($xe,$ye) vs WGS-UTM ($xw,$yw)")
      val (lo, la) = Crs.toWgs(etrs, xe, ye)
      // sub-mm: the lat0=0 meridian-arc subtraction costs one extra ulp-ish
      // term vs the legacy zero-origin UTM series
      assert(math.abs(lo - lon) < 5e-9 && math.abs(la - lat) < 5e-9)
    }
  }

  test("st_transform SQL end-to-end with table-driven EPSG codes") {
    val r = spark.sql(
      """SELECT st_x(st_transform(st_point(3.0D, 46.5D), 'EPSG:4326', 'EPSG:2154')) AS x,
        |       st_y(st_transform(st_point(3.0D, 46.5D), 'EPSG:4326', 'EPSG:2154')) AS y,
        |       st_srid(st_transform(st_point(3.0D, 46.5D), 'EPSG:4326', 'EPSG:2154')) AS srid
        |""".stripMargin).head
    assert(math.abs(r.getDouble(0) - 700000.0) < 1e-6)
    assert(math.abs(r.getDouble(1) - 6600000.0) < 1e-6)
    assert(r.getInt(2) == 2154)
    // chained: 2154 -> 27700 hubs through WGS84 with the datum shift applied
    val uk = spark.sql(
      """SELECT st_x(st_transform(st_transform(st_point(-0.1276D, 51.5072D),
        |         'EPSG:4326', 'EPSG:2154'), 'EPSG:2154', 'EPSG:27700')) AS x""".stripMargin)
      .head.getDouble(0)
    // London easting on the British grid is ~530000
    assert(uk > 500000 && uk < 560000, s"London BNG easting $uk")
  }

  test("st_makevalid repairs a bowtie; valid input passes through") {
    val r = spark.sql("""
      SELECT st_isvalid(st_geomfromtext('POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0))')) AS before,
             st_isvalid(st_makevalid(st_geomfromtext('POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0))'))) AS after,
             st_area(st_makevalid(st_geomfromtext('POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0))'))) AS area,
             st_astext(st_makevalid(st_geomfromtext('POINT (3 4)'))) AS pt
    """).head
    assert(!r.getBoolean(0) && r.getBoolean(1))
    assert(math.abs(r.getDouble(2) - 2.0) < 1e-12) // two unit triangles
    assert(r.getString(3) == "POINT (3 4)")
  }

  test("GeoJSON roundtrip: fromGeoJson(toGeoJson(g)) preserves every type") {
    val wkts = Seq(
      "POINT (1 2)", "LINESTRING (0 0, 1 1, 2 0)",
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))",
      "MULTIPOINT ((0 0), (3 4))", "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
      "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))",
      "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))")
    wkts.foreach { w =>
      val g = Geom.fromWkt(w)
      val back = Geom.fromGeoJson(Geom.toGeoJson(g))
      assert(back.equalsExact(g), s"roundtrip of $w gave ${Geom.toWkt(back)}")
    }
    // and through SQL
    val viaSql = spark.sql(
      """SELECT st_astext(st_geomfromgeojson(st_asgeojson(st_geomfromtext('POLYGON ((0 0, 3 0, 3 3, 0 3, 0 0))'))))""")
      .head.getString(0)
    assert(viaSql == "POLYGON ((0 0, 3 0, 3 3, 0 3, 0 0))")
  }

  test("st_buffer of a point is the regular 32-gon whose area has a closed form") {
    // the st_buffer_area oracle depends on this: JTS point-buffer with
    // default quadrantSegments=8 is a regular 32-gon at radius r, whose
    // area is 16 r^2 sin(pi/16) in exact arithmetic
    for (r <- Seq(1.0, 2.0, 5.0)) {
      val a = spark.sql(s"SELECT st_area(st_buffer(st_point(7.0D, -3.0D), ${r}D))").head.getDouble(0)
      val closed = 16.0 * r * r * math.sin(math.Pi / 16.0)
      assert(math.abs(a - closed) < 1e-9, s"r=$r: $a vs $closed")
    }
  }
}
