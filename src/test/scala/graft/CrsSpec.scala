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

  test("st_transform SQL: 4326->3857->4326 roundtrip and SRID stamping") {
    val r = spark.sql("""
      SELECT st_astext(st_transform(st_transform(st_point(10.0D, 45.0D),
               'EPSG:4326', 'EPSG:3857'), 'EPSG:3857', 'EPSG:4326')) AS rt,
             st_srid(st_transform(st_point(10.0D, 45.0D), 'EPSG:4326', 'EPSG:3857')) AS srid
    """).head
    assert(r.getString(0).startsWith("POINT (10 45")) // printer trims exact 10/45
    assert(r.getInt(1) == 3857)
    // unsupported CRS is a clean error
    val err = intercept[Exception](
      spark.sql("SELECT st_transform(st_point(0.0D, 0.0D), 'EPSG:4326', 'EPSG:2154')").collect())
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
