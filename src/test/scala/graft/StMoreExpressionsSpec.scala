package graft

import graft.functions.GeoHash

/** Value checks for catalog tier 2 (StMoreExpressions). */
class StMoreExpressionsSpec extends SparkSpec {

  private def s1(sql: String): Any = spark.sql(s"SELECT $sql").head.get(0)

  test("geohash: canonical example, roundtrip, precision nesting") {
    // the classic geohash example cell
    assert(GeoHash.encode(-5.60302734375, 42.60498046875, 5) == "ezs42")
    assert(s1("st_geohash(st_point(-5.60302734375D, 42.60498046875D), 5)") == "ezs42")
    val (lon, lat) = GeoHash.decodeCenter("ezs42")
    assert(math.abs(lon - -5.60302734375) < 0.025 && math.abs(lat - 42.60498046875) < 0.025)
    // decode center re-encodes to the same cell at every shorter precision
    for (p <- 1 to 5)
      assert(GeoHash.encode(lon, lat, p) == "ezs42".take(p))
    assert(s1("st_astext(st_pointfromgeohash('ezs42'))").toString.startsWith("POINT ("))
  }

  test("linear referencing: interpolate, substring, locate agree on exact fractions") {
    val line = "st_geomfromtext('LINESTRING (0 0, 8 6)')" // length 10
    assert(s1(s"st_astext(st_lineinterpolatepoint($line, 0.5))") == "POINT (4 3)")
    assert(s1(s"st_astext(st_lineinterpolatepoint($line, 0.25))") == "POINT (2 1.5)")
    assert(s1(s"st_length(st_linesubstring($line, 0.25, 0.75))") == 5.0)
    assert(s1(s"st_linelocatepoint($line, st_point(4.0D, 3.0D))") == 0.5)
    // multi-segment: merge rejoins split pieces
    assert(s1("st_astext(st_linemerge(st_geomfromtext('MULTILINESTRING ((0 0, 1 1), (1 1, 2 0))')))") ==
      "LINESTRING (0 0, 1 1, 2 0)")
  }

  test("affine family: scale/affine exact on integers, rotate is an isometry") {
    assert(s1("st_astext(st_scale(st_point(3.0D, 5.0D), 2.0D, 4.0D))") == "POINT (6 20)")
    assert(s1("st_astext(st_affine(st_point(1.0D, 2.0D), 2, 1, 0, 2, 10, 20))") == "POINT (14 24)")
    val len = s1("st_length(st_rotate(st_geomfromtext('LINESTRING (0 0, 3 4)'), 1.234D))")
    assert(math.abs(len.asInstanceOf[Double] - 5.0) < 1e-12)
  }

  test("shape diagnostics and derived shapes") {
    assert(s1("st_issimple(st_geomfromtext('LINESTRING (0 0, 2 2, 2 0, 0 2)'))") == false)
    assert(s1("st_isring(st_exteriorring(st_makeenvelope(0,0,1,1)))") == true)
    assert(s1("st_isring(st_geomfromtext('LINESTRING (0 0, 1 1)'))") == false)
    assert(s1("st_within(st_pointonsurface(st_makeenvelope(0,0,2,2)), st_makeenvelope(0,0,2,2))") == true)
    // unit square: min bounding circle radius = half diagonal
    val r = s1("st_minimumboundingradius(st_makeenvelope(0,0,2,2))").asInstanceOf[Double]
    assert(math.abs(r - math.sqrt(2.0)) < 1e-12)
    assert(s1("st_area(st_expand(st_point(1.0D, 1.0D), 2.0D))") == 16.0)
    assert(s1("st_length(st_boundingdiagonal(st_makeenvelope(0,0,3,4)))") == 5.0)
    assert(s1("st_astext(st_reduceprecision(st_point(1.04D, 1.96D), 0.5D))") == "POINT (1 2)")
    assert(s1("st_astext(st_snap(st_point(1.05D, 1.0D), st_point(1.0D, 1.0D), 0.2D))") == "POINT (1 1)")
    // concave hull at ratio 1.0 degenerates to the convex hull
    assert(s1("st_equals(st_concavehull(st_geomfromtext('MULTIPOINT ((0 0), (4 0), (2 3))'), 1.0D), " +
      "st_convexhull(st_geomfromtext('MULTIPOINT ((0 0), (4 0), (2 3))')))") == true)
  }

  test("polygon construction and ring/collection access") {
    assert(s1("st_area(st_makepolygon(st_geomfromtext('LINESTRING (0 0, 4 0, 4 4, 0 4, 0 0)')))") == 16.0)
    assert(s1("""st_area(st_makepolygon(st_geomfromtext('LINESTRING (0 0, 10 0, 10 10, 0 10, 0 0)'),
      array(st_geomfromtext('LINESTRING (2 2, 4 2, 4 4, 2 4, 2 2)'))))""") == 96.0)
    assert(s1("st_length(st_interiorringn(st_geomfromtext('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))'), 1))") == 8.0)
    assert(s1("st_interiorringn(st_makeenvelope(0,0,1,1), 1)") == null)
    assert(s1("st_astext(st_collectionextract(st_geomfromtext('GEOMETRYCOLLECTION (POINT (1 1), LINESTRING (0 0, 1 1), POINT (2 2))'), 1))") ==
      "MULTIPOINT ((1 1), (2 2))")
    assert(s1("st_geometrytype(st_collectionextract(st_geomfromtext('GEOMETRYCOLLECTION (POINT (1 1), LINESTRING (0 0, 1 1))'), 2))") ==
      "ST_MultiLineString")
    assert(s1("st_npoints(st_geomfromtext('LINESTRING (0 0, 1 1, 2 2)'))") == 3)
    val err = intercept[Exception](s1("st_makepolygon(st_geomfromtext('LINESTRING (0 0, 4 0)'))"))
    assert(err.getMessage.contains("closed") || err.getCause != null)
  }

  test("st_intersection_aggr: n-way overlap, map-side partials, empty case") {
    val r = spark.sql("""
      SELECT st_area(st_intersection_aggr(g)) AS a,
             st_astext(st_normalize(st_envelope(st_intersection_aggr(g)))) AS w
      FROM (SELECT st_makeenvelope(CAST(id AS DOUBLE), 0.0D, CAST(id + 3 AS DOUBLE), 3.0D) AS g
            FROM range(3))""").head
    assert(r.getDouble(0) == 3.0, s"overlap of (0..3),(1..4),(2..5) x (0..3) has area 3, got ${r.getDouble(0)}")
    assert(r.getString(1) == "POLYGON ((2 0, 2 3, 3 3, 3 0, 2 0))")
    // disjoint inputs -> empty geometry, not an error
    val empty = spark.sql("""
      SELECT st_isempty(st_intersection_aggr(g))
      FROM (SELECT st_makeenvelope(CAST(id * 10 AS DOUBLE), 0.0D, CAST(id * 10 + 1 AS DOUBLE), 1.0D) AS g
            FROM range(3))""").head.getBoolean(0)
    assert(empty)
  }

  test("distance metrics and angles") {
    assert(s1("st_hausdorffdistance(st_point(0.0D, 0.0D), st_point(3.0D, 4.0D))") == 5.0)
    assert(s1("st_frechetdistance(st_geomfromtext('LINESTRING (0 0, 1 0)'), st_geomfromtext('LINESTRING (0 1, 1 1)'))") == 1.0)
    val a = s1("st_angle(st_point(1.0D, 0.0D), st_point(0.0D, 0.0D), st_point(0.0D, 1.0D))").asInstanceOf[Double]
    assert(math.abs(a - math.Pi / 2) < 1e-12)
  }

  test("structure accessors: dump, dumppoints, multi, ewkt, add/remove point") {
    assert(s1("size(st_dump(st_geomfromtext('MULTIPOINT ((1 1), (2 2), (3 3))')))") == 3)
    assert(s1("transform(st_dump(st_geomfromtext('MULTIPOINT ((1 1), (2 2))')), g -> st_astext(g))")
      .asInstanceOf[scala.collection.Seq[String]] == Seq("POINT (1 1)", "POINT (2 2)"))
    assert(s1("size(st_dumppoints(st_makeenvelope(0,0,1,1)))") == 5)
    assert(s1("st_geometrytype(st_multi(st_point(1,2)))") == "ST_MultiPoint")
    assert(s1("st_geometrytype(st_multi(st_geomfromtext('MULTIPOINT ((1 1))')))") == "ST_MultiPoint")
    assert(s1("st_asewkt(st_setsrid(st_point(1.0D, 2.0D), 3857))") == "SRID=3857;POINT (1 2)")
    assert(s1("st_asewkt(st_point(1.0D, 2.0D))") == "SRID=4326;POINT (1 2)")
    assert(s1("st_astext(st_addpoint(st_geomfromtext('LINESTRING (0 0, 2 2)'), st_point(3.0D, 3.0D)))") ==
      "LINESTRING (0 0, 2 2, 3 3)")
    assert(s1("st_astext(st_addpoint(st_geomfromtext('LINESTRING (0 0, 2 2)'), st_point(1.0D, 0.0D), 1))") ==
      "LINESTRING (0 0, 1 0, 2 2)")
    assert(s1("st_astext(st_removepoint(st_geomfromtext('LINESTRING (0 0, 1 0, 2 2)'), 1))") ==
      "LINESTRING (0 0, 2 2)")
    assert(s1("st_astext(st_force2d(st_point(1.0D, 2.0D)))") == "POINT (1 2)")
  }
}
