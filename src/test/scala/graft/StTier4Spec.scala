package graft

/** Value checks for catalog tier 4 (StTier4Expressions): spherical
  * geodesy, planar projection, typed/EWKT constructors, geometric median,
  * longitude shift, vertex editing. */
class StTier4Spec extends SparkSpec {

  private def s1(sql: String): Any = spark.sql(s"SELECT $sql").head.get(0)
  private def d1(sql: String): Double = s1(sql).asInstanceOf[Double]
  private def isNull(sql: String): Boolean = spark.sql(s"SELECT $sql").head.isNullAt(0)

  test("st_distancesphere: known great-circle distances") {
    // 1 degree along the equator = R * pi/180
    val oneDeg = 6371008.8 * math.Pi / 180.0
    assert(math.abs(d1("st_distancesphere(st_point(0,0), st_point(1,0))") - oneDeg) < 1e-6)
    // meridian quarter (equator to pole) = R * pi/2
    assert(math.abs(d1("st_distancesphere(st_point(0,0), st_point(0,90))")
      - 6371008.8 * math.Pi / 2.0) < 1e-6)
    // custom radius scales linearly
    assert(math.abs(d1("st_distancesphere(st_point(0,0), st_point(1,0), 1000.0)")
      - 1000.0 * math.Pi / 180.0) < 1e-12)
    // symmetric
    assert(d1("st_distancesphere(st_point(10,20), st_point(30,40))") ==
      d1("st_distancesphere(st_point(30,40), st_point(10,20))"))
  }

  test("st_lengthsphere sums segment great circles; non-lines contribute 0") {
    val oneDeg = 6371008.8 * math.Pi / 180.0
    // two 1-degree equator hops
    assert(math.abs(d1("st_lengthsphere(st_geomfromtext('LINESTRING (0 0, 1 0, 2 0)'))")
      - 2 * oneDeg) < 1e-6)
    assert(d1("st_lengthsphere(st_point(5, 5))") == 0.0)
  }

  test("st_areasphere: equatorial square and hole subtraction") {
    // 1x1 degree at the equator: ~ (R*pi/180)^2 within 0.1%
    val approx = math.pow(6371008.8 * math.Pi / 180.0, 2)
    val a = d1("st_areasphere(st_makeenvelope(0, 0, 1, 1))")
    assert(math.abs(a - approx) / approx < 1e-3, s"got $a expected ~$approx")
    val withHole = d1("""st_areasphere(st_geomfromtext(
      'POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))'))""")
    val full = d1("st_areasphere(st_makeenvelope(0, 0, 4, 4))")
    val hole = d1("st_areasphere(st_makeenvelope(1, 1, 2, 2))")
    assert(math.abs(withHole - (full - hole)) < 1.0)
  }

  test("st_project matches the st_azimuth convention and inverts") {
    // due north by 5: (0,0) -> (0,5)
    assert(s1("st_astext(st_project(st_point(0,0), 5.0, 0.0))") == "POINT (0 5)")
    // due east (azimuth pi/2): x grows
    val x = d1("st_x(st_project(st_point(0,0), 5.0, radians(90.0)))")
    assert(math.abs(x - 5.0) < 1e-12)
    // roundtrip: azimuth/distance of a projected point recover the inputs
    assert(math.abs(d1("st_azimuth(st_point(2,3), st_project(st_point(2,3), 7.0, 1.1))") - 1.1) < 1e-12)
    assert(math.abs(d1("st_distance(st_point(2,3), st_project(st_point(2,3), 7.0, 1.1))") - 7.0) < 1e-12)
  }

  test("st_geomfromewkt parses SRID prefix and plain WKT") {
    assert(s1("st_srid(st_geomfromewkt('SRID=3857;POINT (1 2)'))") == 3857)
    assert(s1("st_astext(st_geomfromewkt('SRID=3857;POINT (1 2)'))") == "POINT (1 2)")
    assert(s1("st_astext(st_geomfromewkt('POINT (1 2)'))") == "POINT (1 2)")
    // roundtrip with the writer twin
    assert(s1("st_srid(st_geomfromewkt(st_asewkt(st_setsrid(st_point(1,2), 4326))))") == 4326)
  }

  test("typed WKT constructors accept their type and NULL otherwise") {
    assert(s1("st_astext(st_pointfromtext('POINT (1 2)'))") == "POINT (1 2)")
    assert(isNull("st_pointfromtext('LINESTRING (0 0, 1 1)')"))
    assert(s1("st_geometrytype(st_linefromtext('LINESTRING (0 0, 1 1)'))") == "ST_LineString")
    assert(isNull("st_linefromtext('POINT (1 2)')"))
    assert(s1("st_geometrytype(st_polygonfromtext('POLYGON ((0 0, 1 0, 1 1, 0 0))'))") == "ST_Polygon")
    assert(isNull("st_polyfromtext('POINT (0 0)')"))
    assert(s1("st_geometrytype(st_mpointfromtext('MULTIPOINT ((0 0), (1 1))'))") == "ST_MultiPoint")
    assert(s1("st_geometrytype(st_mlinefromtext('MULTILINESTRING ((0 0, 1 1))'))") == "ST_MultiLineString")
    assert(s1("st_geometrytype(st_mpolyfromtext('MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)))'))") == "ST_MultiPolygon")
    assert(s1("st_geometrytype(st_geomcollfromtext('GEOMETRYCOLLECTION (POINT (1 1))'))") == "ST_GeometryCollection")
  }

  test("st_geometricmedian: center of a square, robust against an outlier") {
    assert(s1("st_astext(st_geometricmedian(st_geomfromtext('MULTIPOINT ((0 0), (2 0), (2 2), (0 2))')))")
      == "POINT (1 1)")
    // median of 3 cluster points + far outlier stays near the cluster
    // (unlike the centroid, which gets dragged a quarter of the way out)
    val mx = d1("st_x(st_geometricmedian(st_geomfromtext('MULTIPOINT ((0 0), (0 1), (1 0), (100 100))')))")
    assert(mx < 2.0, s"median x dragged to $mx")
    assert(d1("st_x(st_centroid(st_geomfromtext('MULTIPOINT ((0 0), (0 1), (1 0), (100 100))')))") > 25.0)
  }

  test("st_askml / st_asgml serialize points, polygons with holes, multis") {
    assert(s1("st_askml(st_point(1, 2))") == "<Point><coordinates>1,2</coordinates></Point>")
    assert(s1("st_asgml(st_point(1.5, 2))")
      == "<gml:Point><gml:coordinates>1.5,2</gml:coordinates></gml:Point>")
    val kml = s1("""st_askml(st_geomfromtext(
      'POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))'))""").toString
    assert(kml.startsWith("<Polygon><outerBoundaryIs>") && kml.contains("<innerBoundaryIs>"))
    assert(s1("st_askml(st_geomfromtext('MULTIPOINT ((0 0), (1 1))'))").toString
      .startsWith("<MultiGeometry><Point>"))
  }

  test("st_geomfromkml / st_geomfromgml round-trip the writer dialects") {
    for (wkt <- Seq("POINT (1 2)", "LINESTRING (0 0, 1 1, 2 0)",
        "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))",
        "MULTIPOINT ((0 0), (1 1))", "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))")) {
      assert(s1(s"st_astext(st_geomfromkml(st_askml(st_geomfromtext('$wkt'))))") == wkt,
        s"KML roundtrip of $wkt")
      assert(s1(s"st_astext(st_geomfromgml(st_asgml(st_geomfromtext('$wkt'))))") == wkt,
        s"GML roundtrip of $wkt")
    }
    // GML3 posList + exterior dialect
    assert(s1("""st_astext(st_geomfromgml(
      '<gml:Polygon><gml:exterior><gml:LinearRing><gml:posList>0 0 4 0 4 4 0 0</gml:posList></gml:LinearRing></gml:exterior></gml:Polygon>'))""")
      == "POLYGON ((0 0, 4 0, 4 4, 0 0))")
    // KML z ordinates come through
    assert(s1("""st_z(st_geomfromkml('<Point><coordinates>1,2,9</coordinates></Point>'))""") == 9.0)
    // DOCTYPE is rejected (XXE hardening)
    intercept[Exception] {
      s1("""st_astext(st_geomfromkml('<!DOCTYPE x [<!ENTITY e SYSTEM "file:///etc/passwd">]><Point><coordinates>1,2</coordinates></Point>'))""")
    }
  }

  test("st_linefrommultipoint connects points in order; NULL otherwise") {
    assert(s1("st_astext(st_linefrommultipoint(st_geomfromtext('MULTIPOINT ((0 0), (1 1), (2 0))')))")
      == "LINESTRING (0 0, 1 1, 2 0)")
    assert(isNull("st_linefrommultipoint(st_point(0, 0))"))
    assert(isNull("st_linefrommultipoint(st_geomfromtext('MULTIPOINT ((0 0))'))"))
  }

  test("st_distancespheroid: WGS84 Vincenty against known arcs") {
    // 1 degree along the equator on WGS84 = a * pi/180 exactly
    val eq = d1("st_distancespheroid(st_point(0,0), st_point(1,0))")
    assert(math.abs(eq - 6378137.0 * math.Pi / 180.0) < 1e-3, s"equator arc: $eq")
    // meridian quarter (equator to pole) = 10,001,965.729 m (standard value)
    val mq = d1("st_distancespheroid(st_point(0,0), st_point(0,90))")
    assert(math.abs(mq - 10001965.729) < 0.01, s"meridian quarter: $mq")
    // coincident and symmetric
    assert(d1("st_distancespheroid(st_point(10,20), st_point(10,20))") == 0.0)
    assert(d1("st_distancespheroid(st_point(10,20), st_point(30,40))") ==
      d1("st_distancespheroid(st_point(30,40), st_point(10,20))"))
    // ellipsoidal vs spherical: agree within 0.5%
    val sph = d1("st_distancesphere(st_point(10,20), st_point(30,40))")
    val ell = d1("st_distancespheroid(st_point(10,20), st_point(30,40))")
    assert(math.abs(sph - ell) / ell < 0.005)
  }

  test("st_shiftlongitude maps negative x into [180, 360)") {
    assert(s1("st_astext(st_shiftlongitude(st_point(-170, 10)))") == "POINT (190 10)")
    assert(s1("st_astext(st_shiftlongitude(st_point(170, 10)))") == "POINT (170 10)")
    assert(s1("st_astext(st_shiftlongitude(st_geomfromtext('LINESTRING (-1 0, 1 0)')))")
      == "LINESTRING (359 0, 1 0)")
  }

  test("st_setpoint replaces vertices with negative indexing; NULL out of range") {
    assert(s1("st_astext(st_setpoint(st_geomfromtext('LINESTRING (0 0, 1 1, 2 2)'), 1, st_point(9, 9)))")
      == "LINESTRING (0 0, 9 9, 2 2)")
    assert(s1("st_astext(st_setpoint(st_geomfromtext('LINESTRING (0 0, 1 1, 2 2)'), -1, st_point(5, 5)))")
      == "LINESTRING (0 0, 1 1, 5 5)")
    assert(isNull("st_setpoint(st_geomfromtext('LINESTRING (0 0, 1 1)'), 7, st_point(5, 5))"))
    assert(isNull("st_setpoint(st_point(0, 0), 0, st_point(5, 5))"))
  }
}
