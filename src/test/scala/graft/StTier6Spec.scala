package graft

import graft.functions.S2

/** Value checks for catalog tier 6 (StTier6Expressions): WGS84-spheroid
  * measures, validity detail, 3-D interpolation, segment decomposition,
  * geohash cell polygons, and the S2 cell family. */
class StTier6Spec extends SparkSpec {

  private def s1(sql: String): Any = spark.sql(s"SELECT $sql").head.get(0)
  private def d1(sql: String): Double = s1(sql).asInstanceOf[Double]

  // ----- spheroid geodesy -----

  test("st_lengthspheroid: published arc lengths and consistency with st_distancespheroid") {
    // one degree along the equator is exactly a * pi/180 on the ellipsoid
    val eq = d1("st_lengthspheroid(st_geomfromtext('LINESTRING (10 0, 11 0)'))")
    assert(math.abs(eq - 6378137.0 * math.Pi / 180.0) < 1e-5, s"equator arc $eq")
    // published WGS84 meridian arcs: ~110574.3 m at the equator,
    // ~111693.9 m at the pole (flattening stretches high latitudes)
    val m0 = d1("st_lengthspheroid(st_geomfromtext('LINESTRING (0 0, 0 1)'))")
    val m89 = d1("st_lengthspheroid(st_geomfromtext('LINESTRING (0 89, 0 90)'))")
    assert(math.abs(m0 - 110574.3) < 1.0, s"meridian arc at equator $m0")
    assert(math.abs(m89 - 111693.9) < 1.0, s"meridian arc at pole $m89")
    // a polyline sums its per-segment geodesics
    val two = d1("st_lengthspheroid(st_geomfromtext('LINESTRING (0 0, 1 1, 2 0)'))")
    val parts = d1("st_distancespheroid(st_point(0,0), st_point(1,1)) + st_distancespheroid(st_point(1,1), st_point(2,0))")
    assert(two == parts)
    // points contribute zero; sphere and spheroid agree to ~0.5%
    assert(d1("st_lengthspheroid(st_point(1, 2))") == 0.0)
    // polygons measure their boundary rings (Sedona/PostGIS contract):
    // a closed 1-degree meridian sliver = 2 meridian arcs + 2 tiny
    // parallels; must equal the same ring measured as a LineString
    val polyLen = d1("st_lengthspheroid(st_geomfromtext(" +
      "'POLYGON ((0 0, 0.01 0, 0.01 1, 0 1, 0 0))'))")
    val ringLen = d1("st_lengthspheroid(st_geomfromtext(" +
      "'LINESTRING (0 0, 0.01 0, 0.01 1, 0 1, 0 0)'))")
    assert(polyLen == ringLen && polyLen > 2 * 110574.0, s"polygon ring length $polyLen")
    // nested collections measure their linework (recursive walk): a
    // MultiLineString INSIDE a GeometryCollection must not read as 0
    val nested = d1("st_lengthspheroid(st_geomfromtext(" +
      "'GEOMETRYCOLLECTION (MULTILINESTRING ((0 0, 0 1)), POINT (5 5))'))")
    assert(math.abs(nested - m0) < 1e-9, s"nested collection length $nested vs $m0")
    assert(d1("st_areaspheroid(st_geomfromtext(" +
      "'GEOMETRYCOLLECTION (MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0))))'))") ==
      d1("st_areaspheroid(st_makeenvelope(0, 0, 1, 1))"))
    val sph = d1("st_lengthsphere(st_geomfromtext('LINESTRING (10 40, 11 41)'))")
    val ell = d1("st_lengthspheroid(st_geomfromtext('LINESTRING (10 40, 11 41)'))")
    assert(math.abs(ell / sph - 1.0) < 0.005, s"sphere $sph vs spheroid $ell")
  }

  test("st_areaspheroid: WGS84 globe area anchor, holes, and sphere consistency") {
    // whole-globe rectangle = published WGS84 surface area 510,065,621.7 km^2
    val globe = d1("st_areaspheroid(st_makeenvelope(-180, -90, 180, 90))")
    assert(math.abs(globe - 5.100656217e14) < 1e9, s"globe area $globe")
    // hemisphere halves it exactly (band formula is antisymmetric in lat)
    val north = d1("st_areaspheroid(st_makeenvelope(-180, 0, 180, 90))")
    assert(math.abs(north - globe / 2.0) < 1.0, s"north $north vs globe/2 ${globe / 2}")
    // holes subtract
    val outer = d1("st_areaspheroid(st_makeenvelope(0, 0, 10, 10))")
    val holed = d1("""st_areaspheroid(st_geomfromtext(
      'POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))'))""")
    val hole = d1("st_areaspheroid(st_makeenvelope(2, 2, 4, 4))")
    assert(math.abs(holed - (outer - hole)) < 1.0)
    // near the sphere: within 0.7% of the Chamberlain-Duquette sphere value
    val s = d1("st_areasphere(st_makeenvelope(10, 40, 11, 41))")
    val e = d1("st_areaspheroid(st_makeenvelope(10, 40, 11, 41))")
    assert(math.abs(e / s - 1.0) < 0.007, s"sphere $s vs spheroid $e")
    // non-polygon components contribute zero
    assert(d1("st_areaspheroid(st_geomfromtext('LINESTRING (0 0, 1 1)'))") == 0.0)
  }

  // ----- validity detail -----

  test("st_isvaliddetail: valid -> (true, NULL, NULL); bowtie -> reason + crossing point") {
    val ok = spark.sql("SELECT st_isvaliddetail(st_makeenvelope(0,0,1,1)) AS d")
      .selectExpr("d.valid", "d.reason", "d.location").head
    assert(ok.getBoolean(0) && ok.isNullAt(1) && ok.isNullAt(2))
    val bad = spark.sql(
      "SELECT st_isvaliddetail(st_geomfromtext('POLYGON ((0 0, 4 0, 0 4, 4 4, 0 0))')) AS d")
      .selectExpr("d.valid", "d.reason", "st_x(d.location)", "st_y(d.location)").head
    assert(!bad.getBoolean(0))
    assert(bad.getString(1) == "Self-intersection")
    assert(bad.getDouble(2) == 2.0 && bad.getDouble(3) == 2.0)
  }

  // ----- 3-D interpolation -----

  test("st_3dlineinterpolatepoint interpolates Z and walks multi-segment lines by 3-D length") {
    assert(s1("st_astext(st_3dlineinterpolatepoint(st_geomfromtext('LINESTRING Z (0 0 0, 10 0 10)'), 0.25))")
      == "POINT Z(2.5 0 2.5)")
    // two segments of equal 3-D length: f=0.75 lands mid-second-segment
    assert(s1("st_astext(st_3dlineinterpolatepoint(st_geomfromtext('LINESTRING Z (0 0 0, 3 0 4, 6 0 8)'), 0.75))")
      == "POINT Z(4.5 0 6)")
    // the 2-D variant ignores Z, so the same fraction lands elsewhere when
    // Z dominates a segment: 3-D length weights (5, 13) vs 2-D (3, 12)
    val p3 = s1("st_astext(st_3dlineinterpolatepoint(st_geomfromtext('LINESTRING Z (0 0 0, 3 0 4, 15 0 9)'), 0.5))")
    val p2 = s1("st_astext(st_lineinterpolatepoint(st_geomfromtext('LINESTRING Z (0 0 0, 3 0 4, 15 0 9)'), 0.5))")
    assert(p3 != p2, s"3-D $p3 should differ from 2-D $p2")
    // no Z -> Z=0 plane; fractions clamp; zero-length line -> first point
    assert(s1("st_astext(st_3dlineinterpolatepoint(st_geomfromtext('LINESTRING (0 0, 4 0)'), 0.5))")
      == "POINT Z(2 0 0)")
    assert(s1("st_astext(st_3dlineinterpolatepoint(st_geomfromtext('LINESTRING Z (0 0 0, 10 0 0)'), 2.0))")
      == "POINT Z(10 0 0)")
    assert(s1("st_astext(st_3dlineinterpolatepoint(st_geomfromtext('LINESTRING Z (5 5 5, 5 5 5)'), 0.5))")
      == "POINT Z(5 5 5)")
  }

  // ----- segment decomposition -----

  test("st_linesegments: ordered 2-point pieces; multilines concatenate; non-lines are NULL") {
    val segs = spark.sql(
      """SELECT transform(st_linesegments(st_geomfromtext('LINESTRING (0 0, 1 0, 1 1, 0 1)')),
        |                 s -> st_astext(s)) AS t""".stripMargin).head.getSeq[String](0)
    assert(segs == Seq("LINESTRING (0 0, 1 0)", "LINESTRING (1 0, 1 1)", "LINESTRING (1 1, 0 1)"))
    val multi = spark.sql(
      """SELECT transform(st_linesegments(st_geomfromtext(
        |  'MULTILINESTRING ((0 0, 1 0, 2 0), (5 5, 6 6))')), s -> st_astext(s)) AS t""".stripMargin)
      .head.getSeq[String](0)
    assert(multi == Seq("LINESTRING (0 0, 1 0)", "LINESTRING (1 0, 2 0)", "LINESTRING (5 5, 6 6)"))
    assert(spark.sql("SELECT st_linesegments(st_point(1, 2))").head.isNullAt(0))
    assert(spark.sql("SELECT st_linesegments(st_makeenvelope(0,0,1,1))").head.isNullAt(0))
  }

  // ----- geohash cells -----

  test("st_geomfromgeohash: bounds polygon round-trips the encoder; precision truncates") {
    // the cell of a point's own geohash contains the point
    assert(s1("st_contains(st_geomfromgeohash(st_geohash(st_point(10.3, 20.7), 6)), st_point(10.3, 20.7))") == true)
    // precision-p cell widths: 360/2^ceil(5p/2) x 180/2^floor(5p/2)
    val w2 = d1("st_xmax(g) - st_xmin(g)" +
      " FROM (SELECT st_geomfromgeohash(st_geohash(st_point(5.0, 5.0), 2)) AS g)")
    val h2 = d1("st_ymax(g) - st_ymin(g)" +
      " FROM (SELECT st_geomfromgeohash(st_geohash(st_point(5.0, 5.0), 2)) AS g)")
    assert(w2 == 360.0 / 32.0 && h2 == 180.0 / 32.0, s"precision-2 cell $w2 x $h2")
    // explicit precision argument truncates the hash first: same cell as
    // encoding at the lower precision directly
    assert(s1("st_astext(st_geomfromgeohash(st_geohash(st_point(10.3, 20.7), 8), 3))") ==
      s1("st_astext(st_geomfromgeohash(st_geohash(st_point(10.3, 20.7), 3)))"))
    // center of the bounds = st_pointfromgeohash
    assert(s1("st_astext(st_centroid(st_geomfromgeohash(st_geohash(st_point(10.3, 20.7), 5))))") ==
      s1("st_astext(st_pointfromgeohash(st_geohash(st_point(10.3, 20.7), 5)))"))
  }

  // ----- S2 cells -----

  test("S2 core: face selection, level-0 ids, round trips, parent containment") {
    // face centers: +x, +y, +z, -x, -y, -z
    assert(S2.cellAt(0, 0, 0) == (0L << 61 | 1L << 60))
    assert(S2.cellAt(90, 0, 0) == (1L << 61 | 1L << 60))
    assert(S2.cellAt(0, 90, 0) == (2L << 61 | 1L << 60))
    assert(S2.cellAt(180, 0, 0) == (3L << 61 | 1L << 60))
    assert(S2.cellAt(-90, 0, 0) == (4L << 61 | 1L << 60))
    assert(S2.cellAt(0, -90, 0) == (5L << 61 | 1L << 60))
    // decode inverts fromFaceIj at several resolutions
    for ((f, i, j) <- Seq((0, 0, 0), (2, 12345, 67890), (5, (1 << 30) - 1, 1))) {
      val id = S2.fromFaceIj(f, i, j)
      assert(S2.level(id) == 30)
      assert(S2.decode(id) == ((f, 30, i, j)))
    }
    // parent at level l == cellAt level l directly, for a spread of levels
    for (lvl <- Seq(0, 1, 5, 12, 20, 29)) {
      val leaf = S2.leafFromLonLat(13.37, 52.52)
      assert(S2.parent(leaf, lvl) == S2.cellAt(13.37, 52.52, lvl), s"level $lvl")
      assert(S2.level(S2.parent(leaf, lvl)) == lvl)
    }
    // a cell's corner quad surrounds its own center point (interior cell)
    val id = S2.cellAt(10.0, 20.0, 8)
    val cs = S2.corners(id)
    val lons = cs.map(_._1); val lats = cs.map(_._2)
    assert(lons.min < 10.0 && 10.0 < lons.max && lats.min < 20.0 && 20.0 < lats.max)
  }

  test("S2 neighbors: 8 distinct same-level cells, symmetric, face-wrapping") {
    val id = S2.cellAt(10.0, 20.0, 10)
    val ns = for (di <- -1 to 1; dj <- -1 to 1 if di != 0 || dj != 0)
      yield S2.neighbor(id, di, dj)
    assert(ns.distinct.size == 8 && !ns.contains(id))
    ns.foreach(n => assert(S2.level(n) == 10))
    // direct neighbors are mutual
    val right = S2.neighbor(id, 1, 0)
    assert((-1 to 1).flatMap(di => (-1 to 1).map(dj => S2.neighbor(right, di, dj))).contains(id))
    // a cell at the +x/+y face seam: neighbors include a face-1 cell
    val seam = S2.cellAt(44.9999, 0.0, 10)
    val seamNs = for (di <- -1 to 1; dj <- -1 to 1 if di != 0 || dj != 0)
      yield S2.neighbor(seam, di, dj)
    assert(seamNs.exists(n => (n >>> 61) != (seam >>> 61)), "no cross-face neighbor found")
  }

  test("st_s2cellids: point -> exactly its cell; polygon cover is a join-safe superset") {
    val row = spark.sql("SELECT st_s2cellids(st_point(10, 20), 12) AS c").head.getSeq[Long](0)
    assert(row == Seq(S2.cellAt(10.0, 20.0, 12)))
    // every sampled interior point's cell appears in the polygon's cover
    val cover = spark.sql(
      "SELECT st_s2cellids(st_makeenvelope(10, 20, 12, 22), 8) AS c").head.getSeq[Long](0).toSet
    for (a <- 0 to 8; b <- 0 to 8) {
      val lon = 10.0 + a * 0.25; val lat = 20.0 + b * 0.25
      assert(cover.contains(S2.cellAt(lon, lat, 8)), s"missing cell of ($lon, $lat)")
    }
    // the join contract: overlapping geometries share a cell at the same level
    val other = spark.sql(
      "SELECT st_s2cellids(st_makeenvelope(11.9, 21.9, 14, 24), 8) AS c").head.getSeq[Long](0).toSet
    assert(cover.intersect(other).nonEmpty)
    // cover is sorted and duplicate-free (stable join keys)
    val arr = cover.toSeq
    val again = spark.sql(
      "SELECT st_s2cellids(st_makeenvelope(10, 20, 12, 22), 8) AS c").head.getSeq[Long](0)
    assert(again == again.sorted && again.distinct == again)
    assert(arr.size == again.size)
    // budget guard: absurd level over a global envelope fails loudly
    val err = intercept[Exception] {
      spark.sql("SELECT st_s2cellids(st_makeenvelope(-180, -90, 180, 90), 20) AS c").head
    }
    assert(err.getMessage != null)
  }

  test("st_labelpoint: inside guarantee, largest component, centroid shortcut") {
    // centroid of a convex polygon passes the goodness test -> centroid
    assert(s1("st_astext(st_labelpoint(st_makeenvelope(0, 0, 4, 2)))") == "POINT (2 1)")
    // C-shaped polygon: centroid falls in the notch, so the pole of
    // inaccessibility is used — always strictly inside
    val c = "POLYGON ((0 0, 5 0, 5 1, 1 1, 1 4, 5 4, 5 5, 0 5, 0 0))"
    assert(s1(s"st_within(st_labelpoint(st_geomfromtext('$c')), st_geomfromtext('$c'))") == true)
    assert(s1(s"st_contains(st_geomfromtext('$c'), st_centroid(st_geomfromtext('$c')))") == false)
    // MultiPolygon labels its largest-area component
    val mp = "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((10 10, 30 10, 30 30, 10 30, 10 10)))"
    assert(s1(s"st_x(st_labelpoint(st_geomfromtext('$mp')))") == 20.0)
    // threshold 0 always accepts an interior centroid; resolution tightens the pole
    assert(s1(s"st_within(st_labelpoint(st_geomfromtext('$c'), 8, 0.9), st_geomfromtext('$c'))") == true)
    // non-areal input is a loud error
    val err = intercept[Exception] { spark.sql("SELECT st_labelpoint(st_point(1, 2))").head }
    assert(err.getMessage.contains("polygonal"))
  }

  test("sedona-name aliases: st_length2d / st_perimeter2d / st_precisionreduce") {
    assert(d1("st_length2d(st_geomfromtext('LINESTRING (0 0, 3 4)'))") == 5.0)
    assert(d1("st_perimeter2d(st_makeenvelope(0, 0, 2, 1))") == 6.0)
    assert(s1("st_astext(st_precisionreduce(st_point(1.26, 5.61), 0.5))") ==
      s1("st_astext(st_reduceprecision(st_point(1.26, 5.61), 0.5))"))
  }

  test("st_s2togeom: one quad per id, parallel order, centers round-trip") {
    val df = spark.sql(
      """SELECT c, st_s2togeom(c) AS g FROM (SELECT st_s2cellids(st_makeenvelope(10, 20, 11, 21), 6) AS c)""")
    val row = df.selectExpr("size(c)", "size(g)").head
    assert(row.getInt(0) == row.getInt(1) && row.getInt(0) > 0)
    // each quad's centroid maps back to its own cell id
    val pairs = df.selectExpr("arrays_zip(c, g) AS z").selectExpr("explode(z) AS e")
      .selectExpr("e.c", "st_x(st_centroid(e.g))", "st_y(st_centroid(e.g))").collect()
    pairs.foreach { r =>
      assert(S2.cellAt(r.getDouble(1), r.getDouble(2), 6) == r.getLong(0))
    }
  }
}
