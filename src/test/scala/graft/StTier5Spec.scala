package graft

class StTier5Spec extends SparkSpec {

  // ----- M-coordinate serde + accessors -----

  test("M round-trips through WKT and the WKB serde") {
    assert(sql1("SELECT st_astext(st_geomfromtext('POINT M(1 2 7)'))") == "POINT M(1 2 7)")
    assert(sql1("SELECT st_astext(st_geomfromtext('POINT ZM(1 2 3 7)'))") == "POINT ZM(1 2 3 7)")
    assert(sql1("SELECT st_m(st_geomfromtext('POINT M(1 2 7)'))") == 7.0)
    assert(sql1("SELECT st_m(st_point(1, 2))") == null)
    // WKB round trip keeps the measure
    assert(sql1("SELECT st_m(st_geomfromwkb(st_asbinary(st_makepointm(1, 2, 9.5))))") == 9.5)
    assert(sql1("SELECT st_astext(st_geomfromwkb(st_asewkb(st_pointzm(1, 2, 3, 4))))") == "POINT ZM(1 2 3 4)")
    // 2D and Z-only bytes are untouched by the M machinery
    assert(sql1("SELECT st_astext(st_geomfromwkb(st_asbinary(st_point(1, 2))))") == "POINT (1 2)")
    assert(sql1("SELECT st_astext(st_makepoint(1, 2, 3))") == "POINT Z(1 2 3)")
    assert(sql1("SELECT st_astext(st_makepoint(1, 2, 3, 4))") == "POINT ZM(1 2 3 4)")
  }

  test("hasm / mmin / mmax / ndims / zmflag / coorddim") {
    assert(sql1("SELECT st_hasm(st_makepointm(1, 2, 3))") == true)
    assert(sql1("SELECT st_hasm(st_point(1, 2))") == false)
    assert(sql1("SELECT st_mmin(st_geomfromtext('LINESTRING M (0 0 5, 1 0 2, 2 0 8)'))") == 2.0)
    assert(sql1("SELECT st_mmax(st_geomfromtext('LINESTRING M (0 0 5, 1 0 2, 2 0 8)'))") == 8.0)
    assert(sql1("SELECT st_mmin(st_point(0, 0))") == null)
    assert(sql1("SELECT st_ndims(st_point(1, 2))") == 2)
    assert(sql1("SELECT st_ndims(st_makepointm(1, 2, 3))") == 3)
    assert(sql1("SELECT st_ndims(st_pointzm(1, 2, 3, 4))") == 4)
    assert(sql1("SELECT st_coorddim(st_pointz(1, 2, 3))") == 3)
    assert(sql1("SELECT st_zmflag(st_point(1, 2))") == 0)
    assert(sql1("SELECT st_zmflag(st_makepointm(1, 2, 3))") == 1)
    assert(sql1("SELECT st_zmflag(st_pointz(1, 2, 3))") == 2)
    assert(sql1("SELECT st_zmflag(st_pointzm(1, 2, 3, 4))") == 3)
  }

  test("force3dm / force4d fill missing dims and keep existing values") {
    assert(sql1("SELECT st_astext(st_force3dm(st_point(1, 2), 5.0))") == "POINT M(1 2 5)")
    // existing M kept, Z dropped (PostGIS Force3DM)
    assert(sql1("SELECT st_astext(st_force3dm(st_geomfromtext('POINT M(1 2 7)'), 5.0))") == "POINT M(1 2 7)")
    assert(sql1("SELECT st_astext(st_force4d(st_point(1, 2), 3.0, 4.0))") == "POINT ZM(1 2 3 4)")
    assert(sql1("SELECT st_astext(st_force4d(st_pointz(1, 2, 9), 3.0, 4.0))") == "POINT ZM(1 2 9 4)")
    assert(sql1("SELECT st_astext(st_forcez(st_point(1, 2), 0.0))") == "POINT Z(1 2 0)")
  }

  // ----- linear referencing -----

  test("addmeasure interpolates by accumulated length") {
    val wkt = sql1(
      "SELECT st_astext(st_addmeasure(st_geomfromtext('LINESTRING (0 0, 4 0, 4 4)'), 10, 18))")
    assert(wkt == "LINESTRING M(0 0 10, 4 0 14, 4 4 18)")
    // multilinestring measures across the total length
    val multi = sql1(
      "SELECT st_astext(st_addmeasure(st_geomfromtext('MULTILINESTRING ((0 0, 2 0), (4 0, 6 0))'), 0, 4))")
    assert(multi == "MULTILINESTRING M((0 0 0, 2 0 2), (4 0 2, 6 0 4))")
  }

  test("locatealong finds vertex hits and segment crossings") {
    // vertex hit at M=14 is exactly (4, 0)
    assert(sql1(
      "SELECT st_astext(st_locatealong(st_addmeasure(st_geomfromtext('LINESTRING (0 0, 4 0, 4 4)'), 10, 18), 14))")
      == "MULTIPOINT M((4 0 14))")
    // M=12 crosses inside the first segment at (2, 0)
    assert(sql1(
      "SELECT st_astext(st_locatealong(st_addmeasure(st_geomfromtext('LINESTRING (0 0, 4 0, 4 4)'), 10, 18), 12))")
      == "MULTIPOINT M((2 0 12))")
    // out-of-range M matches nothing
    assert(sql1(
      "SELECT st_isempty(st_locatealong(st_addmeasure(st_geomfromtext('LINESTRING (0 0, 4 0)'), 0, 1), 5))")
      == true)
    // point passes through iff its measure matches
    assert(sql1("SELECT st_astext(st_locatealong(st_makepointm(3, 4, 7), 7))") == "MULTIPOINT M((3 4 7))")
    assert(sql1("SELECT st_isempty(st_locatealong(st_makepointm(3, 4, 7), 8))") == true)
  }

  test("interpolatepoint projects and interpolates the measure") {
    // nearest point to (2, 1) on the measured line is (2, 0): M = 10 + 2/8*8 = 12
    assert(sql1(
      "SELECT st_interpolatepoint(st_addmeasure(st_geomfromtext('LINESTRING (0 0, 4 0, 4 4)'), 10, 18), st_point(2, 1))")
      == 12.0)
    // beyond the end clamps to the last vertex's M
    assert(sql1(
      "SELECT st_interpolatepoint(st_addmeasure(st_geomfromtext('LINESTRING (0 0, 4 0)'), 0, 4), st_point(9, 0))")
      == 4.0)
    // a line without measures yields NULL
    assert(sql1(
      "SELECT st_interpolatepoint(st_geomfromtext('LINESTRING (0 0, 4 0)'), st_point(1, 1))") == null)
  }

  // ----- ring orientation -----

  test("ispolygoncw / ccw and the force family") {
    val cw = "'POLYGON ((0 0, 0 4, 4 4, 4 0, 0 0))'"   // clockwise shell
    val ccw = "'POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))'"  // counter-clockwise shell
    assert(sql1(s"SELECT st_ispolygoncw(st_geomfromtext($cw))") == true)
    assert(sql1(s"SELECT st_ispolygoncw(st_geomfromtext($ccw))") == false)
    assert(sql1(s"SELECT st_ispolygonccw(st_geomfromtext($ccw))") == true)
    // non-polygonal input is vacuously true both ways
    assert(sql1("SELECT st_ispolygoncw(st_point(1, 1))") == true)
    assert(sql1("SELECT st_ispolygonccw(st_point(1, 1))") == true)
    // force flips only what disagrees; area is preserved
    assert(sql1(s"SELECT st_ispolygoncw(st_forcepolygoncw(st_geomfromtext($ccw)))") == true)
    assert(sql1(s"SELECT st_ispolygonccw(st_forcepolygonccw(st_geomfromtext($cw)))") == true)
    assert(sql1(s"SELECT st_area(st_forcerhr(st_geomfromtext($ccw)))") == 16.0)
    // holes take the opposite orientation of the shell
    val holed = "'POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))'"
    assert(sql1(s"SELECT st_ispolygoncw(st_forcepolygoncw(st_geomfromtext($holed)))") == true)
    assert(sql1(s"SELECT st_area(st_forcepolygoncw(st_geomfromtext($holed)))") == 96.0)
  }

  // ----- misc parity -----

  test("iscollection / nrings / numinteriorring alias") {
    assert(sql1("SELECT st_iscollection(st_geomfromtext('MULTIPOINT ((0 0), (1 1))'))") == true)
    assert(sql1("SELECT st_iscollection(st_point(0, 0))") == false)
    assert(sql1("SELECT st_iscollection(st_geomfromtext('GEOMETRYCOLLECTION (POINT (0 0))'))") == true)
    val holed = "'POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))'"
    assert(sql1(s"SELECT st_nrings(st_geomfromtext($holed))") == 2)
    assert(sql1("SELECT st_nrings(st_geomfromtext('LINESTRING (0 0, 1 1)'))") == 0)
    assert(sql1(s"SELECT st_numinteriorring(st_geomfromtext($holed))") == 1)
  }

  test("removerepeatedpoints drops dups but keeps validity") {
    assert(sql1(
      "SELECT st_astext(st_removerepeatedpoints(st_geomfromtext('LINESTRING (0 0, 0 0, 1 1, 1 1, 2 2)')))")
      == "LINESTRING (0 0, 1 1, 2 2)")
    // tolerance-based removal
    assert(sql1(
      "SELECT st_numpoints(st_removerepeatedpoints(st_geomfromtext('LINESTRING (0 0, 0.05 0, 1 0, 1.04 0, 2 0)'), 0.1))")
      == 3)
    // ring keeps closure and validity
    assert(sql1(
      "SELECT st_astext(st_removerepeatedpoints(st_geomfromtext('POLYGON ((0 0, 0 0, 4 0, 4 4, 4 4, 0 4, 0 0))')))")
      == "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    // a line that would collapse keeps its original vertices
    assert(sql1(
      "SELECT st_numpoints(st_removerepeatedpoints(st_geomfromtext('LINESTRING (0 0, 0 0)')))") == 2)
  }

  test("crossesdateline and bestsrid") {
    assert(sql1("SELECT st_crossesdateline(st_geomfromtext('LINESTRING (179 0, -179 0)'))") == true)
    assert(sql1("SELECT st_crossesdateline(st_geomfromtext('LINESTRING (10 0, 20 0)'))") == false)
    assert(sql1("SELECT st_bestsrid(st_point(3.7, 48.5))") == 32631)   // UTM 31N
    assert(sql1("SELECT st_bestsrid(st_point(-122.3, 47.6))") == 32610) // UTM 10N
    assert(sql1("SELECT st_bestsrid(st_point(151.2, -33.9))") == 32756) // UTM 56S
    assert(sql1("SELECT st_bestsrid(st_point(0, 89))") == 32661)        // UPS North
    assert(sql1("SELECT st_bestsrid(st_point(0, -85))") == 32761)       // UPS South
  }

  test("rotatex / rotatey about the axes") {
    // rotate (0,1,0) about X by pi/2 -> (0, 0, 1)
    assert(sql1("SELECT st_astext(st_rotatex(st_point(0, 1), pi() / 2)) LIKE 'POINT Z(0 %'") == true)
    assert(math.abs(sql1("SELECT st_z(st_rotatex(st_pointz(0, 1, 0), pi() / 2))").asInstanceOf[Double] - 1.0) < 1e-12)
    assert(math.abs(sql1("SELECT st_y(st_rotatex(st_pointz(0, 1, 0), pi() / 2))").asInstanceOf[Double]) < 1e-12)
    // rotate (1,0,0) about Y by pi/2 -> (0, 0, -1)
    assert(math.abs(sql1("SELECT st_z(st_rotatey(st_pointz(1, 0, 0), pi() / 2))").asInstanceOf[Double] + 1.0) < 1e-12)
  }

  test("simplifypolygonhull reduces vertices and covers the input") {
    // concave polygon (notch at (5,2)): the outer hull fills concavities,
    // so it can actually drop vertices — a convex input returns unchanged
    val poly = "st_geomfromtext('POLYGON ((0 0, 10 0, 10 10, 6 3, 5 2, 4 3, 0 10, 0 0))')"
    assert(sql1(s"SELECT st_npoints(st_simplifypolygonhull($poly, 0.3)) < st_npoints($poly)") == true)
    assert(sql1(s"SELECT st_covers(st_simplifypolygonhull($poly, 0.3), $poly)") == true)
    // inner hull is covered by the input (convex corners shaved instead)
    assert(sql1(s"SELECT st_covers($poly, st_simplifypolygonhull($poly, 0.3, false))") == true)
  }

  test("isclosed / hexewkb / srid constructors / array makeline / degrees") {
    assert(sql1("SELECT st_isclosed(st_geomfromtext('LINESTRING (0 0, 1 0, 1 1, 0 0)'))") == true)
    assert(sql1("SELECT st_isclosed(st_geomfromtext('LINESTRING (0 0, 1 0)'))") == false)
    assert(sql1("SELECT st_isclosed(st_point(1, 1))") == true)
    assert(sql1("SELECT st_isclosed(st_geomfromtext('MULTILINESTRING ((0 0, 1 0, 0 0), (0 0, 2 2))'))") == false)
    // hex EWKB round-trips through unhex + st_geomfromwkb
    assert(sql1("SELECT st_astext(st_geomfromwkb(unhex(st_ashexewkb(st_point(1, 2)))))") == "POINT (1 2)")
    // optional-srid constructor forms
    assert(sql1("SELECT st_srid(st_geomfromtext('POINT (1 2)', 3857))") == 3857)
    assert(sql1("SELECT st_srid(st_geomfromwkb(st_asbinary(st_point(1, 2)), 2154))") == 2154)
    // typed WKB constructors: NULL on type mismatch
    assert(sql1("SELECT st_astext(st_pointfromwkb(st_asbinary(st_point(1, 2))))") == "POINT (1 2)")
    assert(sql1("SELECT st_pointfromwkb(st_asbinary(st_geomfromtext('LINESTRING (0 0, 1 1)')))") == null)
    assert(sql1("SELECT st_srid(st_linefromwkb(st_asbinary(st_geomfromtext('LINESTRING (0 0, 1 1)')), 27700))") == 27700)
    // array form of st_makeline
    assert(sql1("SELECT st_astext(st_makeline(array(st_point(0, 0), st_point(1, 1), st_point(2, 0))))")
      == "LINESTRING (0 0, 1 1, 2 0)")
    assert(sql1("SELECT st_astext(st_makeline(array(st_geomfromtext('LINESTRING (0 0, 1 0)'), st_point(2, 2))))")
      == "LINESTRING (0 0, 1 0, 2 2)")
    // array form of st_union: three overlapping squares dissolve to area 8
    assert(sql1("""SELECT st_area(st_union(array(
      st_makeenvelope(0, 0, 2, 2), st_makeenvelope(1, 0, 3, 2), st_makeenvelope(2, 0, 4, 2))))""")
      == 8.0)
    assert(sql1("SELECT st_area(st_union(st_makeenvelope(0,0,2,2), st_makeenvelope(1,0,3,2)))") == 6.0)
    assert(sql1("SELECT st_degrees(st_azimuth(st_point(0, 0), st_point(1, 0)))") == 90.0)
    assert(sql1("SELECT st_radians(180.0)") == math.Pi)
    assert(sql1("SELECT st_astext(st_force_2d(st_pointz(1, 2, 3)))") == "POINT (1 2)")
  }

  test("default-z force variants and scalar st_collect") {
    assert(sql1("SELECT st_astext(st_force3d(st_point(1, 2)))") == "POINT Z(1 2 0)")
    assert(sql1("SELECT st_astext(st_force3dz(st_point(1, 2)))") == "POINT Z(1 2 0)")
    assert(sql1("SELECT st_astext(st_force3dm(st_point(1, 2)))") == "POINT M(1 2 0)")
    assert(sql1("SELECT st_astext(st_force3d(st_point(1, 2), 7))") == "POINT Z(1 2 7)")
    assert(sql1("SELECT st_astext(st_collect(st_point(1, 2), st_point(3, 4)))")
      == "MULTIPOINT ((1 2), (3 4))")
    assert(sql1("SELECT st_geometrytype(st_collect(st_point(1, 2), st_geomfromtext('LINESTRING (0 0, 1 1)')))")
      == "ST_GeometryCollection")
    // 1-arg form still aggregates
    assert(sql1("SELECT st_astext(st_collect(g)) FROM (SELECT st_point(1, 1) AS g UNION ALL SELECT st_point(2, 2))")
      == "MULTIPOINT ((1 1), (2 2))")
  }

  test("st_translate dz and st_expand per-axis variants") {
    assert(sql1("SELECT st_astext(st_translate(st_pointz(1, 2, 3), 10, 20, 30))") == "POINT Z(11 22 33)")
    assert(sql1("SELECT st_astext(st_translate(st_point(1, 2), 10, 20))") == "POINT (11 22)")
    // dz on 2D geometry is a no-op on Z (stays 2D)
    assert(sql1("SELECT st_astext(st_translate(st_point(1, 2), 10, 20, 5))") == "POINT (11 22)")
    assert(sql1("SELECT st_astext(st_expand(st_makeenvelope(0, 0, 1, 1), 2, 3))")
      == "POLYGON ((-2 -3, 3 -3, 3 4, -2 4, -2 -3))")
    assert(sql1("SELECT st_area(st_expand(st_point(0, 0), 1))") == 4.0)
  }

  test("st_astext with maxdecimaldigits bounds the output decimals") {
    assert(sql1("SELECT st_astext(st_point(1.123456789, 2.987654321), 3)") == "POINT (1.123 2.988)")
    assert(sql1("SELECT st_astext(st_point(1.5, 2.5), 0)") == "POINT (2 2)") // half-even at scale 1
    assert(sql1("SELECT st_astext(st_point(1.25, 2.0))") == "POINT (1.25 2)") // 1-arg unchanged
    assert(sql1("SELECT st_astext(st_pointz(1.17, 2.0, 3.456), 1)") == "POINT Z(1.2 2 3.5)")
  }

  test("GeoJSON round-trips Z as the third position element") {
    assert(sql1("SELECT st_asgeojson(st_pointz(1, 2, 3))") == """{"type":"Point","coordinates":[1.0,2.0,3.0]}""")
    assert(sql1("""SELECT st_z(st_geomfromgeojson('{"type":"Point","coordinates":[1,2,3]}'))""") == 3.0)
    assert(sql1("""SELECT st_astext(st_geomfromgeojson(st_asgeojson(
      st_geomfromtext('LINESTRING Z(0 0 5, 1 1 6)'))))""") == "LINESTRING Z(0 0 5, 1 1 6)")
    // 2D output unchanged
    assert(sql1("SELECT st_asgeojson(st_point(1, 2))") == """{"type":"Point","coordinates":[1.0,2.0]}""")
  }

  test("st_polygon builds from a closed line with srid") {
    assert(sql1("SELECT st_area(st_polygon(st_geomfromtext('LINESTRING (0 0, 4 0, 4 4, 0 4, 0 0)'), 4326))") == 16.0)
    assert(sql1("SELECT st_srid(st_polygon(st_geomfromtext('LINESTRING (0 0, 4 0, 4 4, 0 4, 0 0)'), 3857))") == 3857)
  }

  test("st_union(array) of empty / all-NULL arrays returns NULL (PostGIS)") {
    assert(sql1("SELECT st_union(array())") == null)
    assert(sql1("SELECT st_union(array(CAST(NULL AS BINARY)))") == null)
    assert(sql1("SELECT st_union(array(CAST(NULL AS BINARY), CAST(NULL AS BINARY)))") == null)
    // one non-null survivor still unions fine
    assert(sql1("SELECT st_area(st_union(array(CAST(NULL AS BINARY), st_makeenvelope(0, 0, 2, 2))))") == 4.0)
  }

  test("st_union(collect_list) over a group of only NULL geometries is NULL") {
    // collect_list's output is non-nullable — exercises the codegen branch
    // where st_union(array) must surface its own NULL (not foldable, so
    // ConstantFolding cannot rescue it)
    import spark.implicits._
    Seq((1, Some("POINT (0 0)")), (1, Some("POINT (2 2)")), (2, None), (2, None))
      .toDF("k", "wkt").createOrReplaceTempView("union_groups")
    val rows = spark.sql(
      """SELECT k, st_astext(st_union(collect_list(st_geomfromtext(wkt)))) AS u
        |FROM union_groups GROUP BY k ORDER BY k""".stripMargin).collect()
    assert(rows(0).getString(1) == "MULTIPOINT ((0 0), (2 2))")
    assert(rows(1).isNullAt(1), "all-NULL group must union to NULL")
  }

  test("simplifypolygonhull rejects a non-boolean third argument at analysis time") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT st_simplifypolygonhull(st_makeenvelope(0, 0, 2, 2), 0.5, 1)").collect()
    }
    assert(e.getMessage.contains("BOOLEAN"), e.getMessage)
  }

  test("st_largestemptycircle finds the obstacle-free center as a radius line") {
    // four corner obstacles of a unit-100 square: the largest empty circle
    // centers at (50, 50) with radius 50*sqrt(2) (to any corner)
    val line = "st_largestemptycircle(st_geomfromtext('MULTIPOINT ((0 0), (100 0), (100 100), (0 100))'), 0.001)"
    val cx = sql1(s"SELECT st_x(st_startpoint($line))").asInstanceOf[Double]
    val cy = sql1(s"SELECT st_y(st_startpoint($line))").asInstanceOf[Double]
    val r = sql1(s"SELECT st_length($line)").asInstanceOf[Double]
    assert(math.abs(cx - 50) < 0.1 && math.abs(cy - 50) < 0.1, s"center ($cx, $cy)")
    assert(math.abs(r - 50 * math.sqrt(2)) < 0.1, s"radius $r")
  }

  test("st_sharedpaths splits shared linework by direction (PostGIS contract)") {
    // g2's first segment runs WITH g1, its second runs AGAINST g1
    val g1 = "st_geomfromtext('LINESTRING (0 0, 10 0, 10 10)')"
    val sameDir = "st_geomfromtext('LINESTRING (2 0, 8 0)')"
    val oppDir = "st_geomfromtext('LINESTRING (8 0, 2 0)')"
    assert(sql1(s"SELECT st_astext(st_geometryn(st_sharedpaths($g1, $sameDir), 1))") ==
      "MULTILINESTRING ((2 0, 8 0))")
    assert(sql1(s"SELECT st_astext(st_geometryn(st_sharedpaths($g1, $sameDir), 2))") ==
      "MULTILINESTRING EMPTY")
    assert(sql1(s"SELECT st_astext(st_geometryn(st_sharedpaths($g1, $oppDir), 1))") ==
      "MULTILINESTRING EMPTY")
    assert(sql1(s"SELECT st_astext(st_geometryn(st_sharedpaths($g1, $oppDir), 2))") ==
      "MULTILINESTRING ((2 0, 8 0))")
    // mixed directions in one input split between the two halves
    val mixed = "st_geomfromtext('MULTILINESTRING ((2 0, 8 0), (10 8, 10 2))')"
    assert(sql1(s"SELECT st_astext(st_geometryn(st_sharedpaths($g1, $mixed), 1))") ==
      "MULTILINESTRING ((2 0, 8 0))")
    assert(sql1(s"SELECT st_astext(st_geometryn(st_sharedpaths($g1, $mixed), 2))") ==
      "MULTILINESTRING ((10 2, 10 8))")
    // disjoint lines share nothing; non-lineal input is NULL
    assert(sql1(s"SELECT st_astext(st_sharedpaths($g1, st_geomfromtext('LINESTRING (50 50, 60 60)')))") ==
      "GEOMETRYCOLLECTION (MULTILINESTRING EMPTY, MULTILINESTRING EMPTY)")
    assert(sql1(s"SELECT st_sharedpaths($g1, st_point(1, 1))") == null)
  }
}
