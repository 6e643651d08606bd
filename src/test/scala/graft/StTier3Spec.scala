package graft

/** Value checks for catalog tier 3 (StTier3Expressions): DE-9IM, linework
  * assembly, connecting lines, triangulation, split/subdivide, styled
  * buffers, and the Z family. */
class StTier3Spec extends SparkSpec {

  private def s1(sql: String): Any = spark.sql(s"SELECT $sql").head.get(0)
  private def d1(sql: String): Double = s1(sql).asInstanceOf[Double]

  test("st_relate produces the DE-9IM matrix; st_relatematch applies patterns") {
    // point strictly inside a polygon: classic 0FFFFF212
    assert(s1("st_relate(st_point(1,1), st_makeenvelope(0,0,2,2))") == "0FFFFF212")
    assert(s1("st_relatematch('0FFFFF212', 'T*F**F***')") == true) // within pattern
    assert(s1("st_relatematch('0FFFFF212', 'FF*FF****')") == false) // disjoint pattern
    // symmetric: equals pattern on identical envelopes
    assert(s1("st_relatematch(st_relate(st_makeenvelope(0,0,1,1), st_makeenvelope(0,0,1,1)), 'T*F**FFF*')") == true)
  }

  test("validity diagnostics: reason text and minimum clearance") {
    assert(s1("st_isvalidreason(st_makeenvelope(0,0,1,1))") == "Valid Geometry")
    val bowtie = "st_geomfromtext('POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0))')"
    assert(s1(s"st_isvalidreason($bowtie)").toString.contains("Self-intersection"))
    // min clearance of a 1x2 rectangle is the short side
    assert(d1("st_minimumclearance(st_makeenvelope(0,0,1,2))") == 1.0)
    assert(d1("st_length(st_minimumclearanceline(st_makeenvelope(0,0,1,2)))") == 1.0)
  }

  test("linework assembly: polygonize / buildarea / node / unaryunion") {
    // two crossing lines node into 4 pieces
    assert(s1("st_numgeometries(st_node(st_geomfromtext('MULTILINESTRING ((0 0, 2 2), (0 2, 2 0))')))") == 4)
    // a closed ring polygonizes to exactly its polygon
    assert(s1("st_numgeometries(st_polygonize(st_boundary(st_makeenvelope(0,0,3,3))))") == 1)
    assert(d1("st_area(st_buildarea(st_boundary(st_makeenvelope(0,0,3,3))))") == 9.0)
    // buildarea on non-closing linework is NULL
    assert(spark.sql("SELECT st_buildarea(st_geomfromtext('LINESTRING (0 0, 1 1)'))").head.isNullAt(0))
    // union of two overlapping unit-offset squares: area 4 + 4 - 1
    assert(d1("st_area(st_unaryunion(st_geomfromtext('MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((1 1, 3 1, 3 3, 1 3, 1 1)))')))") == 7.0)
  }

  test("shortest/longest connecting lines and max distance") {
    // gap between [0,1] and [4,5] squares is 3, along y-aligned edges
    assert(d1("st_length(st_shortestline(st_makeenvelope(0,0,1,1), st_makeenvelope(4,0,5,1)))") == 3.0)
    // farthest corners: (0,0)..(5,1) => sqrt(26)
    assert(math.abs(d1("st_maxdistance(st_makeenvelope(0,0,1,1), st_makeenvelope(4,0,5,1))") - math.sqrt(26.0)) < 1e-12)
    assert(math.abs(d1("st_length(st_longestline(st_makeenvelope(0,0,1,1), st_makeenvelope(4,0,5,1)))") - math.sqrt(26.0)) < 1e-12)
    // consistency: shortestline length == st_distance
    assert(d1("st_length(st_shortestline(st_point(0,0), st_makeenvelope(3,4,5,6)))") ==
      d1("st_distance(st_point(0,0), st_makeenvelope(3,4,5,6))"))
  }

  test("segmentize adds vertices; offsetcurve and simplifyvw reshape lines") {
    // 10-long line, max segment 2.5 -> 4 segments, 5 points
    assert(s1("st_npoints(st_segmentize(st_geomfromtext('LINESTRING (0 0, 10 0)'), 2.5))") == 5)
    // offset of a straight line keeps its length and shifts y
    assert(d1("st_length(st_offsetcurve(st_geomfromtext('LINESTRING (0 0, 10 0)'), 1.0))") == 10.0)
    assert(d1("st_ymin(st_offsetcurve(st_geomfromtext('LINESTRING (0 0, 10 0)'), 1.0))") == 1.0)
    // VW drops the near-collinear vertex but keeps the sharp one
    assert(s1("st_npoints(st_simplifyvw(st_geomfromtext('LINESTRING (0 0, 1 0.01, 2 0, 4 4)'), 0.5))") == 3)
  }

  test("triangulations and inscribed circle") {
    // a square triangulates into 2 triangles (constrained)
    assert(s1("st_numgeometries(st_triangulatepolygon(st_makeenvelope(0,0,2,2)))") == 2)
    // triangles partition the square: areas sum to 4
    assert(d1("""aggregate(transform(st_dump(st_triangulatepolygon(st_makeenvelope(0,0,2,2))), g -> st_area(g)),
                 0.0D, (acc, x) -> acc + x)""") == 4.0)
    // Delaunay over the 4 corners: 2 triangles
    assert(s1("st_numgeometries(st_delaunaytriangles(st_points(st_makeenvelope(0,0,2,2))))") == 2)
    // Voronoi of 2 sites: 2 cells
    assert(s1("st_numgeometries(st_voronoipolygons(st_geomfromtext('MULTIPOINT ((0 0), (4 0))')))") == 2)
    // inscribed circle of a 2x2 square: center (1,1), radius ~1
    assert(s1("st_astext(st_maximuminscribedcircle(st_makeenvelope(0,0,2,2)))") == "POINT (1 1)")
    assert(math.abs(d1("st_maximuminscribedradius(st_makeenvelope(0,0,2,2))") - 1.0) < 0.01)
  }

  test("split: lines at points/crossings, polygons along line blades") {
    assert(s1("st_numgeometries(st_split(st_geomfromtext('LINESTRING (0 0, 2 0)'), st_point(1, 0)))") == 2)
    // crossing blade splits the line into 2; blade pieces are NOT returned
    val pieces = spark.sql(
      """SELECT st_dump(st_split(st_geomfromtext('LINESTRING (0 0, 2 2)'),
                                 st_geomfromtext('LINESTRING (0 2, 2 0)')))""").head.getSeq[Array[Byte]](0)
    assert(pieces.length == 2)
    // polygon cut by a vertical line: two 1x2 halves
    val halves = spark.sql(
      """SELECT transform(st_dump(st_split(st_makeenvelope(0,0,2,2),
                                           st_geomfromtext('LINESTRING (1 -1, 1 3)'))), g -> st_area(g))""")
      .head.getSeq[Double](0)
    assert(halves.sorted == Seq(2.0, 2.0), s"got $halves")
  }

  test("subdivide bounds vertices per piece and preserves covered area") {
    val q = """st_subdivide(st_buffer(st_point(0, 0), 10.0), 16)"""
    val ns = spark.sql(s"SELECT transform($q, g -> st_npoints(g))").head.getSeq[Int](0)
    assert(ns.length > 1, "a 32-gon buffer must split under maxVertices=16")
    assert(ns.forall(_ <= 16 + 4), s"pieces stay near the vertex budget, got $ns") // clips add corner vertices
    val areaSum = spark.sql(s"SELECT aggregate(transform($q, g -> st_area(g)), 0.0D, (a, x) -> a + x)")
      .head.getDouble(0)
    val full = d1("st_area(st_buffer(st_point(0, 0), 10.0))")
    assert(math.abs(areaSum - full) < 1e-6, s"pieces must tile the input: $areaSum vs $full")
  }

  test("generatepoints is seeded-deterministic and stays inside") {
    val a = spark.sql("SELECT st_astext(st_generatepoints(st_makeenvelope(0,0,2,2), 10, 42))").head.getString(0)
    val b = spark.sql("SELECT st_astext(st_generatepoints(st_makeenvelope(0,0,2,2), 10, 42))").head.getString(0)
    assert(a == b, "same seed, same points")
    val c = spark.sql("SELECT st_astext(st_generatepoints(st_makeenvelope(0,0,2,2), 10, 43))").head.getString(0)
    assert(a != c, "different seed, different points")
    assert(s1("st_within(st_generatepoints(st_makeenvelope(0,0,2,2), 10, 42), st_makeenvelope(0,0,2,2))") == true)
  }

  test("styled buffers: flat endcaps drop the round caps") {
    // flat-capped buffer of a 10-line at distance 1: exactly the 10x2 rectangle
    assert(d1("st_area(st_bufferstyle(st_geomfromtext('LINESTRING (0 0, 10 0)'), 1.0, 'endcap=flat'))") == 20.0)
    // square caps extend by the distance on both ends: 12x2
    assert(d1("st_area(st_bufferstyle(st_geomfromtext('LINESTRING (0 0, 10 0)'), 1.0, 'endcap=square'))") == 24.0)
    // single-sided: only one side of the line
    assert(d1("st_area(st_bufferstyle(st_geomfromtext('LINESTRING (0 0, 10 0)'), 1.0, 'side=left endcap=flat'))") == 10.0)
    assert(d1("st_ymax(st_bufferstyle(st_geomfromtext('LINESTRING (0 0, 10 0)'), 1.0, 'side=right endcap=flat'))") == 0.0)
    intercept[Exception](s1("st_bufferstyle(st_point(0,0), 1.0, 'endcap=banana')"))
  }

  test("Z family: makepointz/z/zmin/zmax/hasz/ndims/zmflag/force3d/3ddistance round-trip WKB") {
    assert(s1("st_astext(st_makepointz(1, 2, 3))") == "POINT Z(1 2 3)" ||
      s1("st_astext(st_makepointz(1, 2, 3))") == "POINT Z (1 2 3)")
    assert(d1("st_z(st_makepointz(1, 2, 3))") == 3.0)
    assert(spark.sql("SELECT st_z(st_point(1, 2))").head.isNullAt(0), "2D point has no Z")
    assert(s1("st_hasz(st_makepointz(1, 2, 3))") == true)
    assert(s1("st_hasz(st_point(1, 2))") == false)
    assert(s1("st_ndims(st_makepointz(1, 2, 3))") == 3)
    assert(s1("st_ndims(st_point(1, 2))") == 2)
    assert(s1("st_zmflag(st_makepointz(1, 2, 3))") == 2)
    assert(s1("st_zmflag(st_point(1, 2))") == 0)
    // force3d then read back extremes — proves Z survives WKB serde
    assert(d1("st_zmin(st_force3d(st_geomfromtext('LINESTRING (0 0, 1 1)'), 7.0))") == 7.0)
    assert(d1("st_zmax(st_force3d(st_geomfromtext('LINESTRING (0 0, 1 1)'), 7.0))") == 7.0)
    // 3D WKT parses and keeps Z through a full parse->wkb->accessor chain
    assert(d1("st_z(st_geomfromtext('POINT Z (1 2 9)'))") == 9.0)
    // 3-4-12 box: 3D distance 13
    assert(d1("st_3ddistance(st_makepointz(0, 0, 0), st_makepointz(3, 4, 12))") == 13.0)
    // 2D fallback agrees with st_distance
    assert(d1("st_3ddistance(st_point(0, 0), st_point(3, 4))") == 5.0)
    // force2d strips Z again
    assert(s1("st_hasz(st_force2d(st_makepointz(1, 2, 3)))") == false)
  }
}
