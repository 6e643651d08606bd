package graft

import graft.functions.GraftFunctions

class CatalogCoverageSpec extends SparkSpec {

  /** Every catalog function, invoked through SQL with type-correct args. */
  private val invocations: Map[String, String] = Map(
    "st_point" -> "st_astext(st_point(1, 2))",
    "st_makepoint" -> "st_astext(st_makepoint(1, 2))",
    "st_polygonfromenvelope" -> "st_area(st_polygonfromenvelope(0,0,2,2))",
    "st_makeenvelope" -> "st_area(st_makeenvelope(0,0,2,2))",
    "st_geomfromtext" -> "st_astext(st_geomfromtext('POINT (1 2)'))",
    "st_geomfromwkt" -> "st_astext(st_geomfromwkt('POINT (1 2)'))",
    "st_geomfromwkb" -> "st_astext(st_geomfromwkb(st_asbinary(st_point(1,2))))",
    "st_astext" -> "st_astext(st_point(1,2))",
    "st_asgeojson" -> "st_asgeojson(st_point(1,2))",
    "st_asbinary" -> "length(st_asbinary(st_point(1,2)))",
    "st_x" -> "st_x(st_point(1,2))",
    "st_y" -> "st_y(st_point(1,2))",
    "st_xmin" -> "st_xmin(st_makeenvelope(1,2,3,4))",
    "st_ymin" -> "st_ymin(st_makeenvelope(1,2,3,4))",
    "st_xmax" -> "st_xmax(st_makeenvelope(1,2,3,4))",
    "st_ymax" -> "st_ymax(st_makeenvelope(1,2,3,4))",
    "st_area" -> "st_area(st_makeenvelope(0,0,1,1))",
    "st_length" -> "st_length(st_geomfromtext('LINESTRING (0 0, 1 0)'))",
    "st_perimeter" -> "st_perimeter(st_makeenvelope(0,0,1,1))",
    "st_distance" -> "st_distance(st_point(0,0), st_point(1,0))",
    "st_centroid" -> "st_astext(st_centroid(st_makeenvelope(0,0,2,2)))",
    "st_envelope" -> "st_astext(st_envelope(st_geomfromtext('LINESTRING (0 0, 2 3)')))",
    "st_boundary" -> "st_astext(st_boundary(st_makeenvelope(0,0,1,1)))",
    "st_geometrytype" -> "st_geometrytype(st_point(1,2))",
    "st_numpoints" -> "st_numpoints(st_geomfromtext('LINESTRING (0 0, 1 1)'))",
    "st_numgeometries" -> "st_numgeometries(st_geomfromtext('MULTIPOINT ((1 1), (2 2))'))",
    "st_isempty" -> "st_isempty(st_geomfromtext('POLYGON EMPTY'))",
    "st_isvalid" -> "st_isvalid(st_makeenvelope(0,0,1,1))",
    "st_srid" -> "st_srid(st_setsrid(st_point(1,2), 3857))",
    "st_setsrid" -> "st_srid(st_setsrid(st_point(1,2), 3857))",
    "st_normalize" -> "st_astext(st_normalize(st_geomfromtext('MULTIPOINT ((2 2), (1 1))')))",
    "st_contains" -> "st_contains(st_makeenvelope(0,0,2,2), st_point(1,1))",
    "st_within" -> "st_within(st_point(1,1), st_makeenvelope(0,0,2,2))",
    "st_intersects" -> "st_intersects(st_point(1,1), st_makeenvelope(0,0,2,2))",
    "st_disjoint" -> "st_disjoint(st_point(9,9), st_makeenvelope(0,0,2,2))",
    "st_covers" -> "st_covers(st_makeenvelope(0,0,2,2), st_point(0,1))",
    "st_coveredby" -> "st_coveredby(st_point(0,1), st_makeenvelope(0,0,2,2))",
    "st_crosses" -> "st_crosses(st_geomfromtext('LINESTRING (0 0, 2 2)'), st_geomfromtext('LINESTRING (0 2, 2 0)'))",
    "st_overlaps" -> "st_overlaps(st_makeenvelope(0,0,2,2), st_makeenvelope(1,1,3,3))",
    "st_touches" -> "st_touches(st_makeenvelope(0,0,1,1), st_makeenvelope(1,0,2,1))",
    "st_equals" -> "st_equals(st_point(1,1), st_point(1,1))",
    "st_orderingequals" -> "st_orderingequals(st_point(1,1), st_point(1,1))",
    "st_dwithin" -> "st_dwithin(st_point(0,0), st_point(1,0), 1.5)",
    "st_union" -> "st_area(st_union(st_makeenvelope(0,0,1,1), st_makeenvelope(1,0,2,1)))",
    "st_intersection" -> "st_area(st_intersection(st_makeenvelope(0,0,2,1), st_makeenvelope(1,0,3,1)))",
    "st_difference" -> "st_area(st_difference(st_makeenvelope(0,0,2,1), st_makeenvelope(1,0,3,1)))",
    "st_symdifference" -> "st_area(st_symdifference(st_makeenvelope(0,0,2,1), st_makeenvelope(1,0,3,1)))",
    "st_buffer" -> "st_area(st_buffer(st_point(0,0), 1.0)) > 3",
    "st_convexhull" -> "st_area(st_convexhull(st_geomfromtext('MULTIPOINT ((0 0), (1 0), (0 1))')))",
    "st_dimension" -> "st_dimension(st_makeenvelope(0,0,1,1))",
    "st_geometryn" -> "st_astext(st_geometryn(st_geomfromtext('MULTIPOINT ((1 1), (2 2))'), 2))",
    "st_pointn" -> "st_astext(st_pointn(st_geomfromtext('LINESTRING (0 0, 5 5)'), 2))",
    "st_startpoint" -> "st_astext(st_startpoint(st_geomfromtext('LINESTRING (1 2, 3 4)')))",
    "st_endpoint" -> "st_astext(st_endpoint(st_geomfromtext('LINESTRING (1 2, 3 4)')))",
    "st_exteriorring" -> "st_length(st_exteriorring(st_makeenvelope(0,0,1,1)))",
    "st_numinteriorrings" -> "st_numinteriorrings(st_makeenvelope(0,0,1,1))",
    "st_reverse" -> "st_astext(st_reverse(st_geomfromtext('LINESTRING (0 0, 1 1)')))",
    "st_flipcoordinates" -> "st_astext(st_flipcoordinates(st_point(1, 2)))",
    "st_translate" -> "st_astext(st_translate(st_point(1, 2), 10, 20))",
    "st_closestpoint" -> "st_astext(st_closestpoint(st_point(0, 0), st_makeenvelope(1,1,2,2)))",
    "st_azimuth" -> "st_azimuth(st_point(0,0), st_point(1,1))",
    "st_simplify" -> "st_numpoints(st_simplify(st_geomfromtext('LINESTRING (0 0, 1 0.001, 2 0)'), 0.1))",
    "st_simplifypreservetopology" -> "st_numpoints(st_simplifypreservetopology(st_geomfromtext('LINESTRING (0 0, 1 0.001, 2 0)'), 0.1))",
    "st_bbox" -> "st_bbox(st_makeenvelope(1,2,3,4)).xmax",
    "st_centroid_cell" -> "st_centroid_cell(st_point(5,5), 10.0)",
    "st_morton_cell" -> "st_morton_cell(st_point(5,5), 10.0)",
    "st_tile_cells" -> "size(st_tile_cells(st_makeenvelope(0,0,25,5), 10.0))",
    "st_makeline" -> "st_length(st_makeline(st_point(0,0), st_point(3,4)))",
    "vec_dot" -> "vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D))",
    "vec_norm" -> "vec_norm(array(3.0D, 4.0D))",
    "vec_cosine" -> "vec_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D))",
    "minhash_sig" -> "size(minhash_sig(array(1, 2, 3), 16))",
    "simhash64" -> "simhash64(array(CAST(1 AS BIGINT), CAST(2 AS BIGINT)))",
    "hyperplane_sig" -> "hyperplane_sig(array(CAST(1.0 AS FLOAT), CAST(0.5 AS FLOAT)), 8)",
    "banded_hyperplane_sig" -> "size(banded_hyperplane_sig(array(CAST(1.0 AS FLOAT), CAST(0.5 AS FLOAT)), 8, 4))",
    "st_transform" -> "st_x(st_transform(st_point(10, 45), 'EPSG:4326', 'EPSG:3857'))",
    "st_geohash" -> "st_geohash(st_point(-5.6, 42.6), 5)",
    "st_pointfromgeohash" -> "st_astext(st_pointfromgeohash('ezs42'))",
    "st_lineinterpolatepoint" -> "st_astext(st_lineinterpolatepoint(st_geomfromtext('LINESTRING (0 0, 4 0)'), 0.5))",
    "st_linesubstring" -> "st_length(st_linesubstring(st_geomfromtext('LINESTRING (0 0, 4 0)'), 0.25, 0.75))",
    "st_linelocatepoint" -> "st_linelocatepoint(st_geomfromtext('LINESTRING (0 0, 4 0)'), st_point(1, 1))",
    "st_linemerge" -> "st_astext(st_linemerge(st_geomfromtext('MULTILINESTRING ((0 0, 1 1), (1 1, 2 2))')))",
    "st_rotate" -> "st_x(st_rotate(st_point(1, 0), pi()))",
    "st_scale" -> "st_astext(st_scale(st_point(1, 2), 2.0, 3.0))",
    "st_affine" -> "st_astext(st_affine(st_point(1, 2), 2, 0, 0, 2, 10, 20))",
    "st_issimple" -> "st_issimple(st_geomfromtext('LINESTRING (0 0, 1 1)'))",
    "st_isring" -> "st_isring(st_exteriorring(st_makeenvelope(0,0,1,1)))",
    "st_pointonsurface" -> "st_within(st_pointonsurface(st_makeenvelope(0,0,2,2)), st_makeenvelope(0,0,2,2))",
    "st_minimumboundingcircle" -> "st_area(st_minimumboundingcircle(st_makeenvelope(0,0,2,2))) > 6",
    "st_minimumboundingradius" -> "st_minimumboundingradius(st_makeenvelope(0,0,2,2))",
    "st_concavehull" -> "st_area(st_concavehull(st_geomfromtext('MULTIPOINT ((0 0), (2 0), (1 2))'), 1.0))",
    "st_reduceprecision" -> "st_astext(st_reduceprecision(st_point(1.04, 1.96), 0.5))",
    "st_snap" -> "st_astext(st_snap(st_point(1.05, 1.0), st_point(1.0, 1.0), 0.2))",
    "st_boundingdiagonal" -> "st_length(st_boundingdiagonal(st_makeenvelope(0,0,3,4)))",
    "st_expand" -> "st_area(st_expand(st_point(1, 1), 2.0))",
    "st_hausdorffdistance" -> "st_hausdorffdistance(st_point(0,0), st_point(3,4))",
    "st_frechetdistance" -> "st_frechetdistance(st_geomfromtext('LINESTRING (0 0, 1 0)'), st_geomfromtext('LINESTRING (0 1, 1 1)'))",
    "st_angle" -> "st_angle(st_point(1, 0), st_point(0, 0), st_point(0, 1))",
    "st_dump" -> "size(st_dump(st_geomfromtext('MULTIPOINT ((1 1), (2 2))')))",
    "st_dumppoints" -> "size(st_dumppoints(st_geomfromtext('LINESTRING (0 0, 1 1, 2 2)')))",
    "st_multi" -> "st_geometrytype(st_multi(st_point(1, 2)))",
    "st_force2d" -> "st_astext(st_force2d(st_point(1, 2)))",
    "st_asewkt" -> "st_asewkt(st_point(1, 2))",
    "st_addpoint" -> "st_numpoints(st_addpoint(st_geomfromtext('LINESTRING (0 0, 2 2)'), st_point(3, 3)))",
    "st_removepoint" -> "st_numpoints(st_removepoint(st_geomfromtext('LINESTRING (0 0, 1 1, 2 2)'), 1))",
    "st_interiorringn" -> "st_length(st_interiorringn(st_geomfromtext('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))'), 1))",
    "st_makepolygon" -> "st_area(st_makepolygon(st_geomfromtext('LINESTRING (0 0, 4 0, 4 4, 0 4, 0 0)')))",
    "st_collectionextract" -> "st_geometrytype(st_collectionextract(st_geomfromtext('GEOMETRYCOLLECTION (POINT (1 1), LINESTRING (0 0, 1 1))'), 2))",
    "st_npoints" -> "st_npoints(st_geomfromtext('LINESTRING (0 0, 1 1)'))",
    "st_makevalid" -> "st_isvalid(st_makevalid(st_geomfromtext('POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0))')))",
    "st_geomfromgeojson" -> """st_astext(st_geomfromgeojson('{"type":"Point","coordinates":[1,2]}'))""",
    // tier 3
    "st_relate" -> "st_relate(st_point(1,1), st_makeenvelope(0,0,2,2))",
    "st_relatematch" -> "st_relatematch(st_relate(st_point(1,1), st_makeenvelope(0,0,2,2)), 'T*F**F***')",
    "st_isvalidreason" -> "st_isvalidreason(st_makeenvelope(0,0,1,1))",
    "st_minimumclearance" -> "st_minimumclearance(st_makeenvelope(0,0,1,2))",
    "st_minimumclearanceline" -> "st_length(st_minimumclearanceline(st_makeenvelope(0,0,1,2)))",
    "st_polygonize" -> "st_numgeometries(st_polygonize(st_boundary(st_makeenvelope(0,0,1,1))))",
    "st_buildarea" -> "st_area(st_buildarea(st_boundary(st_makeenvelope(0,0,2,2))))",
    "st_node" -> "st_numgeometries(st_node(st_geomfromtext('MULTILINESTRING ((0 0, 2 2), (0 2, 2 0))')))",
    "st_unaryunion" -> "st_area(st_unaryunion(st_geomfromtext('MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((1 1, 3 1, 3 3, 1 3, 1 1)))')))",
    "st_shortestline" -> "st_length(st_shortestline(st_makeenvelope(0,0,1,1), st_makeenvelope(4,0,5,1)))",
    "st_longestline" -> "st_length(st_longestline(st_makeenvelope(0,0,1,1), st_makeenvelope(4,0,5,1)))",
    "st_maxdistance" -> "st_maxdistance(st_point(0,0), st_makeenvelope(3,4,3,4))",
    "st_segmentize" -> "st_npoints(st_segmentize(st_geomfromtext('LINESTRING (0 0, 10 0)'), 2.5))",
    "st_offsetcurve" -> "st_length(st_offsetcurve(st_geomfromtext('LINESTRING (0 0, 10 0)'), 1.0))",
    "st_simplifyvw" -> "st_npoints(st_simplifyvw(st_geomfromtext('LINESTRING (0 0, 1 0.01, 2 0, 4 4)'), 0.5))",
    "st_triangulatepolygon" -> "st_numgeometries(st_triangulatepolygon(st_makeenvelope(0,0,2,2)))",
    "st_maximuminscribedcircle" -> "st_astext(st_maximuminscribedcircle(st_makeenvelope(0,0,2,2)))",
    "st_maximuminscribedradius" -> "st_maximuminscribedradius(st_makeenvelope(0,0,2,2))",
    "st_split" -> "st_numgeometries(st_split(st_geomfromtext('LINESTRING (0 0, 2 0)'), st_point(1, 0)))",
    "st_subdivide" -> "size(st_subdivide(st_geomfromtext('LINESTRING (0 0, 1 0, 2 0, 3 0, 4 0, 5 0, 6 0, 7 0)'), 5))",
    "st_generatepoints" -> "st_numgeometries(st_generatepoints(st_makeenvelope(0,0,2,2), 5, 42))",
    "st_points" -> "st_numgeometries(st_points(st_makeenvelope(0,0,1,1)))",
    "st_bufferstyle" -> "st_area(st_bufferstyle(st_geomfromtext('LINESTRING (0 0, 10 0)'), 1.0, 'endcap=flat quad_segs=8'))",
    "st_z" -> "st_z(st_makepointz(1, 2, 3))",
    "st_hasz" -> "st_hasz(st_makepointz(1, 2, 3))",
    "st_zmin" -> "st_zmin(st_makepointz(1, 2, 3))",
    "st_zmax" -> "st_zmax(st_force3d(st_geomfromtext('LINESTRING (0 0, 1 1)'), 7.0))",
    "st_ndims" -> "st_ndims(st_makepointz(1, 2, 3))",
    "st_zmflag" -> "st_zmflag(st_point(1, 2))",
    "st_makepointz" -> "st_astext(st_makepointz(1, 2, 3))",
    "st_force3d" -> "st_hasz(st_force3d(st_point(1, 2), 5.0))",
    "st_3ddistance" -> "st_3ddistance(st_makepointz(0, 0, 0), st_makepointz(1, 2, 2))",
    "st_delaunaytriangles" -> "st_numgeometries(st_delaunaytriangles(st_points(st_makeenvelope(0,0,2,2))))",
    "st_voronoipolygons" -> "st_numgeometries(st_voronoipolygons(st_points(st_makeenvelope(0,0,2,2))))",
    "st_union_aggr" -> "st_numgeometries(st_union_aggr(g)) FROM (SELECT st_point(1,1) AS g)",
    "st_intersection_aggr" -> "st_area(st_intersection_aggr(g)) FROM (SELECT st_makeenvelope(0,0,2,2) AS g)",
    "st_envelope_aggr" -> "st_xmin(st_envelope_aggr(g)) FROM (SELECT st_point(1,1) AS g)",
    "st_centroid_aggr" -> "st_x(st_centroid_aggr(g)) FROM (SELECT st_point(1,1) AS g)",
    "st_collect" -> "st_geometrytype(st_collect(g)) FROM (SELECT st_point(1,1) AS g)",
  )

  test("every catalog function is invocable through SQL and returns non-null") {
    val missing = GraftFunctions.catalog.map(_._1).filterNot(invocations.contains)
    assert(missing.isEmpty, s"no invocation listed for: $missing")
    for ((name, call) <- invocations) {
      val q = s"SELECT $call"
      val v = spark.sql(q).head.get(0)
      assert(v != null, s"$name returned null via: $q")
    }
  }

  test("DESCRIBE FUNCTION shows usage text") {
    val desc = spark.sql("DESCRIBE FUNCTION EXTENDED st_point")
      .collect().map(_.getString(0)).mkString("\n")
    assert(desc.contains("st_point(x, y)"), s"no usage in:\n$desc")
  }

  test("expected value spot checks") {
    assert(sql1("SELECT vec_dot(array(1.0D,2.0D), array(3.0D,4.0D))") == 11.0)
    assert(sql1("SELECT vec_norm(array(3.0D,4.0D))") == 5.0)
    assert(sql1("SELECT vec_cosine(array(1.0D,0.0D), array(0.0D,1.0D))") == 0.0)
    assert(sql1("SELECT size(st_tile_cells(st_makeenvelope(0,0,25,5), 10.0))") == 3)
    assert(sql1("SELECT st_isempty(st_geomfromtext('POLYGON EMPTY'))") == true)
    assert(sql1("SELECT st_astext(st_normalize(st_geomfromtext('MULTIPOINT ((2 2), (1 1))')))")
      == "MULTIPOINT ((1 1), (2 2))")
  }
}
