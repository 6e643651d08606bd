package graft

class StExpressionsSpec extends SparkSpec {

  test("constructors and accessors") {
    assert(sql1("SELECT st_astext(st_point(3.5, -2.0))") == "POINT (3.5 -2)")
    assert(sql1("SELECT st_x(st_point(3.5, -2.0))") == 3.5)
    assert(sql1("SELECT st_y(st_point(3.5, -2.0))") == -2.0)
    assert(sql1("SELECT st_area(st_polygonfromenvelope(0,0,3,4))") == 12.0)
    assert(sql1("SELECT st_length(st_geomfromtext('LINESTRING (0 0, 3 4)'))") == 5.0)
    assert(sql1("SELECT st_geometrytype(st_geomfromtext('LINESTRING (0 0, 1 1)'))") == "ST_LineString")
    assert(sql1("SELECT st_numpoints(st_geomfromtext('LINESTRING (0 0, 1 1, 2 2)'))") == 3)
    assert(sql1("SELECT st_srid(st_setsrid(st_point(1,1), 4269))") == 4269)
  }

  test("predicates incl. prepared-literal fast path") {
    assert(sql1("SELECT st_contains(st_polygonfromenvelope(0,0,10,10), st_point(5,5))") == true)
    assert(sql1("SELECT st_contains(st_polygonfromenvelope(0,0,10,10), st_point(15,5))") == false)
    // boundary: contains=false, covers/intersects=true
    assert(sql1("SELECT st_contains(st_polygonfromenvelope(0,0,10,10), st_point(0,5))") == false)
    assert(sql1("SELECT st_covers(st_polygonfromenvelope(0,0,10,10), st_point(0,5))") == true)
    assert(sql1("SELECT st_intersects(st_polygonfromenvelope(0,0,10,10), st_point(0,5))") == true)
    assert(sql1("SELECT st_dwithin(st_point(0,0), st_point(3,4), 5.0)") == true)
    assert(sql1("SELECT st_dwithin(st_point(0,0), st_point(3,4), 4.9)") == false)
    assert(sql1("SELECT st_touches(st_polygonfromenvelope(0,0,1,1), st_polygonfromenvelope(1,0,2,1))") == true)
    assert(sql1("SELECT st_equals(st_geomfromtext('LINESTRING (0 0, 2 2)'), st_geomfromtext('LINESTRING (2 2, 0 0)'))") == true)
    assert(sql1("SELECT st_orderingequals(st_geomfromtext('LINESTRING (0 0, 2 2)'), st_geomfromtext('LINESTRING (2 2, 0 0)'))") == false)
  }

  test("transformations") {
    assert(sql1("SELECT st_area(st_union(st_polygonfromenvelope(0,0,2,2), st_polygonfromenvelope(1,0,3,2)))") == 6.0)
    assert(sql1("SELECT st_area(st_intersection(st_polygonfromenvelope(0,0,2,2), st_polygonfromenvelope(1,0,3,2)))") == 2.0)
    assert(sql1("SELECT st_area(st_difference(st_polygonfromenvelope(0,0,2,2), st_polygonfromenvelope(1,0,3,2)))") == 2.0)
    assert(sql1("SELECT st_area(st_symdifference(st_polygonfromenvelope(0,0,2,2), st_polygonfromenvelope(1,0,3,2)))") == 4.0)
    assert(sql1("SELECT st_numpoints(st_simplify(st_geomfromtext('LINESTRING (0 0, 1 0.01, 2 0)'), 0.1))") == 2)
    assert(sql1("SELECT st_area(st_convexhull(st_geomfromtext('MULTIPOINT ((0 0), (1 0), (0 1))')))") == 0.5)
    val bufArea = sql1("SELECT st_area(st_buffer(st_point(0,0), 1.0))").asInstanceOf[Double]
    assert(bufArea > 3.0 && bufArea < math.Pi) // inscribed polygon of unit circle
  }

  test("wrong argument types fail at analysis with a named error") {
    val e1 = intercept[Exception](spark.sql("SELECT st_x('not a geometry')").collect())
    assert(e1.getMessage.contains("st_x argument 1 expects geometry"))
    val e2 = intercept[Exception](spark.sql("SELECT st_point('a', 'b')").collect())
    assert(e2.getMessage.contains("st_point argument 1 expects numeric"))
    val e3 = intercept[Exception](spark.sql("SELECT st_contains(st_point(1,1), 5)").collect())
    assert(e3.getMessage.contains("st_contains argument 2 expects geometry"))
    val e4 = intercept[Exception](spark.sql("SELECT st_geomfromtext(42)").collect())
    assert(e4.getMessage.contains("st_geomfromtext argument 1 expects string"))
  }

  test("type-mismatched geometry returns SQL NULL under whole-stage codegen (not NPE)") {
    import spark.implicits._
    // run through a DataFrame scan so whole-stage codegen (not foldable
    // constant folding) evaluates the expressions
    spark.range(5).selectExpr("id", "st_makeenvelope(0, 0, CAST(id+1 AS DOUBLE), 1.0D) AS poly",
        "st_point(CAST(id AS DOUBLE), 1.0D) AS pt")
      .createOrReplaceTempView("cg_null")
    val rows = spark.sql("""
      SELECT st_x(poly), st_startpoint(pt), st_endpoint(poly), st_exteriorring(pt),
             st_numinteriorrings(pt), st_azimuth(poly, pt), st_pointn(pt, 1),
             st_geometryn(pt, 2), st_pointn(st_boundary(poly), 99)
      FROM cg_null""").collect()
    assert(rows.length == 5)
    rows.foreach { r => (0 until 9).foreach(i => assert(r.isNullAt(i), s"col $i not null")) }
    // and valid inputs still work in the same plan shape
    val ok = spark.sql("SELECT st_x(pt) FROM cg_null ORDER BY id").as[Double].collect()
    assert(ok.toSeq == Seq(0.0, 1.0, 2.0, 3.0, 4.0))
  }

  test("null propagation and geojson") {
    assert(sql1("SELECT st_x(CAST(NULL AS BINARY))") == null)
    assert(sql1("SELECT st_asgeojson(st_point(1,2))") == """{"type":"Point","coordinates":[1.0,2.0]}""")
  }

  test("aggregates: union/envelope/centroid/collect") {
    spark.sql("SELECT explode(sequence(0, 9)) AS i").createOrReplaceTempView("ten")
    assert(sql1("SELECT st_numgeometries(st_union_aggr(st_point(CAST(i AS DOUBLE), 0.0))) FROM ten") == 10)
    assert(sql1("SELECT st_xmax(st_envelope_aggr(st_point(CAST(i AS DOUBLE), 0.0))) FROM ten") == 9.0)
    assert(sql1("SELECT st_x(st_centroid_aggr(st_point(CAST(i AS DOUBLE), 0.0))) FROM ten") == 4.5)
    assert(sql1("SELECT st_geometrytype(st_collect(st_point(CAST(i AS DOUBLE), 0.0))) FROM ten") == "ST_MultiPoint")
    // union of overlapping squares dissolves to one polygon of area 3
    assert(sql1("""SELECT st_area(st_union_aggr(g)) FROM (
      SELECT st_polygonfromenvelope(CAST(i AS DOUBLE), 0, CAST(i+2 AS DOUBLE), 1) AS g FROM ten WHERE i < 2)""") == 3.0)
  }
}
