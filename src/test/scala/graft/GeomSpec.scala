package graft

import graft.geom.Geom

class GeomSpec extends SparkSpec {

  test("WKT <-> WKB roundtrip preserves coordinates") {
    val g = Geom.fromWkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    val back = Geom.deserialize(Geom.serialize(g))
    assert(back.equalsExact(g))
    assert(Geom.toWkt(back) == "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
  }

  test("SRID survives serde (EWKB)") {
    val g = Geom.point(1.5, 2.5)
    g.setSRID(3857)
    val back = Geom.deserialize(Geom.serialize(g))
    assert(back.getSRID == 3857)
  }

  test("GeoJSON writer covers the type lattice") {
    assert(Geom.toGeoJson(Geom.point(1, 2)) == """{"type":"Point","coordinates":[1.0,2.0]}""")
    val mp = Geom.fromWkt("MULTIPOINT ((1 2), (3 4))")
    assert(Geom.toGeoJson(mp).startsWith("""{"type":"MultiPoint""""))
    val gc = Geom.fromWkt("GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))")
    assert(Geom.toGeoJson(gc).contains("GeometryCollection"))
  }

  test("envelope constructor is CCW closed ring") {
    val p = Geom.polygonFromEnvelope(0, 0, 2, 3)
    assert(p.getArea == 6.0 && p.isValid)
  }
}
