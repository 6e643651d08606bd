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

  test("ISO WKB (st_asbinary path) carries no EWKB SRID flag; internal serde does") {
    val g = Geom.point(1, 2)
    g.setSRID(4326)
    val iso = Geom.serializeIso(g)
    assert(iso.length == 21) // 1 + 4 type + 16 coords, no SRID bytes
    // big-endian type word 00 00 00 01 — no EWKB flag in the high byte
    assert((iso(1) & 0x20) == 0)
    val ewkb = Geom.serialize(g)
    assert(ewkb.length == 25 && (ewkb(1) & 0x20) != 0) // SRID flag + 4 SRID bytes
  }

  test("envelope constructor is CCW closed ring") {
    val p = Geom.polygonFromEnvelope(0, 0, 2, 3)
    assert(p.getArea == 6.0 && p.isValid)
  }
}
