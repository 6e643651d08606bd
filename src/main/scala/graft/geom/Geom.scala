package graft.geom

import org.locationtech.jts.geom._
import org.locationtech.jts.io.{Ordinate, WKBReader, WKBWriter, WKTReader, WKTWriter}

/**
 * Geometry model + serde for graft.
 *
 * Geometry values travel through Spark as WKB bytes in plain `BINARY`
 * columns: parquet-native, kryo-free, and identical on every engine that
 * speaks WKB. This mirrors the reference's unified WKB serializer
 * (reference: extension/.../org/apache/sedona/sql/utils/GeometrySerializer.scala:26)
 * without introducing a UDT, so every built-in Spark operator (joins,
 * shuffles, parquet IO, stats) treats geometry as ordinary binary data.
 *
 * JTS reader/writer objects are not thread-safe; executor task threads
 * share expression instances in local mode, so all of them live in
 * ThreadLocals.
 */
object Geom {
  val factory = new GeometryFactory(new PrecisionModel(), 4326)

  private val wkbReaders = ThreadLocal.withInitial[WKBReader](() => new WKBReader(factory))
  private val wkbWriters = ThreadLocal.withInitial[WKBWriter](() => new WKBWriter(2, true))
  private val wkbWriters3 = ThreadLocal.withInitial[WKBWriter](() => new WKBWriter(3, true))
  private val wktReaders = ThreadLocal.withInitial[WKTReader](() => new WKTReader(factory))
  private val wktWriters = ThreadLocal.withInitial[WKTWriter](() => new WKTWriter(2))
  private val wktWriters3 = ThreadLocal.withInitial[WKTWriter](() => new WKTWriter(3))

  private val isoWkbWriters = ThreadLocal.withInitial[WKBWriter](() => new WKBWriter(2, false))
  private val isoWkbWriters3 = ThreadLocal.withInitial[WKBWriter](() => new WKBWriter(3, false))

  // M-aware writers: JTS writers emit the intersection of their output
  // ordinates with the sequence's actual ordinates, so the XYM writer is
  // safe on XYM sequences and the XYZM writer on XYZM ones. Dispatch stays
  // probe-based (below) so plain 2D/XYZ geometries keep byte-identical
  // output (a blanket dim-4 writer would emit NaN Z for 2D
  // CoordinateArraySequences, which report dimension 3).
  private def mWriter(includeSrid: Boolean): WKBWriter = {
    val w = new WKBWriter(3, includeSrid)
    w.setOutputOrdinates(java.util.EnumSet.of(Ordinate.X, Ordinate.Y, Ordinate.M))
    w
  }
  private val wkbWritersM = ThreadLocal.withInitial[WKBWriter](() => mWriter(true))
  private val wkbWriters4 = ThreadLocal.withInitial[WKBWriter](() => new WKBWriter(4, true))
  private val isoWkbWritersM = ThreadLocal.withInitial[WKBWriter](() => mWriter(false))
  private val isoWkbWriters4 = ThreadLocal.withInitial[WKBWriter](() => new WKBWriter(4, false))
  private val wktWritersM = ThreadLocal.withInitial[WKTWriter](() => {
    val w = new WKTWriter(3)
    w.setOutputOrdinates(java.util.EnumSet.of(Ordinate.X, Ordinate.Y, Ordinate.M))
    w
  })
  private val wktWriters4 = ThreadLocal.withInitial[WKTWriter](() => new WKTWriter(4))

  /** First-coordinate Z probe (PostGIS-style): a geometry is 3D when its
    * lead coordinate carries a real Z. Keeps every existing 2D geometry's
    * bytes identical while letting `POINT Z` inputs round-trip. */
  def hasZ(g: Geometry): Boolean = {
    val c = if (g.isEmpty) null else g.getCoordinate
    c != null && !java.lang.Double.isNaN(c.getZ)
  }

  /** First-coordinate M probe, same convention as [[hasZ]]: only
    * CoordinateXYM / CoordinateXYZM (what the WKB/WKT readers produce for
    * `POINT M` / `POINT ZM` input) carry a non-NaN M. */
  def hasM(g: Geometry): Boolean = {
    val c = if (g.isEmpty) null else g.getCoordinate
    c != null && !java.lang.Double.isNaN(c.getM)
  }

  private def pick(g: Geometry, w2: ThreadLocal[WKBWriter], w3: ThreadLocal[WKBWriter],
                   wm: ThreadLocal[WKBWriter], w4: ThreadLocal[WKBWriter]): WKBWriter = {
    val z = hasZ(g); val m = hasM(g)
    if (z && m) w4.get else if (m) wm.get else if (z) w3.get else w2.get
  }

  def serialize(g: Geometry): Array[Byte] =
    pick(g, wkbWriters, wkbWriters3, wkbWritersM, wkbWriters4).write(g)
  /** Standard ISO WKB (no EWKB SRID flag) — the ST_AsBinary interop format. */
  def serializeIso(g: Geometry): Array[Byte] =
    pick(g, isoWkbWriters, isoWkbWriters3, isoWkbWritersM, isoWkbWriters4).write(g)
  def deserialize(bytes: Array[Byte]): Geometry =
    try wkbReaders.get.read(bytes)
    catch {
      case e: Exception =>
        val n = if (bytes == null) "null" else s"${bytes.length} bytes"
        throw new IllegalArgumentException(
          s"invalid WKB geometry ($n): ${e.getMessage}; " +
            "geometry columns must hold WKB, e.g. from st_geomfromtext/st_point", e)
    }

  def fromWkt(wkt: String): Geometry = wktReaders.get.read(wkt)
  def toWkt(g: Geometry): String = {
    val z = hasZ(g); val m = hasM(g)
    (if (z && m) wktWriters4.get else if (m) wktWritersM.get
     else if (z) wktWriters3.get else wktWriters.get).write(g)
  }

  // per-(digits, dims) WKT writers, cached per thread (writers are stateful)
  private val wktPrecCaches =
    ThreadLocal.withInitial(() => new java.util.HashMap[Long, WKTWriter]())

  /** WKT with at most `digits` decimal places (PostGIS
    * ST_AsText(geom, maxdecimaldigits) semantics — output formatting only,
    * the stored geometry is untouched). */
  def toWkt(g: Geometry, digits: Int): String = {
    require(digits >= 0 && digits <= 15, s"maxdecimaldigits must be 0..15, got $digits")
    val z = hasZ(g); val m = hasM(g)
    val key = (digits.toLong << 2) | (if (z) 2L else 0L) | (if (m) 1L else 0L)
    val cache = wktPrecCaches.get
    var w = cache.get(key)
    if (w == null) {
      w = if (z && m) new WKTWriter(4)
          else if (z || m) new WKTWriter(3)
          else new WKTWriter(2)
      if (m && !z) w.setOutputOrdinates(java.util.EnumSet.of(Ordinate.X, Ordinate.Y, Ordinate.M))
      // JTS derives output decimals as 1 + ceil(log10(scale)) and uses the
      // model only for formatting (no coordinate snapping). Exact powers of
      // ten sit on the ceil boundary where float log noise flips the count;
      // 0.5*10^(digits-1) lands mid-band and always yields `digits`.
      w.setPrecisionModel(new PrecisionModel(0.5 * math.pow(10.0, digits - 1)))
      cache.put(key, w)
    }
    w.write(g)
  }

  def point(x: Double, y: Double): Point =
    factory.createPoint(new Coordinate(x, y))

  def polygonFromEnvelope(xmin: Double, ymin: Double, xmax: Double, ymax: Double): Polygon =
    factory.createPolygon(Array(
      new Coordinate(xmin, ymin), new Coordinate(xmax, ymin),
      new Coordinate(xmax, ymax), new Coordinate(xmin, ymax),
      new Coordinate(xmin, ymin)))

  /** GeoJSON text -> geometry; reader twin of `toGeoJson`. Jackson (on the
    * Spark classpath) does the JSON parse; geometry assembly is ours. */
  def fromGeoJson(json: String): Geometry = {
    import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
    val root = new ObjectMapper().readTree(json)
    def coord(n: JsonNode): Coordinate =
      if (n.size() >= 3)
        new Coordinate(n.get(0).asDouble(), n.get(1).asDouble(), n.get(2).asDouble())
      else new Coordinate(n.get(0).asDouble(), n.get(1).asDouble())
    def coords(n: JsonNode): Array[Coordinate] = {
      val it = n.elements(); val b = Array.newBuilder[Coordinate]
      while (it.hasNext) b += coord(it.next()); b.result()
    }
    def polygon(rings: JsonNode): Polygon = {
      val shell = factory.createLinearRing(coords(rings.get(0)))
      val holes = (1 until rings.size()).map(i => factory.createLinearRing(coords(rings.get(i))))
      factory.createPolygon(shell, holes.toArray)
    }
    def build(node: JsonNode): Geometry = {
      val c = node.get("coordinates")
      node.get("type").asText() match {
        case "Point" => factory.createPoint(coord(c))
        case "LineString" => factory.createLineString(coords(c))
        case "Polygon" => polygon(c)
        case "MultiPoint" => factory.createMultiPointFromCoords(coords(c))
        case "MultiLineString" =>
          factory.createMultiLineString(
            (0 until c.size()).map(i => factory.createLineString(coords(c.get(i)))).toArray)
        case "MultiPolygon" =>
          factory.createMultiPolygon((0 until c.size()).map(i => polygon(c.get(i))).toArray)
        case "GeometryCollection" =>
          val gs = node.get("geometries")
          factory.createGeometryCollection((0 until gs.size()).map(i => build(gs.get(i))).toArray)
        case other => throw new IllegalArgumentException(s"unsupported GeoJSON type: $other")
      }
    }
    build(root)
  }

  /** GeoJSON text for a geometry (jts-core has no GeoJSON IO; tiny writer
    * here). Z rides as the optional third position element (RFC 7946 §3.1.1). */
  def toGeoJson(g: Geometry): String = {
    def coord(c: Coordinate): String =
      if (java.lang.Double.isNaN(c.getZ)) s"[${c.x},${c.y}]"
      else s"[${c.x},${c.y},${c.getZ}]"
    def coords(cs: Array[Coordinate]): String = cs.map(coord).mkString("[", ",", "]")
    def polyCoords(p: Polygon): String = {
      val shell = coords(p.getExteriorRing.getCoordinates)
      val holes = (0 until p.getNumInteriorRing).map(i => coords(p.getInteriorRingN(i).getCoordinates))
      (shell +: holes).mkString("[", ",", "]")
    }
    g match {
      case p: Point => s"""{"type":"Point","coordinates":${coord(p.getCoordinate)}}"""
      case l: LineString => s"""{"type":"LineString","coordinates":${coords(l.getCoordinates)}}"""
      case p: Polygon => s"""{"type":"Polygon","coordinates":${polyCoords(p)}}"""
      case m: MultiPoint =>
        val cs = (0 until m.getNumGeometries).map(i => coord(m.getGeometryN(i).asInstanceOf[Point].getCoordinate))
        s"""{"type":"MultiPoint","coordinates":${cs.mkString("[", ",", "]")}}"""
      case m: MultiLineString =>
        val cs = (0 until m.getNumGeometries).map(i => coords(m.getGeometryN(i).getCoordinates))
        s"""{"type":"MultiLineString","coordinates":${cs.mkString("[", ",", "]")}}"""
      case m: MultiPolygon =>
        val cs = (0 until m.getNumGeometries).map(i => polyCoords(m.getGeometryN(i).asInstanceOf[Polygon]))
        s"""{"type":"MultiPolygon","coordinates":${cs.mkString("[", ",", "]")}}"""
      case gc: GeometryCollection =>
        val gs = (0 until gc.getNumGeometries).map(i => toGeoJson(gc.getGeometryN(i)))
        s"""{"type":"GeometryCollection","geometries":${gs.mkString("[", ",", "]")}}"""
    }
  }
}
