package graft.functions

import graft.geom.Geom

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.locationtech.jts.geom.{Coordinate, Geometry, LineString, Point, Polygon}
import org.locationtech.jts.operation.valid.IsValidOp

import StKit._

/**
 * Catalog-breadth tier 6 (SURVEY.md §2.5 completion): WGS84-spheroid
 * measures (length / area on the ellipsoid, closing the Sedona
 * ST_LengthSpheroid / ST_AreaSpheroid gap), validity diagnostics with a
 * location (ST_IsValidDetail), 3-D linear referencing
 * (ST_3DLineInterpolatePoint), segment decomposition (ST_LineSegments),
 * geohash cell polygons (ST_GeomFromGeoHash), and the S2 cell family
 * (ST_S2CellIDs / ST_S2ToGeom) built on the public S2 face-cube +
 * Hilbert-curve construction. The reference registers the equivalent
 * Sedona catalog wholesale (extension/.../SedonaExpressionsRegistrator
 * .scala:30); each function here is a fresh Spark-native Catalyst
 * expression on the same codegen'd WKB bases as the core tiers.
 */
private[functions] object Spheroid {
  /** WGS84 semi-major / flattening — the same public constants
    * StDistanceSpheroid's Vincenty uses. */
  val A = 6378137.0
  val F = 1.0 / 298.257223563
  val B = A * (1.0 - F)
  val E2 = F * (2.0 - F) // first eccentricity squared
  val E = math.sqrt(E2)

  /** Area between the equator and latitude `latDeg` on the WGS84
    * ellipsoid, per radian of longitude (the standard closed form from
    * the authalic-latitude derivation; sphere limit is R^2 sin(lat)).
    * Written in a fixed IEEE op order so the DuckDB oracle can replay
    * it digit-for-digit. */
  def bandArea(latDeg: Double): Double = {
    val s = math.sin(latDeg * (math.Pi / 180.0))
    (B * B / 2.0) * (s / (1.0 - E2 * s * s) +
      (1.0 / (2.0 * E)) * math.log((1.0 + E * s) / (1.0 - E * s)))
  }

  /** Signed ellipsoidal area contribution of one edge traversed
    * (lon1,lat1) -> (lon2,lat2), edges linear in lon-lat (the same edge
    * convention as st_areasphere's Chamberlain-Duquette): the integral
    * of bandArea(lat(lon)) d(lon) by Simpson's rule, exact for
    * constant-latitude edges and the linear-in-latitude midpoint
    * otherwise. Meridian edges (lon1 == lon2) contribute exactly 0. */
  def edgeArea(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
    val rad = math.Pi / 180.0
    val dlam = (lon2 - lon1) * rad
    dlam * ((bandArea(lat1) + 4.0 * bandArea((lat1 + lat2) / 2.0) + bandArea(lat2)) / 6.0)
  }

  def ringArea(cs: Array[Coordinate]): Double = {
    var s = 0.0
    var i = 1
    while (i < cs.length) {
      s += edgeArea(cs(i - 1).x, cs(i - 1).y, cs(i).x, cs(i).y)
      i += 1
    }
    s
  }
}

/** st_lengthspheroid(geom): sum of per-segment geodesic lengths on the
  * WGS84 ellipsoid (Vincenty inverse, the same solver as
  * st_distancespheroid) over the geometry's linework; x=lon, y=lat in
  * degrees, meters out. Polygon components measure their boundary rings
  * (exterior + interior — the Sedona/PostGIS spheroid-length contract);
  * points contribute 0. */
case class StLengthSpheroid(child: Expression) extends StUnary {
  override def dataType: DataType = DoubleType
  protected def run(g: Geometry): Any = {
    def lineLen(l: LineString): Double = {
      val cs = l.getCoordinateSequence
      var total = 0.0
      var j = 1
      while (j < cs.size()) {
        total += StDistanceSpheroid.vincenty(cs.getX(j - 1), cs.getY(j - 1),
          cs.getX(j), cs.getY(j))
        j += 1
      }
      total
    }
    // recursive walk: a GeometryCollection's components can themselves be
    // Multi* — a flat getGeometryN loop would measure nested linework as 0
    def walk(geom: Geometry): Double = geom match {
      case l: LineString => lineLen(l)
      case p: Polygon =>
        lineLen(p.getExteriorRing) +
          (0 until p.getNumInteriorRing).map(r => lineLen(p.getInteriorRingN(r))).sum
      case other if other.getNumGeometries > 1 || other.getGeometryType.startsWith("Multi") ||
          other.getGeometryType == "GeometryCollection" =>
        (0 until other.getNumGeometries).map(i => walk(other.getGeometryN(i))).sum
      case _ => 0.0
    }
    walk(g)
  }
  override def prettyName: String = "st_lengthspheroid"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** st_areaspheroid(geom): polygon area on the WGS84 ellipsoid in m^2.
  * Edges are linear in lon-lat (same convention as st_areasphere) and
  * each edge integrates the exact ellipsoidal band-area function by
  * Simpson's rule — exact for constant-latitude edges, and within the
  * sphere-version's documented tolerance otherwise. Shells add, holes
  * subtract, absolute value of the total is returned. */
case class StAreaSpheroid(child: Expression) extends StUnary {
  override def dataType: DataType = DoubleType
  protected def run(g: Geometry): Any = {
    // recursive: polygons may nest inside GeometryCollections as Multi*
    def walk(geom: Geometry): Double = geom match {
      case p: Polygon =>
        math.abs(Spheroid.ringArea(p.getExteriorRing.getCoordinates)) -
          (0 until p.getNumInteriorRing).map(r =>
            math.abs(Spheroid.ringArea(p.getInteriorRingN(r).getCoordinates))).sum
      case other if other.getNumGeometries > 1 || other.getGeometryType.startsWith("Multi") ||
          other.getGeometryType == "GeometryCollection" =>
        (0 until other.getNumGeometries).map(i => walk(other.getGeometryN(i))).sum
      case _ => 0.0
    }
    math.abs(walk(g))
  }
  override def prettyName: String = "st_areaspheroid"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** st_isvaliddetail(geom): struct(valid BOOLEAN, reason STRING,
  * location GEOMETRY) — PostGIS/Sedona ST_IsValidDetail. Valid input
  * gives (true, NULL, NULL); invalid gives JTS's error kind (the bare
  * message, e.g. 'Self-intersection' — st_isvalidreason keeps the
  * at-or-near-point long form) and the offending coordinate as a
  * point. */
case class StIsValidDetail(child: Expression) extends StUnary {
  override def dataType: DataType = StructType(Seq(
    StructField("valid", BooleanType, nullable = false),
    StructField("reason", StringType, nullable = true),
    StructField("location", BinaryType, nullable = true)))
  protected def run(g: Geometry): Any = {
    val op = new IsValidOp(g)
    val err = op.getValidationError
    if (err == null) new GenericInternalRow(Array[Any](true, null, null))
    else new GenericInternalRow(Array[Any](false, str(err.getMessage),
      out(g.getFactory.createPoint(err.getCoordinate))))
  }
  override def prettyName: String = "st_isvaliddetail"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** st_3dlineinterpolatepoint(line, fraction): point at `fraction` of the
  * line's 3-D length, Z interpolated linearly within the containing
  * segment (JTS's LengthIndexedLine is 2-D only, so the walk is
  * explicit). Coordinates without Z are treated as Z=0 and the result
  * carries Z (PostGIS returns a 3-D point). */
case class St3DLineInterpolatePoint(left: Expression, right: Expression) extends StNary {
  override def children: Seq[Expression] = Seq(left, right)
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes() =
    StKit.checkTypes(prettyName, Seq(left -> "geometry", right -> "numeric"))
  protected def run(vs: Seq[Any]): Any = {
    val l = LineRef.asLine(geom(vs(0)), prettyName)
    val f = LineRef.clampFrac(dbl(vs(1)))
    val cs = l.getCoordinateSequence
    def zOf(i: Int): Double = { val z = cs.getOrdinate(i, 2); if (z.isNaN) 0.0 else z }
    def seg(i: Int): Double = {
      val dx = cs.getX(i + 1) - cs.getX(i); val dy = cs.getY(i + 1) - cs.getY(i)
      val dz = zOf(i + 1) - zOf(i)
      math.sqrt(dx * dx + dy * dy + dz * dz)
    }
    val n = cs.size()
    var total = 0.0
    var i = 0
    while (i < n - 1) { total += seg(i); i += 1 }
    def mk(x: Double, y: Double, z: Double) =
      out(l.getFactory.createPoint(new Coordinate(x, y, z)))
    if (total == 0.0) return mk(cs.getX(0), cs.getY(0), zOf(0))
    var remaining = f * total
    i = 0
    while (i < n - 1) {
      val s = seg(i)
      if (remaining <= s || i == n - 2) {
        val r = if (s == 0.0) 0.0 else remaining / s
        return mk(cs.getX(i) + r * (cs.getX(i + 1) - cs.getX(i)),
          cs.getY(i) + r * (cs.getY(i + 1) - cs.getY(i)),
          zOf(i) + r * (zOf(i + 1) - zOf(i)))
      }
      remaining -= s
      i += 1
    }
    mk(cs.getX(n - 1), cs.getY(n - 1), zOf(n - 1)) // unreachable
  }
  override def prettyName: String = "st_3dlineinterpolatepoint"
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(cs(0), cs(1))
}

/** st_linesegments(geom): array of the input's 2-point LineString
  * segments, in order; MultiLineString components concatenate. NULL for
  * non-(multi)line inputs (Sedona's lenient mode is the default here —
  * use st_geometrytype to pre-filter when strictness matters). */
case class StLineSegments(child: Expression) extends StUnary {
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override protected def mayReturnNull: Boolean = true
  protected def run(g: Geometry): Any = {
    val lines = (0 until g.getNumGeometries).map(g.getGeometryN).collect {
      case l: LineString => l
    }
    if (lines.isEmpty || lines.size != g.getNumGeometries) return null
    val outSegs = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    lines.foreach { l =>
      val cs = l.getCoordinateSequence
      var i = 1
      while (i < cs.size()) {
        outSegs += out(l.getFactory.createLineString(
          Array(new Coordinate(cs.getCoordinate(i - 1)), new Coordinate(cs.getCoordinate(i)))))
        i += 1
      }
    }
    new GenericArrayData(outSegs.toArray[Any])
  }
  override def prettyName: String = "st_linesegments"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** st_geomfromgeohash(hash[, precision]): the geohash cell as its
  * lon-lat bounds polygon (PostGIS box semantics; st_pointfromgeohash
  * gives the center). Optional precision truncates the hash first. */
case class StGeomFromGeoHash(children: Seq[Expression]) extends StNary {
  require(children.length == 1 || children.length == 2,
    s"st_geomfromgeohash expects 1 or 2 arguments, got ${children.length}")
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes() =
    StKit.checkTypes(prettyName, (children(0) -> "string") +:
      children.drop(1).map(_ -> "numeric"))
  protected def run(vs: Seq[Any]): Any = {
    val full = vs(0).toString
    val hash = if (vs.length == 2) {
      val p = int(vs(1))
      require(p >= 1 && p <= 20, s"st_geomfromgeohash precision must be 1..20, got $p")
      full.substring(0, math.min(p, full.length))
    } else full
    val (lonLo, lonHi, latLo, latHi) = GeoHash.decodeBounds(hash)
    out(Geom.polygonFromEnvelope(lonLo, latLo, lonHi, latHi))
  }
  override def prettyName: String = "st_geomfromgeohash"
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression = copy(cs)
}

/** st_labelpoint(poly[, gridResolution[, goodnessThreshold]]): a
  * representative anchor point for map labelling, always strictly inside
  * the polygon. Picks the largest-area component of a MultiPolygon, then:
  * the centroid if it lies inside and its boundary clearance is at least
  * `goodnessThreshold` (default 0.2) of the equivalent-area-circle radius
  * sqrt(area/pi); otherwise the pole of inaccessibility (largest-
  * inscribed-circle center) at tolerance envelopeDiag / (128 *
  * gridResolution) (default resolution 2). Non-areal input is an error. */
case class StLabelPoint(children: Seq[Expression]) extends StNary {
  require(children.length >= 1 && children.length <= 3,
    s"st_labelpoint expects 1..3 arguments, got ${children.length}")
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes() =
    StKit.checkTypes(prettyName, (children(0) -> "geometry") +:
      children.drop(1).map(_ -> "numeric"))
  protected def run(vs: Seq[Any]): Any = {
    val g = geom(vs(0))
    val res = if (vs.length >= 2) int(vs(1)) else 2
    require(res >= 1, s"st_labelpoint gridResolution must be >= 1, got $res")
    val thresh = if (vs.length >= 3) dbl(vs(2)) else 0.2
    // largest-area polygonal component
    var best: Geometry = null
    var bestArea = -1.0
    var i = 0
    while (i < g.getNumGeometries) {
      val p = g.getGeometryN(i)
      if (p.isInstanceOf[Polygon] && p.getArea > bestArea) { best = p; bestArea = p.getArea }
      i += 1
    }
    require(best != null && bestArea > 0.0,
      s"st_labelpoint requires polygonal input, got ${g.getGeometryType}")
    val centroid = best.getCentroid
    val goodEnough = best.covers(centroid) && {
      val clearance = centroid.distance(best.getBoundary)
      clearance >= thresh * math.sqrt(bestArea / math.Pi)
    }
    if (goodEnough) out(centroid)
    else {
      val e = best.getEnvelopeInternal
      val diag = math.hypot(e.getWidth, e.getHeight)
      val tol = math.max(diag / (128.0 * res), 1e-12)
      out(new org.locationtech.jts.algorithm.construct.MaximumInscribedCircle(best, tol).getCenter)
    }
  }
  override def prettyName: String = "st_labelpoint"
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression = copy(cs)
}

// ---------------------------------------------------------------------------
// S2 cells (public construction: quadratic face-cube projection + Hilbert
// curve position, 64-bit ids, levels 0..30 — the layout documented by the
// s2geometry project; no S2 library involved)
// ---------------------------------------------------------------------------

object S2 {
  val MaxLevel = 30
  private val SwapMask = 1
  private val InvertMask = 2
  // Canonical Hilbert sub-cell orders: posToIJ(orientation)(pos) = ij,
  // ij packed as (iBit << 1) | jBit; posToOrient(pos) XOR-accumulates.
  private val posToIJ: Array[Array[Int]] = Array(
    Array(0, 1, 3, 2), Array(0, 2, 3, 1), Array(3, 2, 0, 1), Array(3, 1, 0, 2))
  private val posToOrient: Array[Int] = Array(SwapMask, 0, 0, InvertMask | SwapMask)
  private val ijToPos: Array[Array[Int]] = posToIJ.map { row =>
    val inv = new Array[Int](4)
    row.zipWithIndex.foreach { case (ij, pos) => inv(ij) = pos }
    inv
  }

  /** Face 0..5 of the unit-cube projection: largest-|component| axis,
    * +3 for the negative side. */
  def face(x: Double, y: Double, z: Double): Int = {
    val f =
      if (math.abs(x) > math.abs(y)) { if (math.abs(x) > math.abs(z)) 0 else 2 }
      else { if (math.abs(y) > math.abs(z)) 1 else 2 }
    val comp = f match { case 0 => x; case 1 => y; case _ => z }
    if (comp < 0.0) f + 3 else f
  }

  def faceUv(f: Int, x: Double, y: Double, z: Double): (Double, Double) = f match {
    case 0 => (y / x, z / x)
    case 1 => (-x / y, z / y)
    case 2 => (-x / z, -y / z)
    case 3 => (z / x, y / x)
    case 4 => (z / y, -x / y)
    case _ => (-y / z, -x / z)
  }

  def faceUvToXyz(f: Int, u: Double, v: Double): (Double, Double, Double) = f match {
    case 0 => (1.0, u, v)
    case 1 => (-u, 1.0, v)
    case 2 => (-u, -v, 1.0)
    case 3 => (-1.0, -v, -u)
    case 4 => (v, -1.0, -u)
    case _ => (v, u, -1.0)
  }

  /** Quadratic uv -> st projection (the s2 default). Monotone on all of
    * R, so slightly out-of-range values (neighbor wrapping) stay
    * meaningful. */
  def uvToSt(u: Double): Double =
    if (u >= 0.0) 0.5 * math.sqrt(1.0 + 3.0 * u) else 1.0 - 0.5 * math.sqrt(1.0 - 3.0 * u)

  def stToUv(s: Double): Double =
    if (s >= 0.5) (1.0 / 3.0) * (4.0 * s * s - 1.0)
    else (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s))

  private def stToIj(s: Double): Int = {
    val v = math.floor(s * (1L << MaxLevel).toDouble).toLong
    math.max(0L, math.min((1L << MaxLevel) - 1L, v)).toInt
  }

  /** Leaf cell id from lon/lat degrees. */
  def leafFromLonLat(lonDeg: Double, latDeg: Double): Long = {
    val rad = math.Pi / 180.0
    val lat = latDeg * rad; val lon = lonDeg * rad
    val x = math.cos(lat) * math.cos(lon)
    val y = math.cos(lat) * math.sin(lon)
    val z = math.sin(lat)
    val f = face(x, y, z)
    val (u, v) = faceUv(f, x, y, z)
    fromFaceIj(f, stToIj(uvToSt(u)), stToIj(uvToSt(v)))
  }

  /** Leaf id from face + leaf-resolution (i, j): 3 face bits, 60 Hilbert
    * position bits, sentinel 1. */
  def fromFaceIj(f: Int, i: Int, j: Int): Long = {
    var orientation = f & SwapMask
    var pos = 0L
    var k = MaxLevel - 1
    while (k >= 0) {
      val ij2 = (((i >> k) & 1) << 1) | ((j >> k) & 1)
      val pos2 = ijToPos(orientation)(ij2)
      pos = (pos << 2) | pos2.toLong
      orientation ^= posToOrient(pos2)
      k -= 1
    }
    (f.toLong << 61) | (pos << 1) | 1L
  }

  /** Parent of `id` at `level` (id may be any cell at a deeper level). */
  def parent(id: Long, level: Int): Long = {
    require(level >= 0 && level <= MaxLevel, s"s2 level must be 0..30, got $level")
    val lsb = 1L << (2 * (MaxLevel - level))
    (id & -lsb) | lsb
  }

  def level(id: Long): Int = MaxLevel - (java.lang.Long.numberOfTrailingZeros(id) >> 1)

  /** Cell at `level` containing lon/lat. */
  def cellAt(lonDeg: Double, latDeg: Double, lvl: Int): Long =
    parent(leafFromLonLat(lonDeg, latDeg), lvl)

  /** Decode id -> (face, level, i, j) with i, j at that level's
    * resolution (0 until 2^level). */
  def decode(id: Long): (Int, Int, Int, Int) = {
    val f = (id >>> 61).toInt
    val lvl = level(id)
    var orientation = f & SwapMask
    var i = 0; var j = 0
    var k = 0
    while (k < lvl) {
      val pos2 = ((id >>> (59 - 2 * k)) & 3L).toInt
      val ij2 = posToIJ(orientation)(pos2)
      i = (i << 1) | (ij2 >> 1)
      j = (j << 1) | (ij2 & 1)
      orientation ^= posToOrient(pos2)
      k += 1
    }
    (f, lvl, i, j)
  }

  private def lonLatOfUv(f: Int, u: Double, v: Double): (Double, Double) = {
    val (x, y, z) = faceUvToXyz(f, u, v)
    val deg = 180.0 / math.Pi
    (math.atan2(y, x) * deg, math.atan2(z, math.sqrt(x * x + y * y)) * deg)
  }

  /** The four cell corners in lon-lat degrees, counter-clockwise in uv
    * space. Edges are geodesics on the sphere; this planar quad is the
    * corner polygon (documented approximation, degenerate only for the
    * two pole-centered level-0 cells' center point). */
  def corners(id: Long): Array[(Double, Double)] = {
    val (f, lvl, i, j) = decode(id)
    val span = 1L << (MaxLevel - lvl)
    val sLo = (i.toLong * span).toDouble / (1L << MaxLevel).toDouble
    val sHi = ((i.toLong + 1L) * span).toDouble / (1L << MaxLevel).toDouble
    val tLo = (j.toLong * span).toDouble / (1L << MaxLevel).toDouble
    val tHi = ((j.toLong + 1L) * span).toDouble / (1L << MaxLevel).toDouble
    val (uLo, uHi) = (stToUv(sLo), stToUv(sHi))
    val (vLo, vHi) = (stToUv(tLo), stToUv(tHi))
    Array(lonLatOfUv(f, uLo, vLo), lonLatOfUv(f, uHi, vLo),
      lonLatOfUv(f, uHi, vHi), lonLatOfUv(f, uLo, vHi))
  }

  /** Cell at `level` adjacent to (face, i, j) by (di, dj) steps, with
    * face wrapping: project the neighbor's center slightly off-face and
    * re-encode through xyz (the canonical wrap construction). */
  def neighbor(id: Long, di: Int, dj: Int): Long = {
    val (f, lvl, i, j) = decode(id)
    val size = 1.0 / (1L << lvl).toDouble
    val sC = (i + di + 0.5) * size
    val tC = (j + dj + 0.5) * size
    val (x, y, z) = faceUvToXyz(f, stToUv(sC), stToUv(tC))
    val norm = math.sqrt(x * x + y * y + z * z)
    val f2 = face(x / norm, y / norm, z / norm)
    val (u2, v2) = faceUv(f2, x / norm, y / norm, z / norm)
    parent(fromFaceIj(f2, stToIj(uvToSt(u2)), stToIj(uvToSt(v2))), lvl)
  }

  /** Conservative lon/lat sampling step (degrees) that guarantees the
    * sample-plus-neighbors cover is a superset of the true cell cover:
    * every level-l cell spans at least ~8.5 deg / 2^l of great-circle
    * angle per axis, and lon-degree extents only widen toward the
    * poles. */
  def sampleStepDeg(lvl: Int): Double = 4.0 / (1L << lvl).toDouble

  /** Cells at `level` covering `g`'s envelope: grid samples at half the
    * minimum cell extent, each sample's cell plus its 8 neighbors.
    * Superset of the exact cover, tight to within one cell ring. */
  def cover(g: Geometry, lvl: Int, maxSamples: Int = 1 << 18): Array[Long] = {
    g match {
      case p: Point => return Array(cellAt(p.getX, p.getY, lvl))
      case _ => ()
    }
    val env = g.getEnvelopeInternal
    val step = sampleStepDeg(lvl)
    val nLon = math.ceil((env.getWidth + 2.0 * step) / step).toLong + 1L
    val nLat = math.ceil((env.getHeight + 2.0 * step) / step).toLong + 1L
    require(nLon * nLat <= maxSamples.toLong,
      s"st_s2cellids: level $lvl over a ${env.getWidth}x${env.getHeight} deg envelope needs " +
        s"${nLon * nLat} samples (max $maxSamples); lower the level or subdivide the geometry")
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var a = 0L
    while (a < nLon) {
      val lon = env.getMinX - step + a.toDouble * step
      var b = 0L
      while (b < nLat) {
        val lat = math.max(-90.0, math.min(90.0, env.getMinY - step + b.toDouble * step))
        seen.add(cellAt(lon, lat, lvl))
        b += 1
      }
      a += 1
    }
    val base = seen.toArray(new Array[java.lang.Long](0))
    base.foreach { id =>
      var di = -1
      while (di <= 1) {
        var dj = -1
        while (dj <= 1) {
          if (di != 0 || dj != 0) seen.add(neighbor(id, di, dj))
          dj += 1
        }
        di += 1
      }
    }
    val outArr = seen.toArray(new Array[java.lang.Long](0)).map(_.longValue)
    java.util.Arrays.sort(outArr)
    outArr
  }
}

/** st_s2cellids(geom, level): S2 cell ids (levels 0..30) covering the
  * geometry. Points map to exactly their containing cell; other
  * geometries get a guaranteed-superset envelope cover (sample grid at
  * half the minimum cell extent plus one neighbor ring), the join-key
  * contract: A intersects B implies their cell sets intersect at the
  * same level. */
case class StS2CellIds(left: Expression, right: Expression) extends StNary {
  override def children: Seq[Expression] = Seq(left, right)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes() =
    StKit.checkTypes(prettyName, Seq(left -> "geometry", right -> "numeric"))
  protected def run(vs: Seq[Any]): Any = {
    val lvl = int(vs(1))
    require(lvl >= 0 && lvl <= S2.MaxLevel, s"st_s2cellids level must be 0..30, got $lvl")
    new GenericArrayData(S2.cover(geom(vs(0)), lvl))
  }
  override def prettyName: String = "st_s2cellids"
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(cs(0), cs(1))
}

/** st_s2togeom(cellIds): corner-quad polygon per S2 cell id, parallel to
  * the input array. */
case class StS2ToGeom(child: Expression) extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(LongType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"st_s2togeom expects ARRAY<BIGINT>, got ${t.sql}")
  }
  def compute(arr: Any): Any = {
    val a = arr.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val polys = new Array[Any](a.numElements())
    var i = 0
    while (i < a.numElements()) {
      val cs = S2.corners(a.getLong(i))
      val ring = (cs :+ cs(0)).map { case (lon, lat) => new Coordinate(lon, lat) }
      polys(i) = out(Geom.factory.createPolygon(ring))
      i += 1
    }
    new GenericArrayData(polys)
  }
  override def nullSafeEval(input: Any): Any = compute(input)
  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) = {
    val ref = ctx.addReferenceObj("s2Expr", this, classOf[StS2ToGeom].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($a);")
  }
  override def prettyName: String = "st_s2togeom"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}
