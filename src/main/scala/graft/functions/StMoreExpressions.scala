package graft.functions

import graft.geom.Geom

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.locationtech.jts.algorithm.MinimumBoundingCircle
import org.locationtech.jts.algorithm.distance.DiscreteHausdorffDistance
import org.locationtech.jts.algorithm.hull.ConcaveHull
import org.locationtech.jts.geom.util.AffineTransformation
import org.locationtech.jts.geom.{Coordinate, Geometry, LineString, Point}
import org.locationtech.jts.linearref.LengthIndexedLine
import org.locationtech.jts.operation.linemerge.LineMerger
import org.locationtech.jts.precision.GeometryPrecisionReducer

import StKit._

/**
 * Catalog-breadth tier 2 (SURVEY.md §2.3/§2.5 extension): the next slice
 * of the Sedona function surface the reference registers wholesale
 * (reference: extension/.../UDF/SedonaExpressionsRegistrator.scala:37) —
 * linear referencing, geohash, affine transforms, shape diagnostics,
 * distance metrics, dump/multi accessors. All JTS-backed Catalyst
 * expressions over WKB with the same codegen'd bases as the core catalog.
 */

// ---------------------------------------------------------------------------
// GeoHash (standard base32 interleaved encoding — public algorithm)
// ---------------------------------------------------------------------------

object GeoHash {
  private val Base32 = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Standard geohash of (lon, lat) at `precision` chars. */
  def encode(lon: Double, lat: Double, precision: Int): String = {
    var lonLo = -180.0; var lonHi = 180.0; var latLo = -90.0; var latHi = 90.0
    val sb = new StringBuilder(precision)
    var bit = 0; var ch = 0; var evenBit = true
    while (sb.length < precision) {
      if (evenBit) {
        val mid = (lonLo + lonHi) / 2
        if (lon >= mid) { ch = (ch << 1) | 1; lonLo = mid } else { ch = ch << 1; lonHi = mid }
      } else {
        val mid = (latLo + latHi) / 2
        if (lat >= mid) { ch = (ch << 1) | 1; latLo = mid } else { ch = ch << 1; latHi = mid }
      }
      evenBit = !evenBit
      bit += 1
      if (bit == 5) { sb.append(Base32.charAt(ch)); bit = 0; ch = 0 }
    }
    sb.toString
  }

  /** Cell bounds (lonLo, lonHi, latLo, latHi). The interval halving
    * keeps every bound an exact dyadic multiple of 45 * 2^-k, so
    * equality with floor-arithmetic replicas (the DuckDB oracle) is
    * bit-exact. */
  def decodeBounds(hash: String): (Double, Double, Double, Double) = {
    var lonLo = -180.0; var lonHi = 180.0; var latLo = -90.0; var latHi = 90.0
    var evenBit = true
    hash.foreach { c =>
      val idx = Base32.indexOf(c.toLower)
      require(idx >= 0, s"invalid geohash char '$c'")
      var b = 4
      while (b >= 0) {
        val set = ((idx >> b) & 1) == 1
        if (evenBit) {
          val mid = (lonLo + lonHi) / 2
          if (set) lonLo = mid else lonHi = mid
        } else {
          val mid = (latLo + latHi) / 2
          if (set) latLo = mid else latHi = mid
        }
        evenBit = !evenBit
        b -= 1
      }
    }
    (lonLo, lonHi, latLo, latHi)
  }

  /** Center (lon, lat) of the geohash cell. */
  def decodeCenter(hash: String): (Double, Double) = {
    val (lonLo, lonHi, latLo, latHi) = decodeBounds(hash)
    ((lonLo + lonHi) / 2, (latLo + latHi) / 2)
  }
}

/** st_geohash(geom, precision): geohash of the centroid (x=lon, y=lat). */
case class StGeoHash(children: Seq[Expression]) extends StNary {
  override def dataType: DataType = StringType
  override def checkInputDataTypes() =
    StKit.checkTypes(prettyName, Seq(children(0) -> "geometry", children(1) -> "numeric"))
  protected def run(vs: Seq[Any]): Any = {
    val c = geom(vs(0)).getCentroid
    val p = int(vs(1))
    require(p >= 1 && p <= 20, s"st_geohash precision must be 1..20, got $p")
    str(GeoHash.encode(c.getX, c.getY, p))
  }
  override def prettyName: String = "st_geohash"
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression = copy(cs)
}

/** st_pointfromgeohash(hash): center point of the cell. */
case class StPointFromGeoHash(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes() = StKit.checkTypes(prettyName, Seq(child -> "string"))
  def fromHash(s: UTF8String): Array[Byte] = {
    val (lon, lat) = GeoHash.decodeCenter(s.toString)
    out(Geom.point(lon, lat))
  }
  override def nullSafeEval(input: Any): Any = fromHash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) = {
    val ref = ctx.addReferenceObj("ghExpr", this, classOf[StPointFromGeoHash].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.fromHash($a);")
  }
  override def prettyName: String = "st_pointfromgeohash"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

// ---------------------------------------------------------------------------
// Linear referencing
// ---------------------------------------------------------------------------

private[functions] object LineRef {
  def asLine(g: Geometry, fn: String): LineString = g match {
    case l: LineString => l
    case other => throw new IllegalArgumentException(
      s"$fn expects a LINESTRING, got ${other.getGeometryType}")
  }
  def clampFrac(f: Double): Double = math.min(1.0, math.max(0.0, f))
}

/** st_lineinterpolatepoint(line, fraction): point at fraction of length. */
case class StLineInterpolatePoint(left: Expression, right: Expression) extends StNary {
  override def children: Seq[Expression] = Seq(left, right)
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes() =
    StKit.checkTypes(prettyName, Seq(left -> "geometry", right -> "numeric"))
  protected def run(vs: Seq[Any]): Any = {
    val l = LineRef.asLine(geom(vs(0)), prettyName)
    val f = LineRef.clampFrac(dbl(vs(1)))
    out(l.getFactory.createPoint(new LengthIndexedLine(l).extractPoint(f * l.getLength)))
  }
  override def prettyName: String = "st_lineinterpolatepoint"
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(cs(0), cs(1))
}

/** st_linesubstring(line, startFrac, endFrac): sub-line between fractions. */
case class StLineSubstring(children: Seq[Expression]) extends StNary {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes() = StKit.checkTypes(prettyName,
    Seq(children(0) -> "geometry", children(1) -> "numeric", children(2) -> "numeric"))
  protected def run(vs: Seq[Any]): Any = {
    val l = LineRef.asLine(geom(vs(0)), prettyName)
    val s = LineRef.clampFrac(dbl(vs(1))); val e = LineRef.clampFrac(dbl(vs(2)))
    require(s <= e, s"st_linesubstring requires start <= end, got $s > $e")
    out(new LengthIndexedLine(l).extractLine(s * l.getLength, e * l.getLength))
  }
  override def prettyName: String = "st_linesubstring"
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression = copy(cs)
}

/** st_linelocatepoint(line, point): fraction of length nearest to point. */
case class StLineLocatePoint(left: Expression, right: Expression) extends StBinary {
  override def dataType: DataType = DoubleType
  protected def run(l: Geometry, p: Geometry): Any = {
    val line = LineRef.asLine(l, prettyName)
    val len = line.getLength
    if (len == 0.0) 0.0
    else new LengthIndexedLine(line).indexOf(p.getCoordinate) / len
  }
  override def prettyName: String = "st_linelocatepoint"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** st_linemerge(geom): merge a (multi)linestring's pieces. */
case class StLineMerge(child: Expression) extends StUnary {
  override def dataType: DataType = BinaryType
  protected def run(g: Geometry): Any = {
    val merger = new LineMerger()
    merger.add(g)
    val merged = merger.getMergedLineStrings
    val lines = new Array[LineString](merged.size())
    var i = 0
    val it = merged.iterator()
    while (it.hasNext) { lines(i) = it.next().asInstanceOf[LineString]; i += 1 }
    out(
      if (lines.length == 1) lines(0)
      else g.getFactory.createMultiLineString(lines))
  }
  override def prettyName: String = "st_linemerge"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

// ---------------------------------------------------------------------------
// Affine transforms
// ---------------------------------------------------------------------------

/** st_rotate(geom, angleRadians): rotate about the origin. */
case class StRotate(left: Expression, right: Expression) extends StNary {
  override def children: Seq[Expression] = Seq(left, right)
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes() =
    StKit.checkTypes(prettyName, Seq(left -> "geometry", right -> "numeric"))
  protected def run(vs: Seq[Any]): Any =
    out(AffineTransformation.rotationInstance(dbl(vs(1))).transform(geom(vs(0))))
  override def prettyName: String = "st_rotate"
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(cs(0), cs(1))
}

/** st_scale(geom, sx, sy): scale about the origin. */
case class StScale(children: Seq[Expression]) extends StNary {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes() = StKit.checkTypes(prettyName,
    Seq(children(0) -> "geometry", children(1) -> "numeric", children(2) -> "numeric"))
  protected def run(vs: Seq[Any]): Any =
    out(AffineTransformation.scaleInstance(dbl(vs(1)), dbl(vs(2))).transform(geom(vs(0))))
  override def prettyName: String = "st_scale"
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression = copy(cs)
}

/** st_affine(geom, a, b, d, e, xoff, yoff): x' = a x + b y + xoff,
  * y' = d x + e y + yoff (PostGIS 2-D parameter order). */
case class StAffine(children: Seq[Expression]) extends StNary {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes() = StKit.checkTypes(prettyName,
    (children(0) -> "geometry") +: children.tail.map(_ -> "numeric"))
  protected def run(vs: Seq[Any]): Any = {
    val Seq(a, b, d, e, xoff, yoff) = vs.tail.map(dbl)
    out(new AffineTransformation(a, b, xoff, d, e, yoff).transform(geom(vs(0))))
  }
  override def prettyName: String = "st_affine"
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression = copy(cs)
}

// ---------------------------------------------------------------------------
// Shape diagnostics + derived shapes
// ---------------------------------------------------------------------------

case class StIsSimple(child: Expression) extends StUnary {
  override def dataType: DataType = BooleanType
  protected def run(g: Geometry): Any = g.isSimple
  override def prettyName: String = "st_issimple"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** st_isring: closed AND simple linestring. */
case class StIsRing(child: Expression) extends StUnary {
  override def dataType: DataType = BooleanType
  protected def run(g: Geometry): Any = g match {
    case l: LineString => l.isClosed && l.isSimple
    case _ => false
  }
  override def prettyName: String = "st_isring"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** st_pointonsurface: a point guaranteed inside the geometry. */
case class StPointOnSurface(child: Expression) extends StUnary {
  override def dataType: DataType = BinaryType
  protected def run(g: Geometry): Any = out(g.getInteriorPoint)
  override def prettyName: String = "st_pointonsurface"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

case class StMinimumBoundingCircle(child: Expression) extends StUnary {
  override def dataType: DataType = BinaryType
  protected def run(g: Geometry): Any = out(new MinimumBoundingCircle(g).getCircle)
  override def prettyName: String = "st_minimumboundingcircle"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

case class StMinimumBoundingRadius(child: Expression) extends StUnary {
  override def dataType: DataType = DoubleType
  protected def run(g: Geometry): Any = new MinimumBoundingCircle(g).getRadius
  override def prettyName: String = "st_minimumboundingradius"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** st_concavehull(geom, lengthRatio): JTS ConcaveHull (1 = convex hull). */
case class StConcaveHull(left: Expression, right: Expression) extends StNary {
  override def children: Seq[Expression] = Seq(left, right)
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes() =
    StKit.checkTypes(prettyName, Seq(left -> "geometry", right -> "numeric"))
  protected def run(vs: Seq[Any]): Any =
    out(ConcaveHull.concaveHullByLengthRatio(geom(vs(0)), dbl(vs(1))))
  override def prettyName: String = "st_concavehull"
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(cs(0), cs(1))
}

/** st_reduceprecision(geom, gridSize): snap coordinates to a grid. */
case class StReducePrecision(left: Expression, right: Expression) extends StNary {
  override def children: Seq[Expression] = Seq(left, right)
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes() =
    StKit.checkTypes(prettyName, Seq(left -> "geometry", right -> "numeric"))
  protected def run(vs: Seq[Any]): Any = {
    val grid = dbl(vs(1))
    require(grid > 0, s"st_reduceprecision gridSize must be > 0, got $grid")
    out(GeometryPrecisionReducer.reduce(geom(vs(0)),
      new org.locationtech.jts.geom.PrecisionModel(1.0 / grid)))
  }
  override def prettyName: String = "st_reduceprecision"
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(cs(0), cs(1))
}

/** st_snap(geom, reference, tolerance): snap vertices to the reference. */
case class StSnap(children: Seq[Expression]) extends StNary {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes() = StKit.checkTypes(prettyName,
    Seq(children(0) -> "geometry", children(1) -> "geometry", children(2) -> "numeric"))
  protected def run(vs: Seq[Any]): Any =
    out(org.locationtech.jts.operation.overlay.snap.GeometrySnapper
      .snap(geom(vs(0)), geom(vs(1)), dbl(vs(2)))(0))
  override def prettyName: String = "st_snap"
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression = copy(cs)
}

/** st_boundingdiagonal: LINESTRING (xmin ymin, xmax ymax). */
case class StBoundingDiagonal(child: Expression) extends StUnary {
  override def dataType: DataType = BinaryType
  protected def run(g: Geometry): Any = {
    val e = g.getEnvelopeInternal
    out(g.getFactory.createLineString(Array(
      new Coordinate(e.getMinX, e.getMinY), new Coordinate(e.getMaxX, e.getMaxY))))
  }
  override def prettyName: String = "st_boundingdiagonal"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** st_expand(geom, d): envelope grown by d as a polygon. */
case class StExpand(children: Seq[Expression]) extends StNary {
  require(children.length == 2 || children.length == 3,
    s"st_expand expects (geom, d) or (geom, dx, dy), got ${children.length} args")
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes() =
    StKit.checkTypes(prettyName,
      Seq(children(0) -> "geometry") ++ children.drop(1).map(_ -> "numeric"))
  protected def run(vs: Seq[Any]): Any = {
    val e = geom(vs(0)).getEnvelopeInternal
    val dx = dbl(vs(1))
    val dy = if (vs.length > 2) dbl(vs(2)) else dx
    out(Geom.polygonFromEnvelope(e.getMinX - dx, e.getMinY - dy, e.getMaxX + dx, e.getMaxY + dy))
  }
  override def prettyName: String = "st_expand"
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(cs)
}

// ---------------------------------------------------------------------------
// Distance metrics
// ---------------------------------------------------------------------------

case class StHausdorffDistance(left: Expression, right: Expression) extends StBinary {
  override def dataType: DataType = DoubleType
  protected def run(l: Geometry, r: Geometry): Any = DiscreteHausdorffDistance.distance(l, r)
  override def prettyName: String = "st_hausdorffdistance"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

case class StFrechetDistance(left: Expression, right: Expression) extends StBinary {
  override def dataType: DataType = DoubleType
  protected def run(l: Geometry, r: Geometry): Any =
    org.locationtech.jts.algorithm.distance.DiscreteFrechetDistance.distance(l, r)
  override def prettyName: String = "st_frechetdistance"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** st_angle(p1, p2, p3): unoriented angle at vertex p2, in radians. */
case class StAngle(children: Seq[Expression]) extends StNary {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes() =
    StKit.checkTypes(prettyName, children.map(_ -> "geometry"))
  protected def run(vs: Seq[Any]): Any = {
    def pt(a: Any): Coordinate = geom(a) match {
      case p: Point => p.getCoordinate
      case other => throw new IllegalArgumentException(
        s"st_angle expects points, got ${other.getGeometryType}")
    }
    org.locationtech.jts.algorithm.Angle.angleBetween(pt(vs(0)), pt(vs(1)), pt(vs(2)))
  }
  override def prettyName: String = "st_angle"
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression = copy(cs)
}

// ---------------------------------------------------------------------------
// Structure accessors / converters
// ---------------------------------------------------------------------------

/** st_dump: every atomic geometry inside a collection, as WKB array. */
case class StDump(child: Expression) extends StUnary {
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  protected def run(g: Geometry): Any = {
    val out0 = new Array[Any](g.getNumGeometries)
    var i = 0
    while (i < out0.length) { out0(i) = out(g.getGeometryN(i)); i += 1 }
    new GenericArrayData(out0)
  }
  override def prettyName: String = "st_dump"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** st_dumppoints: every vertex as a WKB point array. */
case class StDumpPoints(child: Expression) extends StUnary {
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  protected def run(g: Geometry): Any = {
    val cs = g.getCoordinates
    val out0 = new Array[Any](cs.length)
    var i = 0
    while (i < cs.length) { out0(i) = out(g.getFactory.createPoint(cs(i))); i += 1 }
    new GenericArrayData(out0)
  }
  override def prettyName: String = "st_dumppoints"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** st_multi: promote to the Multi* variant (no-op for collections). */
case class StMulti(child: Expression) extends StUnary {
  override def dataType: DataType = BinaryType
  protected def run(g: Geometry): Any = out(g match {
    case p: Point => g.getFactory.createMultiPoint(Array(p))
    case l: LineString => g.getFactory.createMultiLineString(Array(l))
    case p: org.locationtech.jts.geom.Polygon => g.getFactory.createMultiPolygon(Array(p))
    case other => other
  })
  override def prettyName: String = "st_multi"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** st_force2d: graft geometry is always 2-D WKB — normalizing identity. */
case class StForce2D(child: Expression) extends StUnary {
  override def dataType: DataType = BinaryType
  protected def run(g: Geometry): Any = {
    // rebuild with XY-only coordinates so the Z-aware serde writes 2D WKB
    val editor = new org.locationtech.jts.geom.util.GeometryEditor(g.getFactory)
    out(editor.edit(g, new org.locationtech.jts.geom.util.GeometryEditor.CoordinateOperation {
      override def edit(coords: Array[Coordinate], geometry: Geometry): Array[Coordinate] =
        coords.map(c => new Coordinate(c.x, c.y))
    }))
  }
  override def prettyName: String = "st_force2d"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** st_asewkt: 'SRID=n;WKT' (PostGIS extended WKT). */
case class StAsEwkt(child: Expression) extends StUnary {
  override def dataType: DataType = StringType
  protected def run(g: Geometry): Any = {
    val srid = if (g.getSRID == 0) 4326 else g.getSRID
    str(s"SRID=$srid;${Geom.toWkt(g)}")
  }
  override def prettyName: String = "st_asewkt"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** st_addpoint(line, point[, index]): insert vertex (default: append). */
case class StAddPoint(children: Seq[Expression]) extends StNary {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes() = StKit.checkTypes(prettyName,
    Seq(children(0) -> "geometry", children(1) -> "geometry") ++
      children.drop(2).map(_ -> "numeric"))
  protected def run(vs: Seq[Any]): Any = {
    val l = LineRef.asLine(geom(vs(0)), prettyName)
    val p = geom(vs(1)).getCoordinate
    val cs = l.getCoordinates
    val idx = if (vs.length > 2) int(vs(2)) else cs.length
    require(idx >= 0 && idx <= cs.length, s"st_addpoint index $idx out of [0, ${cs.length}]")
    val nc = new Array[Coordinate](cs.length + 1)
    System.arraycopy(cs, 0, nc, 0, idx)
    nc(idx) = p
    System.arraycopy(cs, idx, nc, idx + 1, cs.length - idx)
    out(l.getFactory.createLineString(nc))
  }
  override def prettyName: String = "st_addpoint"
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression = copy(cs)
}

/** st_interiorringn(polygon, n): nth interior ring, 1-based (PostGIS
  * convention, same as st_pointn); NULL when out of range / not a polygon. */
case class StInteriorRingN(left: Expression, right: Expression) extends StNary {
  override def children: Seq[Expression] = Seq(left, right)
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes() =
    StKit.checkTypes(prettyName, Seq(left -> "geometry", right -> "numeric"))
  override def nullable: Boolean = true
  protected def run(vs: Seq[Any]): Any = geom(vs(0)) match {
    case p: org.locationtech.jts.geom.Polygon =>
      val n = int(vs(1))
      if (n >= 1 && n <= p.getNumInteriorRing) out(p.getInteriorRingN(n - 1)) else null
    case _ => null
  }
  override def prettyName: String = "st_interiorringn"
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(cs(0), cs(1))
}

/** st_makepolygon(shellLine[, holesArray]): polygon from a closed ring. */
case class StMakePolygon(children: Seq[Expression]) extends StNary {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes() =
    StKit.checkTypes(prettyName, Seq(children(0) -> "geometry"))
  protected def run(vs: Seq[Any]): Any = {
    val shell = geom(vs(0)) match {
      case l: LineString if l.isClosed => l.getFactory.createLinearRing(l.getCoordinateSequence)
      case other => throw new IllegalArgumentException(
        s"st_makepolygon expects a closed LINESTRING shell, got ${other.getGeometryType}")
    }
    val holes =
      if (vs.length < 2) Array.empty[org.locationtech.jts.geom.LinearRing]
      else {
        val arr = vs(1).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        (0 until arr.numElements()).map { i =>
          Geom.deserialize(arr.getBinary(i)) match {
            case l: LineString if l.isClosed => l.getFactory.createLinearRing(l.getCoordinateSequence)
            case other => throw new IllegalArgumentException(
              s"st_makepolygon hole ${i + 1} must be a closed LINESTRING, got ${other.getGeometryType}")
          }
        }.toArray
      }
    out(shell.getFactory.createPolygon(shell, holes))
  }
  override def prettyName: String = "st_makepolygon"
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression = copy(cs)
}

/** st_collectionextract(geom, dim): members of dimension dim (1 point,
  * 2 line, 3 polygon) as the matching Multi* geometry. */
case class StCollectionExtract(left: Expression, right: Expression) extends StNary {
  override def children: Seq[Expression] = Seq(left, right)
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes() =
    StKit.checkTypes(prettyName, Seq(left -> "geometry", right -> "numeric"))
  protected def run(vs: Seq[Any]): Any = {
    val g = geom(vs(0))
    val want = int(vs(1))
    require(want >= 1 && want <= 3, s"st_collectionextract dim must be 1..3, got $want")
    val fac = g.getFactory
    val parts = (0 until g.getNumGeometries).map(g.getGeometryN).filter {
      case _: Point => want == 1
      case _: LineString => want == 2
      case _: org.locationtech.jts.geom.Polygon => want == 3
      case _ => false
    }
    out(want match {
      case 1 => fac.createMultiPoint(parts.map(_.asInstanceOf[Point]).toArray)
      case 2 => fac.createMultiLineString(parts.map(_.asInstanceOf[LineString]).toArray)
      case 3 => fac.createMultiPolygon(parts.map(_.asInstanceOf[org.locationtech.jts.geom.Polygon]).toArray)
    })
  }
  override def prettyName: String = "st_collectionextract"
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(cs(0), cs(1))
}

/** st_removepoint(line, index): delete vertex. */
case class StRemovePoint(left: Expression, right: Expression) extends StNary {
  override def children: Seq[Expression] = Seq(left, right)
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes() =
    StKit.checkTypes(prettyName, Seq(left -> "geometry", right -> "numeric"))
  protected def run(vs: Seq[Any]): Any = {
    val l = LineRef.asLine(geom(vs(0)), prettyName)
    val cs = l.getCoordinates
    val idx = int(vs(1))
    require(idx >= 0 && idx < cs.length, s"st_removepoint index $idx out of [0, ${cs.length})")
    require(cs.length > 2, "st_removepoint: a linestring needs at least 2 points")
    out(l.getFactory.createLineString(cs.patch(idx, Nil, 1)))
  }
  override def prettyName: String = "st_removepoint"
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(cs(0), cs(1))
}
