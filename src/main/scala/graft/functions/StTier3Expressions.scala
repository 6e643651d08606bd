package graft.functions

import graft.geom.Geom

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.locationtech.jts.algorithm.construct.MaximumInscribedCircle
import org.locationtech.jts.densify.Densifier
import org.locationtech.jts.geom.{Coordinate, Geometry, LineString, Polygon}
import org.locationtech.jts.operation.buffer.{BufferOp, BufferParameters, OffsetCurve}
import org.locationtech.jts.operation.distance.DistanceOp
import org.locationtech.jts.operation.distance3d.Distance3DOp
import org.locationtech.jts.operation.polygonize.Polygonizer
import org.locationtech.jts.operation.union.UnaryUnionOp
import org.locationtech.jts.operation.valid.IsValidOp
import org.locationtech.jts.precision.MinimumClearance
import org.locationtech.jts.simplify.VWSimplifier
import org.locationtech.jts.triangulate.polygon.ConstrainedDelaunayTriangulator
import org.locationtech.jts.triangulate.{DelaunayTriangulationBuilder, VoronoiDiagramBuilder}

import StKit._

/**
 * Catalog-breadth tier 3 (SURVEY.md §2.5 extension): topology analysis
 * (DE-9IM), linework assembly (polygonize / node / build-area), shortest /
 * longest connecting lines, triangulations, splitting and subdivision,
 * deterministic point generation, styled buffers, and the Z-coordinate
 * family. Continues the Sedona-surface match the reference registers
 * wholesale (reference: extension/.../SedonaIcebergExtensions.scala:38);
 * every function is a JTS-1.20-backed Catalyst expression over WKB with
 * the same codegen'd bases as the core catalog.
 */

// ---------------------------------------------------------------------------
// Topology analysis
// ---------------------------------------------------------------------------

/** st_relate(g1, g2): the DE-9IM intersection matrix as a 9-char string. */
case class StRelate(left: Expression, right: Expression) extends StBinary {
  override def dataType: DataType = StringType
  protected def run(l: Geometry, r: Geometry): Any = str(l.relate(r).toString)
  override def prettyName: String = "st_relate"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** st_relatematch(matrix, pattern): does a DE-9IM matrix satisfy a pattern
  * (e.g. 'T*F**F***' = within)? Both args are strings. */
case class StRelateMatch(left: Expression, right: Expression) extends StNary {
  override def children: Seq[Expression] = Seq(left, right)
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes() =
    StKit.checkTypes(prettyName, Seq(left -> "string", right -> "string"))
  protected def run(vs: Seq[Any]): Any =
    org.locationtech.jts.geom.IntersectionMatrix.matches(vs(0).toString, vs(1).toString)
  override def prettyName: String = "st_relatematch"
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(cs(0), cs(1))
}

/** st_isvalidreason: human-readable validity diagnostic ('Valid Geometry'
  * or the failure + location). */
case class StIsValidReason(child: Expression) extends StUnary {
  override def dataType: DataType = StringType
  protected def run(g: Geometry): Any = {
    val op = new IsValidOp(g)
    val err = op.getValidationError
    str(if (err == null) "Valid Geometry" else err.toString)
  }
  override def prettyName: String = "st_isvalidreason"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** st_minimumclearance: the smallest vertex move that would invalidate the
  * geometry — a robustness measure (Infinity for degenerate inputs). */
case class StMinimumClearance(child: Expression) extends StUnary {
  override def dataType: DataType = DoubleType
  protected def run(g: Geometry): Any = MinimumClearance.getDistance(g)
  override def prettyName: String = "st_minimumclearance"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** st_minimumclearanceline: the 2-point line realizing the minimum clearance. */
case class StMinimumClearanceLine(child: Expression) extends StUnary {
  override def dataType: DataType = BinaryType
  protected def run(g: Geometry): Any = out(MinimumClearance.getLine(g))
  override def prettyName: String = "st_minimumclearanceline"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

// ---------------------------------------------------------------------------
// Linework assembly
// ---------------------------------------------------------------------------

/** st_polygonize: assemble polygons from fully-noded linework; returns a
  * GEOMETRYCOLLECTION of the polygons formed (empty when none close). */
case class StPolygonize(child: Expression) extends StUnary {
  override def dataType: DataType = BinaryType
  protected def run(g: Geometry): Any = {
    val p = new Polygonizer()
    p.add(g)
    val polys = p.getPolygons.toArray(Array.empty[Object]).map(_.asInstanceOf[Geometry])
    out(g.getFactory.createGeometryCollection(polys))
  }
  override def prettyName: String = "st_polygonize"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** st_buildarea: areal geometry formed by the input's linework (noded
  * first, so raw un-noded boundaries work); NULL when no area closes. */
case class StBuildArea(child: Expression) extends StUnary {
  override def dataType: DataType = BinaryType
  override protected def mayReturnNull: Boolean = true
  protected def run(g: Geometry): Any = {
    val p = new Polygonizer()
    p.add(UnaryUnionOp.union(g)) // node crossings before polygonizing
    val polys = p.getPolygons.toArray(Array.empty[Object]).map(_.asInstanceOf[Geometry])
    if (polys.isEmpty) null
    else out(UnaryUnionOp.union(g.getFactory.createGeometryCollection(polys)))
  }
  override def prettyName: String = "st_buildarea"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** st_node: node a set of linestrings — add vertices at every crossing
  * (the preprocessing step polygonize expects). */
case class StNode(child: Expression) extends StUnary {
  override def dataType: DataType = BinaryType
  protected def run(g: Geometry): Any = out(UnaryUnionOp.union(g))
  override def prettyName: String = "st_node"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** st_unaryunion: dissolve a collection/multi-geometry into its union. */
case class StUnaryUnion(child: Expression) extends StUnary {
  override def dataType: DataType = BinaryType
  protected def run(g: Geometry): Any = out(UnaryUnionOp.union(g))
  override def prettyName: String = "st_unaryunion"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

// ---------------------------------------------------------------------------
// Connecting lines & densification
// ---------------------------------------------------------------------------

/** st_shortestline(g1, g2): 2-point line between the nearest points. */
case class StShortestLine(left: Expression, right: Expression) extends StBinary {
  override def dataType: DataType = BinaryType
  protected def run(l: Geometry, r: Geometry): Any = {
    val pts = DistanceOp.nearestPoints(l, r)
    out(l.getFactory.createLineString(pts))
  }
  override def prettyName: String = "st_shortestline"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** st_longestline(g1, g2): 2-point line between the farthest vertices
  * (computed over convex hull vertices — the max is always attained there). */
case class StLongestLine(left: Expression, right: Expression) extends StBinary {
  override def dataType: DataType = BinaryType
  protected def run(l: Geometry, r: Geometry): Any = {
    val (a, b) = StTier3.farthestVertices(l, r)
    out(l.getFactory.createLineString(Array(a, b)))
  }
  override def prettyName: String = "st_longestline"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** st_maxdistance(g1, g2): the largest distance between any two points of
  * the geometries (the length of st_longestline). */
case class StMaxDistance(left: Expression, right: Expression) extends StBinary {
  override def dataType: DataType = DoubleType
  protected def run(l: Geometry, r: Geometry): Any = {
    val (a, b) = StTier3.farthestVertices(l, r)
    a.distance(b)
  }
  override def prettyName: String = "st_maxdistance"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** st_segmentize(geom, maxLength): add vertices so no segment exceeds
  * maxLength (JTS Densifier). */
case class StSegmentize(left: Expression, right: Expression) extends StNary {
  override def children: Seq[Expression] = Seq(left, right)
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes() =
    StKit.checkTypes(prettyName, Seq(left -> "geometry", right -> "numeric"))
  protected def run(vs: Seq[Any]): Any = {
    val maxLen = dbl(vs(1))
    require(maxLen > 0, s"st_segmentize maxLength must be > 0, got $maxLen")
    out(Densifier.densify(geom(vs(0)), maxLen))
  }
  override def prettyName: String = "st_segmentize"
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(cs(0), cs(1))
}

/** st_offsetcurve(line, distance): line offset to the left (positive) or
  * right (negative) of the input. */
case class StOffsetCurve(left: Expression, right: Expression) extends StNary {
  override def children: Seq[Expression] = Seq(left, right)
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes() =
    StKit.checkTypes(prettyName, Seq(left -> "geometry", right -> "numeric"))
  protected def run(vs: Seq[Any]): Any = out(OffsetCurve.getCurve(geom(vs(0)), dbl(vs(1))))
  override def prettyName: String = "st_offsetcurve"
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(cs(0), cs(1))
}

/** st_simplifyvw(geom, areaTolerance): Visvalingam–Whyatt simplification
  * (drops the least-area-significant vertices; better shape retention than
  * Douglas–Peucker for natural features). */
case class StSimplifyVW(left: Expression, right: Expression) extends StNary {
  override def children: Seq[Expression] = Seq(left, right)
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes() =
    StKit.checkTypes(prettyName, Seq(left -> "geometry", right -> "numeric"))
  protected def run(vs: Seq[Any]): Any = out(VWSimplifier.simplify(geom(vs(0)), dbl(vs(1))))
  override def prettyName: String = "st_simplifyvw"
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(cs(0), cs(1))
}

// ---------------------------------------------------------------------------
// Triangulation & inscribed circle
// ---------------------------------------------------------------------------

/** st_delaunaytriangles(geom[, tolerance]): Delaunay triangulation of the
  * input vertices as a GEOMETRYCOLLECTION of polygons. */
case class StDelaunayTriangles(children: Seq[Expression]) extends StNary {
  require(children.length == 1 || children.length == 2,
    s"st_delaunaytriangles expects 1-2 arguments, got ${children.length}")
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes() = StKit.checkTypes(prettyName,
    children.zipWithIndex.map { case (c, i) => c -> (if (i == 0) "geometry" else "numeric") })
  protected def run(vs: Seq[Any]): Any = {
    val g = geom(vs(0))
    val b = new DelaunayTriangulationBuilder()
    b.setSites(g)
    if (vs.length > 1) b.setTolerance(dbl(vs(1)))
    out(b.getTriangles(g.getFactory))
  }
  override def prettyName: String = "st_delaunaytriangles"
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression = copy(cs)
}

/** st_voronoipolygons(geom[, tolerance]): Voronoi diagram of the input
  * vertices, clipped to the input envelope grown by its diameter. */
case class StVoronoiPolygons(children: Seq[Expression]) extends StNary {
  require(children.length == 1 || children.length == 2,
    s"st_voronoipolygons expects 1-2 arguments, got ${children.length}")
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes() = StKit.checkTypes(prettyName,
    children.zipWithIndex.map { case (c, i) => c -> (if (i == 0) "geometry" else "numeric") })
  protected def run(vs: Seq[Any]): Any = {
    val g = geom(vs(0))
    val b = new VoronoiDiagramBuilder()
    b.setSites(g)
    if (vs.length > 1) b.setTolerance(dbl(vs(1)))
    out(b.getDiagram(g.getFactory))
  }
  override def prettyName: String = "st_voronoipolygons"
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression = copy(cs)
}

/** st_triangulatepolygon: constrained Delaunay triangulation of a polygon
  * (respects its boundary, unlike st_delaunaytriangles). */
case class StTriangulatePolygon(child: Expression) extends StUnary {
  override def dataType: DataType = BinaryType
  protected def run(g: Geometry): Any = out(ConstrainedDelaunayTriangulator.triangulate(g))
  override def prettyName: String = "st_triangulatepolygon"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** st_maximuminscribedcircle(polygon): center of the largest circle fully
  * inside the polygon (tolerance = diameter/1000). */
case class StMaximumInscribedCircleCenter(child: Expression) extends StUnary {
  override def dataType: DataType = BinaryType
  protected def run(g: Geometry): Any = out(StTier3.inscribed(g).getCenter)
  override def prettyName: String = "st_maximuminscribedcircle"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** st_maximuminscribedradius: radius of that circle. */
case class StMaximumInscribedRadius(child: Expression) extends StUnary {
  override def dataType: DataType = DoubleType
  protected def run(g: Geometry): Any = {
    val c = StTier3.inscribed(g)
    c.getCenter.getCoordinate.distance(c.getRadiusPoint.getCoordinate)
  }
  override def prettyName: String = "st_maximuminscribedradius"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

// ---------------------------------------------------------------------------
// Splitting & subdivision
// ---------------------------------------------------------------------------

/** st_split(input, blade): split a line by a point/line or a polygon by a
  * line; returns a GEOMETRYCOLLECTION of the pieces (PostGIS semantics:
  * lines split at every crossing, polygons cut along the blade). */
case class StSplit(left: Expression, right: Expression) extends StBinary {
  override def dataType: DataType = BinaryType
  protected def run(l: Geometry, r: Geometry): Any = out(StTier3.split(l, r))
  override def prettyName: String = "st_split"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** st_subdivide(geom, maxVertices): recursively halve the geometry's
  * envelope until each clipped piece has ≤ maxVertices vertices — the
  * standard preprocessing that turns one huge polygon into many small
  * index-friendly ones. Returns the pieces as an array. */
case class StSubdivide(left: Expression, right: Expression) extends StNary {
  override def children: Seq[Expression] = Seq(left, right)
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def checkInputDataTypes() =
    StKit.checkTypes(prettyName, Seq(left -> "geometry", right -> "numeric"))
  protected def run(vs: Seq[Any]): Any = {
    val maxV = int(vs(1))
    require(maxV >= 5, s"st_subdivide maxVertices must be >= 5, got $maxV")
    val pieces = Seq.newBuilder[Array[Byte]]
    StTier3.subdivide(geom(vs(0)), maxV, 0, pieces)
    new GenericArrayData(pieces.result().toArray[Any])
  }
  override def prettyName: String = "st_subdivide"
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(cs(0), cs(1))
}

/** st_generatepoints(geom, n, seed): n uniform random points inside an
  * areal geometry — SEEDED, so results are reproducible across runs and
  * partitions (critical for a distributed engine; an unseeded variant
  * would break retry idempotency). */
case class StGeneratePoints(children: Seq[Expression]) extends StNary {
  require(children.length == 3, s"st_generatepoints expects (geom, n, seed), got ${children.length} args")
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes() = StKit.checkTypes(prettyName,
    Seq(children(0) -> "geometry", children(1) -> "numeric", children(2) -> "numeric"))
  protected def run(vs: Seq[Any]): Any = {
    val g = geom(vs(0))
    val n = int(vs(1))
    require(n >= 0, s"st_generatepoints n must be >= 0, got $n")
    val rnd = new java.util.Random(StKit.dbl(vs(2)).toLong)
    val env = g.getEnvelopeInternal
    val prep = org.locationtech.jts.geom.prep.PreparedGeometryFactory.prepare(g)
    val pts = new Array[org.locationtech.jts.geom.Point](n)
    var i = 0
    var guard = 0
    val maxTries = math.max(1000, n * 1000)
    while (i < n && guard < maxTries) {
      val p = g.getFactory.createPoint(new Coordinate(
        env.getMinX + rnd.nextDouble() * env.getWidth,
        env.getMinY + rnd.nextDouble() * env.getHeight))
      if (prep.intersects(p)) { pts(i) = p; i += 1 }
      guard += 1
    }
    require(i == n, s"st_generatepoints: geometry too thin to hit with rejection sampling")
    out(g.getFactory.createMultiPoint(pts))
  }
  override def prettyName: String = "st_generatepoints"
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression = copy(cs)
}

/** st_points: every vertex as a MULTIPOINT (duplicates preserved). */
case class StPoints(child: Expression) extends StUnary {
  override def dataType: DataType = BinaryType
  protected def run(g: Geometry): Any =
    out(g.getFactory.createMultiPointFromCoords(g.getCoordinates))
  override def prettyName: String = "st_points"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** st_bufferstyle(geom, dist, style): PostGIS-style buffer parameters —
  * 'quad_segs=8 endcap=round|flat|square join=round|mitre|bevel side=both|left|right'. */
case class StBufferStyle(children: Seq[Expression]) extends StNary {
  require(children.length == 3, s"st_bufferstyle expects (geom, distance, style), got ${children.length} args")
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes() = StKit.checkTypes(prettyName,
    Seq(children(0) -> "geometry", children(1) -> "numeric", children(2) -> "string"))
  protected def run(vs: Seq[Any]): Any = {
    val params = new BufferParameters()
    var single = false
    vs(2).toString.trim.split("\\s+").filter(_.nonEmpty).foreach { kv =>
      kv.split("=") match {
        case Array("quad_segs", v) => params.setQuadrantSegments(v.toInt)
        case Array("endcap", v) => params.setEndCapStyle(v.toLowerCase match {
          case "round" => BufferParameters.CAP_ROUND
          case "flat" | "butt" => BufferParameters.CAP_FLAT
          case "square" => BufferParameters.CAP_SQUARE
          case other => throw new IllegalArgumentException(s"unknown endcap '$other'")
        })
        case Array("join", v) => params.setJoinStyle(v.toLowerCase match {
          case "round" => BufferParameters.JOIN_ROUND
          case "mitre" | "miter" => BufferParameters.JOIN_MITRE
          case "bevel" => BufferParameters.JOIN_BEVEL
          case other => throw new IllegalArgumentException(s"unknown join '$other'")
        })
        case Array("mitre_limit", v) => params.setMitreLimit(v.toDouble)
        case Array("side", v) => v.toLowerCase match {
          case "both" =>
          case "left" => single = true
          case "right" => single = true; params.setSingleSided(true)
          case other => throw new IllegalArgumentException(s"unknown side '$other'")
        }
        case other => throw new IllegalArgumentException(
          s"bad buffer style token '${other.mkString("=")}'")
      }
    }
    var dist = dbl(vs(1))
    if (single) {
      params.setSingleSided(true)
      // right side = negative distance in JTS single-sided convention
      if (params.isSingleSided && vs(2).toString.toLowerCase.contains("side=right")) dist = -math.abs(dist)
    }
    out(BufferOp.bufferOp(geom(vs(0)), dist, params))
  }
  override def prettyName: String = "st_bufferstyle"
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression = copy(cs)
}

// ---------------------------------------------------------------------------
// Z-coordinate family (3D round-trips through the Z-aware WKB serde)
// ---------------------------------------------------------------------------

/** st_z: Z of a point, NULL when the point has no Z. */
case class StZ(child: Expression) extends StUnary {
  override def dataType: DataType = DoubleType
  override protected def mayReturnNull: Boolean = true
  protected def run(g: Geometry): Any = g match {
    case p: org.locationtech.jts.geom.Point if !p.isEmpty && !p.getCoordinate.getZ.isNaN =>
      p.getCoordinate.getZ
    case _ => null
  }
  override def prettyName: String = "st_z"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** st_hasz: does the geometry carry Z coordinates? */
case class StHasZ(child: Expression) extends StUnary {
  override def dataType: DataType = BooleanType
  protected def run(g: Geometry): Any = Geom.hasZ(g)
  override def prettyName: String = "st_hasz"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** st_zmin / st_zmax: Z extremes over all vertices, NULL for 2D geometry. */
case class StZMin(child: Expression) extends StUnary {
  override def dataType: DataType = DoubleType
  override protected def mayReturnNull: Boolean = true
  protected def run(g: Geometry): Any = StTier3.zRange(g).map(_._1).orNull
  override def prettyName: String = "st_zmin"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

case class StZMax(child: Expression) extends StUnary {
  override def dataType: DataType = DoubleType
  override protected def mayReturnNull: Boolean = true
  protected def run(g: Geometry): Any = StTier3.zRange(g).map(_._2).orNull
  override def prettyName: String = "st_zmax"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** st_ndims: coordinate dimension — 2, 3 (Z or M), or 4 (ZM). */
case class StNDims(child: Expression) extends StUnary {
  override def dataType: DataType = IntegerType
  protected def run(g: Geometry): Any =
    2 + (if (Geom.hasZ(g)) 1 else 0) + (if (Geom.hasM(g)) 1 else 0)
  override def prettyName: String = "st_ndims"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** st_zmflag: PostGIS dimensionality flag (0 = 2D, 1 = 3DM, 2 = 3DZ, 3 = 4D). */
case class StZmflag(child: Expression) extends StUnary {
  override def dataType: DataType = IntegerType
  protected def run(g: Geometry): Any = {
    val z = Geom.hasZ(g); val m = Geom.hasM(g)
    if (z && m) 3 else if (z) 2 else if (m) 1 else 0
  }
  override def prettyName: String = "st_zmflag"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** st_makepointz(x, y, z). */
case class StMakePointZ(children: Seq[Expression]) extends StNary {
  require(children.length == 3, s"st_makepointz expects (x, y, z), got ${children.length} args")
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes() =
    StKit.checkTypes(prettyName, children.map(_ -> "numeric"))
  protected def run(vs: Seq[Any]): Any =
    out(Geom.factory.createPoint(new Coordinate(dbl(vs(0)), dbl(vs(1)), dbl(vs(2)))))
  override def prettyName: String = "st_makepointz"
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression = copy(cs)
}

/** st_force3d(geom, z): ensure Z on every vertex (existing Z kept). */
case class StForce3D(left: Expression, right: Expression) extends StNary {
  override def children: Seq[Expression] = Seq(left, right)
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes() =
    StKit.checkTypes(prettyName, Seq(left -> "geometry", right -> "numeric"))
  protected def run(vs: Seq[Any]): Any = {
    val z = dbl(vs(1))
    val g = geom(vs(0))
    // WKB-read geometries use fixed-2D coordinate sequences (CoordinateXY
    // rejects setZ) — rebuild with 3D coordinates instead of mutating
    val editor = new org.locationtech.jts.geom.util.GeometryEditor(g.getFactory)
    out(editor.edit(g, new org.locationtech.jts.geom.util.GeometryEditor.CoordinateOperation {
      override def edit(coords: Array[Coordinate], geometry: Geometry): Array[Coordinate] =
        coords.map(c => new Coordinate(c.x, c.y, if (c.getZ.isNaN) z else c.getZ))
    }))
  }
  override def prettyName: String = "st_force3d"
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(cs(0), cs(1))
}

/** st_3ddistance: Euclidean distance including Z (falls back to 2D
  * distance when either side has no Z — JTS Distance3DOp convention). */
case class St3DDistance(left: Expression, right: Expression) extends StBinary {
  override def dataType: DataType = DoubleType
  protected def run(l: Geometry, r: Geometry): Any = Distance3DOp.distance(l, r)
  override def prettyName: String = "st_3ddistance"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

// ---------------------------------------------------------------------------
// Shared helpers
// ---------------------------------------------------------------------------

private[functions] object StTier3 {

  def inscribed(g: Geometry): MaximumInscribedCircle = {
    val e = g.getEnvelopeInternal
    val tol = math.max(math.max(e.getWidth, e.getHeight) / 1000.0, 1e-12)
    new MaximumInscribedCircle(g, tol)
  }

  /** Farthest vertex pair across two geometries (attained on convex hull
    * vertices; O(|H1|·|H2|) which is tiny after hulling). */
  def farthestVertices(l: Geometry, r: Geometry): (Coordinate, Coordinate) = {
    val cs1 = l.convexHull().getCoordinates
    val cs2 = r.convexHull().getCoordinates
    var best = Double.NegativeInfinity
    var a: Coordinate = null; var b: Coordinate = null
    var i = 0
    while (i < cs1.length) {
      var j = 0
      while (j < cs2.length) {
        val d = cs1(i).distance(cs2(j))
        if (d > best) { best = d; a = cs1(i); b = cs2(j) }
        j += 1
      }
      i += 1
    }
    (a, b)
  }

  /** PostGIS-style split: lines split at point blades (length-indexed) and
    * at line-blade crossings (noding union); polygons cut along a line
    * blade via polygonization of boundary ∪ blade. */
  def split(input: Geometry, blade: Geometry): Geometry = {
    val f = input.getFactory
    input match {
      case _: LineString | _: org.locationtech.jts.geom.MultiLineString
        if blade.getDimension == 0 =>
        // union() absorbs an interior point without noding — split each
        // component line at the blade points' length indices instead
        val bladePts = (0 until blade.getNumGeometries).map(blade.getGeometryN(_).getCoordinate)
        val pieces = (0 until input.getNumGeometries).map(input.getGeometryN).flatMap {
          case l: LineString =>
            val lil = new org.locationtech.jts.linearref.LengthIndexedLine(l)
            val cuts = bladePts.map(lil.indexOf)
              .filter(i => i > 1e-9 && i < l.getLength - 1e-9)
              .filter(i => l.distance(f.createPoint(lil.extractPoint(i))) < 1e-9)
              .sorted.distinct
            val bounds = 0.0 +: cuts :+ l.getLength
            bounds.sliding(2).collect {
              case Seq(a, b) if b - a > 1e-9 => lil.extractLine(a, b)
            }.toSeq
          case other => Seq(other)
        }
        f.createGeometryCollection(pieces.toArray)
      case _: LineString | _: org.locationtech.jts.geom.MultiLineString =>
        val noded = UnaryUnionOp.union(f.createGeometryCollection(Array(input, blade)))
        // keep only pieces that came from the input (midpoint test)
        val pieces = (0 until noded.getNumGeometries).map(noded.getGeometryN)
          .filter {
            case l: LineString =>
              val mid = new LengthPoint(l).midPoint
              input.distance(f.createPoint(mid)) < 1e-9
            case _ => false
          }
        f.createGeometryCollection(pieces.toArray)
      case _: Polygon | _: org.locationtech.jts.geom.MultiPolygon =>
        val p = new Polygonizer()
        p.add(UnaryUnionOp.union(f.createGeometryCollection(Array(input.getBoundary, blade))))
        val polys = p.getPolygons.toArray(Array.empty[Object]).map(_.asInstanceOf[Polygon])
        val kept = polys.filter(poly => input.contains(f.createPoint(
          poly.getInteriorPoint.getCoordinate)))
        f.createGeometryCollection(kept.toArray[Geometry])
      case _ => f.createGeometryCollection(Array(input))
    }
  }

  private[functions] final class LengthPoint(l: LineString) {
    def midPoint: Coordinate =
      new org.locationtech.jts.linearref.LengthIndexedLine(l)
        .extractPoint(l.getLength / 2.0)
  }

  /** Recursive envelope-halving subdivision (split the longer axis). */
  def subdivide(g: Geometry, maxVertices: Int, depth: Int,
                outB: scala.collection.mutable.Builder[Array[Byte], _]): Unit = {
    if (g.isEmpty) return
    if (g.getNumPoints <= maxVertices || depth >= 32) {
      if (!g.isEmpty) outB += Geom.serialize(g)
      return
    }
    val e = g.getEnvelopeInternal
    val (e1, e2) =
      if (e.getWidth >= e.getHeight) {
        val mx = (e.getMinX + e.getMaxX) / 2
        (new org.locationtech.jts.geom.Envelope(e.getMinX, mx, e.getMinY, e.getMaxY),
          new org.locationtech.jts.geom.Envelope(mx, e.getMaxX, e.getMinY, e.getMaxY))
      } else {
        val my = (e.getMinY + e.getMaxY) / 2
        (new org.locationtech.jts.geom.Envelope(e.getMinX, e.getMaxX, e.getMinY, my),
          new org.locationtech.jts.geom.Envelope(e.getMinX, e.getMaxX, my, e.getMaxY))
      }
    Seq(e1, e2).foreach { half =>
      val clipped = org.locationtech.jts.operation.overlayng.OverlayNGRobust.overlay(
        g, g.getFactory.toGeometry(half),
        org.locationtech.jts.operation.overlayng.OverlayNG.INTERSECTION)
      subdivide(clipped, maxVertices, depth + 1, outB)
    }
  }

  /** (zmin, zmax) over vertices with Z; None when fully 2D. */
  def zRange(g: Geometry): Option[(Double, Double)] = {
    var lo = Double.PositiveInfinity
    var hi = Double.NegativeInfinity
    g.apply(new org.locationtech.jts.geom.CoordinateFilter {
      override def filter(c: Coordinate): Unit = {
        val z = c.getZ
        if (!z.isNaN) { if (z < lo) lo = z; if (z > hi) hi = z }
      }
    })
    if (lo.isInfinite) None else Some((lo, hi))
  }
}
