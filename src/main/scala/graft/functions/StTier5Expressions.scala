package graft.functions

import graft.geom.Geom

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types._
import org.locationtech.jts.algorithm.Orientation
import org.locationtech.jts.geom.{Coordinate, CoordinateXYM, CoordinateXYZM, Geometry, LineString, LinearRing, Point, Polygon}
import org.locationtech.jts.geom.util.GeometryEditor
import org.locationtech.jts.linearref.LocationIndexedLine

import StKit._

/**
 * Catalog-breadth tier 5 (SURVEY.md §2.5 extension): the M-coordinate
 * family (measures ride the XYM/XYZM WKB serde in [[graft.geom.Geom]]),
 * linear referencing on measures (PostGIS ST_LocateAlong /
 * ST_AddMeasure / ST_InterpolatePoint), polygon ring orientation
 * checks + rewrites, and assorted PostGIS/Sedona parity functions
 * (ST_BestSRID, ST_CrossesDateLine, ST_RemoveRepeatedPoints,
 * ST_SimplifyPolygonHull, ST_RotateX/Y, ST_NRings, ST_IsCollection).
 * Same WKB-over-Catalyst bases as the core catalog (reference registers
 * the equivalent Sedona surface wholesale:
 * extension/.../SedonaIcebergExtensions.scala:38).
 */
private[functions] object StTier5 {

  /** M value at vertex `i`, NaN when the sequence carries no measures. */
  def mAt(cs: org.locationtech.jts.geom.CoordinateSequence, i: Int): Double =
    cs.getM(i)

  /** (min, max) M over every vertex of every component, None when no
    * vertex carries a measure. */
  def mRange(g: Geometry): Option[(Double, Double)] = {
    var lo = Double.PositiveInfinity
    var hi = Double.NegativeInfinity
    var found = false
    g.apply(new org.locationtech.jts.geom.CoordinateSequenceFilter {
      override def filter(cs: org.locationtech.jts.geom.CoordinateSequence, i: Int): Unit = {
        val m = cs.getM(i)
        if (!java.lang.Double.isNaN(m)) {
          found = true
          if (m < lo) lo = m
          if (m > hi) hi = m
        }
      }
      override def isDone: Boolean = false
      override def isGeometryChanged: Boolean = false
    })
    if (found) Some((lo, hi)) else None
  }

  /** Rebuild every polygon of `g` with the requested ring orientations
    * (`exteriorCW`: shells clockwise and holes counter-clockwise, or the
    * reverse). Non-polygonal components pass through unchanged. */
  def forceOrientation(g: Geometry, exteriorCW: Boolean): Geometry = {
    val f = g.getFactory
    g match {
      case p: Polygon =>
        def orient(ring: LinearRing, wantCW: Boolean): LinearRing = {
          val ccw = Orientation.isCCW(ring.getCoordinateSequence)
          if (ccw == wantCW) ring.reverse().asInstanceOf[LinearRing] else ring
        }
        f.createPolygon(orient(p.getExteriorRing, exteriorCW),
          Array.tabulate(p.getNumInteriorRing)(i => orient(p.getInteriorRingN(i), !exteriorCW)))
      case mp: org.locationtech.jts.geom.MultiPolygon =>
        f.createMultiPolygon(Array.tabulate(mp.getNumGeometries)(i =>
          forceOrientation(mp.getGeometryN(i), exteriorCW).asInstanceOf[Polygon]))
      case gc: org.locationtech.jts.geom.GeometryCollection
          if !gc.isInstanceOf[org.locationtech.jts.geom.MultiPoint] &&
             !gc.isInstanceOf[org.locationtech.jts.geom.MultiLineString] =>
        f.createGeometryCollection(Array.tabulate(gc.getNumGeometries)(i =>
          forceOrientation(gc.getGeometryN(i), exteriorCW)))
      case other => other
    }
  }

  /** True when every polygonal component has the requested orientation
    * (PostGIS convention: geometries without polygons vacuously pass). */
  def checkOrientation(g: Geometry, exteriorCW: Boolean): Boolean = {
    var ok = true
    (0 until g.getNumGeometries).foreach { i =>
      g.getGeometryN(i) match {
        case p: Polygon if !p.isEmpty =>
          if (Orientation.isCCW(p.getExteriorRing.getCoordinateSequence) == exteriorCW) ok = false
          (0 until p.getNumInteriorRing).foreach { j =>
            if (Orientation.isCCW(p.getInteriorRingN(j).getCoordinateSequence) != exteriorCW)
              ok = false
          }
        case gc if gc.getNumGeometries > 1 || gc.isInstanceOf[org.locationtech.jts.geom.GeometryCollection] =>
          if (!checkOrientation(gc, exteriorCW)) ok = false
        case _ => ()
      }
    }
    ok
  }
}

// ---------------------------------------------------------------------------
// M-coordinate accessors & constructors
// ---------------------------------------------------------------------------

/** st_m: M of a point, NULL when the point carries no measure. */
case class StM(child: Expression) extends StUnary {
  override def dataType: DataType = DoubleType
  override protected def mayReturnNull: Boolean = true
  protected def run(g: Geometry): Any = g match {
    case p: Point if !p.isEmpty =>
      val m = p.getCoordinateSequence.getM(0)
      if (java.lang.Double.isNaN(m)) null else m
    case _ => null
  }
  override def prettyName: String = "st_m"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** st_hasm: does the geometry carry M measures? */
case class StHasM(child: Expression) extends StUnary {
  override def dataType: DataType = BooleanType
  protected def run(g: Geometry): Any = Geom.hasM(g)
  override def prettyName: String = "st_hasm"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** st_mmin / st_mmax: M extremes over all vertices, NULL without measures. */
case class StMMin(child: Expression) extends StUnary {
  override def dataType: DataType = DoubleType
  override protected def mayReturnNull: Boolean = true
  protected def run(g: Geometry): Any = StTier5.mRange(g).map(_._1).orNull
  override def prettyName: String = "st_mmin"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

case class StMMax(child: Expression) extends StUnary {
  override def dataType: DataType = DoubleType
  override protected def mayReturnNull: Boolean = true
  protected def run(g: Geometry): Any = StTier5.mRange(g).map(_._2).orNull
  override def prettyName: String = "st_mmax"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** st_makepointm(x, y, m): 2D point with a measure (XYM). */
case class StMakePointM(children: Seq[Expression]) extends StNary {
  require(children.length == 3, s"st_makepointm expects (x, y, m), got ${children.length} args")
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes() =
    StKit.checkTypes(prettyName, children.map(_ -> "numeric"))
  protected def run(vs: Seq[Any]): Any =
    out(Geom.factory.createPoint(new CoordinateXYM(dbl(vs(0)), dbl(vs(1)), dbl(vs(2)))))
  override def prettyName: String = "st_makepointm"
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression = copy(cs)
}

/** st_pointzm(x, y, z, m): full 4D point. */
case class StPointZM(children: Seq[Expression]) extends StNary {
  require(children.length == 4, s"st_pointzm expects (x, y, z, m), got ${children.length} args")
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes() =
    StKit.checkTypes(prettyName, children.map(_ -> "numeric"))
  protected def run(vs: Seq[Any]): Any =
    out(Geom.factory.createPoint(new CoordinateXYZM(dbl(vs(0)), dbl(vs(1)), dbl(vs(2)), dbl(vs(3)))))
  override def prettyName: String = "st_pointzm"
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression = copy(cs)
}

/** st_force3dm(geom, m): ensure a measure on every vertex (existing M
  * kept, Z dropped — PostGIS ST_Force3DM semantics). */
case class StForce3DM(left: Expression, right: Expression) extends StNary {
  override def children: Seq[Expression] = Seq(left, right)
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes() =
    StKit.checkTypes(prettyName, Seq(left -> "geometry", right -> "numeric"))
  protected def run(vs: Seq[Any]): Any = {
    val m = dbl(vs(1))
    val g = geom(vs(0))
    val editor = new GeometryEditor(g.getFactory)
    out(editor.edit(g, new GeometryEditor.CoordinateOperation {
      override def edit(coords: Array[Coordinate], geometry: Geometry): Array[Coordinate] =
        coords.map { c =>
          val cm = c.getM
          new CoordinateXYM(c.x, c.y, if (java.lang.Double.isNaN(cm)) m else cm)
        }
    }))
  }
  override def prettyName: String = "st_force3dm"
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(cs(0), cs(1))
}

/** st_force4d(geom, z, m): ensure both Z and M on every vertex (existing
  * values kept, defaults fill the gaps). */
case class StForce4D(children: Seq[Expression]) extends StNary {
  require(children.length == 3, s"st_force4d expects (geom, z, m), got ${children.length} args")
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes() =
    StKit.checkTypes(prettyName,
      Seq(children(0) -> "geometry", children(1) -> "numeric", children(2) -> "numeric"))
  protected def run(vs: Seq[Any]): Any = {
    val z = dbl(vs(1)); val m = dbl(vs(2))
    val g = geom(vs(0))
    val editor = new GeometryEditor(g.getFactory)
    out(editor.edit(g, new GeometryEditor.CoordinateOperation {
      override def edit(coords: Array[Coordinate], geometry: Geometry): Array[Coordinate] =
        coords.map { c =>
          val cz = c.getZ; val cm = c.getM
          new CoordinateXYZM(c.x, c.y,
            if (java.lang.Double.isNaN(cz)) z else cz,
            if (java.lang.Double.isNaN(cm)) m else cm)
        }
    }))
  }
  override def prettyName: String = "st_force4d"
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression = copy(cs)
}

// ---------------------------------------------------------------------------
// Linear referencing on measures
// ---------------------------------------------------------------------------

/** st_addmeasure(line, m_start, m_end): measures interpolated linearly by
  * accumulated length over the line's vertices (PostGIS ST_AddMeasure;
  * MultiLineStrings measure across the total length of all parts). */
case class StAddMeasure(children: Seq[Expression]) extends StNary {
  require(children.length == 3,
    s"st_addmeasure expects (line, m_start, m_end), got ${children.length} args")
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes() =
    StKit.checkTypes(prettyName,
      Seq(children(0) -> "geometry", children(1) -> "numeric", children(2) -> "numeric"))
  protected def run(vs: Seq[Any]): Any = {
    val g = geom(vs(0))
    val m0 = dbl(vs(1)); val m1 = dbl(vs(2))
    val total = g.getLength
    var acc = 0.0
    val parts = (0 until g.getNumGeometries).map(g.getGeometryN).collect {
      case l: LineString =>
        val cs = l.getCoordinateSequence
        val measured = new Array[Coordinate](cs.size())
        var i = 0
        while (i < cs.size()) {
          if (i > 0) acc += cs.getCoordinate(i - 1).distance(cs.getCoordinate(i))
          val frac = if (total == 0.0) 0.0 else acc / total
          measured(i) = new CoordinateXYM(cs.getX(i), cs.getY(i), m0 + (m1 - m0) * frac)
          i += 1
        }
        g.getFactory.createLineString(measured)
    }
    if (parts.isEmpty) null
    else if (g.getNumGeometries == 1 && g.isInstanceOf[LineString]) out(parts.head)
    else out(g.getFactory.createMultiLineString(parts.toArray))
  }
  override def prettyName: String = "st_addmeasure"
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression = copy(cs)
}

/** st_locatealong(geom, m): points along the input where the measure
  * equals m — vertices hit exactly plus linear interpolations inside
  * segments whose M range crosses m. Always a MultiPoint (empty when no
  * location matches); points pass through iff their M equals m. */
case class StLocateAlong(left: Expression, right: Expression) extends StNary {
  override def children: Seq[Expression] = Seq(left, right)
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes() =
    StKit.checkTypes(prettyName, Seq(left -> "geometry", right -> "numeric"))
  protected def run(vs: Seq[Any]): Any = {
    val g = geom(vs(0))
    val m = dbl(vs(1))
    // every emitted point carries M = m (PostGIS convention), keeping the
    // MultiPoint's coordinates uniformly XYM for the serde's lead-probe
    val pts = scala.collection.mutable.ArrayBuffer.empty[Coordinate]
    (0 until g.getNumGeometries).map(g.getGeometryN).foreach {
      case p: Point if !p.isEmpty =>
        if (p.getCoordinateSequence.getM(0) == m)
          pts += new CoordinateXYM(p.getX, p.getY, m)
      case l: LineString =>
        val cs = l.getCoordinateSequence
        var i = 0
        while (i < cs.size()) {
          val mi = cs.getM(i)
          if (mi == m) pts += new CoordinateXYM(cs.getX(i), cs.getY(i), m)
          else if (i + 1 < cs.size()) {
            val mj = cs.getM(i + 1)
            // strict interior crossing; endpoint hits handled by the == arm
            if (!java.lang.Double.isNaN(mi) && !java.lang.Double.isNaN(mj) &&
                ((mi < m && m < mj) || (mj < m && m < mi))) {
              val t = (m - mi) / (mj - mi)
              pts += new CoordinateXYM(
                cs.getX(i) + (cs.getX(i + 1) - cs.getX(i)) * t,
                cs.getY(i) + (cs.getY(i + 1) - cs.getY(i)) * t, m)
            }
          }
          i += 1
        }
      case _ => ()
    }
    out(g.getFactory.createMultiPointFromCoords(pts.toArray))
  }
  override def prettyName: String = "st_locatealong"
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(cs(0), cs(1))
}

/** st_interpolatepoint(line, point): the measure interpolated at the
  * location on the line closest to the point (PostGIS
  * ST_InterpolatePoint); NULL when the line carries no measures. */
case class StInterpolatePoint(left: Expression, right: Expression) extends StBinary {
  override def dataType: DataType = DoubleType
  override protected def mayReturnNull: Boolean = true
  protected def run(l: Geometry, r: Geometry): Any = l match {
    case line: LineString if !line.isEmpty =>
      val loc = new LocationIndexedLine(line).project(r.getCoordinate)
      val cs = line.getCoordinateSequence
      val i = math.min(loc.getSegmentIndex, cs.size() - 2)
      val mi = cs.getM(i); val mj = cs.getM(i + 1)
      if (java.lang.Double.isNaN(mi) || java.lang.Double.isNaN(mj)) null
      else {
        val frac = if (loc.getSegmentIndex >= cs.size() - 1) 1.0 else loc.getSegmentFraction
        mi + (mj - mi) * frac
      }
    case _ => null
  }
  override def prettyName: String = "st_interpolatepoint"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

// ---------------------------------------------------------------------------
// Polygon ring orientation
// ---------------------------------------------------------------------------

/** st_ispolygoncw: all polygonal components have clockwise exteriors and
  * counter-clockwise holes (vacuously true without polygons). */
case class StIsPolygonCW(child: Expression) extends StUnary {
  override def dataType: DataType = BooleanType
  protected def run(g: Geometry): Any = StTier5.checkOrientation(g, exteriorCW = true)
  override def prettyName: String = "st_ispolygoncw"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** st_ispolygonccw: all polygonal components have counter-clockwise
  * exteriors and clockwise holes. */
case class StIsPolygonCCW(child: Expression) extends StUnary {
  override def dataType: DataType = BooleanType
  protected def run(g: Geometry): Any = StTier5.checkOrientation(g, exteriorCW = false)
  override def prettyName: String = "st_ispolygonccw"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** st_forcepolygoncw / st_forcerhr: shells clockwise, holes CCW. */
case class StForcePolygonCW(child: Expression) extends StUnary {
  override def dataType: DataType = BinaryType
  protected def run(g: Geometry): Any = out(StTier5.forceOrientation(g, exteriorCW = true))
  override def prettyName: String = "st_forcepolygoncw"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** st_forcepolygonccw: shells counter-clockwise, holes CW (OGC order). */
case class StForcePolygonCCW(child: Expression) extends StUnary {
  override def dataType: DataType = BinaryType
  protected def run(g: Geometry): Any = out(StTier5.forceOrientation(g, exteriorCW = false))
  override def prettyName: String = "st_forcepolygonccw"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

// ---------------------------------------------------------------------------
// Misc PostGIS/Sedona parity
// ---------------------------------------------------------------------------

/** st_iscollection: Multi* / GeometryCollection input? */
case class StIsCollection(child: Expression) extends StUnary {
  override def dataType: DataType = BooleanType
  protected def run(g: Geometry): Any =
    g.isInstanceOf[org.locationtech.jts.geom.GeometryCollection]
  override def prettyName: String = "st_iscollection"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** st_nrings: total ring count over all polygonal components
  * (exterior + interior each). 0 for non-polygonal geometry. */
case class StNRings(child: Expression) extends StUnary {
  override def dataType: DataType = IntegerType
  protected def run(g: Geometry): Any = {
    var n = 0
    (0 until g.getNumGeometries).foreach { i =>
      g.getGeometryN(i) match {
        case p: Polygon if !p.isEmpty => n += 1 + p.getNumInteriorRing
        case _ => ()
      }
    }
    n
  }
  override def prettyName: String = "st_nrings"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** st_removerepeatedpoints(geom[, tolerance]): drops consecutive vertices
  * within tolerance (exact duplicates at the default 0). Rings keep their
  * closure; a component whose sequence would collapse below validity
  * (ring < 4 points, line < 2) keeps its original vertices. */
case class StRemoveRepeatedPoints(children: Seq[Expression]) extends StNary {
  require(children.length == 1 || children.length == 2,
    s"st_removerepeatedpoints expects (geom[, tolerance]), got ${children.length} args")
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes() =
    StKit.checkTypes(prettyName,
      Seq(children(0) -> "geometry") ++ children.drop(1).map(_ -> "numeric"))
  protected def run(vs: Seq[Any]): Any = {
    val tol = if (vs.length > 1) dbl(vs(1)) else 0.0
    val g = geom(vs(0))
    val editor = new GeometryEditor(g.getFactory)
    out(editor.edit(g, new GeometryEditor.CoordinateOperation {
      override def edit(coords: Array[Coordinate], geometry: Geometry): Array[Coordinate] = {
        if (coords.length < 2) return coords
        val isRing = geometry.isInstanceOf[LinearRing]
        val kept = scala.collection.mutable.ArrayBuffer(coords.head)
        var i = 1
        while (i < coords.length) {
          if (coords(i).distance(kept.last) > tol) kept += coords(i)
          i += 1
        }
        if (isRing) {
          // re-close; drop a last point that collapsed onto the first
          if (kept.length > 1 && kept.last.distance(kept.head) <= tol) kept.remove(kept.length - 1)
          kept += new Coordinate(kept.head)
          if (kept.length < 4) return coords
        } else {
          if (geometry.isInstanceOf[LineString] && kept.length < 2) return coords
        }
        kept.toArray
      }
    }))
  }
  override def prettyName: String = "st_removerepeatedpoints"
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression = copy(cs)
}

/** st_crossesdateline: any segment spanning more than 180 degrees of
  * longitude (x), the standard antimeridian heuristic. */
case class StCrossesDateLine(child: Expression) extends StUnary {
  override def dataType: DataType = BooleanType
  protected def run(g: Geometry): Any = {
    var crosses = false
    g.apply(new org.locationtech.jts.geom.CoordinateSequenceFilter {
      override def filter(cs: org.locationtech.jts.geom.CoordinateSequence, i: Int): Unit =
        if (i > 0 && math.abs(cs.getX(i) - cs.getX(i - 1)) > 180.0) crosses = true
      override def isDone: Boolean = crosses
      override def isGeometryChanged: Boolean = false
    })
    crosses
  }
  override def prettyName: String = "st_crossesdateline"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** st_bestsrid: planar SRID for lon-lat geometry by centroid (PostGIS
  * _ST_BestSRID rule): UPS North (32661) above 84°N, UPS South (32761)
  * below 80°S, else the UTM zone of the centroid (326zz / 327zz). */
case class StBestSrid(child: Expression) extends StUnary {
  override def dataType: DataType = IntegerType
  protected def run(g: Geometry): Any = {
    val c = g.getCentroid.getCoordinate
    if (c.y > 84.0) 32661
    else if (c.y < -80.0) 32761
    else {
      val zone = math.min(60, math.max(1, (math.floor((c.x + 180.0) / 6.0) + 1.0).toInt))
      if (c.y >= 0.0) 32600 + zone else 32700 + zone
    }
  }
  override def prettyName: String = "st_bestsrid"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** st_rotatex(geom, theta): rotate about the X axis — y' = y·cosθ − z·sinθ,
  * z' = y·sinθ + z·cosθ (missing Z treated as 0; output always carries Z). */
case class StRotateX(left: Expression, right: Expression) extends StNary {
  override def children: Seq[Expression] = Seq(left, right)
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes() =
    StKit.checkTypes(prettyName, Seq(left -> "geometry", right -> "numeric"))
  protected def run(vs: Seq[Any]): Any = {
    val theta = dbl(vs(1))
    val cos = math.cos(theta); val sin = math.sin(theta)
    val g = geom(vs(0))
    val editor = new GeometryEditor(g.getFactory)
    out(editor.edit(g, new GeometryEditor.CoordinateOperation {
      override def edit(coords: Array[Coordinate], geometry: Geometry): Array[Coordinate] =
        coords.map { c =>
          val z = if (java.lang.Double.isNaN(c.getZ)) 0.0 else c.getZ
          new Coordinate(c.x, c.y * cos - z * sin, c.y * sin + z * cos)
        }
    }))
  }
  override def prettyName: String = "st_rotatex"
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(cs(0), cs(1))
}

/** st_rotatey(geom, theta): rotate about the Y axis — x' = x·cosθ + z·sinθ,
  * z' = −x·sinθ + z·cosθ (missing Z treated as 0; output always carries Z). */
case class StRotateY(left: Expression, right: Expression) extends StNary {
  override def children: Seq[Expression] = Seq(left, right)
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes() =
    StKit.checkTypes(prettyName, Seq(left -> "geometry", right -> "numeric"))
  protected def run(vs: Seq[Any]): Any = {
    val theta = dbl(vs(1))
    val cos = math.cos(theta); val sin = math.sin(theta)
    val g = geom(vs(0))
    val editor = new GeometryEditor(g.getFactory)
    out(editor.edit(g, new GeometryEditor.CoordinateOperation {
      override def edit(coords: Array[Coordinate], geometry: Geometry): Array[Coordinate] =
        coords.map { c =>
          val z = if (java.lang.Double.isNaN(c.getZ)) 0.0 else c.getZ
          new Coordinate(c.x * cos + z * sin, c.y, -c.x * sin + z * cos)
        }
    }))
  }
  override def prettyName: String = "st_rotatey"
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(cs(0), cs(1))
}

/** st_simplifypolygonhull(geom, vertexFrac[, outer]): JTS
  * PolygonHullSimplifier — topology-safe hull keeping ~vertexFrac of the
  * vertices; outer hulls (default) cover the input, inner hulls are
  * covered by it. */
case class StSimplifyPolygonHull(children: Seq[Expression]) extends StNary {
  require(children.length == 2 || children.length == 3,
    s"st_simplifypolygonhull expects (geom, vertexFrac[, outer]), got ${children.length} args")
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes() = {
    val base = StKit.checkTypes(prettyName,
      Seq(children(0) -> "geometry", children(1) -> "numeric"))
    if (!base.isSuccess) base
    else if (children.length > 2 && children(2).dataType != BooleanType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName third argument (outer) must be BOOLEAN, got " +
          children(2).dataType.simpleString)
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }
  protected def run(vs: Seq[Any]): Any = {
    val outer = if (vs.length > 2) vs(2).asInstanceOf[Boolean] else true
    out(org.locationtech.jts.simplify.PolygonHullSimplifier.hull(
      geom(vs(0)), outer, dbl(vs(1))))
  }
  override def prettyName: String = "st_simplifypolygonhull"
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression = copy(cs)
}

/** st_largestemptycircle(obstacles, tolerance): JTS LargestEmptyCircle —
  * the largest circle whose interior avoids the obstacle geometry, center
  * constrained to its convex hull. Returns the RADIUS LINE (center →
  * nearest obstacle point), the composable form: center = st_startpoint,
  * radius = st_length (PostGIS returns the same pieces as a record,
  * which Spark SQL scalar functions cannot). */
case class StLargestEmptyCircle(left: Expression, right: Expression) extends StNary {
  override def children: Seq[Expression] = Seq(left, right)
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes() = StKit.checkTypes(prettyName,
    Seq(left -> "geometry", right -> "numeric"))
  protected def run(vs: Seq[Any]): Any =
    out(org.locationtech.jts.algorithm.construct.LargestEmptyCircle
      .getRadiusLine(geom(vs(0)), dbl(vs(1))))
  override def prettyName: String = "st_largestemptycircle"
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(cs(0), cs(1))
}

/**
 * st_sharedpaths(line1, line2): PostGIS ST_SharedPaths — the linework the
 * two LINEAL inputs share, as GEOMETRYCOLLECTION(MULTILINESTRING same-
 * direction, MULTILINESTRING opposite-direction). Segment direction is
 * classified by linear referencing BOTH inputs (a shared segment travels
 * "forward" on a line when its endpoints' length-indexes increase; a
 * closed ring's wrap-around flips the raw sign when the index gap exceeds
 * half the ring length). Non-lineal input → NULL.
 */
case class StSharedPaths(left: Expression, right: Expression) extends StNary {
  import org.locationtech.jts.geom.{Coordinate, Geometry, LineString}
  override def children: Seq[Expression] = Seq(left, right)
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes() = StKit.checkTypes(prettyName,
    Seq(left -> "geometry", right -> "geometry"))

  private def lineal(g: Geometry): Boolean = (0 until g.getNumGeometries)
    .forall(i => g.getGeometryN(i).isInstanceOf[LineString])

  /** +1 when p→q runs with g's orientation, -1 against. The wrap-around
    * flip (index gap > half the length) applies only to CLOSED inputs —
    * on an open line a long shared segment is just a long segment, but on
    * a ring the start/end join makes the short way round the true gap. */
  private def dirAlong(g: Geometry, p: Coordinate, q: Coordinate): Double = {
    val lil = new org.locationtech.jts.linearref.LengthIndexedLine(g)
    val d = lil.project(q) - lil.project(p)
    val closed = (0 until g.getNumGeometries)
      .forall(i => g.getGeometryN(i).asInstanceOf[LineString].isClosed)
    if (closed && math.abs(d) > g.getLength / 2) -math.signum(d) else math.signum(d)
  }

  protected def run(vs: Seq[Any]): Any = {
    val (g1, g2) = (geom(vs(0)), geom(vs(1)))
    if (g1.isEmpty || g2.isEmpty || !lineal(g1) || !lineal(g2)) return null
    val inter = g1.intersection(g2)
    val same = Seq.newBuilder[LineString]
    val opp = Seq.newBuilder[LineString]
    val f = g1.getFactory
    (0 until inter.getNumGeometries).map(inter.getGeometryN).foreach {
      case l: LineString =>
        val cs = l.getCoordinates
        cs.indices.dropRight(1).foreach { i =>
          val seg = f.createLineString(Array(cs(i), cs(i + 1)))
          if (dirAlong(g1, cs(i), cs(i + 1)) * dirAlong(g2, cs(i), cs(i + 1)) >= 0)
            same += seg
          else opp += seg
        }
      case _ => () // point touches are not shared paths
    }
    def mergedMulti(segs: Seq[LineString]): Geometry = {
      val merger = new org.locationtech.jts.operation.linemerge.LineMerger
      segs.foreach(merger.add)
      val merged = merger.getMergedLineStrings.toArray.map(_.asInstanceOf[LineString])
      f.createMultiLineString(merged.sortBy(_.toText))
    }
    out(f.createGeometryCollection(Array(mergedMulti(same.result()), mergedMulti(opp.result()))))
  }
  override def prettyName: String = "st_sharedpaths"
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(cs(0), cs(1))
}

/** st_asewkb: EWKB bytes (SRID flag set) — graft's canonical storage form,
  * re-serialized so any accepted input (ISO WKB, EWKB) normalizes. */
case class StAsEwkb(child: Expression) extends StUnary {
  override def dataType: DataType = BinaryType
  protected def run(g: Geometry): Any = out(g)
  override def prettyName: String = "st_asewkb"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** st_astext(geom, maxdecimaldigits): WKT with bounded decimal places
  * (PostGIS two-argument form; formatting only, geometry untouched). */
case class StAsTextPrec(left: Expression, right: Expression) extends StNary {
  override def children: Seq[Expression] = Seq(left, right)
  override def dataType: DataType = StringType
  override def checkInputDataTypes() =
    StKit.checkTypes(prettyName, Seq(left -> "geometry", right -> "numeric"))
  protected def run(vs: Seq[Any]): Any = str(Geom.toWkt(geom(vs(0)), int(vs(1))))
  override def prettyName: String = "st_astext"
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(cs(0), cs(1))
}

/** st_collect(g1, g2): scalar two-geometry collect (PostGIS overload of
  * the aggregate form) — homogeneous inputs become their Multi* type,
  * mixed inputs a GeometryCollection. */
case class StCollectTwo(left: Expression, right: Expression) extends StBinary {
  override def dataType: DataType = BinaryType
  protected def run(l: Geometry, r: Geometry): Any = {
    val f = l.getFactory
    out((l, r) match {
      case (a: Point, b: Point) => f.createMultiPoint(Array(a, b))
      case (a: LineString, b: LineString) => f.createMultiLineString(Array(a, b))
      case (a: Polygon, b: Polygon) => f.createMultiPolygon(Array(a, b))
      case (a, b) => f.createGeometryCollection(Array(a, b))
    })
  }
  override def prettyName: String = "st_collect"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** st_isclosed: every LineString component closed (first == last vertex);
  * PostGIS convention — points and polygonal geometry count as closed. */
case class StIsClosed(child: Expression) extends StUnary {
  override def dataType: DataType = BooleanType
  protected def run(g: Geometry): Any = {
    def closed(x: Geometry): Boolean = x match {
      case l: LineString => l.isClosed
      case gc: org.locationtech.jts.geom.GeometryCollection =>
        (0 until gc.getNumGeometries).forall(i => closed(gc.getGeometryN(i)))
      case _ => true
    }
    closed(g)
  }
  override def prettyName: String = "st_isclosed"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** st_ashexewkb: uppercase hex of the canonical EWKB bytes (PostGIS
  * ST_AsHEXEWKB / Sedona 1.7). */
case class StAsHexEwkb(child: Expression) extends StUnary {
  override def dataType: DataType = StringType
  protected def run(g: Geometry): Any = {
    val bytes = Geom.serialize(g)
    val sb = new java.lang.StringBuilder(bytes.length * 2)
    bytes.foreach(b => sb.append(f"${b & 0xff}%02X"))
    str(sb.toString)
  }
  override def prettyName: String = "st_ashexewkb"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** st_makeline(array<geometry>): LineString through the vertices of the
  * array's elements in order (points contribute their coordinate, lines
  * their whole vertex run — PostGIS array form of ST_MakeLine). */
case class StMakeLineArray(child: Expression) extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(BinaryType, _) | NullType =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"st_makeline array form expects array<binary>, got ${other.simpleString}")
  }
  override def nullSafeEval(input: Any): Any =
    evalArray(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  def evalArray(arr: org.apache.spark.sql.catalyst.util.ArrayData): Array[Byte] = {
    val coords = scala.collection.mutable.ArrayBuffer.empty[Coordinate]
    (0 until arr.numElements()).foreach { i =>
      if (!arr.isNullAt(i)) coords ++= Geom.deserialize(arr.getBinary(i)).getCoordinates
    }
    out(Geom.factory.createLineString(coords.toArray))
  }
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) = {
    val ref = ctx.addReferenceObj("stMkl", this, classOf[StMakeLineArray].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.evalArray($a);")
  }
  override def prettyName: String = "st_makeline"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** st_union(array<geometry>): n-way union of the array's elements
  * (PostGIS/Sedona array form; the binary form stays on StUnion). */
case class StUnionArray(child: Expression) extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  // empty/all-NULL arrays yield NULL even when the child itself is
  // non-nullable (e.g. collect_list output) — without this the codegen
  // non-nullable branch has no isNull slot to assign
  override def nullable: Boolean = true
  override def checkInputDataTypes() = child.dataType match {
    // array<void> is the type of the empty/all-NULL array literal
    case ArrayType(BinaryType, _) | ArrayType(NullType, _) | NullType =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"st_union array form expects array<binary>, got ${other.simpleString}")
  }
  override def nullSafeEval(input: Any): Any =
    evalArray(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  def evalArray(arr: org.apache.spark.sql.catalyst.util.ArrayData): Array[Byte] = {
    val gs = (0 until arr.numElements()).filterNot(arr.isNullAt)
      .map(i => Geom.deserialize(arr.getBinary(i)))
    // UnaryUnionOp.union returns null for zero geometries — PostGIS returns
    // NULL for ST_Union of an empty/all-NULL array, so do the same
    if (gs.isEmpty) null
    else out(org.locationtech.jts.operation.union.UnaryUnionOp.union(
      java.util.Arrays.asList(gs: _*)))
  }
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) = {
    val ref = ctx.addReferenceObj("stUni", this, classOf[StUnionArray].getName)
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = $ref.evalArray($a);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  }
  override def prettyName: String = "st_union"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** Typed WKB constructor (PostGIS ST_PointFromWKB / ST_LineFromWKB):
  * parses WKB and returns NULL unless the result is the expected type. */
case class StGeomFromWkbTyped(child: Expression, expected: String, fn: String) extends StUnary {
  override def dataType: DataType = BinaryType
  override protected def mayReturnNull: Boolean = true
  protected def run(g: Geometry): Any =
    if (g.getGeometryType == expected) out(g) else null
  override def prettyName: String = fn
  override protected def withNewChildInternal(c: Expression): Expression = copy(c, expected, fn)
}

/** st_polygon(line, srid): polygon from a closed LineString shell with the
  * SRID applied (PostGIS two-argument ST_Polygon). */
case class StPolygonFromLine(left: Expression, right: Expression) extends StNary {
  override def children: Seq[Expression] = Seq(left, right)
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes() =
    StKit.checkTypes(prettyName, Seq(left -> "geometry", right -> "numeric"))
  protected def run(vs: Seq[Any]): Any = {
    val g = geom(vs(0))
    g match {
      case l: LineString if l.isClosed && l.getNumPoints >= 4 =>
        val poly = g.getFactory.createPolygon(l.getCoordinates)
        poly.setSRID(int(vs(1)))
        out(poly)
      case _ => throw new IllegalArgumentException(
        "st_polygon expects a closed LineString with at least 4 points")
    }
  }
  override def prettyName: String = "st_polygon"
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(cs(0), cs(1))
}
