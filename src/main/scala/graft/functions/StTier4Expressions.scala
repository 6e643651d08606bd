package graft.functions

import graft.geom.Geom

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types._
import org.locationtech.jts.geom.{Coordinate, Geometry, LineString, Point, Polygon}

import StKit._

/**
 * Catalog-breadth tier 4 (SURVEY.md §2.5 extension): geodesic measures on
 * the sphere (distance / length / area over lon-lat coordinates), planar
 * point projection, typed WKT constructors (PostGIS/Sedona
 * ST_LineFromText family), EWKT parsing, geometric median, longitude
 * shifting, and vertex editing. Same WKB-over-Catalyst bases as the core
 * catalog (reference registers the equivalent Sedona surface wholesale:
 * extension/.../SedonaIcebergExtensions.scala:38).
 */
private[functions] object Geodesy {
  /** Mean Earth radius (IUGG), same constant PostGIS uses for
    * ST_DistanceSphere. */
  val EarthRadius = 6371008.8

  /** Haversine great-circle distance between lon-lat coordinates, in the
    * exact IEEE operation order the DuckDB oracle replays:
    * deg * (pi/180), sin^2 as products, 2*R*asin(sqrt(a)). */
  def haversine(lon1: Double, lat1: Double, lon2: Double, lat2: Double,
                radius: Double): Double = {
    val rad = math.Pi / 180.0
    val phi1 = lat1 * rad
    val phi2 = lat2 * rad
    val dphi = (lat2 - lat1) * rad
    val dlmb = (lon2 - lon1) * rad
    val sp = math.sin(dphi / 2.0)
    val sl = math.sin(dlmb / 2.0)
    val a = sp * sp + math.cos(phi1) * math.cos(phi2) * sl * sl
    2.0 * radius * math.asin(math.min(1.0, math.sqrt(a)))
  }
}

/** st_distancesphere(a, b[, radius]): great-circle (haversine) distance in
  * meters between geometry centroids, treating x as longitude and y as
  * latitude. */
case class StDistanceSphere(children: Seq[Expression]) extends StNary {
  require(children.length == 2 || children.length == 3,
    s"st_distancesphere expects 2 or 3 arguments, got ${children.length}")
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes() =
    StKit.checkTypes(prettyName, Seq(children(0) -> "geometry", children(1) -> "geometry") ++
      children.drop(2).map(_ -> "numeric"))
  protected def run(vs: Seq[Any]): Any = {
    val a = geom(vs(0)).getCentroid.getCoordinate
    val b = geom(vs(1)).getCentroid.getCoordinate
    val r = if (vs.length > 2) dbl(vs(2)) else Geodesy.EarthRadius
    Geodesy.haversine(a.x, a.y, b.x, b.y, r)
  }
  override def prettyName: String = "st_distancesphere"
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression = copy(cs)
}

/** st_lengthsphere(geom): sum of great-circle segment lengths (meters) over
  * every LineString component's consecutive lon-lat vertices; 0 for
  * geometries without linework. */
case class StLengthSphere(child: Expression) extends StUnary {
  override def dataType: DataType = DoubleType
  protected def run(g: Geometry): Any = {
    var total = 0.0
    (0 until g.getNumGeometries).foreach { i =>
      g.getGeometryN(i) match {
        case l: LineString =>
          val cs = l.getCoordinateSequence
          var j = 1
          while (j < cs.size()) {
            total += Geodesy.haversine(cs.getX(j - 1), cs.getY(j - 1),
              cs.getX(j), cs.getY(j), Geodesy.EarthRadius)
            j += 1
          }
        case _ => ()
      }
    }
    total
  }
  override def prettyName: String = "st_lengthsphere"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** st_areasphere(geom): approximate spherical polygon area in m^2
  * (Chamberlain & Duquette excess formula over lon-lat vertices; shells
  * and holes contribute with their winding sign, absolute value of the
  * total is returned). Good to ~0.1% for sub-continental polygons. */
case class StAreaSphere(child: Expression) extends StUnary {
  override def dataType: DataType = DoubleType
  protected def run(g: Geometry): Any = {
    val rad = math.Pi / 180.0
    def ringArea(cs: Array[Coordinate]): Double = {
      var s = 0.0
      var i = 1
      while (i < cs.length) {
        s += (cs(i).x - cs(i - 1).x) * rad *
          (2.0 + math.sin(cs(i - 1).y * rad) + math.sin(cs(i).y * rad))
        i += 1
      }
      s * Geodesy.EarthRadius * Geodesy.EarthRadius / 2.0
    }
    var total = 0.0
    (0 until g.getNumGeometries).foreach { i =>
      g.getGeometryN(i) match {
        case p: Polygon =>
          total += math.abs(ringArea(p.getExteriorRing.getCoordinates))
          (0 until p.getNumInteriorRing).foreach { r =>
            total -= math.abs(ringArea(p.getInteriorRingN(r).getCoordinates))
          }
        case _ => ()
      }
    }
    math.abs(total)
  }
  override def prettyName: String = "st_areasphere"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** st_project(point, distance, azimuth): planar projection of a point by
  * `distance` along `azimuth` (radians clockwise from north, matching
  * st_azimuth): (x + d sin az, y + d cos az). */
case class StProject(children: Seq[Expression]) extends StNary {
  require(children.length == 3, s"st_project expects 3 arguments, got ${children.length}")
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes() =
    StKit.checkTypes(prettyName,
      Seq(children(0) -> "geometry", children(1) -> "numeric", children(2) -> "numeric"))
  protected def run(vs: Seq[Any]): Any = {
    val p = geom(vs(0)).getCentroid.getCoordinate
    val d = dbl(vs(1))
    val az = dbl(vs(2))
    out(Geom.factory.createPoint(new Coordinate(
      p.x + d * math.sin(az), p.y + d * math.cos(az))))
  }
  override def prettyName: String = "st_project"
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression = copy(cs)
}

/** st_geomfromewkt('SRID=4326;POINT (1 2)'): EWKT parser — the reader twin
  * of st_asewkt; plain WKT (no SRID= prefix) is accepted too. */
case class StGeomFromEwkt(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes() = StKit.checkTypes(prettyName, Seq(child -> "string"))
  override def nullSafeEval(input: Any): Any = evalText(input.asInstanceOf[Object])
  def evalText(s: Object): Array[Byte] = {
    val t = s.toString.trim
    val g =
      if (t.regionMatches(true, 0, "SRID=", 0, 5)) {
        val semi = t.indexOf(';')
        require(semi > 0, s"malformed EWKT: $t")
        val srid = t.substring(5, semi).trim.toInt
        val parsed = Geom.fromWkt(t.substring(semi + 1).trim)
        parsed.setSRID(srid)
        parsed
      } else Geom.fromWkt(t)
    out(g)
  }
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) = {
    val ref = ctx.addReferenceObj("stEwkt", this, classOf[StGeomFromEwkt].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.evalText($a);")
  }
  override def prettyName: String = "st_geomfromewkt"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** Typed WKT constructor (PostGIS ST_LineFromText family): parses WKT and
  * returns NULL unless the result is the expected geometry type. */
case class StGeomFromTextTyped(child: Expression, expected: String, fnName: String)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def checkInputDataTypes() = StKit.checkTypes(prettyName, Seq(child -> "string"))
  override def nullSafeEval(input: Any): Any = evalText(input.asInstanceOf[Object])
  def evalText(s: Object): Any = {
    val g = Geom.fromWkt(s.toString)
    if (g.getGeometryType.equalsIgnoreCase(expected)) out(g) else null
  }
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) = {
    val ref = ctx.addReferenceObj("stTypedWkt", this, classOf[StGeomFromTextTyped].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val tmp = ctx.freshName("stRes")
      s"""Object $tmp = $ref.evalText($a);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (byte[]) $tmp; }""".stripMargin
    })
  }
  override def prettyName: String = fnName
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** st_geometricmedian(geom): Weiszfeld iteration over the geometry's
  * vertices — the point minimizing the sum of distances to them (the
  * robust "center" used for outlier-tolerant aggregation). */
case class StGeometricMedian(child: Expression) extends StUnary {
  override def dataType: DataType = BinaryType
  protected def run(g: Geometry): Any = {
    val cs = g.getCoordinates
    if (cs.isEmpty) return null
    var cx = cs.map(_.x).sum / cs.length
    var cy = cs.map(_.y).sum / cs.length
    var iter = 0
    var moved = Double.MaxValue
    while (iter < 100 && moved > 1e-12) {
      var wx = 0.0; var wy = 0.0; var w = 0.0
      var atVertex = false
      cs.foreach { c =>
        val d = math.hypot(c.x - cx, c.y - cy)
        if (d < 1e-15) atVertex = true
        else { wx += c.x / d; wy += c.y / d; w += 1.0 / d }
      }
      if (atVertex || w == 0.0) { moved = 0.0 } // landed on a vertex: done
      else {
        val nx = wx / w; val ny = wy / w
        moved = math.hypot(nx - cx, ny - cy)
        cx = nx; cy = ny
      }
      iter += 1
    }
    out(Geom.factory.createPoint(new Coordinate(cx, cy)))
  }
  override protected def mayReturnNull: Boolean = true
  override def prettyName: String = "st_geometricmedian"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** st_shiftlongitude(geom): maps x from [-180,180) to [0,360) (adds 360 to
  * negative longitudes) — the standard dateline-crossing normalization. */
case class StShiftLongitude(child: Expression) extends StUnary {
  override def dataType: DataType = BinaryType
  protected def run(g: Geometry): Any = {
    val shifted = g.copy()
    shifted.apply(new org.locationtech.jts.geom.CoordinateFilter {
      override def filter(c: Coordinate): Unit = if (c.x < 0) c.x += 360.0
    })
    shifted.geometryChanged()
    out(shifted)
  }
  override def prettyName: String = "st_shiftlongitude"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

private[functions] object XmlGeom {
  private def fmt(d: Double): String =
    if (d == d.toLong.toDouble) d.toLong.toString else d.toString
  private def coords(cs: Array[Coordinate]): String =
    cs.map(c => s"${fmt(c.x)},${fmt(c.y)}").mkString(" ")

  /** KML geometry fragment (no document wrapper), recursive for Multi*. */
  def kml(g: Geometry): String = g match {
    case p: Point => s"<Point><coordinates>${coords(p.getCoordinates)}</coordinates></Point>"
    case l: LineString =>
      s"<LineString><coordinates>${coords(l.getCoordinates)}</coordinates></LineString>"
    case p: Polygon =>
      val outer = s"<outerBoundaryIs><LinearRing><coordinates>${coords(p.getExteriorRing.getCoordinates)}</coordinates></LinearRing></outerBoundaryIs>"
      val inner = (0 until p.getNumInteriorRing).map(i =>
        s"<innerBoundaryIs><LinearRing><coordinates>${coords(p.getInteriorRingN(i).getCoordinates)}</coordinates></LinearRing></innerBoundaryIs>").mkString
      s"<Polygon>$outer$inner</Polygon>"
    case m =>
      (0 until m.getNumGeometries).map(i => kml(m.getGeometryN(i)))
        .mkString("<MultiGeometry>", "", "</MultiGeometry>")
  }

  /** Parse a KML / GML 2 geometry fragment (the `kml`/`gml` writer
    * dialect: Point / LineString / Polygon with outer/inner boundaries or
    * GML 3 exterior/interior, MultiGeometry) into a geometry. Namespace
    * prefixes are ignored; DOCTYPE is rejected (no XXE). */
  def parse(xml: String): Geometry = {
    import org.w3c.dom.{Element, Node}
    val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    dbf.setNamespaceAware(false)
    dbf.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    dbf.setExpandEntityReferences(false)
    val doc = dbf.newDocumentBuilder().parse(
      new org.xml.sax.InputSource(new java.io.StringReader(xml.trim)))

    def local(n: Node): String = {
      val s = n.getNodeName; val i = s.indexOf(':')
      if (i >= 0) s.substring(i + 1) else s
    }
    def children(e: Element): Seq[Element] = {
      val nl = e.getChildNodes
      (0 until nl.getLength).map(nl.item).collect { case el: Element => el }
    }
    def coordsOf(e: Element): Array[Coordinate] = {
      // first descendant <coordinates> (KML/GML2) or <posList> (GML3)
      def find(el: Element): Option[Element] = {
        val name = local(el)
        if (name == "coordinates" || name == "posList") Some(el)
        else children(el).iterator.map(find).collectFirst { case Some(x) => x }
      }
      val holder = find(e).getOrElse(
        throw new IllegalArgumentException(s"no <coordinates> under <${local(e)}>"))
      val text = holder.getTextContent.trim
      if (text.isEmpty) Array.empty
      else if (local(holder) == "posList")
        text.split("\\s+").map(_.toDouble).grouped(2)
          .map(a => new Coordinate(a(0), a(1))).toArray
      else text.split("\\s+").map { tok =>
        val parts = tok.split(",")
        require(parts.length >= 2, s"bad KML/GML coordinate '$tok'")
        if (parts.length >= 3) new Coordinate(parts(0).toDouble, parts(1).toDouble, parts(2).toDouble)
        else new Coordinate(parts(0).toDouble, parts(1).toDouble)
      }
    }
    def build(e: Element): Geometry = local(e) match {
      case "Point" => Geom.factory.createPoint(coordsOf(e).headOption.orNull)
      case "LineString" | "LinearRing" => Geom.factory.createLineString(coordsOf(e))
      case "Polygon" =>
        val kids = children(e)
        def ringOf(el: Element) = Geom.factory.createLinearRing(coordsOf(el))
        val outer = kids.find(k => local(k) == "outerBoundaryIs" || local(k) == "exterior")
          .map(ringOf).getOrElse(
            throw new IllegalArgumentException("Polygon without outer boundary"))
        val inner = kids.filter(k => local(k) == "innerBoundaryIs" || local(k) == "interior")
          .map(ringOf)
        Geom.factory.createPolygon(outer, inner.toArray)
      case "MultiGeometry" | "GeometryCollection" =>
        val gs = children(e).map(build)
        if (gs.nonEmpty && gs.forall(_.isInstanceOf[Point]))
          Geom.factory.createMultiPoint(gs.map(_.asInstanceOf[Point]).toArray)
        else if (gs.nonEmpty && gs.forall(_.isInstanceOf[LineString]))
          Geom.factory.createMultiLineString(gs.map(_.asInstanceOf[LineString]).toArray)
        else if (gs.nonEmpty && gs.forall(_.isInstanceOf[Polygon]))
          Geom.factory.createMultiPolygon(gs.map(_.asInstanceOf[Polygon]).toArray)
        else Geom.factory.createGeometryCollection(gs.toArray)
      case "MultiPoint" | "MultiLineString" | "MultiPolygon" | "MultiCurve" | "MultiSurface" =>
        // GML member wrappers: pointMember / lineStringMember / ... hold one
        // geometry each
        val gs = children(e).flatMap(m => children(m).map(build))
        local(e) match {
          case "MultiPoint" => Geom.factory.createMultiPoint(gs.map(_.asInstanceOf[Point]).toArray)
          case "MultiLineString" | "MultiCurve" =>
            Geom.factory.createMultiLineString(gs.map(_.asInstanceOf[LineString]).toArray)
          case _ => Geom.factory.createMultiPolygon(gs.map(_.asInstanceOf[Polygon]).toArray)
        }
      case other => throw new IllegalArgumentException(s"unsupported KML/GML element <$other>")
    }
    build(doc.getDocumentElement)
  }

  /** GML 2 geometry fragment, recursive for Multi*. */
  def gml(g: Geometry): String = g match {
    case p: Point => s"<gml:Point><gml:coordinates>${coords(p.getCoordinates)}</gml:coordinates></gml:Point>"
    case l: LineString =>
      s"<gml:LineString><gml:coordinates>${coords(l.getCoordinates)}</gml:coordinates></gml:LineString>"
    case p: Polygon =>
      val outer = s"<gml:outerBoundaryIs><gml:LinearRing><gml:coordinates>${coords(p.getExteriorRing.getCoordinates)}</gml:coordinates></gml:LinearRing></gml:outerBoundaryIs>"
      val inner = (0 until p.getNumInteriorRing).map(i =>
        s"<gml:innerBoundaryIs><gml:LinearRing><gml:coordinates>${coords(p.getInteriorRingN(i).getCoordinates)}</gml:coordinates></gml:LinearRing></gml:innerBoundaryIs>").mkString
      s"<gml:Polygon>$outer$inner</gml:Polygon>"
    case m =>
      (0 until m.getNumGeometries).map(i => gml(m.getGeometryN(i)))
        .mkString("<gml:MultiGeometry>", "", "</gml:MultiGeometry>")
  }
}

/** st_askml(geom): KML geometry fragment (integer-valued ordinates print
  * without a decimal point, like PostGIS's trimmed output). */
case class StAsKml(child: Expression) extends StUnary {
  override def dataType: DataType = StringType
  protected def run(g: Geometry): Any = str(XmlGeom.kml(g))
  override def prettyName: String = "st_askml"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** st_asgml(geom): GML 2 geometry fragment. */
case class StAsGml(child: Expression) extends StUnary {
  override def dataType: DataType = StringType
  protected def run(g: Geometry): Any = str(XmlGeom.gml(g))
  override def prettyName: String = "st_asgml"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** st_geomfromkml(text) / st_geomfromgml(text): parses a KML or GML 2/3
  * geometry fragment (reader twin of st_askml / st_asgml — both tag
  * dialects are accepted by the same parser, so the two names share it). */
case class StGeomFromXml(child: Expression, fn: String)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes() = StKit.checkTypes(prettyName, Seq(child -> "string"))
  override def nullSafeEval(input: Any): Any = evalText(input.asInstanceOf[Object])
  def evalText(s: Object): Array[Byte] = out(XmlGeom.parse(s.toString))
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) = {
    val ref = ctx.addReferenceObj("stXml", this, classOf[StGeomFromXml].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.evalText($a);")
  }
  override def prettyName: String = fn
  override protected def withNewChildInternal(c: Expression): Expression = copy(c, fn)
}

/** st_linefrommultipoint(geom): LineString through a MultiPoint's points
  * in order; NULL for other inputs or fewer than 2 points. */
case class StLineFromMultiPoint(child: Expression) extends StUnary {
  override def dataType: DataType = BinaryType
  override protected def mayReturnNull: Boolean = true
  protected def run(g: Geometry): Any = g match {
    case mp: org.locationtech.jts.geom.MultiPoint if mp.getNumGeometries >= 2 =>
      out(Geom.factory.createLineString(mp.getCoordinates))
    case _ => null
  }
  override def prettyName: String = "st_linefrommultipoint"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/**
 * st_distancespheroid(a, b): geodesic distance on the WGS84 ellipsoid via
 * Vincenty's inverse formula (public-domain algorithm, Vincenty 1975);
 * centroids' x=lon, y=lat in degrees, result in meters. Falls back to
 * spherical haversine for the near-antipodal cases where the iteration
 * does not converge.
 */
case class StDistanceSpheroid(left: Expression, right: Expression) extends StBinary {
  override def dataType: DataType = DoubleType
  protected def run(l: Geometry, r: Geometry): Any = {
    val a = l.getCentroid.getCoordinate
    val b = r.getCentroid.getCoordinate
    StDistanceSpheroid.vincenty(a.x, a.y, b.x, b.y)
  }
  override def prettyName: String = "st_distancespheroid"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

object StDistanceSpheroid {
  private val A = 6378137.0
  private val F = 1.0 / 298.257223563
  private val B = A * (1.0 - F)

  def vincenty(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
    if (lon1 == lon2 && lat1 == lat2) return 0.0
    val rad = math.Pi / 180.0
    val u1 = math.atan((1.0 - F) * math.tan(lat1 * rad))
    val u2 = math.atan((1.0 - F) * math.tan(lat2 * rad))
    val dl = (lon2 - lon1) * rad
    val su1 = math.sin(u1); val cu1 = math.cos(u1)
    val su2 = math.sin(u2); val cu2 = math.cos(u2)
    var lambda = dl
    var iter = 0
    var converged = false
    var sinSigma = 0.0; var cosSigma = 0.0; var sigma = 0.0
    var cosSqAlpha = 0.0; var cos2SigmaM = 0.0
    while (iter < 200 && !converged) {
      val sl = math.sin(lambda); val cl = math.cos(lambda)
      sinSigma = math.sqrt(math.pow(cu2 * sl, 2) +
        math.pow(cu1 * su2 - su1 * cu2 * cl, 2))
      if (sinSigma == 0.0) return 0.0 // coincident
      cosSigma = su1 * su2 + cu1 * cu2 * cl
      sigma = math.atan2(sinSigma, cosSigma)
      val sinAlpha = cu1 * cu2 * sl / sinSigma
      cosSqAlpha = 1.0 - sinAlpha * sinAlpha
      cos2SigmaM = if (cosSqAlpha == 0.0) 0.0 // equatorial line
      else cosSigma - 2.0 * su1 * su2 / cosSqAlpha
      val c = F / 16.0 * cosSqAlpha * (4.0 + F * (4.0 - 3.0 * cosSqAlpha))
      val prev = lambda
      lambda = dl + (1.0 - c) * F * sinAlpha *
        (sigma + c * sinSigma * (cos2SigmaM + c * cosSigma *
          (-1.0 + 2.0 * cos2SigmaM * cos2SigmaM)))
      if (math.abs(lambda - prev) < 1e-12) converged = true
      iter += 1
    }
    if (!converged) // near-antipodal: spherical fallback
      return Geodesy.haversine(lon1, lat1, lon2, lat2, (2.0 * A + B) / 3.0)
    val uSq = cosSqAlpha * (A * A - B * B) / (B * B)
    val bigA = 1.0 + uSq / 16384.0 * (4096.0 + uSq * (-768.0 + uSq * (320.0 - 175.0 * uSq)))
    val bigB = uSq / 1024.0 * (256.0 + uSq * (-128.0 + uSq * (74.0 - 47.0 * uSq)))
    val deltaSigma = bigB * sinSigma * (cos2SigmaM + bigB / 4.0 *
      (cosSigma * (-1.0 + 2.0 * cos2SigmaM * cos2SigmaM) -
        bigB / 6.0 * cos2SigmaM * (-3.0 + 4.0 * sinSigma * sinSigma) *
          (-3.0 + 4.0 * cos2SigmaM * cos2SigmaM)))
    B * bigA * (sigma - deltaSigma)
  }
}

/** st_setpoint(line, idx, point): replace vertex `idx` (0-based; negative
  * counts from the end) of a LineString; NULL for non-lines or
  * out-of-range indexes. */
case class StSetPoint(children: Seq[Expression]) extends StNary {
  require(children.length == 3, s"st_setpoint expects 3 arguments, got ${children.length}")
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes() =
    StKit.checkTypes(prettyName,
      Seq(children(0) -> "geometry", children(1) -> "numeric", children(2) -> "geometry"))
  protected def run(vs: Seq[Any]): Any = geom(vs(0)) match {
    case l: LineString =>
      val n = l.getNumPoints
      val raw = int(vs(1))
      val idx = if (raw < 0) n + raw else raw
      geom(vs(2)) match {
        case p: Point if idx >= 0 && idx < n =>
          val cs = l.getCoordinates.clone()
          cs(idx) = p.getCoordinate.copy()
          out(Geom.factory.createLineString(cs))
        case _ => null
      }
    case _ => null
  }
  override def prettyName: String = "st_setpoint"
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression = copy(cs)
}
