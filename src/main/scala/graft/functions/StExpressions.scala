package graft.functions

import graft.geom.Geom

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.locationtech.jts.geom.Geometry
import org.locationtech.jts.geom.prep.{PreparedGeometry, PreparedGeometryFactory}
import org.locationtech.jts.simplify.{DouglasPeuckerSimplifier, TopologyPreservingSimplifier}

/**
 * Catalyst expressions for the ST_ function catalog.
 *
 * Re-expression of the Sedona function surface the reference registers via
 * SedonaExpressionsRegistrator (reference: extension/.../UDF/SedonaExpressionsRegistrator.scala:37),
 * built directly as Spark `Expression`s over WKB `BINARY` values — no UDT,
 * no Scala UDF wrapper, so Catalyst sees ordinary deterministic,
 * null-intolerant expressions it can fold, push, and reorder.
 *
 * Foldable (literal) geometry operands are deserialized once per thread —
 * predicates additionally build a JTS PreparedGeometry (indexed) for the
 * constant side, which is the same trick Sedona's range-query path uses
 * and is what makes `WHERE ST_Contains(<const poly>, geom)` cheap on wide
 * scans.
 */
object StKit {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

  /** Analysis-time type check without ExpectsInputTypes (whose
    * AbstractDataType is private[sql] in Spark 4.1): geometry args must be
    * BINARY (WKB), coordinate/measure args any numeric, text args STRING. */
  def checkTypes(fn: String, args: Seq[(Expression, String)]): TypeCheckResult = {
    args.zipWithIndex.collectFirst {
      case ((e, kind), i) if !ok(e.dataType, kind) =>
        TypeCheckResult.TypeCheckFailure(
          s"$fn argument ${i + 1} expects $kind, got ${e.dataType.simpleString}")
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)
  }

  private def ok(dt: DataType, kind: String): Boolean = kind match {
    case "geometry" => dt == BinaryType || dt == NullType
    case "numeric" => dt.isInstanceOf[NumericType] || dt == NullType
    case "string" => dt == StringType || dt == NullType
    case _ => true
  }

  def bytes(a: Any): Array[Byte] = a.asInstanceOf[Array[Byte]]
  def geom(a: Any): Geometry = Geom.deserialize(bytes(a))
  def out(g: Geometry): Array[Byte] = Geom.serialize(g)
  def str(s: String): UTF8String = UTF8String.fromString(s)
  // Runtime numeric coercion: with AbstractDataType private[sql] in Spark
  // 4.1 we can't declare ImplicitCastInputTypes, so accept any numeric
  // (SQL integer literals arrive as java.lang.Integer/Long).
  def dbl(a: Any): Double = a match {
    case d: java.lang.Number => d.doubleValue()
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case other => other.asInstanceOf[Double]
  }
  def int(a: Any): Int = a match {
    case d: java.lang.Number => d.intValue()
    case other => other.asInstanceOf[Int]
  }
}
import StKit._

// ---------------------------------------------------------------------------
// Base shapes
// ---------------------------------------------------------------------------

/** Java cast/unbox snippet for an Object-returning helper call. */
private[functions] object StCodegen {
  import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
  def cast(call: String, dt: DataType): String = dt match {
    case DoubleType => s"((java.lang.Double)$call).doubleValue()"
    case IntegerType => s"((java.lang.Integer)$call).intValue()"
    case BooleanType => s"((java.lang.Boolean)$call).booleanValue()"
    case _ => s"(${CodeGenerator.javaType(dt)})$call"
  }
  /** Box a primitive value for an Object parameter. NEVER `(Object)(v)`:
    * Janino parses a reference cast of a negative literal
    * (`(Object)(-5.0D)`) as binary minus and fails the whole projection
    * into interpreted mode. */
  def box(v: String, dt: DataType): String =
    if (CodeGenerator.isPrimitiveType(dt)) s"${CodeGenerator.boxedType(dt)}.valueOf($v)"
    else v
}

/**
 * Unary geometry expression: BINARY(wkb) -> dataType. Real `doGenCode`
 * (children inline in whole-stage codegen; one virtual call + result unbox
 * per row — no CodegenFallback row materialization).
 */
abstract class StUnary extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes() = StKit.checkTypes(prettyName, Seq(child -> "geometry"))
  /** True for accessors that return SQL NULL on type-mismatched geometry
    * (st_x of a polygon, st_startpoint of a point, ...). Drives `nullable`
    * — without it the unsafe row writer would silently turn NULL into 0. */
  protected def mayReturnNull: Boolean = false
  override def nullable: Boolean = child.nullable || mayReturnNull
  protected def run(g: Geometry): Any
  override def nullSafeEval(input: Any): Any = run(geom(input))
  /** Entry point for generated code. */
  def evalWkb(b: Array[Byte]): Any = run(Geom.deserialize(b))
  override protected def doGenCode(ctx: codegen.CodegenContext, ev: codegen.ExprCode): codegen.ExprCode = {
    val ref = ctx.addReferenceObj("stExpr", this, classOf[StUnary].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val call = s"$ref.evalWkb($a)"
      if (mayReturnNull) {
        val tmp = ctx.freshName("stRes")
        s"""Object $tmp = $call;
           |if ($tmp == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = ${StCodegen.cast(tmp, dataType)}; }""".stripMargin
      } else s"${ev.value} = ${StCodegen.cast(call, dataType)};"
    })
  }
}

/** Geometry x Geometry -> Boolean predicate with prepared-literal fast path. */
abstract class StPredicate extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes() = StKit.checkTypes(prettyName, Seq(left -> "geometry", right -> "geometry"))

  /** Plain JTS predicate. */
  protected def op(l: Geometry, r: Geometry): Boolean
  /** Prepared-side variant; `base` is the prepared (constant) geometry.
    * `baseIsLeft` says which argument position it came from. */
  protected def prepOp(base: PreparedGeometry, other: Geometry, baseIsLeft: Boolean): Boolean

  @transient private lazy val foldedLeft: Array[Byte] =
    if (left.foldable) bytes(left.eval(null)) else null
  @transient private lazy val foldedRight: Array[Byte] =
    if (!left.foldable && right.foldable) bytes(right.eval(null)) else null

  // PreparedGeometry lazily builds its internal index → not safe to share
  // across task threads; one per thread.
  @transient private lazy val prepCache: ThreadLocal[PreparedGeometry] =
    ThreadLocal.withInitial { () =>
      val b = if (foldedLeft != null) foldedLeft else foldedRight
      PreparedGeometryFactory.prepare(Geom.deserialize(b))
    }

  /** Entry point for both interpreted eval and generated code. */
  def evalWkb(l: Array[Byte], r: Array[Byte]): Boolean = {
    if (foldedLeft != null) prepOp(prepCache.get(), Geom.deserialize(r), baseIsLeft = true)
    else if (foldedRight != null) prepOp(prepCache.get(), Geom.deserialize(l), baseIsLeft = false)
    else op(Geom.deserialize(l), Geom.deserialize(r))
  }

  override def nullSafeEval(l: Any, r: Any): Any = evalWkb(bytes(l), bytes(r))

  override protected def doGenCode(ctx: codegen.CodegenContext, ev: codegen.ExprCode): codegen.ExprCode = {
    val ref = ctx.addReferenceObj("stPred", this, classOf[StPredicate].getName)
    nullSafeCodeGen(ctx, ev, (l, r) => s"${ev.value} = $ref.evalWkb($l, $r);")
  }
}

/** Geometry x Geometry -> result (non-predicate binary ops). */
abstract class StBinary extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes() = StKit.checkTypes(prettyName, Seq(left -> "geometry", right -> "geometry"))
  protected def mayReturnNull: Boolean = false
  override def nullable: Boolean = left.nullable || right.nullable || mayReturnNull
  protected def run(l: Geometry, r: Geometry): Any
  override def nullSafeEval(l: Any, r: Any): Any = run(geom(l), geom(r))
  def evalWkb(l: Array[Byte], r: Array[Byte]): Any = run(Geom.deserialize(l), Geom.deserialize(r))
  override protected def doGenCode(ctx: codegen.CodegenContext, ev: codegen.ExprCode): codegen.ExprCode = {
    val ref = ctx.addReferenceObj("stExpr", this, classOf[StBinary].getName)
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val call = s"$ref.evalWkb($l, $r)"
      if (mayReturnNull) {
        val tmp = ctx.freshName("stRes")
        s"""Object $tmp = $call;
           |if ($tmp == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = ${StCodegen.cast(tmp, dataType)}; }""".stripMargin
      } else s"${ev.value} = ${StCodegen.cast(call, dataType)};"
    })
  }
}

/**
 * Codegen for (geometry, scalar) binaries that keep their interpreted
 * `nullSafeEval`: generated code calls the boxed evaluator through a
 * reference object. The JTS work dominates these, but staying OUT of
 * CodegenFallback matters anyway — a fallback splits the surrounding
 * whole-stage pipeline and row-boxes every input, which taxes the whole
 * stage, not just this expression.
 */
trait StScalarCodegen extends BinaryExpression {
  /** True when nullSafeEval can return null on non-null inputs. */
  protected def mayReturnNull: Boolean = false
  def evalBoxed(l: Any, r: Any): Any = nullSafeEval(l, r)
  override protected def doGenCode(ctx: codegen.CodegenContext, ev: codegen.ExprCode): codegen.ExprCode = {
    val ref = ctx.addReferenceObj("stExpr", this, classOf[StScalarCodegen].getName)
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val call = s"$ref.evalBoxed($l, $r)"
      if (mayReturnNull) {
        val tmp = ctx.freshName("stRes")
        s"""Object $tmp = $call;
           |if ($tmp == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = ${StCodegen.cast(tmp, dataType)}; }""".stripMargin
      } else s"${ev.value} = ${StCodegen.cast(call, dataType)};"
    })
  }
}

/** N-ary expression evaluating all children, null if any input is null. */
abstract class StNary extends Expression {
  override def nullable: Boolean = true
  // Expression's default is `false`, which would hide literal envelopes from
  // ConstantFolding, the PreparedGeometry fast path, and GeoBboxPushdown.
  override def foldable: Boolean = children.forall(_.foldable)
  protected def run(values: Seq[Any]): Any
  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) null else run(vs)
  }
  /** Entry point for generated code (children pre-evaluated, none null). */
  def runBoxed(values: Array[Object]): Any = run(values.toSeq)
  override protected def doGenCode(ctx: codegen.CodegenContext, ev: codegen.ExprCode): codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
    val ref = ctx.addReferenceObj("stNary", this, classOf[StNary].getName)
    val gens = children.map(_.genCode(ctx))
    val args = ctx.freshName("stArgs")
    val javaT = CodeGenerator.javaType(dataType)
    val fills = gens.zip(children).zipWithIndex.map { case ((g, c), i) =>
      s"if (${g.isNull}) { ${ev.isNull} = true; } else { $args[$i] = ${StCodegen.box(g.value, c.dataType)}; }"
    }.mkString("\n")
    val tmp = ctx.freshName("stRes")
    ev.copy(code = code"""
      ${gens.map(_.code.toString).mkString("\n")}
      boolean ${ev.isNull} = false;
      Object[] $args = new Object[${children.length}];
      $fills
      $javaT ${ev.value} = ${CodeGenerator.defaultValue(dataType)};
      if (!${ev.isNull}) {
        Object $tmp = $ref.runBoxed($args);
        if ($tmp == null) { ${ev.isNull} = true; }
        else { ${ev.value} = ${StCodegen.cast(tmp, dataType)}; }
      }""")
  }
}

// ---------------------------------------------------------------------------
// Constructors
// ---------------------------------------------------------------------------

case class StPoint(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes() = StKit.checkTypes(prettyName, Seq(left -> "numeric", right -> "numeric"))
  override def nullSafeEval(x: Any, y: Any): Any =
    out(Geom.point(dbl(x), dbl(y)))
  def evalBoxed(x: Object, y: Object): Array[Byte] = out(Geom.point(dbl(x), dbl(y)))
  override protected def doGenCode(ctx: codegen.CodegenContext, ev: codegen.ExprCode): codegen.ExprCode = {
    val ref = ctx.addReferenceObj("stPoint", this, classOf[StPoint].getName)
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = $ref.evalBoxed(${StCodegen.box(x, left.dataType)}, ${StCodegen.box(y, right.dataType)});")
  }
  override def prettyName: String = "st_point"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

case class StPolygonFromEnvelope(children: Seq[Expression]) extends StNary {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes() = StKit.checkTypes(prettyName, children.map(_ -> "numeric"))
  protected def run(vs: Seq[Any]): Any = {
    val d = vs.map(dbl)
    out(Geom.polygonFromEnvelope(d(0), d(1), d(2), d(3)))
  }
  override def prettyName: String = "st_polygonfromenvelope"
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression = copy(cs)
}

case class StGeomFromText(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes() = StKit.checkTypes(prettyName, Seq(child -> "string"))
  override def nullSafeEval(v: Any): Any = out(Geom.fromWkt(v.toString))
  def evalStr(s: Object): Array[Byte] = out(Geom.fromWkt(s.toString))
  override protected def doGenCode(ctx: codegen.CodegenContext, ev: codegen.ExprCode): codegen.ExprCode = {
    val ref = ctx.addReferenceObj("stFromText", this, classOf[StGeomFromText].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.evalStr($v);")
  }
  override def prettyName: String = "st_geomfromtext"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

case class StGeomFromWKB(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes() = StKit.checkTypes(prettyName, Seq(child -> "geometry"))
  // Normalizes arbitrary (possibly EWKB) input bytes into our canonical form.
  override def nullSafeEval(v: Any): Any = out(geom(v))
  def evalBytes(v: Object): Array[Byte] = out(geom(v))
  // codegen'd (not CodegenFallback): this constructor sits on every WKB
  // ingest path, and a fallback here would break the surrounding
  // whole-stage-codegen span for the entire scan projection
  override protected def doGenCode(ctx: codegen.CodegenContext, ev: codegen.ExprCode): codegen.ExprCode = {
    val ref = ctx.addReferenceObj("stFromWkb", this, classOf[StGeomFromWKB].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.evalBytes($v);")
  }
  override def prettyName: String = "st_geomfromwkb"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** LINESTRING through the given points (2+ geometry args). */
case class StMakeLine(children: Seq[Expression]) extends StNary {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes() =
    StKit.checkTypes(prettyName, children.map(_ -> "geometry"))
  protected def run(vs: Seq[Any]): Any = {
    val coords = vs.map(v => geom(v).getCoordinate).toArray
    out(Geom.factory.createLineString(coords))
  }
  override def prettyName: String = "st_makeline"
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression = copy(cs)
}

// ---------------------------------------------------------------------------
// Output / accessors
// ---------------------------------------------------------------------------

case class StAsText(child: Expression) extends StUnary {
  override def dataType: DataType = StringType
  protected def run(g: Geometry): Any = str(Geom.toWkt(g))
  override def prettyName: String = "st_astext"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

case class StAsGeoJson(child: Expression) extends StUnary {
  override def dataType: DataType = StringType
  protected def run(g: Geometry): Any = str(Geom.toGeoJson(g))
  override def prettyName: String = "st_asgeojson"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

case class StAsBinary(child: Expression) extends StUnary {
  override def dataType: DataType = BinaryType
  // interop contract: plain ISO WKB, no EWKB SRID flag
  protected def run(g: Geometry): Any = Geom.serializeIso(g)
  override def prettyName: String = "st_asbinary"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

case class StX(child: Expression) extends StUnary {
  override protected def mayReturnNull: Boolean = true
  override def dataType: DataType = DoubleType
  protected def run(g: Geometry): Any = g match {
    case p: org.locationtech.jts.geom.Point => p.getX
    case _ => null
  }
  override def prettyName: String = "st_x"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

case class StY(child: Expression) extends StUnary {
  override protected def mayReturnNull: Boolean = true
  override def dataType: DataType = DoubleType
  protected def run(g: Geometry): Any = g match {
    case p: org.locationtech.jts.geom.Point => p.getY
    case _ => null
  }
  override def prettyName: String = "st_y"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

case class StXMin(child: Expression) extends StUnary {
  override def dataType: DataType = DoubleType
  protected def run(g: Geometry): Any = g.getEnvelopeInternal.getMinX
  override def prettyName: String = "st_xmin"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}
case class StYMin(child: Expression) extends StUnary {
  override def dataType: DataType = DoubleType
  protected def run(g: Geometry): Any = g.getEnvelopeInternal.getMinY
  override def prettyName: String = "st_ymin"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}
case class StXMax(child: Expression) extends StUnary {
  override def dataType: DataType = DoubleType
  protected def run(g: Geometry): Any = g.getEnvelopeInternal.getMaxX
  override def prettyName: String = "st_xmax"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}
case class StYMax(child: Expression) extends StUnary {
  override def dataType: DataType = DoubleType
  protected def run(g: Geometry): Any = g.getEnvelopeInternal.getMaxY
  override def prettyName: String = "st_ymax"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

case class StArea(child: Expression) extends StUnary {
  override def dataType: DataType = DoubleType
  protected def run(g: Geometry): Any = g.getArea
  override def prettyName: String = "st_area"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

case class StLength(child: Expression) extends StUnary {
  override def dataType: DataType = DoubleType
  protected def run(g: Geometry): Any = g.getLength
  override def prettyName: String = "st_length"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

case class StCentroid(child: Expression) extends StUnary {
  override def dataType: DataType = BinaryType
  protected def run(g: Geometry): Any = out(g.getCentroid)
  override def prettyName: String = "st_centroid"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

case class StEnvelope(child: Expression) extends StUnary {
  override def dataType: DataType = BinaryType
  protected def run(g: Geometry): Any = out(g.getEnvelope)
  override def prettyName: String = "st_envelope"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

case class StBoundary(child: Expression) extends StUnary {
  override def dataType: DataType = BinaryType
  protected def run(g: Geometry): Any = out(g.getBoundary)
  override def prettyName: String = "st_boundary"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

case class StGeometryType(child: Expression) extends StUnary {
  override def dataType: DataType = StringType
  protected def run(g: Geometry): Any = str("ST_" + g.getGeometryType)
  override def prettyName: String = "st_geometrytype"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

case class StNumPoints(child: Expression) extends StUnary {
  override def dataType: DataType = IntegerType
  protected def run(g: Geometry): Any = g.getNumPoints
  override def prettyName: String = "st_numpoints"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

case class StNumGeometries(child: Expression) extends StUnary {
  override def dataType: DataType = IntegerType
  protected def run(g: Geometry): Any = g.getNumGeometries
  override def prettyName: String = "st_numgeometries"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

case class StIsEmpty(child: Expression) extends StUnary {
  override def dataType: DataType = BooleanType
  protected def run(g: Geometry): Any = g.isEmpty
  override def prettyName: String = "st_isempty"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

case class StIsValid(child: Expression) extends StUnary {
  override def dataType: DataType = BooleanType
  protected def run(g: Geometry): Any = g.isValid
  override def prettyName: String = "st_isvalid"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

case class StSrid(child: Expression) extends StUnary {
  override def dataType: DataType = IntegerType
  protected def run(g: Geometry): Any = g.getSRID
  override def prettyName: String = "st_srid"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

case class StSetSrid(left: Expression, right: Expression)
    extends StScalarCodegen {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes() = StKit.checkTypes(prettyName, Seq(left -> "geometry", right -> "numeric"))
  override def nullSafeEval(g: Any, srid: Any): Any = {
    val geo = geom(g)
    geo.setSRID(int(srid))
    out(geo)
  }
  override def prettyName: String = "st_setsrid"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

case class StNormalize(child: Expression) extends StUnary {
  override def dataType: DataType = BinaryType
  protected def run(g: Geometry): Any = { val c = g.copy(); c.normalize(); out(c) }
  override def prettyName: String = "st_normalize"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

// ---------------------------------------------------------------------------
// Predicates
// ---------------------------------------------------------------------------

case class StContains(left: Expression, right: Expression) extends StPredicate {
  protected def op(l: Geometry, r: Geometry): Boolean = l.contains(r)
  protected def prepOp(p: PreparedGeometry, o: Geometry, baseIsLeft: Boolean): Boolean =
    if (baseIsLeft) p.contains(o) else p.within(o)
  override def prettyName: String = "st_contains"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

case class StWithin(left: Expression, right: Expression) extends StPredicate {
  protected def op(l: Geometry, r: Geometry): Boolean = l.within(r)
  protected def prepOp(p: PreparedGeometry, o: Geometry, baseIsLeft: Boolean): Boolean =
    if (baseIsLeft) p.within(o) else p.contains(o)
  override def prettyName: String = "st_within"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

case class StIntersects(left: Expression, right: Expression) extends StPredicate {
  protected def op(l: Geometry, r: Geometry): Boolean = l.intersects(r)
  protected def prepOp(p: PreparedGeometry, o: Geometry, baseIsLeft: Boolean): Boolean = p.intersects(o)
  override def prettyName: String = "st_intersects"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

case class StDisjoint(left: Expression, right: Expression) extends StPredicate {
  protected def op(l: Geometry, r: Geometry): Boolean = l.disjoint(r)
  protected def prepOp(p: PreparedGeometry, o: Geometry, baseIsLeft: Boolean): Boolean = p.disjoint(o)
  override def prettyName: String = "st_disjoint"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

case class StCovers(left: Expression, right: Expression) extends StPredicate {
  protected def op(l: Geometry, r: Geometry): Boolean = l.covers(r)
  protected def prepOp(p: PreparedGeometry, o: Geometry, baseIsLeft: Boolean): Boolean =
    if (baseIsLeft) p.covers(o) else p.coveredBy(o)
  override def prettyName: String = "st_covers"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

case class StCoveredBy(left: Expression, right: Expression) extends StPredicate {
  protected def op(l: Geometry, r: Geometry): Boolean = l.coveredBy(r)
  protected def prepOp(p: PreparedGeometry, o: Geometry, baseIsLeft: Boolean): Boolean =
    if (baseIsLeft) p.coveredBy(o) else p.covers(o)
  override def prettyName: String = "st_coveredby"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

case class StCrosses(left: Expression, right: Expression) extends StPredicate {
  protected def op(l: Geometry, r: Geometry): Boolean = l.crosses(r)
  protected def prepOp(p: PreparedGeometry, o: Geometry, baseIsLeft: Boolean): Boolean =
    if (baseIsLeft) p.crosses(o) else o.crosses(p.getGeometry)
  override def prettyName: String = "st_crosses"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

case class StOverlaps(left: Expression, right: Expression) extends StPredicate {
  protected def op(l: Geometry, r: Geometry): Boolean = l.overlaps(r)
  protected def prepOp(p: PreparedGeometry, o: Geometry, baseIsLeft: Boolean): Boolean = p.overlaps(o)
  override def prettyName: String = "st_overlaps"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

case class StTouches(left: Expression, right: Expression) extends StPredicate {
  protected def op(l: Geometry, r: Geometry): Boolean = l.touches(r)
  protected def prepOp(p: PreparedGeometry, o: Geometry, baseIsLeft: Boolean): Boolean = p.touches(o)
  override def prettyName: String = "st_touches"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

case class StEquals(left: Expression, right: Expression) extends StPredicate {
  protected def op(l: Geometry, r: Geometry): Boolean = l.equalsTopo(r)
  protected def prepOp(p: PreparedGeometry, o: Geometry, baseIsLeft: Boolean): Boolean =
    p.getGeometry.equalsTopo(o)
  override def prettyName: String = "st_equals"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

case class StOrderingEquals(left: Expression, right: Expression) extends StPredicate {
  protected def op(l: Geometry, r: Geometry): Boolean = l.equalsExact(r)
  protected def prepOp(p: PreparedGeometry, o: Geometry, baseIsLeft: Boolean): Boolean =
    if (baseIsLeft) p.getGeometry.equalsExact(o) else o.equalsExact(p.getGeometry)
  override def prettyName: String = "st_orderingequals"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

case class StDWithin(children: Seq[Expression]) extends StNary {
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes() = StKit.checkTypes(prettyName, Seq(children(0) -> "geometry", children(1) -> "geometry", children(2) -> "numeric"))
  protected def run(vs: Seq[Any]): Any =
    geom(vs(0)).isWithinDistance(geom(vs(1)), dbl(vs(2)))
  override def prettyName: String = "st_dwithin"
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression = copy(cs)
}

// ---------------------------------------------------------------------------
// Measures / transforms on pairs
// ---------------------------------------------------------------------------

case class StDistance(left: Expression, right: Expression) extends StBinary {
  override def dataType: DataType = DoubleType
  protected def run(l: Geometry, r: Geometry): Any = l.distance(r)
  override def prettyName: String = "st_distance"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

case class StUnion(left: Expression, right: Expression) extends StBinary {
  override def dataType: DataType = BinaryType
  protected def run(l: Geometry, r: Geometry): Any = out(l.union(r))
  override def prettyName: String = "st_union"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

case class StIntersection(left: Expression, right: Expression) extends StBinary {
  override def dataType: DataType = BinaryType
  protected def run(l: Geometry, r: Geometry): Any = out(l.intersection(r))
  override def prettyName: String = "st_intersection"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

case class StDifference(left: Expression, right: Expression) extends StBinary {
  override def dataType: DataType = BinaryType
  protected def run(l: Geometry, r: Geometry): Any = out(l.difference(r))
  override def prettyName: String = "st_difference"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

case class StSymDifference(left: Expression, right: Expression) extends StBinary {
  override def dataType: DataType = BinaryType
  protected def run(l: Geometry, r: Geometry): Any = out(l.symDifference(r))
  override def prettyName: String = "st_symdifference"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

case class StBuffer(left: Expression, right: Expression)
    extends StScalarCodegen {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes() = StKit.checkTypes(prettyName, Seq(left -> "geometry", right -> "numeric"))
  override def nullSafeEval(g: Any, d: Any): Any = out(geom(g).buffer(dbl(d)))
  override def prettyName: String = "st_buffer"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

case class StConvexHull(child: Expression) extends StUnary {
  override def dataType: DataType = BinaryType
  protected def run(g: Geometry): Any = out(g.convexHull())
  override def prettyName: String = "st_convexhull"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

case class StSimplify(left: Expression, right: Expression)
    extends StScalarCodegen {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes() = StKit.checkTypes(prettyName, Seq(left -> "geometry", right -> "numeric"))
  override def nullSafeEval(g: Any, d: Any): Any =
    out(DouglasPeuckerSimplifier.simplify(geom(g), dbl(d)))
  override def prettyName: String = "st_simplify"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

case class StDimension(child: Expression) extends StUnary {
  override def dataType: DataType = IntegerType
  protected def run(g: Geometry): Any = g.getDimension
  override def prettyName: String = "st_dimension"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** 1-based, like PostGIS/Sedona; null when out of range or wrong type. */
case class StGeometryN(left: Expression, right: Expression)
    extends StScalarCodegen {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override protected def mayReturnNull: Boolean = true
  override def checkInputDataTypes() = StKit.checkTypes(prettyName, Seq(left -> "geometry", right -> "numeric"))
  override def nullSafeEval(g: Any, n: Any): Any = {
    val geo = geom(g); val i = int(n)
    if (i < 1 || i > geo.getNumGeometries) null else out(geo.getGeometryN(i - 1))
  }
  override def prettyName: String = "st_geometryn"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

case class StPointN(left: Expression, right: Expression)
    extends StScalarCodegen {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override protected def mayReturnNull: Boolean = true
  override def checkInputDataTypes() = StKit.checkTypes(prettyName, Seq(left -> "geometry", right -> "numeric"))
  override def nullSafeEval(g: Any, n: Any): Any = geom(g) match {
    case l: org.locationtech.jts.geom.LineString =>
      val i = int(n)
      if (i < 1 || i > l.getNumPoints) null else out(l.getPointN(i - 1))
    case _ => null
  }
  override def prettyName: String = "st_pointn"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

case class StStartPoint(child: Expression) extends StUnary {
  override protected def mayReturnNull: Boolean = true
  override def dataType: DataType = BinaryType
  protected def run(g: Geometry): Any = g match {
    case l: org.locationtech.jts.geom.LineString => out(l.getStartPoint)
    case _ => null
  }
  override def prettyName: String = "st_startpoint"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

case class StEndPoint(child: Expression) extends StUnary {
  override protected def mayReturnNull: Boolean = true
  override def dataType: DataType = BinaryType
  protected def run(g: Geometry): Any = g match {
    case l: org.locationtech.jts.geom.LineString => out(l.getEndPoint)
    case _ => null
  }
  override def prettyName: String = "st_endpoint"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

case class StExteriorRing(child: Expression) extends StUnary {
  override protected def mayReturnNull: Boolean = true
  override def dataType: DataType = BinaryType
  protected def run(g: Geometry): Any = g match {
    case p: org.locationtech.jts.geom.Polygon =>
      out(Geom.factory.createLineString(p.getExteriorRing.getCoordinateSequence))
    case _ => null
  }
  override def prettyName: String = "st_exteriorring"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

case class StNumInteriorRings(child: Expression) extends StUnary {
  override protected def mayReturnNull: Boolean = true
  override def dataType: DataType = IntegerType
  protected def run(g: Geometry): Any = g match {
    case p: org.locationtech.jts.geom.Polygon => p.getNumInteriorRing
    case _ => null
  }
  override def prettyName: String = "st_numinteriorrings"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

case class StReverse(child: Expression) extends StUnary {
  override def dataType: DataType = BinaryType
  protected def run(g: Geometry): Any = out(g.reverse())
  override def prettyName: String = "st_reverse"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

case class StFlipCoordinates(child: Expression) extends StUnary {
  override def dataType: DataType = BinaryType
  protected def run(g: Geometry): Any = {
    val c = g.copy()
    c.apply(new org.locationtech.jts.geom.CoordinateSequenceFilter {
      override def filter(seq: org.locationtech.jts.geom.CoordinateSequence, i: Int): Unit = {
        val x = seq.getX(i)
        seq.setOrdinate(i, 0, seq.getY(i))
        seq.setOrdinate(i, 1, x)
      }
      override def isDone: Boolean = false
      override def isGeometryChanged: Boolean = true
    })
    c.geometryChanged()
    out(c)
  }
  override def prettyName: String = "st_flipcoordinates"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** Translate by (dx, dy): children = (geom, dx, dy). */
case class StTranslate(children: Seq[Expression]) extends StNary {
  require(children.length == 3 || children.length == 4,
    s"st_translate expects (geom, dx, dy[, dz]), got ${children.length} args")
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes() =
    StKit.checkTypes(prettyName,
      Seq(children(0) -> "geometry") ++ children.drop(1).map(_ -> "numeric"))
  protected def run(vs: Seq[Any]): Any = {
    val g = geom(vs(0)).copy()
    val dx = dbl(vs(1)); val dy = dbl(vs(2))
    val dz = if (vs.length > 3) dbl(vs(3)) else 0.0
    g.apply(new org.locationtech.jts.geom.CoordinateSequenceFilter {
      override def filter(seq: org.locationtech.jts.geom.CoordinateSequence, i: Int): Unit = {
        seq.setOrdinate(i, 0, seq.getX(i) + dx)
        seq.setOrdinate(i, 1, seq.getY(i) + dy)
        if (dz != 0.0 && seq.getDimension >= 3 && !java.lang.Double.isNaN(seq.getZ(i)))
          seq.setOrdinate(i, 2, seq.getZ(i) + dz)
      }
      override def isDone: Boolean = false
      override def isGeometryChanged: Boolean = true
    })
    g.geometryChanged()
    out(g)
  }
  override def prettyName: String = "st_translate"
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression = copy(cs)
}

/** Azimuth from point A to point B in radians clockwise from north. */
case class StAzimuth(left: Expression, right: Expression) extends StBinary {
  override protected def mayReturnNull: Boolean = true
  override def dataType: DataType = DoubleType
  protected def run(l: Geometry, r: Geometry): Any = (l, r) match {
    case (a: org.locationtech.jts.geom.Point, b: org.locationtech.jts.geom.Point) =>
      val az = math.atan2(b.getX - a.getX, b.getY - a.getY)
      if (az < 0) az + 2 * math.Pi else az
    case _ => null
  }
  override def prettyName: String = "st_azimuth"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

case class StClosestPoint(left: Expression, right: Expression) extends StBinary {
  override def dataType: DataType = BinaryType
  protected def run(l: Geometry, r: Geometry): Any =
    out(Geom.factory.createPoint(
      org.locationtech.jts.operation.distance.DistanceOp.nearestPoints(l, r)(0)))
  override def prettyName: String = "st_closestpoint"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

case class StSimplifyPreserveTopology(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes() = StKit.checkTypes(prettyName, Seq(left -> "geometry", right -> "numeric"))
  override def nullSafeEval(g: Any, d: Any): Any =
    out(TopologyPreservingSimplifier.simplify(geom(g), dbl(d)))
  override def prettyName: String = "st_simplifypreservetopology"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}
