package graft.functions

import graft.geom.{Crs, Geom}

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.locationtech.jts.geom.Geometry
import org.locationtech.jts.geom.util.GeometryFixer

import StKit._

/**
 * CRS reprojection + geometry repair + GeoJSON ingestion — the
 * ingestion-and-interop slice of the Sedona catalog the reference registers
 * (reference: extension/.../UDF/SedonaExpressionsRegistrator.scala:37
 * registers ST_Transform / ST_MakeValid / ST_GeomFromGeoJSON among the
 * Sedona functions).
 */

/** st_transform(geom, srcCrs, dstCrs): closed-form WGS84 / web-mercator /
  * UTM reprojection (graft.geom.Crs). CRS args are almost always literals;
  * they're parsed once per partition via a tiny memo, not per row. */
case class StTransform(children: Seq[Expression]) extends StNary {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes() = StKit.checkTypes(prettyName,
    Seq(children(0) -> "geometry", children(1) -> "string", children(2) -> "string"))

  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, Crs.Code]()
  private def code(s: Any): Crs.Code =
    memo.computeIfAbsent(s.toString, c => Crs.parse(c))

  protected def run(vs: Seq[Any]): Any =
    out(Crs.transform(geom(vs(0)), code(vs(1)), code(vs(2))))
  override def prettyName: String = "st_transform"
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression = copy(cs)
}

/** st_makevalid(geom): JTS GeometryFixer — repairs self-intersections,
  * bowties, duplicate rings; valid input passes through unchanged. */
case class StMakeValid(child: Expression) extends StUnary {
  override def dataType: DataType = BinaryType
  protected def run(g: Geometry): Any = out(if (g.isValid) g else GeometryFixer.fix(g))
  override def prettyName: String = "st_makevalid"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** st_geomfromgeojson(json): reader twin of st_asgeojson (Geom.fromGeoJson). */
case class StGeomFromGeoJson(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes() = StKit.checkTypes(prettyName, Seq(child -> "string"))
  override def nullSafeEval(input: Any): Any =
    out(Geom.fromGeoJson(input.asInstanceOf[UTF8String].toString))
  def evalJson(s: UTF8String): Array[Byte] = out(Geom.fromGeoJson(s.toString))
  override protected def doGenCode(ctx: codegen.CodegenContext, ev: codegen.ExprCode): codegen.ExprCode = {
    val ref = ctx.addReferenceObj("geoJsonExpr", this, classOf[StGeomFromGeoJson].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.evalJson($a);")
  }
  override def prettyName: String = "st_geomfromgeojson"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}
