package graft.functions

import graft.geom.Geom

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import StKit._

/**
 * Hexagonal grid indexing (SURVEY.md §2.5 catalog breadth — the hex-cell
 * family whose usage shape matches Uber's H3: cell ids for bucketing,
 * aggregation, k-ring neighborhoods, join keys).
 *
 * DECISION NOTE (vs H3 proper): H3 projects onto an icosahedron and
 * subdivides aperture-7 — that fixed global cell table is a large body of
 * constants with no closed form. graft's hexes are a PLANAR axial grid
 * (pointy-top, `size` = circumradius in coordinate units) using the
 * standard public hex-lattice algorithms (axial coordinates, cube
 * rounding, k-rings). For the engine's actual uses — binning, hot-cell
 * aggregation, neighborhood joins over projected or local data — the
 * planar family is equivalent machinery; what it does NOT give is H3's
 * globe-wide equal-area cells. Reproject to a planar CRS (st_transform)
 * before hex-binning wide-area geodata. The same decision covers
 * Google S2 (Sedona's ST_S2CellIDs family): S2's hierarchical
 * quad-sphere ids are another fixed global cell scheme; the engine's
 * square-cell analog is st_morton_cell (Z-order key on a planar grid),
 * which serves the same bucketing/join-key role after reprojection.
 *
 * Cell id packing: axial (q, r) as two 32-bit signed ints in one long —
 * `(q << 32) | (r & 0xffffffff)`. The grid `size` is an explicit argument
 * everywhere (same convention as st_morton_cell's cellSize).
 *
 * Rounding is floor(x + 0.5) on BOTH the Scala and the oracle-SQL side —
 * a portable definition that engines reproduce bit-for-bit (plain round()
 * differs between engines on negative halves).
 */
object Hex {
  val Sqrt3: Double = math.sqrt(3.0)

  def lng(a: Any): Long = a match {
    case n: java.lang.Number => n.longValue()
    case other => other.asInstanceOf[Long]
  }

  @inline def pack(q: Int, r: Int): Long = (q.toLong << 32) | (r.toLong & 0xffffffffL)
  @inline def unpackQ(id: Long): Int = (id >> 32).toInt
  @inline def unpackR(id: Long): Int = id.toInt

  @inline private def portableRound(x: Double): Long = math.floor(x + 0.5).toLong

  /** (x, y) -> axial (q, r) by cube rounding (public hex-grid algorithm). */
  def cellOf(x: Double, y: Double, size: Double): Long = {
    val qf = (Sqrt3 / 3.0 * x - 1.0 / 3.0 * y) / size
    val rf = (2.0 / 3.0 * y) / size
    // cube coords: cx = qf, cz = rf, cy = -cx - cz; round, then fix the
    // axis with the largest rounding error so cx + cy + cz == 0 holds
    val cx = qf; val cz = rf; val cy = -qf - rf
    var rx = portableRound(cx); var ry = portableRound(cy); var rz = portableRound(cz)
    val dx = math.abs(rx - cx); val dy = math.abs(ry - cy); val dz = math.abs(rz - cz)
    if (dx > dy && dx > dz) rx = -ry - rz
    else if (dy > dz) ry = -rx - rz
    else rz = -rx - ry
    pack(rx.toInt, rz.toInt)
  }

  /** Center (x, y) of a cell. */
  def center(id: Long, size: Double): (Double, Double) = {
    val q = unpackQ(id); val r = unpackR(id)
    (size * (Sqrt3 * q + Sqrt3 / 2.0 * r), size * (1.5 * r))
  }

  /** Axial hex distance between two cells. */
  def dist(a: Long, b: Long): Int = {
    val dq = unpackQ(a) - unpackQ(b)
    val dr = unpackR(a) - unpackR(b)
    (math.abs(dq) + math.abs(dr) + math.abs(dq + dr)) / 2
  }

  /** All cells within hex distance `k` (the H3 kRing disk), center first,
    * then by (q, r) — deterministic order for stable query output. */
  def kRing(id: Long, k: Int): Array[Long] = {
    val q0 = unpackQ(id); val r0 = unpackR(id)
    val out = Array.newBuilder[Long]
    var dq = -k
    while (dq <= k) {
      var dr = math.max(-k, -dq - k)
      val hi = math.min(k, -dq + k)
      while (dr <= hi) {
        out += pack(q0 + dq, r0 + dr)
        dr += 1
      }
      dq += 1
    }
    val arr = out.result()
    java.util.Arrays.sort(arr)
    arr
  }
}

/** st_hexcell(geom, size): hex cell id of the geometry's centroid. */
case class StHexCell(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes() = StKit.checkTypes(prettyName,
    Seq(left -> "geometry", right -> "numeric"))
  def compute(v: Any, s: Object): Long = {
    val c = geom(v).getCentroid
    Hex.cellOf(c.getX, c.getY, StKit.dbl(s))
  }
  override def nullSafeEval(v: Any, s: Any): Any = compute(v, s.asInstanceOf[Object])
  override protected def doGenCode(ctx: codegen.CodegenContext, ev: codegen.ExprCode): codegen.ExprCode = {
    val ref = ctx.addReferenceObj("hexCell", this, classOf[StHexCell].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, ${StCodegen.box(b, right.dataType)});")
  }
  override def prettyName: String = "st_hexcell"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** st_hexcenter(cellId, size): the cell's center point geometry. */
case class StHexCenter(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes() = StKit.checkTypes(prettyName,
    Seq(left -> "numeric", right -> "numeric"))
  def compute(id: Object, s: Object): Array[Byte] = {
    val (x, y) = Hex.center(Hex.lng(id), StKit.dbl(s))
    out(Geom.factory.createPoint(new org.locationtech.jts.geom.Coordinate(x, y)))
  }
  override def nullSafeEval(id: Any, s: Any): Any =
    compute(id.asInstanceOf[Object], s.asInstanceOf[Object])
  override protected def doGenCode(ctx: codegen.CodegenContext, ev: codegen.ExprCode): codegen.ExprCode = {
    val ref = ctx.addReferenceObj("hexCenter", this, classOf[StHexCenter].getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $ref.compute(${StCodegen.box(a, left.dataType)}, ${StCodegen.box(b, right.dataType)});")
  }
  override def prettyName: String = "st_hexcenter"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** st_hexring(cellId, k): all cells within hex distance k (kRing disk). */
case class StHexRing(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes() = StKit.checkTypes(prettyName,
    Seq(left -> "numeric", right -> "numeric"))
  def compute(id: Object, k: Object): ArrayData = {
    val kk = StKit.int(k)
    require(kk >= 0 && kk <= 64, s"st_hexring supports k in 0..64, got $kk")
    new GenericArrayData(Hex.kRing(Hex.lng(id), kk))
  }
  override def nullSafeEval(id: Any, k: Any): Any =
    compute(id.asInstanceOf[Object], k.asInstanceOf[Object])
  override protected def doGenCode(ctx: codegen.CodegenContext, ev: codegen.ExprCode): codegen.ExprCode = {
    val ref = ctx.addReferenceObj("hexRing", this, classOf[StHexRing].getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $ref.compute(${StCodegen.box(a, left.dataType)}, ${StCodegen.box(b, right.dataType)});")
  }
  override def prettyName: String = "st_hexring"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** st_hexdist(cellA, cellB): hex (grid) distance between two cells. */
case class StHexDist(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes() = StKit.checkTypes(prettyName,
    Seq(left -> "numeric", right -> "numeric"))
  override def nullSafeEval(a: Any, b: Any): Any =
    Hex.dist(Hex.lng(a.asInstanceOf[Object]), Hex.lng(b.asInstanceOf[Object]))
  override protected def doGenCode(ctx: codegen.CodegenContext, ev: codegen.ExprCode): codegen.ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Hex.dist($a, $b)")
  override def prettyName: String = "st_hexdist"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}
