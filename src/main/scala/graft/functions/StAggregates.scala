package graft.functions

import graft.geom.Geom

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, DataType}
import org.locationtech.jts.geom._
import org.locationtech.jts.operation.union.UnaryUnionOp

/**
 * Spatial aggregates as TypedImperativeAggregate — partial aggregation
 * (map-side combine) comes for free, which is the scale-critical property:
 * each of 1000 executors reduces its partitions locally and only fixed-size
 * buffers cross the shuffle (for envelope/centroid) or geometry sets
 * already unioned per partition (for union/collect).
 *
 * Capability match for the reference's ST_Union_Aggr / ST_CENTROID_AGGR
 * (reference: extension/.../UDAF/AggregateFunctions.scala:141 and the usage in
 * example/.../App.scala:59).
 */

/** ST_Envelope_Aggr: bounding box of all input geometries. Fixed-size buffer. */
case class StEnvelopeAggr(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Array[Double] =
    Array(Double.MaxValue, Double.MaxValue, Double.MinValue, Double.MinValue)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val env = Geom.deserialize(v.asInstanceOf[Array[Byte]]).getEnvelopeInternal
      if (!env.isNull) {
        buf(0) = math.min(buf(0), env.getMinX); buf(1) = math.min(buf(1), env.getMinY)
        buf(2) = math.max(buf(2), env.getMaxX); buf(3) = math.max(buf(3), env.getMaxY)
      }
    }
    buf
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    b1(0) = math.min(b1(0), b2(0)); b1(1) = math.min(b1(1), b2(1))
    b1(2) = math.max(b1(2), b2(2)); b1(3) = math.max(b1(3), b2(3))
    b1
  }

  override def eval(buf: Array[Double]): Any =
    if (buf(0) > buf(2)) null
    else Geom.serialize(Geom.polygonFromEnvelope(buf(0), buf(1), buf(2), buf(3)))

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(32)
    buf.foreach(bb.putDouble)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(4)(bb.getDouble)
  }

  override def withNewMutableAggBufferOffset(o: Int): StEnvelopeAggr = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): StEnvelopeAggr = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression = copy(child = cs.head)
  override def prettyName: String = "st_envelope_aggr"
}

/**
 * Incremental centroid buffer: dimension-stratified weighted sums, the same
 * decomposition JTS's Centroid uses (areas dominate lines dominate points),
 * but mergeable across partitions with a fixed-size buffer.
 */
final class CentroidBuf(
    var areaX: Double = 0, var areaY: Double = 0, var area: Double = 0,
    var lineX: Double = 0, var lineY: Double = 0, var len: Double = 0,
    var ptX: Double = 0, var ptY: Double = 0, var n: Long = 0) {

  def add(g: Geometry): Unit = g match {
    case gc: GeometryCollection if g.getGeometryType == "GeometryCollection" ||
        g.isInstanceOf[MultiPolygon] || g.isInstanceOf[MultiLineString] || g.isInstanceOf[MultiPoint] =>
      var i = 0
      while (i < gc.getNumGeometries) { add(gc.getGeometryN(i)); i += 1 }
    case p: Point =>
      ptX += p.getX; ptY += p.getY; n += 1
    case l: LineString =>
      val d = l.getLength
      if (d == 0.0 && l.getNumPoints > 0) {
        val c = l.getCoordinateN(0); ptX += c.x; ptY += c.y; n += 1
      } else if (d > 0.0) {
        val c = l.getCentroid.getCoordinate
        lineX += d * c.x; lineY += d * c.y; len += d
      }
    case p: Polygon =>
      val a = p.getArea
      if (a > 0.0) {
        val c = p.getCentroid.getCoordinate
        areaX += a * c.x; areaY += a * c.y; area += a
      } else {
        // Degenerate polygon: JTS treats its rings as zero-area triangles and
        // the centroid falls through to the line phase.
        add(p.getExteriorRing)
        var i = 0
        while (i < p.getNumInteriorRing) { add(p.getInteriorRingN(i)); i += 1 }
      }
    case _ => ()
  }

  def centroid: Point = {
    if (area != 0) Geom.point(areaX / area, areaY / area)
    else if (len != 0) Geom.point(lineX / len, lineY / len)
    else if (n != 0) Geom.point(ptX / n, ptY / n)
    else null
  }
}

/** ST_Centroid_Aggr: centroid of the collection of all input geometries. */
case class StCentroidAggr(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CentroidBuf] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): CentroidBuf = new CentroidBuf()

  override def update(buf: CentroidBuf, input: InternalRow): CentroidBuf = {
    val v = child.eval(input)
    if (v != null) buf.add(Geom.deserialize(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(a: CentroidBuf, b: CentroidBuf): CentroidBuf = {
    a.areaX += b.areaX; a.areaY += b.areaY; a.area += b.area
    a.lineX += b.lineX; a.lineY += b.lineY; a.len += b.len
    a.ptX += b.ptX; a.ptY += b.ptY; a.n += b.n
    a
  }

  override def eval(buf: CentroidBuf): Any = {
    val c = buf.centroid
    if (c == null) null else Geom.serialize(c)
  }

  override def serialize(buf: CentroidBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * 9)
    bb.putDouble(buf.areaX).putDouble(buf.areaY).putDouble(buf.area)
      .putDouble(buf.lineX).putDouble(buf.lineY).putDouble(buf.len)
      .putDouble(buf.ptX).putDouble(buf.ptY).putLong(buf.n)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): CentroidBuf = {
    val bb = ByteBuffer.wrap(bytes)
    new CentroidBuf(bb.getDouble, bb.getDouble, bb.getDouble,
      bb.getDouble, bb.getDouble, bb.getDouble,
      bb.getDouble, bb.getDouble, bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): StCentroidAggr = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): StCentroidAggr = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression = copy(child = cs.head)
  override def prettyName: String = "st_centroid_aggr"
}

/** Shared shape for geometry-set aggregates (union / collect). */
abstract class GeomSetAggr extends TypedImperativeAggregate[ArrayBuffer[Geometry]] {
  def child: Expression
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): ArrayBuffer[Geometry] = ArrayBuffer.empty

  override def update(buf: ArrayBuffer[Geometry], input: InternalRow): ArrayBuffer[Geometry] = {
    val v = child.eval(input)
    if (v != null) buf += Geom.deserialize(v.asInstanceOf[Array[Byte]])
    buf
  }

  override def merge(a: ArrayBuffer[Geometry], b: ArrayBuffer[Geometry]): ArrayBuffer[Geometry] = a ++= b

  override def serialize(buf: ArrayBuffer[Geometry]): Array[Byte] =
    Geom.serialize(Geom.factory.createGeometryCollection(buf.toArray))
  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Geometry] = {
    val gc = Geom.deserialize(bytes).asInstanceOf[GeometryCollection]
    val buf = ArrayBuffer.empty[Geometry]
    var i = 0
    while (i < gc.getNumGeometries) { buf += gc.getGeometryN(i); i += 1 }
    buf
  }
}

/**
 * ST_Union_Aggr: n-way union. Uses JTS UnaryUnionOp (cascaded union) at
 * finish — O(n log n)-ish vs naive pairwise O(n²).
 *
 * Scale note: partial buffers union per-partition before shuffling, so the
 * driver-side finish sees at most (#partitions) pre-unioned geometries.
 */
case class StUnionAggr(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends GeomSetAggr {

  // Union partials before they cross the shuffle: the serialized partial is
  // a single (unioned) geometry instead of the whole input set.
  override def serialize(buf: ArrayBuffer[Geometry]): Array[Byte] =
    if (buf.isEmpty) super.serialize(buf)
    else Geom.serialize(Geom.factory.createGeometryCollection(Array(union(buf))))

  override def eval(buf: ArrayBuffer[Geometry]): Any =
    if (buf.isEmpty) null
    else Geom.serialize(union(buf))

  private def union(buf: ArrayBuffer[Geometry]): Geometry = {
    val al = new java.util.ArrayList[Geometry](buf.size)
    buf.foreach(al.add)
    UnaryUnionOp.union(al)
  }

  override def withNewMutableAggBufferOffset(o: Int): StUnionAggr = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): StUnionAggr = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression = copy(child = cs.head)
  override def prettyName: String = "st_union_aggr"
}

/** ST_Intersection_Aggr: n-way intersection. Partials fold map-side to a
  * single geometry (intersection is associative/commutative), so — like
  * union — one geometry per partition crosses the shuffle, not the input
  * set. Empty intersection stays representable (empty polygon). */
case class StIntersectionAggr(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends GeomSetAggr {

  override def serialize(buf: ArrayBuffer[Geometry]): Array[Byte] =
    if (buf.isEmpty) super.serialize(buf)
    else Geom.serialize(Geom.factory.createGeometryCollection(Array(intersect(buf))))

  override def eval(buf: ArrayBuffer[Geometry]): Any =
    if (buf.isEmpty) null
    else Geom.serialize(intersect(buf))

  private def intersect(buf: ArrayBuffer[Geometry]): Geometry = {
    var acc = buf.head
    var i = 1
    while (i < buf.length && !acc.isEmpty) { acc = acc.intersection(buf(i)); i += 1 }
    acc
  }

  override def withNewMutableAggBufferOffset(o: Int): StIntersectionAggr = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): StIntersectionAggr = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression = copy(child = cs.head)
  override def prettyName: String = "st_intersection_aggr"
}

/** ST_Collect: gather inputs into a geometry collection (Multi* when homogeneous). */
case class StCollectAggr(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends GeomSetAggr {

  override def eval(buf: ArrayBuffer[Geometry]): Any = {
    if (buf.isEmpty) return null
    val arr = buf.toArray
    val g =
      if (arr.forall(_.isInstanceOf[Point]))
        Geom.factory.createMultiPoint(arr.map(_.asInstanceOf[Point]))
      else if (arr.forall(_.isInstanceOf[LineString]))
        Geom.factory.createMultiLineString(arr.map(_.asInstanceOf[LineString]))
      else if (arr.forall(_.isInstanceOf[Polygon]))
        Geom.factory.createMultiPolygon(arr.map(_.asInstanceOf[Polygon]))
      else Geom.factory.createGeometryCollection(arr)
    Geom.serialize(g)
  }

  override def withNewMutableAggBufferOffset(o: Int): StCollectAggr = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): StCollectAggr = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression = copy(child = cs.head)
  override def prettyName: String = "st_collect"
}
