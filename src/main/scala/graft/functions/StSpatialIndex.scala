package graft.functions

import graft.geom.Geom

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.{InternalRow => CatalystRow}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

import StKit._

/**
 * Grid-tiling primitives for the spatial join (SURVEY.md §2.7) — the
 * Spark-first analog of the reference's partition-aware spatial join
 * strategies (reference: extension/.../SedonaIcebergExtensions.scala:49
 * injects JoinQueryDetector). Instead of a custom physical operator, each
 * side explodes to covering grid cells and Catalyst runs an ordinary
 * equi-join on the cell id — shuffle-hash/SMJ + AQE skew handling for free.
 *
 * Cell ids pack floor(x/cell) and floor(y/cell) into one long:
 * `(ix << 32) | (iy & 0xffffffff)` — reproducible from plain SQL
 * (`shiftleft(..,32) | (.. & 4294967295)`) so the reference-point dedup
 * can be expressed with built-in functions and stays in codegen.
 */

/** Bounding box of a WKB geometry as a struct(xmin,ymin,xmax,ymax). */
case class StBbox(child: Expression) extends StUnary {
  override def dataType: DataType = StBbox.schema
  protected def run(g: org.locationtech.jts.geom.Geometry): Any = {
    val e = g.getEnvelopeInternal
    CatalystRow.fromSeq(Seq(e.getMinX, e.getMinY, e.getMaxX, e.getMaxY))
  }
  override def prettyName: String = "st_bbox"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

object StBbox {
  val schema: StructType = StructType(Seq(
    StructField("xmin", DoubleType, nullable = false),
    StructField("ymin", DoubleType, nullable = false),
    StructField("xmax", DoubleType, nullable = false),
    StructField("ymax", DoubleType, nullable = false)))

  def pack(ix: Long, iy: Long): Long = (ix << 32) | (iy & 0xffffffffL)
}

/**
 * All grid cells covered by the geometry's envelope, optionally expanded by
 * `expand` (for distance joins). children = (geom, cellSize[, expand]).
 */
case class StTileCells(children: Seq[Expression]) extends StNary {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  protected def run(vs: Seq[Any]): Any = {
    val env = geom(vs(0)).getEnvelopeInternal
    val cs = dbl(vs(1))
    val ex = if (vs.length > 2) dbl(vs(2)) else 0.0
    val ix0 = math.floor((env.getMinX - ex) / cs).toLong
    val ix1 = math.floor((env.getMaxX + ex) / cs).toLong
    val iy0 = math.floor((env.getMinY - ex) / cs).toLong
    val iy1 = math.floor((env.getMaxY + ex) / cs).toLong
    // one geometry exploding to >1M cells means the cell size is wrong for
    // the data — fail loudly instead of OOMing an executor. Per-axis check
    // first so the product can't overflow Long.
    val nx = ix1 - ix0 + 1
    val ny = iy1 - iy0 + 1
    require(nx <= (1L << 20) && ny <= (1L << 20) && nx * ny <= (1L << 20),
      s"st_tile_cells: geometry covers ${nx}x$ny cells at cellSize=$cs; increase cellSize")
    val n = nx * ny
    val out = new Array[Long](n.toInt)
    var k = 0
    var ix = ix0
    while (ix <= ix1) {
      var iy = iy0
      while (iy <= iy1) { out(k) = StBbox.pack(ix, iy); k += 1; iy += 1 }
      ix += 1
    }
    new GenericArrayData(out)
  }
  override def prettyName: String = "st_tile_cells"
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression = copy(cs)
}

/**
 * Z-order (Morton) index of the geometry's center at `cellSize` —
 * interleaved x/y bits, so sorting by it clusters 2-D neighbors into the
 * same parquet row groups (tighter min/max stats than row-major cell
 * order → better skipping).
 */
case class StMortonCell(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(g: Any, cell: Any): Any = {
    val e = geom(g).getEnvelopeInternal
    val cs = dbl(cell)
    // bias by 2^30 into 31-bit indices: interleaved result uses 62 bits and
    // stays NON-NEGATIVE, so the signed Long sort order IS the Z-order
    // (a 32-bit bias would put y's top bit into the sign bit)
    val ix = (math.floor((e.getMinX + e.getMaxX) / 2 / cs).toLong + (1L << 30)) & 0x7fffffffL
    val iy = (math.floor((e.getMinY + e.getMaxY) / 2 / cs).toLong + (1L << 30)) & 0x7fffffffL
    StMortonCell.interleave(ix) | (StMortonCell.interleave(iy) << 1)
  }
  override def prettyName: String = "st_morton_cell"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

object StMortonCell {
  /** Spread the low 32 bits of `v` into the even bit positions. */
  def interleave(v: Long): Long = {
    var x = v & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }
}

/**
 * Exact k-nearest-neighbors of a geometry within a packed candidate array
 * (the broadcast side of `SpatialJoin.knnJoin`). children =
 * (geom WKB, candidates array<struct<key long, wkb binary>>, k literal).
 * Returns array<struct<d double, rk long>> sorted by (distance, key) —
 * the deterministic tie-break the oracle's ORDER BY dist, key expects.
 *
 * The candidate array is identical for every row of a knnJoin (it comes
 * from one broadcast row), so the expression deserializes it ONCE per
 * expression instance: geometries, envelopes and — above
 * [[StKnn.TreeThreshold]] candidates — a bulk-built JTS STRtree are cached
 * behind a volatile immutable holder (rebuild on fingerprint mismatch is
 * benign and correct).
 *
 * CACHE CONTRACT: reuse is decided in two tiers. Tier 1 (O(1), the
 * knnJoin hot path): the array's unsafe memory-region identity — every
 * probe row reads the ONE broadcast candidate row, so base/offset/size
 * are identical. Tier 2 (on region miss): a FULL XXH64 content hash over
 * the array bytes, so two different arrays are never conflated short of a
 * 2^-64 hash collision — per-row-varying candidate arrays (e.g. from a
 * groupBy collect_list) are now handled CORRECTLY, they just pay a
 * rebuild per distinct array and lose the caching benefit. Use
 * SpatialJoin.knnJoin per candidate group for that shape instead. Per row the cost is then O(log R + k) via STRtree
 * branch-and-bound (plus an exact tie-fix range query) instead of the
 * O(R log R) sort-everything a `transform`+`array_sort` plan pays — the
 * difference between "scans all of |R| per left row" and a plan that
 * survives a 100k-candidate broadcast.
 */
case class StKnn(children: Seq[Expression]) extends StNary {
  import StKnn._
  override def dataType: DataType = ArrayType(resultType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    import org.apache.spark.sql.types.{BinaryType, IntegerType}
    children.map(_.dataType) match {
      case Seq(BinaryType, ArrayType(s: StructType, _), IntegerType)
          if s.length == 2 && s(0).dataType == LongType && s(1).dataType == BinaryType =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"st_knn expects (wkb binary, array<struct<long,binary>>, int), got ${other.mkString(", ")}")
    }
  }

  @transient @volatile private var cached: Cands = _

  /** FULL content hash (XXH64): for the unsafe layout, one pass over the
    * array's raw bytes; otherwise elementwise over keys + WKB payloads.
    * No sampled positions — two arrays hash equal only by a 2^-64 hash
    * collision, so per-row-varying candidate arrays are now handled
    * correctly (each distinct array rebuilds, as the contract documents).
    * The hot path (knnJoin's ONE broadcast array per query) never reaches
    * this: it is recognized by the O(1) memory-region identity check in
    * [[candsFor]]. */
  private def fingerprint(arr: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    arr match {
      case u: org.apache.spark.sql.catalyst.expressions.UnsafeArrayData =>
        XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.getSizeInBytes, 42L)
      case _ =>
        val n = arr.numElements()
        var h = XXH64.hashLong(n.toLong, 42L)
        var i = 0
        while (i < n) {
          val row = arr.getStruct(i, 2)
          h = XXH64.hashLong(row.getLong(0), h)
          val b = row.getBinary(1)
          h = XXH64.hashUnsafeBytes(b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
            b.length, h)
          i += 1
        }
        h
    }
  }

  /** (baseObject, baseOffset, sizeInBytes) of the unsafe region, or null
    * when the array is not unsafe-backed. Same region => same content,
    * without hashing a byte — the broadcast candidate row's array reads
    * point at one buffer for every probe row. */
  private def regionOf(arr: org.apache.spark.sql.catalyst.util.ArrayData): (AnyRef, Long, Long) =
    arr match {
      case u: org.apache.spark.sql.catalyst.expressions.UnsafeArrayData =>
        (u.getBaseObject, u.getBaseOffset, u.getSizeInBytes.toLong)
      case _ => null
    }

  private def candsFor(arr: org.apache.spark.sql.catalyst.util.ArrayData): Cands = {
    val n = arr.numElements()
    val region = regionOf(arr)
    val c0 = cached
    if (c0 != null && region != null && (c0.region ne null) &&
        (c0.region._1 eq region._1) && c0.region._2 == region._2 && c0.region._3 == region._3)
      return c0
    val fp = fingerprint(arr)
    val c = cached
    if (c != null && c.fp == fp && c.keys.length == n) {
      // same content reached through a different buffer: remember the new
      // region so subsequent rows take the O(1) path again
      cached = new Cands(fp, region, c.keys, c.geoms, c.tree)
      return cached
    }
    val keys = new Array[Long](n)
    val geoms = new Array[org.locationtech.jts.geom.Geometry](n)
    var hasEmpty = false
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 2)
      keys(i) = row.getLong(0)
      geoms(i) = Geom.deserialize(row.getBinary(1))
      geoms(i).getEnvelopeInternal // force envelope before publishing (thread-safety)
      hasEmpty ||= geoms(i).isEmpty
      i += 1
    }
    val tree = if (n >= TreeThreshold && !hasEmpty) {
      val t = new org.locationtech.jts.index.strtree.STRtree()
      var j = 0
      while (j < n) { t.insert(geoms(j).getEnvelopeInternal, Integer.valueOf(j)); j += 1 }
      t.build() // bulk-build now: lazy build on first query is not thread-safe
      t
    } else null
    val built = new Cands(fp, region, keys, geoms, tree)
    cached = built
    built
  }

  protected def run(vs: Seq[Any]): Any = {
    val g = geom(vs(0))
    val arr = vs(1).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val k = int(vs(2))
    val c = candsFor(arr)
    val n = c.keys.length
    if (n == 0 || k <= 0) return new GenericArrayData(Array.empty[Any])

    // candidate index set: all of them (linear), or STRtree-pruned
    val idx: Array[Int] =
      if (c.tree == null) Array.range(0, n)
      else {
        val env = g.getEnvelopeInternal
        // exact k-NN by branch-and-bound, then re-collect EVERYTHING at
        // distance <= d_k so equal-distance ties resolve by key, not by
        // tree traversal order.
        val knn = c.tree.nearestNeighbour(env, Integer.valueOf(-1), ItemDist(g, c.geoms), math.min(k, n))
        var dk = 0.0
        knn.foreach { o =>
          val d = g.distance(c.geoms(o.asInstanceOf[Integer].intValue()))
          if (d > dk) dk = d
        }
        val hits = new java.util.ArrayList[Int]()
        val q = new org.locationtech.jts.geom.Envelope(env)
        q.expandBy(dk)
        c.tree.query(q, (item: AnyRef) => hits.add(item.asInstanceOf[Integer].intValue()))
        val out = new Array[Int](hits.size())
        var i = 0
        while (i < out.length) { out(i) = hits.get(i); i += 1 }
        out
      }

    val scored = idx.map(i => (g.distance(c.geoms(i)), c.keys(i)))
      .sortBy(identity) // (distance, key) ascending — deterministic ties
      .take(k)
    new GenericArrayData(scored.map { case (d, key) =>
      // Seq[Any]: Seq(d, key) alone would weak-conformance-widen the Long
      // key to Double and silently corrupt the struct.
      CatalystRow.fromSeq(Seq[Any](d, key)): Any
    })
  }
  override def prettyName: String = "st_knn"
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression = copy(cs)
}

object StKnn {
  /** Below this many candidates a linear scan beats tree traversal. */
  val TreeThreshold = 128

  val resultType: StructType = StructType(Seq(
    StructField("d", DoubleType, nullable = false),
    StructField("rk", LongType, nullable = false)))

  private final class Cands(
      val fp: Long,
      val region: (AnyRef, Long, Long), // unsafe buffer identity, or null
      val keys: Array[Long],
      val geoms: Array[org.locationtech.jts.geom.Geometry],
      val tree: org.locationtech.jts.index.strtree.STRtree)

  /** Item distance over cached geometry indices (query item is -1 = g). */
  private case class ItemDist(g: org.locationtech.jts.geom.Geometry,
      geoms: Array[org.locationtech.jts.geom.Geometry])
      extends org.locationtech.jts.index.strtree.ItemDistance {
    private def geomOf(o: AnyRef): org.locationtech.jts.geom.Geometry = {
      val i = o.asInstanceOf[Integer].intValue()
      if (i < 0) g else geoms(i)
    }
    override def distance(a: org.locationtech.jts.index.strtree.ItemBoundable,
        b: org.locationtech.jts.index.strtree.ItemBoundable): Double =
      geomOf(a.getItem.asInstanceOf[AnyRef]).distance(geomOf(b.getItem.asInstanceOf[AnyRef]))
  }
}

/**
 * Bounded top-k aggregate over (distance, key) pairs — the aggregation
 * primitive of the PARTITIONED KNN join ([[graft.plans.KnnGridJoin]]).
 * Keeps the k smallest pairs in (distance, key) lexicographic order — the
 * same deterministic tie-break as [[StKnn]] — in a size-k max-heap, so
 * map-side PARTIAL aggregation prunes every grid cell's candidate stream
 * down to k rows before the shuffle: the shuffle volume is k per (group,
 * partition) regardless of how dense a cell is. Output is
 * array<struct<d double, rk long>> ascending — bit-compatible with
 * StKnn's result, so the two join paths produce identical frames.
 */
/** Bounded top-k buffer as a PRIMITIVE binary max-heap over parallel
  * (distance, key) arrays — the worst candidate (largest distance, then
  * largest key) sits at the root and is evicted first. The aggregate's
  * update path offers every candidate row exactly once; with boxed
  * tuples in a java.util.PriorityQueue that was one allocation per
  * candidate (millions per partition), enough churn to turn GC into the
  * dominant run-to-run variance of the whole grid-KNN plan. Primitive
  * arrays allocate once per group. */
final class KnnTopKBuf(k: Int) {
  val ds = new Array[Double](math.max(k, 1))
  val ks = new Array[Long](math.max(k, 1))
  var size = 0

  /** is (d1,k1) "worse" (greater) than (d2,k2)? */
  @inline private def gt(d1: Double, k1: Long, d2: Double, k2: Long): Boolean = {
    val c = java.lang.Double.compare(d1, d2)
    c > 0 || (c == 0 && k1 > k2)
  }

  private def siftUp(i0: Int): Unit = {
    var i = i0
    val d = ds(i); val key = ks(i)
    while (i > 0) {
      val p = (i - 1) >> 1
      if (gt(d, key, ds(p), ks(p))) {
        ds(i) = ds(p); ks(i) = ks(p); i = p
      } else { ds(i) = d; ks(i) = key; return }
    }
    ds(0) = d; ks(0) = key
  }

  private def siftDown(): Unit = {
    val d = ds(0); val key = ks(0)
    var i = 0
    while (true) {
      var c = 2 * i + 1
      if (c >= size) { ds(i) = d; ks(i) = key; return }
      if (c + 1 < size && gt(ds(c + 1), ks(c + 1), ds(c), ks(c))) c += 1
      if (gt(ds(c), ks(c), d, key)) {
        ds(i) = ds(c); ks(i) = ks(c); i = c
      } else { ds(i) = d; ks(i) = key; return }
    }
  }

  def offer(d: Double, key: Long): Unit = {
    if (size < ds.length) {
      ds(size) = d; ks(size) = key; size += 1
      siftUp(size - 1)
    } else if (gt(ds(0), ks(0), d, key)) {
      ds(0) = d; ks(0) = key
      siftDown()
    }
  }

  /** contents sorted ascending by (distance, key) — k is tiny, so the
    * boxed sort here is off the hot path */
  def sortedPairs: Array[(Double, Long)] =
    (0 until size).map(i => (ds(i), ks(i))).sortBy(identity).toArray
}

case class KnnTopKAgg(
    dist: Expression,
    key: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[KnnTopKBuf] {

  override def children: Seq[Expression] = Seq(dist, key, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StKnn.resultType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    import org.apache.spark.sql.types.IntegerType
    if (dist.dataType != DoubleType || key.dataType != LongType || kExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"knn_topk expects (double, long, int k), got " +
          children.map(_.dataType.simpleString).mkString(", "))
    else if (!kExpr.foldable)
      TypeCheckResult.TypeCheckFailure("knn_topk: k must be a literal")
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val k: Int = kExpr.eval(null).asInstanceOf[Number].intValue()

  override def createAggregationBuffer(): KnnTopKBuf = new KnnTopKBuf(k)

  override def update(buf: KnnTopKBuf, input: CatalystRow): KnnTopKBuf = {
    val d = dist.eval(input)
    val rk = key.eval(input)
    if (d != null && rk != null)
      buf.offer(d.asInstanceOf[Double], rk.asInstanceOf[Long])
    buf
  }

  override def merge(a: KnnTopKBuf, b: KnnTopKBuf): KnnTopKBuf = {
    var i = 0
    while (i < b.size) { a.offer(b.ds(i), b.ks(i)); i += 1 }
    a
  }

  override def eval(buf: KnnTopKBuf): Any = {
    new GenericArrayData(buf.sortedPairs.map { case (d, rk) =>
      CatalystRow.fromSeq(Seq[Any](d, rk)): Any
    })
  }

  override def serialize(buf: KnnTopKBuf): Array[Byte] = {
    val n = buf.size
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * n)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putDouble(buf.ds(i)); bb.putLong(buf.ks(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KnnTopKBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.offer(bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): KnnTopKAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KnnTopKAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(dist = cs(0), key = cs(1), kExpr = cs(2))
  override def prettyName: String = "knn_topk"
}

/** Hausdorff-ish cheap centroid cell (used for KNN pre-bucketing). */
case class StCentroidCell(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(g: Any, cell: Any): Any = {
    val c = geom(g).getEnvelopeInternal
    val cs = dbl(cell)
    StBbox.pack(math.floor((c.getMinX + c.getMaxX) / 2 / cs).toLong,
                math.floor((c.getMinY + c.getMaxY) / 2 / cs).toLong)
  }
  override def prettyName: String = "st_centroid_cell"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}
