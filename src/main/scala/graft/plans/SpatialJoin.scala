package graft.plans

import graft.functions._

import org.apache.spark.sql.graft.GraftShim
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Distributed spatial joins built from standard Spark operators
 * (SURVEY.md §2.7) — capability match for the reference's
 * BroadcastIndexJoin / RangeJoin strategies (reference:
 * extension/src/test/scala/org/apache/iceberg/TestSedonaIcebergExtension.scala:201
 * asserts those plans; here the same queries compile to Catalyst
 * equi-joins that AQE can re-plan at runtime).
 *
 * Scheme (tile join):
 *  1. explode each side to covering grid cells of `cellSize`
 *  2. equi-join on the packed cell id (+ bbox prefilter, cheap doubles)
 *  3. reference-point dedup: a pair is emitted only in the cell that
 *     contains the top-left corner of the bbox intersection, so no global
 *     DISTINCT is needed — the dedup is a codegen'd filter.
 *  4. exact JTS refine via the ST_ predicate expression.
 *
 * At 100 TB the shuffle is bounded by cells-per-geometry (1 for points);
 * hot cells are ordinary AQE skew-join work; a small side can flip the
 * same plan into a broadcast hash join (`broadcastTileJoin`) where the big
 * side is never shuffled at all.
 */
object SpatialJoin {

  private def col(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    GraftShim.column(e)
  private def ex(c: Column) = GraftShim.expression(c)

  /** bbox of `g` as struct(xmin,ymin,xmax,ymax). */
  def stBbox(g: Column): Column = col(StBbox(ex(g)))

  /** covering cells of `g`'s envelope (expanded by `expand`). */
  def stTileCells(g: Column, cellSize: Double, expand: Double = 0.0): Column =
    col(StTileCells(Seq(ex(g), ex(lit(cellSize)), ex(lit(expand)))))

  /** Exact refine expression for a named predicate. */
  private def refine(pred: String, lg: Column, rg: Column, dist: Double): Column = pred match {
    case "contains" => col(StContains(ex(lg), ex(rg)))
    case "within" => col(StWithin(ex(lg), ex(rg)))
    case "intersects" => col(StIntersects(ex(lg), ex(rg)))
    case "covers" => col(StCovers(ex(lg), ex(rg)))
    case "dwithin" => col(StDWithin(Seq(ex(lg), ex(rg), ex(lit(dist)))))
    case other => throw new IllegalArgumentException(s"unknown predicate $other")
  }

  /** bbox prefilter in plain double arithmetic (stays in codegen). */
  private def bboxFilter(pred: String, l: Column, r: Column, dist: Double): Column = pred match {
    case "contains" | "covers" => // left bbox must enclose right bbox
      l("xmin") <= r("xmin") && l("xmax") >= r("xmax") &&
        l("ymin") <= r("ymin") && l("ymax") >= r("ymax")
    case "within" => // left bbox inside right bbox
      r("xmin") <= l("xmin") && r("xmax") >= l("xmax") &&
        r("ymin") <= l("ymin") && r("ymax") >= l("ymax")
    case "dwithin" =>
      l("xmin") <= r("xmax") + dist && l("xmax") >= r("xmin") - dist &&
        l("ymin") <= r("ymax") + dist && l("ymax") >= r("ymin") - dist
    case _ => // intersects & friends: bbox overlap
      l("xmin") <= r("xmax") && l("xmax") >= r("xmin") &&
        l("ymin") <= r("ymax") && l("ymax") >= r("ymin")
  }

  /** Reference-point dedup: emit only in the cell holding the bbox
    * intersection's lower-left corner (expanded by dist for dwithin). */
  private def refCell(l: Column, r: Column, cellSize: Double, dist: Double): Column = {
    // Lower-left corner of (expanded-left bbox ∩ right bbox): guaranteed to
    // be a cell BOTH sides generated (left cells are the expanded ones).
    val rx = greatest(l("xmin") - dist, r("xmin"))
    val ry = greatest(l("ymin") - dist, r("ymin"))
    shiftleft(floor(rx / cellSize), 32)
      .bitwiseOR(floor(ry / cellSize).bitwiseAND(lit(4294967295L)))
  }

  /**
   * Tile-partitioned spatial join. Returns left columns + right columns
   * (caller guarantees distinct names). `predicate` ∈ contains | within |
   * intersects | covers | dwithin.
   */
  def tileJoin(
      left: DataFrame, leftGeom: Column,
      right: DataFrame, rightGeom: Column,
      predicate: String = "intersects",
      cellSize: Double = 1.0,
      dist: Double = 0.0,
      broadcastRight: Boolean = false,
      salt: Int = 1): DataFrame = {

    val c = org.apache.spark.sql.functions.col _
    val lb = stBbox(leftGeom).as("__lbox")
    val rb = stBbox(rightGeom).as("__rbox")
    // left cells are expanded for dwithin; right cells never are, so a pair
    // meets in at least every cell the right bbox covers.
    val lt0 = left
      .withColumn("__lbox", lb)
      .withColumn("__lgeom", leftGeom)
      .withColumn("__cell", explode(stTileCells(leftGeom, cellSize, if (predicate == "dwithin") dist else 0.0)))
    val rt0 = right
      .withColumn("__rbox", rb)
      .withColumn("__rgeom", rightGeom)
      .withColumn("__rcell", explode(stTileCells(rightGeom, cellSize)))

    // Optional hot-cell salting (beyond AQE's skew split): the big side
    // scatters each row into one of `salt` sub-keys; the small side
    // replicates across all of them. Shuffle keys become (cell, salt).
    val useSalt = salt > 1 && !broadcastRight
    val lt = if (useSalt) lt0.withColumn("__salt", pmod(xxhash64(c("__lgeom")), lit(salt)).cast("int")) else lt0
    val rt1 = if (useSalt) rt0.withColumn("__salt2", explode(sequence(lit(0), lit(salt - 1)))) else rt0
    val rt = if (broadcastRight) broadcast(rt1) else rt1

    val lbox = c("__lbox")
    val rbox = c("__rbox")
    val base =
      c("__cell") === c("__rcell") &&
        bboxFilter(predicate, lbox, rbox, dist) &&
        c("__cell") === refCell(lbox, rbox, cellSize, if (predicate == "dwithin") dist else 0.0) &&
        refine(predicate, c("__lgeom"), c("__rgeom"), dist)
    val cond = if (useSalt) c("__salt") === c("__salt2") && base else base

    lt.join(rt, cond)
      .drop("__lbox", "__rbox", "__lgeom", "__rgeom", "__cell", "__rcell", "__salt", "__salt2")
  }

  /** Broadcast variant: small right side, big side never shuffles. */
  def broadcastTileJoin(
      left: DataFrame, leftGeom: Column,
      right: DataFrame, rightGeom: Column,
      predicate: String = "intersects",
      cellSize: Double = 1.0,
      dist: Double = 0.0): DataFrame =
    tileJoin(left, leftGeom, right, rightGeom, predicate, cellSize, dist, broadcastRight = true)

  /** Distance join: pairs within `dist` (euclidean). */
  def distanceJoin(
      left: DataFrame, leftGeom: Column,
      right: DataFrame, rightGeom: Column,
      dist: Double, cellSize: Double): DataFrame =
    tileJoin(left, leftGeom, right, rightGeom, "dwithin", cellSize, dist)

  /**
   * KNN join: for every left row, the k nearest right geometries (ties
   * broken by right key). The right side (the broadcast side by
   * definition) is packed into ONE row with `collect_list` and shipped
   * through a genuine broadcast exchange — never a driver `collect()` or
   * a plan literal, so the serialized plan stays tiny and Spark's
   * broadcast memory accounting/spill applies. Each left row computes its
   * own top-k in ONE projection via [[graft.functions.StKnn]]: the
   * candidate array is deserialized once per task (not once per row) and
   * above ~128 candidates an STRtree answers each row in O(log R + k)
   * branch-and-bound with an exact (distance, key) tie-break — so there
   * is NO shuffle and NO window: the left side streams through map-only.
   * The full right row is re-attached with a broadcast equi-join on the
   * key.
   *
   * `rightKey` must be an integral type (since round 3; string/decimal
   * keys previously worked via an implicit cast("long") — cast explicitly
   * or add a surrogate key).
   *
   * For right sides too big to broadcast, pre-filter with `lshTopK`-style
   * bucketing or a coarse `tileJoin` on expanded cells first.
   */
  def knnJoin(
      left: DataFrame, leftGeom: Column, leftKey: Column,
      right: DataFrame, rightGeom: Column, rightKey: Column,
      k: Int): DataFrame = {
    val c = org.apache.spark.sql.functions.col _
    import org.apache.spark.sql.types._
    val keyType = right.select(rightKey).schema.head.dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(keyType),
      s"knnJoin rightKey must be an integral type (got $keyType); " +
        "cast explicitly or use a surrogate key")
    // One-row frame holding all (key, geom) candidates; uniqueness of the
    // key is asserted distributedly (assert_true returns null on success,
    // so the filter passes every row through). Null keys/geometries are
    // dropped up front — a null geometry has no distance to anything, and
    // letting it into the packed array would NPE inside StKnn's
    // deserialization with an opaque task failure.
    val packed = right
      .select(rightKey.cast("long").as("__k"), rightGeom.cast("binary").as("__g"))
      .where(c("__k").isNotNull && c("__g").isNotNull)
      .agg(collect_list(struct(c("__k"), c("__g"))).as("__cands"))
      .where(assert_true(
        size(array_distinct(transform(c("__cands"), r => r.getField("__k")))) === size(c("__cands")),
        lit("knnJoin: rightKey must be unique")).isNull)

    val l = left.withColumn("__lgeom", leftGeom)
    val topk = l.crossJoin(broadcast(packed))
      .withColumn("__knn", col(StKnn(Seq(ex(c("__lgeom")), ex(c("__cands")), ex(lit(k))))))
      .select(l.columns.map(c) :+ posexplode(c("__knn")): _*)
      .withColumn("knn_rank", (c("pos") + 1).cast("int"))
      .withColumn("knn_dist", c("col").getField("d"))
      .withColumn("__rk", c("col").getField("rk"))
      .drop("pos", "col", "__lgeom", "__cands")
    topk.join(broadcast(right.withColumn("__rk", rightKey.cast("long"))), "__rk").drop("__rk")
  }
}
