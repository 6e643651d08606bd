package graft.plans

import graft.functions.{GraftFunctions, KnnTopKAgg}

import org.apache.spark.sql.graft.GraftShim
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.storage.StorageLevel

/**
 * PARTITIONED (big-big) exact KNN join over point geometries — the scale
 * path that [[SpatialJoin.knnJoin]]'s broadcast design cannot cover
 * (SpatialJoin.scala documents that boundary): when the right side is the
 * whole table (LOF's self-join) or simply too big to broadcast, packing it
 * into one broadcast row hits the driver/executor memory wall. Capability
 * analog of Sedona 1.7's partitioned KNN join surface (the reference
 * registers Sedona's catalog wholesale — reference:
 * extension/src/main/scala/.../SedonaIcebergExtensions.scala:38).
 *
 * Shape — no broadcast of either full side, candidates always flow
 * through bucketed equi-joins:
 *
 *  1. both sides project to (key, x, y) and bucket into `cellSize` grid
 *     cells (the same packed-long cells as SpatialJoin.tileJoin /
 *     SpatialCluster.dbscanPoints);
 *  2. ring pass r = 1, 2, 4, 8: each unresolved left point probes the
 *     (2r+1)^2 cell block around its own cell via an EQUI-join on the
 *     packed cell id; per-point candidates collapse through
 *     [[graft.functions.KnnTopKAgg]] — a bounded max-heap aggregate, so
 *     map-side partial aggregation prunes every partition's stream to k
 *     rows per point before the shuffle;
 *  3. margin test: a point's top-k is PROVEN exact once its k-th distance
 *     is smaller than the distance to its search-block boundary (any
 *     right point outside the block is at least that far away), or once
 *     its block covers the whole right extent. Proven points exit; the
 *     rest re-probe with the doubled ring.
 *  4. fallback for stragglers (isolated points in sparse regions): the
 *     remaining unresolved rows — by now a tiny set, guarded by
 *     `fallbackThreshold` — broadcast against the full right side and
 *     reduce through the same bounded top-k aggregate, map-side pruned.
 *     When left x right is ALREADY within the bounded-product budget the
 *     in-loop early exit uses, the fallback is entered directly, before
 *     paying for round 1 — a ladder round (probe join + shuffle + count)
 *     can only lose to the one bounded pass it would exit to anyway.
 *
 * The margin uses a conservative epsilon (coordinate-magnitude-scaled) so
 * sub-ulp rounding at a cell boundary can only DELAY a point's
 * resolution, never mis-resolve it. Distances are
 * sqrt(dx*dx + dy*dy) in the same IEEE evaluation order JTS's
 * point-to-point distance uses, and ties break by (distance, key) — so
 * the result frame is bit-identical to broadcast knnJoin's
 * (KnnGridJoinSpec proves equality row-for-row, double-for-double).
 *
 * Contract differences from knnJoin: BOTH keys must be unique integral
 * columns (verified distributedly unless `verifyUniqueKeys = false`), and
 * geometries must be points (non-point rows are dropped, like null
 * geometries).
 */
object KnnGridJoin {

  private def aggCol(a: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction): Column =
    GraftShim.column(a.toAggregateExpression())
  private def ex(c: Column) = GraftShim.expression(c)

  private def pack(a: Column, b: Column): Column =
    shiftleft(a, 32).bitwiseOR(b.bitwiseAND(lit(0xffffffffL)))

  /** Partitioned exact KNN join: for every left point, the k nearest right
    * points (ties by right key). Output columns match knnJoin: left
    * columns, knn_rank, knn_dist, right columns.
    *
    * @param cellSize grid cell edge; aim for O(k) right points per cell
    * @param fallbackThreshold max unresolved rows the final
    *        broadcast-fallback pass may carry (isolated points only)
    * @param boundedPassBudget max left-rows x right-rows product for which
    *        ONE bounded fallback pass is taken instead of (more) ladder
    *        rounds — both up front (skip the ladder entirely) and as the
    *        in-loop early exit; 0 disables both, leaving only the
    *        stragglers fallback after the ladder caps
    */
  def knnJoinPoints(
      left: DataFrame, leftGeom: Column, leftKey: Column,
      right: DataFrame, rightGeom: Column, rightKey: Column,
      k: Int, cellSize: Double,
      fallbackThreshold: Long = 1L << 22,
      boundedPassBudget: Long = 1L << 26,
      verifyUniqueKeys: Boolean = true,
      checkpoint: Boolean = true): DataFrame = {
    val (exploded, release) = knnPairs(left, leftGeom, leftKey,
      right, rightGeom, rightKey, k, cellSize, fallbackThreshold,
      boundedPassBudget, verifyUniqueKeys)
    try {
      val c = org.apache.spark.sql.functions.col _
      val out = left.withColumn("__lk", leftKey.cast("long"))
        .join(exploded, "__lk")
        .join(right.withColumn("__rk", rightKey.cast("long")), "__rk")
        .drop("__rk", "__lk")
      // checkpoint=true (production): materialize, then release every
      // intermediate. checkpoint=false (plan-inspection tests): the loop's
      // caches are released lazily and the returned plan recomputes them.
      if (checkpoint) out.localCheckpoint() else out
    } finally release()
  }

  /** The ladder core, exposed as the bare neighborhood PAIRS frame
    * `(__lk, knn_rank, knn_dist, __rk)` with the intermediate caches still
    * held: callers that only need the pairs (LOF's neighborhoods — it
    * drops both sides' payload columns immediately) skip the two
    * re-attachment joins and the checkpoint of [[knnJoinPoints]], consume
    * the frame, then call the returned release() to drop the caches.
    *
    * `cellSize <= 0` auto-sizes the grid from the RIGHT side's observed
    * extent and count (targeting ~max(4k, 32) right points per cell) —
    * one fewer pre-pass for callers like LOF that would otherwise compute
    * the same extent themselves just to pick a cell. */
  private[graft] def knnPairs(
      left: DataFrame, leftGeom: Column, leftKey: Column,
      right: DataFrame, rightGeom: Column, rightKey: Column,
      k: Int, cellSize: Double,
      fallbackThreshold: Long = 1L << 22,
      boundedPassBudget: Long = 1L << 26,
      verifyUniqueKeys: Boolean = true,
      selfJoin: Boolean = false): (DataFrame, () => Unit) = {
    require(k >= 1, s"k must be >= 1, got $k")
    // cellSize <= 0 selects auto-sizing (resolved below from the right
    // side's extent); NaN is still a caller bug
    require(!cellSize.isNaN, "cellSize must be a number (or <= 0 for auto)")
    val c = org.apache.spark.sql.functions.col _
    import org.apache.spark.sql.types._
    val keyChecks =
      if (selfJoin) Seq((left, leftKey, "leftKey"))
      else Seq((left, leftKey, "leftKey"), (right, rightKey, "rightKey"))
    for ((df, key, side) <- keyChecks) {
      val t = df.select(key).schema.head.dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(t),
        s"knnJoinPoints $side must be an integral type (got $t); " +
          "cast explicitly or use a surrogate key")
    }

    val lefts = left.select(leftKey.cast("long").as("__lk"),
        GraftFunctions.st_x(leftGeom).as("lx"), GraftFunctions.st_y(leftGeom).as("ly"))
      .where(c("__lk").isNotNull && c("lx").isNotNull && c("ly").isNotNull)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // selfJoin (LOF's shape): the right side IS the left side — one cached
    // projection, one extent/uniqueness pass, half the cache footprint
    val rights =
      if (selfJoin)
        lefts.select(c("__lk").as("__nk"), c("lx").as("rx"), c("ly").as("ry"))
      else right.select(rightKey.cast("long").as("__nk"),
          GraftFunctions.st_x(rightGeom).as("rx"), GraftFunctions.st_y(rightGeom).as("ry"))
        .where(c("__nk").isNotNull && c("rx").isNotNull && c("ry").isNotNull)
        .persist(StorageLevel.MEMORY_AND_DISK)
    // hoisted above the try so the error path can release per-round caches
    // too, not just the two side projections
    val persisted = scala.collection.mutable.ListBuffer.empty[DataFrame]
    try {
      // ONE pass per distinct side: count + key uniqueness + extent (the
      // extent feeds both the cell auto-sizing and the ring ladder)
      val lg = lefts.agg(count(lit(1)).as("n"), countDistinct("__lk").as("nd"),
        min("lx").as("x0"), max("lx").as("x1"), min("ly").as("y0"), max("ly").as("y1")).head()
      if (verifyUniqueKeys && lg.getLong(0) > 0)
        require(lg.getLong(0) == lg.getLong(1),
          s"knnJoinPoints: leftKey must be unique (${lg.getLong(0)} rows, ${lg.getLong(1)} distinct)")
      val rg =
        if (selfJoin) lg
        else rights.agg(count(lit(1)).as("n"), countDistinct("__nk").as("nd"),
          min("rx").as("x0"), max("rx").as("x1"), min("ry").as("y0"), max("ry").as("y1")).head()
      val rCount = rg.getLong(0)
      if (verifyUniqueKeys && !selfJoin)
        require(rCount == rg.getLong(1),
          s"knnJoinPoints: rightKey must be unique ($rCount rows, ${rg.getLong(1)} distinct)")
      val (gx0, gx1, gy0, gy1) =
        if (rCount == 0) (0.0, 0.0, 0.0, 0.0)
        else (rg.getDouble(2), rg.getDouble(3), rg.getDouble(4), rg.getDouble(5))
      val cs: Double =
        if (cellSize > 0) cellSize
        else {
          val (wd, ht) = (gx1 - gx0, gy1 - gy0)
          val target = math.max(4.0 * k, 32.0)
          val n = math.max(rCount, 1L)
          val cell0 =
            if (wd <= 0 && ht <= 0) 1.0
            else if (wd <= 0 || ht <= 0) math.max(wd, ht) * target / n
            else math.sqrt(wd * ht * target / n)
          if (cell0 > 0 && !cell0.isNaN && !cell0.isInfinity) cell0 else 1.0
        }

      val keyedR = rights.withColumn("cell",
        pack(floor(c("rx") / cs).cast("long"), floor(c("ry") / cs).cast("long")))

      def topKAgg(d: Column, key: Column): Column =
        aggCol(KnnTopKAgg(ex(d), ex(key), ex(lit(k))))

      val resolvedParts = scala.collection.mutable.ListBuffer.empty[DataFrame]
      var unresolved = lefts
      var remaining = lg.getLong(0)

      // If one bounded product pass over (left x right) is already a
      // trivial job, take the fallback DIRECTLY: every ladder round is a
      // full probe-join + shuffle + count, so when left*right fits the
      // same budget the in-loop early exit uses, round 1 can only lose.
      // This is the in-loop early-exit decision, made before paying for
      // round 1 — results are identical (the fallback computes the exact
      // top-k over ALL right points with the same aggregate + tie-break).
      val directFallback = remaining > 0 && rCount > 0 &&
        remaining <= fallbackThreshold && remaining * rCount <= boundedPassBudget

      val dx = c("lx") - c("rx")
      val dy = c("ly") - c("ry")
      val dCol = sqrt(dx * dx + dy * dy)

      // Ring ladder shaped by observed geometry instead of a fixed 1,2,4,8:
      //  - rCover: the ring at which EVERY left block covers the right
      //    extent (then `covers` proves every point — later rounds would
      //    be dead weight). +1 absorbs the double-arithmetic boundary
      //    slack in the per-row `covers` test, which stays authoritative.
      //  - r0: the smallest ring whose block is EXPECTED to hold ~2k right
      //    points at observed density — starting below it just burns a
      //    round that cannot prove anything in typical data.
      def cellOf(v: Double): Long = math.floor(v / cs).toLong
      val rCover: Int =
        if (rCount == 0 || remaining == 0) 1
        else {
          val spans = Seq(
            cellOf(lg.getDouble(3)) - cellOf(gx0), cellOf(gx1) - cellOf(lg.getDouble(2)),
            cellOf(lg.getDouble(5)) - cellOf(gy0), cellOf(gy1) - cellOf(lg.getDouble(4)))
          math.max(1, math.min(spans.max + 1, Int.MaxValue.toLong).toInt)
        }
      val r0: Int =
        if (rCount == 0 || remaining == 0) 1
        else {
          val cells = (cellOf(gx1) - cellOf(gx0) + 1).toDouble *
            (cellOf(gy1) - cellOf(gy0) + 1).toDouble
          val perCell = rCount.toDouble / math.max(cells, 1.0)
          val need = math.sqrt(2.0 * k / math.max(perCell, 1e-9))
          math.max(1, math.min(math.ceil((need - 1) / 2).toLong, 8L).toInt)
        }

      var r = math.min(r0, rCover)
      var ringsLeft = !directFallback
      if (ringsLeft && remaining > 0 && rCount > 0) {
        // a narrow LEFT source (a single parquet file at test scale, a
        // small cached frame) would serialize each round's
        // explode-join-aggregate map work — the plan's hot side — on one
        // thread; widen it before the ladder. The width is sized to the
        // DATA, capped by the cluster's parallelism (guide §2.1:
        // partitions sized to rows, not cores): the left count is already
        // in hand from the stats pass, so tiny inputs get a handful of
        // real tasks instead of defaultParallelism near-empty ones (the
        // measured inverse-scaling signature at bench scale), while at
        // real volume rows/task dwarfs the divisor and the target is
        // defaultParallelism exactly as before. The right side is only
        // projected and cell-keyed (the join itself re-shuffles it), so
        // it keeps its native partitioning. Fallback-only runs skip the
        // shuffle: their map side is the right side, not this frame.
        val defPar = left.sparkSession.sparkContext.defaultParallelism
        val rowsPerTask = 2048L
        val target = math.min(defPar.toLong,
          math.max(1L, (remaining + rowsPerTask - 1) / rowsPerTask)).toInt
        if (unresolved.rdd.getNumPartitions < target)
          unresolved = unresolved.repartition(target)
      }
      while (remaining > 0 && ringsLeft && rCount > 0) {
        // after a ladder-capping round (covers-all or the classic max of
        // 8) the loop exits and any stragglers take the fallback
        ringsLeft = r < math.min(8, rCover)
        val cx = floor(c("lx") / cs).cast("long")
        val cy = floor(c("ly") / cs).cast("long")
        // two tiny sequence-explodes instead of one (2r+1)^2 literal array:
        // the generated code stays under janino's method limit at any r
        val probes = unresolved
          .withColumn("cx", cx).withColumn("cy", cy)
          .withColumn("__ddx", explode(sequence(lit(-r), lit(r))))
          .withColumn("__ddy", explode(sequence(lit(-r), lit(r))))
          .withColumn("cell", pack(c("cx") + c("__ddx"), c("cy") + c("__ddy")))
          .drop("__ddx", "__ddy")
        // LEFT join: every unresolved point appears in the round's output
        // even when its whole probe block is empty of right cells (the
        // aggregate skips the null candidate rows), so the next round's
        // unresolved set falls straight out of `done` — no per-round
        // anti-join shuffle of the unresolved side against the results
        val tops = probes.join(keyedR, Seq("cell"), "left")
          .select(c("__lk"), c("lx"), c("ly"), c("cx"), c("cy"),
            dCol.as("d"), c("__nk"))
          .groupBy("__lk", "lx", "ly", "cx", "cy")
          .agg(topKAgg(c("d"), c("__nk")).as("arr"))
        // distance from the point to its search-block boundary: anything
        // outside the block is at least this far away (minus sub-ulp
        // cell-boundary rounding, absorbed by the epsilon)
        val s = cs
        val margin = least(
          c("lx") - (c("cx") - r).cast("double") * s,
          (c("cx") + r + 1).cast("double") * s - c("lx"),
          c("ly") - (c("cy") - r).cast("double") * s,
          (c("cy") + r + 1).cast("double") * s - c("ly"))
        val eps = (abs(c("lx")) + abs(c("ly")) + lit(s)) * lit(1e-12)
        // coverage is decided on CELL INDICES, exactly: the block holds
        // every right cell iff [cx-r, cx+r] spans the right extent's cell
        // range (integer compare). The older coordinate-space `>=` test
        // could claim coverage while a right point sitting exactly on the
        // block's upper edge (extent max an exact multiple of cellSize)
        // hashed to the first cell OUTSIDE the probe block and was missed.
        val covers =
          c("cx") - r <= lit(cellOf(gx0)) && c("cx") + r >= lit(cellOf(gx1)) &&
            c("cy") - r <= lit(cellOf(gy0)) && c("cy") + r >= lit(cellOf(gy1))
        val proven = covers ||
          (size(c("arr")) >= k && element_at(c("arr"), k).getField("d") < margin - eps)
        val tagged = tops.withColumn("done", proven)
          .persist(StorageLevel.MEMORY_AND_DISK)
        persisted += tagged
        resolvedParts += tagged.where(c("done")).select("__lk", "arr")
        unresolved = tagged.where(!c("done")).select("__lk", "lx", "ly")
        remaining = unresolved.count()
        // early exit to the fallback: once the tail is small enough that
        // tail × rightCount is a trivially bounded pass, one fallback job
        // beats more ladder rounds (each round is a full join + shuffle)
        if (remaining > 0 && remaining <= fallbackThreshold &&
            remaining * math.max(rCount, 1L) <= boundedPassBudget) ringsLeft = false
        r = math.min(r * 2, rCover)
      }

      if (remaining > 0 && rCount > 0) {
        // stragglers: points whose k-th neighbor is > 8 cells away live in
        // regions ~empty of right points, so this set is small by
        // construction — broadcast THEM (never the right side) and reduce
        // through the same map-side-pruned bounded top-k
        require(remaining <= fallbackThreshold,
          s"knnJoinPoints: $remaining unresolved rows exceed fallbackThreshold=" +
            s"$fallbackThreshold — increase cellSize (cells are too empty) or raise the threshold")
        val fb = keyedR.crossJoin(broadcast(unresolved.select("__lk", "lx", "ly")))
          .select(c("__lk"), dCol.as("d"), c("__nk"))
          .groupBy("__lk")
          .agg(topKAgg(c("d"), c("__nk")).as("arr"))
        resolvedParts += fb
      }

      val resolved = resolvedParts.toList match {
        case Nil => // empty right side: no output rows, knnJoin-compatible
          lefts.select(c("__lk"),
            array().cast("array<struct<d:double,rk:bigint>>").as("arr")).limit(0)
        case parts => parts.map(_.select("__lk", "arr")).reduce(_ unionByName _)
      }
      val exploded = resolved
        .select(c("__lk"), posexplode(c("arr")))
        .select(c("__lk"), (c("pos") + 1).cast("int").as("knn_rank"),
          c("col").getField("d").as("knn_dist"), c("col").getField("rk").as("__rk"))
      val release = () => {
        persisted.foreach(_.unpersist())
        lefts.unpersist()
        if (!selfJoin) rights.unpersist(): Unit
      }
      (exploded, release)
    } catch {
      case t: Throwable =>
        persisted.foreach(_.unpersist())
        lefts.unpersist()
        if (!selfJoin) rights.unpersist()
        throw t
    }
  }
}
