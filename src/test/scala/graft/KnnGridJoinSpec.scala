package graft

import graft.ops.SpatialCluster
import graft.plans.{KnnGridJoin, SpatialJoin}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * The partitioned (grid) KNN join must agree with the broadcast KNN join
 * BIT-FOR-BIT — same rows, same ranks, same distance doubles — across
 * cell sizes that force every internal path: single-ring resolution,
 * multi-ring doubling, extent-covering blocks, and the broadcast-the-
 * stragglers fallback. That equality is what lets LOF route through
 * either path by size without changing a single score.
 */
class KnnGridJoinSpec extends SparkSpec {
  import spark.implicits._

  private def withSQLConf[T](kv: (String, String)*)(f: => T): T = {
    val old = kv.map { case (k, _) => k -> scala.util.Try(spark.conf.get(k)).toOption }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  // deterministic scatter with exact duplicate coordinates mixed in
  private def scatter(n: Int, dupFrom: Int): DataFrame =
    (1 to n).map { i =>
      if (i >= dupFrom) ((i.toLong, ((i - dupFrom + 1) * 37 % 101).toDouble, ((i - dupFrom + 1) * 59 % 89).toDouble))
      else ((i.toLong, (i * 37 % 101).toDouble + (i % 7) * 0.25, (i * 59 % 89).toDouble + (i % 5) * 0.125))
    }.toDF("id", "px", "py").selectExpr("id", "st_point(px, py) AS geo")

  private def collectKnn(df: DataFrame): Set[(Long, Int, Double, Long)] =
    df.select(col("lid"), col("knn_rank"), col("knn_dist"), col("rid"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3))).toSet

  // every fixture here is small enough that the pre-ladder bounded-product
  // route would take the one-pass fallback; boundedPassBudget = 0 pins the
  // LADDER on (without disabling the post-cap stragglers fallback) so each
  // test exercises the internal path its name claims. The direct route has
  // its own equality test below with the default budget.
  private def bothPaths(leftN: Int, rightN: Int, k: Int, cellSize: Double,
                        fallbackThreshold: Long = 1L << 22,
                        boundedPassBudget: Long = 0L): (Set[(Long, Int, Double, Long)], Set[(Long, Int, Double, Long)]) = {
    val left = scatter(leftN, dupFrom = leftN - 10).withColumnRenamed("id", "lid")
      .withColumnRenamed("geo", "lgeo")
    val right = scatter(rightN, dupFrom = rightN + 1).withColumnRenamed("id", "rid")
      .withColumnRenamed("geo", "rgeo")
    val bcast = SpatialJoin.knnJoin(left, col("lgeo"), col("lid"),
      right, col("rgeo"), col("rid"), k)
    val grid = KnnGridJoin.knnJoinPoints(left, col("lgeo"), col("lid"),
      right, col("rgeo"), col("rid"), k, cellSize, fallbackThreshold,
      boundedPassBudget)
    (collectKnn(bcast), collectKnn(grid))
  }

  test("grid == broadcast: dense cells, single-ring resolution") {
    val (b, g) = bothPaths(300, 80, k = 5, cellSize = 30.0)
    assert(b == g)
    assert(b.nonEmpty && b.size == 300 * 5)
  }

  test("grid == broadcast: one block covers the whole extent") {
    val (b, g) = bothPaths(120, 40, k = 3, cellSize = 200.0)
    assert(b == g)
  }

  test("grid == broadcast: sparse cells force ring doubling and the fallback") {
    // at cellSize 0.5 an 8-ring block is ~8.5 wide over a ~100x90 extent
    // with 60 right points — most lefts stay unproven and drain through
    // the broadcast-stragglers fallback
    val (b, g) = bothPaths(150, 60, k = 4, cellSize = 0.5)
    assert(b == g)
  }

  test("grid == broadcast: k larger than the right side returns all rights") {
    val (b, g) = bothPaths(50, 7, k = 20, cellSize = 10.0)
    assert(b == g)
    assert(g.size == 50 * 7)
  }

  test("grid == broadcast: pre-ladder bounded-product route (direct fallback)") {
    // default budget: 300 x 80 is far under 2^26, so the operator skips the
    // ladder and takes the single bounded pass — results must STILL be
    // bit-identical to the broadcast path (same aggregate, same tie-break)
    val (b, g) = bothPaths(300, 80, k = 5, cellSize = 30.0,
      boundedPassBudget = 1L << 26)
    assert(b == g)
    assert(b.size == 300 * 5)
  }

  test("grid: empty right side yields zero rows with the knnJoin schema") {
    val left = scatter(20, 100).withColumnRenamed("id", "lid").withColumnRenamed("geo", "lgeo")
    val right = scatter(5, 100).where(lit(false))
      .withColumnRenamed("id", "rid").withColumnRenamed("geo", "rgeo")
    val out = KnnGridJoin.knnJoinPoints(left, col("lgeo"), col("lid"),
      right, col("rgeo"), col("rid"), 3, 10.0)
    assert(out.columns.toSeq == Seq("lid", "lgeo", "knn_rank", "knn_dist", "rid", "rgeo"))
    assert(out.count() == 0)
  }

  test("grid: duplicate keys are rejected distributedly") {
    val left = scatter(20, 100).withColumnRenamed("id", "lid").withColumnRenamed("geo", "lgeo")
    val dupRight = scatter(10, 100).union(scatter(10, 100))
      .withColumnRenamed("id", "rid").withColumnRenamed("geo", "rgeo")
    val e = intercept[IllegalArgumentException] {
      KnnGridJoin.knnJoinPoints(left, col("lgeo"), col("lid"),
        dupRight, col("rgeo"), col("rid"), 3, 10.0)
    }
    assert(e.getMessage.contains("unique"))
  }

  test("grid: fallback threshold overflow raises a targeted error") {
    val e = intercept[IllegalArgumentException] {
      bothPaths(150, 60, k = 4, cellSize = 0.5, fallbackThreshold = 1L)
    }
    assert(e.getMessage.contains("fallbackThreshold"))
  }

  test("grid plan has no broadcast of the right side and no cartesian product") {
    // kill auto-broadcast so a small-scale plan can't hide a broadcast the
    // 100 TB plan would not get; a ring-resolved run must then contain NO
    // BroadcastExchange at all (the fallback's bounded straggler broadcast
    // is the only one ever allowed, and this cell size resolves ring-1).
    // fallbackThreshold = 0 pins the ladder on: at this fixture's scale
    // the pre-ladder bounded-product route would otherwise take the
    // fallback pass, which is exactly the broadcast this test forbids the
    // LADDER from containing.
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val left = scatter(200, 195).withColumnRenamed("id", "lid").withColumnRenamed("geo", "lgeo")
      val right = scatter(80, 100).withColumnRenamed("id", "rid").withColumnRenamed("geo", "rgeo")
      val out = KnnGridJoin.knnJoinPoints(left, col("lgeo"), col("lid"),
        right, col("rgeo"), col("rid"), 3, 40.0, fallbackThreshold = 0L,
        checkpoint = false)
      val plan = out.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"BNLJ in:\n$plan")
      assert(!plan.contains("BroadcastExchange"), s"broadcast in:\n$plan")
    }
  }

  test("grid: covers test is exact at cell-boundary extents (regression)") {
    // right extent max sits EXACTLY on a probe block's upper edge: x = 50
    // with cellSize 10 hashes to cell 5, the first cell OUTSIDE a block
    // ending at coordinate 50. The old coordinate-space covers test
    // ((cx+r+1)*s >= gx1) claimed coverage at r = 4 and silently dropped
    // that point from the neighborhood; the cell-index test keeps probing.
    // fallbackThreshold = 0 disables the early fallback so the ladder
    // itself must resolve the point.
    val left = Seq((1L, 1.0, 0.0)).toDF("lid", "px", "py")
      .selectExpr("lid", "st_point(px, py) AS lgeo")
    val right = Seq((10L, 5.0, 0.0), (20L, 50.0, 0.0)).toDF("rid", "px", "py")
      .selectExpr("rid", "st_point(px, py) AS rgeo")
    val out = KnnGridJoin.knnJoinPoints(left, col("lgeo"), col("lid"),
        right, col("rgeo"), col("rid"), k = 2, cellSize = 10.0,
        fallbackThreshold = 0L)
      .select("lid", "knn_rank", "rid", "knn_dist")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(out == Set((1L, 1, 10L, 4.0), (1L, 2, 20L, 49.0)))
  }

  test("lof: grid path and broadcast path score bit-for-bit equal") {
    val df = scatter(250, 240)
    def lof(force: Boolean) =
      SpatialCluster.localOutlierFactor(df, "id", "geo", 5,
        driverNbrThreshold = 1L << 22, forceGrid = force)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
        .sortBy(_._1).toSeq
    val viaGrid = lof(true)
    val viaBcast = lof(false)
    assert(viaGrid == viaBcast) // same doubles, not just close
    // and the distributed post-KNN arithmetic agrees too
    val viaGridDist = SpatialCluster.localOutlierFactor(df, "id", "geo", 5,
      driverNbrThreshold = 0L, forceGrid = true)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1).toSeq
    assert(viaGridDist == viaGrid)
  }
}
