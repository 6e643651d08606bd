package graft.ops

import graft.functions.GraftFunctions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * Density-based spatial clustering (DBSCAN) over point geometries — the
 * capability match for Sedona's ST_DBSCAN (public Sedona 1.7 surface;
 * the reference extension registers the whole Sedona catalog wholesale,
 * reference: extension/.../SedonaIcebergExtensions.scala:38).
 *
 * Spark-first shape, no all-pairs work:
 *  1. contract co-located points into weighted positions (points at one
 *     coordinate share the exact neighborhood, so they share core-ness,
 *     class and cluster — this collapses the locally-quadratic pair blowup
 *     that dense sites would otherwise cause, the DBSCAN analog of the
 *     hot-cell story in plans/SpatialJoin);
 *  2. bucket positions into an eps-sized grid; candidate neighbor pairs
 *     come from an equi-join of each position's 3x3 cell neighborhood
 *     against positions keyed by their own cell (bounded, shuffle-on-key,
 *     AQE-friendly — same candidate shape as SpatialJoin.tileJoin);
 *  3. exact eps filter on squared distance (no sqrt — integer-valued
 *     coordinates stay bit-exact for the oracle);
 *  4. weighted neighbor counts (map-side partial agg) decide core
 *     positions (a point's neighborhood size = sum of neighbor weights,
 *     itself included);
 *  5. connected components over core-core position edges via
 *     Dedup.clusterPairs (adaptive driver union-find below 2^20 edges,
 *     checkpointed label propagation above) keyed by each position's MIN
 *     point id — so the cluster label is the smallest core POINT id in
 *     the component, independent of the contraction;
 *  6. border positions adopt the MIN cluster among their core neighbors
 *     (deterministic, unlike the arbitrary first-seen assignment in the
 *     textbook scan); everything else is noise.
 */
object SpatialCluster {

  /** DBSCAN over a point table.
    *
    * @param df      input with an integral id column and a WKB point column
    * @param idCol   unique id column name (cast to LONG)
    * @param geomCol WKB point geometry column name
    * @param eps     neighborhood radius (euclidean)
    * @param minPts  minimum neighborhood size (the point itself counts,
    *                sklearn/PostGIS convention) for a core point
    * @return (id, is_core, cluster): cluster = smallest core point id
    *         reachable; -1 for noise points
    */
  def dbscanPoints(df: DataFrame, idCol: String, geomCol: String,
                   eps: Double, minPts: Int): DataFrame =
    dbscanPoints(df, idCol, geomCol, eps, minPts, checkpoint = true)

  /** `checkpoint = false` keeps the logical plan inspectable (tests assert
    * the join shapes); production callers always materialize. Below
    * `driverPosThreshold` distinct positions the whole clustering runs
    * driver-side over the contracted positions (one collect + one
    * broadcast join instead of ~15 tiny stages — the same adaptive cut
    * Dedup.clusterPairs makes); the distributed path stays the scale
    * story for billions of distinct coordinates. */
  private[graft] def dbscanPoints(df: DataFrame, idCol: String, geomCol: String,
                   eps: Double, minPts: Int, checkpoint: Boolean,
                   driverPosThreshold: Long = 1L << 20): DataFrame = {
    require(eps > 0, s"eps must be positive, got $eps")
    require(minPts >= 1, s"minPts must be >= 1, got $minPts")
    val pts = df.select(col(idCol).cast("long").as("id"),
        GraftFunctions.st_x(col(geomCol)).as("x"),
        GraftFunctions.st_y(col(geomCol)).as("y"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // position contraction: one row per distinct coordinate
      val pos = pts.groupBy("x", "y")
        .agg(count(lit(1)).as("w"), min("id").as("pid"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      try {
        val nPos = pos.count()
        if (checkpoint && nPos <= driverPosThreshold)
          return dbscanDriver(pts, pos, eps, minPts)
        val cx = floor(col("x") / lit(eps)).cast("long")
        val cy = floor(col("y") / lit(eps)).cast("long")
        def pack(a: Column, b: Column): Column =
          shiftleft(a, 32).bitwiseOR(b.bitwiseAND(lit(0xffffffffL)))
        val keyed = pos.withColumn("cell", pack(cx, cy))
        val probes = pos.withColumn("cell", explode(array(
          (for (dx <- -1 to 1; dy <- -1 to 1) yield pack(cx + lit(dx), cy + lit(dy))): _*)))
        // every unordered position pair appears twice (once per direction),
        // self once — exactly what weighted neighborhood counting wants
        val dx = col("ax") - col("bx")
        val dy = col("ay") - col("by")
        val posPairs = probes.select(col("pid").as("pida"), col("x").as("ax"),
            col("y").as("ay"), col("cell"))
          .join(keyed.select(col("pid").as("pidb"), col("w").as("wb"),
            col("x").as("bx"), col("y").as("by"), col("cell")), "cell")
          .where(dx * dx + dy * dy <= lit(eps * eps))
          .select("pida", "pidb", "wb")
          .persist(StorageLevel.MEMORY_AND_DISK)
        try {
          val corePos = posPairs.groupBy(col("pida").as("pid")).agg(sum("wb").as("n"))
            .where(col("n") >= minPts).select("pid")
            .persist(StorageLevel.MEMORY_AND_DISK)
          try {
            val coreEdges = posPairs
              .join(corePos.withColumnRenamed("pid", "pida"), "pida")
              .join(corePos.withColumnRenamed("pid", "pidb"), "pidb")
              .where(col("pida") < col("pidb"))
              .select(col("pida").as("id1"), col("pidb").as("id2"))
            // cluster = min core point id in the component; core positions
            // with no core neighbor are their own cluster
            val coreLabels = corePos.join(
                Dedup.clusterPairs(coreEdges).withColumnRenamed("id", "pid"), Seq("pid"), "left")
              .select(col("pid"), coalesce(col("cluster"), col("pid")).as("cluster"))
            // border: non-core position with >= 1 core neighbor adopts the
            // min neighbor cluster
            val borderLabels = posPairs
              .join(corePos.withColumnRenamed("pid", "pidb"), "pidb")
              .join(coreLabels.withColumnRenamed("pid", "pidb").withColumnRenamed("cluster", "nbc"), "pidb")
              .join(corePos.withColumnRenamed("pid", "pida"), Seq("pida"), "left_anti")
              .groupBy(col("pida").as("pid")).agg(min("nbc").as("cluster"))
            val posLabeled = coreLabels.withColumn("is_core", lit(true))
              .unionByName(borderLabels.withColumn("is_core", lit(false)))
            // fan the per-position verdicts back out to points by coordinate
            val out = pts.join(pos.select("x", "y", "pid"), Seq("x", "y"))
              .join(posLabeled, Seq("pid"), "left")
              .select(col("id"), coalesce(col("is_core"), lit(false)).as("is_core"),
                coalesce(col("cluster"), lit(-1L)).as("cluster"))
            if (checkpoint) out.localCheckpoint() else out
          } finally corePos.unpersist()
        } finally posPairs.unpersist()
      } finally pos.unpersist()
    } finally pts.unpersist()
  }

  /** Driver-side LOF arithmetic over the collected RAW KNN pairs
    * (id, knn_rank, knn_dist, nbr) — k+1 per id, self included: the
    * self-drop and exactly-k re-rank happen in memory here (the
    * distributed path does the same with a window), then identical
    * rank-ordered sequential folds, so the scores are the same doubles
    * bit-for-bit. */
  private def lofDriver(spark: org.apache.spark.sql.SparkSession,
                        pairs: DataFrame, k: Int): DataFrame = {
    val rows = pairs.select("id", "knn_rank", "knn_dist", "nbr").collect()
    // per-id neighbor lists: rank order, self dropped, first k kept —
    // exactly the window re-rank of the distributed path
    val byId = new java.util.HashMap[Long, Array[(Long, Double)]]()
    val grouped = rows.groupBy(_.getLong(0))
    grouped.foreach { case (id, rs) =>
      val ns = rs.sortBy(_.getInt(1)).iterator
        .filter(_.getLong(3) != id).take(k)
        .map(r => (r.getLong(3), r.getDouble(2))).toArray
      if (ns.nonEmpty) byId.put(id, ns)
    }
    import scala.jdk.CollectionConverters._
    val kdist = byId.asScala.map { case (id, ns) => id -> ns.map(_._2).max }
    val lrd = byId.asScala.map { case (id, ns) =>
      var rsum = 0.0
      ns.foreach { case (nbr, d) => rsum += math.max(kdist(nbr), d) }
      id -> k.toDouble / rsum
    }
    val verdicts: java.util.List[org.apache.spark.sql.Row] = byId.asScala.toSeq.map {
      case (id, ns) =>
        var lsum = 0.0
        ns.foreach { case (nbr, _) => lsum += lrd(nbr) }
        org.apache.spark.sql.Row(id, kdist(id), lrd(id), lsum / lrd(id) / k.toDouble)
    }.asJava
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("k_dist", org.apache.spark.sql.types.DoubleType, nullable = false),
      org.apache.spark.sql.types.StructField("lrd", org.apache.spark.sql.types.DoubleType, nullable = false),
      org.apache.spark.sql.types.StructField("lof", org.apache.spark.sql.types.DoubleType, nullable = false)))
    // the verdict set's keys are exactly the ids with a neighborhood (a
    // subset of pts ids by construction), so the result IS the local
    // relation — no join back, no checkpoint, zero further jobs
    spark.createDataFrame(verdicts, schema)
  }

  /** Driver-side DBSCAN over collected positions (small-cardinality fast
    * path): grid-bucket hashmap for 3x3 neighbor scans, min-root
    * union-find over core-core pairs — identical semantics to the
    * distributed path, then one broadcast join fans verdicts back out. */
  private def dbscanDriver(pts: DataFrame, pos: DataFrame,
                           eps: Double, minPts: Int): DataFrame = {
    val spark = pts.sparkSession
    val rows = pos.select("x", "y", "w", "pid").collect()
    val n = rows.length
    val xs = new Array[Double](n); val ys = new Array[Double](n)
    val ws = new Array[Long](n); val pids = new Array[Long](n)
    val buckets = new java.util.HashMap[Long, java.util.ArrayList[Int]]()
    def cellOf(x: Double, y: Double): Long =
      (math.floor(x / eps).toLong << 32) | (math.floor(y / eps).toLong & 0xffffffffL)
    var i = 0
    while (i < n) {
      val r = rows(i)
      xs(i) = r.getDouble(0); ys(i) = r.getDouble(1)
      ws(i) = r.getLong(2); pids(i) = r.getLong(3)
      buckets.computeIfAbsent(cellOf(xs(i), ys(i)), _ => new java.util.ArrayList[Int]()).add(i)
      i += 1
    }
    val eps2 = eps * eps
    def neighbors(i: Int): Iterator[Int] = {
      val cx = math.floor(xs(i) / eps).toLong
      val cy = math.floor(ys(i) / eps).toLong
      (for (dx <- -1L to 1L; dy <- -1L to 1L) yield ((cx + dx) << 32) | ((cy + dy) & 0xffffffffL))
        .iterator.flatMap { c =>
          val b = buckets.get(c)
          if (b == null) Iterator.empty
          else {
            import scala.jdk.CollectionConverters._
            b.asScala.iterator.filter { j =>
              val ddx = xs(i) - xs(j); val ddy = ys(i) - ys(j)
              ddx * ddx + ddy * ddy <= eps2
            }
          }
        }
    }
    val isCore = new Array[Boolean](n)
    i = 0
    while (i < n) {
      var wsum = 0L
      neighbors(i).foreach(j => wsum += ws(j))
      isCore(i) = wsum >= minPts
      i += 1
    }
    // min-root union-find over core-core neighbor pairs (root pid is the
    // smallest core point id in the component, as in the distributed path)
    val parent = Array.tabulate(n)(identity)
    def find(a: Int): Int = {
      var r = a
      while (parent(r) != r) r = parent(r)
      var c = a
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    def union(a: Int, b: Int): Unit = {
      val ra = find(a); val rb = find(b)
      if (ra != rb) {
        if (pids(ra) <= pids(rb)) parent(rb) = ra else parent(ra) = rb
      }
    }
    i = 0
    while (i < n) {
      if (isCore(i)) neighbors(i).foreach(j => if (isCore(j) && j != i) union(i, j))
      i += 1
    }
    val cluster = new Array[Long](n)
    i = 0
    while (i < n) {
      cluster(i) =
        if (isCore(i)) pids(find(i))
        else {
          var best = Long.MaxValue
          neighbors(i).foreach(j => if (isCore(j)) best = math.min(best, pids(find(j))))
          if (best == Long.MaxValue) -1L else best
        }
      i += 1
    }
    import scala.jdk.CollectionConverters._
    val verdicts: java.util.List[org.apache.spark.sql.Row] =
      (0 until n).map(k => org.apache.spark.sql.Row(xs(k), ys(k), isCore(k), cluster(k))).asJava
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("x", org.apache.spark.sql.types.DoubleType, nullable = false),
      org.apache.spark.sql.types.StructField("y", org.apache.spark.sql.types.DoubleType, nullable = false),
      org.apache.spark.sql.types.StructField("is_core", org.apache.spark.sql.types.BooleanType, nullable = false),
      org.apache.spark.sql.types.StructField("cluster", org.apache.spark.sql.types.LongType, nullable = false)))
    pts.join(broadcast(spark.createDataFrame(verdicts, schema)), Seq("x", "y"))
      .select(col("id"), col("is_core"), col("cluster"))
      .localCheckpoint()
  }

  /**
   * Getis-Ord Gi* hotspot statistic (Getis & Ord 1992) with binary
   * distance-band weights — the capability match for Sedona's
   * ST_BinaryDistanceBandColumn + g_local pipeline (Sedona 1.7 stats).
   *
   * w_ij = 1 when d(i,j) <= radius (self included, the Gi* convention).
   * Neighborhood sums come from the same eps-grid 3x3 candidate equi-join
   * as dbscanPoints — bounded, shuffle-on-key, no all-pairs work. The
   * global mean/variance and the per-point neighbor sums are plain SUM
   * aggregates: with an integer-valued `valueCol` (counts, bucketed
   * measures — the usual hotspot inputs) every sum is exact regardless of
   * aggregation order, which is what makes the z-scores reproducible
   * across partitionings and engines.
   *
   * z_i = (S_i - xbar*W_i) / (s * sqrt((n*W_i - W_i^2) / (n-1))),
   * S_i = sum of neighbor values, W_i = neighbor count.
   *
   * @return (id, w_sum, v_sum, gi_star)
   */
  def getisOrdGiStar(df: DataFrame, idCol: String, geomCol: String,
                     valueCol: String, radius: Double): DataFrame =
    getisOrdGiStar(df, idCol, geomCol, valueCol, radius, checkpoint = true)

  private[graft] def getisOrdGiStar(df: DataFrame, idCol: String, geomCol: String,
                     valueCol: String, radius: Double, checkpoint: Boolean): DataFrame = {
    require(radius > 0, s"radius must be positive, got $radius")
    val pts = df.select(col(idCol).cast("long").as("id"),
        GraftFunctions.st_x(col(geomCol)).as("x"),
        GraftFunctions.st_y(col(geomCol)).as("y"),
        col(valueCol).cast("double").as("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val globals = pts.agg(count(lit(1)).cast("double").as("n"),
        sum("v").as("sx"), sum(col("v") * col("v")).as("sxx"))
      val cx = floor(col("x") / lit(radius)).cast("long")
      val cy = floor(col("y") / lit(radius)).cast("long")
      def pack(a: Column, b: Column): Column =
        shiftleft(a, 32).bitwiseOR(b.bitwiseAND(lit(0xffffffffL)))
      val keyed = pts.withColumn("cell", pack(cx, cy))
      val probes = pts.withColumn("cell", explode(array(
        (for (dx <- -1 to 1; dy <- -1 to 1) yield pack(cx + lit(dx), cy + lit(dy))): _*)))
      val dx = col("ax") - col("bx")
      val dy = col("ay") - col("by")
      // pairs include self once (dist 0) — Gi* wants the focal point in its
      // own neighborhood
      val nbrStats = probes.select(col("id").as("ida"), col("x").as("ax"), col("y").as("ay"), col("cell"))
        .join(keyed.select(col("v").as("vb"), col("x").as("bx"), col("y").as("by"), col("cell")), "cell")
        .where(dx * dx + dy * dy <= lit(radius * radius))
        .groupBy(col("ida").as("id"))
        .agg(count(lit(1)).cast("double").as("w_sum"), sum("vb").as("v_sum"))
      val xbar = col("sx") / col("n")
      val sdev = sqrt(col("sxx") / col("n") - xbar * xbar)
      val out = nbrStats.crossJoin(broadcast(globals))
        .select(col("id"), col("w_sum"), col("v_sum"),
          ((col("v_sum") - xbar * col("w_sum")) /
            (sdev * sqrt((col("n") * col("w_sum") - col("w_sum") * col("w_sum"))
              / (col("n") - lit(1.0))))).as("gi_star"))
      if (checkpoint) out.localCheckpoint() else out
    } finally pts.unpersist()
  }

  /**
   * Local Outlier Factor (Breunig et al. 2000) over point geometries — the
   * capability match for Sedona's ST_LocalOutlierFactor (Sedona 1.7).
   *
   * Exactly-k neighborhoods with deterministic (distance, id) tie-break
   * (the sklearn convention), self excluded. Every double sum is a
   * SEQUENTIAL FOLD IN NEIGHBOR-RANK ORDER (`aggregate(sort_array(...))`)
   * rather than an unordered SQL SUM: float addition is order-dependent,
   * and the fixed fold order is what lets an external engine (the DuckDB
   * oracle, a re-run on different partitioning) reproduce LOF scores
   * bit-for-bit.
   *
   * Scale note: neighborhoods come from SpatialJoin.knnJoin (broadcast
   * candidate pack) up to `gridThreshold` rows — right for
   * sample/monitoring scale (millions) — and from the PARTITIONED
   * [[graft.plans.KnnGridJoin]] above it: eps-cell bucketed equi-joins
   * with a bounded top-k aggregate, no full-table broadcast anywhere, so
   * LOF over billions of points is a shuffle plan, not a broadcast wall.
   * Both KNN paths produce bit-identical neighborhoods
   * (KnnGridJoinSpec), so the scores do not depend on the route taken.
   *
   * @return (id, k_dist, lrd, lof); lof is Infinity when a point's whole
   *         neighborhood is co-located with it (duplicate coordinates).
   */
  def localOutlierFactor(df: DataFrame, idCol: String, geomCol: String,
                         k: Int): DataFrame =
    localOutlierFactor(df, idCol, geomCol, k, driverNbrThreshold = 1L << 22)

  /** Below `driverNbrThreshold` (id, nbr) rows the post-KNN arithmetic
    * (k-dist, reachability, lrd, LOF) runs driver-side over the collected
    * neighbor lists — one collect + one broadcast join instead of eight
    * tiny stages. The fold order is identical (rank-sorted sequential
    * sums), so both paths and the oracle agree bit-for-bit; the KNN join
    * itself always stays distributed (it is the codegen-heavy part).
    * `forceGrid` pins the partitioned KNN path regardless of input size
    * (tests, and the driver-contract query that proves the scale path). */
  private[graft] def localOutlierFactor(df: DataFrame, idCol: String, geomCol: String,
                         k: Int, driverNbrThreshold: Long,
                         forceGrid: Boolean = false,
                         gridThreshold: Long = 1L << 22): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val pts = df.select(col(idCol).cast("long").as("id"), col(geomCol).as("__g"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val rights = pts.select(col("id").as("nbr"), col("__g").as("__ng"))
      // k+1 then drop self, then RE-RANK and keep rank <= k: with unique
      // coordinates self sits at rank 1 (dist 0) and the re-rank is the
      // old `knn_rank - 1`; with > k co-located smaller-id duplicates the
      // (dist, id) tie-break can push self OUT of the top k+1, which would
      // otherwise leave k+1 neighbors feeding sums divided by k — the
      // re-rank restores the exactly-k sklearn contract either way.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("id").orderBy("knn_rank")
      val npts = pts.count()
      val useGrid = forceGrid || npts > gridThreshold
      // the grid path consumes the bare neighborhood pairs (KnnGridJoin.
      // knnPairs) instead of the public join: LOF drops both sides' payload
      // columns immediately, so the two re-attachment joins and the
      // checkpoint of knnJoinPoints would be pure overhead; release() drops
      // the ladder's caches once the pairs are consumed
      val (knnPairs, release) =
        if (useGrid) {
          // cellSize = 0: the grid auto-sizes for ~max(4(k+1), 32) points
          // per cell from the right side's observed extent (for this
          // self-join, the point set itself) — dense enough that ring-1
          // usually proves the neighborhood, sparse enough that no cell
          // goes quadratic; no separate extent pre-pass here
          val (p, rel) = graft.plans.KnnGridJoin.knnPairs(
            pts, col("__g"), col("id"), pts, col("__g"), col("id"), k + 1,
            cellSize = 0.0, selfJoin = true)
          (p.select(col("__lk").as("id"), col("knn_rank"),
            col("knn_dist"), col("__rk").as("nbr")), rel)
        } else (graft.plans.SpatialJoin.knnJoin(
            pts, col("__g"), col("id"), rights, col("__ng"), col("nbr"), k + 1)
          .select(col("id"), col("knn_rank"), col("knn_dist"), col("nbr")),
          () => ())
      // exactly-(k+1) neighborhoods bound the pair count by (k+1)*npts, so
      // the driver-vs-distributed routing needs no extra counting job; the
      // driver path collects the RAW pairs once (self-drop + re-rank are
      // in-memory there) — no window shuffle, no persist
      if ((k + 1).toLong * npts <= driverNbrThreshold)
        return try lofDriver(pts.sparkSession, knnPairs, k) finally release()
      val nbrsRaw = knnPairs
        .where(col("nbr") =!= col("id"))
        .withColumn("rk", row_number().over(w))
        .where(col("rk") <= k)
        .select(col("id"), col("nbr"), col("knn_dist").as("dist"), col("rk"))
      val nbrs = nbrsRaw.persist(StorageLevel.MEMORY_AND_DISK)
      try {
        nbrs.count() // materialize before dropping the ladder's caches
        release()
        val kdist = nbrs.groupBy("id").agg(max("dist").as("k_dist"))
        // reachability distance to each neighbor: max(k-dist(nbr), d(p, nbr))
        val reach = nbrs
          .join(kdist.select(col("id").as("nbr"), col("k_dist").as("nb_kdist")), "nbr")
          .select(col("id"), col("rk"), greatest(col("nb_kdist"), col("dist")).as("rdist"))
        def foldInRankOrder(valueCol: String): Column =
          aggregate(
            sort_array(collect_list(struct(col("rk"), col(valueCol)))),
            lit(0.0),
            (acc, x) => acc + x.getField(valueCol))
        // rsum = 0 (whole neighborhood co-located) => lrd = Infinity, the
        // sklearn duplicate convention — spelled out because ANSI mode
        // turns the 0-divisor into an error, not an Infinity
        val lrd = reach.groupBy("id")
          .agg(foldInRankOrder("rdist").as("rsum"))
          .select(col("id"), when(col("rsum") === lit(0.0), lit(Double.PositiveInfinity))
            .otherwise(lit(k.toDouble) / col("rsum")).as("lrd"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        try {
          val lsum = nbrs
            .join(lrd.select(col("id").as("nbr"), col("lrd").as("nb_lrd")), "nbr")
            .groupBy("id").agg(foldInRankOrder("nb_lrd").as("lsum"))
          pts.select("id")
            .join(kdist, "id")
            .join(lrd, "id")
            .join(lsum, "id")
            .select(col("id"), col("k_dist"), col("lrd"),
              (col("lsum") / col("lrd") / lit(k.toDouble)).as("lof"))
            .localCheckpoint()
        } finally lrd.unpersist()
      } finally nbrs.unpersist()
    } finally pts.unpersist()
  }
}
