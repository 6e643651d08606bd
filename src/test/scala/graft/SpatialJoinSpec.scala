package graft

import graft.functions.GraftFunctions._
import graft.plans.SpatialJoin

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class SpatialJoinSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic pseudo-random points and boxes (multi-cell geometries!). */
  private lazy val pts: DataFrame = spark.range(200).select(
    col("id").as("pid"),
    st_point(pmod(hash(col("id")), lit(1000)).cast("double") / 10.0,
             pmod(hash(col("id"), lit(1)), lit(1000)).cast("double") / 10.0).as("pt"))
    .cache()

  private lazy val boxes: DataFrame = spark.range(30).select(
    col("id").as("bid"),
    st_polygonFromEnvelope(
      pmod(hash(col("id"), lit(2)), lit(800)).cast("double") / 10.0,
      pmod(hash(col("id"), lit(3)), lit(800)).cast("double") / 10.0,
      pmod(hash(col("id"), lit(2)), lit(800)).cast("double") / 10.0 + 17.3,
      pmod(hash(col("id"), lit(3)), lit(800)).cast("double") / 10.0 + 9.1).as("box"))
    .cache()

  private def naive(pred: org.apache.spark.sql.Column): Set[(Long, Long)] =
    boxes.crossJoin(pts).where(pred)
      .select("bid", "pid").as[(Long, Long)].collect().toSet

  test("tile join == naive cross join (contains, boxes span many cells)") {
    val expected = naive(st_contains(col("box"), col("pt")))
    for (cell <- Seq(5.0, 20.0, 100.0)) {
      val got = SpatialJoin.tileJoin(boxes, col("box"), pts, col("pt"), "contains", cellSize = cell)
        .select("bid", "pid").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"duplicates at cellSize=$cell")
      assert(got.toSet == expected, s"wrong result at cellSize=$cell")
    }
  }

  test("salted tile join == naive (skew lever leaves results unchanged)") {
    val expected = naive(st_contains(col("box"), col("pt")))
    val got = SpatialJoin.tileJoin(boxes, col("box"), pts, col("pt"), "contains",
        cellSize = 20.0, salt = 4)
      .select("bid", "pid").as[(Long, Long)].collect()
    assert(got.length == got.toSet.size)
    assert(got.toSet == expected)
  }

  test("broadcast tile join == naive (within)") {
    val expected = naive(st_within(col("pt"), col("box"))).map(_.swap)
    val got = SpatialJoin.broadcastTileJoin(pts, col("pt"), boxes, col("box"), "within", cellSize = 25.0)
      .select("pid", "bid").as[(Long, Long)].collect()
    assert(got.length == got.toSet.size)
    assert(got.toSet == expected)
  }

  test("box-box intersects join == naive (dup-heavy)") {
    val expected = boxes.crossJoin(boxes.select(col("bid").as("bid2"), col("box").as("box2")))
      .where(st_intersects(col("box"), col("box2")))
      .select("bid", "bid2").as[(Long, Long)].collect().toSet
    val got = SpatialJoin.tileJoin(boxes, col("box"),
        boxes.select(col("bid").as("bid2"), col("box").as("box2")), col("box2"),
        "intersects", cellSize = 10.0)
      .select("bid", "bid2").as[(Long, Long)].collect()
    assert(got.length == got.toSet.size, "reference-point dedup failed")
    assert(got.toSet == expected)
  }

  test("distance join == naive dwithin") {
    val expected = naive(st_dwithin(col("box"), col("pt"), lit(7.5)))
    val got = SpatialJoin.distanceJoin(boxes, col("box"), pts, col("pt"), dist = 7.5, cellSize = 12.0)
      .select("bid", "pid").as[(Long, Long)].collect()
    assert(got.length == got.toSet.size)
    assert(got.toSet == expected)
  }

  test("knn join STRtree path (>=128 candidates) == brute force, ties by key") {
    import org.apache.spark.sql.expressions.Window
    // grid candidates: many exact distance ties (symmetric layout)
    val cands = spark.range(400).select(col("id").as("cid"),
      st_point((col("id") % 20).cast("double"), (col("id") / 20).cast("double")).as("cpt"))
    val queries = spark.range(15).select(col("id").as("qid"),
      st_point((col("id") * 1.5) + 0.25, lit(9.5)).as("qpt"))
    val got = SpatialJoin.knnJoin(queries, col("qpt"), col("qid"), cands, col("cpt"), col("cid"), k = 5)
      .select("qid", "cid", "knn_rank").as[(Long, Long, Int)].collect().toSet
    val brute = queries.crossJoin(cands)
      .withColumn("d", st_distance(col("qpt"), col("cpt")))
      .withColumn("rn", row_number().over(Window.partitionBy("qid").orderBy(asc("d"), asc("cid"))))
      .where(col("rn") <= 5)
      .select(col("qid"), col("cid"), col("rn").cast("int")).as[(Long, Long, Int)].collect().toSet
    assert(got == brute)
  }

  test("knn join returns k nearest with correct ordering") {
    val got = SpatialJoin.knnJoin(pts.limit(20), col("pt"), col("pid"),
        boxes.select(col("bid"), st_centroid(col("box")).as("c")), col("c"),
        col("bid"), k = 3)
      .select("pid", "bid", "knn_rank").as[(Long, Long, Int)].collect()
    assert(got.count(_._3 == 1) == 20 && got.length == 60)
    // spot-check one row against brute force
    val p0 = got.filter(_._1 == got.head._1).sortBy(_._3).map(_._2).toSeq
    val brute = pts.limit(20).where(col("pid") === got.head._1)
      .crossJoin(boxes.select(col("bid"), st_centroid(col("box")).as("c")))
      .select(col("bid"), st_distance(col("pt"), col("c")).as("d"))
      .orderBy(asc("d"), asc("bid")).limit(3).select("bid").as[Long].collect().toSeq
    assert(p0 == brute)
  }

  test("st_knn per-row candidate arrays: full content hash keeps each row's answer correct") {
    import graft.geom.Geom
    import org.apache.spark.sql.graft.GraftShim
    import org.locationtech.jts.geom.Coordinate
    // Two arrays with IDENTICAL keys and IDENTICAL per-element WKB lengths
    // (points are fixed-size) that differ only at index 1 — the shape that
    // collided under the old 5-position sampled fingerprint. Each row must
    // get the nearest neighbor of ITS OWN array.
    def pt(x: Double): Array[Byte] = Geom.serialize(Geom.factory.createPoint(new Coordinate(x, 0)))
    val candsA = (0L until 9L).map(i => (i, pt(i.toDouble)))
    val candsB = candsA.updated(1, (1L, pt(100.0)))
    val q = pt(1.05)
    val df = Seq((0L, q, candsA), (1L, q, candsB)).toDF("row_id", "q", "cands")
      .coalesce(1) // one partition => one shared expression instance (the trap)
    val knn = GraftShim.column(graft.functions.StKnn(Seq(
      GraftShim.expression(col("q")), GraftShim.expression(col("cands")),
      GraftShim.expression(lit(1)))))
    val got = df.select(col("row_id"), knn.getItem(0).getField("rk").as("rk"))
      .as[(Long, Long)].collect().toMap
    // row A: key 1 at distance 0.05; row B: its key 1 moved to x=100, so
    // the nearest is key 2 at distance 0.95 (key 0 is 1.05 away)
    assert(got(0L) == 1L, s"row A got ${got(0L)}")
    assert(got(1L) == 2L, s"row B got ${got(1L)}")
  }
}
