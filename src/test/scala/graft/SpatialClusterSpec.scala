package graft

import graft.ops.SpatialCluster

class SpatialClusterSpec extends SparkSpec {
  import spark.implicits._

  private def points(rows: (Long, Double, Double)*) =
    rows.toDF("id", "px", "py")
      .selectExpr("id", "st_point(px, py) AS geo")

  test("dbscan: cores, border, noise on a hand-checked blob") {
    // square blob (ids 1-4, all mutual neighbors at eps 1.5), a border
    // point (5) reaching two cores, a loner (6)
    val df = points((1L, 0.0, 0.0), (2L, 1.0, 0.0), (3L, 0.0, 1.0),
      (4L, 1.0, 1.0), (5L, 2.0, 0.0), (6L, 10.0, 10.0))
    val got = SpatialCluster.dbscanPoints(df, "id", "geo", eps = 1.5, minPts = 4)
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2))).sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, true, 1L), (2L, true, 1L), (3L, true, 1L), (4L, true, 1L),
      (5L, false, 1L), (6L, false, -1L)))
  }

  test("dbscan: separate blobs get separate min-id labels") {
    val blobA = (1L to 5L).map(i => (i, (i % 2).toDouble, (i % 3).toDouble))
    val blobB = (11L to 15L).map(i => (i, 100.0 + (i % 2), 100.0 + (i % 3)))
    val got = SpatialCluster.dbscanPoints(points(blobA ++ blobB: _*), "id", "geo",
        eps = 3.0, minPts = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert((1L to 5L).forall(got(_) == 1L))
    assert((11L to 15L).forall(got(_) == 11L))
  }

  test("dbscan: minPts above blob size makes everything noise") {
    val df = points((1L, 0.0, 0.0), (2L, 1.0, 0.0), (3L, 0.0, 1.0))
    val got = SpatialCluster.dbscanPoints(df, "id", "geo", eps = 1.5, minPts = 5)
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2))).sortBy(_._1)
    assert(got.forall { case (_, isCore, c) => !isCore && c == -1L })
  }

  test("lof: uniform run scores 1, the far point scores high") {
    // 1D lattice 0,1,2,3 plus a loner at 10; k = 2 (hand-computed:
    // lrd(1..4) = 2/3, lrd(5) = 2/15, LOF(1..4) = 1, LOF(5) = 5)
    val df = points((1L, 0.0, 0.0), (2L, 1.0, 0.0), (3L, 2.0, 0.0),
      (4L, 3.0, 0.0), (5L, 10.0, 0.0))
    val got = SpatialCluster.localOutlierFactor(df, "id", "geo", k = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(3)))
      .sortBy(_._1)
    assert(got.map(_._2).toSeq == Seq(2.0, 1.0, 1.0, 2.0, 8.0)) // k-dists
    got.take(4).foreach { case (_, _, lof) => assert(lof == 1.0) }
    assert(math.abs(got(4)._3 - 5.0) < 1e-12)
  }

  test("lof: deterministic across recomputation; driver and distributed paths agree") {
    val df = points((1L to 200L).map(i =>
      (i, i.toDouble, (i % 23).toDouble * 2)): _*)
    val a = SpatialCluster.localOutlierFactor(df, "id", "geo", k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toMap
    val b = SpatialCluster.localOutlierFactor(df, "id", "geo", k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toMap
    assert(a == b) // bit-identical, not just close
    val dist = SpatialCluster.localOutlierFactor(df, "id", "geo", 5, driverNbrThreshold = 0L)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))).toSet
    val drv = SpatialCluster.localOutlierFactor(df, "id", "geo", 5, driverNbrThreshold = 1L << 22)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))).toSet
    assert(dist == drv) // same doubles bit-for-bit on both paths
  }

  test("lof: duplicate coordinates keep the exactly-k contract on both paths") {
    // ids 1..4 co-located at (0,0): for id 4 the (dist, id) tie-break puts
    // 1,2,3 ahead of self in the k+1 = 3 fetch, so self never appears and
    // the re-rank must truncate back to k = 2 neighbors; ids 5..8 unique
    val df = points((1L, 0.0, 0.0), (2L, 0.0, 0.0), (3L, 0.0, 0.0),
      (4L, 0.0, 0.0), (5L, 5.0, 0.0), (6L, 6.0, 0.0), (7L, 7.0, 0.0),
      (8L, 20.0, 0.0))
    def run(threshold: Long) =
      SpatialCluster.localOutlierFactor(df, "id", "geo", 2, driverNbrThreshold = threshold)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
        .sortBy(_._1).toSeq
    val drv = run(1L << 22)
    val dist = run(0L)
    assert(drv.zip(dist).forall { case (a, b) =>
      a._1 == b._1 && a._2 == b._2 &&
        (a._3 == b._3 || (a._3.isNaN && b._3.isNaN)) &&
        (a._4 == b._4 || (a._4.isNaN && b._4.isNaN))
    }, s"paths disagree:\n$drv\n$dist")
    assert(drv.map(_._1) == (1L to 8L)) // every input id gets a verdict
    // co-located points: k-dist 0, lrd Infinity (sklearn duplicate case)
    drv.take(4).foreach { case (_, kd, lrd, _) =>
      assert(kd == 0.0 && lrd.isInfinity)
    }
    // unique mid-run points are finite and sane
    drv.slice(4, 7).foreach { case (_, kd, lrd, lof) =>
      assert(kd > 0 && !lrd.isInfinity && !lof.isNaN)
    }
  }

  test("dbscan: driver fast path and distributed path agree exactly") {
    val df = points((1L to 300L).map(i =>
      (i, (i % 23).toDouble * 2 + (i % 3).toDouble, (i % 17).toDouble * 2)): _*)
    def run(threshold: Long) =
      SpatialCluster.dbscanPoints(df, "id", "geo", 2.5, 4, checkpoint = true,
        driverPosThreshold = threshold)
        .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(run(1L << 20) == run(0L)) // driver cut vs pure distributed
  }

  test("dbscan and gi* plans contain no cartesian product") {
    val df = points((1L to 50L).map(i => (i, (i % 7).toDouble, (i % 5).toDouble)): _*)
      .withColumn("v", org.apache.spark.sql.functions.expr("id % 10"))
    for (plan <- Seq(
        SpatialCluster.dbscanPoints(df, "id", "geo", 1.5, 3, checkpoint = false),
        SpatialCluster.getisOrdGiStar(df, "id", "geo", "v", 1.5, checkpoint = false))) {
      val physical = plan.queryExecution.executedPlan.toString
      assert(!physical.contains("CartesianProduct"), s"cartesian in:\n$physical")
      // the only nested-loop join allowed is the broadcast of the one-row
      // globals frame (gi*); candidate generation must be equi-joins
      val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(physical).length
      assert(bnlj <= 1, s"unexpected nested-loop joins in:\n$physical")
    }
  }

  test("getis-ord gi*: hot run scores positive, cold loner negative") {
    // x = 0,1,2 carry value 10; the loner at 10 carries 0. n=4, xbar=7.5,
    // s = sqrt(18.75)
    val df = (1L to 4L).map(i => (i, Seq(0.0, 1.0, 2.0, 10.0)(i.toInt - 1), 0.0))
      .toDF("id", "px", "py")
      .selectExpr("id", "st_point(px, py) AS geo",
        "CASE WHEN id = 4 THEN 0 ELSE 10 END AS v")
    val got = SpatialCluster.getisOrdGiStar(df, "id", "geo", "v", radius = 1.5)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(got.map(g => (g._2, g._3)).toSeq ==
      Seq((2.0, 20.0), (3.0, 30.0), (2.0, 20.0), (1.0, 0.0)))
    val s = math.sqrt(18.75)
    assert(math.abs(got(0)._4 - 5.0 / (s * math.sqrt(4.0 / 3.0))) < 1e-12)
    assert(math.abs(got(3)._4 - -7.5 / (s * math.sqrt(1.0))) < 1e-12)
    assert(got(1)._4 > 0 && got(3)._4 < 0)
  }

  test("dbscan: points straddling cell boundaries still pair up") {
    // eps = 1.0 puts these in different grid cells; the 3x3 probe must find
    // the cross-cell neighbor
    val df = points((1L, 0.95, 0.0), (2L, 1.05, 0.0), (3L, 2.0, 0.0),
      (4L, 0.0, 0.0))
    val got = SpatialCluster.dbscanPoints(df, "id", "geo", eps = 1.0, minPts = 3)
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2))).sortBy(_._1)
    // 1: nbrs {1,2,4} core; 2: nbrs {1,2,3} core; 3: {2,3} border; 4: {1,4} border
    assert(got.toSeq == Seq(
      (1L, true, 1L), (2L, true, 1L), (3L, false, 1L), (4L, false, 1L)))
  }
}
