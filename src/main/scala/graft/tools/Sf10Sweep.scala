package graft.tools

import graft.functions.GraftFunctions
import graft.ops.Dedup
import graft.plans.{KnnGridJoin, SpatialJoin}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * sf10 spot sweep (dev harness): the three scale paths on ×100 data
 * (`gen_scale.py sf0.1 → sf10`: 1.5M customers, 500k documents), with
 * SAMPLED row-equivalence — full bit-equality baselines are quadratic
 * (or broadcast-the-world) at this scale by construction, which is
 * exactly why these paths exist.
 *
 *  1. partitioned big-big KNN join (KnnGridJoin.knnJoinPoints) on 1.5M
 *     points — grid result restricted to a sampled left side must equal
 *     the broadcast STRtree path run FOR that sample against the full
 *     right side (exact per the margin proof, so equality is strict).
 *  2. distributed connected components — near-dup graph from minhash
 *     LSH, label propagation (threshold 0) vs driver union-find on the
 *     same edges; same-component is the invariant (labels are min-id,
 *     so full frame equality).
 *  3. simhash banded pigeonhole join on the full 500k-doc corpus —
 *     restricted to a 3k-doc sample it must equal the sample's brute
 *     force all-pairs (pigeonhole exactness at hamming <= 3).
 *
 * Usage: runMain graft.tools.Sf10Sweep [sfDir]
 */
object Sf10Sweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf10")
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-sf10-sweep")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.extension.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)
    import GraftFunctions._

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[sf10] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }

    // --- 1. grid KNN join: 1.5M x 1.5M, k=8 --------------------------
    val customer = spark.read.parquet(s"$dir/customer.parquet")
    val pts = customer.select(col("c_custkey"),
        st_point(col("c_acctbal") % 100.0, (col("c_custkey") % 100).cast("double")).as("g"))
      .persist()
    val nPts = pts.count()
    // same sizing rule LOF uses: ~max(4(k+1), 32) points per cell
    val k = 8
    val cell = math.sqrt(100.0 * 100.0 * math.max(4.0 * (k + 1), 32.0) / nPts)
    val grid = timed(s"grid KNN join ($nPts pts, cell=$cell)") {
      val g = KnnGridJoin.knnJoinPoints(
        pts, col("g"), col("c_custkey"),
        pts.select(col("c_custkey").as("nbr"), col("g").as("ng")), col("ng"), col("nbr"),
        k = k + 1, cellSize = cell)
      g.persist(); g.count(); g
    }
    // sampled oracle: broadcast STRtree KNN for 5k sampled left rows
    // against the FULL right side (exact; small left never changes ranks)
    val sampleIds = pts.select("c_custkey").where(pmod(hash(col("c_custkey")), lit(300)) === 0)
    val sampleLeft = pts.join(broadcast(sampleIds), Seq("c_custkey"))
    val bcast = timed("broadcast KNN for the sample") {
      val b = SpatialJoin.knnJoin(
        sampleLeft, col("g"), col("c_custkey"),
        pts.select(col("c_custkey").as("nbr"), col("g").as("ng")), col("ng"), col("nbr"),
        k = k + 1)
      b.persist(); b.count(); b
    }
    // both paths emit left cols + knn_rank/knn_dist + right cols; compare
    // the key quadruple (geometries are derived from the keys)
    val proj = Seq(col("c_custkey"), col("nbr"), col("knn_rank"), col("knn_dist"))
    val gridOnSample = grid.join(broadcast(sampleIds), Seq("c_custkey")).select(proj: _*)
    val bcastNorm = bcast.select(proj: _*)
    val d1 = gridOnSample.exceptAll(bcastNorm).count() + bcastNorm.exceptAll(gridOnSample).count()
    val n1 = bcastNorm.count()
    assert(d1 == 0, s"grid KNN != broadcast KNN on the sample ($d1 rows differ)")
    println(s"[sf10] grid KNN OK: $n1 sampled rows bit-equal to the broadcast path")
    grid.unpersist(); bcast.unpersist()

    // --- 2. distributed CC vs driver union-find ----------------------
    // near-dup graph from a 20% doc slice (driver baseline must stay
    // driver-feasible; the DISTRIBUTED path is what's under test)
    val documents = spark.read.parquet(s"$dir/documents.parquet")
    val docs20 = documents.where(pmod(hash(col("doc_id")), lit(5)) === 0)
    val pairs = timed("minhash LSH pairs on the 20% slice") {
      val p = Dedup.minhashDedup(docs20, col("doc_id"), col("text"), threshold = 0.8)
        .select(col("id1"), col("id2"))
      p.persist(); println(s"[sf10] near-dup pairs: ${p.count()}"); p
    }
    val driver = timed("driver union-find")(Dedup.clusterPairs(pairs))
    val dist = timed("distributed label propagation")(
      Dedup.clusterPairs(pairs, driverEdgeThreshold = 0L))
    val d2 = driver.exceptAll(dist).count() + dist.exceptAll(driver).count()
    assert(d2 == 0, s"driver/distributed CC disagree ($d2 rows differ)")
    println(s"[sf10] CC OK: ${driver.count()} labeled ids, driver == distributed")
    pairs.unpersist()

    // --- 3. simhash banded join, sampled brute-force oracle ----------
    val sigs = documents.select(col("doc_id"), Dedup.simhash(col("text")).as("sig")).persist()
    val nd = sigs.count()
    val banded = timed(s"simhash banded join ($nd docs)") {
      val b = Dedup.simhashCandidates(documents, col("doc_id"), col("text"), maxHamming = 3)
      b.persist(); println(s"[sf10] banded pairs: ${b.count()}"); b
    }
    val sDocs = sigs.where(pmod(hash(col("doc_id")), lit(160)) === 0).persist()
    val ns = sDocs.count()
    val a = sDocs.select(col("doc_id").as("id1"), col("sig").as("s1"))
    val b2 = sDocs.select(col("doc_id").as("id2"), col("sig").as("s2"))
    val brute = a.join(b2, col("id1") < col("id2"))
      .where(bit_count(col("s1").bitwiseXOR(col("s2"))) <= 3)
      .select(col("id1"), col("id2"))
    val inSample = banded.join(broadcast(sDocs.select(col("doc_id").as("id1"))), Seq("id1"))
      .join(broadcast(sDocs.select(col("doc_id").as("id2"))), Seq("id2"))
      .select(col("id1"), col("id2"))
    val d3 = inSample.exceptAll(brute).count() + brute.exceptAll(inSample).count()
    val n3 = brute.count()
    assert(d3 == 0, s"banded simhash != brute force on the $ns-doc sample ($d3 rows differ)")
    println(s"[sf10] simhash OK: $n3 sampled pairs equal the brute-force oracle")

    println("[sf10] all three scale paths verified at sf10")
    spark.stop()
  }
}
