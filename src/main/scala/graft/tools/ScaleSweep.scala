package graft.tools

import graft.functions.GraftFunctions
import graft.ops.{Dedup, SpatialCluster}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Scale-assurance sweep (dev harness): runs the adaptive-cut operators on
 * REAL sf1-scale inputs with their driver thresholds forced to zero, so
 * the distributed paths execute above the scale the unit specs reach, and
 * asserts the results equal the default (driver-cut) paths row-for-row.
 *
 * Usage: runMain graft.tools.ScaleSweep <sfDir>
 *
 * This is the "exercise the 2^20 / 2^22 boundaries above threshold"
 * check: the driver cuts are equivalence-tested at spec scale, and this
 * proves the same equivalence holds under sf1 row counts and real skew.
 */
object ScaleSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-scale-sweep")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .withExtensions(new graft.extension.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)

    val customer = spark.read.parquet(s"$dir/customer.parquet")
    val documents = spark.read.parquet(s"$dir/documents.parquet")
    import GraftFunctions._

    def check(name: String, a: DataFrame, b: DataFrame): Unit = {
      val cols = a.columns.toSeq
      val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
      val n = a.count()
      assert(diff == 0, s"$name: driver/distributed disagree ($diff rows differ)")
      println(s"[sweep] $name OK: $n rows, driver == distributed")
    }

    // DBSCAN over all sf customers (150k points at sf1): default takes
    // the driver cut (positions < 2^20); threshold 0 forces the
    // distributed contraction + eps-grid + CC path
    val pts = customer.select(col("c_custkey"),
      st_point(col("c_acctbal") % 100.0, (col("c_custkey") % 100).cast("double")).as("g"))
    check("dbscan",
      SpatialCluster.dbscanPoints(pts, "c_custkey", "g", eps = 1.5, minPts = 4),
      SpatialCluster.dbscanPoints(pts, "c_custkey", "g", eps = 1.5, minPts = 4,
        checkpoint = true, driverPosThreshold = 0L))

    // LOF: threshold 0 forces the distributed fold arithmetic; forceGrid
    // additionally pins the partitioned (big-big) KNN route
    check("lof",
      SpatialCluster.localOutlierFactor(pts, "c_custkey", "g", k = 8),
      SpatialCluster.localOutlierFactor(pts, "c_custkey", "g", k = 8,
        driverNbrThreshold = 0L, forceGrid = true, gridThreshold = 0L))

    // connected components over sf1 near-dup pairs (each doc has 10
    // exact copies at sf1 -> dense clusters): threshold 0 forces the
    // distributed label propagation
    val pairs = Dedup.minhashDedup(documents, col("doc_id"), col("text"), threshold = 0.8)
      .select(col("id1"), col("id2"))
    pairs.persist()
    println(s"[sweep] near-dup pairs at this sf: ${pairs.count()}")
    check("cluster_pairs",
      Dedup.clusterPairs(pairs),
      Dedup.clusterPairs(pairs, driverEdgeThreshold = 0L))
    pairs.unpersist()

    println("[sweep] all adaptive cuts verified above threshold")
    spark.stop()
  }
}
