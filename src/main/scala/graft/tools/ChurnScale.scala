package graft.tools

import graft.ops.Similarity
import graft.tables.{GeoManifest, GeoTable}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The index-churn drift envelope: removal/upsert on a persisted IVF-PQ
 * index never rebuilds (O(keys) equality-delete commits; probes stay
 * EXACT over survivors) — but churn ages the index two ways:
 *
 *   1. delete sidecars accumulate until the table's own
 *      fold-at-threshold maintenance folds them (bounded read-side
 *      merge work — measured here as the live sidecar backlog);
 *   2. upserted vectors assign to the STORED centroids, so a DRIFTING
 *      ingest distribution unbalances clusters: a fixed nprobe covers a
 *      shrinking share of the true neighborhood (recall decay at the
 *      ann_ivf recall contract's knee) and/or the hot clusters hold a
 *      growing share of rows (pruning decay — probed-row share rises).
 *
 * This run puts numbers on both: build IVF-PQ over a replicated corpus,
 * apply `rounds` rounds of remove (5%) + upsert (5%, replacements drawn
 * from a DELIBERATELY drifted distribution — absolute values, which
 * collapse into the positive orthant's clusters), and per round record
 * probe wall, probed-row share, files opened, sidecar backlog, and
 * recall@10 against brute force over the live corpus. A final REBUILD
 * over the survivors (buildIvfPqIndex again — Lloyd's repriced once)
 * shows what a rebuild buys back. The maintenance recipe this motivates
 * lives in README.md §ANN index maintenance.
 *
 * Usage: runMain graft.tools.ChurnScale [reps] [rounds] [nprobe]
 *   reps replicas of the sf0.1 embeddings (500 rows, dim 64) with
 *   hash-seeded sign flips per replica (cross-replica cosine ~0).
 */
object ChurnScale {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(128)
    val rounds = args.drop(1).headOption.map(_.toInt).getOrElse(6)
    val nprobe = args.drop(2).headOption.map(_.toInt).getOrElse(8)
    val k = 64
    val spark = SparkSession.builder().master("local[8]")
      .appName("graft-churn-scale")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val corpus = spark.range(reps).crossJoin(emb).selectExpr(
      "id * 1000000 + vec_id AS vec_id",
      "transform(embedding, (x, i) -> CAST(x AS DOUBLE) * " +
        "(CASE WHEN pmod(hash(id, i), 2) = 0 THEN 1.0 ELSE -1.0 END)) AS emb")
      .cache()
    val n0 = corpus.count()
    val q = corpus.orderBy("vec_id").select("emb").head.getSeq[Double](0)
      .map(_.toFloat).toArray

    val idx = java.nio.file.Files.createTempDirectory("churn_scale").toString + "/i"
    val t0 = System.nanoTime()
    Similarity.buildIvfPqIndex(spark, idx, corpus, col("emb"), col("vec_id"),
      k = k, iters = 3, m = 16, pqK = 16)
    println(f"[churn] build n=$n0 k=$k in ${(System.nanoTime() - t0) / 1e9}%.1f s")

    val root = s"$idx/vectors"
    def centroids: Seq[(Int, Array[Double])] =
      GeoTable.read(spark, s"$idx/centroids").orderBy("cluster").collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toSeq
    def nearest(np: Int): Seq[Int] = {
      val qd = q.map(_.toDouble)
      def cos(v: Array[Double]): Double = {
        var d = 0.0; var nv = 0.0; var nq = 0.0; var i = 0
        while (i < math.min(v.length, qd.length)) {
          d += v(i) * qd(i); nv += v(i) * v(i); nq += qd(i) * qd(i); i += 1
        }
        if (nv == 0 || nq == 0) 0.0 else d / math.sqrt(nv * nq)
      }
      centroids.sortBy { case (_, v) => -cos(v) }.take(np).map(_._1)
    }

    def metrics(tag: String): Unit = {
      val live = GeoTable.read(spark, root)
      val liveN = live.count()
      val probes = nearest(nprobe)
      val probedScan = GeoTable.scan(spark, root, col("cluster").isin(probes: _*))
      val probedRows = probedScan.count()
      // input_file_name() is single-source only: once sidecars merge
      // in-reader the plan is a join, so fall back to -1 there (the
      // probedShare column carries the selectivity story regardless)
      val filesOpened = scala.util.Try(
        probedScan.select(input_file_name()).distinct().count()).getOrElse(-1L)
      val m = GeoManifest.read(spark, root)
      val totalFiles = m.files.count(_.rows > 0)
      val sidecarRows = m.eqDeletes.map(_.rows).sum
      // probe wall: best of 3 (dodges host noise; plans are identical)
      val walls = (1 to 3).map { _ =>
        val t = System.nanoTime()
        Similarity.ivfPqSearch(spark, idx, q, k = 10, nprobe = nprobe,
          candidates = 256).collect()
        (System.nanoTime() - t) / 1e9
      }
      val got = Similarity.ivfPqSearch(spark, idx, q, k = 10, nprobe = nprobe,
          candidates = 256).select("vec_id").collect().map(_.getLong(0)).toSet
      val brute = Similarity.bruteTopK(live, col("vec"), col("vec_id"), q, 10)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      println(f"[churn] $tag%-10s live=$liveN%7d probedShare=${probedRows.toDouble / liveN}%.3f " +
        f"files=$filesOpened%3d/$totalFiles%3d sidecarRows=$sidecarRows%7d " +
        f"probeWall=${walls.min}%.2f s recall@10=${(got & brute).size}%2d/10")
    }

    metrics("built")
    var churned = 0L
    for (r <- 1 to rounds) {
      val live: DataFrame = GeoTable.read(spark, root).select("vec_id", "vec")
      val removeIds = live.where(pmod(hash(col("vec_id"), lit(r)), lit(20)) === 0)
        .select("vec_id")
      Similarity.removeFromIvfIndex(spark, idx, removeIds)
      // drifted replacements: |x| collapses every replacement into the
      // positive orthant — the adversarial ingest-drift direction
      val upserts = live.where(pmod(hash(col("vec_id"), lit(r)), lit(20)) === 1)
        .select(col("vec_id"),
          expr("transform(vec, x -> abs(x))").as("emb"))
      churned += Similarity.upsertIvfIndex(spark, idx, upserts,
        col("emb"), col("vec_id"))
      metrics(s"round$r")
    }

    // the rebuild: Lloyd's over the survivors, one fresh index
    val survivors = GeoTable.read(spark, root).select(col("vec_id"), col("vec").as("emb"))
      .cache()
    survivors.count()
    val idx2 = java.nio.file.Files.createTempDirectory("churn_rebuild").toString + "/i"
    val t1 = System.nanoTime()
    Similarity.buildIvfPqIndex(spark, idx2, survivors, col("emb"), col("vec_id"),
      k = k, iters = 3, m = 16, pqK = 16)
    val rebuildSec = (System.nanoTime() - t1) / 1e9
    locally {
      // post-rebuild metrics against the SAME live corpus
      val probesWall = (1 to 3).map { _ =>
        val t = System.nanoTime()
        Similarity.ivfPqSearch(spark, idx2, q, k = 10, nprobe = nprobe,
          candidates = 256).collect()
        (System.nanoTime() - t) / 1e9
      }
      val got = Similarity.ivfPqSearch(spark, idx2, q, k = 10, nprobe = nprobe,
          candidates = 256).select("vec_id").collect().map(_.getLong(0)).toSet
      val brute = Similarity.bruteTopK(survivors, col("emb"), col("vec_id"), q, 10)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val liveN = survivors.count()
      val cents2 = GeoTable.read(spark, s"$idx2/centroids").orderBy("cluster")
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toSeq
      val qd = q.map(_.toDouble)
      def cos(v: Array[Double]): Double = {
        var d = 0.0; var nv = 0.0; var nq = 0.0; var i = 0
        while (i < math.min(v.length, qd.length)) {
          d += v(i) * qd(i); nv += v(i) * v(i); nq += qd(i) * qd(i); i += 1
        }
        if (nv == 0 || nq == 0) 0.0 else d / math.sqrt(nv * nq)
      }
      val probes2 = cents2.sortBy { case (_, v) => -cos(v) }.take(nprobe).map(_._1)
      val probedRows = GeoTable.scan(spark, s"$idx2/vectors",
        col("cluster").isin(probes2: _*)).count()
      println(f"[churn] rebuild    live=$liveN%7d probedShare=${probedRows.toDouble / liveN}%.3f " +
        f"buildWall=$rebuildSec%.1f s probeWall=${probesWall.min}%.2f s " +
        f"recall@10=${(got & brute).size}%2d/10 (churned=$churned rows total)")
    }
    spark.stop()
  }
}
