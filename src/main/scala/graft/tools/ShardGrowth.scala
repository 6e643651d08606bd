package graft.tools

import graft.tables.{GeoManifest, GeoTable}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Does the sharded manifest list need an explicit `rewrite_manifests`
 * compaction verb? Iceberg ships one because its manifest count grows with
 * commit history until rewritten. graft's writeShards already folds shards
 * at or below shardSize/4 entries back into the fresh pool on every
 * commit, which SHOULD bound the live shard count at ~4x the optimal
 * (entries/shardSize) regardless of commit count — this run measures that
 * claim over ~1k single-file appends plus a delete-heavy phase (deletes
 * shrink shards toward the fold threshold, the adversarial direction).
 *
 * Output: per-checkpoint (commits, files, shards, optimal, ratio) lines
 * plus a verdict. If ratio stays O(1) across 1k commits, shard growth is
 * bounded by TABLE SIZE, not commit count, and rewrite_manifests has
 * nothing to compact that the next ordinary commit doesn't already fold.
 *
 * Usage: runMain graft.tools.ShardGrowth [commits] [shardSize]
 */
object ShardGrowth {
  def main(args: Array[String]): Unit = {
    val commits = args.headOption.map(_.toInt).getOrElse(1000)
    val ss = args.drop(1).headOption.map(_.toInt).getOrElse(200)
    val spark = SparkSession.builder().master("local[2]")
      .appName("graft-shard-growth")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.graft.manifest.shardSize", ss.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("shard_growth").toString + "/t"
    GeoTable.createEmpty(spark, root,
      spark.range(1).select($"id", lit("x").as("v")).schema, None)

    def stats(tag: String, c: Int): Unit = {
      val m = GeoManifest.read(spark, root)
      val shards = m.baseShards.length
      val files = m.files.length
      val optimal = math.max(1, (files + ss - 1) / ss)
      println(f"[shards] $tag%-10s commits=$c%5d files=$files%6d " +
        f"shards=$shards%4d optimal=$optimal%4d ratio=${shards.toDouble / optimal}%.2f")
    }

    // phase 1: 1k single-file appends (the worst metadata:data ratio)
    val t0 = System.nanoTime()
    for (c <- 1 to commits) {
      GeoTable.append(spark, root,
        spark.range(c * 10L, c * 10L + 10).select($"id", lit("x").as("v"))
          .coalesce(1))
      if (c % math.max(commits / 5, 1) == 0) stats("append", c)
    }
    val appendSec = (System.nanoTime() - t0) / 1e9
    println(f"[shards] append phase: $commits commits in $appendSec%.1f s " +
      f"(${appendSec * 1000 / commits}%.0f ms/commit)")

    // phase 2: delete-heavy — shrink files below the fold threshold so
    // shard reuse keeps breaking (the adversarial direction for folding)
    for (d <- 1 to 10) {
      GeoTable.delete(spark, root, expr(s"id % ${7 + d} = 0"), mode = "cow")
      stats("delete", commits + d)
    }
    val m = GeoManifest.read(spark, root)
    val ratio = m.baseShards.length.toDouble /
      math.max(1, (m.files.length + ss - 1) / ss)
    println(f"[shards] final ratio $ratio%.2f -> " +
      (if (ratio <= 5.0) "BOUNDED: folding keeps shard count O(table size); no rewrite_manifests needed"
       else "UNBOUNDED: a rewrite_manifests verb is warranted"))
    spark.stop()
  }
}
