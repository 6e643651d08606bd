package graft.tools

import graft.tables.{GeoChangelog, GeoManifest, GeoTable}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.streaming.ReadLimit
import org.apache.spark.sql.functions._

/**
 * Streaming admission-control measurement (dev harness): a table with a
 * deep append backlog, consumed under max-files/rows-per-micro-batch
 * caps. Two claims to verify at scale:
 *
 *  1. the admission walk is O(admitted versions) per trigger, NOT
 *     O(backlog) — catching up over V versions costs O(V) manifest
 *     reads TOTAL across all triggers, so deep backlogs do not make
 *     each trigger slower;
 *  2. capped catch-up delivers every row exactly once in bounded
 *     batches (the correctness half, also spec-pinned in
 *     GeoChangelogSpec — here it runs at a version depth the specs
 *     would be too slow for).
 *
 * Usage: runMain graft.tools.AdmitScale [versions] [rowsPerVersion]
 */
object AdmitScale {
  def main(args: Array[String]): Unit = {
    val versions = args.headOption.map(_.toInt).getOrElse(60)
    val rowsPer = args.lift(1).map(_.toInt).getOrElse(1000)
    val spark = SparkSession.builder().master("local[8]")
      .appName("graft-admit-scale")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val root = java.nio.file.Files.createTempDirectory("admit_scale").toString + "/t"
    GeoTable.create(spark, root,
      spark.range(0, rowsPer).selectExpr("id", "concat('v', id) AS v"), geomCol = None)
    for (i <- 1 until versions)
      GeoTable.append(spark, root,
        spark.range(i.toLong * rowsPer, (i + 1).toLong * rowsPer)
          .selectExpr("id", "concat('v', id) AS v"))
    val current = GeoManifest.currentVersion(spark, root).get
    println(s"backlog: $current versions x $rowsPer rows")

    // 1. per-trigger admission cost: walk the whole backlog in capped
    //    steps, timing each latestOffset-equivalent admit() call. The
    //    numbers should stay FLAT as the remaining backlog shrinks from
    //    `versions` to 1 — O(admitted), not O(remaining).
    for (cap <- Seq(1, 4, 16)) {
      var from = 0
      var triggers = 0
      var totalMs = 0.0
      var maxMs = 0.0
      // the per-stream parent memo: each version's header read is paid
      // once across the whole catch-up, as in GeoAdmissionControl
      val memo = scala.collection.mutable.Map.empty[Int, Int]
      val t0 = System.nanoTime()
      while (from < current) {
        val s = System.nanoTime()
        val end = GeoChangelog.admit(spark, root, from, current,
          ReadLimit.maxFiles(cap), countRemoved = false, memo)
        val ms = (System.nanoTime() - s) / 1e6
        totalMs += ms; maxMs = math.max(maxMs, ms)
        require(end > from, s"no progress at $from")
        from = end
        triggers += 1
      }
      val wall = (System.nanoTime() - t0) / 1e6
      println(f"cap=$cap%3d files/batch: $triggers%4d triggers, " +
        f"admit total ${totalMs}%7.1f ms (avg ${totalMs / triggers}%5.2f, " +
        f"max ${maxMs}%5.2f), wall ${wall}%7.1f ms")
    }

    // 2. end-to-end capped catch-up through the real stream: every row
    //    exactly once in bounded batches (the correctness half; the
    //    same contract GeoChangelogSpec pins at small depth)
    val dir = java.nio.file.Files.createTempDirectory("admit_wh").toString
    spark.conf.set("spark.sql.catalog.geoadm", classOf[graft.tables.GeoCatalog].getName)
    spark.conf.set("spark.sql.catalog.geoadm.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS geoadm.db")
    spark.sql("CREATE TABLE geoadm.db.t (id BIGINT, v STRING) USING geo")
    for (i <- 0 until versions)
      spark.sql(s"INSERT INTO geoadm.db.t SELECT id, concat('v', id) " +
        s"FROM range(${i.toLong * rowsPer}, ${(i + 1).toLong * rowsPer}, 1, 1)")
    val t1 = System.nanoTime()
    val q = spark.readStream
      .option("max-files-per-micro-batch", "4")
      .table("geoadm.db.t")
      .writeStream.format("memory").queryName("admit_catchup").start()
    q.processAllAvailable()
    val wall = (System.nanoTime() - t1) / 1e6
    val batches = q.recentProgress.count(_.numInputRows > 0)
    val rows = spark.table("admit_catchup").count()
    val distinct = spark.table("admit_catchup").select("id").distinct().count()
    q.stop()
    println(f"stream catch-up at cap=4: $batches batches, $rows rows " +
      f"($distinct distinct, expect ${versions.toLong * rowsPer}), wall ${wall}%7.1f ms")
    require(rows == versions.toLong * rowsPer && rows == distinct,
      "capped catch-up must deliver every row exactly once")
    spark.stop()
  }
}
