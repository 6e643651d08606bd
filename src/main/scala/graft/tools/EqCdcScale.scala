package graft.tools

import graft.tables.{GeoManifest, GeoTable}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Scale sweep for the keyed write paths + CDC over equality-delete
 * commits (dev harness, 10M+ rows): the claims being measured are
 *
 *  - `deleteByKey` / `upsertByKey` commit in O(keys)/O(rows-appended),
 *    independent of table size;
 *  - a changelog range CROSSING an eq-delete commit emits exactly the
 *    matched rows, planning cost bounded by the matched-row count (the
 *    `maxLiveDeleteRows` cap), not by the table;
 *  - reading through a live eq sidecar and folding it away stay flat
 *    per-file.
 *
 * Usage: runMain graft.tools.EqCdcScale [rowsPerStep...]
 */
object EqCdcScale {
  def main(args: Array[String]): Unit = {
    val steps = if (args.nonEmpty) args.map(_.toLong).toSeq
                else Seq(4000000L, 12000000L)
    val spark = SparkSession.builder().master("local[8]")
      .appName("graft-eqcdc-scale")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = body; (a, (System.nanoTime() - t0) / 1e9)
    }

    println(f"${"rows"}%10s ${"files"}%6s ${"eqDel(s)"}%9s ${"upsert(s)"}%10s " +
      f"${"cdcDel(s)"}%10s ${"cdcUps(s)"}%10s ${"net(s)"}%7s ${"read(s)"}%8s ${"fold(s)"}%8s")
    steps.foreach { n =>
      val root = java.nio.file.Files.createTempDirectory("eqcdc").toString + "/t"
      // v0: n rows over 16 files
      GeoTable.create(spark, root,
        spark.range(n).select(col("id"),
          concat(lit("v"), col("id")).as("v")).repartition(16), None)
      val keys = spark.range(1000).select((col("id") * (n / 1000)).as("id"))
        .localCheckpoint()

      // v1: keyed delete — O(keys) commit
      val (_, tEqDel) = time(GeoTable.deleteByKey(spark, root, Seq("id"), keys))
      // v2: keyed upsert of 1000 fresh rows — O(rows) commit
      val ups = keys.select(col("id"), concat(lit("u"), col("id")).as("v"))
      val (_, tUpsert) = time(GeoTable.upsertByKey(spark, root, Seq("id"), ups))

      // CDC ranges crossing the eq commits: the delete leg must emit the
      // 1000 matched rows (driver planning bounded by maxLiveDeleteRows)
      val ((delRows, insRows), tCdcDel) = time {
        val ch = GeoTable.changes(spark, root, 0, 1)
        val d = ch.where(col("_change_type") === "delete").count()
        val i = ch.where(col("_change_type") === "insert").count()
        (d, i)
      }
      val (upsCounts, tCdcUps) = time {
        val ch = GeoTable.changes(spark, root, 1, 2)
        (ch.where(col("_change_type") === "delete").count(),
          ch.where(col("_change_type") === "insert").count())
      }
      val (netRows, tNet) = time(GeoTable.netChanges(spark, root, 0, 2).count())
      val (readRows, tRead) = time(GeoTable.read(spark, root).count())
      val (_, tFold) = time(GeoTable.foldSidecars(spark, root))

      val files = GeoManifest.read(spark, root).files.length
      println(f"$n%10d $files%6d $tEqDel%9.2f $tUpsert%10.2f " +
        f"$tCdcDel%10.2f $tCdcUps%10.2f $tNet%7.2f $tRead%8.2f $tFold%8.2f")
      println(s"           cdc(0,1)=del:$delRows/ins:$insRows " +
        s"cdc(1,2)=del:${upsCounts._1}/ins:${upsCounts._2} " +
        s"net(0,2)=$netRows read=$readRows (expect del:1000, ins:1000, read=$n)")

      // RANGE-LOCAL scenario (manifest key ranges, r14): same table size,
      // stats transform on id + keys clustered in the last 0.1% of the id
      // space. The sidecar's recorded kmin/kmax must exempt every file
      // whose id range misses it, so read and fold costs follow the
      // DELETE's locality, not the table — the column to watch is
      // loc-fold(s) staying flat as n grows.
      val rootL = java.nio.file.Files.createTempDirectory("eqcdcL").toString + "/t"
      GeoTable.create(spark, rootL,
        spark.range(n).select(col("id"),
          concat(lit("v"), col("id")).as("v")).repartitionByRange(16, col("id")), None,
        partitions = Seq(graft.tables.GeoPartition.PTransform("stats", 0, "id")))
      val localKeys = spark.range(1000).select((lit(n - 1000) + col("id")).as("id"))
        .localCheckpoint()
      val (_, tEqDelL) = time(GeoTable.deleteByKey(spark, rootL, Seq("id"), localKeys))
      val (readL, tReadL) = time(GeoTable.read(spark, rootL).count())
      val (_, tFoldL) = time(GeoTable.foldSidecars(spark, rootL))
      val mL = GeoManifest.read(spark, rootL)
      println(f"           range-local: eqDel=$tEqDelL%.2f read=$tReadL%.2f " +
        f"loc-fold=$tFoldL%.2f read-rows=$readL (expect ${n - 1000}) " +
        f"files=${mL.files.length}")

      // COMPOSITE-KEY scenario (full-tuple key ranges, r15): the
      // realistic CDC shape keys on (tenant, id) where the table is
      // clustered by TENANT and ids interleave across every file — the
      // leading (id) bound exempts nothing, all exemption must come from
      // the SECOND column's range. Watch comp-fold(s) stay flat with n:
      // only the one tenant-run of files rewrites.
      val rootC = java.nio.file.Files.createTempDirectory("eqcdcC").toString + "/t"
      GeoTable.create(spark, rootC,
        spark.range(n).select(col("id"), (col("id") % 16).as("tenant"),
          concat(lit("v"), col("id")).as("v")).repartitionByRange(16, col("tenant")), None,
        partitions = Seq(graft.tables.GeoPartition.PTransform("stats", 0, "id"),
          graft.tables.GeoPartition.PTransform("stats", 0, "tenant")))
      // 1000 keys spread over the FULL id space, all in tenant 7
      val compKeys = spark.range(1000)
        .select((col("id") * (n / 1000) - (col("id") * (n / 1000)) % 16 + 7).as("id"))
        .select(col("id"), lit(7L).as("tenant")).localCheckpoint()
      val (_, tEqDelC) = time(GeoTable.deleteByKey(spark, rootC, Seq("id", "tenant"), compKeys))
      val mC0 = GeoManifest.read(spark, rootC)
      val exemptC = mC0.eqDeletes.headOption
        .map(e => mC0.files.count(f => !mC0.eqApplies(e, f))).getOrElse(-1)
      val (readC, tReadC) = time(GeoTable.read(spark, rootC).count())
      val (_, tFoldC) = time(GeoTable.foldSidecars(spark, rootC))
      println(f"           composite-key: eqDel=$tEqDelC%.2f read=$tReadC%.2f " +
        f"comp-fold=$tFoldC%.2f read-rows=$readC exempt-files=$exemptC/" +
        f"${mC0.files.length} (exemption via tenant range only)")
    }
    spark.stop()
  }
}
