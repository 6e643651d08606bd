package graft.tools

import graft.tables.{GeoCatalog, GeoManifest}

import org.apache.spark.sql.SparkSession

/**
 * Bloom-filter file-skipping scale measurement (dev harness). Two claims
 * to put numbers on:
 *
 *  1. WRITE: the per-commit bloom build is O(changed files) — an append
 *     of F files costs one column-pruned pass over those F files,
 *     independent of table size.
 *  2. READ: a point lookup on a column the layout does not cluster by
 *     scans ~(matched + fpp·files) files with blooms vs ALL files
 *     without — the wall-clock gap grows with table size while the
 *     bloom probe stays flat.
 *
 * Usage: runMain graft.tools.BloomScale [rowsPerStep...]
 */
object BloomScale {
  def main(args: Array[String]): Unit = {
    val steps = if (args.nonEmpty) args.map(_.toLong).toSeq
                else Seq(500000L, 2000000L, 8000000L)
    val spark = SparkSession.builder().master("local[8]")
      .appName("graft-bloom-scale")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wh = java.nio.file.Files.createTempDirectory("bloomscale_wh").toString
    spark.conf.set("spark.sql.catalog.gbs", classOf[GeoCatalog].getName)
    spark.conf.set("spark.sql.catalog.gbs.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gbs.db")

    def time[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = body; (a, (System.nanoTime() - t0) / 1e9)
    }

    println(f"${"rows"}%10s ${"files"}%6s ${"ins+bloom"}%10s ${"insPlain"}%9s " +
      f"${"appendF1"}%9s ${"lookupB(s)"}%11s ${"lookupP(s)"}%11s ${"scanB"}%6s ${"scanP"}%6s " +
      f"${"scanD"}%6s ${"lookD(s)"}%9s ${"sidecarKB"}%10s")
    steps.zipWithIndex.foreach { case (n, step) =>
      // grp interleaves ids across every bucket file: min/max never
      // prunes the id probes, only the bloom can
      def mk(name: String, bloom: Boolean): String = {
        spark.sql(s"DROP TABLE IF EXISTS gbs.db.$name")
        val props = if (bloom) " TBLPROPERTIES('bloom.columns'='id')" else ""
        spark.sql(s"CREATE TABLE gbs.db.$name (grp BIGINT, id BIGINT, pad STRING) " +
          s"USING geo PARTITIONED BY (bucket(8, grp))$props")
        name
      }
      val ins = s"SELECT id % 64 AS grp, id, repeat('x', 32) AS pad FROM range(0, $n)"
      val tb = mk(s"b$step", bloom = true)
      val (_, tInsB) = time(spark.sql(s"INSERT INTO gbs.db.$tb $ins"))
      val tp = mk(s"p$step", bloom = false)
      val (_, tInsP) = time(spark.sql(s"INSERT INTO gbs.db.$tp $ins"))
      // O(changed files): a one-row append's bloom cost must not grow
      // with the table
      val (_, tApp) = time(spark.sql(
        s"INSERT INTO gbs.db.$tb SELECT 999, $n + 1, 'y'"))
      // probes in ONE grp class (step 64 = the grp modulus): the matches
      // live in one bucket file, so skipping is possible at all — spread
      // probes would genuinely hit every file and no index could help
      val probe = (0 until 8).map(i => n / 2 + i * 64).mkString(", ")
      def lookup(t: String): Double = {
        // steady state: min of 3 (footer/codegen warmup dominates rep 1)
        (1 to 3).map { _ =>
          val (_, s) = time(
            spark.sql(s"SELECT COUNT(*) FROM gbs.db.$t WHERE id IN ($probe)").collect())
          s
        }.min
      }
      val lb = lookup(tb)
      val lp = lookup(tp)
      // the honest signal at small file counts: FILES OPENED (wall is
      // footer-dominated when both sides touch only a handful of files)
      def scanned(t: String): Int = {
        val df = spark.sql(s"SELECT COUNT(*) FROM gbs.db.$t WHERE id IN ($probe)")
        df.collect()
        val scans = graft.tables.GeoCowScan.collectIn(df.queryExecution.executedPlan)
        require(scans.nonEmpty, s"no GeoCowScan in:\n${df.queryExecution.executedPlan}")
        scans.map(_.scannedFiles.count(_.rows > 0)).min
      }
      // distributed probe (the >maxProbeFiles path): same skipping, the
      // blooms just never materialize on the driver
      spark.conf.set("spark.graft.bloom.maxProbeFiles", "2")
      val (sDist, lDist) = try (scanned(tb), lookup(tb))
        finally spark.conf.unset("spark.graft.bloom.maxProbeFiles")
      val m = GeoManifest.read(spark, s"$wh/db/$tb")
      val fs = GeoManifest.fs(spark, s"$wh/db/$tb")
      val kb = m.blooms.map(b =>
        fs.getFileStatus(new org.apache.hadoop.fs.Path(b.path)).getLen).sum / 1024
      println(f"$n%10d ${m.files.count(_.rows > 0)}%6d $tInsB%10.2f $tInsP%9.2f " +
        f"$tApp%9.2f $lb%11.3f $lp%11.3f ${scanned(tb)}%6d ${scanned(tp)}%6d " +
        f"$sDist%6d $lDist%9.3f $kb%10d")
    }
    spark.stop()
  }
}
