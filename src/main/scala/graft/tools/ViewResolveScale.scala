package graft.tools

import graft.tables.GeoCatalog

import org.apache.spark.sql.SparkSession

/**
 * Analyzer-cost measurement for the injected view-resolution rule: a plan
 * referencing ~50 distinct geo views (each over its own table) exercises
 * the rule across every analyzer fixpoint iteration. The 30 s existence
 * memo should make every analysis after the first touch flat — without
 * it, each fixpoint iteration would re-probe the store per candidate
 * name, and a 50-relation plan would cost hundreds of filesystem HEADs
 * per analysis.
 *
 * Output: cold (first) analysis wall, then per-iteration walls for 20
 * repeated analyses of the same 50-view UNION — expect the tail flat at
 * single-digit ms-per-view or better.
 *
 * Usage: runMain graft.tools.ViewResolveScale [views] [iters]
 */
object ViewResolveScale {
  def main(args: Array[String]): Unit = {
    val nViews = args.headOption.map(_.toInt).getOrElse(50)
    val iters = args.drop(1).headOption.map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder().master("local[4]")
      .appName("graft-view-resolve-scale")
      .config("spark.sql.extensions", "graft.extension.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val wh = java.nio.file.Files.createTempDirectory("view_scale_wh").toString
    spark.conf.set("spark.sql.catalog.geovs", classOf[GeoCatalog].getName)
    spark.conf.set("spark.sql.catalog.geovs.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS geovs.db")

    val t0 = System.nanoTime()
    for (i <- 0 until nViews) {
      spark.sql(s"CREATE TABLE geovs.db.t$i (id BIGINT, v STRING) USING geo")
      spark.sql(s"CREATE VIEW geovs.db.v$i AS " +
        s"SELECT id, v FROM geovs.db.t$i WHERE id >= $i")
    }
    println(f"[views] created $nViews tables+views in ${(System.nanoTime() - t0) / 1e9}%.1f s")

    val union = (0 until nViews)
      .map(i => s"SELECT id FROM geovs.db.v$i").mkString(" UNION ALL ")
    def analyzeOnce(): Double = {
      val t = System.nanoTime()
      spark.sql(union).queryExecution.analyzed
      (System.nanoTime() - t) / 1e9
    }
    println(f"[views] cold analysis (first touch, memo empty): ${analyzeOnce()}%.3f s")
    val walls = (1 to iters).map(_ => analyzeOnce())
    println(f"[views] warm analyses x$iters: min=${walls.min * 1000}%.0f ms " +
      f"median=${walls.sorted.apply(iters / 2) * 1000}%.0f ms max=${walls.max * 1000}%.0f ms " +
      f"(${walls.sorted.apply(iters / 2) * 1000 / nViews}%.1f ms/view median)")
    spark.stop()
  }
}
