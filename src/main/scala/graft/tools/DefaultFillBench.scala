package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * Per-row cost of the column-DEFAULT write-side fill: a bulk
 * omitted-column INSERT (the analyzer fills CURRENT_DEFAULT constants
 * into the projection) vs the same INSERT spelling every column
 * explicitly, vs the same INSERT into a table with no defaults at all.
 * The fill is constant-folding at plan time — the expected per-row cost
 * is ~zero; this pins the number instead of asserting it.
 *
 * Usage: runMain graft.tools.DefaultFillBench [rows] [cores]
 */
object DefaultFillBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val cores = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master(s"local[$cores]")
      .appName("graft-default-fill-bench")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wh = java.nio.file.Files.createTempDirectory("df_bench").toString
    spark.conf.set("spark.sql.catalog.geodf", classOf[graft.tables.GeoCatalog].getName)
    spark.conf.set("spark.sql.catalog.geodf.warehouse", wh)
    spark.sql("CREATE NAMESPACE geodf.db")

    def run(tag: String, nDefaults: Int, omit: Boolean): Double = {
      spark.sql("DROP TABLE IF EXISTS geodf.db.t")
      spark.sql("CREATE TABLE geodf.db.t (id BIGINT, a BIGINT, s STRING) USING geo")
      if (nDefaults >= 1)
        spark.sql("ALTER TABLE geodf.db.t ADD COLUMN d1 BIGINT DEFAULT 7")
      if (nDefaults >= 2)
        spark.sql("ALTER TABLE geodf.db.t ADD COLUMN d2 STRING DEFAULT 'missing'")
      def insert(rows: Long): String =
        if (omit) // analyzer fills d1/d2 from CURRENT_DEFAULT
          s"INSERT INTO geodf.db.t (id, a, s) SELECT id, id % 97, concat('v', id) FROM range($rows)"
        else if (nDefaults >= 2)
          s"INSERT INTO geodf.db.t SELECT id, id % 97, concat('v', id), 7L, 'missing' FROM range($rows)"
        else
          s"INSERT INTO geodf.db.t SELECT id, id % 97, concat('v', id) FROM range($rows)"
      // warm once (codegen, table bootstrap), then measure
      spark.sql(insert(10000L))
      val t0 = System.nanoTime()
      spark.sql(insert(n))
      val w = (System.nanoTime() - t0) / 1e9
      println(f"[dfbench] $tag%-18s rows=$n%d wall=$w%.2f s (${n / w}%.0f rows/s)")
      w
    }
    // first sweep warms the JVM — only the second sweep's walls compare
    run("bare/warm", 0, omit = false)
    run("omit2/warm", 2, omit = true)
    run("explicit2/warm", 2, omit = false)
    val w0 = run("no defaults", 0, omit = false)
    val wOmit = run("2 filled (omit)", 2, omit = true)
    val wExpl = run("2 explicit", 2, omit = false)
    // order-flip rerun: write-path host I/O drifts across a sweep, so a
    // single omit-vs-explicit gap can be ordering, not cost
    val wOmit2 = run("omit (rerun)", 2, omit = true)
    val wExpl2 = run("explicit (rerun)", 2, omit = false)
    println(f"[dfbench] overhead vs bare: omitted-column fill " +
      f"${100 * (wOmit / w0 - 1)}%.1f%% / ${100 * (wOmit2 / w0 - 1)}%.1f%%, " +
      f"explicit values ${100 * (wExpl / w0 - 1)}%.1f%% / ${100 * (wExpl2 / w0 - 1)}%.1f%%")
    spark.stop()
  }
}
