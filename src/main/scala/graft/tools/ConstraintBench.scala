package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * Per-row cost of CHECK-constraint enforcement in the shared writer: the
 * same bulk INSERT into a bare table vs one carrying 1 and 3 constraints.
 * The check is one compiled UnsafeProjection evaluation per row, so the
 * expected shape is a few percent on a write-bound stage — this pins the
 * number instead of asserting it.
 *
 * Usage: runMain graft.tools.ConstraintBench [rows] [cores]
 */
object ConstraintBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val cores = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master(s"local[$cores]")
      .appName("graft-constraint-bench")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wh = java.nio.file.Files.createTempDirectory("ck_bench").toString
    spark.conf.set("spark.sql.catalog.geocb", classOf[graft.tables.GeoCatalog].getName)
    spark.conf.set("spark.sql.catalog.geocb.warehouse", wh)
    spark.sql("CREATE NAMESPACE geocb.db")

    def run(tag: String, constraints: Seq[String]): Double = {
      spark.sql("DROP TABLE IF EXISTS geocb.db.t")
      spark.sql("CREATE TABLE geocb.db.t (id BIGINT, a BIGINT, s STRING) USING geo")
      constraints.zipWithIndex.foreach { case (c, i) =>
        graft.tables.GeoSql.exec(spark,
          s"ALTER TABLE geocb.db.t ADD CONSTRAINT c$i CHECK ($c)")
      }
      // warm once (codegen, table bootstrap), then measure
      spark.sql(s"INSERT INTO geocb.db.t SELECT id, id % 97, concat('v', id) FROM range(10000)")
      val t0 = System.nanoTime()
      spark.sql(s"INSERT INTO geocb.db.t SELECT id, id % 97, concat('v', id) FROM range($n)")
      val w = (System.nanoTime() - t0) / 1e9
      println(f"[ckbench] $tag%-14s rows=$n%d wall=$w%.2f s (${n / w}%.0f rows/s)")
      w
    }
    // first sweep warms the JVM (JIT, codegen cache, fs) — only the
    // second sweep's walls are comparable
    run("bare/warm", Seq.empty)
    run("1/warm", Seq("a >= 0"))
    run("3/warm", Seq("a >= 0", "id >= 0", "length(s) > 0"))
    val w0 = run("bare", Seq.empty)
    val w1 = run("1 constraint", Seq("a >= 0"))
    val w3 = run("3 constraints", Seq("a >= 0", "id >= 0", "length(s) > 0"))
    println(f"[ckbench] overhead: 1 check ${100 * (w1 / w0 - 1)}%.1f%%, " +
      f"3 checks ${100 * (w3 / w0 - 1)}%.1f%%")
    spark.stop()
  }
}
