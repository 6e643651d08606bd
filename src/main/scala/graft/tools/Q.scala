package graft.tools

import graft.SparkEntry

import org.apache.spark.sql.SparkSession

/** Dev: run one named SparkEntry query with timing (+ optional explain).
  * Usage: runMain graft.tools.Q <name> [sfDir] [explain|noexplain] [iters]
  */
object Q {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val doExplain = args.length > 2 && args(2) == "explain"
    val iters = if (args.length > 3) args(3).toInt else 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.prep(spark, dir)
    spark.sql("SELECT COUNT(*) FROM lineitem").collect()

    val fn = SparkEntry.queries(name)
    if (doExplain) fn(spark, dir).explain("formatted")
    (1 to iters).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      println(f"[$name] iter $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    spark.stop()
  }
}
