package graft.tools

import graft.SparkEntry

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of a named query.
  * usage: runMain graft.tools.Explain <queryName> [sfDir] */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, dir)
    df.explain("formatted")
    spark.stop()
  }
}
