package graft.tools

import graft.SparkEntry

import org.apache.spark.sql.SparkSession

import java.nio.file.{Files, Paths}

/** Dev tool: write the formatted physical plan of named queries to files
  * (the optimization-round evidence format: plans/r20/<query>_<tag>.txt).
  *
  * usage: runMain graft.tools.ExplainTo <tag> <query1,query2,...> [outDir] [sfDir]
  *
  * Queries that materialize internally (index workflows) record the plan
  * of the RETURNED frame; for those the interesting sub-plans are captured
  * separately where the optimization notes call for them.
  */
object ExplainTo {
  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val outDir = if (args.length > 2) args(2) else "plans/r20"
    val dir = if (args.length > 3) args(3) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val body = s"-- $name ($tag) @ $dir\n$plan"
      Files.write(Paths.get(outDir, s"${name}_$tag.txt"), body.getBytes("UTF-8"))
      println(s"[explainto] wrote $outDir/${name}_$tag.txt")
    }
    spark.stop()
  }
}
