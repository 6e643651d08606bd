package graft.tools

import graft.SparkEntry

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

import java.nio.file.{Files, Paths}

/** Dev tool: run named queries and write EVERY executed physical plan
  * (incl. internal actions a query materializes behind localCheckpoint —
  * the window/distinct/join shapes ExplainTo's returned-frame dump can't
  * see) to `plans/<outDir>/<query>_<tag>_exec.txt`, in execution order.
  * Evidence format for optimization rounds; not part of the driver
  * contract.
  *
  * usage: runMain graft.tools.ExecPlans <tag> <q1,q2,...> [outDir] [sfDir]
  */
object ExecPlans {
  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val outDir = if (args.length > 2) args(2) else "plans/r21"
    val dir = if (args.length > 3) args(3) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))

    val plans = new scala.collection.mutable.ArrayBuffer[String]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit = plans.synchronized {
        plans += s"== action: $funcName ==\n" + qe.executedPlan.toString: Unit
      }
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)

    SparkEntry.prep(spark, dir)
    names.foreach { name =>
      plans.synchronized(plans.clear())
      SparkEntry.queries(name)(spark, dir).count()
      Thread.sleep(800) // listener bus is async
      val body = plans.synchronized(plans.toVector)
        .zipWithIndex.map { case (p, i) => s"---- executed plan $i ----\n$p" }
        .mkString(s"-- $name ($tag, all executed plans) @ $dir\n", "\n\n", "\n")
      Files.write(Paths.get(outDir, s"${name}_${tag}_exec.txt"),
        body.getBytes("UTF-8"))
      println(s"[execplans] wrote $outDir/${name}_${tag}_exec.txt " +
        s"(${plans.size} plans)")
    }
    spark.stop()
  }
}
