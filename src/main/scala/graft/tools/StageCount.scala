package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import java.util.concurrent.atomic.AtomicInteger

/** Perf-diagnosis harness: run a list of SparkEntry queries once each and
  * print `name jobs=J stages=S wall=W` — the deterministic structural
  * footprint (scheduler round-trips) that wall-clock noise cannot touch.
  * Not part of the driver contract.
  *
  * usage: runMain graft.tools.StageCount <q1,q2,...> [sfDir]
  */
object StageCount {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = args.lift(1).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stages = new AtomicInteger(0)
    val jobs = new AtomicInteger(0)
    val trace = sys.env.get("STAGE_TRACE").exists(_.toBoolean)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        if (trace) {
          val i = sc.stageInfo
          val where = i.details.split('\n')
            .find(l => l.contains("graft") && !l.contains("StageCount"))
            .getOrElse(i.name.takeWhile(_ != '\n')).trim.take(90)
          val wall = (for {a <- i.completionTime; b <- i.submissionTime} yield a - b).getOrElse(-1L)
          println(f"[trace] stage ${i.stageId}%4d ${wall}%5d ms ${i.numTasks}%3d tasks  $where")
        }
        stages.incrementAndGet(): Unit
      }
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet(): Unit
    })

    graft.SparkEntry.prep(spark, sfDir)
    names.foreach { name =>
      spark.catalog.clearCache()
      // settle the listener bus so a previous query's events don't bleed
      // in (no public flush — a short sleep is fine for a dev tool)
      Thread.sleep(400)
      stages.set(0); jobs.set(0)
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      Thread.sleep(400)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[stagecount] $name jobs=${jobs.get()} stages=${stages.get()} wall=$sec%.2f")
    }
    spark.stop()
  }
}
