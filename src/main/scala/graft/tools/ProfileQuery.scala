package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable.ArrayBuffer

/** Perf-diagnosis harness: run one SparkEntry query N times and print a
  * per-rep wall time plus the stage-level breakdown of slow reps —
  * separates "the plan is slow" from "a stage stalled" (GC, scheduler,
  * shuffle-fetch hiccups). Not part of the driver contract.
  *
  * usage: runMain graft.tools.ProfileQuery <queryName> [reps] [sfDir]
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("spatial_lof_grid")
    val reps = args.lift(1).map(_.toInt).getOrElse(6)
    val sfDir = args.lift(2).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class St(id: Int, nameStr: String, ms: Long, tasks: Int, gcMs: Long,
                  runMs: Long, deserMs: Long)
    val stages = ArrayBuffer.empty[St]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val wall = (for {a <- i.completionTime; b <- i.submissionTime} yield a - b).getOrElse(-1L)
        val m = i.taskMetrics
        val where = i.details.split('\n')
          .find(l => l.contains("graft") && !l.contains("ProfileQuery"))
          .getOrElse(i.name.takeWhile(_ != '\n')).trim.take(70)
        stages.synchronized {
          stages += St(i.stageId, where, wall, i.numTasks, m.jvmGCTime,
            m.executorRunTime, m.executorDeserializeTime)
        }
      }
    })

    graft.SparkEntry.prep(spark, sfDir)
    val fn = graft.SparkEntry.queries(name)
    for (rep <- 1 to reps) {
      stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      val snap = stages.synchronized(stages.toList)
      val totalStage = snap.map(_.ms).sum
      val totalGc = snap.map(_.gcMs).sum
      println(f"[rep $rep] wall=$sec%.2f s, ${snap.size} stages, " +
        f"stage-ms=$totalStage, task-gc-ms=$totalGc, " +
        f"sched-gap-ms=${(sec * 1000).toLong - totalStage}")
      val dumpAbove = sys.env.get("PROFILE_DUMP_ABOVE").map(_.toDouble).getOrElse(3.0)
      if (sec > dumpAbove)
        snap.sortBy(-_.ms).take(20).foreach(s =>
          println(f"    stage ${s.id}%4d ${s.ms}%6d ms ${s.tasks}%3d tasks gc=${s.gcMs}%5d run=${s.runMs}%5d deser=${s.deserMs}%5d  ${s.nameStr}"))
    }
    spark.stop()
  }
}
