package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

import scala.collection.mutable

/** Perf-diagnosis harness for the streaming queries: run each named
  * SparkEntry query once and aggregate the engine's own per-trigger
  * duration breakdown (`StreamingQueryProgress.durationMs`: addBatch /
  * getBatch / latestOffset / queryPlanning / walCommit / commitOffsets /
  * triggerExecution) plus the state-store operator metrics — the
  * "which fraction of a trigger is planning vs WAL vs state IO" answer
  * VERDICT r20 asks for before touching the micro-batch floor.
  * Diagnosis only; not part of the driver contract.
  *
  * usage: runMain graft.tools.StreamProfile <q1,q2,...> [sfDir]
  */
object StreamProfile {
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
    // A/B experiment channel: STREAM_PROFILE_CONF="k=v;k=v" applies session
    // confs before the queries run (e.g. a state-store provider candidate)
    sys.env.get("STREAM_PROFILE_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      println(s"[streamprofile] conf $k=$v")
      spark.conf.set(k.trim, v.trim)
    })

    // one listener for the whole session: the queries start/stop their own
    // StreamingQuery objects internally, so we key the collected progress
    // events by wall-clock window per named query
    case class Trig(batchId: Long, rows: Long, durations: Map[String, Long],
                    stateCommitMs: Long, stateRows: Long, stateMemory: Long)
    val trigs = mutable.ArrayBuffer.empty[Trig]
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val dur = p.durationMs
        import scala.jdk.CollectionConverters._
        val d = dur.asScala.map { case (k, v) => k -> v.longValue() }.toMap
        val (cm, sr, mem) = Option(p.stateOperators).map { ops =>
          (ops.map(_.commitTimeMs).sum, ops.map(_.numRowsTotal).sum,
            ops.map(_.memoryUsedBytes).sum)
        }.getOrElse((0L, 0L, 0L))
        trigs.synchronized { trigs += Trig(p.batchId, p.numInputRows, d, cm, sr, mem): Unit }
      }
    }
    spark.streams.addListener(listener)

    graft.SparkEntry.prep(spark, sfDir)
    names.foreach { name =>
      spark.catalog.clearCache()
      trigs.synchronized(trigs.clear())
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      // listener bus is async: give terminal progress events a beat
      Thread.sleep(500)
      val snap = trigs.synchronized(trigs.toVector)
      val keys = snap.flatMap(_.durations.keys).distinct.sorted
      println(f"[streamprofile] $name wall=$sec%.2f triggers=${snap.size} " +
        s"inputRows=${snap.map(_.rows).sum}")
      keys.foreach { k =>
        val vs = snap.map(_.durations.getOrElse(k, 0L))
        println(f"[streamprofile]   $k%-22s total=${vs.sum}%6d ms  per-trigger=${vs.mkString(" ")}")
      }
      println(f"[streamprofile]   stateCommitMs          total=${snap.map(_.stateCommitMs).sum}%6d ms  " +
        s"per-trigger=${snap.map(_.stateCommitMs).mkString(" ")}")
      println(s"[streamprofile]   stateRows=${snap.map(_.stateRows).mkString(" ")}  " +
        s"stateMemMB=${snap.map(t => t.stateMemory / 1024 / 1024).mkString(" ")}")
    }
    spark.stop()
  }
}
