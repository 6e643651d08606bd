package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every SparkEntry query once, after a warmup that
  * absorbs session/codegen/parquet-footer startup cost. Prints ONE JSON
  * line with per-query seconds.
  *
  * Hermetic-run discipline (round-4 lesson: BENCH_r04 recorded 5-10x
  * swings on unchanged queries from a contended sandbox + accumulated
  * state): the Dataset cache is cleared and a GC is requested between
  * queries so no query pays for — or benefits from — a predecessor's
  * blocks, and a contention sentinel re-times the first query at the end:
  * if the machine slowed >2x during the run, the whole file says so.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sentinelQuery = "q1_pricing"
    // second sentinel, JOIN-shaped (r18 lesson: q3_shipping moved +64%
    // with untouched code while the scan/agg sentinel barely moved —
    // compute-drift and fs-commit drift need separately measurable
    // floors). Same protocol: warmed double-time before, re-time after.
    val sentinel2Query = "q3_shipping"

    def hygiene(): Unit = {
      spark.catalog.clearCache()
      System.gc()
    }

    def timeOnce(name: String): Double = {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
          -1.0
      }
    }

    // warmup: session + view registration + one scan-heavy and one join query.
    // Guarded: a single table's schema drift must degrade queries one by one
    // inside timeOnce, never abort the whole bench before it starts.
    try {
      SparkEntry.prep(spark, sfDir)
      spark.sql("SELECT COUNT(*) FROM lineitem").collect()
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] warmup FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
    }
    val sentinelBefore = { timeOnce(sentinelQuery); timeOnce(sentinelQuery) }
    val sentinel2Before = { timeOnce(sentinel2Query); timeOnce(sentinel2Query) }

    // Focused mode for perf work: SPARK_GRAFT_BENCH_ONLY=a,b,c limits the
    // set; SPARK_GRAFT_BENCH_REPS=N times each query N times and prints
    // every rep to stderr (variance is the signal, min is the record).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val reps = sys.env.get("SPARK_GRAFT_BENCH_REPS").map { s =>
      require(scala.util.Try(s.trim.toInt).toOption.exists(_ >= 1),
        s"SPARK_GRAFT_BENCH_REPS must be a positive integer, got '$s'")
      s.trim.toInt
    }.getOrElse(2)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }

    val results = selected.map { case (name, _) =>
      hygiene()
      // min of N runs (default 2): steady-state cost, not first-run
      // codegen/compile. A crashing query records -1, never a fake fast time.
      val times = (1 to reps).map(_ => timeOnce(name))
      if (reps > 2) System.err.println(
        s"[bench] $name reps: ${times.map(t => f"$t%.2f").mkString(" ")}")
      name -> (if (times.contains(-1.0)) -1.0 else times.min)
    }

    // sentinel BEFORE the splits: the split runs (heavy index builds) are
    // not part of the timed query loop, so their load must not be able to
    // inflate drift and spuriously mark the whole record as contended
    hygiene()
    val sentinelAfter = timeOnce(sentinelQuery)
    val sentinel2After = timeOnce(sentinel2Query)

    // build/probe split for the index-backed ANN queries (full runs only):
    // probe-only wall is the user-facing latency the combined record masks
    val splits = if (only.isEmpty) SparkEntry.benchSplits.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        hygiene()
        val parts = try fn(spark, sfDir) catch {
          case e: Throwable =>
            System.err.println(s"[bench] split $name FAILED: ${e.getMessage}")
            Seq("error" -> -1.0)
        }
        name -> parts
    } else Seq.empty

    val drift = if (sentinelBefore > 0) sentinelAfter / sentinelBefore else -1.0
    val drift2 = if (sentinel2Before > 0) sentinel2After / sentinel2Before else -1.0
    val contended = drift > 2.0 || drift < 0 || drift2 > 2.0 || drift2 < 0

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.filter(_._2 < 0).map(_._1)
    val okTotal = results.map(_._2).filter(_ >= 0).sum
    val errs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val splitJson = splits.map { case (n, parts) =>
      "\"" + n + "\":" + parts.map { case (k, v) => "\"" + k + "\":" + v }
        .mkString("{", ",", "}")
    }.mkString("{", ",", "}")
    val json = s"""{"metric":"total","value":$okTotal,"unit":"sec","ok_total":$okTotal,"n_ok":${results.count(_._2 >= 0)},"n_queries":${results.size},"queries":$qs,"splits":$splitJson,"errors":$errs,"sentinel":{"query":"$sentinelQuery","before":$sentinelBefore,"after":$sentinelAfter,"drift":$drift,"contended":$contended},"sentinel2":{"query":"$sentinel2Query","before":$sentinel2Before,"after":$sentinel2After,"drift":$drift2},"sf":"$sfDir"}"""
    println(json)
    // Durable copies: stdout has been head-truncated by log capture before
    // (BENCH_r07's head was lost; BENCH_r13 kept only a 55-query tail
    // fragment), so the console line is NOT the artifact of record. Only a
    // FULL run (no ONLY filter) overwrites the durable files — a focused
    // perf session must never replace the complete record with a subset.
    // BENCH_full_latest.json lands at the repo root so the complete
    // per-query record is auditable even when the console JSON is cut.
    if (only.isEmpty) {
      def write(p: java.nio.file.Path): Unit =
        try {
          if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
          java.nio.file.Files.write(p, (json + "\n").getBytes("UTF-8")): Unit
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $p write failed: ${e.getMessage}") }
      write(java.nio.file.Paths.get("target", "bench.json"))
      write(java.nio.file.Paths.get("BENCH_full_latest.json"))
    } else System.err.println(
      "[bench] ONLY filter active: durable bench artifacts left untouched")
    spark.stop()
  }
}
