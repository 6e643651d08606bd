package graft.tools

import graft.tables.GeoCatalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/**
 * Scale evidence for storage-partitioned joins (dev harness): two
 * co-bucketed geo tables at millions of rows, the same equi-join timed
 * with SPJ on vs off. The claims being measured:
 *
 *  - the SPJ plan carries ZERO shuffle Exchange (asserted, not assumed);
 *  - wall time drops vs the shuffled plan — the delta IS the exchange
 *    cost, the fraction that grows with data volume and cluster fan-out
 *    (at 100 TB it is the dominant cost of a fact-fact join);
 *  - writer-side tuple rolling holds at volume: every file single-valued
 *    in the bucket transform.
 *
 * Usage: runMain graft.tools.SpjSweep [rowsLeft] [rowsRight] [buckets]
 */
object SpjSweep {
  def main(args: Array[String]): Unit = {
    val nL = args.lift(0).map(_.toLong).getOrElse(4000000L)
    val nR = args.lift(1).map(_.toLong).getOrElse(1000000L)
    val buckets = args.lift(2).map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder().master("local[16]")
      .appName("graft-spj-sweep")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val wh = java.nio.file.Files.createTempDirectory("spj_sweep_wh").toString
    spark.conf.set("spark.sql.catalog.spjs", classOf[GeoCatalog].getName)
    spark.conf.set("spark.sql.catalog.spjs.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS spjs.db")
    spark.sql(s"CREATE TABLE spjs.db.fact (id BIGINT, v BIGINT) USING geo " +
      s"PARTITIONED BY (bucket($buckets, id))")
    spark.sql(s"CREATE TABLE spjs.db.dim (id BIGINT, w BIGINT) USING geo " +
      s"PARTITIONED BY (bucket($buckets, id))")
    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime(); val a = body
      println(f"$label%-38s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); a
    }
    time(s"insert fact ($nL rows)") {
      spark.sql(s"INSERT INTO spjs.db.fact SELECT id, id * 7 FROM range(0, $nL)") }
    time(s"insert dim ($nR rows)") {
      spark.sql(s"INSERT INTO spjs.db.dim SELECT id * 4, id FROM range(0, $nR)") }
    val m = graft.tables.GeoManifest.read(spark, s"$wh/db/fact")
    val live = m.files.filter(_.rows > 0)
    val single = live.forall(f => f.pstats.nonEmpty && f.pstats.head._1 == f.pstats.head._2)
    println(s"fact files=${live.length} single-valued=$single " +
      s"rows/file=${live.map(_.rows).sum / math.max(live.length, 1)}")

    val q = """SELECT SUM(f.v + d.w) AS s FROM spjs.db.fact f
               JOIN spjs.db.dim d ON f.id = d.id"""
    def shuffleCount(): Int = {
      val df = spark.sql(q)
      df.collect()
      val plan = df.queryExecution.executedPlan
      def walk(n: org.apache.spark.sql.execution.SparkPlan): Int = n match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(qs.plan)
        case s: ShuffleExchangeExec => 1 + s.children.map(walk).sum
        case other => other.children.map(walk).sum
      }
      walk(plan)
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // warmup both paths once (codegen), then timed reps
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
    shuffleCount()
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    shuffleCount()
    for (rep <- 1 to 3) {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      val exOff = time(s"[rep $rep] shuffled join")(shuffleCount())
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      val exOn = time(s"[rep $rep] storage-partitioned join")(shuffleCount())
      println(s"         exchanges: shuffled=$exOff spj=$exOn")
      // the global SUM keeps its one single-partition gather; the JOIN's
      // exchanges (both sides in the shuffled plan) must be gone
      require(exOn <= 1 && exOn < exOff,
        s"SPJ must remove the join exchanges: spj=$exOn shuffled=$exOff")
    }

    // ------------------------------------------------------------------
    // SKEW scenario: KeyGroupedPartitioning pins one Spark partition per
    // partition value, so AQE's skew-join splitting (which operates on
    // shuffle blocks) cannot rebalance an SPJ join. Build one bucket
    // ~10x the others (hot key 0 absorbs ~28% of rows) and measure:
    //  (a) shuffled join, AQE skew splitting available;
    //  (b) plain SPJ — the hot bucket is one straggler task;
    //  (c) SPJ + partiallyClusteredDistribution — Spark 4.1's mitigation:
    //      the non-skewed side replicates across the skewed side's
    //      SPLITS, so the hot bucket fans out without a shuffle.
    // ------------------------------------------------------------------
    println("--- skew: one bucket ~10x (hot key 0) ---")
    spark.sql(s"CREATE TABLE spjs.db.fact_sk (id BIGINT, v BIGINT) USING geo " +
      s"PARTITIONED BY (bucket($buckets, id))")
    spark.sql(s"CREATE TABLE spjs.db.dim_sk (id BIGINT, w BIGINT) USING geo " +
      s"PARTITIONED BY (bucket($buckets, id))")
    val hot = nL * 28 / 100
    time(s"insert fact_sk ($nL rows, $hot on key 0)") {
      spark.sql(s"INSERT INTO spjs.db.fact_sk " +
        s"SELECT CASE WHEN id < $hot THEN 0 ELSE id END, id * 7 FROM range(0, $nL)") }
    time(s"insert dim_sk ($nR rows)") {
      spark.sql(s"INSERT INTO spjs.db.dim_sk SELECT id * 4, id FROM range(0, $nR)") }
    val qSk = """SELECT SUM(f.v + d.w) AS s FROM spjs.db.fact_sk f
                 JOIN spjs.db.dim_sk d ON f.id = d.id"""
    def runSk(): Long = { val r = spark.sql(qSk).head.getLong(0); r }
    val expected = runSk() // warm + reference under current confs
    for (rep <- 1 to 3) {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      spark.conf.set("spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled", "false")
      time(s"[skew $rep] shuffled + AQE skew-split") {
        require(runSk() == expected) }
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      time(s"[skew $rep] SPJ (hot bucket = one task)") {
        require(runSk() == expected) }
      spark.conf.set("spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled", "true")
      time(s"[skew $rep] SPJ + partiallyClustered") {
        require(runSk() == expected) }
      spark.conf.set("spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled", "false")
    }
    spark.stop()
  }
}
