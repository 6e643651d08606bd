package graft

import graft.tables.{GeoCatalog, GeoManifest, GeoRowLevel}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Runtime file pruning on plain catalog reads (Iceberg runtime-filtering
 * / dynamic-partition-pruning analog): the scan advertises the partition
 * transforms' source columns through `SupportsRuntimeV2Filtering`, so a
 * join against a selectively-filtered dimension hands the scan the
 * matching join-key values at EXECUTION time — and the scan keeps only
 * the files whose per-transform ranges can hold them. A star-schema join
 * on a 100 TB fact table then reads the files the dim filter selects,
 * not the table.
 */
class GeoRuntimePruneSpec extends SparkSpec {
  import spark.implicits._

  private lazy val warehouse: String = {
    val dir = java.nio.file.Files.createTempDirectory("geo_dpp_wh").toString
    spark.conf.set("spark.sql.catalog.geodpp", classOf[GeoCatalog].getName)
    spark.conf.set("spark.sql.catalog.geodpp.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS geodpp.db")
    dir
  }

  /** The GeoCowScans in the final (adaptive) executed plan. */
  private def geoScans(df: DataFrame): Seq[graft.tables.GeoCowScan] =
    graft.tables.GeoCowScan.collectIn(df.queryExecution.executedPlan)

  test("a selective dim filter prunes fact files at runtime") {
    warehouse
    spark.sql("CREATE TABLE geodpp.db.fact (k BIGINT, v STRING) USING geo " +
      "PARTITIONED BY (k)")
    spark.sql("INSERT INTO geodpp.db.fact SELECT id % 5, concat('v', id) " +
      "FROM range(0, 10000)")
    val m = GeoManifest.read(spark, s"$warehouse/db/fact")
    val total = m.files.count(_.rows > 0)
    assert(total >= 3, s"need several range-clustered files, got $total")
    // the dim must be a REAL scan with a Filter above it (a LocalRelation
    // constant-folds the predicate away and DPP sees no selective filter)
    val dimDir = java.nio.file.Files.createTempDirectory("geo_dpp_dim").toString
    Seq((0L, "zero"), (1L, "one"), (2L, "two"), (3L, "three"), (4L, "four"))
      .toDF("k", "name").write.mode("overwrite").parquet(dimDir)
    spark.read.parquet(dimDir).createOrReplaceTempView("dpp_dim")

    val j = spark.sql("""
      SELECT f.k, count(*) AS n FROM geodpp.db.fact f
      JOIN dpp_dim d ON f.k = d.k WHERE d.name = 'two' GROUP BY f.k""")
    val out = j.collect()
    assert(out.toSeq.map(r => (r.getLong(0), r.getLong(1))) == Seq((2L, 2000L)))
    // the runtime filter must have narrowed the scan below the full list
    val scans = geoScans(j)
    assert(scans.nonEmpty, s"no GeoCowScan in:\n${j.queryExecution.executedPlan}")
    val scanned = scans.map(_.scannedFiles.count(_.rows > 0)).min
    assert(scanned < total,
      s"runtime filter did not prune: scanned $scanned of $total files\n" +
        j.queryExecution.executedPlan)
    // and the plan carries the dynamic-pruning subquery
    assert(j.queryExecution.executedPlan.toString.contains("dynamicpruning"),
      s"no dynamic pruning in:\n${j.queryExecution.executedPlan}")
  }

  test("runtime pruning never fires on columns pruned from the scan output") {
    warehouse
    // join on a NON-partition column: filterAttributes must only report
    // columns surviving pruning, so planning cannot trip on a missing ref
    spark.sql("CREATE TABLE geodpp.db.f2 (k BIGINT, other BIGINT) USING geo " +
      "PARTITIONED BY (k)")
    spark.sql("INSERT INTO geodpp.db.f2 SELECT id % 5, id % 7 FROM range(0, 1000)")
    Seq((1L, "a"), (2L, "b")).toDF("other", "tag").createOrReplaceTempView("dpp_dim2")
    val j = spark.sql("""
      SELECT count(*) AS n FROM (SELECT other FROM geodpp.db.f2) f
      JOIN dpp_dim2 d ON f.other = d.other WHERE d.tag = 'a'""")
    assert(j.head().getLong(0) == 143L)
  }

  test("runtime pruning composes with storage-partitioned joins") {
    warehouse
    // both sides co-partitioned on the join key AND the dim carries a
    // selective filter: the join plans with ZERO shuffle Exchange (SPJ)
    // while the runtime filter still narrows the fact scan's file list —
    // the two 100 TB levers stack
    spark.conf.set("spark.graft.write.rollMinRows", "1")
    try {
      // the fact side must be LARGE relative to the dim or the optimizer
      // marks the pruning subquery broadcast-only (benefit heuristic:
      // dimSize < factSize * fallbackFilterRatio)
      spark.sql("CREATE TABLE geodpp.db.fs (k BIGINT, v STRING) USING geo " +
        "PARTITIONED BY (k)")
      spark.sql("INSERT INTO geodpp.db.fs SELECT id % 5, repeat('v', 64) FROM range(0, 50000)")
      spark.sql("CREATE TABLE geodpp.db.ds (k BIGINT, name STRING) USING geo " +
        "PARTITIONED BY (k)")
      spark.sql("INSERT INTO geodpp.db.ds SELECT id, concat('n', id) FROM range(0, 5)")
    } finally spark.conf.unset("spark.graft.write.rollMinRows")
    val totalFact = GeoManifest.read(spark, s"$warehouse/db/fs").files.count(_.rows > 0)
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      // the SPJ join is a sort-merge join (broadcast disabled), so
      // broadcast-reuse-only DPP would never fire — allow the pruning
      // subquery to run on its own...
      "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly" -> "false",
      // the benefit heuristic compares the dim subquery's size against
      // factScanBytes * ratio — after column pruning the k-only fact
      // scan estimate is tiny at test scale, so pin the ratio up (at
      // real scale the fact side dwarfs any dim and the default holds)
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio" -> "1000",
      // ...and plan non-adaptively: AQE's PlanAdaptiveDynamicPruningFilters
      // degrades a non-reusable pruning subquery to `true` (observed on
      // 4.1.2), while the non-adaptive planner executes it. A Spark
      // planning limitation, not a scan one — under AQE the join still
      // runs exchange-free, it just reads all fact files.
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val old = confs.map { case (c, _) => c -> scala.util.Try(spark.conf.get(c)).toOption }
    confs.foreach { case (c, v) => spark.conf.set(c, v) }
    try {
      val j = spark.sql("""
        SELECT f.k, count(*) AS n FROM geodpp.db.fs f
        JOIN geodpp.db.ds d ON f.k = d.k WHERE d.name = 'n3' GROUP BY f.k""")
      assert(j.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((3L, 10000L)))
      // SPJ: zero Exchange under the join in the static plan
      val p0 = j.queryExecution.sparkPlan
      val smjs = p0.collect {
        case s: org.apache.spark.sql.execution.joins.SortMergeJoinExec => s }
      assert(smjs.nonEmpty, s"expected SMJ:\n$p0")
      assert(smjs.forall(_.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }.isEmpty), s"SPJ side must be exchange-free:\n$p0")
      // DPP: the fact scan narrowed below the full file list at runtime
      val factScan = geoScans(j).filter(_.scannedFiles.exists(_.rows >= 500))
      assert(factScan.nonEmpty)
      assert(factScan.map(_.scannedFiles.count(_.rows > 0)).min < totalFact,
        s"runtime filter did not narrow the fact side of the SPJ join:\n" +
          j.queryExecution.executedPlan)
    } finally old.foreach {
      case (c, Some(v)) => spark.conf.set(c, v)
      case (c, None) => spark.conf.unset(c)
    }
  }

  test("bucket transforms prune by derived hash values") {
    warehouse
    spark.sql("CREATE TABLE geodpp.db.fb (id BIGINT, v STRING) USING geo " +
      "PARTITIONED BY (bucket(4, id))")
    spark.conf.set("spark.graft.write.rollMinRows", "1")
    try spark.sql("INSERT INTO geodpp.db.fb SELECT id, concat('v', id) FROM range(0, 8000)")
    finally spark.conf.unset("spark.graft.write.rollMinRows")
    val total = GeoManifest.read(spark, s"$warehouse/db/fb").files.count(_.rows > 0)
    val dimDir3 = java.nio.file.Files.createTempDirectory("geo_dpp_dim3").toString
    Seq((77L, "yes"), (78L, "no")).toDF("id", "tag")
      .write.mode("overwrite").parquet(dimDir3)
    spark.read.parquet(dimDir3).createOrReplaceTempView("dpp_dim3")
    val j = spark.sql("""
      SELECT f.id, f.v FROM geodpp.db.fb f
      JOIN dpp_dim3 d ON f.id = d.id WHERE d.tag = 'yes'""")
    assert(j.collect().map(_.getLong(0)).toSeq == Seq(77L))
    val scanned = geoScans(j).map(_.scannedFiles.count(_.rows > 0)).min
    assert(scanned < total,
      s"bucket runtime pruning did not fire: $scanned of $total")
  }
}
