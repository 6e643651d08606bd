package graft

import graft.tables.{GeoCatalog, GeoManifest, GeoRowLevel}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
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

  /** The GeoCowScans in the final (adaptive) executed plan — walks into
    * AQE query stages, which plain collect() treats as leaves. */
  private def geoScans(df: DataFrame): Seq[graft.tables.GeoCowScan] = {
    val buf = scala.collection.mutable.ListBuffer.empty[graft.tables.GeoCowScan]
    def walk(n: org.apache.spark.sql.execution.SparkPlan): Unit = n match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => walk(r.child)
      case b: BatchScanExec =>
        b.scan match { case s: graft.tables.GeoCowScan => buf += s; case _ => () }
      case other => other.children.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    buf.toList
  }

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
