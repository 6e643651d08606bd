package graft

import graft.tables.{GeoCatalog, GeoManifest, GeoSql, GeoTable}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._

/**
 * ANALYZE TABLE column statistics (SURVEY.md §2.8b; Iceberg table-stats /
 * Delta ANALYZE analog): one pass collects NDV + null count + min/max
 * into the manifest, the catalog scan reports them as V2 column
 * statistics, and Catalyst's CBO then estimates filter selectivity well
 * enough to pick a broadcast join it previously sort-merge-joined — plan
 * quality decided BEFORE runtime, not by AQE after the first shuffle.
 */
class GeoAnalyzeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val warehouse: String = {
    val dir = java.nio.file.Files.createTempDirectory("geo_ana_wh").toString
    spark.conf.set("spark.sql.catalog.geoana", classOf[GeoCatalog].getName)
    spark.conf.set("spark.sql.catalog.geoana.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS geoana.db")
    dir
  }

  private def withSQLConf[T](kv: (String, String)*)(f: => T): T = {
    val old = kv.map { case (k, _) => k -> scala.util.Try(spark.conf.get(k)).toOption }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  // the STATIC plan (pre-AQE): the point of stats is deciding before runtime
  private def joins(df: DataFrame): (Int, Int) = {
    val p = df.queryExecution.sparkPlan
    (p.collect { case j: BroadcastHashJoinExec => j }.size,
      p.collect { case j: SortMergeJoinExec => j }.size)
  }

  test("ANALYZE flips a sort-merge join to broadcast via reported NDV") {
    warehouse
    spark.sql("CREATE TABLE geoana.db.big (id BIGINT, cat BIGINT, pad STRING) USING geo")
    spark.sql("""INSERT INTO geoana.db.big
      SELECT id, id AS cat, repeat('x', 64) FROM range(0, 40000)""")
    spark.sql("CREATE TABLE geoana.db.other (id BIGINT, w STRING) USING geo")
    spark.sql("""INSERT INTO geoana.db.other
      SELECT id, repeat('y', 64) FROM range(0, 40000)""")

    val q = """SELECT b.id, o.w FROM geoana.db.big b
               JOIN geoana.db.other o ON b.id = o.id WHERE b.cat = 7"""
    withSQLConf(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "65536") {
      // WITHOUT column stats: the filter's selectivity is unknown, the
      // filtered side keeps its full-scan size estimate, and the join
      // sort-merges
      val (bhj0, smj0) = joins(spark.sql(q))
      assert(bhj0 == 0 && smj0 == 1,
        s"without stats the plan must sort-merge, got bhj=$bhj0 smj=$smj0")

      // ANALYZE records NDV(cat) = ~40000: cat = 7 estimates to ~1 row,
      // far under the broadcast threshold
      val rows = GeoSql.exec(spark, // scalastyle:ignore
        "ANALYZE TABLE geoana.db.big COMPUTE STATISTICS FOR COLUMNS cat, id")
      val m = GeoManifest.read(spark, s"$warehouse/db/big")
      assert(m.colStats.contains("cat") && m.colStats.contains("id"))
      val st = m.colStats("cat")
      assert(st.ndv > 30000 && st.ndv < 50000, s"approx NDV off: ${st.ndv}")
      assert(st.nulls == 0 && st.min.contains(0L) && st.max.contains(39999L))

      val (bhj1, smj1) = joins(spark.sql(q))
      assert(bhj1 == 1 && smj1 == 0,
        s"with NDV stats the plan must broadcast, got bhj=$bhj1 smj=$smj1")
      // and the answer is the same either way
      val out = spark.sql(q).collect()
      assert(out.length == 1 && out.head.getLong(0) == 7L)
    }
  }

  test("colstat manifest lines round-trip (format 7) and survive commits") {
    warehouse
    spark.sql("CREATE TABLE geoana.db.rt (k BIGINT, v STRING) USING geo")
    spark.sql("INSERT INTO geoana.db.rt SELECT id % 10, concat('v', id) FROM range(0, 1000)")
    val root = s"$warehouse/db/rt"
    GeoTable.analyzeColumns(spark, root, Seq("k", "v"))
    val m = GeoManifest.read(spark, root)
    val k = m.colStats("k")
    assert(k.ndv >= 9 && k.ndv <= 11 && k.min.contains(0L) && k.max.contains(9L))
    // string column: NDV + nulls, no range embedding
    val v = m.colStats("v")
    assert(v.ndv > 900 && v.min.isEmpty && v.max.isEmpty)
    // stats ride through later commits untouched (stale-until-reanalyzed)
    spark.sql("INSERT INTO geoana.db.rt SELECT id % 10, 'w' FROM range(0, 100)")
    assert(GeoManifest.read(spark, root).colStats("k").ndv == k.ndv)
  }

  test("t.colstats metadata table surfaces the recorded statistics") {
    warehouse
    spark.sql("CREATE TABLE geoana.db.mt (k BIGINT, v STRING) USING geo")
    spark.sql("INSERT INTO geoana.db.mt SELECT id % 10, concat('v', id) FROM range(0, 500)")
    assert(spark.sql("SELECT * FROM geoana.db.mt.colstats").count() == 0)
    GeoSql.exec(spark, "ANALYZE TABLE geoana.db.mt COMPUTE STATISTICS FOR COLUMNS k")
    val rows = spark.sql(
      "SELECT column, ndv, null_count, min, max FROM geoana.db.mt.colstats").collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getString(0) == "k" && r.getLong(1) >= 9 && r.getLong(1) <= 11 &&
      r.getLong(2) == 0 && r.getLong(3) == 0L && r.getLong(4) == 9L, r.toString)
  }

  test("ANALYZE FOR ALL COLUMNS analyzes every scalar column") {
    warehouse
    spark.sql("CREATE TABLE geoana.db.alls (a BIGINT, b STRING, g GEOMETRY) USING geo")
    spark.sql("INSERT INTO geoana.db.alls " +
      "SELECT id, concat('s', id), st_point(CAST(id AS DOUBLE), 0.0D) FROM range(0, 50)")
    GeoSql.exec(spark, "ANALYZE TABLE geoana.db.alls COMPUTE STATISTICS FOR ALL COLUMNS")
    val m = GeoManifest.read(spark, s"$warehouse/db/alls")
    assert(m.colStats.keySet == Set("a", "b"), s"got ${m.colStats.keySet}")
  }
}
