package graft

import graft.tables.{GeoCatalog, GeoManifest, GeoSql}

import org.apache.spark.sql.functions._

/**
 * Multi-column Z-ordering (`OPTIMIZE t ZORDER BY (c1, c2)`, the Delta
 * ZORDER analog): interleaved 16-bit quantized ranks make per-file
 * min/max TIGHT on every listed column at once, so the auto stats
 * transforms prune scans filtered on ANY of them — a lexicographic sort
 * only prunes its leading column. Clustering quality affects pruning
 * precision only; per-file min/max stay exact, so results never change.
 */
class GeoZorderSpec extends SparkSpec {
  import spark.implicits._

  private lazy val warehouse: String = {
    val dir = java.nio.file.Files.createTempDirectory("geo_zo_wh").toString
    spark.conf.set("spark.sql.catalog.geozo", classOf[GeoCatalog].getName)
    spark.conf.set("spark.sql.catalog.geozo.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS geozo.db")
    dir
  }

  private def scannedFiles(sql: String): Int = {
    val plan = spark.sql(sql).queryExecution.executedPlan.toString
    val re = "GeoCowScan\\(files=(\\d+)".r
    re.findFirstMatchIn(plan).map(_.group(1).toInt)
      .getOrElse(fail(s"no GeoCowScan in plan:\n$plan"))
  }

  test("ZORDER BY (a, b): filters on EITHER column prune files") {
    warehouse
    spark.sql("CREATE TABLE geozo.db.z2 (a BIGINT, b BIGINT, v STRING) USING geo")
    // a and b are independent; a hash-scrambled insert order makes every
    // file straddle both ranges, so nothing prunes before ZORDER
    spark.sql("""INSERT INTO geozo.db.z2
      SELECT id % 97, (id * 31) % 89, concat('v', id)
      FROM range(0, 40000) DISTRIBUTE BY hash(id) SORT BY hash(id)""")
    val all0 = scannedFiles("SELECT * FROM geozo.db.z2")
    GeoSql.exec(spark, "OPTIMIZE geozo.db.z2 INTO 16 FILES ZORDER BY (a, b)")
    val all = scannedFiles("SELECT * FROM geozo.db.z2")
    assert(all >= 8, s"compaction must keep multiple files, got $all (pre: $all0)")
    val byA = scannedFiles("SELECT * FROM geozo.db.z2 WHERE a >= 10 AND a < 20")
    val byB = scannedFiles("SELECT * FROM geozo.db.z2 WHERE b >= 10 AND b < 20")
    assert(byA < all, s"a-range must prune after ZORDER: $byA vs $all")
    assert(byB < all, s"b-range must prune after ZORDER: $byB vs $all")
    // correctness unchanged by the layout
    assert(sql1("SELECT COUNT(*) FROM geozo.db.z2 WHERE a >= 10 AND a < 20") ==
      Range(0, 40000).count(i => i % 97 >= 10 && i % 97 < 20).toLong)
    assert(sql1("SELECT COUNT(*) FROM geozo.db.z2 WHERE b >= 10 AND b < 20") ==
      Range(0, 40000).count(i => (i * 31) % 89 >= 10 && (i * 31) % 89 < 20).toLong)
  }

  test("ZORDER within a partitioned layout preserves partition pruning") {
    warehouse
    spark.sql("CREATE TABLE geozo.db.zp (p BIGINT, x BIGINT, y BIGINT) USING geo " +
      "PARTITIONED BY (p)")
    spark.sql("""INSERT INTO geozo.db.zp
      SELECT id % 3, (id * 7) % 101, (id * 13) % 103 FROM range(0, 30000)""")
    GeoSql.exec(spark, "OPTIMIZE geozo.db.zp INTO 12 FILES ZORDER BY (x, y)")
    val m = GeoManifest.read(spark, warehouse + "/db/zp")
    // partition transform still leads the clustering: files stay usable
    // for partition pruning (tight p ranges)
    val all = scannedFiles("SELECT * FROM geozo.db.zp")
    val byP = scannedFiles("SELECT * FROM geozo.db.zp WHERE p = 1")
    val byX = scannedFiles("SELECT * FROM geozo.db.zp WHERE p = 1 AND x < 25")
    assert(byP < all, s"partition pruning survives ZORDER: $byP vs $all")
    assert(byX <= byP, s"x-range prunes within the partition: $byX vs $byP")
    assert(sql1("SELECT COUNT(*) FROM geozo.db.zp WHERE p = 1") == 10000L)
    assert(m.files.filter(_.rows > 0).forall(_.pstats.nonEmpty))
  }

  test("string and date columns embed; constant columns degrade gracefully") {
    warehouse
    spark.sql("CREATE TABLE geozo.db.zs (s STRING, d DATE, c BIGINT) USING geo")
    spark.sql("""INSERT INTO geozo.db.zs
      SELECT concat(chr(65 + CAST(id % 26 AS INT)), 'row', id),
             date_add(DATE'2024-01-01', CAST((id * 17) % 365 AS INT)), 42
      FROM range(0, 20000) DISTRIBUTE BY hash(id)""")
    // c is constant: its span is degenerate and contributes no bits —
    // the statement still succeeds and orders by (s, d)
    GeoSql.exec(spark, "OPTIMIZE geozo.db.zs INTO 8 FILES ZORDER BY (s, d, c)")
    val all = scannedFiles("SELECT * FROM geozo.db.zs")
    val byD = scannedFiles(
      "SELECT * FROM geozo.db.zs WHERE d >= DATE'2024-06-01' AND d < DATE'2024-07-01'")
    assert(byD < all, s"date range must prune after ZORDER: $byD vs $all")
    assert(sql1("SELECT COUNT(*) FROM geozo.db.zs") == 20000L)
    assert(sql1("SELECT COUNT(*) FROM geozo.db.zs WHERE s LIKE 'A%'") ==
      Range(0, 20000).count(_ % 26 == 0).toLong)
  }

  test("bad ZORDER requests refuse loudly") {
    warehouse
    spark.sql("CREATE TABLE geozo.db.zbad (a BIGINT, arr ARRAY<INT>) USING geo")
    spark.sql("INSERT INTO geozo.db.zbad SELECT id, array(1) FROM range(0, 10)")
    val e1 = intercept[Exception](
      GeoSql.exec(spark, "OPTIMIZE geozo.db.zbad ZORDER BY (nope)"))
    assert(e1.getMessage.contains("not in"))
    val e2 = intercept[Exception](
      GeoSql.exec(spark, "OPTIMIZE geozo.db.zbad ZORDER BY (arr)"))
    assert(e2.getMessage.contains("cannot order"))
    val e3 = intercept[Exception](
      GeoSql.exec(spark, "OPTIMIZE geozo.db.zbad ZORDER BY (a, a, a, a, a)"))
    assert(e3.getMessage.contains("1 to 4"))
  }
}
