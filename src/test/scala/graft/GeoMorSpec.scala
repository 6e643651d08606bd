package graft

import graft.tables.{GeoManifest, GeoTable}

import org.apache.spark.sql.functions._

/**
 * Merge-on-read DML (SURVEY.md §2.8b; Iceberg v2 position deletes):
 * DELETE/UPDATE write (file, row-ordinal) sidecars instead of rewriting
 * files when the touched fraction is small; every read path anti-joins
 * them back out; OPTIMIZE folds them away.
 */
class GeoMorSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(n: Int = 100, nFiles: Int = 4): String = {
    val root = java.nio.file.Files.createTempDirectory("geo_mor").toString + "/t"
    val df = spark.range(n).select($"id",
      concat(lit("v"), $"id").as("v")).repartition(nFiles)
    GeoTable.create(spark, root, df, None)
    root
  }

  test("MoR DELETE hides exactly the matched rows and leaves data files untouched") {
    val root = freshTable()
    val before = GeoManifest.read(spark, root)
    val n = GeoTable.delete(spark, root, $"id" % 10 === 0, mode = "mor")
    assert(n == 10)
    val after = GeoManifest.read(spark, root)
    assert(after.files.map(_.key).toSet == before.files.map(_.key).toSet,
      "MoR delete must not rewrite data files")
    assert(after.deletes.nonEmpty && after.deletes.map(_.rows).sum == 10)
    assert(after.totalRows == 90)
    val ids = GeoTable.read(spark, root).select($"id").as[Long].collect().sorted.toSeq
    assert(ids == (0L until 100L).filterNot(_ % 10 == 0))
    // time travel: the pre-delete snapshot still shows all rows
    assert(GeoTable.readAt(spark, root, before.version).count() == 100)
  }

  test("MoR and CoW DELETE produce identical visible rows on identical input") {
    val rootA = freshTable(200, 5)
    val rootB = freshTable(200, 5)
    val cond = ($"id" % 17 === 3) || ($"id" === 111L)
    val nA = GeoTable.delete(spark, rootA, cond, mode = "cow")
    val nB = GeoTable.delete(spark, rootB, cond, mode = "mor")
    assert(nA == nB)
    val a = GeoTable.read(spark, rootA).as[(Long, String)].collect().sortBy(_._1).toSeq
    val b = GeoTable.read(spark, rootB).as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(a == b, "CoW and MoR reads must be indistinguishable")
    assert(GeoManifest.read(spark, rootA).deletes.isEmpty)
    assert(GeoManifest.read(spark, rootB).deletes.nonEmpty)
  }

  test("auto mode picks MoR for sparse matches and CoW for bulk matches") {
    val root = freshTable(1000, 4)
    GeoTable.delete(spark, root, $"id" === 7L) // 1/1000 — MoR regime
    val m1 = GeoManifest.read(spark, root)
    assert(m1.deletes.nonEmpty, "0.1% match must go merge-on-read")
    GeoTable.delete(spark, root, $"id" < 500L) // ~half — CoW regime
    val m2 = GeoManifest.read(spark, root)
    assert(m2.version == m1.version + 1)
    val ids = GeoTable.read(spark, root).select($"id").as[Long].collect().sorted.toSeq
    assert(ids == (500L until 1000L))
  }

  test("MoR UPDATE: sidecar hides old rows, updated rows append as new files") {
    val root = freshTable()
    val before = GeoManifest.read(spark, root)
    val n = GeoTable.update(spark, root, Seq("v" -> lit("UPD")), $"id" === 42L, mode = "mor")
    assert(n == 1)
    val after = GeoManifest.read(spark, root)
    assert(before.files.map(_.key).toSet.subsetOf(after.files.map(_.key).toSet),
      "original files carry over untouched")
    assert(after.deletes.map(_.rows).sum == 1)
    val rows = GeoTable.read(spark, root).as[(Long, String)].collect().sortBy(_._1)
    assert(rows.length == 100)
    assert(rows(42) == (42L, "UPD"))
    assert(rows(41) == (41L, "v41"))
  }

  test("successive MoR deletes accumulate; matches of already-deleted rows do not duplicate") {
    val root = freshTable()
    GeoTable.delete(spark, root, $"id" < 5L, mode = "mor")
    // overlapping predicate: rows 0-4 are already gone, only 5-9 match now
    val n = GeoTable.delete(spark, root, $"id" < 10L, mode = "mor")
    assert(n == 5, s"already-deleted rows must not re-match, got $n")
    val m = GeoManifest.read(spark, root)
    assert(m.deletes.map(_.rows).sum == 10)
    assert(GeoTable.read(spark, root).count() == 90)
  }

  test("OPTIMIZE (compact) folds delete sidecars away; vacuum keeps live sidecars") {
    val root = freshTable()
    GeoTable.delete(spark, root, $"id" % 10 === 0, mode = "mor")
    // vacuum of older versions must NOT remove the live sidecar
    GeoTable.vacuum(spark, root, keepVersions = 1)
    assert(GeoTable.read(spark, root).count() == 90)
    GeoTable.compact(spark, root, targetFiles = 2)
    val m = GeoManifest.read(spark, root)
    assert(m.deletes.isEmpty, "compact must clear merge-on-read deletes")
    val ids = GeoTable.read(spark, root).select($"id").as[Long].collect().sorted.toSeq
    assert(ids == (0L until 100L).filterNot(_ % 10 == 0))
  }

  test("CoW DML on a table with sidecars does not resurrect MoR-deleted rows") {
    val root = freshTable()
    GeoTable.delete(spark, root, $"id" === 3L, mode = "mor")
    // bulk CoW delete rewrites files that also hold MoR-hidden rows
    GeoTable.delete(spark, root, $"id" >= 50L, mode = "cow")
    val ids = GeoTable.read(spark, root).select($"id").as[Long].collect().sorted.toSeq
    assert(ids == (0L until 50L).filterNot(_ == 3L), s"got $ids")
    // and update through the merged view only touches visible rows
    val n = GeoTable.update(spark, root, Seq("v" -> lit("X")), $"id" === 3L, mode = "cow")
    assert(n == 0, "a MoR-deleted row must not be updatable")
  }

  test("changelog over MoR commits: netChanges = the deleted rows; stream treats it non-append") {
    val root = freshTable()
    val v0 = GeoManifest.read(spark, root).version
    GeoTable.delete(spark, root, $"id" % 25 === 1, mode = "mor") // v0+1
    val net = GeoTable.netChanges(spark, root, v0, v0 + 1)
      .select($"id", col(graft.tables.GeoChangelog.ChangeTypeCol).as("ct"))
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(net == Seq((1L, "delete"), (26L, "delete"), (51L, "delete"), (76L, "delete")),
      s"got $net")
    // the file-granular surface tags the same rows at the commit
    val raw = GeoTable.changes(spark, root, v0, v0 + 1)
    assert(raw.where(col(graft.tables.GeoChangelog.ChangeTypeCol) === "delete").count() == 4)
    // version steps report it as a non-append commit (streams reject/skip)
    val steps = graft.tables.GeoChangelog.versionSteps(spark, root, v0, v0 + 1)
    assert(steps.head.isOverwrite && steps.head.addedDeletes.nonEmpty)
  }

  test("a MoR delete then an insert nets correctly across the range") {
    val root = freshTable(50, 2)
    val v0 = GeoManifest.read(spark, root).version
    GeoTable.delete(spark, root, $"id" === 10L, mode = "mor")
    GeoTable.append(spark, root, spark.range(100, 103).select($"id",
      concat(lit("n"), $"id").as("v")))
    val net = GeoTable.netChanges(spark, root, v0, v0 + 2)
      .select($"id", col(graft.tables.GeoChangelog.ChangeTypeCol).as("ct"))
      .as[(Long, String)].collect().sortBy(r => (r._2, r._1)).toSeq
    assert(net == Seq((10L, "delete"), (100L, "insert"), (101L, "insert"), (102L, "insert")),
      s"got $net")
  }

  test("catalog scans merge MoR sidecars inline — no compaction required") {
    val dir = java.nio.file.Files.createTempDirectory("geo_mor_cat").toString
    spark.conf.set("spark.sql.catalog.geomor",
      classOf[graft.tables.GeoCatalog].getName)
    spark.conf.set("spark.sql.catalog.geomor.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS geomor.db")
    spark.sql("CREATE TABLE geomor.db.t (id BIGINT, v STRING) USING geo")
    spark.sql("INSERT INTO geomor.db.t SELECT id, concat('v', id) FROM range(0, 100)")
    GeoTable.delete(spark, s"$dir/db/t", $"id" % 10 === 0, mode = "mor")
    assert(GeoManifest.read(spark, s"$dir/db/t").deletes.nonEmpty, "need a MoR snapshot")
    // full scan, aggregation (footer COUNT pushdown must NOT answer), and
    // a pushed filter that lands on a file with deleted rows
    assert(spark.sql("SELECT COUNT(*) FROM geomor.db.t").head.getLong(0) == 90)
    val ids = spark.sql("SELECT id FROM geomor.db.t").as[Long].collect().sorted.toSeq
    assert(ids == (0L until 100L).filterNot(_ % 10 == 0))
    val some = spark.sql("SELECT v FROM geomor.db.t WHERE id >= 18 AND id <= 22")
      .as[String].collect().sorted.toSeq
    assert(some == Seq("v18", "v19", "v21", "v22"), s"got $some")
    // a second sidecar accumulates; the scan merges the union
    GeoTable.delete(spark, s"$dir/db/t", $"id" === 7L, mode = "mor")
    assert(spark.sql("SELECT COUNT(*) FROM geomor.db.t").head.getLong(0) == 89)
    // MoR UPDATE: sidecar'd old rows invisible, appended new rows visible
    GeoTable.update(spark, s"$dir/db/t", Seq("v" -> lit("upd")), $"id" === 33L, mode = "mor")
    val upd = spark.sql("SELECT v FROM geomor.db.t WHERE id = 33").as[String].collect().toSeq
    assert(upd == Seq("upd"), s"got $upd")
    // catalog read == the DataFrame-surface merged read, row for row
    val cat = spark.sql("SELECT id, v FROM geomor.db.t")
    val path = GeoTable.read(spark, s"$dir/db/t").select($"id", $"v")
    assert(cat.exceptAll(path).count() == 0 && path.exceptAll(cat).count() == 0)
    // OPTIMIZE folds the sidecars; reads go back to the plain path
    spark.sql("DROP TABLE geomor.db.t")
  }

  test("native DML runs on MoR snapshots: rewrite sees the merged view, spent sidecars prune") {
    val dir = java.nio.file.Files.createTempDirectory("geo_mor_dml").toString
    spark.conf.set("spark.sql.catalog.geomd",
      classOf[graft.tables.GeoCatalog].getName)
    spark.conf.set("spark.sql.catalog.geomd.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS geomd.db")
    spark.sql("CREATE TABLE geomd.db.t (id BIGINT, v STRING) USING geo")
    spark.sql("INSERT INTO geomd.db.t SELECT id, concat('v', id) FROM range(0, 100)")
    val root = s"$dir/db/t"
    GeoTable.delete(spark, root, $"id" === 42L, mode = "mor")
    assert(GeoManifest.read(spark, root).deletes.nonEmpty)
    // native UPDATE over the sidecar'd snapshot: the CoW rewrite reads the
    // MERGED view (42 invisible), and the row-conservation check accounts
    // for the hidden row instead of refusing the commit
    spark.sql("UPDATE geomd.db.t SET v = 'upd' WHERE id >= 40 AND id < 45")
    val vs = spark.sql("SELECT id, v FROM geomd.db.t WHERE id >= 40 AND id < 45")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(vs == Seq((40L, "upd"), (41L, "upd"), (43L, "upd"), (44L, "upd")), s"got $vs")
    // the sidecar entry pointed into a replaced file — it must be pruned
    // (42 is gone for good, not resurrect-able by any read path)
    val m = GeoManifest.read(spark, root)
    assert(spark.sql("SELECT COUNT(*) FROM geomd.db.t").head.getLong(0) == 99)
    assert(spark.sql("SELECT COUNT(*) FROM geomd.db.t WHERE id = 42").head.getLong(0) == 0)
    assert(m.totalRows == 99, s"manifest accounting off: ${m.totalRows}")
    // sidecars on untouched files survive a rewrite elsewhere: hide one
    // row per half, rewrite only the other half's files
    GeoTable.delete(spark, root, $"id" === 7L, mode = "mor")
    spark.sql("DELETE FROM geomd.db.t WHERE id = 90")
    assert(spark.sql("SELECT COUNT(*) FROM geomd.db.t").head.getLong(0) == 97)
    assert(spark.sql("SELECT COUNT(*) FROM geomd.db.t WHERE id = 7").head.getLong(0) == 0)
    // native MERGE over a sidecar'd snapshot nets correctly too
    spark.sql("""MERGE INTO geomd.db.t t USING (SELECT 7L AS sid UNION ALL SELECT 50L) s
                 ON t.id = s.sid
                 WHEN MATCHED THEN UPDATE SET v = 'merged'
                 WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.sid, 'inserted')""")
    val after = spark.sql("SELECT v FROM geomd.db.t WHERE id IN (7, 50)")
      .as[String].collect().sorted.toSeq
    // 7 is MoR-hidden => NOT MATCHED => re-inserted; 50 updates in place
    assert(after == Seq("inserted", "merged"), s"got $after")
    spark.sql("DROP TABLE geomd.db.t")
  }
}
