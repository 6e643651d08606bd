package graft

import graft.tables.{GeoBloom, GeoCatalog, GeoManifest, GeoTable}

import org.apache.spark.sql.DataFrame

/**
 * Per-file bloom-filter file skipping (GeoBloom): the Iceberg parquet
 * bloom / puffin-index analog. Min/max stats cannot prune a point lookup
 * on a column the layout does not cluster by (every file's [min,max]
 * envelope covers the probe); the per-file bloom can. These legs pin the
 * whole lifecycle: commit-time build over fresh files only, planning-
 * time probe, runtime (DPP) probe, the ALTER backfill, DML preservation,
 * the sidecar fold, and vacuum liveness.
 */
class GeoBloomSpec extends SparkSpec {
  import spark.implicits._

  private lazy val warehouse: String = {
    val dir = java.nio.file.Files.createTempDirectory("geo_bloom_wh").toString
    spark.conf.set("spark.sql.catalog.geobl", classOf[GeoCatalog].getName)
    spark.conf.set("spark.sql.catalog.geobl.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS geobl.db")
    dir
  }

  private def geoScans(df: DataFrame): Seq[graft.tables.GeoCowScan] =
    graft.tables.GeoCowScan.collectIn(df.queryExecution.executedPlan)

  /** files scanned (rows>0) by the query vs the table's total. */
  private def scannedVsTotal(df: DataFrame, root: String): (Int, Int) = {
    val out = df.collect() // force execution so runtime narrowing lands
    assert(out != null)
    val scans = geoScans(df)
    assert(scans.nonEmpty, s"no GeoCowScan in:\n${df.queryExecution.executedPlan}")
    val total = GeoManifest.read(spark, root).files.count(_.rows > 0)
    (scans.map(_.scannedFiles.count(_.rows > 0)).min, total)
  }

  // ids are dealt round-robin across grp-clustered files, so EVERY file's
  // id [min,max] envelope covers every probe — range pruning keeps all
  // files, and any scanned < total is the bloom's doing.
  private def mkInterleaved(name: String): String = {
    spark.sql(s"CREATE TABLE geobl.db.$name (grp BIGINT, id BIGINT, name STRING) USING geo " +
      "PARTITIONED BY (bucket(8, grp)) " +
      "TBLPROPERTIES('bloom.columns'='id,name', 'bloom.items'='4096')")
    spark.sql(s"INSERT INTO geobl.db.$name " +
      "SELECT id % 16 AS grp, id, concat('nm', id) AS name FROM range(0, 8000)")
    s"$warehouse/db/$name"
  }

  test("commit builds blooms for fresh files; manifest round-trips spec + sidecar") {
    warehouse
    val root = mkInterleaved("t1")
    val m = GeoManifest.read(spark, root)
    assert(m.bloomCols.map(_.col) == Seq("id", "name"))
    assert(m.bloomCols.forall(_.items == 4096L))
    assert(m.blooms.length == 1, s"expected one sidecar, got ${m.blooms}")
    assert(m.blooms.head.cols == Seq("id", "name"))
    // one bloom row per (non-empty file, column)
    val rows = spark.read.parquet(m.blooms.head.path).collect()
    val nonEmpty = m.files.count(_.rows > 0)
    assert(rows.length == nonEmpty * 2, s"${rows.length} rows for $nonEmpty files")
    val keys = rows.map(r => (r.getString(0), r.getString(1))).toSet
    m.files.filter(_.rows > 0).foreach { f =>
      assert(keys.contains((f.key, "id")) && keys.contains((f.key, "name")), f.path)
    }
  }

  test("point lookup on an unclustered column prunes files; results exact") {
    warehouse
    val root = mkInterleaved("t2")
    val total0 = GeoManifest.read(spark, root).files.count(_.rows > 0)
    assert(total0 >= 4, s"need several files, got $total0")
    // range pruning alone CANNOT prune (interleaved ids): prove the data
    // shape first — every file's id range covers the probe value
    val m = GeoManifest.read(spark, root)
    val idIdx = m.partitions.indexWhere(t => t.kind == "stats" && t.col == "id")
    assert(idIdx >= 0)
    m.files.filter(_.rows > 0).foreach { f =>
      val (lo, hi) = f.pstats(idIdx)
      assert(lo <= 4242L && hi >= 4242L, s"ids not interleaved: $f")
    }
    // = probe: exactly one row, scan opened fewer files than the table
    val q = spark.sql("SELECT id, name FROM geobl.db.t2 WHERE id = 4242")
    val (scanned, total) = scannedVsTotal(q, root)
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(4242L))
    assert(scanned < total, s"bloom did not prune: $scanned of $total")
    // IN probe unions values; string bloom column probes the same way
    val q2 = spark.sql("SELECT id FROM geobl.db.t2 WHERE id IN (17, 9998)")
    assert(q2.collect().map(_.getLong(0)).sorted.toSeq == Seq(17L))
    val (s2, t2) = scannedVsTotal(q2, root)
    assert(s2 < t2, s"IN probe did not prune: $s2 of $t2")
    val q3 = spark.sql("SELECT id FROM geobl.db.t2 WHERE name = 'nm77'")
    assert(q3.collect().map(_.getLong(0)).toSeq == Seq(77L))
    val (s3, t3) = scannedVsTotal(q3, root)
    assert(s3 < t3, s"string probe did not prune: $s3 of $t3")
    // absent key: empty result (a few fp files may scan; wrong rows never)
    assert(spark.sql("SELECT * FROM geobl.db.t2 WHERE id = 999999").count() == 0L)
    // >10 values: the optimizer rewrites IN to InSet — the probe must
    // still fire (a wide multi-key lookup is the realistic shape)
    val wide = (0 until 12).map(i => 6900 + i * 16).mkString(", ") // one grp class
    val q4 = spark.sql(s"SELECT id FROM geobl.db.t2 WHERE id IN ($wide)")
    assert(q4.count() == 12L)
    val (s4, t4) = scannedVsTotal(q4, root)
    assert(s4 < t4, s"InSet probe did not prune: $s4 of $t4")
  }

  test("runtime (DPP) join values probe blooms on a non-partition column") {
    warehouse
    val root = mkInterleaved("t3")
    val dimDir = java.nio.file.Files.createTempDirectory("geo_bloom_dim").toString
    Seq((101L, "pick"), (202L, "skip"), (303L, "skip2"))
      .toDF("id", "tag").write.mode("overwrite").parquet(dimDir)
    spark.read.parquet(dimDir).createOrReplaceTempView("bloom_dim")
    val j = spark.sql("""
      SELECT f.id, f.name FROM geobl.db.t3 f
      JOIN bloom_dim d ON f.id = d.id WHERE d.tag = 'pick'""")
    val (scanned, total) = scannedVsTotal(j, root)
    assert(j.collect().map(_.getLong(0)).toSeq == Seq(101L))
    assert(scanned < total, s"runtime bloom did not prune: $scanned of $total\n" +
      j.queryExecution.executedPlan)
  }

  test("ALTER TABLE SET TBLPROPERTIES backfills existing files") {
    warehouse
    spark.sql("CREATE TABLE geobl.db.t4 (grp BIGINT, id BIGINT) USING geo " +
      "PARTITIONED BY (bucket(4, grp))")
    spark.sql("INSERT INTO geobl.db.t4 SELECT id % 8, id FROM range(0, 4000)")
    val root = s"$warehouse/db/t4"
    assert(GeoManifest.read(spark, root).blooms.isEmpty)
    spark.sql("ALTER TABLE geobl.db.t4 SET TBLPROPERTIES(" +
      "'bloom.columns'='id', 'bloom.items'='4096')")
    val m = GeoManifest.read(spark, root)
    assert(m.bloomCols.map(_.col) == Seq("id") && m.blooms.nonEmpty)
    val q = spark.sql("SELECT id FROM geobl.db.t4 WHERE id = 1234")
    val (scanned, total) = scannedVsTotal(q, root)
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(1234L))
    assert(scanned < total, s"backfilled bloom did not prune: $scanned of $total")
    // unknown column / unsupported type fail loudly
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE geobl.db.t4 SET TBLPROPERTIES('bloom.columns'='nope')")
    }
    assert(e.getMessage.contains("not a table column"))
  }

  test("DML rewrite re-covers fresh files; sidecars fold past the cap") {
    warehouse
    spark.conf.set("spark.graft.bloom.maxSidecars", "2")
    try {
      val root = mkInterleaved("t5")
      // a CoW DELETE rewrites files -> the commit hook must bloom the
      // rewrite output so lookups on survivors still prune
      spark.sql("DELETE FROM geobl.db.t5 WHERE id % 100 = 3")
      val q = spark.sql("SELECT id FROM geobl.db.t5 WHERE id = 4242")
      val (scanned, total) = scannedVsTotal(q, s"$warehouse/db/t5")
      assert(q.collect().map(_.getLong(0)).toSeq == Seq(4242L))
      assert(scanned < total, s"post-DML bloom did not prune: $scanned of $total")
      assert(spark.sql("SELECT * FROM geobl.db.t5 WHERE id = 103").count() == 0L)
      // appends accumulate sidecars; past the cap the next commit folds
      // them into one whose rows cover only LIVE files
      spark.sql("INSERT INTO geobl.db.t5 SELECT 99, 50001, 'x1'")
      spark.sql("INSERT INTO geobl.db.t5 SELECT 99, 50002, 'x2'")
      spark.sql("INSERT INTO geobl.db.t5 SELECT 99, 50003, 'x3'")
      val m = GeoManifest.read(spark, root)
      assert(m.blooms.length <= 2, s"fold did not run: ${m.blooms.length} sidecars")
      val covered = spark.read.parquet(m.blooms.map(_.path): _*)
        .select("file").distinct().collect().map(_.getString(0)).toSet
      val live = m.files.filter(_.rows > 0).map(_.key).toSet
      assert(covered.subsetOf(live), s"folded sidecar kept dead files: ${covered -- live}")
      // old and new rows both probe correctly through the folded sidecar
      assert(spark.sql("SELECT name FROM geobl.db.t5 WHERE id = 50002")
        .head.getString(0) == "x2")
      val q2 = spark.sql("SELECT id FROM geobl.db.t5 WHERE id = 777")
      val (s2, t2) = scannedVsTotal(q2, root)
      assert(s2 < t2, s"folded bloom did not prune: $s2 of $t2")
    } finally spark.conf.unset("spark.graft.bloom.maxSidecars")
  }

  test("past maxProbeFiles the probe goes distributed, not silent") {
    warehouse
    val root = mkInterleaved("t7")
    // cap far below the file count: the driver-memoized path is barred,
    // so any pruning observed comes from the executor-side probe — the
    // 100k-file case must not silently lose the skipping it exists for
    spark.conf.set("spark.graft.bloom.maxProbeFiles", "2")
    try {
      val q = spark.sql("SELECT id FROM geobl.db.t7 WHERE id = 4242")
      val (scanned, total) = scannedVsTotal(q, root)
      assert(q.collect().map(_.getLong(0)).toSeq == Seq(4242L))
      assert(total > 2 && scanned < total,
        s"distributed probe did not prune: $scanned of $total")
    } finally spark.conf.unset("spark.graft.bloom.maxProbeFiles")
  }

  test("SET inherits sibling knobs, is idempotent, and replaces sidecars on retune") {
    warehouse
    val root = mkInterleaved("t8") // bloom.items=4096 explicit at CREATE
    val m0 = GeoManifest.read(spark, root)
    // idempotent SET: same columns, no knobs -> no new commit, no rebuild
    spark.sql("ALTER TABLE geobl.db.t8 SET TBLPROPERTIES('bloom.columns'='id,name')")
    val m1 = GeoManifest.read(spark, root)
    assert(m1.version == m0.version && m1.blooms == m0.blooms)
    // fpp-only SET keeps the configured items (4096), does not reset them
    spark.sql("ALTER TABLE geobl.db.t8 SET TBLPROPERTIES('bloom.fpp'='0.01')")
    val m2 = GeoManifest.read(spark, root)
    assert(m2.bloomCols.forall(s => s.fpp == 0.01 && s.items == 4096L),
      s"sibling knob reset: ${m2.bloomCols}")
    // the retune backfill REPLACED the sidecar list (no duplicate rows)
    assert(m2.blooms.length == 1, s"retune accumulated sidecars: ${m2.blooms}")
    val rows = spark.read.parquet(m2.blooms.map(_.path): _*)
      .groupBy("file", "col").count().where("count > 1").count()
    assert(rows == 0L, "duplicate (file, col) bloom rows after retune")
    // UNSET of one knob returns it to the session default, keeps the rest
    spark.sql("ALTER TABLE geobl.db.t8 UNSET TBLPROPERTIES('bloom.items')")
    val m3 = GeoManifest.read(spark, root)
    assert(m3.bloomCols.forall(s => s.fpp == 0.01 && s.items == 0L),
      s"UNSET items wrong: ${m3.bloomCols}")
    // probing still works after the retunes
    val q = spark.sql("SELECT id FROM geobl.db.t8 WHERE id = 99")
    val (scanned, total) = scannedVsTotal(q, root)
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(99L) && scanned < total)
    // divergent knobs (a new column inherits defaults, existing keep
    // theirs) must not misreport: SHOW TBLPROPERTIES prints a per-column
    // comma list when values diverge
    spark.sql("ALTER TABLE geobl.db.t8 SET TBLPROPERTIES('bloom.columns'='id,name,grp')")
    val m4 = GeoManifest.read(spark, root)
    assert(m4.bloomCols.map(_.fpp).distinct.length == 2, s"expected divergence: ${m4.bloomCols}")
    val props = spark.sql("SHOW TBLPROPERTIES geobl.db.t8").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props("bloom.columns") == "id,name,grp")
    assert(props("bloom.fpp").split(',').length == 3, s"fpp not per-column: ${props("bloom.fpp")}")
    // displayed properties ROUND-TRIP: re-applying exactly what SHOW
    // printed (comma lists aligned with bloom.columns) must parse and
    // reproduce the same per-column config, not throw on .toDouble
    spark.sql(s"ALTER TABLE geobl.db.t8 SET TBLPROPERTIES(" +
      s"'bloom.columns'='${props("bloom.columns")}', " +
      s"'bloom.fpp'='${props("bloom.fpp")}', " +
      s"'bloom.items'='${props("bloom.items")}')")
    val m4b = GeoManifest.read(spark, root)
    assert(m4b.bloomCols == m4.bloomCols,
      s"displayed properties did not round-trip: ${m4b.bloomCols} vs ${m4.bloomCols}")
    // a misaligned list (2 values for 3 columns) is rejected loudly
    val mis = intercept[Exception] {
      spark.sql("ALTER TABLE geobl.db.t8 SET TBLPROPERTIES(" +
        "'bloom.columns'='id,name,grp', 'bloom.fpp'='0.01,0.02')")
    }
    assert(mis.getMessage.contains("aligned"), mis.getMessage)
    // RENAME keeps the config; the rewrite commit re-covers the new
    // files, and a re-SET of the same config must never no-op into a
    // sidecar-less table
    spark.sql("ALTER TABLE geobl.db.t8 RENAME COLUMN id TO ident")
    val m5 = GeoManifest.read(spark, root)
    assert(m5.bloomCols.exists(_.col == "ident") && m5.blooms.nonEmpty)
    val q2 = spark.sql("SELECT ident FROM geobl.db.t8 WHERE ident = 4242")
    val (s2, t2) = scannedVsTotal(q2, root)
    assert(q2.collect().map(_.getLong(0)).toSeq == Seq(4242L) && s2 < t2,
      s"post-rename probe did not prune: $s2 of $t2")
  }

  test("branch reads probe the blooms their branch commits built") {
    warehouse
    val root = mkInterleaved("t9")
    spark.sql("SELECT 1").collect()
    GeoTable.createBranch(spark, root, "audit")
    GeoTable.appendToBranch(spark, root, "audit",
      spark.sql("SELECT CAST(99 AS BIGINT) grp, CAST(50001 AS BIGINT) id, 'staged' name"))
    val q = spark.sql("SELECT name FROM geobl.db.t9.branch_audit WHERE id = 4242")
    assert(q.collect().map(_.getString(0)).toSeq == Seq("nm4242"))
    val scans = geoScans(q)
    assert(scans.nonEmpty)
    val scanned = scans.map(_.scannedFiles.count(_.rows > 0)).min
    val head = GeoManifest.refs(spark, root).branches("audit").head
    val total = GeoManifest.readVersion(spark, root, head).files.count(_.rows > 0)
    assert(scanned < total, s"branch read did not bloom-prune: $scanned of $total")
  }

  test("typed columns: build and probe agree on every embedding (no false negatives)") {
    warehouse
    // a build/probe embedding mismatch on DATE or TIMESTAMP would not
    // crash — it would silently prune files that DO hold the row. Pin
    // exactness for every supported type.
    spark.sql("CREATE TABLE geobl.db.tt (grp BIGINT, d DATE, t TIMESTAMP, " +
      "i INT, s STRING) USING geo PARTITIONED BY (bucket(8, grp)) " +
      "TBLPROPERTIES('bloom.columns'='d,t,i,s', 'bloom.items'='4096')")
    spark.sql("INSERT INTO geobl.db.tt SELECT id % 16, " +
      "date_add(DATE'2020-01-01', CAST(id % 900 AS INT)), " +
      "timestamp_seconds(1577836800 + id * 60), CAST(id AS INT), " +
      "concat('s', id) FROM range(0, 8000)")
    val root = s"$warehouse/db/tt"
    def one(pred: String, expect: Long): Unit = {
      val q = spark.sql(s"SELECT i FROM geobl.db.tt WHERE $pred")
      val got = q.collect().map(_.getInt(0)).toSeq
      assert(got == Seq(expect.toInt), s"$pred -> $got")
      val (scanned, total) = scannedVsTotal(q, root)
      assert(scanned < total, s"$pred did not prune: $scanned of $total")
    }
    one("d = DATE'2020-01-11' AND i = 10", 10L) // date embeds as epoch days
    one(s"t = timestamp_seconds(${1577836800L + 4242 * 60})", 4242L) // micros
    one("i = 777", 777L)
    one("s = 's3131'", 3131L)
  }

  test("vacuum keeps live bloom sidecars; path API + types validated") {
    warehouse
    val root = mkInterleaved("t6")
    spark.sql("INSERT INTO geobl.db.t6 SELECT 99, 60001, 'y'") // second snapshot
    spark.conf.set("spark.graft.vacuum.orphanGraceMs", "0")
    try GeoTable.vacuum(spark, root, keepVersions = 1)
    finally spark.conf.unset("spark.graft.vacuum.orphanGraceMs")
    val m = GeoManifest.read(spark, root)
    val fs = GeoManifest.fs(spark, root)
    m.blooms.foreach { b =>
      assert(fs.exists(new org.apache.hadoop.fs.Path(b.path)), s"vacuumed live sidecar ${b.path}")
    }
    val q = spark.sql("SELECT name FROM geobl.db.t6 WHERE id = 60001")
    assert(q.head.getString(0) == "y")
    // t.blooms metadata table: spec rows + live sidecar rows
    val meta = spark.sql("SELECT kind, column FROM geobl.db.t6.blooms").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(meta.count(_._1 == "spec") == 2 && meta.exists(_ == ("spec", "id")))
    assert(meta.count(_._1 == "sidecar") == m.blooms.length)
    val (scanned, total) = scannedVsTotal(q, root)
    assert(scanned < total, s"post-vacuum bloom did not prune: $scanned of $total")
    // an unsupported column type is rejected at spec parse
    val e = intercept[Exception] {
      GeoBloom.parseSpecs(spark, org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("d", org.apache.spark.sql.types.DoubleType))),
        "d", None, None)
    }
    assert(e.getMessage.contains("integral/date/timestamp/string"))
  }
}
