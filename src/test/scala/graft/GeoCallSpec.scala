package graft

import graft.tables.{GeoManifest, GeoSql}

/**
 * Iceberg stored-procedure spelling: CALL cat.system.proc(k => v, ...)
 * maps 1:1 onto the engine's existing maintenance verbs.
 */
class GeoCallSpec extends SparkSpec {

  private lazy val wh: String = {
    val dir = java.nio.file.Files.createTempDirectory("geo_call_wh").toString
    spark.conf.set("spark.sql.catalog.geoc", classOf[graft.tables.GeoCatalog].getName)
    spark.conf.set("spark.sql.catalog.geoc.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS geoc.db")
    dir
  }

  private def root(t: String) = s"$wh/db/$t"

  test("rewrite_data_files compacts; expire_snapshots trims; rollback restores") {
    wh
    spark.sql("DROP TABLE IF EXISTS geoc.db.m")
    spark.sql("CREATE TABLE geoc.db.m (id BIGINT, v STRING) USING geo")
    for (i <- 0 until 4)
      spark.sql(s"INSERT INTO geoc.db.m SELECT id, concat('x', id) FROM range(${i * 10}, ${i * 10 + 10})")
    val before = GeoManifest.read(spark, root("m"))
    assert(before.files.size > 1)
    val v1 = before.version

    spark.sql("CALL geoc.system.rewrite_data_files(table => 'db.m', target_file_count => 1)")
    val after = GeoManifest.read(spark, root("m"))
    assert(after.files.size == 1 && after.files.map(_.rows).sum == 40)

    // snapshot the compacted version, roll back to the pre-compaction one
    spark.sql(s"CALL geoc.system.rollback_to_snapshot(table => 'db.m', snapshot_id => $v1)")
    assert(spark.sql("SELECT COUNT(*) FROM geoc.db.m").head.getLong(0) == 40)
    assert(GeoManifest.read(spark, root("m")).files.size == before.files.size)

    spark.sql("CALL geoc.system.expire_snapshots(table => 'db.m', retain_last => 2)")
    // expire keeps the table readable and the latest state intact
    assert(spark.sql("SELECT COUNT(*) FROM geoc.db.m").head.getLong(0) == 40)
    spark.sql("DROP TABLE geoc.db.m")
  }

  test("create_tag + add_files + claim-and-fail errors") {
    wh
    spark.sql("DROP TABLE IF EXISTS geoc.db.t2")
    spark.sql("CREATE TABLE geoc.db.t2 (id BIGINT, v STRING) USING geo")
    spark.sql("INSERT INTO geoc.db.t2 SELECT id, 'a' FROM range(5)")
    spark.sql("CALL geoc.system.create_tag(table => 'db.t2', tag => 'audit')")
    assert(GeoManifest.refs(spark, root("t2")).names.contains("audit"))

    // by-reference file onboarding through the procedure spelling
    val ext = java.nio.file.Files.createTempDirectory("call_add").toString + "/f"
    spark.range(7).selectExpr("id", "'b' AS v").coalesce(1).write.parquet(ext)
    val files = spark.read.parquet(ext).inputFiles.toSeq
    spark.sql(s"CALL geoc.system.add_files(table => 'db.t2', files => '${files.mkString(",")}')")
    assert(spark.sql("SELECT COUNT(*) FROM geoc.db.t2").head.getLong(0) == 12)

    // recognized procedure + bad args = the REAL problem, not a parse error
    val e = intercept[Exception](
      spark.sql("CALL geoc.system.rollback_to_snapshot(table => 'db.t2')"))
    assert(e.getMessage.contains("snapshot_id"), e.getMessage)
    val e2 = intercept[Exception](
      spark.sql("CALL geoc.system.expire_snapshots(retain_last => 1)"))
    assert(e2.getMessage.contains("`table`"), e2.getMessage) // Spark's own REQUIRED_PARAMETER_NOT_FOUND
    // unknown procedure falls through to Spark's own error, not ours
    intercept[Exception](spark.sql("CALL geoc.system.launch_missiles(table => 'db.t2')"))
    spark.sql("DROP TABLE geoc.db.t2")
  }

  test("remove_orphan_files sweeps unreferenced files but NEVER expires history") {
    wh
    spark.sql("DROP TABLE IF EXISTS geoc.db.orph")
    spark.sql("CREATE TABLE geoc.db.orph (id BIGINT) USING geo")
    spark.sql("INSERT INTO geoc.db.orph SELECT id FROM range(4)")
    spark.sql("INSERT INTO geoc.db.orph SELECT id FROM range(4, 8)")
    val m = GeoManifest.read(spark, root("orph"))
    // plant an orphan (a crashed commit's leftover) in the data dir
    val fs = new org.apache.hadoop.fs.Path(root("orph"))
      .getFileSystem(spark.sessionState.newHadoopConf())
    val orphan = new org.apache.hadoop.fs.Path(root("orph"), "data/cdead/part-00000-dead.parquet")
    fs.mkdirs(orphan.getParent)
    fs.create(orphan, true).close()
    val old = spark.conf.getOption("spark.graft.vacuum.orphanGraceMs")
    spark.conf.set("spark.graft.vacuum.orphanGraceMs", "0")
    try spark.sql("CALL geoc.system.remove_orphan_files(table => 'db.orph')")
    finally old match {
      case Some(v) => spark.conf.set("spark.graft.vacuum.orphanGraceMs", v)
      case None => spark.conf.unset("spark.graft.vacuum.orphanGraceMs")
    }
    assert(!fs.exists(orphan), "orphan file survived the sweep")
    // committed history is untouched: every prior version still reads
    assert(spark.sql("SELECT COUNT(*) FROM geoc.db.orph").head.getLong(0) == 8)
    for (v <- 1 to m.version)
      assert(spark.sql(s"SELECT COUNT(*) FROM geoc.db.orph VERSION AS OF $v")
        .head.getLong(0) == 4L * v, s"version $v lost by orphan sweep")
    spark.sql("DROP TABLE geoc.db.orph")
  }

  test("remove_orphan_files older_than pins an absolute cutoff") {
    wh
    val utc = GeoSql.formatUtcMillis _
    spark.sql("DROP TABLE IF EXISTS geoc.db.orph2")
    spark.sql("CREATE TABLE geoc.db.orph2 (id BIGINT) USING geo")
    spark.sql("INSERT INTO geoc.db.orph2 SELECT id FROM range(4)")
    val fs = new org.apache.hadoop.fs.Path(root("orph2"))
      .getFileSystem(spark.sessionState.newHadoopConf())
    val orphan = new org.apache.hadoop.fs.Path(root("orph2"), "data/cx/part-00000-x.parquet")
    fs.mkdirs(orphan.getParent)
    fs.create(orphan, true).close()
    // a cutoff in the past spares the young orphan (it was modified later)
    spark.sql("CALL geoc.system.remove_orphan_files(table => 'db.orph2', " +
      "older_than => '2000-01-01 00:00:00')")
    assert(fs.exists(orphan), "past cutoff must not sweep a younger orphan")
    // a future cutoff catches it WITHOUT touching the grace-window conf
    spark.sql("CALL geoc.system.remove_orphan_files(table => 'db.orph2', " +
      s"older_than => '${utc(System.currentTimeMillis() + 3600000L)}')")
    assert(!fs.exists(orphan), "absolute cutoff must sweep the orphan")
    assert(spark.sql("SELECT COUNT(*) FROM geoc.db.orph2").head.getLong(0) == 4)
    spark.sql("DROP TABLE geoc.db.orph2")
  }

  test("cherrypick_snapshot applies a staged append onto an advanced head; refusals are loud") {
    wh
    spark.sql("DROP TABLE IF EXISTS geoc.db.cp")
    spark.sql("CREATE TABLE geoc.db.cp (id BIGINT) USING geo")
    spark.sql("INSERT INTO geoc.db.cp SELECT id FROM range(10)") // v1
    GeoSql.exec(spark, "ALTER TABLE geoc.db.cp CREATE BRANCH stage")
    spark.sql("INSERT INTO geoc.db.cp.branch_stage SELECT id FROM range(10, 20)") // staged
    val staged = spark.sql(
      "SELECT version FROM geoc.db.cp.refs WHERE name = 'stage'")
      .head.getAs[Number](0).longValue
    spark.sql("INSERT INTO geoc.db.cp SELECT id FROM range(20, 25)") // main advances
    // publish refuses the divergence — cherry-pick is the verb for this
    val ep = intercept[Exception](spark.sql(
      "CALL geoc.system.publish_changes(table => 'db.cp', branch => 'stage')"))
    assert(ep.getMessage.contains("moved"), ep.getMessage)
    spark.sql(s"CALL geoc.system.cherrypick_snapshot(table => 'db.cp', snapshot_id => $staged)")
    assert(spark.sql("SELECT COUNT(*) FROM geoc.db.cp").head.getLong(0) == 25)
    assert(spark.sql("SELECT CAST(SUM(id) AS BIGINT) FROM geoc.db.cp").head.getLong(0)
      == (0 until 25).sum.toLong)
    // double-pick refused by SOURCE SNAPSHOT ID, not just file paths
    val e1 = intercept[Exception](spark.sql(
      s"CALL geoc.system.cherrypick_snapshot(table => 'db.cp', snapshot_id => $staged)"))
    assert(e1.getMessage.contains("already cherry-picked"), e1.getMessage)
    // ... and the id guard survives OPTIMIZE retiring the picked files'
    // paths (the path-based guard alone would re-apply and duplicate)
    GeoSql.exec(spark, "OPTIMIZE geoc.db.cp")
    val e1b = intercept[Exception](spark.sql(
      s"CALL geoc.system.cherrypick_snapshot(table => 'db.cp', snapshot_id => $staged)"))
    assert(e1b.getMessage.contains("already cherry-picked"), e1b.getMessage)
    assert(spark.sql("SELECT COUNT(*) FROM geoc.db.cp").head.getLong(0) == 25)
    // non-append snapshots refused: whichever path the DELETE takes
    // (CoW rewrite, metadata-only file drop, or equality sidecar), its
    // delta is not a pure file append
    spark.sql("DELETE FROM geoc.db.cp WHERE id < 5")
    val delV = GeoManifest.read(spark, root("cp")).version
    val e2 = intercept[Exception](spark.sql(
      s"CALL geoc.system.cherrypick_snapshot(table => 'db.cp', snapshot_id => $delV)"))
    assert(e2.getMessage.contains("APPEND"), e2.getMessage)
    spark.sql("DROP TABLE geoc.db.cp")
  }

  test("rewrite_position_delete_files consolidates sidecars, drops dangling, never moves rows") {
    wh
    import org.apache.spark.sql.functions.col
    spark.sql("DROP TABLE IF EXISTS geoc.db.pd")
    spark.sql("CREATE TABLE geoc.db.pd (id BIGINT, grp BIGINT) USING geo")
    spark.sql("INSERT INTO geoc.db.pd SELECT id, 0 FROM range(100)")      // file(s) A
    spark.sql("INSERT INTO geoc.db.pd SELECT id, 1 FROM range(100, 200)") // file(s) B
    graft.tables.GeoTable.delete(spark, root("pd"),
      col("id") % 10 === 3 && col("grp") === 0, mode = "mor")
    graft.tables.GeoTable.delete(spark, root("pd"),
      col("id") % 10 === 7 && col("grp") === 1, mode = "mor")
    assert(GeoManifest.read(spark, root("pd")).deletes.size == 2)
    assert(spark.sql("SELECT COUNT(*) FROM geoc.db.pd").head.getLong(0) == 180)
    // rewrite ONLY grp=0's files: their sidecar rows fold into the
    // rewrite, but the manifest keeps both sidecars (grp=1 untouched) —
    // sidecar 1's entries now DANGLE (their target path was retired)
    graft.tables.GeoTable.compactWhere(spark, root("pd"), col("grp") === 0, 1)
    val mid = GeoManifest.read(spark, root("pd"))
    assert(mid.deletes.size == 2, "compactWhere should carry the sidecars while B is untouched")
    assert(spark.sql("SELECT COUNT(*) FROM geoc.db.pd").head.getLong(0) == 180)
    val retired = spark.sql(
      "CALL geoc.system.rewrite_position_delete_files(table => 'db.pd')").head.getLong(0)
    assert(retired == 2, s"expected 2 sidecar files retired, got $retired")
    val after = GeoManifest.read(spark, root("pd"))
    assert(after.deletes.size == 1, s"expected one consolidated sidecar, got ${after.deletes}")
    assert(after.deletes.head.rows == 10, s"only grp=1's 10 live entries survive: ${after.deletes}")
    assert(after.files.map(_.path).toSet == mid.files.map(_.path).toSet,
      "data files must not be rewritten")
    assert(spark.sql("SELECT COUNT(*) FROM geoc.db.pd").head.getLong(0) == 180)
    assert(spark.sql("SELECT COUNT(*) FROM geoc.db.pd WHERE id % 10 = 7 AND grp = 1")
      .head.getLong(0) == 0, "consolidated sidecar must still delete grp=1's rows")
    // idempotent: already one file, nothing dangles
    assert(spark.sql("CALL geoc.system.rewrite_position_delete_files(table => 'db.pd')")
      .head.getLong(0) == 0)
    spark.sql("DROP TABLE geoc.db.pd")
  }

  test("ancestors_of returns the lineage newest-first as a real result set") {
    wh
    spark.sql("DROP TABLE IF EXISTS geoc.db.anc")
    spark.sql("CREATE TABLE geoc.db.anc (id BIGINT) USING geo")
    spark.sql("INSERT INTO geoc.db.anc SELECT id FROM range(2)")
    spark.sql("INSERT INTO geoc.db.anc SELECT id FROM range(2, 4)")
    val rows = spark.sql("CALL geoc.system.ancestors_of(table => 'db.anc')")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.map(_._1).toSeq == rows.map(_._1).sorted.reverse.toSeq, "not newest-first")
    assert(rows.length == GeoManifest.read(spark, root("anc")).version + 1 ||
      rows.length == GeoManifest.read(spark, root("anc")).version) // create may or may not commit v0 rows
    assert(rows.forall(_._2 > 0L), "commit timestamps missing")
    // the optional starting snapshot (Iceberg's signature) walks lineage
    // from THERE, newest first
    val mid = rows.map(_._1).max - 1
    val fromMid = spark.sql(s"CALL geoc.system.ancestors_of(" +
      s"table => 'db.anc', snapshot_id => $mid)").collect().map(_.getLong(0))
    assert(fromMid.headOption.contains(mid) && fromMid.forall(_ <= mid),
      s"lineage from $mid wrong: ${fromMid.toSeq}")
    // the LongType snapshot ids ancestors_of emits bind straight back into
    // rollback_to_snapshot (Iceberg takes bigint too) — advice regression
    val oldest = rows.map(_._1).min
    spark.sql(s"CALL geoc.system.rollback_to_snapshot(table => 'db.anc', " +
      s"snapshot_id => CAST($oldest AS BIGINT))")
    assert(GeoManifest.read(spark, root("anc")).files.map(_.rows).sum ==
      (if (oldest == 0L) 0L else 2L))
    spark.sql("DROP TABLE geoc.db.anc")
  }

  test("publish_changes / fast_forward publish a staged branch; divergence refuses") {
    wh
    spark.sql("DROP TABLE IF EXISTS geoc.db.wap")
    spark.sql("CREATE TABLE geoc.db.wap (id BIGINT) USING geo")
    spark.sql("INSERT INTO geoc.db.wap SELECT id FROM range(4)")
    GeoSql.exec(spark, "ALTER TABLE geoc.db.wap CREATE BRANCH st")
    spark.sql("INSERT INTO geoc.db.wap.branch_st SELECT id FROM range(4, 9)")
    // main still sees the pre-stage rows until the CALL publishes
    assert(spark.sql("SELECT COUNT(*) FROM geoc.db.wap").head.getLong(0) == 4)
    spark.sql("CALL geoc.system.publish_changes(table => 'db.wap', branch => 'st')")
    assert(spark.sql("SELECT COUNT(*) FROM geoc.db.wap").head.getLong(0) == 9)

    // fast_forward spelling: main -> branch head (Iceberg's signature)
    spark.sql("INSERT INTO geoc.db.wap.branch_st SELECT id FROM range(9, 11)")
    spark.sql("CALL geoc.system.fast_forward(table => 'db.wap', " +
      "branch => 'main', to => 'st')")
    assert(spark.sql("SELECT COUNT(*) FROM geoc.db.wap").head.getLong(0) == 11)
    // only main can be fast-forwarded, and divergence refuses
    val e1 = intercept[Exception] { spark.sql(
      "CALL geoc.system.fast_forward(table => 'db.wap', branch => 'st', to => 'main')") }
    assert(e1.getMessage.contains("main"))
    spark.sql("INSERT INTO geoc.db.wap SELECT id FROM range(11, 12)") // main moves
    val e2 = intercept[Exception] { spark.sql(
      "CALL geoc.system.publish_changes(table => 'db.wap', branch => 'st')") }
    assert(e2.getMessage.contains("fork point") || e2.getMessage.contains("moved"))
    spark.sql("DROP TABLE geoc.db.wap")
  }

  test("expire_snapshots older_than expires by age; retain_last floors the keep set") {
    wh
    val utc = GeoSql.formatUtcMillis _
    spark.sql("DROP TABLE IF EXISTS geoc.db.exp")
    spark.sql("CREATE TABLE geoc.db.exp (id BIGINT) USING geo")
    for (i <- 0 until 3) {
      spark.sql(s"INSERT INTO geoc.db.exp SELECT id FROM range(${i * 10}, ${i * 10 + 10})")
      Thread.sleep(5) // commit timestamps must order strictly for the age legs
    }
    val ts2 = GeoManifest.commitTsOf(spark, root("exp"), 2)
    assert(GeoManifest.commitTsOf(spark, root("exp"), 1) < ts2, "need distinct commit ts")
    spark.sql(s"CALL geoc.system.expire_snapshots(table => 'db.exp', " +
      s"older_than => '${utc(ts2)}')")
    // v1 is older than the cutoff -> expired; v2 (== cutoff) and v3 survive
    intercept[Exception](
      spark.sql("SELECT COUNT(*) FROM geoc.db.exp VERSION AS OF 1").collect())
    assert(spark.sql("SELECT COUNT(*) FROM geoc.db.exp VERSION AS OF 2")
      .head.getLong(0) == 20)
    // age alone would expire EVERYTHING below; retain_last floors it at 2
    spark.sql("CALL geoc.system.expire_snapshots(table => 'db.exp', " +
      "older_than => '2100-01-01 00:00:00', retain_last => 2)")
    assert(spark.sql("SELECT COUNT(*) FROM geoc.db.exp VERSION AS OF 2")
      .head.getLong(0) == 20, "retain_last must keep the second-newest snapshot")
    assert(spark.sql("SELECT COUNT(*) FROM geoc.db.exp").head.getLong(0) == 30)
    spark.sql("DROP TABLE geoc.db.exp")
  }

  test("set_current_snapshot moves the pointer by id or ref, exactly one of them") {
    wh
    spark.sql("DROP TABLE IF EXISTS geoc.db.scs")
    spark.sql("CREATE TABLE geoc.db.scs (id BIGINT) USING geo")
    spark.sql("INSERT INTO geoc.db.scs SELECT id FROM range(3)")
    spark.sql("INSERT INTO geoc.db.scs SELECT id FROM range(3, 7)")
    val v2 = GeoManifest.read(spark, root("scs")).version
    spark.sql("CALL geoc.system.create_tag(table => 'db.scs', tag => 'seven')")
    // backward by snapshot id...
    spark.sql(s"CALL geoc.system.set_current_snapshot(table => 'db.scs', " +
      s"snapshot_id => CAST(${v2 - 1} AS BIGINT))")
    assert(spark.sql("SELECT COUNT(*) FROM geoc.db.scs").head.getLong(0) == 3)
    // ...and forward again by ref (tags resolve exactly as VERSION AS OF)
    spark.sql("CALL geoc.system.set_current_snapshot(table => 'db.scs', ref => 'seven')")
    assert(spark.sql("SELECT COUNT(*) FROM geoc.db.scs").head.getLong(0) == 7)
    // exactly one selector: neither and both are named errors
    val e1 = intercept[Exception](spark.sql(
      "CALL geoc.system.set_current_snapshot(table => 'db.scs')"))
    assert(e1.getMessage.contains("exactly one"), e1.getMessage)
    val e2 = intercept[Exception](spark.sql(
      "CALL geoc.system.set_current_snapshot(table => 'db.scs', " +
        "snapshot_id => CAST(1 AS BIGINT), ref => 'seven')"))
    assert(e2.getMessage.contains("exactly one"), e2.getMessage)
    spark.sql("DROP TABLE geoc.db.scs")
  }

  test("snapshot onboards an existing table's parquet files zero-copy") {
    wh
    val dir = java.nio.file.Files.createTempDirectory("call_snap").toString + "/src"
    spark.range(20).selectExpr("id", "CAST(id % 4 AS BIGINT) AS nat").write.parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("snap_src")
    spark.sql("CALL geoc.system.snapshot(table => 'db.snp', source_table => 'snap_src')")
    assert(spark.sql("SELECT COUNT(*) FROM geoc.db.snp").head.getLong(0) == 20)
    // zero-copy: version 0 references the SOURCE files by absolute path
    val srcFiles = spark.read.parquet(dir).inputFiles
      .map(_.stripPrefix("file:")).toSet
    val refd = GeoManifest.read(spark, root("snp")).files
      .map(f => f.path.stripPrefix("file:")).toSet
    assert(refd == srcFiles, s"expected $srcFiles got $refd")
    // snapshot creates NEW tables only; non-parquet sources refuse
    val e = intercept[Exception](spark.sql(
      "CALL geoc.system.snapshot(table => 'db.snp', source_table => 'snap_src')"))
    assert(e.getMessage.contains("already exists"), e.getMessage)
    spark.sql("DROP TABLE geoc.db.snp")
  }

  test("CALL works on vanilla sessions through GeoSql.exec") {
    wh
    spark.sql("DROP TABLE IF EXISTS geoc.db.t3")
    spark.sql("CREATE TABLE geoc.db.t3 (id BIGINT) USING geo")
    spark.sql("INSERT INTO geoc.db.t3 SELECT id FROM range(3)")
    spark.sql("INSERT INTO geoc.db.t3 SELECT id FROM range(3, 6)")
    GeoSql.exec(spark,
      "CALL geoc.system.rewrite_data_files(table => 'db.t3', target_file_count => 1)")
    assert(GeoManifest.read(spark, root("t3")).files.size == 1)
    spark.sql("DROP TABLE geoc.db.t3")
  }
}
