package graft

import graft.functions.GraftFunctions._
import graft.tables.{GeoManifest, GeoSchema, GeoSql, GeoTable}

import org.apache.spark.sql.functions._
import org.locationtech.jts.geom.Envelope

/** Copy-on-write mechanics, file-level manifest pruning, and GEOMETRY
  * typing for GeoTable (SURVEY.md §2.8; the table-format capability match
  * for the reference's Iceberg DML — TestSedonaIcebergExtension.scala:85). */
class GeoTableSpec extends SparkSpec {
  import spark.implicits._

  private def tmpRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"geotable_$tag").toString + "/t"

  /** 100 points on a line, written as ~5 files clustered by x. */
  private def pointTable(root: String, nFiles: Int = 5): Unit = {
    val df = spark.range(100).toDF("id")
      .withColumn("flag", lit(0))
      .withColumn("geo", st_point(col("id").cast("double"), lit(0.0)))
      .repartitionByRange(nFiles, col("id"))
    GeoTable.create(spark, root, df, Some("geo"))
  }

  test("update rewrites only affected files; untouched files carry over by reference") {
    val root = tmpRoot("cow")
    pointTable(root)
    val before = GeoManifest.read(spark, root)
    assert(before.files.size >= 3, s"want a multi-file table, got ${before.files.size}")

    // touch only x in [10.5, 19.5] -> one or two files
    val n = GeoTable.update(spark, root,
      Seq("flag" -> lit(1)),
      expr("st_within(geo, st_makeenvelope(10.5D, -1.0D, 19.5D, 1.0D))"))
    assert(n == 9, s"rows 11..19 strictly inside, got $n")

    val after = GeoManifest.read(spark, root)
    assert(after.version == before.version + 1)
    val carried = after.files.map(_.key).toSet.intersect(before.files.map(_.key).toSet)
    assert(carried.nonEmpty, "untouched files must be carried over, not rewritten")
    assert(carried.size < before.files.size, "affected files must be replaced")

    val flags = GeoTable.read(spark, root).select("id", "flag").as[(Long, Int)].collect().toMap
    (0L until 100L).foreach(i => assert(flags(i) == (if (i >= 11 && i <= 19) 1 else 0), s"id $i"))
  }

  test("wkt preview: GeoDisplay.pretty and the scan conf render geometry readably") {
    val root = tmpRoot("wkt")
    pointTable(root)
    // pretty(): geometry column becomes WKT text under its own name
    val pretty = graft.tables.GeoDisplay.pretty(GeoTable.read(spark, root))
    assert(pretty.schema("geo").dataType.typeName == "string")
    assert(pretty.where(col("id") === 3).head.getAs[String]("geo") == "POINT (3 0)")
    // scan conf: additive <geom>_wkt sibling, WKB column untouched
    try {
      spark.conf.set(graft.tables.GeoDisplay.WktPreviewConf, "true")
      val scanned = GeoTable.scan(spark, root, col("id") === 3)
      assert(scanned.columns.contains("geo_wkt"))
      assert(scanned.schema("geo").dataType.typeName == "binary")
      assert(scanned.head.getAs[String]("geo_wkt") == "POINT (3 0)")
    } finally spark.conf.unset(graft.tables.GeoDisplay.WktPreviewConf)
    // conf off: no preview column
    assert(!GeoTable.scan(spark, root, col("id") === 3).columns.contains("geo_wkt"))
  }

  test("update evaluates SET expressions against pre-update rows") {
    val root = tmpRoot("swap")
    GeoTable.create(spark, root,
      Seq((1, 10, 20)).toDF("id", "a", "b"), None)
    GeoTable.update(spark, root, Seq("a" -> col("b"), "b" -> col("a")), lit(true))
    val r = GeoTable.read(spark, root).select("a", "b").as[(Int, Int)].head()
    assert(r == ((20, 10)), s"swap must read old values, got $r")
  }

  test("delete drops fully-matched files as metadata only") {
    val root = tmpRoot("del")
    pointTable(root)
    val before = GeoManifest.read(spark, root)
    val firstFile = before.files.minBy(_.xmin)
    // delete everything in the first file's x-range (file bbox is [xmin,xmax])
    val n = GeoTable.delete(spark, root,
      expr(s"st_x(geo) >= ${firstFile.xmin} AND st_x(geo) <= ${firstFile.xmax}"))
    assert(n == firstFile.rows)
    val after = GeoManifest.read(spark, root)
    // pure metadata drop: no new files were written
    assert(after.files.map(_.key).toSet.subsetOf(before.files.map(_.key).toSet))
    assert(after.totalRows == before.totalRows - firstFile.rows)
  }

  test("scan prunes files from manifest bbox before opening footers") {
    val root = tmpRoot("prune")
    pointTable(root)
    val m = GeoManifest.read(spark, root)
    // envelope covering only x in [30.5, 33.5] -> one file of ~20
    val pruned = GeoTable.scan(spark, root,
      expr("st_within(geo, st_makeenvelope(30.5D, -1.0D, 33.5D, 1.0D))"))
    val readFiles = pruned.inputFiles.map(GeoManifest.norm).toSet
    assert(readFiles.size < m.files.size,
      s"expected file-level pruning: read ${readFiles.size} of ${m.files.size}")
    assert(pruned.select("id").as[Long].collect().sorted.toSeq == Seq(31L, 32L, 33L))
    // readPruned agrees with the manifest's own prune
    val env = new Envelope(30.5, 33.5, -1.0, 1.0)
    assert(m.prune(env).size == readFiles.size)
  }

  test("GEOMETRY metadata: DDL parse, parquet roundtrip, validate rejects drift") {
    val schema = GeoSchema.fromDdl("id INT, data STRING, geo GEOMETRY, alt GEOMETRY('EPSG:3857')")
    assert(GeoSchema.geometryColumns(schema) == Seq("geo" -> "EPSG:4326", "alt" -> "EPSG:3857"))
    assert(schema("geo").dataType == org.apache.spark.sql.types.BinaryType)

    // roundtrip through parquet
    val dir = tmpRoot("meta")
    val df = GeoSchema.markGeometry(
      spark.range(3).toDF("id").withColumn("geo", st_point(lit(1.0), lit(2.0))), "geo", "EPSG:3857")
    df.write.parquet(dir)
    val back = spark.read.parquet(dir)
    assert(GeoSchema.geometryColumns(back.schema) == Seq("geo" -> "EPSG:3857"))

    // validate: geometry-tagged non-binary must be rejected
    val bad = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("geo", org.apache.spark.sql.types.StringType,
        metadata = GeoSchema.geometryMetadata())))
    intercept[IllegalArgumentException](GeoSchema.validate(bad))
  }

  test("opaque binary rejected in ST_ functions at analysis time") {
    val df = GeoSchema.markOpaque(
      spark.range(3).toDF("id").withColumn("payload", lit("img".getBytes)), "payload")
    df.createOrReplaceTempView("opaque_blobs")
    val err = intercept[Exception](
      spark.sql("SELECT st_astext(payload) FROM opaque_blobs").collect())
    assert(err.getMessage.contains("opaque"), s"got: ${err.getMessage}")
  }

  test("SQL front-half via GeoSql.exec works without the injected parser") {
    val root = tmpRoot("exec")
    pointTable(root)
    GeoTable.register(spark, "exec_pts", root)
    try {
      val n = GeoSql.exec(spark,
        "UPDATE exec_pts SET flag = 2 WHERE st_dwithin(geo, st_point(50.0D, 0.0D), 2.5D)")
        .head().getLong(0)
      assert(n == 5) // x in 48..52
      assert(spark.table("exec_pts").where(col("flag") === 2).count() == 5)
      val d = GeoSql.exec(spark, "DELETE FROM exec_pts WHERE flag = 2").head().getLong(0)
      assert(d == 5)
      assert(spark.table("exec_pts").count() == 95)
    } finally GeoTable.drop(spark, "exec_pts")
  }

  test("multi-column SET with expressions and commas inside calls") {
    val root = tmpRoot("sets")
    GeoTable.create(spark, root,
      Seq((1, 0.0, "x"), (2, 0.0, "y")).toDF("id", "v", "s"), None)
    GeoTable.register(spark, "set_t", root)
    try {
      GeoSql.exec(spark,
        "UPDATE set_t SET v = round(1.234, 1), s = concat(s, '_u') WHERE id = 1")
      val rows = spark.table("set_t").orderBy("id").as[(Int, Double, String)].collect().toSeq
      assert(rows == Seq((1, 1.2, "x_u"), (2, 0.0, "y")))
    } finally GeoTable.drop(spark, "set_t")
  }

  test("zorder layout makes file pruning effective on scattered data") {
    // scattered 2-D points: without zorder every file spans the full
    // extent and the manifest can prune nothing
    def scattered = spark.range(2000).toDF("id")
      .withColumn("geo", st_point(
        pmod(hash(col("id")), lit(1000)).cast("double") / 10.0,
        pmod(hash(col("id"), lit(1)), lit(1000)).cast("double") / 10.0))
      .repartition(8)
    val plain = tmpRoot("plainlayout"); val zord = tmpRoot("zorderlayout")
    GeoTable.create(spark, plain, scattered, Some("geo"))
    GeoTable.create(spark, zord, scattered, Some("geo"), zorder = true, cellSize = 10.0)
    val env = new Envelope(10.5, 20.5, 10.5, 20.5) // ~1% of the extent
    val plainHit = GeoManifest.read(spark, plain).prune(env).size
    val zordHit = GeoManifest.read(spark, zord).prune(env).size
    assert(plainHit == GeoManifest.read(spark, plain).files.size,
      "scattered layout: every file intersects (that is the point)")
    assert(zordHit < plainHit, s"zorder must prune files: $zordHit vs $plainHit")
    // same rows either way
    val q = expr("st_within(geo, st_makeenvelope(10.5D, 10.5D, 20.5D, 20.5D))")
    assert(GeoTable.scan(spark, zord, q).count() == GeoTable.scan(spark, plain, q).count())
  }

  test("compact rewrites the snapshot into fewer files; vacuum removes dead ones") {
    val root = tmpRoot("compact")
    pointTable(root, nFiles = 5)
    GeoTable.update(spark, root, Seq("flag" -> lit(1)),
      expr("st_within(geo, st_makeenvelope(10.5D, -1.0D, 19.5D, 1.0D))"))
    val before = GeoManifest.read(spark, root)
    GeoTable.compact(spark, root, targetFiles = 2)
    val after = GeoManifest.read(spark, root)
    assert(after.files.size <= 2 && after.totalRows == before.totalRows)
    assert(GeoTable.read(spark, root).where(col("flag") === 1).count() == 9)

    // all pre-compaction files are now dead in the current version
    val removed = GeoTable.vacuum(spark, root, keepVersions = 1)
    assert(removed > 0, "vacuum must delete unreferenced files")
    // current snapshot unharmed, old manifests gone
    assert(GeoTable.read(spark, root).count() == 100)
    intercept[Exception](GeoManifest.readVersion(spark, root, before.version - 1))
  }

  test("importParquet/addFiles register existing parquet by reference — no rewrite") {
    val base = java.nio.file.Files.createTempDirectory("geo_import").toString
    val (dirA, dirB, root) = (s"$base/a", s"$base/b", s"$base/t")
    spark.range(100).select($"id", ($"id" % 7).as("w"))
      .repartitionByRange(3, $"id").write.parquet(dirA)
    spark.range(100, 150).select($"id", ($"id" % 7).as("w"))
      .coalesce(1).write.parquet(dirB)
    val extA = spark.read.parquet(dirA).inputFiles.toSet

    assert(GeoTable.importParquet(spark, root, dirA) == 100L)
    val m0 = GeoManifest.read(spark, root)
    // referenced IN PLACE: the manifest points at the external files
    assert(m0.files.map(f => GeoManifest.norm(f.path)).toSet ==
      extA.map(GeoManifest.norm))
    assert(GeoTable.read(spark, root).count() == 100)
    // auto stats transforms make the imported layout prunable at once —
    // assert on the PLAN's file index (a result-side input_file_name
    // count is vacuous: it only sees files that held matching rows)
    val planned = GeoTable.scan(spark, root, $"id" < 10)
      .queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.inputFiles.length
      }.sum
    assert(planned > 0 && planned < m0.files.size,
      s"range scan must plan over a pruned file list ($planned of ${m0.files.size})")

    assert(GeoTable.addFiles(spark, root,
      spark.read.parquet(dirB).inputFiles.toSeq) == 50L)
    assert(GeoTable.read(spark, root).count() == 150)
    // re-adding a referenced path would duplicate rows — rejected
    intercept[IllegalArgumentException] {
      GeoTable.addFiles(spark, root, spark.read.parquet(dirB).inputFiles.toSeq)
    }
    // a file physically missing a table column is corruption-by-null
    // under name-based resolution — the footer check rejects it loudly
    val dirC = s"$base/c"
    spark.range(150, 160).select($"id").coalesce(1).write.parquet(dirC)
    val noW = intercept[IllegalArgumentException] {
      GeoTable.addFiles(spark, root, spark.read.parquet(dirC).inputFiles.toSeq)
    }
    assert(noW.getMessage.contains("lacks column"), noW.getMessage)
    assert(GeoTable.read(spark, root).count() == 150)
    // DML composes: a CoW delete rewrites INTO the table's own data dir,
    // dropping external files from the manifest without deleting them
    // (they live outside <root>/data — the caller keeps ownership),
    // and vacuum never sweeps them either
    GeoTable.delete(spark, root, $"id" === 120L, mode = "cow")
    assert(GeoTable.read(spark, root).count() == 149)
    GeoTable.vacuum(spark, root, keepVersions = 1)
    val fs = GeoManifest.fs(spark, root)
    assert(extA.forall(p => fs.exists(new org.apache.hadoop.fs.Path(p))),
      "vacuum must never delete externally-owned imported files")
    assert(GeoTable.read(spark, root).count() == 149)
    // the SQL verb (Iceberg add_files procedure analog) takes the same
    // path: registered-name tables onboard by reference through ALTER
    val dirD = s"$base/d"
    spark.range(200, 220).select($"id", ($"id" % 7).as("w"))
      .coalesce(1).write.parquet(dirD)
    GeoTable.register(spark, "imp_sql_t", root)
    try {
      val files = spark.read.parquet(dirD).inputFiles
      val n = GeoSql.exec(spark,
        s"ALTER TABLE imp_sql_t ADD FILES ${files.map(f => s"'$f'").mkString(", ")}")
      assert(n.head.getLong(0) == 20L, s"ADD FILES returned $n")
      assert(GeoTable.read(spark, root).count() == 169)
    } finally GeoTable.drop(spark, "imp_sql_t")
  }

  test("vacuum's orphan sweep has an age grace: in-flight writer files survive") {
    val root = tmpRoot("vacgrace")
    pointTable(root, nFiles = 3)
    GeoTable.compact(spark, root, targetFiles = 1) // v1: v0's files become committed garbage
    val fs = GeoManifest.fs(spark, root)
    val dataDir = new org.apache.hadoop.fs.Path(root, "data")
    val sub = fs.listStatus(dataDir).filter(_.isDirectory).head.getPath

    // simulate an IN-FLIGHT writer: data files land BEFORE the manifest
    // commit takes the lock, so at vacuum time they are referenced by
    // nothing. A fresh-mtime orphan must survive the sweep; an orphan
    // older than the grace window is dead weight and falls.
    val freshOrphan = new org.apache.hadoop.fs.Path(sub, "part-inflight-fresh.parquet")
    val staleOrphan = new org.apache.hadoop.fs.Path(sub, "part-inflight-stale.parquet")
    val tmp = java.nio.file.Files.createTempDirectory("vacgrace_w").toString + "/p"
    spark.range(5).toDF("id").withColumn("flag", lit(9))
      .withColumn("geo", st_point(col("id").cast("double"), lit(0.0)))
      .coalesce(1).write.parquet(tmp)
    val written = GeoManifest.listParquet(spark, tmp).head
    fs.copyFromLocalFile(new org.apache.hadoop.fs.Path(written), freshOrphan)
    fs.copyFromLocalFile(new org.apache.hadoop.fs.Path(written), staleOrphan)
    fs.setTimes(staleOrphan, System.currentTimeMillis() - 4L * 24 * 3600 * 1000, -1)

    val removed = GeoTable.vacuum(spark, root, keepVersions = 1)
    // committed garbage (v0's files) AND the stale orphan fall; the fresh
    // orphan — a concurrent writer's uncommitted data — survives
    assert(removed >= 3, s"expected v0 files + stale orphan removed, got $removed")
    assert(fs.exists(freshOrphan), "fresh unreferenced file must survive the grace window")
    assert(!fs.exists(staleOrphan), "orphan older than the grace window must be deleted")

    // the concurrent-commit shape end-to-end: the surviving file's commit
    // (taken AFTER the vacuum) must publish a snapshot that reads intact
    val m = GeoManifest.read(spark, root)
    val entries = GeoManifest.collectStats(spark, m.schema,
      Seq(freshOrphan.toString), m.geomCol, m.partitions)
    GeoManifest.commit(spark, root,
      m.copy(version = m.version + 1, files = m.files ++ entries), m.version)
    assert(GeoTable.read(spark, root).count() == 105)
    assert(GeoTable.read(spark, root).where(col("flag") === 9).count() == 5)

    // grace 0 (a known-quiesced table): the remaining orphan falls too
    try {
      spark.conf.set("spark.graft.vacuum.orphanGraceMs", "0")
      // drop the commit so the file is unreferenced again
      val m2 = GeoManifest.read(spark, root)
      GeoManifest.commit(spark, root,
        m2.copy(version = m2.version + 1,
          files = m2.files.filterNot(_.key == GeoManifest.norm(freshOrphan.toString))),
        m2.version)
      val removed2 = GeoTable.vacuum(spark, root, keepVersions = 1)
      assert(removed2 >= 1 && !fs.exists(freshOrphan),
        "grace 0 must sweep fresh orphans immediately")
    } finally spark.conf.unset("spark.graft.vacuum.orphanGraceMs")
  }

  test("SHALLOW CLONE references source files; evolves and vacuums independently") {
    val src = tmpRoot("clone_src")
    GeoTable.create(spark, src,
      spark.range(200).select(col("id"), (col("id") % 5).as("nat")), None) // v0
    GeoTable.append(spark, src,
      spark.range(200, 300).select(col("id"), (col("id") % 5).as("nat")))  // v1
    GeoTable.delete(spark, src, col("id") % 9 === 0L, mode = "mor")        // v2: sidecar
    val srcFiles = GeoManifest.read(spark, src).files.map(_.key).toSet

    // clone at current: same content, zero data copied, shared paths
    val tgt = tmpRoot("clone_tgt")
    val v = GeoTable.shallowClone(spark, src, tgt)
    assert(v == 2)
    val cm = GeoManifest.read(spark, tgt)
    assert(cm.version == 2 && cm.files.map(_.key).toSet == srcFiles)
    assert(cm.deletes.nonEmpty, "the MoR sidecar is shared too")
    def rows(root: String): Set[Long] =
      GeoTable.read(spark, root).select("id").collect().map(_.getLong(0)).toSet
    assert(rows(tgt) == rows(src))
    assert(!new java.io.File(tgt + "/data").exists() ||
      new java.io.File(tgt + "/data").list().isEmpty, "zero-copy: no data under the clone")

    // clone at an older version
    val tgt1 = tmpRoot("clone_tgt1")
    GeoTable.shallowClone(spark, src, tgt1, versionAsOf = Some(1))
    assert(rows(tgt1) == (0L until 300L).toSet)

    // independent evolution: writes land under the clone, source untouched
    GeoTable.append(spark, tgt, spark.range(1000, 1010)
      .select(col("id"), (col("id") % 5).as("nat")))                       // clone v3
    GeoTable.delete(spark, tgt, col("id") === 7L, mode = "cow")            // clone v4
    assert(rows(src) == (0L until 300L).filterNot(_ % 9 == 0).toSet, "source unchanged")
    // the v2 position sidecar scopes to the files it names: rows appended
    // AFTER the clone (1000-1009, including 1008 = 9*112) are untouched
    assert(rows(tgt) == ((0L until 300L).filterNot(_ % 9 == 0)
      ++ (1000L until 1010L)).filterNot(_ == 7L).toSet)
    // eq-delete sequencing survives the version carry-over: an upsert's
    // own rows outlive its delete leg
    GeoTable.upsertByKey(spark, tgt, Seq("id"),
      spark.range(1000, 1005).select(col("id"), lit(-1L).as("nat")))       // clone v5
    assert(GeoTable.read(spark, tgt).where(col("nat") === -1L).count() == 5)

    // the clone's vacuum only sweeps its OWN data dir: shared source
    // files survive even when the clone no longer references them
    GeoTable.compact(spark, tgt, targetFiles = 2)                          // re-homes all rows
    val removed = GeoTable.vacuum(spark, tgt, keepVersions = 1)
    assert(rows(src) == (0L until 300L).filterNot(_ % 9 == 0).toSet,
      s"source must survive the clone's vacuum (removed $removed clone files)")
    assert(GeoManifest.read(spark, src).files.map(_.key).toSet == srcFiles)

    // SQL verb through catalog names (target derives from the warehouse)
    spark.conf.set("spark.sql.catalog.geocl2", classOf[graft.tables.GeoCatalog].getName)
    val wh = java.nio.file.Files.createTempDirectory("geo_cl2_wh").toString
    spark.conf.set("spark.sql.catalog.geocl2.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS geocl2.db")
    spark.sql("CREATE TABLE geocl2.db.src (id BIGINT, nat BIGINT) USING geo")
    spark.sql("INSERT INTO geocl2.db.src SELECT id, id % 3 FROM range(0, 50)")
    GeoSql.exec(spark, "CREATE TABLE geocl2.db.dup SHALLOW CLONE geocl2.db.src")
    assert(spark.table("geocl2.db.dup").count() == 50)
    // cloning onto an existing table is refused
    val err = intercept[Exception](
      GeoSql.exec(spark, "CREATE TABLE geocl2.db.dup SHALLOW CLONE geocl2.db.src"))
    assert(err.getMessage.contains("already exists"))
  }

  test("INSERT with explicit column list reorders and NULL-fills") {
    val root = tmpRoot("inscols")
    spark.sql(s"CREATE TABLE ins_t (id INT, data STRING, geo GEOMETRY) USING GEO LOCATION '$root'")
    try {
      GeoSql.exec(spark, "INSERT INTO ins_t (geo, id) SELECT st_point(1.0D, 2.0D), 7")
      val r = spark.table("ins_t").selectExpr("id", "data", "st_astext(geo)").head()
      assert(r.getInt(0) == 7 && r.isNullAt(1) && r.getString(2) == "POINT (1 2)")
      val err = intercept[Exception](
        GeoSql.exec(spark, "INSERT INTO ins_t (nope) VALUES (1)"))
      assert(err.getMessage.contains("not in table"))
    } finally GeoTable.drop(spark, "ins_t")
  }

  test("GeoJSON ndjson source roundtrips features with properties") {
    import graft.sources.GeoJsonSource
    val dir = java.nio.file.Files.createTempDirectory("geojson").toString + "/f"
    val src = spark.range(5).toDF("id")
      .withColumn("name", concat(lit("pt_"), col("id")))
      .withColumn("geo", st_point(col("id").cast("double"), lit(2.0)))
    GeoJsonSource.writeFeatures(src, "geo", dir)
    val back = GeoJsonSource.readFeatures(spark, dir, Seq("id", "name"))
    assert(graft.tables.GeoSchema.isGeometry(back.schema("geometry")))
    val rows = back.selectExpr("CAST(id AS LONG)", "name", "st_astext(geometry)")
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(rows.length == 5)
    assert(rows(3) == ((3L, "pt_3", "POINT (3 2)")))
  }

  test("SQL front-half parsing edge cases") {
    val root = tmpRoot("parse")
    GeoTable.create(spark, root, Seq((1L, "x"), (2L, "y")).toDF("id", "s"), None)
    GeoTable.register(spark, "parse_t", root)
    try {
      // WHERE inside a string literal must not split the statement
      GeoSql.exec(spark, "UPDATE parse_t SET s = 'a WHERE b' WHERE id = 1")
      assert(spark.table("parse_t").where(col("id") === 1)
        .select("s").as[String].head() == "a WHERE b")
      // UPDATE without WHERE touches every row
      val n = GeoSql.exec(spark, "UPDATE parse_t SET s = upper(s)").head().getLong(0)
      assert(n == 2)
      // trailing semicolon + mixed case keywords
      val d = GeoSql.exec(spark, "delete from parse_t where id = 2;").head().getLong(0)
      assert(d == 1 && spark.table("parse_t").count() == 1)
      // statements on non-geo tables fall through to Spark's parser
      val err = intercept[Exception](spark.sql("UPDATE some_other_table SET a = 1"))
      assert(!err.getMessage.contains("graft"), s"must delegate: ${err.getMessage}")
    } finally GeoTable.drop(spark, "parse_t")
  }

  test("optimistic concurrency: a commit based on a stale version fails") {
    val root = tmpRoot("occ")
    pointTable(root)
    val stale = GeoManifest.read(spark, root) // snapshot at v0
    GeoTable.delete(spark, root, expr("id < 10")) // moves table to v1
    // a second writer still holding v0 must NOT be able to clobber v1
    intercept[java.util.ConcurrentModificationException] {
      GeoManifest.commit(spark, root,
        stale.copy(version = stale.version + 1), stale.version)
    }
    assert(GeoTable.read(spark, root).count() == 90, "first writer's commit intact")
  }

  test("snapshot isolation: previous version stays readable after DML") {
    val root = tmpRoot("snap")
    pointTable(root)
    val v0 = GeoManifest.read(spark, root).version
    GeoTable.delete(spark, root, expr("id < 50"))
    assert(GeoTable.read(spark, root).count() == 50)
    val old = GeoManifest.readVersion(spark, root, v0)
    assert(old.totalRows == 100, "old manifest must still describe the full snapshot")
    // time travel reads the pre-delete snapshot
    assert(GeoTable.readAt(spark, root, v0).count() == 100)
  }

  // -------------------------------------------------------------------------
  // MERGE INTO
  // -------------------------------------------------------------------------

  test("merge: update + delete + insert in one statement, file-level COW") {
    val root = tmpRoot("merge")
    pointTable(root) // ids 0..99, flag 0
    val before = GeoManifest.read(spark, root)
    GeoTable.register(spark, "merge_t", root)
    // source: ids 11..13 (update), 14..15 (delete), 200..201 (insert)
    Seq((11, 7), (12, 7), (13, 7), (14, -1), (15, -1), (200, 7), (201, 7))
      .toDF("sid", "sflag").createOrReplaceTempView("merge_src")
    try {
      val n = GeoSql.exec(spark,
        """MERGE INTO merge_t t USING merge_src s ON t.id = s.sid
          |WHEN MATCHED AND s.sflag < 0 THEN DELETE
          |WHEN MATCHED THEN UPDATE SET flag = s.sflag
          |WHEN NOT MATCHED THEN INSERT (id, flag, geo) VALUES (s.sid, s.sflag, st_point(CAST(s.sid AS DOUBLE), 0.0D))
          |""".stripMargin).head().getLong(0)
      assert(n == 7, s"3 updates + 2 deletes + 2 inserts, got $n")

      val rows = GeoTable.read(spark, root).select("id", "flag").as[(Long, Int)].collect().toMap
      assert(rows.size == 100, s"100 - 2 deleted + 2 inserted = 100, got ${rows.size}")
      Seq(11L, 12L, 13L).foreach(i => assert(rows(i) == 7, s"id $i updated"))
      Seq(14L, 15L).foreach(i => assert(!rows.contains(i), s"id $i deleted"))
      Seq(200L, 201L).foreach(i => assert(rows(i) == 7, s"id $i inserted"))
      // inserted geometry is real WKB
      val g = GeoTable.read(spark, root).where("id = 200")
        .select(expr("st_x(geo)")).as[Double].head()
      assert(g == 200.0)

      // COW: files not containing ids 11..15 carried over by reference
      val after = GeoManifest.read(spark, root)
      val carried = after.files.map(_.key).toSet.intersect(before.files.map(_.key).toSet)
      assert(carried.nonEmpty, "untouched files must carry over in MERGE")
    } finally GeoTable.drop(spark, "merge_t")
  }

  test("merge: first matching WHEN clause wins") {
    val root = tmpRoot("mergeorder")
    GeoTable.create(spark, root, Seq((1, 0), (2, 0)).toDF("id", "flag"), None)
    val src = Seq((1, 5), (2, 50)).toDF("sid", "sv")
    GeoTable.merge(spark, root, src, expr("t.id = s.sid"),
      matched = Seq(
        GeoTable.MergeUpdate(Some(expr("s.sv >= 10")), Seq("flag" -> lit(999))),
        GeoTable.MergeUpdate(None, Seq("flag" -> expr("s.sv")))),
      notMatched = Seq.empty)
    val rows = GeoTable.read(spark, root).as[(Int, Int)].collect().toMap
    assert(rows(1) == 5, "second clause applies when first condition fails")
    assert(rows(2) == 999, "first clause wins when its condition holds")
  }

  test("merge: cardinality violation (one target row, two source matches) rejected") {
    val root = tmpRoot("mergecard")
    GeoTable.create(spark, root, Seq((1, 0)).toDF("id", "flag"), None)
    val src = Seq((1, 5), (1, 6)).toDF("sid", "sv")
    val e = intercept[IllegalStateException] {
      GeoTable.merge(spark, root, src, expr("t.id = s.sid"),
        matched = Seq(GeoTable.MergeUpdate(None, Seq("flag" -> expr("s.sv")))),
        notMatched = Seq.empty)
    }
    assert(e.getMessage.contains("cardinality"))
  }

  test("merge: INSERT * maps source columns by name") {
    val root = tmpRoot("mergestar")
    GeoTable.create(spark, root, Seq((1, 10)).toDF("id", "flag"), None)
    GeoTable.register(spark, "merge_star_t", root)
    Seq((2, 20), (3, 30)).toDF("id", "flag").createOrReplaceTempView("merge_star_src")
    try {
      GeoSql.exec(spark,
        "MERGE INTO merge_star_t t USING merge_star_src s ON t.id = s.id " +
          "WHEN NOT MATCHED THEN INSERT *")
      val rows = GeoTable.read(spark, root).as[(Int, Int)].collect().toMap
      assert(rows == Map(1 -> 10, 2 -> 20, 3 -> 30))
    } finally GeoTable.drop(spark, "merge_star_t")
  }

  // -------------------------------------------------------------------------
  // CTAS + DROP TABLE (reference: example/.../App.scala:77, :42)
  // -------------------------------------------------------------------------

  test("CTAS: USING GEO AS SELECT creates a table; GEOMETRY metadata propagates") {
    val root = tmpRoot("ctas")
    pointTable(root)
    GeoTable.register(spark, "ctas_base", root)
    val ctasRoot = tmpRoot("ctas_out")
    try {
      val n = GeoSql.exec(spark,
        s"CREATE TABLE ctas_t USING GEO LOCATION '$ctasRoot' AS " +
          "SELECT id, geo FROM ctas_base WHERE id < 10").head().getLong(0)
      assert(n == 10)
      val m = GeoManifest.read(spark, ctasRoot)
      assert(m.geomCol.contains("geo"), s"geometry column must be detected, got ${m.geomCol}")
      assert(GeoSchema.isGeometry(m.schema("geo")), "GEOMETRY tag must survive CTAS")
      assert(spark.table("ctas_t").count() == 10)
    } finally { GeoTable.drop(spark, "ctas_t"); GeoTable.drop(spark, "ctas_base") }
  }

  test("CTAS: untagged binary from a raw ST_ expression is sniffed as geometry") {
    val ctasRoot = tmpRoot("ctas_sniff")
    try {
      GeoSql.exec(spark,
        s"CREATE TABLE ctas_sniff_t USING GEO LOCATION '$ctasRoot' AS " +
          "SELECT id, st_point(CAST(id AS DOUBLE), 1.0D) AS geo FROM range(5)")
      val m = GeoManifest.read(spark, ctasRoot)
      assert(m.geomCol.contains("geo"), "WKB sniffing must find the geometry column")
    } finally GeoTable.drop(spark, "ctas_sniff_t")
  }

  test("tag refs: lifecycle, VERSION AS OF 'ref', RESTORE from ref, vacuum pinning") {
    val wh = java.nio.file.Files.createTempDirectory("geo_refs_wh").toString
    spark.conf.set("spark.sql.catalog.georef", classOf[graft.tables.GeoCatalog].getName)
    spark.conf.set("spark.sql.catalog.georef.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS georef.db")
    spark.sql("CREATE TABLE georef.db.t (id BIGINT, v STRING) USING geo")
    spark.sql("INSERT INTO georef.db.t SELECT id, 'a' FROM range(0, 10)")   // v1
    val root = s"$wh/db/t"
    // SQL tag DDL pins v1; a second tag via the Scala API pins explicitly
    GeoSql.exec(spark, "ALTER TABLE georef.db.t CREATE TAG release-1")
    spark.sql("INSERT INTO georef.db.t SELECT id, 'b' FROM range(10, 25)")  // v2
    assert(GeoTable.createTag(spark, root, "v1.explicit", Some(1)) == 1)
    assert(GeoManifest.tags(spark, root) ==
      Map("release-1" -> 1, "v1.explicit" -> 1))
    // re-tagging the same version is idempotent; a different one is an error
    GeoSql.exec(spark, "ALTER TABLE georef.db.t CREATE TAG release-1 AS OF VERSION 1")
    assert(intercept[IllegalArgumentException] {
      GeoTable.createTag(spark, root, "release-1", Some(2))
    }.getMessage.contains("already points"))

    // VERSION AS OF 'ref' resolves through the tag; unknown refs say so
    assert(spark.sql("SELECT COUNT(*) FROM georef.db.t VERSION AS OF 'release-1'")
      .head.getLong(0) == 10)
    assert(spark.sql("SELECT COUNT(*) FROM georef.db.t").head.getLong(0) == 25)
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM georef.db.t VERSION AS OF 'nope'").collect()
    }
    assert(e.getMessage.contains("neither a snapshot version nor a ref"), e.getMessage)
    // the refs metadata table lists them
    val refs = spark.sql("SELECT name, type, version FROM georef.db.t.refs ORDER BY name")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSeq
    assert(refs == Seq(("release-1", "TAG", 1), ("v1.explicit", "TAG", 1)))

    // vacuum keeps the TAGGED snapshot alive past the retention window
    spark.sql("INSERT INTO georef.db.t SELECT id, 'c' FROM range(25, 30)")  // v3
    GeoTable.vacuum(spark, root, keepVersions = 1)
    assert(spark.sql("SELECT COUNT(*) FROM georef.db.t VERSION AS OF 'release-1'")
      .head.getLong(0) == 10, "tagged snapshot must survive vacuum")
    // ...while the untagged v2 is gone
    assert(intercept[Exception] {
      spark.sql("SELECT * FROM georef.db.t VERSION AS OF 2").collect()
    } != null)

    // RESTORE from the ref rolls the table back to the tagged state
    GeoSql.exec(spark, "RESTORE TABLE georef.db.t TO VERSION AS OF 'release-1'")
    assert(spark.sql("SELECT COUNT(*) FROM georef.db.t").head.getLong(0) == 10)

    // dropping the tag releases the pin; tagging a vacuumed version fails
    GeoSql.exec(spark, "ALTER TABLE georef.db.t DROP TAG release-1")
    assert(GeoManifest.tags(spark, root).keySet == Set("v1.explicit"))
    assert(intercept[IllegalArgumentException] {
      GeoTable.createTag(spark, root, "ghost", Some(2))
    }.getMessage.contains("vacuumed"))
  }

  test("branch refs: write-audit-publish — stage, read by ref, publish, diverge") {
    val wh = java.nio.file.Files.createTempDirectory("geo_wap_wh").toString
    spark.conf.set("spark.sql.catalog.geowap", classOf[graft.tables.GeoCatalog].getName)
    spark.conf.set("spark.sql.catalog.geowap.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS geowap.db")
    spark.sql("CREATE TABLE geowap.db.t (id BIGINT, v STRING) USING geo")
    spark.sql("INSERT INTO geowap.db.t SELECT id, 'main' FROM range(0, 20)")  // v1
    val root = s"$wh/db/t"

    // stage two commits on a branch — one via the Scala API, one via the
    // SQL branch-table spelling: main is untouched, the ref sees both
    GeoSql.exec(spark, "ALTER TABLE geowap.db.t CREATE BRANCH stage")
    GeoTable.appendToBranch(spark, root, "stage",
      spark.range(100, 110).select($"id", lit("staged").as("v")))
    spark.sql("INSERT INTO geowap.db.t.branch_stage " +
      "SELECT id, 'staged' FROM range(110, 115)")
    assert(spark.sql("SELECT COUNT(*) FROM geowap.db.t").head.getLong(0) == 20,
      "main must not see staged commits")
    assert(spark.sql("SELECT COUNT(*) FROM geowap.db.t VERSION AS OF 'stage'")
      .head.getLong(0) == 35, "the branch ref reads the staged state")
    // the branch TABLE reads the same staged head
    assert(spark.sql("SELECT COUNT(*) FROM geowap.db.t.branch_stage")
      .head.getLong(0) == 35, "branch-table read sees the staged state")
    // an insert into a nonexistent branch is a clean resolution error
    assert(intercept[Exception] {
      spark.sql("INSERT INTO geowap.db.t.branch_ghost SELECT id, 'x' FROM range(0, 1)")
    } != null)
    val refs = spark.sql("SELECT name, type, version FROM geowap.db.t.refs")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(refs == Seq(("stage", "BRANCH")), s"got $refs")

    // audit failed? nothing to undo — main never moved. Audit passed:
    // publish fast-forwards the pointer, one metadata write
    val head = GeoSql.exec(spark, "ALTER TABLE geowap.db.t PUBLISH BRANCH stage")
      .head().getLong(0)
    assert(spark.sql("SELECT COUNT(*) FROM geowap.db.t").head.getLong(0) == 35)
    assert(GeoManifest.read(spark, root).version == head)
    GeoSql.exec(spark, "ALTER TABLE geowap.db.t DROP BRANCH stage")
    assert(GeoManifest.refs(spark, root).isEmpty)

    // divergence: main commits after the fork -> publish refused
    GeoTable.createBranch(spark, root, "late")
    GeoTable.appendToBranch(spark, root, "late",
      spark.range(200, 205).select($"id", lit("late").as("v")))
    spark.sql("INSERT INTO geowap.db.t SELECT id, 'raced' FROM range(300, 303)")
    val e = intercept[IllegalArgumentException] {
      GeoTable.publishBranch(spark, root, "late")
    }
    assert(e.getMessage.contains("main moved"), e.getMessage)
    // the raced main commit slid PAST the branch's staged manifest number
    // (shared linear sequence) — both lineages stay readable
    assert(spark.sql("SELECT COUNT(*) FROM geowap.db.t").head.getLong(0) == 38)
    assert(spark.sql("SELECT COUNT(*) FROM geowap.db.t VERSION AS OF 'late'")
      .head.getLong(0) == 40)

    // vacuum keeps the staged branch head alive (ref pinning)
    GeoTable.vacuum(spark, root, keepVersions = 1)
    assert(spark.sql("SELECT COUNT(*) FROM geowap.db.t VERSION AS OF 'late'")
      .head.getLong(0) == 40, "branch head must survive vacuum")
  }

  test("table properties: set/unset, carry across commits, restore reverts") {
    val root = tmpRoot("props")
    pointTable(root)
    assert(GeoTable.properties(spark, root).isEmpty, "fresh table has no props")
    // values keep exact bytes: '=' and embedded tabs round-trip, "" is legal
    GeoTable.setProperties(spark, root,
      Map("owner" -> "data-eng", "note" -> "a=b\tc", "empty" -> ""))
    val v1 = GeoManifest.read(spark, root).version
    assert(GeoTable.properties(spark, root) ==
      Map("owner" -> "data-eng", "note" -> "a=b\tc", "empty" -> ""))
    // props ride EVERY subsequent commit untouched (append, DML, optimize)
    GeoTable.append(spark, root, spark.range(100, 110).toDF("id")
      .withColumn("flag", lit(0))
      .withColumn("geo", st_point(col("id").cast("double"), lit(0.0))))
    GeoTable.delete(spark, root, col("id") === 105)
    GeoTable.compact(spark, root, targetFiles = 2)
    assert(GeoTable.properties(spark, root)("owner") == "data-eng",
      "props must carry through data commits")
    // unset + overwrite-in-one-call semantics
    GeoTable.setProperties(spark, root, Map("owner" -> "ml-infra"), unset = Seq("empty"))
    val after = GeoTable.properties(spark, root)
    assert(after == Map("owner" -> "ml-infra", "note" -> "a=b\tc"))
    // snapshots keep their own props: restore to v1 reverts them
    GeoTable.restore(spark, root, v1)
    assert(GeoTable.properties(spark, root)("owner") == "data-eng",
      "RESTORE must revert table properties with the rest of the state")
    // validation: newlines, tab keys, reserved config keys all refuse
    intercept[IllegalArgumentException](
      GeoTable.setProperties(spark, root, Map("bad" -> "line1\nline2")))
    intercept[IllegalArgumentException](
      GeoTable.setProperties(spark, root, Map("a\tb" -> "x")))
    intercept[IllegalArgumentException](
      GeoTable.setProperties(spark, root, Map("bloom.columns" -> "id")))
    intercept[IllegalArgumentException](
      GeoTable.setProperties(spark, root, Map("geometry.column" -> "geo")))
  }

  test("table properties: path-SQL SET/UNSET/SHOW TBLPROPERTIES verbs") {
    val root = tmpRoot("props_sql")
    pointTable(root)
    GeoTable.register(spark, "props_t", root)
    GeoSql.exec(spark,
      "ALTER TABLE props_t SET TBLPROPERTIES ('owner'='data-eng', 'tier'='gold')")
    val shown = GeoSql.exec(spark, "SHOW TBLPROPERTIES props_t")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(shown == Map("owner" -> "data-eng", "tier" -> "gold"))
    GeoSql.exec(spark, "ALTER TABLE props_t UNSET TBLPROPERTIES ('tier')")
    assert(GeoTable.properties(spark, root) == Map("owner" -> "data-eng"))
    // a reserved key through SQL refuses just like the API
    intercept[Exception](GeoSql.exec(spark,
      "ALTER TABLE props_t SET TBLPROPERTIES ('sort.order'='id')"))
  }

  test("SHOW CREATE TABLE: emitted DDL is complete and round-trips through CREATE") {
    val root = tmpRoot("showcreate")
    GeoSql.exec(spark,
      s"""CREATE TABLE sct_t (
         |  id BIGINT NOT NULL, ts TIMESTAMP, name STRING, g GEOMETRY('EPSG:3857')
         |) USING geo
         |PARTITIONED BY (bucket(4,id))
         |TBLPROPERTIES ('team'='data-eng', 'graft.constraints.id_pos'='id >= 0')
         |LOCATION '$root'""".stripMargin)
    val m1 = GeoManifest.read(spark, root)
    assert(m1.props == Map("team" -> "data-eng"), s"user props: ${m1.props}")
    assert(m1.checks == Seq("id_pos" -> "id >= 0"))
    assert(m1.partitions.exists(p => p.kind == "bucket" && p.col == "id"))
    assert(m1.geomCol.contains("g"))
    // constraints enforce from the first insert
    GeoSql.exec(spark,
      "INSERT INTO sct_t SELECT 1L, TIMESTAMP'2024-01-01', 'a', st_point(1.0D, 2.0D)")
    intercept[Exception](GeoSql.exec(spark,
      "INSERT INTO sct_t SELECT -1L, TIMESTAMP'2024-01-01', 'b', st_point(1.0D, 2.0D)"))
    val stmt = GeoSql.exec(spark, "SHOW CREATE TABLE sct_t").head.getString(0)
    assert(stmt.contains("GEOMETRY('EPSG:3857')") && stmt.contains("NOT NULL") &&
      stmt.contains("bucket(4,id)") && stmt.contains("'team' = 'data-eng'") &&
      stmt.contains("'graft.constraints.id_pos' = 'id >= 0'") &&
      stmt.contains(s"LOCATION '$root'"), s"incomplete DDL:\n$stmt")
    // round-trip: replay the emitted text verbatim under a new name+location
    GeoSql.exec(spark, stmt.replace("sct_t", "sct_t2").replace(root, root + "2"))
    val m2 = GeoManifest.read(spark, root + "2")
    assert(m2.schema == m1.schema, s"schema drifted:\n${m2.schema}\nvs\n${m1.schema}")
    assert(m2.partitions == m1.partitions,
      s"partitions drifted: ${m2.partitions} vs ${m1.partitions}")
    assert(m2.props == m1.props && m2.checks == m1.checks && m2.geomCol == m1.geomCol)
  }

  test("TBLPROPERTIES: quoted quotes round-trip, malformed pairs refuse, bloom routes") {
    val root = tmpRoot("props_edge")
    pointTable(root)
    GeoTable.register(spark, "prope_t", root)
    // a value containing a quote (the CHECK-constraint shape) survives
    // SET -> SHOW CREATE -> replay byte-for-byte: the emitter escapes it
    // as '' and every parser unescapes it
    GeoSql.exec(spark, "ALTER TABLE prope_t SET TBLPROPERTIES " +
      "('note'='it''s quoted', " +
      "'graft.constraints.id_ne'='cast(id AS string) != ''nope''')")
    assert(GeoTable.properties(spark, root) ==
      Map("note" -> "it's quoted",
        "graft.constraints.id_ne" -> "cast(id AS string) != 'nope'"))
    val stmt = GeoSql.exec(spark, "SHOW CREATE TABLE prope_t").head.getString(0)
    assert(stmt.contains("'note' = 'it''s quoted'"), s"emitter must escape:\n$stmt")
    GeoSql.exec(spark, stmt.replace("prope_t", "prope_t2").replace(root, root + "2"))
    assert(GeoManifest.read(spark, root + "2").props ==
      GeoTable.properties(spark, root) -- Seq("graft.constraints.id_ne"),
      "replayed props must carry the quote intact")
    assert(GeoManifest.read(spark, root + "2").checks
      .contains("id_ne" -> "cast(id AS string) != 'nope'"),
      "constraint must rebuild verbatim")
    // UNSET spells the escaped key the same way
    GeoSql.exec(spark, "ALTER TABLE prope_t UNSET TBLPROPERTIES ('note')")
    assert(!GeoTable.properties(spark, root).contains("note"))
    // a malformed pair RAISES instead of silently vanishing
    val bad = intercept[Exception](GeoSql.exec(spark,
      "ALTER TABLE prope_t SET TBLPROPERTIES ('ok'='fine', 'broken'=un$parse@ble)"))
    assert(bad.getMessage.contains("unparseable TBLPROPERTIES"), bad.getMessage)
    assert(!GeoTable.properties(spark, root).contains("ok"),
      "a refused statement must apply nothing")
    // bloom.* on a PATH table routes to setBloomColumns (catalog parity),
    // instead of dead-ending at the reserved-key error
    GeoSql.exec(spark, "ALTER TABLE prope_t SET TBLPROPERTIES ('bloom.columns'='id')")
    assert(GeoManifest.read(spark, root).bloomCols.map(_.col) == Seq("id"))
    GeoSql.exec(spark, "ALTER TABLE prope_t UNSET TBLPROPERTIES ('bloom.columns')")
    assert(GeoManifest.read(spark, root).bloomCols.isEmpty)
  }

  test("CREATE TABLE with DEFAULT columns: write-side fill + SHOW CREATE round-trip") {
    val root = tmpRoot("create_dflt")
    // the front-end CREATE folds per-clause DEFAULTs exactly as
    // ADD COLUMN ... DEFAULT does (fromDdl cannot spell them) — the
    // spelling SHOW CREATE emits, so DEFAULT-bearing DDL round-trips
    GeoSql.exec(spark, "CREATE TABLE cdflt_t (id BIGINT NOT NULL, " +
      s"tier BIGINT DEFAULT 40 + 2, tag STRING DEFAULT 'web') USING geo LOCATION '$root'")
    val f = GeoManifest.read(spark, root).schema("tier")
    assert(f.metadata.getString("CURRENT_DEFAULT") == "40 + 2" &&
      f.metadata.getString("EXISTS_DEFAULT") == "42L", f.metadata.toString)
    GeoSql.exec(spark, "INSERT INTO cdflt_t (id) SELECT 1L")
    assert(spark.table("cdflt_t").collect().toSeq.map(_.toString) == Seq("[1,42,web]"))
    // a non-constant or unresolvable DEFAULT fails AT CREATE, not later
    val bad = intercept[Exception](GeoSql.exec(spark,
      s"CREATE TABLE cdflt_bad (id BIGINT, x BIGINT DEFAULT id + 1) USING geo " +
        s"LOCATION '${root}_bad'"))
    assert(bad != null)
    val stmt = GeoSql.exec(spark, "SHOW CREATE TABLE cdflt_t").head.getString(0)
    assert(stmt.contains("DEFAULT 40 + 2") && stmt.contains("DEFAULT 'web'"), stmt)
    GeoSql.exec(spark, stmt.replace("cdflt_t", "cdflt_t2").replace(root, root + "2"))
    val f2 = GeoManifest.read(spark, root + "2").schema("tier")
    assert(f2.metadata.getString("CURRENT_DEFAULT") == "40 + 2" &&
      f2.metadata.getString("EXISTS_DEFAULT") == "42L",
      "the replayed table must fold the same defaults")
    GeoSql.exec(spark, "INSERT INTO cdflt_t2 (id) SELECT 9L")
    assert(spark.table("cdflt_t2").collect().toSeq.map(_.toString) == Seq("[9,42,web]"))
  }

  test("DROP TABLE removes a geo table and its files; other DROPs delegate") {
    val root = tmpRoot("droptest")
    pointTable(root)
    GeoTable.register(spark, "drop_t", root)
    GeoSql.exec(spark, "DROP TABLE drop_t")
    assert(GeoTable.registeredRoot("drop_t").isEmpty, "unregistered")
    assert(!new java.io.File(root).exists, "files deleted")
    // non-geo DROP goes to Spark (unknown table -> Spark's own error)
    val err = intercept[Exception](GeoSql.exec(spark, "DROP TABLE graft_no_such_table"))
    assert(!err.getMessage.contains("graft.tables"), s"must delegate: ${err.getMessage}")
  }
}
