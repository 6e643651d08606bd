package graft

import graft.tables.{GeoManifest, GeoSql}

import org.apache.spark.sql.functions._

/**
 * Delta-parity CHECK constraints: stored in the manifest, validated
 * against existing rows at ADD, enforced row-by-row in the shared writer
 * — so the catalog INSERT (DSv2), the path-table verb, and CoW DML
 * rewrites all refuse violating rows through ONE code path.
 */
class GeoConstraintSpec extends SparkSpec {

  private lazy val wh: String = {
    val dir = java.nio.file.Files.createTempDirectory("geo_ck_wh").toString
    spark.conf.set("spark.sql.catalog.geock", classOf[graft.tables.GeoCatalog].getName)
    spark.conf.set("spark.sql.catalog.geock.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS geock.db")
    dir
  }
  private def root(t: String) = s"$wh/db/$t"

  test("ADD validates existing rows; writes enforce; DROP lifts; NULL passes") {
    wh
    spark.sql("DROP TABLE IF EXISTS geock.db.c1")
    spark.sql("CREATE TABLE geock.db.c1 (id BIGINT, amt BIGINT) USING geo")
    spark.sql("INSERT INTO geock.db.c1 VALUES (1, 10), (2, 20), (3, NULL)")
    // NULL amt passes standard CHECK semantics (only FALSE violates)
    GeoSql.exec(spark, "ALTER TABLE geock.db.c1 ADD CONSTRAINT amt_pos CHECK (amt > 0)")
    assert(GeoManifest.read(spark, root("c1")).checks == Seq("amt_pos" -> "amt > 0"))

    // catalog INSERT (DSv2 write path): valid passes, violating refuses
    spark.sql("INSERT INTO geock.db.c1 VALUES (4, 40)")
    val e1 = intercept[Exception](
      spark.sql("INSERT INTO geock.db.c1 VALUES (5, -1)"))
    assert(exists(e1, "amt_pos"), s"error must name the constraint: ${e1.getMessage}")
    // the failed write committed nothing
    assert(spark.sql("SELECT COUNT(*) FROM geock.db.c1").head.getLong(0) == 4)

    // CoW DML rewrite path: an UPDATE that would break the constraint fails
    val e2 = intercept[Exception](
      spark.sql("UPDATE geock.db.c1 SET amt = -5 WHERE id = 1"))
    assert(exists(e2, "amt_pos"), e2.getMessage)
    assert(spark.sql("SELECT amt FROM geock.db.c1 WHERE id = 1").head.getLong(0) == 10)
    // a constraint-respecting UPDATE passes (rewrites untouched rows too)
    spark.sql("UPDATE geock.db.c1 SET amt = 99 WHERE id = 1")
    assert(spark.sql("SELECT amt FROM geock.db.c1 WHERE id = 1").head.getLong(0) == 99)

    // DROP lifts enforcement
    GeoSql.exec(spark, "ALTER TABLE geock.db.c1 DROP CONSTRAINT amt_pos")
    spark.sql("INSERT INTO geock.db.c1 VALUES (5, -1)")
    assert(spark.sql("SELECT COUNT(*) FROM geock.db.c1").head.getLong(0) == 5)
    spark.sql("DROP TABLE geock.db.c1")
  }

  test("ADD refuses when existing rows violate; bad SQL fails with Spark's error") {
    wh
    spark.sql("DROP TABLE IF EXISTS geock.db.c2")
    spark.sql("CREATE TABLE geock.db.c2 (id BIGINT, v STRING) USING geo")
    spark.sql("INSERT INTO geock.db.c2 VALUES (1, 'a'), (-2, 'b'), (-3, 'c')")
    val e = intercept[Exception](GeoSql.exec(spark,
      "ALTER TABLE geock.db.c2 ADD CONSTRAINT id_pos CHECK (id > 0)"))
    assert(e.getMessage.contains("2 existing row(s)"), e.getMessage)
    assert(GeoManifest.read(spark, root("c2")).checks.isEmpty, "nothing must commit")
    // unresolvable column: Spark's own analyzer error, nothing commits
    val e2 = intercept[Exception](GeoSql.exec(spark,
      "ALTER TABLE geock.db.c2 ADD CONSTRAINT bad CHECK (nope > 0)"))
    assert(exists(e2, "nope"), e2.getMessage)
    // duplicate name refused
    GeoSql.exec(spark, "ALTER TABLE geock.db.c2 ADD CONSTRAINT v_len CHECK (length(v) < 10)")
    val e3 = intercept[Exception](GeoSql.exec(spark,
      "ALTER TABLE geock.db.c2 ADD CONSTRAINT v_len CHECK (length(v) < 99)"))
    assert(e3.getMessage.contains("already exists"), e3.getMessage)
    spark.sql("DROP TABLE geock.db.c2")
  }

  test("path-table verbs enforce through the same writer; manifest round-trips") {
    wh
    val dir = java.nio.file.Files.createTempDirectory("geo_ck_path").toString + "/t"
    import spark.implicits._
    graft.tables.GeoTable.create(spark,
      dir, Seq((1L, 5L)).toDF("id", "amt"), geomCol = None)
    graft.tables.GeoTable.addCheckConstraint(spark, dir, "amt_cap", "amt <= 100")
    // round-trip through the manifest text format
    assert(GeoManifest.read(spark, dir).checks == Seq("amt_cap" -> "amt <= 100"))
    graft.tables.GeoTable.append(spark, dir, Seq((2L, 100L)).toDF("id", "amt"))
    val e = intercept[Exception](
      graft.tables.GeoTable.append(spark, dir, Seq((3L, 101L)).toDF("id", "amt")))
    assert(exists(e, "amt_cap"), e.getMessage)
    assert(GeoManifest.read(spark, dir).totalRows == 2)
  }

  test("non-executable constraints refuse at ADD, not as a crash on the next write") {
    wh
    spark.sql("DROP TABLE IF EXISTS geock.db.c3")
    spark.sql("CREATE TABLE geock.db.c3 (id BIGINT) USING geo")
    // nondeterministic: enforcement would be meaningless
    val e1 = intercept[Exception](GeoSql.exec(spark,
      "ALTER TABLE geock.db.c3 ADD CONSTRAINT r CHECK (rand() < 2)"))
    assert(exists(e1, "deterministic"), e1.getMessage)
    // subquery: cannot run inside a row projection
    val e2 = intercept[Exception](GeoSql.exec(spark,
      "ALTER TABLE geock.db.c3 ADD CONSTRAINT s CHECK (id IN (SELECT 1))"))
    assert(exists(e2, "row writer") || exists(e2, "subquer"), e2.getMessage)
    assert(GeoManifest.read(spark, root("c3")).checks.isEmpty)
    // bad name (public API path): tabs would corrupt the manifest line
    val e3 = intercept[Exception](
      graft.tables.GeoTable.addCheckConstraint(spark, root("c3"), "a\tb", "id > 0"))
    assert(exists(e3, "bad constraint name"), e3.getMessage)
    spark.sql("DROP TABLE geock.db.c3")
  }

  test("metadata-only file commits validate rows; DDL on referenced columns refuses") {
    wh
    spark.sql("DROP TABLE IF EXISTS geock.db.c4")
    spark.sql("CREATE TABLE geock.db.c4 (id BIGINT, amt BIGINT) USING geo")
    spark.sql("INSERT INTO geock.db.c4 VALUES (1, 10)")
    GeoSql.exec(spark, "ALTER TABLE geock.db.c4 ADD CONSTRAINT amt_pos CHECK (amt > 0)")
    // ADD FILES must scan the by-reference rows (they never saw the writer)
    val ext = java.nio.file.Files.createTempDirectory("ck_add").toString + "/f"
    spark.range(3).selectExpr("id + 10 AS id", "-1L AS amt").coalesce(1).write.parquet(ext)
    val files = spark.read.parquet(ext).inputFiles.toSeq
    val e1 = intercept[Exception](
      graft.tables.GeoTable.addFiles(spark, root("c4"), files))
    assert(exists(e1, "amt_pos"), e1.getMessage)
    assert(spark.sql("SELECT COUNT(*) FROM geock.db.c4").head.getLong(0) == 1)
    // cherry-pick of a snapshot staged BEFORE the constraint existed must
    // validate against MAIN's current constraints
    GeoSql.exec(spark, "ALTER TABLE geock.db.c4 CREATE BRANCH stage")
    spark.sql("INSERT INTO geock.db.c4.branch_stage VALUES (20, 5)")
    val staged = spark.sql(
      "SELECT version FROM geock.db.c4.refs WHERE name = 'stage'")
      .head.getAs[Number](0).longValue
    GeoSql.exec(spark, "ALTER TABLE geock.db.c4 DROP CONSTRAINT amt_pos")
    spark.sql("INSERT INTO geock.db.c4 VALUES (2, 20)") // main advances
    GeoSql.exec(spark, "ALTER TABLE geock.db.c4 ADD CONSTRAINT amt_big CHECK (amt >= 10)")
    val e2 = intercept[Exception](spark.sql(
      s"CALL geock.system.cherrypick_snapshot(table => 'db.c4', snapshot_id => $staged)"))
    assert(exists(e2, "amt_big"), e2.getMessage)
    // DROP/RENAME of a referenced column refuses with the constraint's name
    val e3 = intercept[Exception](GeoSql.exec(spark,
      "ALTER TABLE geock.db.c4 DROP COLUMN amt"))
    assert(exists(e3, "amt_big"), e3.getMessage)
    val e4 = intercept[Exception](GeoSql.exec(spark,
      "ALTER TABLE geock.db.c4 RENAME COLUMN amt TO amount"))
    assert(exists(e4, "amt_big"), e4.getMessage)
    // an UNREFERENCED column still renames fine
    GeoSql.exec(spark, "ALTER TABLE geock.db.c4 RENAME COLUMN id TO rid")
    assert(spark.sql("SELECT COUNT(*) FROM geock.db.c4 WHERE rid = 2").head.getLong(0) == 1)
    spark.sql("DROP TABLE geock.db.c4")
  }

  test("constraint ADDed between plan time and commit is enforced at commit") {
    wh
    spark.sql("DROP TABLE IF EXISTS geock.db.c5")
    spark.sql("CREATE TABLE geock.db.c5 (id BIGINT, amt BIGINT) USING geo")
    spark.sql("INSERT INTO geock.db.c5 VALUES (1, 10)")
    val r = root("c5")
    // a UDF that commits ADD CONSTRAINT out from under the running INSERT
    // (local mode: the task runs in this JVM, after the write's plan-time
    // manifest read and before its commit — exactly the unguarded window)
    def sneakConstraint(name: String): Unit = {
      val flag = new java.util.concurrent.atomic.AtomicBoolean(false)
      spark.udf.register("sneak", (x: Long) => {
        if (flag.compareAndSet(false, true)) {
          val s = org.apache.spark.sql.SparkSession.active
          val m = GeoManifest.read(s, r)
          GeoManifest.commit(s, r, m.copy(version = m.version + 1,
            checks = m.checks :+ (name -> "amt > 0")), m.version, op = "add-constraint")
        }
        x
      })
    }
    // violating row: the writers never saw the constraint, so only the
    // commit-time re-validation can refuse it
    sneakConstraint("amt_pos")
    val e = intercept[Exception](spark.sql(
      "INSERT INTO geock.db.c5 SELECT 2L AS id, sneak(-1L) AS amt"))
    assert(exists(e, "amt_pos"), s"commit must re-validate: ${e.getMessage}")
    assert(spark.sql("SELECT COUNT(*) FROM geock.db.c5").head.getLong(0) == 1)
    assert(GeoManifest.read(spark, r).checks == Seq("amt_pos" -> "amt > 0"))
    // same race with a VALID row: re-validation passes, the insert lands
    GeoSql.exec(spark, "ALTER TABLE geock.db.c5 DROP CONSTRAINT amt_pos")
    sneakConstraint("amt_pos2")
    spark.sql("INSERT INTO geock.db.c5 SELECT 3L AS id, sneak(7L) AS amt")
    assert(spark.sql("SELECT COUNT(*) FROM geock.db.c5").head.getLong(0) == 2)
    assert(GeoManifest.read(spark, r).checks == Seq("amt_pos2" -> "amt > 0"))
    spark.sql("DROP TABLE geock.db.c5")
  }

  /** SparkExceptions wrap task failures several levels deep. */
  private def exists(t: Throwable, needle: String): Boolean = {
    var cur: Throwable = t
    while (cur != null) {
      if (cur.getMessage != null && cur.getMessage.contains(needle)) return true
      cur = cur.getCause
    }
    false
  }
}
