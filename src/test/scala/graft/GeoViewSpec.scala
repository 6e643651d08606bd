package graft

import graft.tables.{GeoCatalog, GeoViews}

import org.apache.spark.sql.connector.catalog.{Identifier, ViewChange, ViewInfo}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/**
 * Persisted views (ViewCatalog + GeoViewResolution): SQL lifecycle on an
 * extension session, the V2 ViewCatalog API surface, nested/CTE/bare-name
 * resolution, and the vanilla-session read path.
 */
class GeoViewSpec extends SparkSpec {

  private lazy val wh: String = {
    val dir = java.nio.file.Files.createTempDirectory("geo_view_wh").toString
    spark.conf.set("spark.sql.catalog.geov", classOf[GeoCatalog].getName)
    spark.conf.set("spark.sql.catalog.geov.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS geov.db")
    spark.sql("CREATE TABLE geov.db.pts (id BIGINT, geo GEOMETRY) USING geo")
    spark.sql("""INSERT INTO geov.db.pts
                 SELECT id, st_point(CAST(id AS DOUBLE), CAST(id % 3 AS DOUBLE))
                 FROM range(10)""")
    dir
  }

  test("SQL lifecycle: CREATE / SELECT / SHOW / OR REPLACE / DROP") {
    wh
    spark.sql("CREATE VIEW geov.db.v1 AS SELECT id, st_x(geo) AS x FROM geov.db.pts WHERE id > 2")
    assert(spark.sql("SELECT SUM(id) FROM geov.db.v1").head.getLong(0) == (3 to 9).sum)
    // the view composes: filter pushes THROUGH the expanded body
    assert(spark.sql("SELECT COUNT(*) FROM geov.db.v1 WHERE x < 5.0").head.getLong(0) == 2)
    val shown = spark.sql("SHOW VIEWS IN geov.db").collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2)))
    assert(shown.contains(("db", "v1", false)))
    // CREATE without OR REPLACE over an existing view fails; OR REPLACE works
    intercept[Exception](spark.sql("CREATE VIEW geov.db.v1 AS SELECT 1 AS one"))
    spark.sql("CREATE VIEW IF NOT EXISTS geov.db.v1 AS SELECT 1 AS one") // no-op
    assert(spark.sql("SELECT COUNT(*) FROM geov.db.v1").head.getLong(0) == 7)
    spark.sql("CREATE OR REPLACE VIEW geov.db.v1 AS SELECT id FROM geov.db.pts WHERE id < 2")
    assert(spark.sql("SELECT COUNT(*) FROM geov.db.v1").head.getLong(0) == 2)
    spark.sql("DROP VIEW geov.db.v1")
    intercept[Exception](spark.sql("SELECT * FROM geov.db.v1").collect())
    spark.sql("DROP VIEW IF EXISTS geov.db.v1") // idempotent
  }

  test("bare table names resolve in the view's own namespace; CTE bodies work") {
    wh
    spark.sql("""CREATE OR REPLACE VIEW geov.db.v_bare AS
                 WITH big AS (SELECT id FROM pts WHERE id >= 5)
                 SELECT COUNT(*) AS n FROM big""")
    assert(spark.sql("SELECT n FROM geov.db.v_bare").head.getLong(0) == 5)
    spark.sql("DROP VIEW geov.db.v_bare")
  }

  test("nested views expand recursively; cycles fail cleanly") {
    wh
    spark.sql("CREATE OR REPLACE VIEW geov.db.base AS SELECT id FROM geov.db.pts WHERE id < 6")
    spark.sql("CREATE OR REPLACE VIEW geov.db.outer_v AS SELECT COUNT(*) AS n FROM geov.db.base")
    assert(spark.sql("SELECT n FROM geov.db.outer_v").head.getLong(0) == 6)
    // a view joins + appears in subqueries like any relation
    val joined = spark.sql("""
      SELECT COUNT(*) FROM geov.db.pts p
      WHERE p.id IN (SELECT id FROM geov.db.base)""").head.getLong(0)
    assert(joined == 6)
    // self-reference at CREATE is a clean error (validated before store)
    intercept[Exception](
      spark.sql("CREATE OR REPLACE VIEW geov.db.selfy AS SELECT * FROM geov.db.selfy"))
    // replacing base with a body referencing outer_v closes a 2-view cycle:
    // caught at CREATE time (validation expands with the self-key in seen),
    // so a cyclic definition never lands on disk
    val e = intercept[Exception](spark.sql(
      "CREATE OR REPLACE VIEW geov.db.base AS SELECT n AS id FROM geov.db.outer_v"))
    assert(e.getMessage.contains("cyclic view reference"))
    // and the original definitions still read fine afterwards
    assert(spark.sql("SELECT n FROM geov.db.outer_v").head.getLong(0) == 6)
    spark.sql("DROP VIEW geov.db.outer_v")
    spark.sql("DROP VIEW geov.db.base")
  }

  test("ViewCatalog API: create/load/list/alter/rename/drop + collisions") {
    wh
    val cat = new GeoCatalog()
    cat.initialize("geov", new CaseInsensitiveStringMap(
      java.util.Map.of("warehouse", wh)))
    val ident = Identifier.of(Array("db"), "api_v")
    val schema = spark.sql("SELECT id FROM geov.db.pts").schema
    cat.createView(new ViewInfo(ident, "SELECT id FROM geov.db.pts", "geov",
      Array("db"), schema, Array.empty, Array.empty, Array.empty,
      java.util.Map.of("owner", "graft")))
    assert(cat.viewExists(ident))
    val v = cat.loadView(ident)
    assert(v.query() == "SELECT id FROM geov.db.pts")
    assert(v.currentCatalog() == "geov" && v.currentNamespace().toSeq == Seq("db"))
    assert(v.schema() == schema)
    assert(v.properties().get("owner") == "graft")
    assert(cat.listViews("db").map(_.name).contains("api_v"))
    // the stored definition is readable through SQL too (one truth)
    assert(spark.sql("SELECT COUNT(*) FROM geov.db.api_v").head.getLong(0) == 10)
    // create over existing view / existing table both fail
    intercept[Exception](cat.createView(new ViewInfo(ident, "SELECT 1", "geov",
      Array("db"), schema, Array.empty, Array.empty, Array.empty,
      java.util.Map.of())))
    intercept[Exception](cat.createView(new ViewInfo(
      Identifier.of(Array("db"), "pts"), "SELECT 1", "geov",
      Array("db"), schema, Array.empty, Array.empty, Array.empty,
      java.util.Map.of())))
    // property round-trip through alterView
    cat.alterView(ident, ViewChange.setProperty("comment", "c1"))
    assert(cat.loadView(ident).properties().get("comment") == "c1")
    cat.alterView(ident, ViewChange.removeProperty("comment"))
    assert(!cat.loadView(ident).properties().containsKey("comment"))
    // rename moves the definition
    val ident2 = Identifier.of(Array("db"), "api_v2")
    cat.renameView(ident, ident2)
    assert(!cat.viewExists(ident) && cat.viewExists(ident2))
    assert(cat.dropView(ident2) && !cat.dropView(ident2))
  }

  test("DESCRIBE VIEW: stored analyzed columns + view-information block") {
    wh
    spark.sql("CREATE OR REPLACE VIEW geov.db.dv AS " +
      "SELECT id, st_x(geo) AS x FROM geov.db.pts WHERE id > 2")
    spark.sql("ALTER VIEW geov.db.dv SET TBLPROPERTIES ('owner'='graft')")
    val rows = spark.sql("DESCRIBE VIEW geov.db.dv").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(rows.take(2).toSeq == Seq(("id", "bigint"), ("x", "double")), s"got ${rows.toSeq}")
    val info = rows.toMap
    assert(info("View Text").contains("FROM geov.db.pts"))
    assert(info("View Catalog") == "geov" && info("View Namespace") == "db")
    assert(info("View Properties").contains("owner=graft"))
    // the V2 View interface surfaces the same column names
    val cat = new GeoCatalog()
    cat.initialize("geov", new CaseInsensitiveStringMap(
      java.util.Map.of("warehouse", wh)))
    assert(cat.loadView(Identifier.of(Array("db"), "dv"))
      .queryColumnNames().toSeq == Seq("id", "x"))
    spark.sql("DROP VIEW geov.db.dv")
  }

  test("ALTER VIEW RENAME TO: moves the definition; collisions refuse") {
    wh
    spark.sql("CREATE OR REPLACE VIEW geov.db.rv AS SELECT id FROM geov.db.pts")
    spark.sql("ALTER VIEW geov.db.rv RENAME TO rv2") // bare: same namespace
    intercept[Exception](spark.sql("SELECT * FROM geov.db.rv").collect())
    assert(spark.sql("SELECT COUNT(*) FROM geov.db.rv2").head.getLong(0) == 10)
    spark.sql("ALTER VIEW geov.db.rv2 RENAME TO geov.db.rv3") // qualified form
    assert(spark.sql("SELECT COUNT(*) FROM geov.db.rv3").head.getLong(0) == 10)
    // renaming onto an existing view or table refuses with a named error
    spark.sql("CREATE OR REPLACE VIEW geov.db.rv_other AS SELECT 1 AS one")
    val e1 = intercept[Exception](
      spark.sql("ALTER VIEW geov.db.rv3 RENAME TO rv_other"))
    assert(e1.getMessage.contains("VIEW"), e1.getMessage)
    val e2 = intercept[Exception](
      spark.sql("ALTER VIEW geov.db.rv3 RENAME TO pts"))
    assert(e2.getMessage.contains("TABLE"), e2.getMessage)
    // cross-catalog moves are refused, not silently mis-stored
    val e3 = intercept[Exception](
      spark.sql("ALTER VIEW geov.db.rv3 RENAME TO other_cat.db.rv4"))
    assert(e3.getMessage.contains("across catalogs"), e3.getMessage)
    spark.sql("DROP VIEW geov.db.rv3"); spark.sql("DROP VIEW geov.db.rv_other")
  }

  test("a table can never shadow a view (both creation paths)") {
    wh
    spark.sql("CREATE OR REPLACE VIEW geov.db.shadow AS SELECT 1 AS one")
    // native catalog path
    val e1 = intercept[Exception](
      spark.sql("CREATE TABLE geov.db.shadow (id BIGINT) USING geo"))
    assert(e1.getMessage.toLowerCase.contains("view"), e1.getMessage)
    // regex front-end path (non-native GEOMETRY spelling forces it)
    val e2 = intercept[Exception](graft.tables.GeoSql.exec(spark,
      "CREATE TABLE geov.db.shadow (id BIGINT, geo GEOMETRY) USING GEO"))
    assert(e2.getMessage.contains("VIEW"), e2.getMessage)
    // renameTable onto a view name is rejected too
    spark.sql("CREATE TABLE IF NOT EXISTS geov.db.realtbl (id BIGINT) USING geo")
    val cat = new GeoCatalog()
    cat.initialize("geov", new CaseInsensitiveStringMap(java.util.Map.of("warehouse", wh)))
    intercept[Exception](cat.renameTable(
      Identifier.of(Array("db"), "realtbl"), Identifier.of(Array("db"), "shadow")))
    spark.sql("DROP TABLE geov.db.realtbl")
    spark.sql("DROP VIEW geov.db.shadow")
  }

  test("ALTER VIEW SET/UNSET TBLPROPERTIES round-trips through the file") {
    wh
    spark.sql("CREATE OR REPLACE VIEW geov.db.v_props AS SELECT 1 AS one")
    // mixed quoting: single, double, bare — all valid Spark spellings
    spark.sql("""ALTER VIEW geov.db.v_props SET TBLPROPERTIES("owner"="team-x", tier='gold')""")
    val cat = new GeoCatalog()
    cat.initialize("geov", new CaseInsensitiveStringMap(java.util.Map.of("warehouse", wh)))
    val ident = Identifier.of(Array("db"), "v_props")
    assert(cat.loadView(ident).properties().get("owner") == "team-x")
    assert(cat.loadView(ident).properties().get("tier") == "gold")
    spark.sql("ALTER VIEW geov.db.v_props UNSET TBLPROPERTIES('tier')")
    assert(!cat.loadView(ident).properties().containsKey("tier"))
    assert(cat.loadView(ident).properties().get("owner") == "team-x")
    // properties never perturb the definition
    assert(spark.sql("SELECT one FROM geov.db.v_props").head.getInt(0) == 1)
    spark.sql("DROP VIEW geov.db.v_props")
  }

  test("SHOW CREATE VIEW reconstructs a re-runnable statement") {
    wh
    spark.sql("CREATE OR REPLACE VIEW geov.db.v_sc AS SELECT id FROM geov.db.pts WHERE id < 4")
    spark.sql("ALTER VIEW geov.db.v_sc SET TBLPROPERTIES('owner'='me')")
    val stmt = spark.sql("SHOW CREATE VIEW geov.db.v_sc").head.getString(0)
    assert(stmt.contains("CREATE VIEW geov.db.v_sc") && stmt.contains("'owner' = 'me'")
      && stmt.contains("id < 4"), stmt)
    // the emitted statement is itself valid SQL: drop + replay = same view
    spark.sql("DROP VIEW geov.db.v_sc")
    spark.sql(stmt.replace("CREATE VIEW", "CREATE OR REPLACE VIEW")
      .replaceAll("(?s)TBLPROPERTIES \\(.*?\\)", "")) // props re-applied separately
    assert(spark.sql("SELECT COUNT(*) FROM geov.db.v_sc").head.getLong(0) == 4)
    spark.sql("DROP VIEW geov.db.v_sc")
  }

  test("DROP NAMESPACE CASCADE invalidates the view-existence memo") {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS geov.tmpns")
    spark.sql("CREATE OR REPLACE VIEW geov.tmpns.vv AS SELECT 1 AS one")
    assert(spark.sql("SELECT one FROM geov.tmpns.vv").head.getInt(0) == 1) // memo now warm
    spark.sql("DROP NAMESPACE geov.tmpns CASCADE")
    spark.sql("CREATE NAMESPACE geov.tmpns")
    // within the memo TTL: the name must be creatable as a TABLE (no
    // stale ViewAlreadyExists) and resolve to the table, not a ghost view
    spark.sql("CREATE TABLE geov.tmpns.vv (id BIGINT) USING geo")
    spark.sql("INSERT INTO geov.tmpns.vv SELECT id FROM range(3)")
    assert(spark.sql("SELECT COUNT(*) FROM geov.tmpns.vv").head.getLong(0) == 3)
    spark.sql("DROP NAMESPACE geov.tmpns CASCADE")
  }

  test("vanilla-session path: GeoViews.readView needs no injected rule") {
    wh
    spark.sql("CREATE OR REPLACE VIEW geov.db.v_plain AS " +
      "SELECT id, st_y(geo) AS y FROM geov.db.pts WHERE id % 2 = 0")
    // readView goes straight through expand + ofRows — the exact path a
    // session without GraftExtensions uses (the correctness driver's)
    val rows = GeoViews.readView(spark, "geov.db.v_plain")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.toSeq == Seq(0L -> 0.0, 2L -> 2.0, 4L -> 1.0, 6L -> 0.0, 8L -> 2.0))
    spark.sql("DROP VIEW geov.db.v_plain")
  }
}
