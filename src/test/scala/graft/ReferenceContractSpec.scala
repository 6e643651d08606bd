package graft

import graft.geom.Geom

import org.locationtech.jts.geom.GeometryFactory

/**
 * The reference's own test scenarios, replayed 1:1 against graft
 * (reference: extension/src/test/scala/org/apache/iceberg/
 * TestSedonaIcebergExtension.scala:52,108,145 and
 * example/src/main/scala/org/apache/iceberg/sedona/app/App.scala:54-78) —
 * parquet-backed tables instead of Iceberg, same queries, same expected
 * rows.
 */
class ReferenceContractSpec extends SparkSpec {
  import spark.implicits._

  test("testBasic analog: construct, range query, intersects, union_aggr, derived insert") {
    spark.sql("DROP TABLE IF EXISTS test_geom")
    spark.sql("CREATE TABLE test_geom (id INT, data STRING, geo BINARY) USING parquet")
    spark.sql("INSERT INTO test_geom VALUES (1, 'data_1', st_geomfromtext('POINT (10 20)'))")
    spark.sql("INSERT INTO test_geom SELECT 2, 'data_2', st_point(20.0, 30.0)")
    try {
      val allRows = spark.sql("SELECT st_astext(geo) FROM test_geom ORDER BY id").collect()
      assert(allRows.length == 2)
      assert(allRows(0).getString(0) == "POINT (10 20)")
      assert(allRows(1).getString(0) == "POINT (20 30)")

      // range query selecting all columns
      val partial = spark.sql(
        "SELECT * FROM test_geom WHERE st_contains(st_polygonfromenvelope(15.0, 20.0, 30.0, 40.0), geo)")
        .collect()
      assert(partial.length == 1)
      assert(partial(0).getInt(0) == 2 && partial(0).getString(1) == "data_2")

      // intersects with projection
      val inter = spark.sql(
        "SELECT st_astext(geo) FROM test_geom WHERE st_intersects(geo, st_polygonfromenvelope(15.0, 20.0, 30.0, 40.0))")
        .collect()
      assert(inter.length == 1 && inter(0).getString(0) == "POINT (20 30)")

      // UDAF — exact string the reference asserts
      val union = spark.sql("SELECT st_astext(st_union_aggr(geo)) FROM test_geom").collect()
      assert(union.length == 1 && union(0).getString(0) == "MULTIPOINT ((10 20), (20 30))")

      // runtime insert with nondeterministic coords
      spark.sql("INSERT INTO test_geom SELECT 3, 'data_3', st_point(RAND(), RAND())")
      assert(spark.sql("SELECT * FROM test_geom").count() == 3)

      // derived insert via ST_X/ST_Y swap
      val derived = spark.sql(
        """SELECT id + 100, CONCAT('new_  ', data), st_point(y, x)
           FROM (SELECT id, data, st_x(geo) AS x, st_y(geo) AS y FROM test_geom)""").collect()
      assert(derived.length == 3)
      spark.sql(
        """INSERT INTO test_geom
           SELECT id + 100, CONCAT('new_  ', data), st_point(y, x)
           FROM (SELECT id, data, st_x(geo) AS x, st_y(geo) AS y FROM test_geom)""")
      assert(spark.sql("SELECT * FROM test_geom").count() == 6)
    } finally spark.sql("DROP TABLE test_geom")
  }

  test("spatial SQL DML leg: CREATE GEOMETRY table, INSERT, UPDATE/DELETE with ST_ predicates") {
    // reference: TestSedonaIcebergExtension.scala:56 (geo GEOMETRY DDL),
    // :85-91 (UPDATE ... WHERE ST_Intersects as SQL, row counts preserved)
    val root = java.nio.file.Files.createTempDirectory("geo_dml_ref").toString + "/t"
    spark.sql(s"CREATE TABLE ref_geom (id INT, data STRING, geo GEOMETRY) USING GEO LOCATION '$root'")
    try {
      spark.sql("INSERT INTO ref_geom VALUES (1, 'data_1', st_geomfromtext('POINT (10 20)'))")
      spark.sql("INSERT INTO ref_geom SELECT 2, 'data_2', st_point(20.0D, 30.0D)")

      val allRows = spark.sql("SELECT st_astext(geo) FROM ref_geom ORDER BY id").collect()
      assert(allRows.map(_.getString(0)).toSeq == Seq("POINT (10 20)", "POINT (20 30)"))

      // range query before DML
      val partial = spark.sql(
        "SELECT * FROM ref_geom WHERE st_contains(st_polygonfromenvelope(15.0D, 20.0D, 30.0D, 40.0D), geo)")
        .collect()
      assert(partial.length == 1 && partial(0).getInt(0) == 2)

      // the reference's core DML scenario: UPDATE ... WHERE ST_Intersects
      val updated = spark.sql(
        "UPDATE ref_geom SET data = 'updated' WHERE st_intersects(geo, st_polygonfromenvelope(15.0D, 20.0D, 30.0D, 40.0D))")
      assert(updated.collect().head.getLong(0) == 1L)
      assert(spark.sql("SELECT * FROM ref_geom WHERE data = 'updated'").count() == 1)
      assert(spark.table("ref_geom").count() == 2) // row count preserved (COW, not append)
      // the non-matching row is untouched
      assert(spark.sql("SELECT data FROM ref_geom WHERE id = 1").head.getString(0) == "data_1")

      // GEOMETRY tag survives the COW rewrite
      val geoField = graft.tables.GeoTable.read(spark, root).schema("geo")
      assert(graft.tables.GeoSchema.isGeometry(geoField))

      // DELETE with a spatial predicate
      spark.sql("DELETE FROM ref_geom WHERE st_within(geo, st_polygonfromenvelope(5.0D, 15.0D, 15.0D, 25.0D))")
      val left = spark.sql("SELECT id FROM ref_geom").collect()
      assert(left.length == 1 && left(0).getInt(0) == 2)
    } finally graft.tables.GeoTable.drop(spark, "ref_geom")
  }

  test("table DML leg 2: MERGE INTO, geo CTAS, DROP TABLE as SQL") {
    // Iceberg's flagship DML verb on the reference's table kind, plus the
    // CTAS shape of example/.../App.scala:77 against USING GEO storage
    val root = java.nio.file.Files.createTempDirectory("geo_merge_ref").toString + "/t"
    spark.sql(s"CREATE TABLE ref_mrg (id INT, data STRING, geo GEOMETRY) USING GEO LOCATION '$root'")
    try {
      spark.sql("INSERT INTO ref_mrg VALUES (1, 'data_1', st_geomfromtext('POINT (10 20)'))")
      spark.sql("INSERT INTO ref_mrg SELECT 2, 'data_2', st_point(20.0D, 30.0D)")

      val n = spark.sql(
        """MERGE INTO ref_mrg t USING (
             SELECT 2 AS mid, 'm2' AS mdata UNION ALL SELECT 3, 'm3'
           ) s ON t.id = s.mid
           WHEN MATCHED THEN UPDATE SET data = s.mdata
           WHEN NOT MATCHED THEN INSERT (id, data, geo) VALUES (s.mid, s.mdata, st_point(0.0D, 0.0D))""")
        .collect().head.getLong(0)
      assert(n == 2, s"one update + one insert, got $n")
      val rows = spark.sql("SELECT id, data FROM ref_mrg ORDER BY id")
        .collect().map(r => r.getInt(0) -> r.getString(1)).toSeq
      assert(rows == Seq(1 -> "data_1", 2 -> "m2", 3 -> "m3"))

      // CTAS into geo storage keeps the GEOMETRY tag (App.scala:77 shape)
      val ctasRoot = java.nio.file.Files.createTempDirectory("geo_ctas_ref").toString + "/t"
      spark.sql(s"CREATE TABLE ref_ctas USING GEO LOCATION '$ctasRoot' AS " +
        "SELECT id, geo FROM ref_mrg WHERE id >= 2")
      assert(spark.table("ref_ctas").count() == 2)
      assert(graft.tables.GeoSchema.isGeometry(
        graft.tables.GeoTable.read(spark, ctasRoot).schema("geo")))

      spark.sql("DROP TABLE ref_ctas")
      assert(graft.tables.GeoTable.registeredRoot("ref_ctas").isEmpty)
    } finally graft.tables.GeoTable.drop(spark, "ref_mrg")
  }

  test("catalog DML leg: the reference scenario on a catalog table, native row-level path") {
    // the reference's DML actually runs against CATALOG tables
    // (`UPDATE demo.db.test_geom ...`, TestSedonaIcebergExtension
    // .scala:83-91, catalog configured at :44-53) — replay the same
    // statements on `geo.db.test_geom` so they resolve through Spark's
    // analyzer + SupportsRowLevelOperations, no SQL front-end anywhere
    val wh = java.nio.file.Files.createTempDirectory("geo_ref_cat").toString
    spark.conf.set("spark.sql.catalog.geo", classOf[graft.tables.GeoCatalog].getName)
    spark.conf.set("spark.sql.catalog.geo.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS geo.db")
    spark.sql("CREATE TABLE geo.db.test_geom (id INT, data STRING, geo BINARY) USING geo " +
      "TBLPROPERTIES('geometry.column'='geo')")
    try {
      spark.sql("INSERT INTO geo.db.test_geom VALUES (1, 'data_1', st_geomfromtext('POINT (10 20)'))")
      spark.sql("INSERT INTO geo.db.test_geom SELECT 2, 'data_2', st_point(20.0D, 30.0D)")

      // native UPDATE ... WHERE ST_Intersects (the :85-88 statement)
      spark.sql("UPDATE geo.db.test_geom SET data = 'updated' " +
        "WHERE st_intersects(geo, st_polygonfromenvelope(15.0D, 20.0D, 30.0D, 40.0D))")
      assert(spark.sql("SELECT data FROM geo.db.test_geom WHERE id = 2").head.getString(0) == "updated")
      assert(spark.table("geo.db.test_geom").count() == 2) // CoW, not append
      assert(spark.sql("SELECT data FROM geo.db.test_geom WHERE id = 1").head.getString(0) == "data_1")

      // native DELETE with a spatial predicate (the :89-91 statement)
      spark.sql("DELETE FROM geo.db.test_geom " +
        "WHERE st_within(geo, st_polygonfromenvelope(5.0D, 15.0D, 15.0D, 25.0D))")
      val left = spark.sql("SELECT id FROM geo.db.test_geom").collect()
      assert(left.length == 1 && left(0).getInt(0) == 2)

      // native MERGE on the same catalog table
      spark.sql(
        """MERGE INTO geo.db.test_geom t USING (
             SELECT 2 AS mid, 'm2' AS mdata UNION ALL SELECT 3, 'm3'
           ) s ON t.id = s.mid
           WHEN MATCHED THEN UPDATE SET data = s.mdata
           WHEN NOT MATCHED THEN INSERT (id, data, geo) VALUES (s.mid, s.mdata, st_point(0.0D, 0.0D))""")
      val rows = spark.sql("SELECT id, data FROM geo.db.test_geom ORDER BY id")
        .collect().map(r => r.getInt(0) -> r.getString(1)).toSeq
      assert(rows == Seq(2 -> "m2", 3 -> "m3"))

      // GEOMETRY tag survives every CoW rewrite
      assert(graft.tables.GeoSchema.isGeometry(
        spark.table("geo.db.test_geom").schema("geo")))
    } finally spark.sql("DROP TABLE IF EXISTS geo.db.test_geom")
  }

  test("testSpatialJoin analog: join on ST_Contains, with and without caching, plus CTAS") {
    spark.sql("DROP TABLE IF EXISTS test_left"); spark.sql("DROP TABLE IF EXISTS test_right")
    spark.sql("DROP TABLE IF EXISTS test_ctas")
    spark.sql("CREATE TABLE test_left (id INT, data STRING, geo BINARY) USING parquet")
    spark.sql("INSERT INTO test_left VALUES " +
      "(1, 'data_1', st_geomfromtext('POINT (10 10)'))," +
      "(2, 'data_2', st_geomfromtext('POINT (20 20)'))")
    spark.sql("CREATE TABLE test_right (id INT, geo BINARY) USING parquet")
    spark.sql("INSERT INTO test_right SELECT 10, st_polygonfromenvelope(0.0, 0.0, 15.0, 15.0)")
    spark.sql("INSERT INTO test_right SELECT 20, st_polygonfromenvelope(15.0, 15.0, 25.0, 25.0)")
    spark.conf.set("spark.graft.join.cellSize", "10.0")
    try {
      def joinQ = spark.sql(
        """SELECT l.id id_l, r.id id_r FROM test_left l JOIN test_right r
           ON st_contains(r.geo, l.geo) ORDER BY id_l""")
      def check(df: org.apache.spark.sql.DataFrame): Unit = {
        val plan = df.queryExecution.executedPlan.toString
        assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
          s"expected rewritten spatial join:\n$plan")
        val rows = df.as[(Int, Int)].collect().toSeq
        assert(rows == Seq((1, 10), (2, 20)))
      }
      check(joinQ)

      // caching both sides must keep the rewrite working
      spark.sql("CACHE TABLE test_left"); spark.sql("CACHE TABLE test_right")
      check(joinQ)

      // join + extra literal range predicate on one side (App.scala:63)
      val combined = spark.sql(
        """SELECT l.id id_l, r.id id_r FROM test_left l, test_right r
           WHERE st_contains(r.geo, l.geo)
             AND st_contains(st_polygonfromenvelope(15.0, 15.0, 30.0, 30.0), l.geo)""")
        .as[(Int, Int)].collect().toSeq
      assert(combined == Seq((2, 20)))

      // CTAS from the spatial join (App.scala:77)
      spark.sql(
        """CREATE TABLE test_ctas USING parquet AS
           SELECT l.id id, r.geo geo FROM test_left l, test_right r WHERE st_contains(r.geo, l.geo)""")
      assert(spark.table("test_ctas").count() == 2)
    } finally {
      spark.sql("UNCACHE TABLE IF EXISTS test_left"); spark.sql("UNCACHE TABLE IF EXISTS test_right")
      spark.sql("DROP TABLE test_left"); spark.sql("DROP TABLE test_right")
      spark.sql("DROP TABLE IF EXISTS test_ctas")
    }
  }

  test("testStCentroidAggr analog: aggregate centroid equals JTS collection centroid (mixed geometries)") {
    val wkts = Seq(
      "POINT (1 2)", "POINT (5 -1)",
      "LINESTRING (0 0, 4 0, 4 4)",
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))",
      "POLYGON ((20 20, 30 20, 30 25, 20 25, 20 20))",
      "MULTIPOINT ((7 7), (8 8))")
    val geoms = wkts.map(Geom.fromWkt)
    val expected = new GeometryFactory().createGeometryCollection(geoms.toArray).getCentroid

    wkts.toDF("geom").createOrReplaceTempView("centroid_df")
    val row = spark.sql(
      "SELECT st_x(st_centroid_aggr(st_geomfromtext(geom))), st_y(st_centroid_aggr(st_geomfromtext(geom))) FROM centroid_df")
      .head
    assert(math.abs(row.getDouble(0) - expected.getX) < 1e-9, s"x: ${row.getDouble(0)} vs ${expected.getX}")
    assert(math.abs(row.getDouble(1) - expected.getY) < 1e-9, s"y: ${row.getDouble(1)} vs ${expected.getY}")
  }
}
