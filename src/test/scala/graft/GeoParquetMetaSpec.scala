package graft

import graft.functions.GraftFunctions._
import graft.sources.GeoParquetMeta
import graft.tables.GeoSchema

import org.apache.spark.sql.functions._

/**
 * Standard GeoParquet `geo` footer metadata (GeoParquetMeta): files written
 * by GeoParquet.write AND by GeoTable carry the spec key with per-file-exact
 * bbox/geometry_types, and a reader with no hints recovers GEOMETRY typing.
 */
class GeoParquetMetaSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def points(n: Int) = {
    import spark.implicits._
    spark.range(n).select(col("id"),
      st_point((col("id") % 10).cast("double"), (col("id") % 7).cast("double")).as("geo"))
  }

  test("GeoParquet.write stamps the geo key; fields parse to the spec shape") {
    val dir = tmp("gpq_meta") + "/pts"
    graft.plans.GeoParquet.write(points(100).repartition(1), "geo", dir, cellSize = 5.0)
    val raw = GeoParquetMeta.readGeoKey(spark, dir)
    assert(raw.isDefined, "geo footer key missing")
    val meta = GeoParquetMeta.parse(raw.get).get
    assert(meta.version == GeoParquetMeta.SpecVersion)
    assert(meta.primary == "geo")
    val c = meta.columns("geo")
    assert(c.encoding == "WKB")
    assert(c.geometryTypes == Seq("Point"))
    assert(c.bbox.contains((0.0, 0.0, 9.0, 6.0)))
    assert(c.crs == GeoSchema.DefaultCrs) // omitted in JSON -> spec default
    assert(!raw.get.contains("\"crs\"")) // default CRS is omitted, not null-spelled
    // spec-1.1 covering names the bbox sidecar columns GeoParquet.write
    // lays down — third-party readers prune on the same doubles we do
    assert(c.covering == Map(
      "xmin" -> Seq("geo_xmin"), "ymin" -> Seq("geo_ymin"),
      "xmax" -> Seq("geo_xmax"), "ymax" -> Seq("geo_ymax")))
  }

  test("covering is only declared when the sidecar columns actually exist") {
    val dir = tmp("gpq_nocov")
    // direct geoparquet write WITHOUT sidecars -> no covering block
    points(10).repartition(1).write.format("geoparquet").mode("overwrite")
      .option(GeoParquetMeta.PrimaryOption, "geo").save(dir)
    val c = GeoParquetMeta.parse(GeoParquetMeta.readGeoKey(spark, dir).get).get.columns("geo")
    assert(c.covering.isEmpty)
    assert(!GeoParquetMeta.readGeoKey(spark, dir).get.contains("covering"))
  }

  test("per-file bbox is exact per FILE, not dataset-wide") {
    val dir = tmp("gpq_pf") + "/pts"
    // two range partitions over x -> two files with disjoint x ranges
    import spark.implicits._
    val df = spark.range(200).select(col("id"),
      st_point(col("id").cast("double"), lit(1.0)).as("geo"))
    graft.plans.GeoParquet.write(df.repartition(2), "geo", dir, cellSize = 50.0)
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet")).map(_.getPath)
    assert(files.length == 2)
    val metas = files.toSeq.map { f =>
      val m = GeoParquetMeta.parse(
        GeoParquetMeta.readGeoKeyOfFile(conf, f).get).get.columns("geo")
      (m.bbox.get, spark.read.parquet(f.toString))
    }
    metas.foreach { case ((xmin, ymin, xmax, ymax), rows) =>
      val agg = rows.agg(min(st_x(col("geo"))), max(st_x(col("geo"))),
        min(st_y(col("geo"))), max(st_y(col("geo")))).head
      assert(xmin == agg.getDouble(0) && xmax == agg.getDouble(1))
      assert(ymin == agg.getDouble(2) && ymax == agg.getDouble(3))
    }
    // the two files' x ranges must differ (Z-order clustering) — proves the
    // bbox is per-file, not a copied dataset bbox
    val (b1, b2) = (metas(0)._1, metas(1)._1)
    assert(b1 != b2)
  }

  test("reader with no hints recovers GEOMETRY typing (and CRS) from the key") {
    val dir = tmp("gpq_tag") + "/pts"
    graft.plans.GeoParquet.write(points(50).repartition(1), "geo", dir,
      cellSize = 5.0, crs = "EPSG:3857")
    // strip any Spark-side schema hints by reading through the geoparquet
    // source alone (the geometry column was never tagged at write time —
    // st_point output is plain BINARY)
    val back = graft.plans.GeoParquet.read(spark, dir)
    val f = back.schema("geo")
    assert(GeoSchema.isGeometry(f), "geo column not tagged on read")
    assert(GeoSchema.crsOf(f) == "EPSG:3857")
    // non-default CRS must be spelled in the footer as a projjson id
    val raw = GeoParquetMeta.readGeoKey(spark, dir).get
    assert(raw.contains(""""crs":{"id":{"authority":"EPSG","code":3857}}"""))
    // and the frame still reads correctly as geometry
    assert(back.where(st_x(col("geo")) >= 0).count() == 50)
  }

  test("GeoTable INSERT data files carry the geo key (catalog write path)") {
    val root = tmp("gpq_tbl") + "/t"
    graft.tables.GeoSql.exec(spark,
      s"CREATE TABLE gpq_meta_t (id BIGINT, geo GEOMETRY) USING GEO LOCATION '$root'")
    graft.tables.GeoSql.exec(spark,
      "INSERT INTO gpq_meta_t SELECT id, st_point(CAST(id AS DOUBLE), 2.0) FROM range(20)")
    // every data file carries the key; the per-file bboxes union to the
    // dataset bbox (the INSERT fans out across test shuffle partitions)
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(conf)
    val files = fs.listFiles(new org.apache.hadoop.fs.Path(s"$root/data"), true)
    val boxes = scala.collection.mutable.ArrayBuffer[(Double, Double, Double, Double)]()
    var nFiles = 0
    while (files.hasNext) {
      val f = files.next()
      if (f.getPath.getName.endsWith(".parquet")) {
        nFiles += 1
        val raw = GeoParquetMeta.readGeoKeyOfFile(conf, f.getPath)
        assert(raw.isDefined, s"GeoTable data file ${f.getPath} missing the geo footer key")
        val meta = GeoParquetMeta.parse(raw.get).get
        assert(meta.primary == "geo")
        meta.columns("geo").bbox.foreach(boxes += _)
      }
    }
    assert(nFiles > 0 && boxes.nonEmpty)
    assert(boxes.map(_._1).min == 0.0 && boxes.map(_._2).min == 2.0 &&
      boxes.map(_._3).max == 19.0 && boxes.map(_._4).max == 2.0)
    graft.tables.GeoTable.drop(spark, "gpq_meta_t")
  }

  test("geometry-free schema writes NO geo key; nulls and mixed types accumulate right") {
    val dir = tmp("gpq_plain")
    spark.range(10).toDF("id").write.format("geoparquet").mode("overwrite").save(dir)
    assert(GeoParquetMeta.readGeoKey(spark, dir).isEmpty)

    val dir2 = tmp("gpq_mixed")
    val df = spark.sql("""
      SELECT id,
             CASE WHEN id = 0 THEN CAST(NULL AS BINARY)
                  WHEN id % 2 = 0 THEN st_geomfromtext('POINT Z (1 2 3)')
                  ELSE st_geomfromtext('MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0)))')
             END AS geo
      FROM range(6)""")
    df.repartition(1).write.format("geoparquet").mode("overwrite")
      .option(GeoParquetMeta.PrimaryOption, "geo").save(dir2)
    val c = GeoParquetMeta.parse(GeoParquetMeta.readGeoKey(spark, dir2).get).get.columns("geo")
    assert(c.geometryTypes.toSet == Set("Point Z", "MultiPolygon"),
      s"got ${c.geometryTypes}") // container name only, Z-suffixed point
    assert(c.bbox.contains((0.0, 0.0, 4.0, 4.0))) // null row skipped
  }

  test("M / ZM suffixes and 3D bbox parse (review regressions)") {
    // measured + 3D-measured geometries get the OGC suffixes, not " Z"
    val dir = tmp("gpq_zm")
    spark.sql("""
      SELECT id, CASE WHEN id % 2 = 0
             THEN st_force3dm(st_geomfromtext('LINESTRING (0 0, 4 4)'), 7.0)
             ELSE st_force4d(st_geomfromtext('LINESTRING (1 1, 2 2)'), 3.0, 9.0)
             END AS geo
      FROM range(4)""").repartition(1)
      .write.format("geoparquet").mode("overwrite")
      .option(GeoParquetMeta.PrimaryOption, "geo").save(dir)
    val c = GeoParquetMeta.parse(GeoParquetMeta.readGeoKey(spark, dir).get).get.columns("geo")
    assert(c.geometryTypes.toSet == Set("LineString M", "LineString ZM"),
      s"got ${c.geometryTypes}")
    assert(c.bbox.contains((0.0, 0.0, 4.0, 4.0))) // M/Z never pollute x/y
    // a third-party 3D bbox ([xmin,ymin,zmin,xmax,ymax,zmax]) parses the
    // max block from the midpoint, not the last two slots
    val json3d = """{"version":"1.1.0","primary_column":"g","columns":
      {"g":{"encoding":"WKB","geometry_types":["Point Z"],
            "bbox":[0.0,10.0,5.0,100.0,20.0,7.0]}}}"""
    val b = GeoParquetMeta.parse(json3d).get.columns("g").bbox.get
    assert(b == ((0.0, 10.0, 100.0, 20.0)), s"got $b")
  }

  test("importParquet auto-discovers geometry typing from the geo key") {
    // a GeoParquet dataset whose SPARK schema is untagged (st_point output
    // is plain BINARY) — only the geo footer key names the geometry
    val dir = tmp("gpq_import") + "/pts"
    graft.plans.GeoParquet.write(points(40).repartition(1), "geo", dir, cellSize = 5.0)
    val root = tmp("gpq_import_t") + "/t"
    val n = graft.tables.GeoTable.importParquet(spark, root, dir) // NO geomCol hint
    assert(n == 40)
    val m = graft.tables.GeoManifest.read(spark, root)
    assert(m.geomCol.contains("geo"), s"geomCol not discovered: ${m.geomCol}")
    assert(GeoSchema.isGeometry(m.schema("geo")))
    // spatial reads work immediately on the by-reference import
    val cnt = graft.tables.GeoTable.read(spark, root)
      .where(st_x(col("geo")) < 5.0).count()
    assert(cnt == 20)
  }

  test("property: WkbScan envelope == JTS envelope over random geometries, both WKB flavors") {
    import org.locationtech.jts.geom.{Coordinate, Geometry}
    val fac = new org.locationtech.jts.geom.GeometryFactory()
    val rnd = new scala.util.Random(42)
    def coord(z: Boolean) = {
      val c = new Coordinate(rnd.nextInt(2000) - 1000, rnd.nextInt(2000) - 1000)
      if (z) c.setZ(rnd.nextInt(100)); c
    }
    def line(z: Boolean) = fac.createLineString(Array.fill(2 + rnd.nextInt(5))(coord(z)))
    def rect(z: Boolean) = { // valid by construction
      val c0 = coord(z); val w = 1 + rnd.nextInt(50); val h = 1 + rnd.nextInt(50)
      fac.createPolygon(Array(c0, new Coordinate(c0.x + w, c0.y, c0.getZ),
        new Coordinate(c0.x + w, c0.y + h, c0.getZ),
        new Coordinate(c0.x, c0.y + h, c0.getZ), c0))
    }
    def geom(depth: Int): Geometry = rnd.nextInt(if (depth > 0) 7 else 6) match {
      case 0 => fac.createPoint(coord(rnd.nextBoolean()))
      case 1 => line(rnd.nextBoolean())
      case 2 => rect(rnd.nextBoolean())
      case 3 => fac.createMultiPointFromCoords(Array.fill(1 + rnd.nextInt(4))(coord(false)))
      case 4 => fac.createMultiLineString(Array.fill(1 + rnd.nextInt(3))(line(false)))
      case 5 => fac.createMultiPolygon(Array.fill(1 + rnd.nextInt(3))(rect(false)))
      case _ => fac.createGeometryCollection(Array.fill(1 + rnd.nextInt(3))(geom(depth - 1)))
    }
    for (_ <- 1 to 300; g = geom(2);
         wkb <- Seq(graft.geom.Geom.serialize(g), graft.geom.Geom.serializeIso(g))) {
      val (e, got) = (g.getEnvelopeInternal,
        GeoParquetMeta.scanOne(wkb).getOrElse(sys.error(s"scan saw nothing for $g")))
      assert(got._1 == e.getMinX && got._2 == e.getMinY &&
        got._3 == e.getMaxX && got._4 == e.getMaxY,
        s"envelope mismatch for $g: got $got expected $e")
      val expType = g.getGeometryType +
        (if (!g.isEmpty && !java.lang.Double.isNaN(g.getCoordinate.getZ)) " Z" else "")
      assert(got._5 == expType, s"type mismatch for $g: got ${got._5} expected $expType")
    }
    // empty geometries scan to no envelope, no crash
    assert(GeoParquetMeta.scanOne(
      graft.geom.Geom.serialize(fac.createPoint())).isEmpty)
  }

  test("unsupported WKB type POISONS the file's footer stats (never under-covers)") {
    import spark.implicits._
    import org.locationtech.jts.geom.Coordinate
    val fac = new org.locationtech.jts.geom.GeometryFactory()
    val good = graft.geom.Geom.serialize(fac.createPoint(new Coordinate(1, 2)))
    // GeometryCollection(LE) of [Point(500,600), CircularString(type 8)]:
    // the far point is consumed BEFORE the unsupported code aborts the scan,
    // so a non-poisoning writer would stamp a bbox that misses whatever the
    // curve covers — spec readers pruning on it would silently drop rows
    val bb = java.nio.ByteBuffer.allocate(35).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(1: Byte).putInt(7).putInt(2)                       // collection, 2 parts
    bb.put(1: Byte).putInt(1).putDouble(500).putDouble(600)   // the far point
    bb.put(1: Byte).putInt(8)                                 // CircularString
    val bad = bb.array()
    assert(GeoParquetMeta.scanOne(bad).isEmpty) // poisoned: scan reports nothing
    val dir = tmp("gpq_poison")
    Seq((0L, good), (1L, bad)).toDF("id", "geo")
      .repartition(1).write.format("geoparquet").mode("overwrite")
      .option(GeoParquetMeta.PrimaryOption, "geo").save(dir)
    val c = GeoParquetMeta.parse(GeoParquetMeta.readGeoKey(spark, dir).get).get.columns("geo")
    assert(c.bbox.isEmpty, s"poisoned file must publish NO bbox, got ${c.bbox}")
    assert(c.geometryTypes.isEmpty,
      s"poisoned file must publish NO geometry_types, got ${c.geometryTypes}")
  }

  test("conflicting cross-file CRS fails loudly instead of first-file-wins") {
    // two writers, same directory, same column name, DIFFERENT declared CRS
    // — tagging the whole relation with either writer's CRS would silently
    // misplace the other writer's coordinates
    val a = tmp("gpq_crs_a"); val b = tmp("gpq_crs_b"); val mix = tmp("gpq_crs_mix")
    points(10).repartition(1).write.format("geoparquet").mode("overwrite")
      .option(GeoParquetMeta.PrimaryOption, "geo").save(a)
    points(10).repartition(1).write.format("geoparquet").mode("overwrite")
      .option(GeoParquetMeta.PrimaryOption, "geo")
      .option(GeoParquetMeta.CrsOptionPrefix + "geo", "EPSG:3857").save(b)
    val fs = java.nio.file.FileSystems.getDefault
    def copyParts(src: String, tag: String): Unit =
      java.nio.file.Files.list(fs.getPath(src)).filter(_.toString.endsWith(".parquet"))
        .forEach(p => java.nio.file.Files.copy(p, fs.getPath(mix, tag + p.getFileName)))
    copyParts(a, "a_"); copyParts(b, "b_")
    val e = intercept[IllegalStateException] {
      spark.read.format("geoparquet").load(mix).count()
    }
    assert(e.getMessage.contains("conflicting geo footer CRS") &&
      e.getMessage.contains("EPSG:3857"), s"wrong error: ${e.getMessage}")
    // a same-CRS multi-file directory still reads (and tags) fine
    val ok = tmp("gpq_crs_ok")
    points(20).repartition(3).write.format("geoparquet").mode("overwrite")
      .option(GeoParquetMeta.PrimaryOption, "geo").save(ok)
    val df = spark.read.format("geoparquet").load(ok)
    assert(GeoSchema.isGeometry(df.schema("geo")) && df.count() == 20)
  }

  test("crsCheck.strict refuses past the file cap; default stays best-effort") {
    val dir = tmp("gpq_crs_strict")
    points(30).repartition(4).write.format("geoparquet").mode("overwrite")
      .option(GeoParquetMeta.PrimaryOption, "geo").save(dir)
    // cap below the file count: default mode reads (best-effort, warn only)
    spark.conf.set(GeoParquetMeta.CrsCheckMaxKey, "2")
    try {
      assert(spark.read.format("geoparquet").load(dir).count() == 30)
      // strict mode: the same overflow REFUSES at planning, naming the knobs
      spark.conf.set(GeoParquetMeta.CrsCheckStrictKey, "true")
      val e = intercept[Exception] {
        spark.read.format("geoparquet").load(dir).count()
      }
      def chain(t: Throwable): Seq[String] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
          .flatMap(x => Option(x.getMessage)).toSeq
      assert(chain(e).exists(m => m.contains("crsCheck") && m.contains("strict")),
        s"strict overflow must name the confs: ${chain(e)}")
      // a cap covering every file satisfies strict mode again
      spark.conf.set(GeoParquetMeta.CrsCheckMaxKey, "1024")
      assert(spark.read.format("geoparquet").load(dir).count() == 30)
    } finally {
      spark.conf.unset(GeoParquetMeta.CrsCheckMaxKey)
      spark.conf.unset(GeoParquetMeta.CrsCheckStrictKey)
    }
  }

  test("third-party covering (struct bbox) drives pushdown on THEIR columns") {
    // dataset shaped like a GeoPandas 1.1 export: WKB `geometry` + a
    // `bbox` STRUCT column, with the footer declaring covering paths into
    // the struct
    val dir = tmp("gpq_cov3p")
    spark.sql("""
      SELECT st_point(CAST(id AS DOUBLE), CAST(id % 5 AS DOUBLE)) AS geometry,
             named_struct('xmin', CAST(id AS DOUBLE), 'ymin', CAST(id % 5 AS DOUBLE),
                          'xmax', CAST(id AS DOUBLE), 'ymax', CAST(id % 5 AS DOUBLE)) AS bbox,
             id
      FROM range(100)""").repartition(1).write.mode("overwrite").parquet(dir)
    val json = """{"version":"1.1.0","primary_column":"geometry","columns":
      {"geometry":{"encoding":"WKB","geometry_types":["Point"],
        "covering":{"bbox":{"xmin":["bbox","xmin"],"ymin":["bbox","ymin"],
                            "xmax":["bbox","xmax"],"ymax":["bbox","ymax"]}}}}}"""
    val meta = GeoParquetMeta.parse(json).get
    val tagged = GeoParquetMeta.tagSchema(spark.read.parquet(dir).schema, meta)
    val f = tagged("geometry")
    assert(f.metadata.getString(GeoSchema.CoveringPrefix + "xmin") == "bbox.xmin")
    // read with the tagged schema (what inferSchema produces when the
    // footer carries the key) and filter with a literal ST predicate: the
    // derived range conjuncts must land on the THIRD PARTY's struct
    // fields and reach the parquet scan
    import graft.functions.GraftFunctions._
    val df = spark.read.schema(tagged).parquet(dir)
      .where(st_contains(st_polygonFromEnvelope(lit(10.0), lit(0.0), lit(20.0), lit(4.0)),
        col("geometry")))
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters") &&
      physical.replace("`", "").contains("bbox.xmin"),
      s"covering conjuncts did not reach the scan:\n$physical")
    // ST_Contains is strict: boundary points (x=10/20, y=0/4) fall out
    assert(df.count() == spark.read.parquet(dir)
      .where(col("id") > 10 && col("id") < 20 &&
        col("id") % 5 > 0 && col("id") % 5 < 4).count())

    // spec-noncompliant writer: NULL bbox beside a matching non-null
    // geometry — the null-guarded conjuncts must fall through to the
    // exact predicate, never silently drop the row
    val dir2 = tmp("gpq_cov_null")
    spark.sql("""
      SELECT st_point(15.0, 2.0) AS geometry,
             CAST(NULL AS STRUCT<xmin: DOUBLE, ymin: DOUBLE, xmax: DOUBLE, ymax: DOUBLE>) AS bbox,
             0L AS id""").write.mode("overwrite").parquet(dir2)
    val tagged2 = GeoParquetMeta.tagSchema(spark.read.parquet(dir2).schema, meta)
    val survivors = spark.read.schema(tagged2).parquet(dir2)
      .where(st_contains(st_polygonFromEnvelope(lit(10.0), lit(0.0), lit(20.0), lit(4.0)),
        col("geometry"))).count()
    assert(survivors == 1, "null-bbox row with matching geometry was dropped by a derived conjunct")
  }

  test("third-party geo metadata (GeoPandas-style, crs null) tags on read") {
    // hand-written footer shape a non-graft writer produces: version only
    // 1.0.0, crs explicit null, bbox absent
    val json = """{"version":"1.0.0","primary_column":"geometry","columns":
      {"geometry":{"encoding":"WKB","geometry_types":[],"crs":null}}}""".stripMargin
    val meta = GeoParquetMeta.parse(json).get
    assert(meta.primary == "geometry")
    assert(meta.columns("geometry").crs == GeoSchema.DefaultCrs)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("geometry",
        org.apache.spark.sql.types.BinaryType)))
    val tagged = GeoParquetMeta.tagSchema(schema, meta)
    assert(GeoSchema.isGeometry(tagged("geometry")))
  }
}
