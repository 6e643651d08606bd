package graft.tables

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/**
 * GEOMETRY column typing (SURVEY.md §2.8; reference DDL declares
 * `geo GEOMETRY` — reference: extension/src/test/scala/org/apache/iceberg/
 * TestSedonaIcebergExtension.scala:56).
 *
 * graft's geometry is WKB in a `BINARY` column; this module makes that
 * convention self-describing by tagging the StructField metadata
 * (`graft.type = geometry`, `graft.crs = EPSG:...`). Spark persists field
 * metadata in the parquet footer (`org.apache.spark.sql.parquet.row.
 * metadata`), so the tag round-trips through GeoParquet/GeoTable files and
 * any reader can discover which binary columns are geometry and in which
 * CRS — the capability match for Iceberg's typed `geo GEOMETRY` columns.
 *
 * Spark 4.1 ships a native `org.apache.spark.sql.types.GeometryType`, but
 * its expression surface and parquet integration are internal/incomplete in
 * 4.1; metadata-on-BINARY is the stable public-API representation (same
 * approach as the GeoParquet spec: typed metadata over plain parquet
 * binary).
 */
object GeoSchema {

  val TypeKey = "graft.type"
  val CrsKey = "graft.crs"
  /** Metadata-key prefix recording a GeoParquet `covering` bbox path per
    * corner (`graft.covering.xmin` = dotted column path, etc.) — set by
    * GeoParquetMeta.tagSchema from third-party footers, consumed by
    * GeoBboxPushdown to derive pruning conjuncts on THEIR columns. */
  val CoveringPrefix = "graft.covering."
  val GeometryTag = "geometry"
  /** Explicit opt-out tag: binary that must NOT be fed to ST_ functions. */
  val OpaqueTag = "opaque"
  val DefaultCrs = "EPSG:4326"

  def geometryMetadata(crs: String = DefaultCrs, base: Metadata = Metadata.empty): Metadata =
    new MetadataBuilder().withMetadata(base)
      .putString(TypeKey, GeometryTag).putString(CrsKey, crs).build()

  /** Tag `colName` (must be BINARY) as a geometry column. */
  def markGeometry(df: DataFrame, colName: String, crs: String = DefaultCrs): DataFrame = {
    val field = df.schema(colName)
    require(field.dataType == BinaryType,
      s"geometry column '$colName' must be BINARY (WKB), got ${field.dataType.simpleString}")
    df.withColumn(colName, df(colName).as(colName, geometryMetadata(crs, field.metadata)))
  }

  /** Tag `colName` as opaque binary (image/audio payloads etc) — ST_
    * functions applied to it are rejected at analysis time. */
  def markOpaque(df: DataFrame, colName: String): DataFrame = {
    val field = df.schema(colName)
    val md = new MetadataBuilder().withMetadata(field.metadata).putString(TypeKey, OpaqueTag).build()
    df.withColumn(colName, df(colName).as(colName, md))
  }

  def isGeometry(field: StructField): Boolean =
    field.metadata.contains(TypeKey) && field.metadata.getString(TypeKey) == GeometryTag

  def crsOf(field: StructField): String =
    if (field.metadata.contains(CrsKey)) field.metadata.getString(CrsKey) else DefaultCrs

  /** (name, crs) for every tagged geometry column. */
  def geometryColumns(schema: StructType): Seq[(String, String)] =
    schema.fields.toSeq.collect { case f if isGeometry(f) => f.name -> crsOf(f) }

  /** Read-side validation: every tagged geometry column must be BINARY.
    * Catches schema drift (e.g. a later writer replaced the column with a
    * string) before queries hit undecodable values mid-scan. */
  def validate(schema: StructType): Unit =
    schema.fields.foreach { f =>
      if (isGeometry(f) && f.dataType != BinaryType)
        throw new IllegalArgumentException(
          s"column '${f.name}' is tagged ${TypeKey}=${GeometryTag} but has type " +
            s"${f.dataType.simpleString}; geometry columns must be BINARY (WKB)")
    }

  /** DDL text -> schema, mapping the GEOMETRY keyword to tagged BINARY.
    * `GEOMETRY(crs)` variants: `geo GEOMETRY`, `geo GEOMETRY('EPSG:3857')`,
    * and the Spark-4.1-native SRID spelling `geo GEOMETRY(3857)`. */
  def fromDdl(ddl: String): StructType = {
    val crsByCol = scala.collection.mutable.Map[String, String]()
    val geomRe = """(?i)(\w+)\s+GEOMETRY(?:\s*\(\s*(?:'([^']*)'|(\d+))\s*\))?""".r
    val replaced = geomRe.replaceAllIn(ddl, m => {
      crsByCol(m.group(1).toLowerCase) =
        Option(m.group(2)).orElse(Option(m.group(3)).map("EPSG:" + _)).getOrElse(DefaultCrs)
      m.group(1) + " BINARY"
    })
    StructType(StructType.fromDDL(replaced).fields.map { f =>
      crsByCol.get(f.name.toLowerCase) match {
        case Some(crs) => f.copy(metadata = geometryMetadata(crs, f.metadata))
        case None => f
      }
    })
  }
}
