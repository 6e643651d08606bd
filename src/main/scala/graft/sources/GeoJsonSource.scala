package graft.sources

import graft.tables.GeoSchema

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftShim
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Newline-delimited GeoJSON feature reader/writer (the interop format most
 * geo pipelines exchange; Sedona ships an equivalent data source — the
 * reference registers that catalog wholesale via
 * extension/.../SedonaIcebergExtensions.scala:38).
 *
 * Each input line is one GeoJSON `Feature`; the geometry lands as a tagged
 * WKB GEOMETRY column, every requested property as a top-level column.
 * Built from `spark.read.text` + codegen'd JSON path extraction +
 * `st_geomfromgeojson` — fully distributed and splittable by line, no
 * custom DataSource needed.
 */
object GeoJsonSource {

  /** Read ndjson Features: columns = requested properties + `geometry`
    * (WKB, GEOMETRY-tagged). `properties` values arrive as strings —
    * cast downstream as needed. */
  def readFeatures(spark: SparkSession, path: String,
                   properties: Seq[String] = Seq.empty): DataFrame = {
    val lines = spark.read.text(path).where(length(trim(col("value"))) > 0)
    val props = properties.map(p =>
      get_json_object(col("value"), s"$$.properties.$p").as(p))
    val geom = GraftShim.column(graft.functions.StGeomFromGeoJson(
      GraftShim.expression(get_json_object(col("value"), "$.geometry")))).as("geometry")
    GeoSchema.markGeometry(lines.select(props :+ geom: _*), "geometry")
  }

  /** Write a frame as ndjson Features (geometry column + all others as
    * properties). Reader twin roundtrips through `readFeatures`. */
  def writeFeatures(df: DataFrame, geomCol: String, path: String): Unit = {
    val propCols = df.columns.filter(_ != geomCol)
    val propsJson = to_json(struct(propCols.map(col).toSeq: _*))
    val geoJson = GraftShim.column(graft.functions.StAsGeoJson(
      GraftShim.expression(col(geomCol))))
    df.select(concat(
        lit("""{"type":"Feature","geometry":"""), geoJson,
        lit(""","properties":"""), propsJson, lit("}")).as("value"))
      .write.mode("overwrite").text(path)
  }
}
