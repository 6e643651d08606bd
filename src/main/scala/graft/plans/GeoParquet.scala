package graft.plans

import graft.functions.{StBbox, StCentroidCell}

import org.apache.spark.sql.graft.GraftShim
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, DataFrameReader, SparkSession}

/**
 * Geometry-aware parquet layout (SURVEY.md §2.8) — the data-skipping analog
 * of the reference's Iceberg integration (reference:
 * extension/.../SedonaPredicatePushDown.scala:59 maps ST_ predicates onto
 * Iceberg spatial expressions for file pruning).
 *
 * Layout: geometry WKB column + sidecar doubles `<geom>_xmin/_ymin/_xmax/
 * _ymax` + optional `<geom>_cell` partition column. Parquet keeps row-group
 * min/max stats for the sidecar doubles, so a range conjunct on them skips
 * row groups (and prunes partitions via the cell column) exactly like
 * Iceberg metadata skipping — no custom DataSource needed, and
 * `GeoBboxPushdown` injects those conjuncts automatically from ST_
 * predicates.
 */
object GeoParquet {

  def bboxCol(g: Column): Column = GraftShim.column(StBbox(GraftShim.expression(g)))

  /** Append sidecar bbox (+ optional grid cell) columns for `geomCol`. */
  def withSidecars(df: DataFrame, geomCol: String, cellSize: Option[Double] = None): DataFrame = {
    val b = bboxCol(col(geomCol))
    val base = df
      .withColumn(s"${geomCol}_xmin", b.getField("xmin"))
      .withColumn(s"${geomCol}_ymin", b.getField("ymin"))
      .withColumn(s"${geomCol}_xmax", b.getField("xmax"))
      .withColumn(s"${geomCol}_ymax", b.getField("ymax"))
    cellSize match {
      case Some(cs) => base.withColumn(s"${geomCol}_cell",
        GraftShim.column(StCentroidCell(GraftShim.expression(col(geomCol)), GraftShim.expression(lit(cs)))))
      case None => base
    }
  }

  /** Write geometry data with bbox sidecars; rows Z-order (Morton) sorted
    * so 2-D neighbors share row groups (tight min/max stats = real
    * skipping, same idea as Delta/Iceberg Z-ordering). Files carry the
    * standard GeoParquet `geo` footer key (per-file-exact bbox +
    * geometry_types) so GDAL/GeoPandas/DuckDB-spatial read them as typed
    * geometry — see [[graft.sources.GeoParquetMeta]]. */
  def write(df: DataFrame, geomCol: String, path: String,
            cellSize: Double = 1.0, partitionByCell: Boolean = false,
            crs: String = graft.tables.GeoSchema.DefaultCrs): Unit = {
    val out = withSidecars(df, geomCol, Some(cellSize))
      .withColumn("__z", GraftShim.column(graft.functions.StMortonCell(
        GraftShim.expression(col(geomCol)), GraftShim.expression(lit(cellSize)))))
    // range-partition on the Z value first: global clustering, so each
    // FILE (not just each row group) covers a tight bbox range. Partition
    // count follows the input (not spark.sql.shuffle.partitions) to avoid
    // a small-file explosion on modest writes.
    val nParts = math.max(df.rdd.getNumPartitions, 1)
    val sorted = out.repartitionByRange(nParts, col("__z")).sortWithinPartitions("__z").drop("__z")
    val writer = sorted.write.format("geoparquet").mode("overwrite")
      .option(graft.sources.GeoParquetMeta.PrimaryOption, geomCol)
      .option(graft.sources.GeoParquetMeta.CrsOptionPrefix + geomCol, crs)
    if (partitionByCell) writer.partitionBy(s"${geomCol}_cell").save(path)
    else writer.save(path)
  }

  /** Read a (Geo)parquet layout; GEOMETRY typing is recovered from the
    * standard `geo` footer key when present (graft's own exports AND
    * third-party GeoParquet files), with no session hints needed. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.format("geoparquet").load(path)
}
