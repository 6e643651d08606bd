package graft.tables

import org.apache.spark.sql.DataFrame

/**
 * Display ergonomics for GEOMETRY columns: WKB renders as raw bytes in
 * `df.show()`, so the idiomatic preview is `st_astext`. Two affordances:
 *
 *  - [[pretty]]: every GEOMETRY-tagged column rendered as WKT under its
 *    own name — `GeoDisplay.pretty(df).show()` for any frame.
 *  - `spark.conf.set("graft.display.wktPreview", "true")` makes
 *    [[GeoTable.scan]] append a `<geom>_wkt` sibling column (additive —
 *    the geometry column itself stays WKB so downstream ST_ functions and
 *    writes are unaffected).
 */
object GeoDisplay {

  /** Session conf key: when "true", GeoTable.scan appends `<geom>_wkt`. */
  val WktPreviewConf = "graft.display.wktPreview"

  /** Render every GEOMETRY-tagged column as WKT text (same column names).
    * Purely a display projection — the returned frame's geometry columns
    * are STRING and no longer usable as geometry. */
  def pretty(df: DataFrame): DataFrame = {
    import graft.functions.GraftFunctions.st_asText
    import org.apache.spark.sql.functions.col
    val geoms = GeoSchema.geometryColumns(df.schema).map(_._1).toSet
    if (geoms.isEmpty) df
    else df.select(df.schema.fields.toSeq.map { f =>
      if (geoms(f.name)) st_asText(col(f.name)).as(f.name) else col(f.name)
    }: _*)
  }
}
