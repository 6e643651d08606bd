package graft
import graft.tables.GeoCatalog
import org.apache.spark.sql.functions._
class DbgShowCreateSpec extends SparkSpec {
  test("dump native SHOW CREATE") {
    spark.conf.set("spark.sql.geospatial.enabled", "true")
    val dir = java.nio.file.Files.createTempDirectory("dbg_sc_wh").toString
    spark.conf.set("spark.sql.catalog.geosc", classOf[GeoCatalog].getName)
    spark.conf.set("spark.sql.catalog.geosc.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS geosc.db")
    spark.sql("CREATE TABLE geosc.db.t (id BIGINT NOT NULL, nat BIGINT, g GEOMETRY(3857)) USING geo " +
      "PARTITIONED BY (bucket(4, id)) " +
      "TBLPROPERTIES ('team'='data-eng', 'sort.order'='nat', 'quoted'='it''s here')")
    val stmt = spark.sql("SHOW CREATE TABLE geosc.db.t").head.getString(0)
    println("=== STMT START ===")
    println(stmt)
    println("=== STMT END ===")
  }
}
