package graft.tools

import graft.tables.{GeoCatalog, GeoManifest}
import org.apache.spark.sql.SparkSession

/** Scratch repro for native row-level DML debugging (not shipped API). */
object CowDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.extension.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    graft.tables.GeoRowLevel.debug = true
    val wh = java.nio.file.Files.createTempDirectory("cowdbg").toString
    spark.conf.set("spark.sql.catalog.geo", classOf[GeoCatalog].getName)
    spark.conf.set("spark.sql.catalog.geo.warehouse", wh)
    spark.sql("CREATE NAMESPACE geo.db")
    spark.sql("CREATE TABLE geo.db.dml (id INT, flag INT, geo BINARY) USING geo " +
      "TBLPROPERTIES('geometry.column'='geo')")
    spark.sql("INSERT INTO geo.db.dml SELECT id, 0, st_point(CAST(id AS DOUBLE), 0.0D) FROM range(10)")
    val root = s"$wh/db/dml"
    def dump(tag: String): Unit = {
      val m = GeoManifest.read(spark, root)
      println(s"== $tag v=${m.version} files=${m.files.map(f => f.path.split('/').last + ":" + f.rows).mkString(", ")}")
      println("   rows: " + spark.sql("SELECT id, flag FROM geo.db.dml ORDER BY id, flag")
        .collect().map(r => s"${r.getInt(0)}/${r.getInt(1)}").mkString(" "))
    }
    dump("after insert")
    spark.sql("UPDATE geo.db.dml SET flag = 1 WHERE ST_Within(geo, st_makeenvelope(2.5D, -1.0D, 6.5D, 1.0D))")
    dump("after update")
    spark.sql("DELETE FROM geo.db.dml WHERE id >= 8")
    dump("after delete")
    spark.stop()
  }
}
