package graft.tools

import graft.SparkEntry
import graft.functions.GraftFunctions

import org.apache.spark.sql.SparkSession

/** Dev smoke: drives the flagship entry + edge probes on a vanilla session
  * (the same way the driver's smoke check calls us). */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    println("--- entry() on vanilla session ---")
    SparkEntry.entry(spark).show(30, truncate = false)

    println("--- probe: nulls propagate through ST chain ---")
    GraftFunctions.register(spark)
    spark.sql("""SELECT st_x(st_point(CAST(NULL AS DOUBLE), 1.0D)) AS null_x,
                        st_astext(st_point(1, 2)) AS int_coords,
                        st_contains(st_polygonfromenvelope(0,0,10,10), CAST(NULL AS BINARY)) AS null_geom
              """).show(truncate = false)

    println("--- probe: bad arity is a clean error ---")
    try { spark.sql("SELECT st_point(1.0D)").collect() }
    catch { case e: Throwable => println(s"error class=${e.getClass.getSimpleName}: ${e.getMessage.linesIterator.next()}") }

    println("--- probe: st function on session WITHOUT registration ---")
    val fresh = spark.newSession()
    try { fresh.sql("SELECT st_point(1.0D, 2.0D)").collect() }
    catch { case e: Throwable => println(s"error class=${e.getClass.getSimpleName}: ${e.getMessage.linesIterator.next()}") }

    spark.stop()
  }
}
