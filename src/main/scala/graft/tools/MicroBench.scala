package graft.tools

import graft.SparkEntry

import org.apache.spark.sql.SparkSession

/** Dev micro-benchmark: hot ST paths over lineitem at the given sf. */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.prep(spark, dir)

    def time(name: String, sql: String, n: Int = 5): Unit = {
      spark.sql(sql).count() // warm
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => spark.sql(sql).count())
      println(f"$name: ${(System.nanoTime() - t0) / 1e9 / n}%.3f s/iter")
    }

    time("range_filter_600k", """
      SELECT COUNT(*) FROM lineitem
      WHERE st_contains(st_polygonfromenvelope(0.02, 0.02, 0.9, 0.07),
                        st_point(l_discount, l_tax))""")
    time("point_accessors_600k", """
      SELECT SUM(st_x(p) + st_y(p)) FROM
        (SELECT st_point(l_discount, l_tax) AS p FROM lineitem)""")
    time("distance_600k", """
      SELECT SUM(st_distance(st_point(l_discount, l_tax), st_point(0.5, 0.5))) FROM lineitem""")
    spark.stop()
  }
}
