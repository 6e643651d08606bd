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

    // scale probe: 1M synthetic points joined to 1000 boxes via tile join
    {
      import graft.functions.GraftFunctions._
      import org.apache.spark.sql.functions._
      val pts = spark.range(1000000).select(col("id").as("pid"),
        st_point(pmod(hash(col("id")), lit(100000)).cast("double") / 10.0,
                 pmod(hash(col("id"), lit(1)), lit(100000)).cast("double") / 10.0).as("pt"))
      val boxes = spark.range(1000).select(col("id").as("bid"),
        st_polygonFromEnvelope(
          pmod(hash(col("id"), lit(2)), lit(9000)).cast("double"),
          pmod(hash(col("id"), lit(3)), lit(9000)).cast("double"),
          pmod(hash(col("id"), lit(2)), lit(9000)).cast("double") + 100.0,
          pmod(hash(col("id"), lit(3)), lit(9000)).cast("double") + 60.0).as("box"))
      val j = graft.plans.SpatialJoin.broadcastTileJoin(
        pts, col("pt"), boxes, col("box"), "within", cellSize = 200.0)
      j.count() // warm
      val t0 = System.nanoTime()
      val n = j.count()
      println(f"tile_join_1Mx1k: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n pairs)")
    }
    spark.stop()
  }
}
