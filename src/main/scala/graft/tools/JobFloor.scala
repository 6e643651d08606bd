package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: per-action driver floors in this environment — how much a
  * minimal job, a shuffle (AQE stage-job), a fresh-plan action, and a
  * tiny parquet write cost. Separates "too many jobs" from "each job is
  * slow" when reading the bench's scheduler gaps. Not part of the driver
  * contract. */
object JobFloor {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)
    def time(name: String, n: Int)(body: Int => Unit): Unit = {
      body(0) // warm
      val ts = (1 to n).map { i =>
        val t0 = System.nanoTime(); body(i); (System.nanoTime() - t0) / 1e6
      }
      println(f"[jobfloor] $name: med=${med(ts)}%.1f ms  min=${ts.min}%.1f  max=${ts.max}%.1f")
    }

    val df1 = spark.range(0, 1000, 1, 1)
    time("count 1 partition (same plan)", 20)(_ => df1.count(): Unit)
    val df4 = spark.range(0, 1000, 1, 4)
    time("count 4 partitions (same plan)", 20)(_ => df4.count(): Unit)
    val rdd1 = spark.sparkContext.parallelize(1 to 1000, 1)
    time("raw RDD count 1 partition", 20)(_ => rdd1.count(): Unit)
    val rdd32 = spark.sparkContext.parallelize(1 to 1000, 32)
    time("raw RDD count 32 partitions", 20)(_ => rdd32.count(): Unit)
    val df = spark.range(1000)
    time("count 32 partitions (same plan)", 20)(_ => df.count(): Unit)
    time("fresh-plan count", 20)(i => spark.range(1000 + i).count(): Unit)
    time("shuffle count (same plan)", 20)(_ =>
      df.repartition(32, col("id")).count(): Unit)
    time("fresh shuffle+agg", 20)(i =>
      spark.range(1000 + i).groupBy((col("id") % 7).as("k")).count().count(): Unit)
    time("localCheckpoint 1k rows", 10)(i =>
      spark.range(1000 + i).localCheckpoint().count(): Unit)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("shuffle count (same plan, AQE off)", 20)(_ =>
      df.repartition(32, col("id")).count(): Unit)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    val tmp = java.nio.file.Files.createTempDirectory("jobfloor").toString
    time("tiny parquet write", 10)(i =>
      spark.range(1000).coalesce(1).write.parquet(s"$tmp/w$i"))
    time("tiny parquet read+count", 10)(i =>
      spark.read.parquet(s"$tmp/w${i % 10}").count(): Unit)
    spark.stop()
  }
}
