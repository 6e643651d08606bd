package graft.tools

import graft.tables.{GeoManifest, GeoTable}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Equality-delete scale measurement (dev harness): the write-side claim
 * is that `deleteByKey`/`upsertByKey` commit in O(keys) — independent of
 * table size — while CoW DELETE (and even the MoR position path) must
 * scan candidate files to find matches/ordinals. Measure all three on
 * the same keyed workload at increasing table sizes, plus the read-side
 * price of a live equality delete and the cost of folding it away.
 *
 * Usage: runMain graft.tools.EqDeleteScale [rowsPerStep...]
 */
object EqDeleteScale {
  def main(args: Array[String]): Unit = {
    val steps = if (args.nonEmpty) args.map(_.toLong).toSeq
                else Seq(100000L, 1000000L, 4000000L)
    val spark = SparkSession.builder().master("local[8]")
      .appName("graft-eqdelete-scale")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = body; (a, (System.nanoTime() - t0) / 1e9)
    }

    println(f"${"rows"}%10s ${"files"}%6s ${"eqDel(s)"}%9s ${"morDel(s)"}%10s " +
      f"${"cowDel(s)"}%10s ${"readEq(s)"}%10s ${"fold(s)"}%8s")
    steps.foreach { n =>
      def fresh(tag: String): String = {
        val root = java.nio.file.Files.createTempDirectory(s"eqscale_$tag")
          .toString + "/t"
        GeoTable.create(spark, root,
          spark.range(n).select(col("id"),
            concat(lit("v"), col("id")).as("v")).repartition(16), None)
        root
      }
      val keys = spark.range(1000).select((col("id") * (n / 1000)).as("id"))
        .localCheckpoint()

      val rootEq = fresh("eq")
      val (_, tEq) = time(GeoTable.deleteByKey(spark, rootEq, Seq("id"), keys))
      val (_, tReadEq) = time(GeoTable.read(spark, rootEq).count())
      val (_, tFold) = time(GeoTable.foldSidecars(spark, rootEq))

      val rootMor = fresh("mor")
      val (_, tMor) = time(
        GeoTable.delete(spark, rootMor, col("id").isInCollection(
          keys.collect().map(_.getLong(0)).toSeq), mode = "mor"))

      val rootCow = fresh("cow")
      val (_, tCow) = time(
        GeoTable.delete(spark, rootCow, col("id").isInCollection(
          keys.collect().map(_.getLong(0)).toSeq), mode = "cow"))

      val files = GeoManifest.read(spark, rootEq).files.length
      println(f"$n%10d $files%6d $tEq%9.2f $tMor%10.2f $tCow%10.2f $tReadEq%10.2f $tFold%8.2f")
    }
    spark.stop()
  }
}
