package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Range join: left rows with a scalar value joined to right rows carrying
 * [lo, hi] intervals, on `lo <= value <= hi` — which Spark would otherwise
 * execute as BNLJ.
 *
 * Spark-first plan (1-D analog of the spatial tile join): each interval
 * explodes to the buckets it covers; each value lands in exactly ONE
 * bucket, so the join is a plain equi-join on the bucket id with a final
 * `BETWEEN` refine and NO pair dedup at all. Shuffle width is bounded by
 * interval-width / bucketSize; pick bucketSize near the typical interval
 * width so intervals replicate a handful of times.
 */
object RangeJoin {

  def bucketJoin(
      left: DataFrame, valueCol: Column,
      right: DataFrame, loCol: Column, hiCol: Column,
      bucketSize: Double,
      broadcastRight: Boolean = false): DataFrame = {
    val c = org.apache.spark.sql.functions.col _
    val lb = left
      .withColumn("__val", valueCol)
      .withColumn("__b", floor(valueCol / bucketSize))
    val rb0 = right
      .withColumn("__lo", loCol).withColumn("__hi", hiCol)
      .withColumn("__rb", explode(sequence(floor(loCol / bucketSize), floor(hiCol / bucketSize))))
    val rb = if (broadcastRight) broadcast(rb0) else rb0
    lb.join(rb, c("__b") === c("__rb") && c("__val") >= c("__lo") && c("__val") <= c("__hi"))
      .drop("__val", "__b", "__lo", "__hi", "__rb")
  }
}
