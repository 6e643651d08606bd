package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * As-of join: for every left row, the most recent right row with
 * `rightOn <= leftOn` for the same key (the time-series/backfill join).
 *
 * Spark-first plan: UNION both sides, ONE shuffle on the key, then a
 * running `last(..., ignoreNulls)` window ordered by (time, side) — right
 * rows sort before left rows at equal timestamps so `<=` semantics hold.
 * No range join, no per-row binary search, no custom physical operator;
 * at 100 TB this is a single sort-shuffle either side already needs.
 *
 * Right rows must be unique per (key, time) — pre-aggregate if not
 * (otherwise which of the tied rows wins is nondeterministic).
 */
object AsofJoin {

  def asofJoin(
      left: DataFrame, leftKey: Column, leftOn: Column,
      right: DataFrame, rightKey: Column, rightOn: Column,
      rightValueCols: Seq[String]): DataFrame = {

    val c = org.apache.spark.sql.functions.col _
    val leftCols = left.columns
    val l2 = left.select(
      leftKey.as("__k"), leftOn.as("__t"), lit(1).as("__side"),
      struct(leftCols.map(c): _*).as("__lrow"),
      lit(null).cast(org.apache.spark.sql.types.StructType(
        right.select(rightValueCols.map(c): _*).schema.fields)).as("__rrow"))
    val r2 = right.select(
      rightKey.as("__k"), rightOn.as("__t"), lit(0).as("__side"),
      lit(null).cast(l2.schema("__lrow").dataType).as("__lrow"),
      struct(rightValueCols.map(c): _*).as("__rrow"))

    val w = Window.partitionBy(c("__k"))
      .orderBy(c("__t").asc, c("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = l2.unionByName(r2)
      .withColumn("__match", last(c("__rrow"), ignoreNulls = true).over(w))
      .where(c("__side") === 1)

    val out = leftCols.map(n => c("__lrow").getField(n).as(n)) ++
      rightValueCols.map(n => c("__match").getField(n).as(s"asof_$n"))
    matched.select(out: _*)
  }
}
