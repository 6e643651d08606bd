package graft.tools

import graft.SparkEntry
import graft.ops.Similarity

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev: for the deterministic ann_knn_graph subsample (vec_id % 20 == 0),
  * measure which banded-LSH configs recall the exact top-k for EVERY
  * sampled vector at a given SF — the precondition for the DuckDB oracle.
  * Usage: runMain graft.tools.KnnGraphProbe [sfDir] [k]
  */
object KnnGraphProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val k = if (args.length > 1) args(1).toInt else 5
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.prep(spark, dir)
    val emb = spark.table("embeddings")
    println("n embeddings = " + emb.count())

    // exact top-k per sampled id via full self-join (small SF only)
    val a = emb.select(col("vec_id").as("id1"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v1"))
      .where(col("id1") % 20 === 0)
    val b = emb.select(col("vec_id").as("id2"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v2"))
    val scored = a.join(b, col("id1") =!= col("id2"))
      .withColumn("cos", expr(
        "aggregate(zip_with(v1, v2, (x, y) -> x * y), 0D, (acc, z) -> acc + z) / " +
        "(sqrt(aggregate(v1, 0D, (acc, x) -> acc + x * x)) * sqrt(aggregate(v2, 0D, (acc, x) -> acc + x * x)))"))
    import org.apache.spark.sql.expressions.Window
    val exact = scored.withColumn("r", row_number().over(
        Window.partitionBy("id1").orderBy(desc("cos"), asc("id2"))))
      .where(col("r") <= k).select("id1", "id2").cache()
    val nExact = exact.count()
    println(s"exact pairs: $nExact")

    for (bits <- Seq(1, 2, 3); bands <- Seq(32, 48, 64)) {
      val g = Similarity.knnGraph(emb, col("embedding"), col("vec_id"), k,
          bitsPerBand = bits, bands = bands)
        .where(col("id1") % 20 === 0).select("id1", "id2")
      val hit = exact.join(g, Seq("id1", "id2"), "left_semi").count()
      println(s"bits=$bits bands=$bands: recalled $hit / $nExact" +
        (if (hit == nExact) "  <-- EXACT" else ""))
    }
    spark.stop()
  }
}
