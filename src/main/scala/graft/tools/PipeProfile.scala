package graft.tools

import graft.SparkEntry

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev: stage-level timing of pipeline_clean_corpus. */
object PipeProfile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.prep(spark, dir)
    spark.sql("SELECT COUNT(*) FROM documents").collect()

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[pipe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = spark.table("documents")
    val scored = docs
      .withColumn("n_tokens", graft.ops.TextAnalysis.tokenCount(col("text")))
      .withColumn("quality", graft.ops.TextAnalysis.qualityScore(col("text")))
      .where(col("quality") >= 0.3 && col("n_tokens") >= 10)
      .where(col("lang").isin("en", "fr", "es", "de"))
    time("scored.count")(scored.count())
    val exactKept = scored.withColumn("__grp_min",
        min("doc_id").over(org.apache.spark.sql.expressions.Window.partitionBy(md5(col("text")))))
      .where(col("doc_id") === col("__grp_min")).drop("__grp_min")
    time("exactKept.count")(exactKept.count())
    val pairs = time("minhashDedup build+count") {
      val p = graft.ops.Dedup.minhashDedup(exactKept, col("doc_id"), col("text"), 0.5, 5)
      println(s"  pairs=${p.count()}")
      p
    }
    time("clusterPairs")(graft.ops.Dedup.clusterPairs(pairs).count())
    val drops = time("nearDupDrops full")(
      graft.ops.Dedup.nearDupDrops(exactKept, col("doc_id"), col("text"), 0.5, 5))
    time("left_anti + agg") {
      exactKept.join(drops.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left_anti")
        .groupBy("lang").agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("total_tokens"))
        .orderBy("lang").count()
    }
    time("FULL query")(SparkEntry.queries("pipeline_clean_corpus")(spark, dir).count())
    time("FULL query again")(SparkEntry.queries("pipeline_clean_corpus")(spark, dir).count())
    spark.stop()
  }
}
