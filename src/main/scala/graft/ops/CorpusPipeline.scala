package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * End-to-end training-corpus cleaning (SURVEY.md §2.9/§2.11 composition):
 * quality filter -> language filter -> exact dedup -> MinHash near-dup
 * removal, as one reusable operator. Each stage is the corresponding
 * first-class op (TextAnalysis scoring, window exact-dedup,
 * Dedup.nearDupDrops), so the pipeline inherits their scale behavior:
 * one widened pass for scoring, one md5-window shuffle for exact dedup,
 * banded-LSH equi-joins (never all-pairs) for near-dups, and no pinned
 * caches after the call (the intermediate corpus is localCheckpoint'd).
 */
object CorpusPipeline {

  final case class Config(
      minQuality: Double = 0.3,
      minTokens: Int = 10,
      langs: Seq[String] = Seq("en", "fr", "es", "de"),
      nearDupThreshold: Double = 0.5,
      shingleK: Int = 5)

  /**
   * Cleaned corpus: survivors of all four stages, with `n_tokens` and
   * `quality` columns added. Runs the near-dup clustering eagerly; the
   * returned frame reads from checkpointed blocks (no pinned cache).
   */
  def clean(docs: DataFrame, id: Column, text: Column, lang: Column,
            cfg: Config = Config()): DataFrame = {
    val scored = OpsUtil.ensureParallelism(docs)
      .withColumn("n_tokens", TextAnalysis.tokenCount(text))
      .withColumn("quality", TextAnalysis.qualityScore(text))
      .where(col("quality") >= cfg.minQuality && col("n_tokens") >= cfg.minTokens)
      .where(lang.isin(cfg.langs: _*))
    // exact dedup: keep min id per identical text. localCheckpoint (eager)
    // materializes the scoring + md5 window ONCE for both consumers below
    // and pins nothing in the CacheManager.
    val exactKept = scored
      .withColumn("__grp_min", min(id).over(Window.partitionBy(md5(text))))
      .where(id === col("__grp_min")).drop("__grp_min")
      .localCheckpoint()
    val drops = Dedup.nearDupDrops(exactKept, id, text,
      threshold = cfg.nearDupThreshold, shingleK = cfg.shingleK)
    val idName = exactKept.select(id).columns.head
    exactKept.join(drops.withColumnRenamed("id", idName), Seq(idName), "left_anti")
  }

  /** Per-language doc/token accounting over the cleaned corpus. */
  def cleanStats(docs: DataFrame, id: Column, text: Column, lang: Column,
                 cfg: Config = Config()): DataFrame = {
    val langName = docs.select(lang).columns.head
    clean(docs, id, text, lang, cfg)
      .groupBy(langName)
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("total_tokens"))
      .orderBy(langName)
  }
}
