package graft.ops

import org.apache.spark.sql.DataFrame

private[ops] object OpsUtil {
  /**
   * Guarantee enough partitions to use the cluster for a CPU-heavy
   * projection (shingling, MinHash, banded LSH): a small parquet input
   * often arrives as 1-2 partitions, which would serialize hundreds of
   * millions of hash ops onto one core. Only widens — a 100 TB input
   * already has more partitions than cores and passes through untouched,
   * so no shuffle is added at scale.
   */
  def ensureParallelism(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
