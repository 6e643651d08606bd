package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: hamming distance of every true-top-k neighbor's 16-bit
  * hyperplane signature from the query's, per scale factor — sizes
  * ann_lsh_top10's maxHamming recall knob against the data instead of
  * guessing. Not part of the driver contract. */
object LshRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { d =>
      val emb = spark.read.parquet(s"$d/embeddings.parquet")
      val q = emb.where(col("vec_id") === 0).select("embedding").head.getSeq[Float](0).toArray
      val qlit = typedlit(q.toSeq)
      val nbits = 16
      val sig = graft.ops.Similarity.hyperplaneSig(col("embedding"), nbits)
      val qsig = graft.ops.Similarity.hyperplaneSig(qlit, nbits)
      val scored = emb.select(col("vec_id"), sig.as("__sig"), qsig.as("__qsig"),
          graft.ops.Similarity.cosine(col("embedding"), qlit).as("score"))
        .withColumn("ham", expr("bit_count(__sig ^ __qsig)"))
        .orderBy(desc("score"), asc("vec_id")).limit(10)
        .select("vec_id", "score", "ham").collect()
      val maxHam = scored.map(_.getInt(2)).max
      println(s"[lshprobe] $d: max hamming over true top-10 = $maxHam  " +
        scored.map(r => s"${r.getLong(0)}:${r.getInt(2)}").mkString(" "))
    }
    spark.stop()
  }
}
