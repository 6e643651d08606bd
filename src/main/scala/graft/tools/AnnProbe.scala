package graft.tools

import graft.SparkEntry
import graft.ops.Similarity

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev: measure what the ANN prefilters must pass for exact recall at a
  * given SF — hamming distance of the TRUE cosine top-k from the query's
  * hyperplane signature, and the IVF cluster of each true neighbor.
  * Usage: runMain graft.tools.AnnProbe [sfDir] [k] [nbits]
  */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val k = if (args.length > 1) args(1).toInt else 10
    val nbits = if (args.length > 2) args(2).toInt else 16
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.prep(spark, dir)
    val emb = spark.table("embeddings")
    val q = emb.where(col("vec_id") === 0).select("embedding").head.getSeq[Float](0).toArray
    val top = Similarity.bruteTopK(emb, col("embedding"), col("vec_id"), q, k)
    val withSig = emb.select(col("vec_id"), Similarity.hyperplaneSig(col("embedding"), nbits).as("sig"))
      .withColumn("qsig", Similarity.hyperplaneSig(typedlit(q.toSeq), nbits))
      .withColumn("hamming", expr("bit_count(sig ^ qsig)"))
    top.join(withSig, "vec_id").orderBy(desc("score"))
      .select("vec_id", "score", "hamming").show(k, false)
    println("max hamming among true top-" + k + ": " +
      top.join(withSig, "vec_id").agg(max("hamming")).head.get(0))
    val (assigned, cents) = Similarity.kmeansAssign(emb, col("embedding"), col("vec_id"), k = 8, iters = 2)
    val qd = q.map(_.toDouble)
    def cos(c: Array[Double]): Double = {
      var d = 0.0; var nc = 0.0; var nq = 0.0; var i = 0
      while (i < math.min(c.length, qd.length)) { d += c(i)*qd(i); nc += c(i)*c(i); nq += qd(i)*qd(i); i += 1 }
      if (nc == 0 || nq == 0) 0.0 else d / math.sqrt(nc * nq)
    }
    val order = cents.zipWithIndex.sortBy { case (c, _) => -cos(c) }.map(_._2)
    println("centroid probe order (closest first): " + order.mkString(","))
    top.join(assigned, "vec_id").groupBy("cluster").count().orderBy("cluster").show()
    spark.stop()
  }
}
