package graft.ops

import graft.functions.{HyperplaneSig, VecCosine}

import org.apache.spark.sql.graft.GraftShim
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Similarity search over an embedding column (SURVEY.md §2.10).
 *
 * - `bruteTopK`: exact cosine top-k. `orderBy(..).limit(k)` compiles to
 *   Spark's TakeOrderedAndProject — each partition keeps a k-heap and only
 *   k rows per partition reach the driver; no global sort at 100 TB.
 * - `lshTopK`: random-hyperplane bucketing; only candidates within
 *   `maxHamming` of the query's signature are scored (signature filter is
 *   a cheap long xor/bit_count in codegen; the expensive cosine runs on
 *   the surviving fraction).
 * - `ivfTopK`: IVF-style coarse quantizer — Lloyd-refined centroids,
 *   search only the `nprobe` nearest inverted lists.
 */
object Similarity {

  private def col2(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    GraftShim.column(e)
  private def ex(c: Column) = GraftShim.expression(c)

  def cosine(a: Column, b: Column): Column = col2(VecCosine(ex(a), ex(b)))

  def hyperplaneSig(v: Column, nbits: Int): Column =
    col2(HyperplaneSig(ex(v), ex(lit(nbits))))

  private def queryLit(q: Array[Float]): Column =
    typedlit(q.toSeq)

  /** Exact brute-force cosine top-k against a constant query vector. */
  def bruteTopK(df: DataFrame, vec: Column, id: Column, q: Array[Float], k: Int): DataFrame =
    df.select(id.as("vec_id"), cosine(vec, queryLit(q)).as("score"))
      .orderBy(desc("score"), asc("vec_id"))
      .limit(k)

  /** LSH-bucketed approximate top-k: hamming prefilter on
    * hyperplane signatures, cosine rerank of survivors. */
  def lshTopK(df: DataFrame, vec: Column, id: Column, q: Array[Float],
              k: Int, nbits: Int = 16, maxHamming: Int = 4): DataFrame = {
    val withSig = df.select(id.as("vec_id"), vec.as("__v"),
      hyperplaneSig(vec, nbits).as("__sig"))
    withSig
      .withColumn("__qsig", hyperplaneSig(queryLit(q), nbits))
      .where(expr(s"bit_count(__sig ^ __qsig) <= $maxHamming"))
      .select(org.apache.spark.sql.functions.col("vec_id"),
        cosine(org.apache.spark.sql.functions.col("__v"), queryLit(q)).as("score"))
      .orderBy(desc("score"), asc("vec_id"))
      .limit(k)
  }

  /**
   * Embedding-cosine near-duplicate pairs: bucket on hyperplane signature
   * (documents whose signatures match exactly), verify cosine >= threshold.
   */
  def cosineNearDupPairs(df: DataFrame, vec: Column, id: Column,
                         threshold: Double, nbits: Int = 12): DataFrame = {
    val sigs = df.select(id.as("__id"), vec.as("__v"), hyperplaneSig(vec, nbits).as("__sig"))
    val a = sigs.select(org.apache.spark.sql.functions.col("__sig"),
      org.apache.spark.sql.functions.col("__id").as("id1"),
      org.apache.spark.sql.functions.col("__v").as("__v1"))
    val b = sigs.select(org.apache.spark.sql.functions.col("__sig").as("__sig2"),
      org.apache.spark.sql.functions.col("__id").as("id2"),
      org.apache.spark.sql.functions.col("__v").as("__v2"))
    a.join(b, a("__sig") === b("__sig2") && a("id1") < b("id2"))
      .withColumn("cos", cosine(org.apache.spark.sql.functions.col("__v1"),
        org.apache.spark.sql.functions.col("__v2")))
      .where(org.apache.spark.sql.functions.col("cos") >= threshold)
      .select("id1", "id2", "cos")
  }

  /**
   * KNN graph: approximate top-k neighbors for EVERY vector (the
   * similarity-join shape a training pipeline runs corpus-wide). Candidate
   * pairs come from multi-probe LSH — `probes` signature variants with one
   * bit flipped widen recall — so the join is bucket-equi, never O(n²);
   * per-vector top-k is a window over candidates only.
   */
  def knnGraph(df: DataFrame, vec: Column, id: Column, k: Int,
               nbits: Int = 12, probes: Int = 4): DataFrame = {
    val c = org.apache.spark.sql.functions.col _
    val sig = df.select(id.as("__id"), vec.as("__v"), hyperplaneSig(vec, nbits).as("__sig"))
    // multi-probe: exact bucket + `probes` single-bit-flip variants
    val probeCols = array((lit(0) +: (0 until math.min(probes, nbits)).map(b => lit(1L << b))): _*)
    val probed = sig.select(c("__id"), c("__v"), c("__sig"),
      explode(probeCols).as("__flip"))
      .withColumn("__bucket", c("__sig").bitwiseXOR(c("__flip")))
      .drop("__flip", "__sig")
    val a = probed.select(c("__bucket"), c("__id").as("id1"), c("__v").as("__v1"))
    val b = sig.select(c("__sig").as("__bucket2"), c("__id").as("id2"), c("__v").as("__v2"))
    val cands = a.join(b, a("__bucket") === b("__bucket2") && a("id1") =!= b("id2"))
      .select(c("id1"), c("id2"), cosine(c("__v1"), c("__v2")).as("cos")).distinct()
    import org.apache.spark.sql.expressions.Window
    cands.withColumn("knn_rank", row_number().over(
        Window.partitionBy(c("id1")).orderBy(c("cos").desc, c("id2").asc)))
      .where(c("knn_rank") <= k)
      .select("id1", "id2", "cos", "knn_rank")
  }

  /**
   * IVF: Lloyd's k-means on a sample (driver holds only k centroids),
   * assignment + centroid update are groupBy aggregations.
   * Returns (assignments DF with `cluster` column, centroids).
   */
  def kmeansAssign(df: DataFrame, vec: Column, id: Column,
                   k: Int, iters: Int = 3, seed: Long = 42L): (DataFrame, Array[Array[Double]]) = {
    val base = df.select(id.as("vec_id"), vec.as("__v")).cache()
    // deterministic init: first k vectors by id
    var centroids: Array[Array[Double]] =
      base.orderBy("vec_id").limit(k).collect()
        .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    for (_ <- 1 to iters) {
      val assigned = assignClusters(base, centroids)
      val upd = assigned
        .select(org.apache.spark.sql.functions.col("cluster"),
          posexplode(org.apache.spark.sql.functions.col("__v")))
        .groupBy("cluster", "pos").agg(avg(org.apache.spark.sql.functions.col("col")).as("m"))
        .groupBy("cluster").agg(map_from_arrays(collect_list("pos"), collect_list("m")).as("mm"))
        .collect()
      for (r <- upd) {
        val cl = r.getInt(0)
        val mm = r.getMap[Int, Double](1)
        val arr = centroids(cl).clone()
        mm.foreach { case (i, v) => arr(i) = v }
        centroids(cl) = arr
      }
    }
    (assignClusters(base, centroids), centroids)
  }

  private def assignClusters(base: DataFrame, centroids: Array[Array[Double]]): DataFrame = {
    val cents = typedlit(centroids.map(_.toSeq).toSeq)
    // argmax cosine over the (small, literal) centroid array via an
    // aggregate fold — fully distributed, no UDF.
    base.withColumn("cluster",
      aggregate(
        sequence(lit(0), lit(centroids.length - 1)),
        struct(lit(-1).cast("int").as("best"), lit(-2.0).as("score")),
        (acc, i) => {
          val s = cosine(org.apache.spark.sql.functions.col("__v"), cents.getItem(i))
          when(s > acc("score"), struct(i.cast("int").as("best"), s.as("score"))).otherwise(acc)
        },
        acc => acc("best")))
  }

  /** IVF search: score only rows in the `nprobe` clusters nearest the query. */
  def ivfTopK(assigned: DataFrame, centroids: Array[Array[Double]],
              q: Array[Float], k: Int, nprobe: Int = 2): DataFrame = {
    val qd = q.map(_.toDouble)
    def cos(c: Array[Double]): Double = {
      var d = 0.0; var nc = 0.0; var nq = 0.0
      var i = 0
      while (i < math.min(c.length, qd.length)) { d += c(i) * qd(i); nc += c(i) * c(i); nq += qd(i) * qd(i); i += 1 }
      if (nc == 0 || nq == 0) 0.0 else d / math.sqrt(nc * nq)
    }
    val probes = centroids.zipWithIndex.sortBy { case (c, _) => -cos(c) }.take(nprobe).map(_._2)
    assigned.where(org.apache.spark.sql.functions.col("cluster").isin(probes.toSeq: _*))
      .select(org.apache.spark.sql.functions.col("vec_id"),
        cosine(org.apache.spark.sql.functions.col("__v"), typedlit(q.toSeq)).as("score"))
      .orderBy(desc("score"), asc("vec_id"))
      .limit(k)
  }
}
