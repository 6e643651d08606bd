package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Hybrid retrieval: fuse a LEXICAL leg (Okapi BM25 over document text)
 * with a DENSE leg (embedding cosine) by reciprocal-rank fusion — RRF
 * (Cormack, Clarke & Büttcher, SIGIR 2009): fused(d) = Σ_legs
 * 1/(rrfK + rank_leg(d)), a document absent from a leg contributing
 * nothing. RRF is rank-based, so the legs' incomparable score scales
 * need no calibration; it is the standard first fusion of every hybrid
 * search stack (lexical recall for rare exact terms, dense recall for
 * paraphrase), and the retrieval shape RAG/decontamination pipelines run
 * over curated corpora.
 *
 * Scale shape: each leg is an already-scale-safe bounded top-N retrieval
 * (BM25's query-term posting filter under its aggregations, ANN's
 * cluster-pruned probe); the fusion itself touches only the legs' ≤N
 * rows — one tiny aggregation, no driver loop.
 *
 * Capability context: composes SURVEY.md §2.10 (similarity search) with
 * §2.11 (text retrieval); no single reference operator corresponds — the
 * reference's users run this composition by hand.
 */
object Retrieval {

  /** 1-based dense rank over a BOUNDED leg result ordered by
    * (score desc, id asc) — the single-partition window is fine by the
    * leg contract (≤ perLeg rows reach it). */
  private def ranked(leg: DataFrame, id: String, score: String): DataFrame =
    leg.withColumn("rank",
        row_number().over(Window.orderBy(desc(score), asc(id))))
      .select(col(id).as("id"), col("rank"))

  /** The LEXICAL leg ranks by the QUANTIZED BM25 score (round to 1e-6 —
    * the same spelling the standalone BM25 rank queries use): documents
    * with identical tf vectors and doc length tie EXACTLY in real
    * arithmetic, but each engine's parallel sum lands them ulps apart in
    * an order that varies run to run, so a raw-score rank is a coin flip
    * exactly where it feeds fusion (two lex-only docs at leg ranks n and
    * n+1 swap fused scores). Quantized, exact ties compare equal on
    * every engine and the id tiebreak engages portably; two TRULY
    * distinct scores within 1e-6 also just tiebreak by id — portable as
    * well, since both engines quantize identically. The DENSE leg stays
    * raw: a cosine over distinct float vectors is a fixed-order product
    * sum (bit-identical across engines, no structural ties). */
  private def rankedLex(leg: DataFrame, id: String, score: String): DataFrame =
    ranked(leg.withColumn(score, round(col(score), 6)), id, score)

  /**
   * Fuse bounded (id, rank) legs: Σ 1/(rrfK + rank), ties broken by id
   * ascending. Exactly engine-portable for two legs (IEEE addition of two
   * doubles is order-free); with 3+ legs the sum's addend order is
   * unspecified, so scores may differ in the last ulp across engines —
   * ranks remain stable unless two fused scores collide at that ulp.
   */
  def rrfFuse(legs: Seq[DataFrame], k: Int, rrfK: Int = 60): DataFrame = {
    require(legs.nonEmpty, "rrfFuse needs at least one leg")
    require(rrfK >= 0, s"rrfK must be non-negative, got $rrfK")
    legs.map(_.select(col("id"),
        (lit(1.0) / (lit(rrfK.toDouble) + col("rank").cast("double"))).as("__c")))
      .reduce(_ unionByName _)
      .groupBy("id").agg(sum(col("__c")).as("rrf_score"))
      .orderBy(desc("rrf_score"), asc("id"))
      .limit(k)
  }

  /**
   * Ad-hoc hybrid top-k over a corpus: BM25 leg over (docId, text) ×
   * brute-cosine leg over (embId, emb), each cut to `perLeg` candidates,
   * RRF-fused to the final k. The two id columns must share an id space
   * (the embedding of document d carries d's id). Returns
   * (id, rrf_score) ordered by score desc, id asc.
   */
  def hybridTopK(docs: DataFrame, docId: Column, text: Column, query: Seq[String],
                 embs: DataFrame, embId: Column, emb: Column, queryVec: Array[Float],
                 k: Int, perLeg: Int = 50, rrfK: Int = 60): DataFrame = {
    val lex = rankedLex(
      TextAnalysis.bm25TopK(docs, docId, text, query, perLeg), "doc_id", "score")
    val dense = ranked(
      Similarity.bruteTopK(embs, emb, embId, queryVec, perLeg), "vec_id", "score")
    rrfFuse(Seq(lex, dense), k, rrfK)
  }

  /**
   * Index-backed hybrid top-k: probe a persisted BM25 index
   * ([[TextAnalysis.buildTextIndex]] — bucket-pruned term scan) and a
   * persisted IVF or IVF-PQ index, fuse with RRF. Per-leg work is a
   * pruned read of stored index tables; nothing re-tokenizes,
   * re-clusters, or retrains. The dense leg auto-detects the index
   * flavor: stored codebooks present ⇒ [[Similarity.ivfPqSearch]] (the
   * ADC sweep reads CODES only; floats load for the ≤`candidates`
   * rerank pool alone — the 100 TB probe shape), absent ⇒
   * [[Similarity.ivfSearch]] (exact cosine over the probed clusters).
   * `nprobe` trades dense-leg recall for probe cost exactly as in
   * [[Similarity.ivfSearch]] (probe every cluster for unconditional
   * exactness); on a PQ index `candidates` must additionally cover the
   * true per-leg top-`perLeg` within the probed clusters for the fused
   * ranks to be exact ([[Similarity.pqTopK]]'s recall contract).
   */
  def hybridSearch(spark: SparkSession, textIndexRoot: String, ivfIndexRoot: String,
                   query: Seq[String], queryVec: Array[Float], k: Int,
                   perLeg: Int = 50, rrfK: Int = 60, nprobe: Int = 2,
                   candidates: Int = 128): DataFrame = {
    val lex = rankedLex(
      TextAnalysis.bm25Search(spark, textIndexRoot, query, perLeg), "doc_id", "score")
    val denseLeg =
      if (Similarity.hasPqCodebooks(spark, ivfIndexRoot))
        Similarity.ivfPqSearch(spark, ivfIndexRoot, queryVec, perLeg, nprobe, candidates)
      else Similarity.ivfSearch(spark, ivfIndexRoot, queryVec, perLeg, nprobe)
    val dense = ranked(denseLeg, "vec_id", "score")
    rrfFuse(Seq(lex, dense), k, rrfK)
  }
}
