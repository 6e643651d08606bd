package graft

/**
 * Suite-wide physical-plan audit: no query in the driver contract may
 * plan a CartesianProduct, and nested-loop joins are allowed only where a
 * one-row frame is deliberately broadcast (the KNN candidate pack, global
 * aggregates). This is the 100x-scale guard — a cartesian that sneaks in
 * at sf0.01 is a cluster-killer at 100 TB.
 */
class PlanAuditSpec extends SparkSpec {

  // ops whose result is localCheckpoint-ed (plan collapses to an RDD scan
  // — their shapes are asserted in SpatialClusterSpec with checkpoint off)
  // or whose invocation mutates session state not worth running twice here
  private val skip = Set("geo_time_travel")

  // queries built on a deliberate one-row broadcast (StKnn candidate pack,
  // global-scalar joins): BroadcastNestedLoopJoin over one row is map-only
  private val oneRowBroadcastOk = Set(
    "spatial_knn_join", "spatial_lof", "ann_brute_top10", "ann_lsh_top10",
    "ann_ivf_top10", "ann_knn_graph", "ann_knn_graph_seeded", "spatial_gi_star",
    "dedup_scale_estimate", "text_unigram_logprob", "mix_weights", "mix_sample",
    "doc_length_quantiles", "dedup_jaccard_exact", "pipeline_clean_corpus",
    "decontaminate_overlap", "dedup_embedding_pairs", "text_fingerprint",
    "pack_chunks")

  test("no driver-contract query plans a CartesianProduct") {
    val dir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.keys.toSeq.sorted.filterNot(skip).flatMap { name =>
      val plan =
        try SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString
        catch { case e: Throwable => fail(s"$name failed to plan: ${e.getMessage}") }
      if (plan.contains("CartesianProduct")) Some(s"$name: CartesianProduct")
      else if (plan.contains("BroadcastNestedLoopJoin") && !oneRowBroadcastOk(name))
        Some(s"$name: unexpected BroadcastNestedLoopJoin")
      else None
    }
    assert(offenders.isEmpty, s"scale-hostile plans:\n${offenders.mkString("\n")}")
  }
}
