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
  private val skip = Set("geo_time_travel", "geo_changelog")

  // queries built on a deliberate one-row broadcast (StKnn candidate pack,
  // global-scalar cross joins): BroadcastNestedLoopJoin over ONE row is a
  // map-only enrich, not a quadratic join. Exact set — a new BNLJ anywhere
  // else fails the audit.
  private val oneRowBroadcastExpected = Set(
    "spatial_knn_join",        // StKnn packed-candidates single row
    "text_unigram_logprob",    // corpus-total scalar
    "dedup_jaccard_exact",     // shingle-threshold scalar
    "pack_bins_invariants",    // two one-row invariant aggregates crossed
    "text_bm25_topk",          // N+avgdl one-row corpus stats
    "hybrid_rrf_top10",        // its ad-hoc BM25 leg IS bm25TopK (same one-row stats)
    "dsir_weights_topk")       // raw/target total one-row aggregates
    // (the bm25 INDEX probes resolve stats driver-side as literals —
    // no one-row broadcast in their plans)

  test("no driver-contract query plans a CartesianProduct; BNLJ only on one-row broadcasts") {
    val dir = "/root/testdata/sf0.001"
    val cartesian = Seq.newBuilder[String]
    val bnlj = Set.newBuilder[String]
    SparkEntry.queries.keys.toSeq.sorted.filterNot(skip).foreach { name =>
      val plan =
        try SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString
        catch { case e: Throwable => fail(s"$name failed to plan: ${e.getMessage}") }
      if (plan.contains("CartesianProduct")) cartesian += name
      if (plan.contains("BroadcastNestedLoopJoin")) bnlj += name
    }
    assert(cartesian.result().isEmpty, s"CartesianProduct in: ${cartesian.result()}")
    assert(bnlj.result() == oneRowBroadcastExpected,
      s"BroadcastNestedLoopJoin set changed: ${bnlj.result().toSeq.sorted}")
  }

  test("no graft CodegenFallback scalar expression in any driver-contract plan") {
    // a CodegenFallback splits whole-stage codegen and row-boxes every
    // input of its stage, so one sneaking into a per-row pipeline is a
    // real regression. Scope: OUR scalar expressions only — Spark's own
    // HOF machinery (lambdafunction, transform, ...) and aggregates
    // (collect_list, percentile, and every TypedImperativeAggregate,
    // including the st_*_aggr family) are CodegenFallback by design and
    // never inside a codegen stage to begin with.
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction
    val dir = "/root/testdata/sf0.001"
    val offenders = scala.collection.mutable.SortedMap[String, Seq[String]]()
    SparkEntry.queries.keys.toSeq.sorted.filterNot(skip).foreach { name =>
      val qe = SparkEntry.queries(name)(spark, dir).queryExecution
      val fb = qe.optimizedPlan.collectWithSubqueries {
        case p => p.expressions.flatMap(_.collect {
          case e: CodegenFallback if e.getClass.getName.startsWith("graft.") &&
            !e.isInstanceOf[AggregateFunction] => e.prettyName
        })
      }.flatten.distinct.sorted
      if (fb.nonEmpty) offenders(name) = fb
    }
    assert(offenders.isEmpty,
      s"graft CodegenFallback expressions in benched queries:\n${offenders.mkString("\n")}")
  }
}
