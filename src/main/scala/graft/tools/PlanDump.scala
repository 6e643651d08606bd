package graft.tools

import graft.SparkEntry

import org.apache.spark.sql.SparkSession

import java.nio.file.{Files, Paths}

/** Dev tool: dump formatted physical plans of headline queries to PLANS.md. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val headliners = Seq(
      "q5_local_supplier" -> "six-way join: all-broadcast tree, single agg shuffle",
      "spatial_tile_join" -> "spatial join: cell-explode + broadcast hash join, big side unshuffled",
      "spatial_dwithin_join" -> "distance join: expanded-cell tiling, same equi-join shape",
      "ann_brute_top10" -> "exact ANN: TakeOrderedAndProject (per-partition k-heap)",
      "dedup_minhash_pairs" -> "MinHash LSH: band-key equi-joins, no cross product",
      "st_contains_range" -> "range query: constant-folded envelope, PreparedGeometry filter",
      "asof_join_events" -> "as-of join: one shuffle, running last() window, no range join",
      "range_join_bands" -> "range join: interval buckets, broadcast equi-join, no BNLJ",
      "spatial_knn_join" -> "KNN join: broadcast candidates, map-only StKnn top-k, key re-join",
      "zone_enrich_batch" -> "stream-static enrich (batch view): tile rewrite to broadcast hash join",
      "st_transform_mercator" -> "reprojection: pure projection, single codegen stage",
      "dedup_embedding_pairs" -> "banded hyperplane LSH: explode + equi-join + cosine verify",
      "spatial_dbscan" -> "DBSCAN: position contraction, eps-grid candidate equi-join, CC labels",
      "spatial_gi_star" -> "Getis-Ord Gi*: grid neighbor sums + one-row broadcast of globals",
      "pack_chunks" -> "sequence packing: one window shuffle on the group key, offsets broadcast from a |groups|-row side",
      "mix_sample" -> "data mixing: tiny rate aggregate broadcast into a shuffle-free hash filter",
      "dedup_simhash_pairs" -> "portable simhash: single-pass signature, pigeonhole band equi-join",
      "geo_spj" -> "storage-partitioned join: key-grouped scans, join carries NO Exchange",
      "geo_runtime_prune" -> "runtime file pruning: dynamicpruning subquery narrows the fact scan",
      "geo_analyze" -> "ANALYZE NDV -> CBO broadcast: static BroadcastHashJoin, no SMJ",
      "ann_ivf_persisted_top10" -> "persisted IVF probe: cluster-IN-pruned scan + per-partition k-heap, no k-means",
      "geo_bloom_prune" -> "bloom file skipping: point lookup opens only the files whose blooms might hold the keys",
      "ann_ivfpq_top10" -> "persisted IVF-PQ probe: cluster-pruned scan, codegen'd ADC sweep over codes, exact rerank of the pool",
      "geo_metadata_delete" -> "retention DELETE aftermath: scan reads only surviving partitions (the delete itself planned zero jobs)",
      "geo_view" -> "persisted view: expanded at resolution into the ordinary agg plan — nothing view-shaped survives to execution",
      "geo_transform_fns" -> "FunctionCatalog transforms from SQL: V2 ScalarFunction invocations inline in the projection, one codegen stage",
      "multimodal_audio_decode" -> "audio decode: single mapPartitions stage (init-once codec shape), no shuffle before the sort",
      "cluster_semdedup" -> "SemDedup (plan shows the eager localCheckpoint result scan; the cluster+band bucketed equi-join + cosine verify execute upstream of it — candidate volume pinned ~linear by the OpsSpec banding test)",
      "text_bm25_topk" -> "BM25: posting filter pushed below both aggregations, one-row stats broadcast, TakeOrderedAndProject top-k",
      "text_bm25_indexed_topk" -> "persisted BM25 probe: term-IN scan over the bucket-pruned postings table, df from the pruned lists",
      "dsir_weights_topk" -> "DSIR: two bounded bucket-count aggregates broadcast into one explode-join-sum pass",
      "text_gopher_rules" -> "Gopher battery: one codegen projection per row, integer-only verdict, no shuffle before the sort",
      "geo_column_default" -> "column DEFAULT: old files' scan fills EXISTS_DEFAULT inside the reader — no coalesce projection, no rewrite, plain agg above the scan",
      "text_bm25_delete_topk" -> "post-removal BM25 probe: the same term-IN bucket-pruned scan, the removal's equality delete merged IN-READER (no extra join node), df from surviving lists only",
      "hybrid_rrf_top10" -> "hybrid RRF: both bounded legs rank in tiny single-partition windows; the fusion is one aggregation over <=2N rows — corpus-side work lives entirely inside the legs",
      "hybrid_rrf_pq_top10" -> "hybrid RRF over a PQ index: the dense leg's ADC sweep ran as its OWN codes-only job (scan read vec_id+pq_code — OpsSpec pins the read schema); this plan shows the id-pushdown float rerank under the same bounded fusion",
      "curate_source_cap" -> "domain cap: tiny over-cap verdict broadcast BOTH ways (anti-join pass-through never sorts; only over-cap sources rank, each over its own rows)")

    val sb = new StringBuilder
    sb.append("# PLANS — formatted physical plans of headline queries\n\n")
    sb.append("Generated by `graft.tools.PlanDump` at sf0.01. Regenerate: ")
    sb.append("`sbt \"runMain graft.tools.PlanDump\"`.\n")
    // the stats operators localCheckpoint their result (the production
    // contract), which collapses the dumped plan to a Scan ExistingRDD —
    // rebuild them here with checkpoint = false so the real shape shows
    val uncheckpointed: Map[String, () => org.apache.spark.sql.DataFrame] = Map(
      "spatial_dbscan" -> (() => {
        val pts = spark.sql("""
          WITH t AS (SELECT c_custkey, c_custkey - 1 AS c0 FROM customer)
          SELECT c_custkey AS id,
                 st_point(CAST(((c0 % 50) % 10) * 30 + (c0 % 3) AS DOUBLE),
                          CAST(((c0 % 50) DIV 10) * 30 + ((c0 DIV 3) % 3) AS DOUBLE)) AS geo
          FROM t""")
        graft.ops.SpatialCluster.dbscanPoints(pts, "id", "geo", 2.0, 5, checkpoint = false)
      }),
      "spatial_gi_star" -> (() => {
        val pts = spark.sql("""
          WITH t AS (SELECT c_custkey, c_custkey - 1 AS c0 FROM customer)
          SELECT c_custkey AS id,
                 st_point(CAST(((c0 % 50) % 10) * 30 + (c0 % 3) AS DOUBLE),
                          CAST(((c0 % 50) DIV 10) * 30 + ((c0 DIV 3) % 3) AS DOUBLE)) AS geo,
                 CASE WHEN (c0 % 50) % 5 = 0 THEN 15 + c0 % 5 ELSE c0 % 10 END AS v
          FROM t""")
        graft.ops.SpatialCluster.getisOrdGiStar(pts, "id", "geo", "v", 2.0, checkpoint = false)
      }))
    for ((name, note) <- headliners) {
      sb.append(s"\n## $name — $note\n\n```\n")
      SparkEntry.lastMaterializedPlan = None
      val df = uncheckpointed.get(name).map(_())
        .getOrElse(SparkEntry.queries(name)(spark, dir))
      // internally-materializing queries (SPJ/DPP/CBO: checkpoint before
      // restoring session confs) record the plan they proved; use it over
      // the returned frame's collapsed checkpoint scan
      val planFull = SparkEntry.lastMaterializedPlan
        .getOrElse(df.queryExecution.executedPlan.toString)
      val plan = planFull
        .linesIterator.takeWhile(l => !l.contains("(1) Scan")).take(40).mkString("\n")
      sb.append(plan).append("\n```\n")
    }
    Files.writeString(Paths.get("PLANS.md"), sb.toString)
    println("wrote PLANS.md")
    spark.stop()
  }
}
