package graft.ops

import graft.functions.{MinHashSig, SimHash64}

import org.apache.spark.sql.graft.GraftShim
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Document deduplication (SURVEY.md §2.9) — exact, MinHash+LSH, SimHash,
 * n-gram Jaccard verify. Everything is bucket-join shaped: candidate
 * generation is linear in documents (explode to `bands` rows each, join on
 * band key), never O(n²); only the verify stage touches candidate pairs.
 *
 * At 100 TB: the only shuffles are on (band, key) — uniform by
 * construction (hash keys); the candidate pair set is tiny relative to the
 * corpus, and the shingle arrays needed for verify are re-joined by id so
 * signatures, not documents, cross the wire.
 */
object Dedup {

  private def col2(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    GraftShim.column(e)
  private def ex(c: Column) = GraftShim.expression(c)

  /** Exact duplicate groups: keep lowest id per identical text. */
  def exact(df: DataFrame, id: Column, text: Column): DataFrame =
    df.groupBy(md5(text).as("text_hash"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("copies"))

  /** Distinct char-`k`-gram murmur3 hashes of a text column — fused
    * one-pass expression (the HOF transform/substr/hash chain evaluates
    * interpreted per element; CharNgramHashes produces identical hashes). */
  def shinglesExpr(text: Column, k: Int): Column =
    col2(graft.functions.CharNgramHashes(ex(text), ex(lit(k))))

  /** MinHash signature column over char-k-gram shingles. */
  def minhashSig(text: Column, shingleK: Int, numHashes: Int): Column =
    col2(MinHashSig(ex(shinglesExpr(text, shingleK)), ex(lit(numHashes))))

  /**
   * MinHash+LSH candidate pairs: explode signature into `bands` band-keys,
   * self-join per (band, key). Returns (id1, id2) with id1 < id2, distinct.
   */
  def minhashCandidates(
      df: DataFrame, id: Column, text: Column,
      shingleK: Int = 5, numHashes: Int = 128, bands: Int = 16): DataFrame = {
    val sig = df.select(id.as("__id"), minhashSig(text, shingleK, numHashes).as("__sig"))
    candidatesFromSigs(sig, numHashes, bands)
  }

  /** Candidate pairs from a precomputed (__id, __sig) frame. */
  private def candidatesFromSigs(sig: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    val rows = numHashes / bands
    val banded = sig.select(
      org.apache.spark.sql.functions.col("__id"),
      posexplode(transform(
        sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(org.apache.spark.sql.functions.col("__sig"), b * rows + 1, lit(rows)), b))))
      .withColumnRenamed("pos", "__band").withColumnRenamed("col", "__key")
    val a = banded.select(org.apache.spark.sql.functions.col("__band"),
      org.apache.spark.sql.functions.col("__key"), org.apache.spark.sql.functions.col("__id").as("id1"))
    val b = banded.select(org.apache.spark.sql.functions.col("__band").as("__band2"),
      org.apache.spark.sql.functions.col("__key").as("__key2"), org.apache.spark.sql.functions.col("__id").as("id2"))
    a.join(b,
        a("__band") === b("__band2") && a("__key") === b("__key2") &&
          a("id1") < b("id2"))
      .select("id1", "id2").distinct()
  }

  /**
   * Full near-dup pipeline: LSH candidates -> exact shingle-Jaccard verify.
   * Returns (id1, id2, jaccard) for pairs >= threshold.
   */
  def minhashDedup(
      df: DataFrame, id: Column, text: Column,
      threshold: Double, shingleK: Int = 5, numHashes: Int = 128, bands: Int = 16,
      persistSigs: Boolean = true): DataFrame = {
    // Shingle + signature computed ONCE; persisted because the frame feeds
    // three joins (two candidate sides + verify). Signatures are ~1KB/doc —
    // caching them instead of recomputing the text scan is the standard
    // play at corpus scale too. The verified pair set (tiny vs the corpus)
    // is localCheckpoint'd EAGERLY so the signature cache is released
    // before returning: no CacheManager entry outlives the call, and the
    // checkpoint blocks free on GC via the ContextCleaner.
    val c = org.apache.spark.sql.functions.col _
    // widen first: shingle+sig is O(chars * numHashes) of hashing — a
    // single-partition input would run it on one core
    val base0 = OpsUtil.ensureParallelism(df)
      .select(id.as("__jid"), shinglesExpr(text, shingleK).as("__sh"))
      .withColumn("__sig", col2(MinHashSig(ex(c("__sh")), ex(lit(numHashes)))))
    if (!persistSigs) {
      val cands = candidatesFromSigs(base0.select(c("__jid").as("__id"), c("__sig")), numHashes, bands)
      return jaccardVerify(cands, base0.select(c("__jid"), c("__sh")), threshold)
    }
    val base = base0.persist()
    try {
      val cands = candidatesFromSigs(base.select(c("__jid").as("__id"), c("__sig")), numHashes, bands)
      jaccardVerify(cands, base.select(c("__jid"), c("__sh")), threshold).localCheckpoint()
    } finally base.unpersist(blocking = false)
  }

  /** Exact Jaccard on candidate pairs: |A∩B| / (|A|+|B|-|A∩B|). */
  def jaccardVerify(pairs: DataFrame, shingleById: DataFrame, threshold: Double): DataFrame = {
    val s1 = shingleById.select(org.apache.spark.sql.functions.col("__jid").as("id1"),
      org.apache.spark.sql.functions.col("__sh").as("__sh1"))
    val s2 = shingleById.select(org.apache.spark.sql.functions.col("__jid").as("id2"),
      org.apache.spark.sql.functions.col("__sh").as("__sh2"))
    pairs.join(s1, "id1").join(s2, "id2")
      .withColumn("__inter", size(array_intersect(
        org.apache.spark.sql.functions.col("__sh1"), org.apache.spark.sql.functions.col("__sh2"))).cast("double"))
      .withColumn("jaccard",
        org.apache.spark.sql.functions.col("__inter") /
          (size(org.apache.spark.sql.functions.col("__sh1")) + size(org.apache.spark.sql.functions.col("__sh2"))
            - org.apache.spark.sql.functions.col("__inter")))
      .where(org.apache.spark.sql.functions.col("jaccard") >= threshold)
      .select("id1", "id2", "jaccard")
  }

  /**
   * Connected components over near-dup pairs: iterative min-label
   * propagation (each round one join + one groupBy — the standard
   * distributed CC shape; rounds = graph diameter, tiny for dup clusters).
   * Returns (id, cluster) where cluster = smallest id in the component.
   */
  def clusterPairs(pairs: DataFrame, maxIters: Int = 20,
                   driverEdgeThreshold: Long = 1L << 20): DataFrame = {
    val c = org.apache.spark.sql.functions.col _
    // undirected edge list; isolated ids keep their own label through the
    // left join + coalesce below. localCheckpoint (eager) materializes AND
    // truncates lineage — without it the logical plan doubles per round and
    // at corpus scale round N replays rounds 1..N-1.
    val edges = pairs.select(c("id1").as("a"), c("id2").as("b"))
      .union(pairs.select(c("id2").as("a"), c("id1").as("b")))
      .distinct().localCheckpoint()
    // Small-graph fast path: near-dup graphs are usually tiny relative to
    // the corpus (the pairs already survived LSH + verify). Below the
    // threshold, driver-side union-find replaces ~diameter x 3 Spark jobs
    // with one collect — the same adaptive cut GraphFrames' CC makes. The
    // iterative path below remains the scale story for billions of edges.
    val nEdges = edges.count()
    if (nEdges <= driverEdgeThreshold) {
      val spark = pairs.sparkSession
      val collected = edges.collect().map(r =>
        (r.get(0).asInstanceOf[Number].longValue(), r.get(1).asInstanceOf[Number].longValue()))
      val parent = new java.util.HashMap[Long, Long]()
      def find(x: Long): Long = {
        parent.putIfAbsent(x, x)
        var r = x
        while (parent.get(r) != r) r = parent.get(r)
        var cur = x // path compression
        while (parent.get(cur) != r) { val nxt = parent.get(cur); parent.put(cur, r); cur = nxt }
        r
      }
      collected.foreach { case (a, b) =>
        val ra = find(a); val rb = find(b)
        // union by MIN root: the representative is always the smallest id
        if (ra < rb) parent.put(rb, ra) else if (rb < ra) parent.put(ra, rb)
      }
      import scala.jdk.CollectionConverters._
      val rows: java.util.List[org.apache.spark.sql.Row] =
        parent.keySet().asScala.toSeq.sorted
          .map(i => org.apache.spark.sql.Row(i, find(i))).asJava
      return spark.createDataFrame(rows,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("cluster", org.apache.spark.sql.types.LongType, nullable = false))))
    }
    var labels = edges.select(c("a").as("id")).distinct()
      .withColumn("cluster", c("id"))
      .localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIters) {
      // each node adopts the min cluster among itself and its neighbors.
      // The round's ONLY full job is the localCheckpoint materialization;
      // the changed-count then scans the materialized blocks (no recompute,
      // unlike the old count() which re-ran the join every round).
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("id", "b").withColumnRenamed("cluster", "nbr_cluster"), "b")
        .groupBy(c("a").as("id")).agg(min("nbr_cluster").as("nbr_min"))
      val updated = labels.join(viaNeighbors, Seq("id"), "left")
        .withColumn("new_cluster", least(c("cluster"), coalesce(c("nbr_min"), c("cluster"))))
        .select(c("id"), c("new_cluster").as("cluster"),
          (c("new_cluster") =!= c("cluster")).as("__changed"))
        .localCheckpoint()
      changed = updated.where(c("__changed")).count()
      // old rounds' checkpoint blocks are freed by the ContextCleaner once
      // the previous `labels` reference drops out of scope here
      labels = updated.drop("__changed")
      iter += 1
    }
    if (changed > 0)
      throw new IllegalStateException(
        s"clusterPairs did not converge in $maxIters rounds (component diameter too large); raise maxIters")
    labels
  }

  /**
   * Full near-dup dedup: minhash pairs -> clusters -> keep the lowest id
   * per cluster. Returns the ids to DROP (joins back as left_anti).
   */
  def nearDupDrops(df: DataFrame, id: Column, text: Column,
                   threshold: Double, shingleK: Int = 5): DataFrame = {
    val c = org.apache.spark.sql.functions.col _
    // minhashDedup owns the signature cache lifecycle (persist -> eager
    // checkpointed pairs -> release); no duplicated pipeline body here
    val pairs = minhashDedup(df, id, text, threshold, shingleK)
    clusterPairs(pairs)
      .where(c("id") =!= c("cluster")) // cluster representative (min id) survives
      .select(c("id"))
  }

  /** 64-bit SimHash over whitespace tokens (xxhash64 per token, builtin). */
  def simhash(text: Column): Column =
    col2(SimHash64(ex(transform(split(trim(text), " +"), t => xxhash64(t)))))

  /**
   * SimHash near-dup candidates: the 64-bit signature splits into
   * `maxHamming + 1` bands, so by pigeonhole any two docs within hamming
   * distance `maxHamming` share at least one identical band.
   * Verified with exact hamming via bit_count(xor).
   */
  def simhashCandidates(df: DataFrame, id: Column, text: Column, maxHamming: Int = 3): DataFrame = {
    val sig = OpsUtil.ensureParallelism(df).select(id.as("__id"), simhash(text).as("__sig"))
    simhashPairsOn(sig, sigBits = 64, maxHamming = maxHamming)
  }

  /**
   * Engine-portable token hash: 20-bit polynomial over codepoints (base-31
   * fold, mod 2^20) mixed onto the 32-bit ring by the Knuth multiplier.
   * Pure integer builtins — the DuckDB oracle replays the identical
   * arithmetic, which is what makes [[simhash16]] pairs hash-checkable
   * (xxhash64-based [[simhash]] is engine-specific by construction).
   *
   * ASCII-only contract (shared with PortableSimHash16 and the DuckDB
   * oracle): outside ASCII the three implementations iterate text
   * differently (split("") elements here, Unicode codepoints in the
   * codegen'd twin, grapheme clusters in DuckDB) and may diverge.
   */
  def portableTokenHash(tok: Column): Column =
    pmod(aggregate(split(tok, ""), lit(0L),
      (acc, ch) => pmod(acc * 31 + ascii(ch), lit(1048576L)))
      * 2654435761L, lit(4294967296L))

  /** 16-bit SimHash over whitespace tokens using [[portableTokenHash]]
    * arithmetic: bit j is the sign (>= 0) of the ±1 vote sum of the
    * tokens' j-th hash bits. Single-pass codegen'd expression
    * (graft.functions.PortableSimHash16); [[portableTokenHash]] remains
    * the per-token Column form of the same hash. */
  def simhash16(text: Column): Column =
    col2(graft.functions.PortableSimHash16(ex(text)))

  /** [[simhashCandidates]] on the portable 16-bit signature — identical
    * banded shape, exact DuckDB oracle (see SparkEntry dedup_simhash_pairs). */
  def simhashCandidatesPortable(df: DataFrame, id: Column, text: Column,
                                maxHamming: Int = 3): DataFrame = {
    val sig = OpsUtil.ensureParallelism(df).select(id.as("__id"), simhash16(text).as("__sig"))
    simhashPairsOn(sig, sigBits = 16, maxHamming = maxHamming)
  }

  /** Pigeonhole band join over a (__id, __sig) frame: `maxHamming + 1`
    * bands of the `sigBits`-bit signature, exact hamming verify on the
    * candidates. */
  private def simhashPairsOn(sig: DataFrame, sigBits: Int, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < sigBits,
      s"maxHamming must be in [0,$sigBits), got $maxHamming")
    val nBands = maxHamming + 1
    val width = sigBits / nBands
    require(width >= 1, s"maxHamming $maxHamming too large for $sigBits-bit signature")
    val bandKeys = array((0 until nBands).map { i =>
      // last band takes the remaining high bits
      val w = if (i == nBands - 1) sigBits - i * width else width
      val mask = if (w >= 64) -1L else (1L << w) - 1
      shiftrightunsigned(org.apache.spark.sql.functions.col("__sig"), i * width)
        .bitwiseAND(lit(mask))
    }: _*)
    val banded = sig.select(org.apache.spark.sql.functions.col("__id"),
      org.apache.spark.sql.functions.col("__sig"),
      posexplode(bandKeys))
      .withColumnRenamed("pos", "__band").withColumnRenamed("col", "__key")
    val a = banded.select(org.apache.spark.sql.functions.col("__band"),
      org.apache.spark.sql.functions.col("__key"),
      org.apache.spark.sql.functions.col("__id").as("id1"),
      org.apache.spark.sql.functions.col("__sig").as("__sig1"))
    val b = banded.select(org.apache.spark.sql.functions.col("__band").as("__band2"),
      org.apache.spark.sql.functions.col("__key").as("__key2"),
      org.apache.spark.sql.functions.col("__id").as("id2"),
      org.apache.spark.sql.functions.col("__sig").as("__sig2"))
    a.join(b, a("__band") === b("__band2") && a("__key") === b("__key2") && a("id1") < b("id2"))
      .withColumn("hamming", expr("bit_count(__sig1 ^ __sig2)"))
      .where(org.apache.spark.sql.functions.col("hamming") <= maxHamming)
      .select("id1", "id2", "hamming").distinct()
  }

  /**
   * Line-level boilerplate dedup (C4/CCNet-style): a trimmed line that
   * occurs in at least `minDocs` DISTINCT documents and is at least
   * `minChars` long is boilerplate (navigation, footers, cookie banners)
   * and is removed from EVERY document; short recurring lines
   * (headings, list markers) are spared by the length floor.
   *
   * 100 TB shape: one count-distinct aggregation keyed by the line (the
   * boilerplate set is tiny — lines repeated across >= minDocs docs),
   * then a line-exploded left-anti equi-join against that set, rebuilt in
   * original line order. No document ever compares against another
   * document directly.
   *
   * @return (doc_id, clean_text, n_kept, n_removed)
   */
  def dropBoilerplateLines(df: DataFrame, id: Column, text: Column,
                           minDocs: Int, minChars: Int = 10): DataFrame = {
    val c = org.apache.spark.sql.functions.col _
    val lines = df.select(id.as("doc_id"), posexplode(split(text, "\n")).as(Seq("pos", "line")))
      .withColumn("tline", trim(c("line")))
    val boiler = lines
      .where(length(c("tline")) >= minChars)
      .groupBy("tline").agg(countDistinct("doc_id").as("ndocs"))
      .where(c("ndocs") >= minDocs)
      .select(c("tline").as("bline"))
    val kept = lines.join(broadcast(boiler), c("tline") === c("bline"), "left_anti")
    val counts = lines.groupBy("doc_id").agg(count(lit(1)).as("n_lines"))
    val keptAgg = kept.groupBy("doc_id")
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(c("pos"), c("line")))),
          x => x.getField("line")), "\n").as("clean_text"),
        count(lit(1)).as("n_kept"))
    // left from counts: a document whose every line was boilerplate
    // survives as an empty text, it does not vanish
    counts.join(keptAgg, Seq("doc_id"), "left")
      .select(c("doc_id"), coalesce(c("clean_text"), lit("")).as("clean_text"),
        coalesce(c("n_kept"), lit(0L)).as("n_kept"),
        (c("n_lines") - coalesce(c("n_kept"), lit(0L))).as("n_removed"))
  }

  /**
   * ExactSubstr-style duplicated-SPAN detection (the within-document
   * granularity of Lee et al., "Deduplicating Training Data Makes
   * Language Models Better" — doc-level near-dup misses a boilerplate
   * paragraph pasted into thousands of otherwise-unique pages): sample a
   * `window`-char window every `stride` chars; a window whose exact text
   * occurs in >= `minDocs` DISTINCT documents flags a duplicated span.
   *
   * Scale shape: one explode (rows x windows-per-doc), one equi-shuffle
   * on the window text, one count-distinct, one semi-join back — the
   * same banded equi-join family as MinHash LSH, no all-pairs pass. The
   * grouping key is the exact window text (not a hash), so a collision
   * can never flag a false span; stride trades recall for volume exactly
   * like the paper's suffix-array sampling.
   *
   * @return (doc_id, pos, win) — every sampled window inside a duplicated span
   */
  def exactSubstrWindows(df: DataFrame, id: Column, text: Column,
                         window: Int = 50, stride: Int = 10,
                         minDocs: Int = 2): DataFrame = {
    require(window > 0 && stride > 0 && minDocs >= 2)
    val c = org.apache.spark.sql.functions.col _
    val w = df
      .select(id.cast("long").as("doc_id"), text.as("__t"))
      .where(length(c("__t")) >= window)
      .select(c("doc_id"), explode(expr(
        s"transform(sequence(0, length(__t) - $window, $stride), " +
          s"p -> struct(p AS pos, substring(__t, p + 1, $window) AS win))")).as("w"))
      .select(c("doc_id"), c("w.pos").as("pos"), c("w.win").as("win"))
    val flagged = w.groupBy("win")
      .agg(countDistinct("doc_id").as("__nd"))
      .where(c("__nd") >= minDocs)
      .select("win")
    w.join(flagged, Seq("win"), "left_semi")
      .select(c("doc_id"), c("pos"), c("win"))
  }
}
