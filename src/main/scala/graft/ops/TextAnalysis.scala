package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text analysis for training-data pipelines (SURVEY.md §2.11): token
 * counting, quality scoring, language-ID heuristic, fingerprinting.
 * All pure builtin expressions — whole-stage codegen, no UDFs.
 */
object TextAnalysis {

  /** Whitespace tokens (trimmed). */
  def tokens(text: Column): Column = split(trim(text), " +")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword-piece estimate: word-chunks + digits + punctuation
    * runs, the usual pre-tokenizer shape. */
  def bpeishTokenCount(text: Column): Column =
    size(filter(split(text, """(?=[^\p{L}\p{N}])|(?<=[^\p{L}\p{N}])"""), t => length(t) > 0))

  val defaultStopwords: Seq[String] = Seq(
    "the", "a", "an", "of", "and", "to", "in", "is", "for", "on", "with",
    "that", "as", "at", "by", "it", "from", "or", "be", "are")

  /** Fraction of tokens that are stopwords. */
  def stopwordRatio(text: Column, stopwords: Seq[String] = defaultStopwords): Column = {
    val toks = tokens(text)
    size(filter(toks, t => t.isin(stopwords: _*))).cast("double") / size(toks)
  }

  /** Fraction of non-space chars that are punctuation. */
  def punctRatio(text: Column): Column = {
    val nospace = regexp_replace(text, " ", "")
    (length(nospace) - length(regexp_replace(nospace, """[\p{Punct}]""", ""))).cast("double") /
      greatest(length(nospace), lit(1))
  }

  /** Composite quality score in [0,1]: length band + stopword presence −
    * punctuation noise. Deterministic arithmetic (SQL-oracle-able). */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 500.0, lit(1.0))
    val stopScore = least(stopwordRatio(text) * 5.0, lit(1.0))
    val punct = punctRatio(text)
    (lenScore * 0.4 + stopScore * 0.4 + (lit(1.0) - punct) * 0.2)
  }

  /** Per-language stopword marker sets for the lang-ID heuristic. */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it", "for", "with"),
    "fr" -> Seq("le", "la", "les", "de", "et", "est", "un", "une", "dans", "pour"),
    "es" -> Seq("el", "la", "los", "de", "y", "es", "un", "una", "en", "para"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "eine", "in", "für", "mit"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "我", "他", "这", "中"))

  /**
   * Language-ID: argmax over marker-hit counts, 'und' when nothing hits.
   * A fold over a literal map — no UDF, executes in one projection.
   */
  def langId(text: Column): Column = {
    val toks = tokens(lower(text))
    val scored = langMarkers.toSeq.sortBy(_._1).map { case (lang, markers) =>
      struct(size(filter(toks, t => t.isin(markers: _*))).as("hits"), lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** 64-bit content fingerprint of normalized text (case/space folded). */
  def fingerprint(text: Column): Column =
    xxhash64(regexp_replace(lower(trim(text)), """\s+""", " "))

  /** Stopword set for the Gopher "has at least 2 of these" rule (Rae et
    * al. 2021, table A1's required-word list). */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /**
   * Gopher quality-rule battery (Rae et al. 2021, "Scaling Language
   * Models: ..." §A1.1 — the MassiveWeb filter set): per-document
   * INTEGER components plus the composite verdict. Everything is exact
   * integer arithmetic — mean-word-length and ratio thresholds are
   * applied as cross-multiplied integer comparisons (3 <= mean <= 10
   * becomes 3*wc <= sum_len <= 10*wc), so the oracle replays every
   * component AND the verdict bit-exactly with no float anywhere.
   *
   * Components: `n_words`, `sum_word_len`, `n_symbol_words` (tokens
   * carrying # or the ... / … ellipsis), `n_alpha_words` (tokens with at
   * least one letter), `n_stop_hits` (DISTINCT Gopher stopwords
   * present), `n_lines`, `n_bullet_lines`, `n_ellipsis_lines`.
   * Verdict (`passes`): 50 <= n_words <= 100000, mean word length in
   * [3, 10], symbol-word ratio <= 0.1, bullet lines <= 90%, ellipsis
   * lines <= 30%, >= 80% words alphabetic, >= 2 stopwords present.
   * One projection per row — whole-stage codegen, no shuffle, no UDF.
   */
  def gopherStats(text: Column): Column = {
    val toks = tokens(text)
    val nWords = size(toks).cast("long")
    val sumLen = coalesce(aggregate(toks, lit(0L), (a, t) => a + length(t)), lit(0L))
    val nSymbol = size(filter(toks, t =>
      t.contains("#") || t.contains("...") || t.contains("…"))).cast("long")
    val nAlpha = size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("long")
    val nStop = size(filter(
      typedlit(gopherStopwords), w => array_contains(toks, w))).cast("long")
    val lines = split(text, "\n")
    val nLines = size(lines).cast("long")
    val nBullet = size(filter(lines, l =>
      trim(l).startsWith("-") || trim(l).startsWith("*") ||
        trim(l).startsWith("•"))).cast("long")
    val nEllipsis = size(filter(lines, l =>
      trim(l).endsWith("...") || trim(l).endsWith("…"))).cast("long")
    val passes = (nWords >= 50L) && (nWords <= 100000L) &&
      (sumLen >= nWords * 3L) && (sumLen <= nWords * 10L) &&
      (nSymbol * 10L <= nWords) &&
      (nBullet * 10L <= nLines * 9L) &&
      (nEllipsis * 10L <= nLines * 3L) &&
      (nAlpha * 5L >= nWords * 4L) &&
      (nStop >= 2L)
    struct(nWords.as("n_words"), sumLen.as("sum_word_len"),
      nSymbol.as("n_symbol_words"), nAlpha.as("n_alpha_words"),
      nStop.as("n_stop_hits"), nLines.as("n_lines"),
      nBullet.as("n_bullet_lines"), nEllipsis.as("n_ellipsis_lines"),
      passes.as("passes"))
  }

  /**
   * Persisted BM25 index (the text analog of [[Similarity]]'s persisted
   * IVF index — tokenize ONCE, probe forever): stores under `indexRoot`
   *
   *   - `postings` (term, doc_id, tf, dl) — a geo table partitioned by
   *     bucket(`buckets`, term): clustered writes roll files per bucket
   *     run, and a probe's `term IN (...)` predicate prunes to just the
   *     query terms' buckets via exact IN-value-set file pruning;
   *   - corpus stats (n_docs, sum_dl) as the postings table's OWN
   *     manifest properties, committed atomically with every mutation
   *     (pre-upgrade indexes carry them as a one-row `stats` table
   *     instead — still readable, migrated on first mutation).
   *
   * [[bm25Search]] then answers any bag-of-words query from the PRUNED
   * postings alone — the pruned rows ARE the complete posting lists for
   * the query terms, so per-term df falls out of them and no global pass
   * ever reruns. Build once over 100 TB; each probe reads a handful of
   * bucket files plus a one-row stats table.
   */
  /** The stored posting rows for a batch of documents (one tokenize
    * pass) — shared by build and append so the two can never diverge. */
  private def postingsOf(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(id.as("doc_id"), tokens(text).as("__toks"))
      .withColumn("dl", size(col("__toks")).cast("long"))
      .select(col("doc_id"), col("dl"), explode(col("__toks")).as("term"))
      .groupBy("term", "doc_id", "dl").agg(count(lit(1)).as("tf"))
      .select("term", "doc_id", "tf", "dl")

  /** Reserved term of the per-doc SUMMARY rows ([[docRowsFor]]): one
    * `(DocRowTerm, doc_id, tf=0, dl)` row per indexed doc rides the
    * postings table itself, so the remove/upsert pricing scan prunes to
    * the sentinel term's bucket files (~n_docs rows) instead of a full
    * postings pass (~Σdl rows) — at 100 TB the difference between a
    * metadata-sized read and a full index pass per delete batch — while
    * staying inside the SAME atomic commit as the postings (the
    * two-table design's crash window never exists). The embedded SPACE
    * makes collision impossible by construction — [[tokens]] splits on
    * runs of spaces, so no real posting term can ever contain one;
    * [[bm25Search]] additionally refuses it as a query term, and
    * everything that aggregates per-doc stats goes through [[docStats]]'
    * DISTINCT (doc_id, dl), which a doc's same-valued summary row cannot
    * perturb. */
  private[graft] val DocRowTerm = " doc"
  /** Marker prop (create-time): the index has carried summary rows since
    * birth, so pricing may trust the pruned scan. Pre-upgrade indexes
    * lack it and keep the full-scan pricing path. */
  private val DocRowsProp = "graft.bm25.doc_rows"

  /** The batch's per-doc summary frame — one (doc_id, dl) row per
    * distinct doc. Computed ONCE per mutation from the persisted
    * postings (the same distinct [[docStats]] needs) and reused for the
    * stats numbers, the summary rows in the write, and (upsert) the
    * replaced-id set. */
  private def docRowsFor(posts: DataFrame): DataFrame =
    posts.select("doc_id", "dl").distinct()

  /** Summary rows shaped as postings-schema rows. */
  private def asDocRows(docRows: DataFrame): DataFrame =
    docRows.select(lit(DocRowTerm).as("term"), col("doc_id"),
      lit(0L).as("tf"), col("dl"))

  /** (n_docs, sum_dl) of a postings frame — exact longs, so stats merge
    * without drift and an empty corpus is (0, 0), never null. */
  private def docStats(postings: DataFrame): (Long, Long) =
    docStatsOf(postings.select("doc_id", "dl").distinct())

  /** [[docStats]] over an already-distinct (doc_id, dl) frame. */
  private def docStatsOf(docRows: DataFrame): (Long, Long) = {
    val r = docRows
      .agg(count(lit(1)).cast("long"), coalesce(sum(col("dl")), lit(0L))).head()
    (r.getLong(0), r.getLong(1))
  }

  /** Corpus-stats table properties on the POSTINGS table itself: every
    * index mutation commits its stats in the SAME manifest commit as the
    * postings change (GeoTable append/deleteByKey propsDelta), so the
    * two-table crash window of the original stats-row design no longer
    * exists for atomic verbs. `postings_version` records which snapshot's
    * CONTENT the numbers cover — out-of-band table mutations (a raw
    * GeoTable.append that bypassed this API) still heal read-only through
    * the changelog, exactly as before. */
  private val NDocsProp = "graft.bm25.n_docs"
  private val SumDlProp = "graft.bm25.sum_dl"
  private val VersionProp = "graft.bm25.postings_version"
  private def statsProps(n: Long, s: Long, v: Int): Map[String, String] =
    Map(NDocsProp -> n.toString, SumDlProp -> s.toString, VersionProp -> v.toString)

  def buildTextIndex(spark: org.apache.spark.sql.SparkSession, indexRoot: String,
                     df: DataFrame, id: Column, text: Column,
                     buckets: Int = 64): Unit = {
    import graft.tables.{GeoPartition, GeoTable}
    // ONE tokenize pass, ONE commit: the postings persist briefly
    // (O(batch) blocks, released below — the appendToTextIndex shape) so
    // the doc stats and the clustered write read the same computation,
    // and the stats ride the CREATE commit itself as table props
    // (VersionProp = 0 names the create). The old shape re-scanned the
    // written table for stats and landed them as a SECOND commit — an
    // extra table pass plus a crash window between the two commits that
    // no longer exists at all.
    val posts = postingsOf(df, id, text).persist()
    // docRows is NOT persisted: each consumer recomputes a narrow
    // (doc_id, dl) distinct from the persisted postings inside its own
    // job — cheaper than the extra materialization job a second cache
    // would cost, locally and at scale
    val docRows = docRowsFor(posts)
    try {
      val (n, s) = docStatsOf(docRows)
      // graft.write.layout=hash: the postings' layout column is ALREADY a
      // hash bucket (bucket(term)), so range-clustering it buys nothing —
      // but repartitionByRange's range SAMPLER is an extra pass over the
      // postings frame per write (build, every append/upsert batch, every
      // streamed micro-batch — a cached read here, a batch recompute
      // wherever the persist doesn't hold). The hash exchange lands the
      // same single-bucket files with no sampling pass (see
      // GeoPartition.LayoutModeProp); probes prune identically.
      // The per-doc summary rows (docRows — the SAME distinct the stats
      // read) ride the create too: DocRowsProp marks the index as
      // summary-priced from birth.
      GeoTable.create(spark, s"$indexRoot/postings",
        posts.unionByName(asDocRows(docRows)),
        geomCol = None,
        partitions = Seq(GeoPartition.PTransform("bucket", buckets, "term")),
        props = statsProps(n, s, 0) +
          (GeoPartition.LayoutModeProp -> "hash") + (DocRowsProp -> "1"),
        allowStatsProps = true)
    } finally posts.unpersist(blocking = false)
  }

  /**
   * Incrementally ADD documents (batch ids must be new — the standard
   * append-only ingest contract) to a [[buildTextIndex]] index — the
   * streaming-corpus shape, the text analog of
   * `Similarity.appendToIvfIndex`: one tokenize pass writes the new
   * postings bucket-clustered (the writer rolls files at bucket
   * boundaries, so probes keep pruning), and the advanced stats ride the
   * SAME manifest commit as the new postings files (propsDelta) — files
   * and stats can never disagree, there is no crash window. The batch's
   * postings persist briefly (O(batch) memory) so its doc stats and its
   * write see one computation. tf/df/N/sum_dl are exact integers, so
   * stats never drift; a probe after any number of appends ranks
   * identically to [[bm25TopK]] over the union corpus. Nothing re-reads
   * or re-tokenizes existing postings. Index mutations (append/remove/
   * upsert) assume ONE writer at a time — the serial-writer contract is
   * the supported one (the heal path in [[bm25Search]] still corrects any
   * interleaved outcome on the next probe).
   */
  def appendToTextIndex(spark: org.apache.spark.sql.SparkSession, indexRoot: String,
                        df: DataFrame, id: Column, text: Column): Unit = {
    val root = s"$indexRoot/postings"
    val posts = postingsOf(df, id, text).persist()
    val docRows = docRowsFor(posts)
    try {
      val (dn, ds) = docStatsOf(docRows)
      // ONE stats read covers both the base numbers and the expected
      // commit version: a foreign commit landing anywhere after it makes
      // the mutation's commit land past vBase+1, which reconcile detects
      // (the claimed version no longer names the commit it sits on)
      val (n0, s0, vBase) = statsAsOfCurrent(spark, indexRoot)
      graft.tables.GeoTable.append(spark, root,
        withDocRows(spark, root, posts, docRows), None,
        statsProps(n0 + dn, s0 + ds, vBase + 1))
      reconcileIfInterleaved(spark, root, vBase + 1)
    } finally posts.unpersist()
  }

  /** The batch payload for a mutation: postings plus the per-doc summary
    * rows — but ONLY on an index that has carried summary rows since
    * birth ([[DocRowsProp]]). A pre-upgrade index stays summary-free and
    * keeps full-scan pricing: mixing (summaries for new docs only) would
    * make the pruned scan silently under-price old docs. */
  private def withDocRows(spark: org.apache.spark.sql.SparkSession, root: String,
                          posts: DataFrame, docRows: DataFrame): DataFrame =
    if (graft.tables.GeoManifest.read(spark, root).props.contains(DocRowsProp))
      posts.unionByName(asDocRows(docRows))
    else posts

  /**
   * Exactly-once MICRO-BATCH ingest into a text index (the streaming-
   * corpus shape): the new postings, the advanced stats, AND the
   * `(sinkId, batchId)` watermark all ride ONE manifest commit, so a
   * crash-replayed micro-batch is detected by the watermark and skipped
   * — never double-indexed, and stats never double-count. Returns true
   * when the batch committed, false for a replayed or empty batch.
   */
  def appendToTextIndexBatch(spark: org.apache.spark.sql.SparkSession,
                             indexRoot: String, df: DataFrame,
                             id: Column, text: Column,
                             sinkId: String, batchId: Long): Boolean = {
    val root = s"$indexRoot/postings"
    if (graft.tables.GeoTable.lastStreamBatch(spark, root, sinkId).exists(_ >= batchId))
      return false
    val posts = postingsOf(df, id, text).persist()
    val docRows = docRowsFor(posts)
    try {
      val (dn, ds) = docStatsOf(docRows)
      if (dn == 0L) return false
      val (n0, s0, vBase) = statsAsOfCurrent(spark, indexRoot)
      graft.tables.GeoTable.append(spark, root,
        withDocRows(spark, root, posts, docRows), Some(sinkId -> batchId),
        statsProps(n0 + dn, s0 + ds, vBase + 1))
      reconcileIfInterleaved(spark, root, vBase + 1)
      true
    } finally posts.unpersist()
  }

  /** Streaming BM25 index ingest as a `foreachBatch` sink: each
    * micro-batch lands through [[appendToTextIndexBatch]] — postings,
    * stats, and the epoch watermark in one atomic commit per batch
    * (the exactly-once contract of the geo table sinks; see
    * `EventStreams.geoTableSink` for the sink-identity rules). Probes
    * stay read-only and see each batch whole or not at all. */
  def textIndexSink(stream: DataFrame, indexRoot: String, id: Column, text: Column,
                    checkpointDir: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendToTextIndexBatch(batch.sparkSession, indexRoot, batch, id, text,
          graft.streaming.EventStreams.sinkIdFor(batch.sparkSession, checkpointDir),
          batchId): Unit
      }

  /** Detect-and-repair for the one hole the serial-writer contract
    * leaves: a FOREIGN commit (raw table append, maintenance, a second
    * mutator) landing between a mutation's stats read and its commit
    * makes the just-committed stats base stale — and no covered-version
    * claim can make the changelog heal exact for them (the claim is
    * either too low, replaying the mutation's own rows twice, or too
    * high, asserting coverage of rows never counted). Detection is one
    * manifest read: in the serial case, version `claimed` IS the
    * mutation's own commit, so its props name `claimed` (a later fold
    * carrying the props forward stays a pass — the fold is content-
    * preserving and heals net-zero). On mismatch, recompute the truth
    * from the live postings (one two-column scan — rare-path cost) and
    * commit it; bounded retries cover a persistently racing writer. */
  private[graft] def reconcileIfInterleaved(spark: org.apache.spark.sql.SparkSession,
                                            root: String, claimed: Int): Unit = {
    // claimed > current means the mutation was a no-op (nothing
    // committed) — the stored props still cover exactly what they claim
    if (graft.tables.GeoManifest.read(spark, root).version < claimed) return
    def namesItself(v: Int): Boolean =
      graft.tables.GeoManifest.readVersion(spark, root, v).props
        .get(VersionProp).contains(v.toString)
    if (namesItself(claimed)) return
    var attempts = 0
    while (attempts < 3) {
      attempts += 1
      val (n, s) = docStats(graft.tables.GeoTable.read(spark, root))
      val v = graft.tables.GeoManifest.read(spark, root).version
      try {
        graft.tables.GeoTable.setStatsProperties(spark, root, statsProps(n, s, v + 1))
        if (namesItself(v + 1)) return
      } catch { case _: java.util.ConcurrentModificationException => () } // retry
    }
    throw new IllegalStateException(
      s"persistent concurrent mutation of the text index at $root — index " +
        "mutators are single-writer (see scaladoc); stop the other writer " +
        "and re-run (stats were recomputed but kept being overtaken)")
  }

  /**
   * REMOVE documents from a [[buildTextIndex]] index — the curation verb
   * appends can't cover: dedup/decontamination verdicts arrive AFTER an
   * index is built, and takedowns remove documents outright. O(keys),
   * never a rebuild: the doc ids land as one equality-delete sidecar on
   * the postings geo table (`deleteByKey` — a metadata commit, no
   * postings rewrite), every probe's pruned scan already merges sidecars
   * so the removed docs drop out of tf AND df immediately, and the
   * adjusted stats ride the SAME commit as the delete (propsDelta) — no
   * crash window. The removed docs' exact (count, Σdl) comes from one
   * pre-commit semi-join scan, the same work the old changelog replay
   * did after the fact. Ids absent from the index are a no-op. A
   * delete past the live-sidecar cap folds in a follow-up commit; the
   * fold is content-preserving, so the committed stats stay exact.
   * Sidecar growth is bounded by the table's own fold-at-threshold
   * maintenance.
   */
  def removeFromTextIndex(spark: org.apache.spark.sql.SparkSession,
                          indexRoot: String, ids: DataFrame): Unit = {
    val root = s"$indexRoot/postings"
    // pin: the stats scan and the filed delete keys must see one batch
    val keyDf = ids.toDF("doc_id").localCheckpoint()
    // base numbers, removed-docs pricing, and the expected commit version
    // all come from ONE snapshot (vBase): a foreign commit after the read
    // pushes the delete past vBase+1 and reconcile recomputes
    val (n0, s0, vBase) = statsAsOfCurrent(spark, indexRoot)
    val (rn, rs) = priceRemoved(spark, root, vBase, keyDf)
    graft.tables.GeoTable.deleteByKey(spark, root, Seq("doc_id"), keyDf,
      statsProps(n0 - rn, s0 - rs, vBase + 1), keysPinned = true)
    reconcileIfInterleaved(spark, root, vBase + 1)
  }

  /** The removed/replaced docs' exact (count, Σdl). On a summary-carrying
    * index ([[DocRowsProp]]): ONE aggregation over the keys left-joined
    * to the snapshot-pinned PRUNED summary scan — file pruning opens only
    * the reserved term's bucket files and the scan yields one row per
    * live doc (~n_docs rows), not one per posting (~Σdl rows). At 100 TB
    * that turns the per-delete-batch full-postings pass into a
    * metadata-sized read. Sidecar merges still apply through the scan (a
    * previously removed doc has no live summary row and is not
    * re-priced). Keys with NO summary row are either not live (a legal
    * no-op) or were landed by an out-of-band RAW table append that
    * bypassed the index verbs — only then does a fallback price exactly
    * those keys from the full snapshot, so the out-of-band heal contract
    * keeps its exactness. Pre-upgrade indexes keep the old full-scan
    * pricing unconditionally. */
  private def priceRemoved(spark: org.apache.spark.sql.SparkSession,
                           root: String, vBase: Int,
                           keys: DataFrame): (Long, Long) = {
    import graft.tables.GeoTable
    if (!graft.tables.GeoManifest.read(spark, root).props.contains(DocRowsProp))
      return docStats(GeoTable.readAt(spark, root, vBase)
        .join(keys, Seq("doc_id"), "left_semi"))
    val sent = GeoTable.scanAt(spark, root, vBase,
        col("term") === lit(DocRowTerm))
      .select("doc_id", "dl").distinct()
    val kd = keys.select("doc_id").distinct()
    val r = kd.join(sent, Seq("doc_id"), "left")
      .agg(count(col("dl")).cast("long"),
        coalesce(sum(col("dl")), lit(0L)),
        count(when(col("dl").isNull, lit(1))).cast("long")).head()
    val (rn, rs, uncovered) = (r.getLong(0), r.getLong(1), r.getLong(2))
    if (uncovered == 0L) (rn, rs)
    else {
      val uncov = kd.join(sent, Seq("doc_id"), "left_anti")
      val (mn, ms) = docStats(GeoTable.readAt(spark, root, vBase)
        .join(uncov, Seq("doc_id"), "left_semi"))
      (rn + mn, rs + ms)
    }
  }

  /** UPSERT documents (the CDC-replacement verb): ids already indexed
    * are replaced by their batch text, new ids are added — ONE atomic
    * commit via the table's keyed upsert: the equality-delete leg (every
    * batch doc's OLD postings) and the fresh postings share the commit,
    * the fresh rows out-sequence the delete so a replaced doc's new text
    * scores immediately, and the stats delta (old footprint out, new
    * footprint in) rides the same commit. A crash leaves the whole batch
    * applied or none of it — never a removed-but-not-yet-re-added
    * window. Nothing re-reads or re-tokenizes existing postings beyond
    * the one semi-join scan that prices the replaced docs' old dl.
    * A batch doc with ZERO tokens contributes no postings and therefore
    * no delete key — replacing a doc with empty text is a removal, spell
    * it [[removeFromTextIndex]]. The batch must carry AT MOST ONE text
    * per doc_id (the keyed-upsert contract without a sequence column —
    * duplicates would all land); net a CDC burst per key first. */
  def upsertTextIndex(spark: org.apache.spark.sql.SparkSession, indexRoot: String,
                      df: DataFrame, id: Column, text: Column): Unit = {
    val root = s"$indexRoot/postings"
    val posts = postingsOf(df, id, text).persist()
    val docRows = docRowsFor(posts)
    try {
      val (dn, ds) = docStatsOf(docRows)
      val ids = docRows.select("doc_id")
      val (n0, s0, vBase) = statsAsOfCurrent(spark, indexRoot)
      val (rn, rs) = priceRemoved(spark, root, vBase, ids)
      graft.tables.GeoTable.upsertByKey(spark, root, Seq("doc_id"),
        withDocRows(spark, root, posts, docRows),
        streamCommit = None,
        propsDelta = statsProps(n0 - rn + dn, s0 - rs + ds, vBase + 1))
      reconcileIfInterleaved(spark, root, vBase + 1)
    } finally posts.unpersist()
  }

  /** Stats valid for the postings table's CURRENT version: the stored
    * numbers (manifest props when present — every atomic verb maintains
    * them in the postings commit itself; the legacy `stats` TABLE row for
    * pre-upgrade indexes), advanced by the changelog delta when they lag
    * (pure read — out-of-band table mutations and legacy crash windows
    * heal here). Delta = NET inserted docs − NET deleted docs over the
    * window ([[graft.tables.GeoChangelog.netChanges]], the row-exact
    * diff — NOT the file-granular `changes`, whose rewrite commits
    * replay removed files RAW: a sidecar fold landing inside the window —
    * which `deleteByKey` itself triggers past the live-delete cap —
    * would double-count every folded-away doc). Content-preserving
    * rewrites net to zero; a doc added and removed inside one window
    * never surfaces on either side. */
  private def statsAsOfCurrent(spark: org.apache.spark.sql.SparkSession,
                               indexRoot: String): (Long, Long, Int) = {
    val root = s"$indexRoot/postings"
    val m = graft.tables.GeoManifest.read(spark, root)
    val cur = m.version
    val (n0, s0, v0) =
      (m.props.get(NDocsProp), m.props.get(SumDlProp), m.props.get(VersionProp)) match {
        case (Some(n), Some(s), Some(v)) => (n.toLong, s.toLong, v.toInt)
        case (None, None, None) =>
          // pre-upgrade index: the one-row stats TABLE (kept readable
          // forever; the first mutation through this API migrates the
          // numbers into postings props and the table goes inert)
          require(graft.tables.GeoManifest.currentVersion(
              spark, s"$indexRoot/stats").isDefined,
            s"$indexRoot is not a complete text index (no stats props and no " +
              "stats table) — the build crashed before its stats commit; rebuild")
          val row = graft.tables.GeoTable.read(spark, s"$indexRoot/stats").head()
          (row.getLong(0), row.getLong(1), row.getInt(2))
        case partial =>
          // every writer commits the three keys together — a partial
          // triple means a hand-edit slipped past the reserved-prefix
          // guard (or a pre-guard snapshot); trusting it would silently
          // pin wrong stats with no heal
          throw new IllegalStateException(
            s"$root carries an incomplete graft.bm25.* stats triple " +
              s"($partial) — never written by this library's index verbs; " +
              "rebuild the index (buildTextIndex) or restore a snapshot " +
              "whose props are intact")
      }
    // clamp to cur: callers thread the returned version as the expected
    // commit base, and a (pathological) future claim must not let a
    // mutation claim a version no commit will land on
    if (v0 >= cur) return (n0, s0, cur)
    // the changelog range is (base, target]: v0 is the covered snapshot
    val changes = graft.tables.GeoChangelog.netChanges(spark, root, v0, cur)
    val (dn, ds) = docStats(changes.where(col("_change_type") === "insert"))
    val (rn, rs) = docStats(changes.where(col("_change_type") === "delete"))
    (n0 + dn - rn, s0 + ds - rs, cur)
  }

  /** Probe a [[buildTextIndex]] index: identical scores to [[bm25TopK]]
    * (same +1-idf Okapi formulation), but the scan reads only the query
    * terms' bucket files. Corpus stats resolve through
    * [[statsAsOfCurrent]] (driver-side literals) — a stats row left
    * stale by a crashed append heals transparently, and probes never
    * write. */
  def bm25Search(spark: org.apache.spark.sql.SparkSession, indexRoot: String,
                 query: Seq[String], k: Int,
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(query.nonEmpty, "bm25Search needs at least one query term")
    // no tokenized term can contain a space ([[tokens]] splits on them),
    // so the reserved summary term is unreachable from real text — refuse
    // it as a query term rather than let it rank summary rows
    require(!query.contains(DocRowTerm),
      s"'$DocRowTerm' is the reserved per-doc summary term, not a query term")
    import graft.tables.GeoTable
    val c = col _
    val (n, sumDl, _) = statsAsOfCurrent(spark, indexRoot)
    val avgdl = sumDl.toDouble / math.max(n, 1L)
    // scan() file-prunes on the IN predicate AND applies it row-wise
    val posts = GeoTable.scan(spark, s"$indexRoot/postings",
      c("term").isin(query: _*))
    val dfreq = posts.groupBy("term").agg(count(lit(1)).as("df"))
    posts.join(broadcast(dfreq), "term")
      .withColumn("__w",
        log(lit(1.0) + (lit(n) - c("df") + 0.5) / (c("df") + 0.5)) *
          c("tf") * (k1 + 1.0) /
          (c("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * c("dl") / lit(avgdl))))
      .groupBy("doc_id").agg(sum(c("__w")).as("score"))
      .orderBy(round(c("score"), 6).desc, c("doc_id").asc)
      .limit(k)
  }

  /**
   * Okapi BM25 top-k: rank every document against a bag-of-words query
   * (Robertson et al., TREC-3; the k1/b formulation with the +1 idf that
   * never goes negative). Returns the k best (doc_id, score), ordered by
   * the QUANTIZED score (round to 1e-6) desc then doc_id — docs with
   * identical tf vectors and doc length tie exactly in real arithmetic
   * but land ulps apart under any engine's parallel-sum addend order, so
   * the selection and order rule must not rest on those ulps; the
   * returned score column itself stays raw.
   *
   * Distributed shape: tokenize → explode → FILTER TO QUERY TERMS before
   * any shuffle (the aggregations see only matching postings, never a
   * full inverted index); tf per (doc, term) and df per term are each one
   * aggregation over that filtered frame; corpus N and avgdl ride a
   * broadcast single-row aggregate (no driver action, no collect). The
   * final top-k is orderBy+limit — Spark's TakeOrderedAndProject, a
   * per-partition k-heap, no global sort.
   */
  def bm25TopK(df: DataFrame, id: Column, text: Column, query: Seq[String],
               k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(query.nonEmpty, "bm25TopK needs at least one query term")
    val c = col _
    val docs = df.select(id.as("doc_id"), size(tokens(text)).as("dl"),
      tokens(text).as("__toks"))
    val stats = docs.agg(count(lit(1)).as("n"), avg(c("dl")).as("avgdl"))
    val posted = docs.select(c("doc_id"), c("dl"), explode(c("__toks")).as("term"))
      .where(c("term").isin(query: _*))
    val tf = posted.groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"), max(c("dl")).as("dl"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("__w",
        log(lit(1.0) + (c("n") - c("df") + 0.5) / (c("df") + 0.5)) *
          c("tf") * (k1 + 1.0) /
          (c("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * c("dl") / c("avgdl"))))
      .groupBy("doc_id").agg(sum(c("__w")).as("score"))
      .orderBy(round(c("score"), 6).desc, c("doc_id").asc)
      .limit(k)
  }
}
