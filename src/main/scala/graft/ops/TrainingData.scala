package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Training-data assembly operators (SURVEY.md §2.11+): the steps between a
 * cleaned corpus and a tokenized training run — sequence packing, data
 * mixing (per-source sampling to hit a target token distribution),
 * repetition-based quality metrics, and PII redaction.
 *
 * Everything here is builtin-expression arithmetic (whole-stage codegen, no
 * UDFs) and deterministic, so each op has an exact DuckDB oracle.
 */
object TrainingData {

  // ---------------------------------------------------------------- packing

  /**
   * GPT-style "concatenate then chunk" sequence packing: tokens from all
   * documents are laid out in one deterministic order (group key asc, then
   * id asc within group) and cut into fixed `seqLen`-token training
   * sequences; documents may straddle chunk boundaries. Returns per-doc
   * placement: `first_chunk` / `last_chunk` (0-based global chunk ids) and
   * `n_chunks` spanned.
   *
   * Scale shape: ONE window per group (groups run in parallel) plus a
   * window over the per-group totals — the latter touches |groups| rows
   * (sources/shards), not documents. No global sort of the corpus ever
   * runs: a document's global token offset = its group's offset (prefix
   * sum over group totals) + its within-group running sum. At 100 TB with
   * thousands of shards this is the standard pack-per-shard layout, and
   * the per-group window is a range-partitioned sort of only that group.
   */
  def chunkPack(docs: DataFrame, id: Column, tokens: Column, group: Column,
                seqLen: Int): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val t = docs.select(id.as("doc_id"), group.as("grp"), tokens.cast("long").as("tok"))
    val groupTotals = t.groupBy("grp").agg(sum("tok").as("gt"))
    val groupOffsets = groupTotals.withColumn(
      "goff", sum("gt").over(Window.orderBy("grp")) - col("gt")).drop("gt")
    val wIn = Window.partitionBy("grp").orderBy("doc_id")
    t.join(broadcast(groupOffsets), "grp")
      .withColumn("cumb", col("goff") + sum("tok").over(wIn) - col("tok"))
      // DIV: exact integer division (cumb is a token offset, never negative)
      .withColumn("first_chunk", expr(s"cumb DIV $seqLen"))
      .withColumn("last_chunk", expr(s"(cumb + greatest(tok, 1L) - 1L) DIV $seqLen"))
      .select(col("doc_id"), col("first_chunk"), col("last_chunk"),
        (col("last_chunk") - col("first_chunk") + 1L).as("n_chunks"))
  }

  /**
   * Greedy whole-document bin packing: each partition packs its documents
   * first-fit into bins of capacity `seqLen` tokens (documents longer than
   * the capacity get a bin of their own). Partition-local by design — the
   * standard scalable packing compromise (pack per shard; no cross-shard
   * coordination). Returns (doc_id, bin_id, bin_tokens) where bin ids are
   * globally unique (partitionId * 2^40 + local bin).
   *
   * Bin assignment depends on the input partitioning, so this op is
   * spec-verified by invariants (every doc packed exactly once; no
   * multi-doc bin exceeds capacity) rather than a row-level SQL oracle.
   */
  def binPack(docs: DataFrame, id: Column, tokens: Column, seqLen: Int): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val spark = docs.sparkSession
    import spark.implicits._
    val t = OpsUtil.ensureParallelism(
      docs.select(id.cast("long").as("doc_id"), tokens.cast("long").as("tok")))
    t.as[(Long, Long)].mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId().toLong
      // first-fit over open bins; close bins that can't fit anything useful
      val open = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)] // (binId, used)
      var nextBin = 0L
      it.map { case (docId, tok) =>
        val fit = open.indexWhere { case (_, used) => used + tok <= seqLen }
        val binId =
          if (tok >= seqLen) { val b = nextBin; nextBin += 1; b } // own bin, never reopened
          else if (fit >= 0) {
            val (b, used) = open(fit); open(fit) = (b, used + tok); b
          } else {
            val b = nextBin; nextBin += 1
            open += ((b, tok))
            if (open.length > 64) open.remove(0) // bound open-bin state per task
            b
          }
        (docId, pid * (1L << 40) + binId, tok)
      }
    }.toDF("doc_id", "bin_id", "tok")
      .groupBy("bin_id").agg(
        collect_list("doc_id").as("doc_ids"),
        sum("tok").as("bin_tokens"),
        count(lit(1)).as("n_docs"))
  }

  // ----------------------------------------------------------------- mixing

  /**
   * Deterministic uniform [0,1) per id: Knuth multiplicative hash on the
   * 32-bit ring. Pure integer arithmetic — bit-identical in any engine
   * (the DuckDB oracle replays the same formula), stable across runs and
   * partitionings, and cheap enough to inline in a filter.
   *
   * The multiply is split into 16-bit halves so no intermediate exceeds
   * 2^48: a naive `id * 2654435761` overflows Long for ids above ~3.5e9,
   * where Spark wraps silently but DuckDB raises a BIGINT overflow —
   * breaking the cross-engine contract exactly on large-corpus ids. The
   * split form computes the identical `(id * K) mod 2^32` value (2^32
   * divides 2^64, so the wrapped product was value-correct; the split
   * just never overflows in EITHER engine):
   * `(lo·K + ((hi·K) mod 2^16)·2^16 + 104729) mod 2^32`, where
   * `r = id mod 2^32 = hi·2^16 + lo`.
   */
  def hashUniform(id: Column): Column = {
    val K = 2654435761L
    val r = pmod(id.cast("long"), lit(4294967296L))
    val lo = pmod(r, lit(65536L))
    val hi = ((r - lo) / lit(65536L)).cast("long") // exact: multiple of 2^16, < 2^32
    pmod(lo * lit(K) + pmod(hi * lit(K), lit(65536L)) * lit(65536L) + lit(104729L),
      lit(4294967296L))
      .cast("double") / lit(4294967296.0)
  }

  /**
   * Per-source sampling rates that reshape the corpus toward a target
   * token distribution WITHOUT upsampling: rate_s = min(1, c·target_s /
   * actual_s) with c = min_s(actual_s / target_s) — i.e. keep the scarcest
   * target source intact and downsample the rest. Returns one row per
   * source: (source, n_docs, actual_tokens, actual_frac, target_frac,
   * sample_rate). Sources absent from `targets` get rate 0.
   *
   * Two tiny aggregations (|sources| rows); the expensive part of mixing
   * is the subsequent filter, which is shuffle-free.
   */
  def mixtureWeights(docs: DataFrame, source: Column, tokens: Column,
                     targets: Map[String, Double]): DataFrame = {
    require(targets.nonEmpty && targets.values.forall(_ > 0),
      "targets must be non-empty with positive weights")
    val norm = targets.values.sum
    val targetExpr = targets.toSeq.sortBy(_._1)
      .foldLeft(lit(0.0)) { case (acc, (s, w)) =>
        when(col("source") === s, lit(w / norm)).otherwise(acc)
      }
    val perSource = docs
      .select(source.as("source"), tokens.cast("long").as("tok"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("tok").as("actual_tokens"))
      .withColumn("actual_frac",
        col("actual_tokens").cast("double") /
          sum("actual_tokens").over(Window.partitionBy()))
      .withColumn("target_frac", targetExpr)
    // c = min over targeted sources of actual_frac / target_frac
    val scale = min(when(col("target_frac") > 0,
      col("actual_frac") / col("target_frac"))).over(Window.partitionBy())
    perSource.withColumn("sample_rate",
      when(col("target_frac") > 0,
        least(lit(1.0), scale * col("target_frac") / col("actual_frac")))
        .otherwise(lit(0.0)))
      .orderBy("source")
  }

  /**
   * Deterministic stratified sample: keep a row iff hashUniform(id) <
   * rate(source). Joined against [[mixtureWeights]] output (|sources| rows,
   * broadcast) this is a single shuffle-free filter pass over the corpus —
   * the 100 TB mixing step is exactly a full scan, nothing more.
   */
  def stratifiedSample(docs: DataFrame, id: Column, source: Column,
                       rates: DataFrame): DataFrame = {
    val srcName = docs.select(source).columns.head
    docs.join(broadcast(rates.select(col("source").as(srcName), col("sample_rate"))), srcName)
      .where(hashUniform(id) < col("sample_rate"))
      .drop("sample_rate")
  }

  /**
   * Per-source document cap (the C4/FineWeb "domain cap" curation verb:
   * no single domain may dominate the training mix): keep at most `cap`
   * documents per source, chosen as the cap smallest [[hashUniform]](id)
   * values — an unbiased deterministic without-replacement sample per
   * source, NOT "first cap by id" (which would bias toward a crawl's
   * oldest pages). Ties on the hash break by id; the selection is stable
   * across runs, partitionings, and engines.
   *
   * Scale shape: one tiny per-source count (map-side partial agg →
   * |sources| rows, broadcast back), then UNDER-cap sources pass through
   * untouched — a broadcast anti-join, their rows never shuffle or sort.
   * Only over-cap sources' rows rank, and each ranks only its own rows.
   * The inherent hot key of any per-group cap: one mega-source's rows
   * land on one partition for its rank — bounded by that source's own
   * volume, and the alternative (threshold refinement) only pays past
   * ~billions of rows per single source.
   */
  def capPerSource(docs: DataFrame, id: Column, source: Column,
                   cap: Long): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    // null-safe group key: a NULL source is its own group (C4's "unknown
    // domain"), but a bare null join key matches nothing — an over-cap
    // null group would silently bypass the cap through the anti-join
    // pass path. Split the key into (is-null flag, coalesced value).
    val keyed = docs
      .withColumn("__src", coalesce(source.cast("string"), lit("")))
      .withColumn("__srcn", source.isNull)
      .withColumn("__h", hashUniform(id)).withColumn("__cid", id)
    val k = Seq("__src", "__srcn")
    val over = keyed.groupBy(k.map(col): _*).agg(count(lit(1)).as("__n"))
      .where(col("__n") > cap).select(k.map(col): _*)
    val pass = keyed.join(broadcast(over), k, "left_anti")
    val capped = keyed.join(broadcast(over), k, "left_semi")
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__src"), col("__srcn"))
          .orderBy(col("__h"), col("__cid"))))
      .where(col("__rn") <= cap).drop("__rn")
    pass.unionByName(capped).drop("__src", "__srcn", "__h", "__cid")
  }

  // -------------------------------------------------- decontamination / LM

  /** Word n-grams of a text column as strings (empty array when the text
    * has fewer than `n` tokens). */
  def wordNgrams(text: Column, n: Int): Column = {
    require(n >= 1, s"n must be >= 1, got $n")
    val toks = TextAnalysis.tokens(text)
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /**
   * Train/test contamination check (the decontamination step every
   * benchmark-clean training pipeline runs): a (doc, probe) pair is
   * contaminated when the document shares at least one word `n`-gram with
   * the probe text. Returns (doc_id, probe_id, shared_ngrams).
   *
   * Scale shape: both sides explode to DISTINCT n-gram keys and meet in
   * a plain equi-join — corpus-side volume is ~tokens-per-doc rows, probe
   * side is tiny (benchmarks), so the join broadcasts the probe grams; no
   * similarity scan, no all-pairs. Same asymptotics as the published
   * 13-gram decontamination recipes. The join key is `xxhash64(gram)`,
   * not the gram string: an n-gram string is ~40 bytes where the hash is
   * 8, so the broadcast map, the exploded corpus rows, and (in the
   * huge-probe shuffle fallback) the shuffle itself shrink ~5×. The
   * output counts matches, so fingerprinting is invisible to results
   * barring a 2^-64 in-document hash collision — the standard trade every
   * fingerprint-based decontamination pipeline makes.
   */
  def contamination(docs: DataFrame, id: Column, text: Column,
                    probes: DataFrame, probeId: Column, probeText: Column,
                    n: Int = 5): DataFrame = {
    // fused one-pass tokenize->gram->hash->distinct (HOF chains are
    // interpreted per element; the expression produces bit-identical
    // hashes ~10x faster — see WordNgramHashes)
    def hashedGrams(t: Column): Column =
      graft.functions.GraftFunctions.wordNgramHashes(t, n)
    val d = docs.select(id.as("doc_id"), explode(hashedGrams(text)).as("__g"))
    val p = probes.select(probeId.as("probe_id"), explode(hashedGrams(probeText)).as("__g"))
    d.join(broadcast(p), "__g")
      .groupBy("doc_id", "probe_id")
      .agg(count(lit(1)).as("shared_ngrams"))
  }

  /**
   * Corpus-level unigram log-probability per document — the classic cheap
   * perplexity proxy for quality filtering (low average log-prob = rare
   * vocabulary = often noise). Two aggregations: token frequencies
   * (shuffle by token, map-side combined) and the per-doc average after a
   * re-join by token; the corpus total joins in as a broadcast scalar.
   */
  def unigramLogProb(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val toks = docs.select(id.as("doc_id"), explode(TextAnalysis.tokens(text)).as("tok"))
    val freqs = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val total = freqs.agg(sum("cnt").as("total"))
    toks.join(freqs, "tok")
      .crossJoin(broadcast(total))
      .groupBy("doc_id")
      .agg(avg(log(col("cnt").cast("double") / col("total"))).as("avg_logprob"),
        count(lit(1)).as("n_tokens"))
  }

  /**
   * DSIR importance weights (Xie et al. 2023, arXiv:2302.03169 — "Data
   * Selection for Language Models via Importance Resampling"): score each
   * raw document by how target-like its hashed unigram profile is. Both
   * corpora reduce to Laplace-smoothed distributions over `buckets`
   * hashed-token buckets ([[Dedup.portableTokenHash]] mod `buckets` —
   * the engine-portable hash, so the oracle replays it exactly); a doc's
   * weight is the sum over its TOKENS of log(p_target(b) / p_raw(b)),
   * the importance log-ratio DSIR resamples on (high = target-like).
   *
   * Scale shape: two groupBy-count passes build the bucket tables (at
   * most `buckets` rows each — broadcastable by construction), the
   * scoring pass is explode → broadcast-join → per-doc sum; nothing
   * shuffles more than one row per token, and the driver never holds
   * anything. Docs with zero tokens produce no row (no profile to score).
   */
  def dsirWeights(raw: DataFrame, id: Column, text: Column,
                  target: DataFrame, targetText: Column,
                  buckets: Int = 4096): DataFrame = {
    require(buckets > 0, s"dsirWeights needs a positive bucket count, got $buckets")
    val c = col _
    def bucketOf(tok: Column): Column =
      pmod(Dedup.portableTokenHash(tok), lit(buckets.toLong))
    def counts(df: DataFrame, t: Column, as: String): DataFrame =
      df.select(explode(TextAnalysis.tokens(t)).as("__tok"))
        .select(bucketOf(c("__tok")).as("__b"))
        .groupBy("__b").agg(count(lit(1)).as(as))
    val rawCnt = counts(raw, text, "__rc")
    val tgtCnt = counts(target, targetText, "__tc")
    val rawTot = rawCnt.agg(sum(c("__rc")).as("__rt"))
    val tgtTot = tgtCnt.agg(sum(c("__tc")).as("__tt"))
    // totals coalesce to 0 when a side has NO tokens at all (sum over an
    // empty frame is NULL): an empty target then scores against the pure
    // Laplace prior (uniform p_target = 1/buckets) instead of silently
    // returning all-NULL weights
    val ratio = rawCnt.join(tgtCnt, Seq("__b"), "full_outer")
      .crossJoin(broadcast(rawTot)).crossJoin(broadcast(tgtTot))
      .select(c("__b"),
        (log((coalesce(c("__tc"), lit(0L)) + 1.0) /
            (coalesce(c("__tt"), lit(0L)) + buckets.toDouble)) -
          log((coalesce(c("__rc"), lit(0L)) + 1.0) /
            (coalesce(c("__rt"), lit(0L)) + buckets.toDouble)))
          .as("__lr"))
    raw.select(id.as("doc_id"), explode(TextAnalysis.tokens(text)).as("__tok"))
      .select(c("doc_id"), bucketOf(c("__tok")).as("__b"))
      .join(broadcast(ratio), "__b")
      .groupBy("doc_id").agg(sum(c("__lr")).as("weight"))
  }

  // ------------------------------------------------------ repetition metrics

  private def wordBigrams(text: Column): Column = {
    val toks = TextAnalysis.tokens(text)
    zip_with(
      slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
      slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
      (a, b) => concat_ws(" ", a, b))
  }

  /**
   * Gopher-style repetition signals per document over word bigrams:
   * `dup_bigram_frac` (1 − distinct/total) and `top_bigram_frac` (share of
   * occurrences held by the most frequent bigram). Pure higher-order-
   * function arithmetic on the token array — one projection, no shuffle,
   * no UDF. Quadratic only in DISTINCT bigrams per document (bounded by
   * doc length, not corpus size).
   */
  def repetitionMetrics(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val bi = wordBigrams(text)
    docs.select(id.as("doc_id"), bi.as("__bi"))
      .select(
        col("doc_id"),
        size(col("__bi")).as("n_bigrams"),
        when(size(col("__bi")) > 0,
          lit(1.0) - size(array_distinct(col("__bi"))).cast("double") / size(col("__bi")))
          .otherwise(lit(0.0)).as("dup_bigram_frac"),
        when(size(col("__bi")) > 0,
          aggregate(array_distinct(col("__bi")), lit(0),
            (acc, d) => greatest(acc, size(filter(col("__bi"), x => x === d))))
            .cast("double") / size(col("__bi")))
          .otherwise(lit(0.0)).as("top_bigram_frac"))
  }

  // ----------------------------------------------------------- PII redaction

  /** Conservative, RE2-compatible patterns (work identically in Java regex
    * and DuckDB's RE2 — no backrefs, no lookaround). */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePattern = "\\+1-[0-9]{3}-[0-9]{4}"

  /**
   * PII scrub for a text column: counts and redacts email addresses and
   * phone numbers. Returns the input columns plus `n_emails`, `n_phones`,
   * `redacted` (text with matches replaced by tags). Single codegen'd
   * projection — regex evaluation is the entire cost, no shuffle.
   */
  def redactPii(docs: DataFrame, text: Column): DataFrame = {
    docs
      .withColumn("n_emails", regexp_count(text, lit(emailPattern)))
      .withColumn("n_phones", regexp_count(text, lit(phonePattern)))
      .withColumn("redacted",
        regexp_replace(regexp_replace(text, emailPattern, "<EMAIL>"),
          phonePattern, "<PHONE>"))
  }

  /** MAXIMAL digit runs (greedy `[0-9]+` can never match adjacent to
    * another digit, so no boundary groups are needed — a boundary-group
    * pattern consumes the separator and MISSES the second of two runs
    * one character apart). Card candidates are the runs of length
    * 13..19, filtered by expression. RE2-safe (no lookaround). */
  val digitRunPattern = "[0-9]+"

  /** Luhn checksum over a digit string — pure integer expression folds
    * (rightmost digit NOT doubled; every second digit from the right
    * doubles, minus 9 past 9; sum divisible by 10). */
  def luhnValid(num: Column): Column = {
    // Spark's split('abc','') appends a trailing "" (java split limit -1)
    val digits = filter(split(reverse(num), ""), d => length(d) === 1)
    val terms = transform(digits, (d, i) => {
      val v = d.cast("int")
      when(i % 2 === 1, v * 2 - when(v * 2 > 9, 9).otherwise(0)).otherwise(v)
    })
    aggregate(terms, lit(0), (a, x) => a + x) % 10 === 0
  }

  /**
   * Credit-card redaction with CHECKSUM VERIFICATION: candidate digit
   * runs that pass Luhn redact; runs that fail it stay (an order id or
   * timestamp is not a card number — regex-only redaction destroys
   * them). Extraction, verification, and the per-match replacement are
   * all expression folds (codegen, no UDF), and the arithmetic is exact
   * integers, so the oracle replays match set AND verdicts bit-exactly.
   * Returns `n_cards` (verified matches) and `redacted`.
   */
  def redactCards(docs: DataFrame, text: Column): DataFrame = {
    val valid = filter(
      regexp_extract_all(text, lit(digitRunPattern), lit(0)),
      c => length(c) >= 13 && length(c) <= 19 && luhnValid(c))
    // span-anchored replacement: each verified run replaces ONLY where it
    // appears as a maximal run (boundary groups re-inserted via $1/$2) —
    // a literal replace would also rewrite the card digits EMBEDDED in a
    // longer non-card run (an order id), destroying it. One fold pass per
    // extracted occurrence: when the same card appears twice one char
    // apart, the first pass's consumed separator hides the second
    // occurrence FROM THAT PASS, and the second occurrence's own fold
    // pass picks it up.
    val redacted = aggregate(valid, text, (acc, c) =>
      regexp_replace(acc,
        concat(lit("(^|[^0-9])"), c, lit("([^0-9]|$)")),
        lit("$1<CARD>$2")))
    docs
      .withColumn("n_cards", size(valid))
      .withColumn("redacted", redacted)
  }
}
