package graft

import graft.ops.{TextAnalysis, TrainingData}

import org.apache.spark.sql.functions._

class TrainingDataSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "srcA", "one two three four five six seven eight"),          // 8 tokens
    (1L, "srcA", "alpha beta gamma delta"),                           // 4
    (2L, "srcB", "x y z"),                                            // 3
    (3L, "srcB", "p q r s t u v w x y z a b c d e f g h i"),          // 20
    (4L, "srcC", "lone")                                              // 1
  ).toDF("doc_id", "source", "text").cache()

  private def tok = TextAnalysis.tokenCount(col("text"))

  test("chunkPack lays out tokens source-major and cuts exact boundaries") {
    // layout (seqLen 10): srcA: doc0 [0,8) doc1 [8,12) | srcB: doc2 [12,15)
    // doc3 [15,35) | srcC: doc4 [35,36)
    val out = TrainingData.chunkPack(docs, col("doc_id"), tok, col("source"), seqLen = 10)
      .orderBy("doc_id")
      .select("doc_id", "first_chunk", "last_chunk", "n_chunks")
      .as[(Long, Long, Long, Long)].collect()
    assert(out sameElements Array(
      (0L, 0L, 0L, 1L),   // [0,8)   within chunk 0
      (1L, 0L, 1L, 2L),   // [8,12)  straddles 0->1
      (2L, 1L, 1L, 1L),   // [12,15)
      (3L, 1L, 3L, 3L),   // [15,35) spans 1..3
      (4L, 3L, 3L, 1L)),  // [35,36)
      s"got ${out.mkString(",")}")
  }

  test("chunkPack total chunk count is ceil(total_tokens / seqLen)") {
    val total = docs.select(sum(tok)).as[Long].head()
    val maxChunk = TrainingData.chunkPack(docs, col("doc_id"), tok, col("source"), 10)
      .select(max("last_chunk")).as[Long].head()
    assert(maxChunk == (total + 9) / 10 - 1)
  }

  test("binPack packs every doc exactly once and respects capacity for multi-doc bins") {
    val bins = TrainingData.binPack(docs, col("doc_id"), tok, seqLen = 10).cache()
    val packed = bins.select(explode(col("doc_ids")).as("doc_id"))
    assert(packed.count() == 5 && packed.distinct().count() == 5)
    // a bin holding >1 doc must fit the capacity; oversize docs sit alone
    assert(bins.where(col("n_docs") > 1 && col("bin_tokens") > 10).count() == 0)
    val oversize = bins.where(col("bin_tokens") > 10)
    assert(oversize.select(size(col("doc_ids"))).as[Int].collect().forall(_ == 1))
    bins.unpersist()
  }

  test("mixtureWeights keeps the scarcest targeted source whole and zeroes untargeted") {
    val w = TrainingData.mixtureWeights(docs, col("source"), tok,
      Map("srcA" -> 0.5, "srcB" -> 0.5)).cache()
    val bySource = w.select("source", "sample_rate").as[(String, Double)].collect().toMap
    assert(bySource("srcC") == 0.0)
    // srcA has 12 tokens, srcB 23; targets equal -> srcA is scarcest, kept whole
    assert(bySource("srcA") == 1.0)
    assert(bySource("srcB") > 0 && bySource("srcB") < 1.0)
    // post-sample expected tokens hit the target ratio: 12 : 23*rateB == 1 : 1
    assert(math.abs(23.0 * bySource("srcB") - 12.0) < 1e-9)
    w.unpersist()
  }

  test("stratifiedSample is deterministic and a subset of input") {
    val rates = TrainingData.mixtureWeights(docs, col("source"), tok,
      Map("srcA" -> 0.5, "srcB" -> 0.5))
    val s1 = TrainingData.stratifiedSample(docs, col("doc_id"), col("source"), rates)
      .select("doc_id").as[Long].collect().sorted
    val s2 = TrainingData.stratifiedSample(docs, col("doc_id"), col("source"), rates)
      .select("doc_id").as[Long].collect().sorted
    assert(s1 sameElements s2)
    assert(s1.toSet.subsetOf(Set(0L, 1L, 2L, 3L, 4L)))
    assert(!s1.contains(4L), "untargeted source must be dropped")
  }

  test("contamination finds shared word n-grams against a probe set") {
    val corpus = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "a completely unrelated sentence about query engines"),
      (2L, "we say the quick brown fox jumps again here")
    ).toDF("doc_id", "text")
    val probes = Seq((100L, "the quick brown fox jumps")).toDF("pid", "ptext")
    val hits = TrainingData.contamination(corpus, col("doc_id"), col("text"),
        probes, col("pid"), col("ptext"), n = 5)
      .select("doc_id", "probe_id", "shared_ngrams")
      .as[(Long, Long, Long)].collect().toSet
    // docs 0 and 2 contain the probe's single 5-gram; doc 1 does not
    assert(hits == Set((0L, 100L, 1L), (2L, 100L, 1L)), s"got $hits")
  }

  test("wordNgrams handles short texts") {
    val g = Seq((0L, "a b c"), (1L, "a b")).toDF("doc_id", "text")
      .select(col("doc_id"), TrainingData.wordNgrams(col("text"), 3).as("g"))
      .as[(Long, Seq[String])].collect().toMap
    assert(g(0L) == Seq("a b c") && g(1L) == Seq.empty)
  }

  test("unigramLogProb: rare vocabulary scores below common vocabulary") {
    val corpus = Seq(
      (0L, "common common common common"),
      (1L, "common common rare1 rare2")
    ).toDF("doc_id", "text")
    val out = TrainingData.unigramLogProb(corpus, col("doc_id"), col("text"))
      .select("doc_id", "avg_logprob", "n_tokens")
      .as[(Long, Double, Long)].collect().map { case (i, p, n) => i -> (p, n) }.toMap
    // 8 tokens total: common x6, rare1 x1, rare2 x1
    val expected0 = math.log(6.0 / 8.0)
    val expected1 = (2 * math.log(6.0 / 8.0) + 2 * math.log(1.0 / 8.0)) / 4.0
    assert(math.abs(out(0L)._1 - expected0) < 1e-12)
    assert(math.abs(out(1L)._1 - expected1) < 1e-12)
    assert(out(0L)._2 == 4L && out(1L)._2 == 4L)
    assert(out(1L)._1 < out(0L)._1, "rare vocab must score lower")
  }

  test("repetitionMetrics on a crafted repetitive doc") {
    val rep = Seq((0L, "a b a b a b")).toDF("doc_id", "text")
    val m = TrainingData.repetitionMetrics(rep, col("doc_id"), col("text"))
      .select("n_bigrams", "dup_bigram_frac", "top_bigram_frac")
      .as[(Int, Double, Double)].head()
    // bigrams: "a b","b a","a b","b a","a b" -> 5 total, 2 distinct, top 3/5
    assert(m._1 == 5)
    assert(math.abs(m._2 - 0.6) < 1e-12)
    assert(math.abs(m._3 - 0.6) < 1e-12)
  }

  test("repetitionMetrics degenerate docs: single token has no bigrams") {
    val m = TrainingData.repetitionMetrics(Seq((0L, "word")).toDF("doc_id", "text"),
      col("doc_id"), col("text"))
      .select("n_bigrams", "dup_bigram_frac", "top_bigram_frac")
      .as[(Int, Double, Double)].head()
    assert(m == ((0, 0.0, 0.0)))
  }

  test("hashUniform matches (id*K+104729) mod 2^32 exactly, even above the Long-overflow ids") {
    // the split 16-bit multiply must equal BigInt reference arithmetic for
    // ids where the naive id*2654435761 overflows Long (~3.5e9 and up)
    val ids = Seq(0L, 1L, 42L, 3500000000L, 4294967295L, 1L << 40, Long.MaxValue)
    val got = ids.toDF("id")
      .select(TrainingData.hashUniform(col("id")).as("u"))
      .as[Double].collect()
    ids.zip(got).foreach { case (id, u) =>
      val ref = ((BigInt(id) * BigInt(2654435761L) + 104729) mod BigInt(4294967296L)).toDouble / 4294967296.0
      assert(u == ref, s"id=$id")
      assert(u >= 0.0 && u < 1.0)
    }
  }

  test("redactCards: Luhn-valid numbers redact, invalid runs survive") {
    import graft.ops.TrainingData
    val docs = Seq(
      (0L, "pay with 4111111111111111 today"),          // valid Visa test number
      (1L, "order 4111111111111112 shipped"),           // fails Luhn -> survives
      (2L, "amex 378282246310005 and visa 4012888888881881"), // both valid
      (3L, "short 123456789012 run"),                   // 12 digits: not a candidate
      (4L, "no digits at all"),
      (5L, "two 4111111111111111,4012888888881881 adjacent"), // one separator char
      (6L, "id 99994111111111111111 has a card embedded"), // 20-digit run: NOT a card
      (7L, "twice 4111111111111111,4111111111111111 same")  // same card, one sep
    ).toDF("doc_id", "text")
    val out = TrainingData.redactCards(docs, col("text"))
      .select("doc_id", "n_cards", "redacted")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getString(2))).toMap
    assert(out(0L) == (1, "pay with <CARD> today"))
    assert(out(1L) == (0, "order 4111111111111112 shipped"))
    assert(out(2L) == (2, "amex <CARD> and visa <CARD>"))
    assert(out(3L) == (0, "short 123456789012 run"))
    assert(out(4L) == (0, "no digits at all"))
    // maximal-run extraction: a single-char separator hides nothing
    assert(out(5L) == (2, "two <CARD>,<CARD> adjacent"), out(5L))
    // span-anchored replace: the embedded card digits do NOT rewrite the
    // longer (non-card) run
    assert(out(6L) == (0, "id 99994111111111111111 has a card embedded"), out(6L))
    // duplicate occurrences: one fold pass per extracted occurrence
    assert(out(7L) == (2, "twice <CARD>,<CARD> same"), out(7L))
  }

  test("redactPii counts and strips emails and phones") {
    val df = Seq(
      (0L, "reach me at jane.doe+spam@mail.example.org or +1-555-0199 thanks"),
      (1L, "no pii here at all")
    ).toDF("doc_id", "text")
    val out = TrainingData.redactPii(df, col("text")).cache()
    val r0 = out.where(col("doc_id") === 0)
      .select("n_emails", "n_phones", "redacted").as[(Int, Int, String)].head()
    assert(r0._1 == 1 && r0._2 == 1)
    assert(r0._3 == "reach me at <EMAIL> or <PHONE> thanks")
    val r1 = out.where(col("doc_id") === 1)
      .select("n_emails", "n_phones", "redacted").as[(Int, Int, String)].head()
    assert(r1 == ((0, 0, "no pii here at all")))
    out.unpersist()
  }

  test("capPerSource keeps the cap smallest hashes per over-cap source; under-cap passes whole") {
    val corpus = (0L until 40L).map { i =>
      (i, if (i < 30) "big" else "small", s"text $i")
    }.toDF("doc_id", "source", "text")
    val out = TrainingData.capPerSource(corpus, col("doc_id"), col("source"), cap = 10)
      .select("doc_id", "source").as[(Long, String)].collect().toSeq
    // under-cap source: all 10 rows, untouched
    assert(out.count(_._2 == "small") == 10, "under-cap source must pass whole")
    assert(out.count(_._2 == "big") == 10, "over-cap source must cut to the cap")
    // the kept big-source ids are exactly the 10 smallest hashUniform values
    val expect = corpus.where(col("source") === "big")
      .select(col("doc_id"), TrainingData.hashUniform(col("doc_id")).as("u"))
      .orderBy(col("u"), col("doc_id")).limit(10)
      .select("doc_id").as[Long].collect().toSet
    assert(out.filter(_._2 == "big").map(_._1).toSet == expect,
      "selection must be rank-by-hash, not first-by-id")
    // unbiased shape: the hash selection must differ from first-10-by-id
    assert(expect != (0L until 10L).toSet,
      "test shape must distinguish hash order from id order")
    // schema passthrough: original columns survive, helpers dropped
    val cols = TrainingData.capPerSource(corpus, col("doc_id"), col("source"), 10).columns.toSeq
    assert(cols == Seq("doc_id", "source", "text"))
    // a NULL source is its own group and respects the cap (a bare null
    // join key would bypass it through the anti-join pass path)
    val withNulls = (0L until 40L).map { i =>
      (i, if (i < 25) null else if (i < 30) "" else "small", s"text $i")
    }.toDF("doc_id", "source", "text")
    val outN = TrainingData.capPerSource(withNulls, col("doc_id"), col("source"), 10)
      .select("doc_id", "source").collect()
    assert(outN.count(_.isNullAt(1)) == 10, "over-cap NULL group must cut to the cap")
    assert(outN.count(r => !r.isNullAt(1) && r.getString(1) == "") == 5,
      "empty-string source is NOT the null group and passes whole under cap")
    assert(outN.count(r => !r.isNullAt(1) && r.getString(1) == "small") == 10)
  }
}
