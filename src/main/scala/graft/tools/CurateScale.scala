package graft.tools

import graft.ops.{Similarity, TextAnalysis, TrainingData}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Scale-stress for the r18 curation operators — SemDedup, DSIR, and the
 * persisted BM25 index — on replicated sf0.1 inputs. The interesting
 * numbers are the WALL SHAPES, not absolutes: SemDedup's pair stage must
 * track the duplicate volume (banded + cluster-bucketed, never corpus²),
 * DSIR must stay flat per doc (two bounded bucket tables + one
 * broadcast-join pass), and the BM25 probe must stay near-constant as the
 * corpus grows (bucket-pruned scan; build cost is the linear part).
 *
 * Usage: runMain graft.tools.CurateScale [replications] [cores]
 *   replication r maps ids into disjoint ranges, so duplicate structure
 *   scales linearly with the corpus (each replica carries its own twins).
 */
object CurateScale {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(8)
    val cores = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master(s"local[$cores]")
      .appName("graft-curate-scale")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def wall[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    for (r <- Seq(1, reps)) {
      val ids = spark.range(r)
      // r disjoint id ranges; each replica flips signs per dimension from
      // a hash of (replica, dim) — a REAL direction change (a scalar
      // multiply is cosine-invariant and diagonal scalings still share
      // the common component), so cross-replica cosine sits near 0 and
      // the only seeded near-dups are the in-replica twins
      val e = ids.crossJoin(emb).selectExpr(
        "id * 1000000 + vec_id AS vec_id",
        "transform(embedding, (x, i) -> CAST(x AS DOUBLE) * " +
          "(CASE WHEN pmod(hash(id, i), 2) = 0 THEN 1.0 ELSE -1.0 END)) AS emb")
      val twins = e.selectExpr("vec_id + 500000000 AS vec_id",
        "transform(emb, x -> x * 0.95 + 0.005) AS emb")
      val corpus = e.union(twins).localCheckpoint()
      val n = corpus.count()
      val (pairs, tSem) = wall {
        Similarity.semDedup(corpus, col("emb"), col("vec_id"),
          k = 8 * r, tau = 0.9, iters = 2)
          .where(!col("keep")).count()
      }
      println(f"[curate] semdedup n=$n%d drops=$pairs%d wall=$tSem%.2f s " +
        f"(${n / tSem}%.0f rows/s)")

      val d = ids.crossJoin(docs).selectExpr(
        "id * 1000000 + doc_id AS doc_id", "text").localCheckpoint()
      val nd = d.count()
      val target = d.where(array_contains(TextAnalysis.tokens(col("text")), "spark"))
      val (_, tDsir) = wall {
        TrainingData.dsirWeights(d, col("doc_id"), col("text"),
          target, col("text"), buckets = 4096).count()
      }
      println(f"[curate] dsir n=$nd%d wall=$tDsir%.2f s (${nd / tDsir}%.0f docs/s)")

      val idx = java.nio.file.Files.createTempDirectory("curate_bm25").toString + "/i"
      val (_, tBuild) = wall {
        TextAnalysis.buildTextIndex(spark, idx, d, col("doc_id"), col("text"))
      }
      val (_, tProbeCold) = wall {
        TextAnalysis.bm25Search(spark, idx, Seq("spark", "customer", "merge"), 10).count()
      }
      val (_, tProbe) = wall {
        TextAnalysis.bm25Search(spark, idx, Seq("spark", "customer", "merge"), 10).count()
      }
      println(f"[curate] bm25 n=$nd%d build=$tBuild%.2f s " +
        f"probe_cold=$tProbeCold%.2f s probe=$tProbe%.2f s")

      // r19 removal: a FIXED-size takedown batch (500 ids) as the corpus
      // grows. Expected shape: the eq-delete commit is O(keys); the
      // stats delta is one column-pruned (doc_id, dl) pass over the
      // postings files the delete applies to — linear in corpus size but
      // ~bytes of two small columns, amortized per takedown BATCH. The
      // post-removal probe must stay near-constant.
      val victims = d.select(col("doc_id")).orderBy("doc_id").limit(500)
      val (_, tRemove) = wall {
        TextAnalysis.removeFromTextIndex(spark, idx, victims)
      }
      val (_, tProbeAfter) = wall {
        TextAnalysis.bm25Search(spark, idx, Seq("spark", "customer", "merge"), 10).count()
      }
      println(f"[curate] bm25-remove n=$nd%d keys=500 remove=$tRemove%.2f s " +
        f"probe_after=$tProbeAfter%.2f s")

      // r20: the domain-cap verb at SKEW — one mega-source holds 80% of
      // the corpus (the C4/FineWeb reality: one giant crawl domain), the
      // rest spread over ~1k small sources that pass through untouched.
      // The mega group is capPerSource's documented hot key: the
      // over-cap verdict broadcasts, pass-through rows never sort, and
      // WindowGroupLimit (partial+final) bounds the mega group's
      // per-partition sort at cap rows — so wall must track CORPUS size
      // (one hash pass + the bounded group limit), not blow up with the
      // hot group. Kept = small sources whole + exactly cap mega rows.
      val sourced = d.withColumn("src",
        when(pmod(col("doc_id"), lit(5)) < 4, lit("mega.example"))
          .otherwise(concat(lit("s"), pmod(col("doc_id"), lit(997)))))
      val capN = 1000L
      val (kept, tCap) = wall {
        TrainingData.capPerSource(sourced, col("doc_id"), col("src"), capN).count()
      }
      val megaKept = kept - sourced.where(col("src") =!= "mega.example").count()
      println(f"[curate] cap-skew n=$nd%d mega=${nd * 4 / 5}%d cap=$capN%d " +
        f"kept=$kept%d megaKept=$megaKept%d wall=$tCap%.2f s (${nd / tCap}%.0f rows/s)")
    }
    spark.stop()
  }
}
