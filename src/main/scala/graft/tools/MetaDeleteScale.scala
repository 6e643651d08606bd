package graft.tools

import graft.tables.GeoManifest.FileEntry
import graft.tables.GeoPartition
import graft.tables.GeoPartition.{PTransform, SpecSet}

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Driver-loop scale measurement for the metadata-only DELETE planner
 * (GeoPartition.metadataDeleteSet): the loop runs per manifest ENTRY on
 * the driver, so at a 100k-file manifest it must be linear — a hidden
 * quadratic in per-file spec resolution or atom evaluation would make
 * retention DELETEs driver-bound exactly where they are supposed to be
 * free. Measures:
 *
 *  1. aligned retention cutoff over N single-valued `days(ts)` files,
 *     N in {25k, 50k, 100k, 200k} — expect ~2x time per 2x N;
 *  2. the same with TWO alternating specs (per-file spec resolution on
 *     every entry — the evolution-safe path);
 *  3. worst-case straddler LAST (every prior file decided before the
 *     fallback triggers) — same order as (1), proves early rows don't
 *     re-evaluate.
 *
 * Usage: runMain graft.tools.MetaDeleteScale [maxFiles]
 */
object MetaDeleteScale {
  def main(args: Array[String]): Unit = {
    val maxFiles = args.headOption.map(_.toInt).getOrElse(200000)
    val spark = SparkSession.builder().master("local[2]")
      .appName("graft-metadelete-scale")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("v", StringType)))
    def files(n: Int, straddleLast: Boolean, twoSpecs: Boolean): Seq[FileEntry] =
      (0 until n).map { i =>
        // pstats live in the TRANSFORM space: days() records day ordinals
        // (GeoPartition.valueOf). Single-valued per day; the optional last
        // file spans two days so it straddles any between-day cutoff.
        val lo = i.toLong
        val hi = if (straddleLast && i == n - 1) lo + 1 else lo
        FileEntry(s"f$i.parquet", 1000L, Double.NaN, Double.NaN, Double.NaN,
          Double.NaN, pstats = Seq((lo, hi)), addedAt = 0,
          pnulls = Seq(false), spec = if (twoSpecs) i % 2 else 0)
      }

    val daysSpec = Seq(PTransform("days", 0, "ts"))
    val oneSpec = SpecSet.single(daysSpec)
    val twoSpec = SpecSet(0, Map(0 -> daysSpec, 1 -> daysSpec))

    // retention cutoff at a UTC day boundary, halfway through the files
    def cond(nDays: Int) = {
      val probe = spark.createDataFrame(
        java.util.Collections.emptyList[Row](), schema)
      val cut = java.time.Instant.ofEpochSecond(nDays.toLong / 2 * 86400L)
      probe.where(col("ts") < lit(java.sql.Timestamp.from(cut)))
        .queryExecution.analyzed match {
        case f: LFilter => f.condition
        case p => sys.error(s"unexpected plan: $p")
      }
    }

    def time[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e6)
    }

    // JIT warmup
    (1 to 3).foreach { _ =>
      GeoPartition.metadataDeleteSet(
        files(10000, straddleLast = false, twoSpecs = false), oneSpec, schema,
        Seq(cond(10000)))
    }

    for (n <- Seq(25000, 50000, 100000, maxFiles).filter(_ <= maxFiles).distinct) {
      val c = Seq(cond(n))
      val fs1 = files(n, straddleLast = false, twoSpecs = false)
      val (r1, t1) = time(GeoPartition.metadataDeleteSet(fs1, oneSpec, schema, c))
      assert(r1.exists(_.size == n / 2), s"expected ${n / 2} drops, got ${r1.map(_.size)}")
      val fs2 = files(n, straddleLast = false, twoSpecs = true)
      val (r2, t2) = time(GeoPartition.metadataDeleteSet(fs2, twoSpec, schema, c))
      assert(r2.exists(_.size == n / 2))
      val fs3 = files(n, straddleLast = true, twoSpecs = false)
      val (r3, t3) = time(GeoPartition.metadataDeleteSet(fs3, oneSpec, schema,
        Seq(cond(2 * n)))) // cutoff at n days: last file straddles it
      assert(r3.isEmpty, "straddler must force the whole-statement fallback")
      println(f"[metadelete] files=$n%7d aligned=${t1}%8.1f ms " +
        f"two_specs=${t2}%8.1f ms straddle_last=${t3}%8.1f ms " +
        f"per_file=${t1 * 1000 / n}%.2f us")
    }
    spark.stop()
  }
}
