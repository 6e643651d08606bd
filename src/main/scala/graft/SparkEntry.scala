package graft

import graft.functions.GraftFunctions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Driver contract — SURVEY.md §2 inventory, one `queries` entry per
 * operator, with a DuckDB oracle in `oracleSql` wherever the semantics are
 * SQL-expressible (SURVEY.md §5 lays out the exact-representability rules
 * these queries follow: decimal sums, integer-coordinate geometry oracles,
 * epoch-second session gaps).
 */
object SparkEntry {

  val tables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // remembers the dir whose views are live per session — queries run back
  // to back in Verify/Bench and re-reading 10 parquet footers per query is
  // pure overhead. Keyed by session (weakly) and re-registered whenever the
  // dir CHANGES, since temp views are session-global.
  private val prepped =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, String]())

  /** Normalize the events `ts` column to a session-TZ TIMESTAMP regardless
    * of how the parquet file encodes it. The testdata generator has shipped
    * it as TIMESTAMP(NANOS) (read as Long under nanosAsLong) and as
    * timestamp[us] (read as TIMESTAMP_NTZ); sniff the read schema rather
    * than assuming either. Session TZ is UTC, so the NTZ cast is exact.
    */
  def normalizeEventsTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType           => df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case _: TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                  => df
    }
  }

  /** Register ST_ functions + one temp view per testdata table. */
  def prep(spark: SparkSession, dir: String): SparkSession = {
    GraftFunctions.register(spark)
    // record the dir only AFTER all views register, so a mid-registration
    // failure doesn't leave the map claiming the new dir is live
    if (prepped.get(spark) != dir) {
      // lets TIMESTAMP(NANOS)-encoded files load as Long (older testdata);
      // normalizeEventsTs handles whichever shape actually arrives
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      tables.foreach { t =>
        val df = spark.read.parquet(s"$dir/$t.parquet")
        val fixed = if (t == "events") normalizeEventsTs(df) else df
        fixed.createOrReplaceTempView(t)
      }
      prepped.put(spark, dir)
    }
    spark
  }

  /** Ensure a GeoCatalog named `cat` is configured on this session
    * (idempotent; the warehouse is a fresh temp dir on first touch). The
    * catalog-backed [C] queries each bootstrap a per-purpose catalog so
    * reruns stay hermetic. */
  private def ensureGeoCatalog(s: SparkSession, cat: String, prefix: String): Unit =
    if (s.conf.getOption(s"spark.sql.catalog.$cat").isEmpty) {
      s.conf.set(s"spark.sql.catalog.$cat", classOf[graft.tables.GeoCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse",
        java.nio.file.Files.createTempDirectory(prefix).toString)
    }

  /** Run `body` with spark.sql.shuffle.partitions pinned to `n`, restoring
    * the prior value afterwards. Streaming stateful operators create one
    * state-store instance per shuffle partition per trigger, so a tiny
    * test stream pays 32 state commits a micro-batch for row counts in
    * the hundreds — size the state width to the data, exactly as the same
    * job would be tuned on a cluster. Results are unaffected: the state
    * partitioning changes where keys live, not what they aggregate to. */
  private def withShufflePartitions[T](s: SparkSession, n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val old = s.conf.get(key)
    s.conf.set(key, n.toString)
    try body finally s.conf.set(key, old)
  }

  /** Flagship: spatial range query + aggregate via the Column DSL (no SQL
    * registration needed — works on a vanilla driver session). */
  def entry(spark: SparkSession): DataFrame = {
    import GraftFunctions._
    val c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    val pt = st_point(col("c_acctbal"), col("c_nationkey").cast("double"))
    c.withColumn("pt", pt)
      .where(st_contains(st_polygonFromEnvelope(lit(0.005), lit(-0.5), lit(9000.005), lit(24.5)), col("pt")))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n"), st_x(st_centroid_aggr(col("pt"))).as("cx"))
      .orderBy(col("c_nationkey"))
  }

  /** Dev observability (PlanDump): queries that must materialize
    * internally (checkpoint before restoring session confs) record the
    * executed plan they proved here, since the returned frame's plan
    * collapses to a checkpoint scan. */
  @volatile var lastMaterializedPlan: Option[String] = None

  /** Spark-side query per operator. Most run through spark.sql over the
    * registered catalog (exercising SQL registration); entries marked DSL
    * use the Column API. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ----- relational core (§2.14) -----
    "q1_pricing" -> ((s, d) => prep(s, d).sql("""
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
             COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""")),

    "q3_shipping" -> ((s, d) => prep(s, d).sql("""
      SELECT l_orderkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
             CAST(o_orderdate AS DATE) AS o_orderdate
      FROM customer JOIN orders ON c_custkey = o_custkey
                    JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
        AND l_shipdate > TIMESTAMP '1997-03-15 00:00:00'
      GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
      ORDER BY revenue DESC, l_orderkey
      LIMIT 10""")),

    "q5_local_supplier" -> ((s, d) => prep(s, d).sql("""
      SELECT n_name,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM customer JOIN orders ON c_custkey = o_custkey
                    JOIN lineitem ON l_orderkey = o_orderkey
                    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
                    JOIN nation ON s_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY n_name
      ORDER BY revenue DESC, n_name""")),

    "topk_per_group" -> ((s, d) => prep(s, d).sql("""
      SELECT p_brand, p_partkey, rn FROM (
        SELECT p_brand, p_partkey,
               ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn
        FROM part) t
      WHERE rn <= 3
      ORDER BY p_brand, rn""")),

    "sessionize_batch" -> ((s, d) => prep(s, d).sql("""
      WITH e AS (
        SELECT user_id, event_id, UNIX_TIMESTAMP(ts) AS sec FROM events
      ), flagged AS (
        SELECT user_id, sec,
               CASE WHEN sec - LAG(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) > 1800
                    OR LAG(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_sess
        FROM e
      ), sess AS (
        SELECT user_id, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY sec ROWS UNBOUNDED PRECEDING) AS sess_id
        FROM flagged
      )
      SELECT user_id, COUNT(DISTINCT sess_id) AS n_sessions, COUNT(*) AS n_events
      FROM sess GROUP BY user_id ORDER BY user_id""")),

    "events_hourly" -> ((s, d) => prep(s, d).sql("""
      SELECT UNIX_TIMESTAMP(DATE_TRUNC('HOUR', ts)) AS hour_sec, event_type,
             COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY hour_sec, event_type""")),

    "q_anti_join" -> ((s, d) => prep(s, d).sql("""
      SELECT c_nationkey, COUNT(*) AS n_customers_no_orders
      FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      GROUP BY c_nationkey ORDER BY c_nationkey""")),

    "q_semi_join" -> ((s, d) => prep(s, d).sql("""
      SELECT p_brand, COUNT(*) AS n_parts_shipped
      FROM part WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
      GROUP BY p_brand ORDER BY p_brand""")),

    "q_rollup" -> ((s, d) => prep(s, d).sql("""
      SELECT COALESCE(l_returnflag, 'ALL') AS rf, COALESCE(l_linestatus, 'ALL') AS ls,
             COUNT(*) AS n
      FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY rf, ls""")),

    "q_distinct_agg" -> ((s, d) => prep(s, d).sql("""
      SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
             COUNT(DISTINCT l_suppkey) AS n_supps
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    "sessionize_fmgws" -> ((s, d) => {
      prep(s, d)
      // the flatMapGroupsWithState sessionizer, run in batch mode, rolled
      // up per user — DuckDB-verified against a pure-SQL sessionization
      graft.streaming.EventStreams.sessionize(
          graft.streaming.EventStreams.eventsDataset(s, d), gapMinutes = 30)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
        .orderBy("user_id")
    }),

    "range_join_bands" -> ((s, d) => {
      prep(s, d)
      val bands = s.table("nation").select(col("n_nationkey"),
        (col("n_nationkey") * 400.0 + 0.005).as("lo"),
        (col("n_nationkey") * 400.0 + 600.005).as("hi"))
      graft.ops.RangeJoin.bucketJoin(
          s.table("customer"), col("c_acctbal"),
          bands, col("lo"), col("hi"), bucketSize = 500.0, broadcastRight = true)
        .groupBy("n_nationkey").agg(count(lit(1)).as("n"))
        .orderBy("n_nationkey")
    }),

    "asof_join_events" -> ((s, d) => {
      prep(s, d)
      // for each purchase, the most recent prior error event of that user
      val ev = s.table("events").withColumn("us", expr("unix_micros(ts)"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("us"))
      val errors = ev.where(col("event_type") === "error")
        .groupBy("user_id", "us").agg(max("event_id").as("err_id"))
      graft.ops.AsofJoin.asofJoin(
          purchases, col("user_id"), col("us"),
          errors, col("user_id"), col("us"), Seq("err_id"))
        .select(col("event_id"), col("asof_err_id").as("err_id"))
        .orderBy("event_id")
    }),

    "geofence_batch" -> ((s, d) => {
      prep(s, d)
      graft.streaming.EventStreams.geofence(
          s.table("events").withColumn("y", (col("user_id") % 25).cast("double")),
          "value", "y", "POLYGON ((0.005 -0.5, 120.005 -0.5, 120.005 14.5, 0.005 14.5, 0.005 -0.5))")
        .groupBy("event_type").agg(count(lit(1)).as("n"))
        .orderBy("event_type")
    }),

    // stream-static zone enrichment in batch: same op the streaming spec
    // runs on a MemoryStream; zones broadcast, map-only on events
    "zone_enrich_batch" -> ((s, d) => {
      prep(s, d); import GraftFunctions._
      val zones = s.table("nation").select(col("n_nationkey").as("zone_id"),
        st_polygonFromEnvelope(col("n_nationkey") * 40.0 + 0.005, lit(-0.5),
          col("n_nationkey") * 40.0 + 60.005, lit(24.5)).as("zone"))
      val events = s.table("events")
        .withColumn("y", (col("user_id") % 25).cast("double"))
      graft.streaming.EventStreams.zoneEnrich(events, "value", "y", zones, col("zone"))
        .groupBy("zone_id").agg(count(lit(1)).as("n"))
        .orderBy("zone_id")
    }),

    // End-to-end corpus-cleaning pipeline: quality filter -> lang filter ->
    // exact dedup -> MinHash near-dup removal -> token accounting.
    "pipeline_clean_corpus" -> ((s, d) => {
      prep(s, d)
      graft.ops.CorpusPipeline.cleanStats(s.table("documents"),
        col("doc_id"), col("text"), col("lang"))
    }),

    // stream-stream interval join, batch-parity leg: views followed by a
    // purchase from the same user within an hour (the 60s spelling matched
    // ZERO pairs at the verify SFs - a 0=0 oracle; an hour matches 3/40/342
    // pairs at sf0.001/0.01/0.1, so the hash now pins real join output) (same operator the streaming
    // spec runs on MemoryStreams; watermark is a no-op here)
    "interval_join_batch" -> ((s, d) => {
      prep(s, d)
      val views = s.table("events").where(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id"), col("ts").as("vts"))
      val buys = s.table("events").where(col("event_type") === "purchase")
        .select(col("event_id").as("buy_id"), col("user_id"), col("ts").as("bts"))
      graft.streaming.EventStreams.intervalJoin(views, buys,
          "user_id", "vts", "bts", intervalSeconds = 3600)
        .groupBy("user_id").agg(count(lit(1)).as("n_pairs"),
          sum(col("buy_id") - col("view_id")).as("id_delta_sum"))
        .orderBy("user_id")
    }),

    // the SAME interval join actually STREAMED: two independent file
    // streams over a 4-file copy of events (maxFilesPerTrigger=2 => the
    // join state carries matches across micro-batches), inner stream-
    // stream join emits eagerly, sink aggregated in batch afterwards —
    // hash-matches the identical batch oracle, so the streaming state
    // machinery provably loses/duplicates nothing
    "stream_interval_join" -> ((s, d) => {
      prep(s, d)
      val (sink, _, _) = runStreamIntervalJoin(s)
      sink.groupBy("user_id").agg(count(lit(1)).as("n_pairs"),
          sum(col("buy_id") - col("view_id")).as("id_delta_sum"))
        .orderBy("user_id")
    }),

    // Spark's NATIVE session_window, actually streamed: sessions stay
    // open in state across micro-batches and only emit once the
    // watermark (advanced by a later-arriving flush file) passes their
    // close — then rolled up per user. Boundary semantics differ from
    // the fmgws sessionizer ON PURPOSE (an event exactly gap after its
    // predecessor STARTS a new session here, window half-open), so the
    // oracle replays >= in microseconds — a ms-truncation or an
    // off-by-one at the merge boundary changes session counts.
    "sessionize_native_stream" -> ((s, d) => {
      prep(s, d)
      val (srcDir, spanSec) = writeEventsWaveWithFlush(s)
      val schema = s.read.parquet(srcDir).schema
      s.catalog.dropTempView("snw_sink")
      val ev = s.readStream.schema(schema).option("maxFilesPerTrigger", "2")
        .parquet(srcDir).withWatermark("ts", s"$spanSec seconds")
      withShufflePartitions(s, 4) {
        val q = ev.groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
          .agg(count(lit(1)).as("n_events"))
          .writeStream.format("memory").outputMode("append")
          .queryName("snw_sink").start()
        q.processAllAvailable(); q.stop()
      }
      s.table("snw_sink").where(col("user_id") =!= -999L)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"),
          sum("n_events").cast("bigint").as("n_events"))
        .orderBy("user_id")
    }),

    // stream-stream LEFT OUTER interval join, actually streamed: matched
    // pairs emit eagerly; unmatched views must be HELD in state until a
    // later-arriving flush file advances both watermarks past their join
    // window, then emit null-extended (the outer-eviction path). The
    // oracle is the plain batch LEFT JOIN — a dropped, duplicated, or
    // never-flushed unmatched row changes n_unmatched for its user.
    "stream_interval_join_outer" -> ((s, d) => {
      prep(s, d)
      val (sink, _, _) = runStreamOuterIntervalJoin(s)
      sink.groupBy("user_id").agg(
          count(lit(1)).as("n_rows"),
          count(col("buy_id")).as("n_matched"),
          (count(lit(1)) - count(col("buy_id"))).as("n_unmatched"),
          coalesce(sum(col("buy_id") - col("view_id")), lit(0L))
            .cast("bigint").as("id_delta_sum"))
        .orderBy("user_id")
    }),

    // DSIR importance resampling end-to-end: target = docs containing the
    // token 'spark', raw = the whole corpus; every doc scores the summed
    // hashed-unigram log-ratio. Rank-only output (weights are doubles);
    // the rank-15/16 weight gap is 2e-3..8e-3 at every verify SF, far
    // above cross-engine FP noise, and the hash is the engine-portable
    // 20-bit polynomial the simhash oracle already replays.
    "dsir_weights_topk" -> ((s, d) => {
      prep(s, d)
      import org.apache.spark.sql.expressions.Window
      val docs = s.table("documents")
      val target = docs.where(array_contains(
        graft.ops.TextAnalysis.tokens(col("text")), "spark"))
      // top-k via orderBy+limit (TakeOrderedAndProject — per-partition
      // k-heap); the rank window then runs over 15 rows only
      graft.ops.TrainingData.dsirWeights(docs, col("doc_id"), col("text"),
          target, col("text"), buckets = 4096)
        .orderBy(desc("weight"), asc("doc_id")).limit(15)
        .withColumn("rank", row_number().over(
          Window.orderBy(desc("weight"), asc("doc_id"))))
        .select(col("doc_id"), col("rank"))
        .orderBy("rank")
    }),

    // invariant oracle: every payload must produce a dim-16 feature vector
    // with non-zero norm (self-cosine 1 within fp tolerance) — verifies the
    // mapPartitions plumbing end-to-end without depending on stub values
    "multimodal_features" -> ((s, d) => {
      prep(s, d)
      val blobs = graft.ops.Multimodal.toBlobs(
        s.table("documents").withColumn("payload", col("text").cast("binary")),
        "doc_id", "payload", "text/stub")
      graft.ops.Multimodal.extractFeatures(blobs, dim = 16).toDF()
        .select(col("media_id"), size(col("features")).as("dim"),
          (abs(graft.ops.Similarity.cosine(col("features"), col("features")) - 1.0) < 1e-9)
            .as("unit_norm"))
        .orderBy("media_id")
    }),

    // REAL image decode (javax.imageio): executors PNG-encode a
    // deterministic per-id gradient, decodeImages decodes it back and
    // sums each channel as exact integers. PNG is lossless and the
    // gradient never wraps mod 256 at these sizes, so DuckDB replays the
    // sums in closed form — a pixel-level decode oracle (any coordinate
    // flip or channel swap changes a sum). 25 rows at every SF (nation).
    "multimodal_image_decode" -> ((s, d) => {
      prep(s, d)
      import s.implicits._
      val blobs = s.table("nation")
        .select(col("n_nationkey").cast("long")).as[Long]
        .mapPartitions(_.map { id =>
          val w = 8 + (id % 5).toInt
          val h = 6 + (id % 3).toInt
          graft.ops.Multimodal.Blob(id,
            graft.ops.Multimodal.MediaMeta("png", w, h, 0L),
            graft.ops.Multimodal.syntheticPng(id, w, h))
        })
      graft.ops.Multimodal.decodeImages(blobs, grid = 4)
        .select(col("media_id"), col("width"), col("height"), col("channels"),
          col("sum_r"), col("sum_g"), col("sum_b"))
        .orderBy("media_id")
    }),

    // REAL audio decode (javax.sound.sampled): executors WAV-encode a
    // deterministic per-id PCM16 ramp (sample i of channel c = id+3i+7c,
    // never clips), decodeAudio reads it back and sums each channel as
    // exact integers. WAV is lossless, so DuckDB replays rate/channels/
    // frames and both sums in closed form — a sample-level decode oracle
    // (a frame skip, channel swap, or byte-order mistake changes a sum).
    // 25 rows at every SF (nation).
    "multimodal_audio_decode" -> ((s, d) => {
      prep(s, d)
      import s.implicits._
      val blobs = s.table("nation")
        .select(col("n_nationkey").cast("long")).as[Long]
        .mapPartitions(_.map { id =>
          val frames = 200 + (id * 17).toInt
          val ch = 1 + (id % 2).toInt
          val rate = 8000 + 500 * (id % 3).toInt
          graft.ops.Multimodal.Blob(id,
            graft.ops.Multimodal.MediaMeta("wav", 0, 0, 0L),
            graft.ops.Multimodal.syntheticWav(id, frames, ch, rate))
        })
      graft.ops.Multimodal.decodeAudio(blobs, bins = 8)
        .select(col("media_id"), col("sample_rate"), col("channels"),
          col("frames"), col("sum_c0"), col("sum_c1"))
        .orderBy("media_id")
    }),

    // END-TO-END multimodal -> ANN: executors WAV-encode a per-id 8-bin
    // amplitude pattern, decodeAudio recovers the pattern as the energy
    // embedding EXACTLY (every value is amp/2^15, dyadic at every step —
    // Multimodal.syntheticWavPattern documents the arithmetic), and
    // bruteTopK ranks all 25 ids against id 0's pattern. Because the
    // cosine's dot/norm sums stay exact until the final sqrt/divide,
    // DuckDB replays the SCORES bit-identically in closed form — this
    // pins decode -> embedding -> VecCosine -> top-k end to end (a bin
    // permutation, frame skip, or channel mistake changes the ranking
    // AND the score bits).
    "multimodal_ann_top10" -> ((s, d) => {
      prep(s, d)
      import s.implicits._
      val blobs = s.table("nation")
        .select(col("n_nationkey").cast("long")).as[Long]
        .mapPartitions(_.map { id =>
          graft.ops.Multimodal.Blob(id,
            graft.ops.Multimodal.MediaMeta("wav", 0, 0, 0L),
            graft.ops.Multimodal.syntheticWavPattern(id, frames = 400, bins = 8, sampleRate = 16000))
        })
      val feats = graft.ops.Multimodal.decodeAudio(blobs, bins = 8).toDF()
      val q = Array.tabulate(8)(b => graft.ops.Multimodal.patternAmp(0L, b).toFloat / 32768f)
      graft.ops.Similarity.bruteTopK(feats, col("features"), col("media_id"), q, 10)
        .orderBy(desc("score"), asc("vec_id"))
    }),

    // ----- geometry constructors + accessors (§2.2, §2.3) -----
    "st_point_xy" -> ((s, d) => prep(s, d).sql("""
      SELECT c_custkey, st_x(pt) AS x, st_y(pt) AS y
      FROM (SELECT c_custkey, st_point(c_acctbal, CAST(c_nationkey AS DOUBLE)) AS pt FROM customer)
      ORDER BY c_custkey""")),

    "st_astext_point" -> ((s, d) => prep(s, d).sql("""
      SELECT c_custkey,
             st_astext(st_point(CAST(c_nationkey AS DOUBLE), CAST(c_custkey % 7 AS DOUBLE))) AS wkt
      FROM customer ORDER BY c_custkey""")),

    "st_area_envelope" -> ((s, d) => prep(s, d).sql("""
      SELECT p_partkey,
             st_area(st_polygonfromenvelope(CAST(0 AS DOUBLE), CAST(0 AS DOUBLE),
                                            CAST(p_size AS DOUBLE), CAST(p_size + 2 AS DOUBLE))) AS area
      FROM part ORDER BY p_partkey""")),

    "st_distance_points" -> ((s, d) => prep(s, d).sql("""
      SELECT p_partkey,
             st_distance(st_point(CAST(p_size AS DOUBLE), CAST(0 AS DOUBLE)),
                         st_point(CAST(0 AS DOUBLE), CAST(p_size + 1 AS DOUBLE))) AS dist
      FROM part ORDER BY p_partkey""")),

    "st_length_line" -> ((s, d) => prep(s, d).sql("""
      SELECT p_partkey,
             st_length(st_geomfromtext(CONCAT('LINESTRING (0 0, ', CAST(p_size AS STRING), ' ', CAST(p_size + 2 AS STRING), ')'))) AS len
      FROM part ORDER BY p_partkey""")),

    "st_makeline_length" -> ((s, d) => prep(s, d).sql("""
      SELECT p_partkey,
             st_length(st_makeline(st_point(0.0D, 0.0D),
                                   st_point(CAST(p_size AS DOUBLE), CAST(p_size + 2 AS DOUBLE)))) AS len
      FROM part ORDER BY p_partkey""")),

    "st_geometrytype_mix" -> ((s, d) => prep(s, d).sql("""
      SELECT p_partkey,
             st_geometrytype(st_point(CAST(p_size AS DOUBLE), 0.0D)) AS pt_type,
             st_geometrytype(st_polygonfromenvelope(0.0D, 0.0D, CAST(p_size AS DOUBLE), 1.0D)) AS poly_type
      FROM part ORDER BY p_partkey""")),

    "st_misc_accessors" -> ((s, d) => prep(s, d).sql("""
      SELECT p_partkey,
             st_numpoints(st_geomfromtext(CONCAT('LINESTRING (0 0, ', p_size, ' 1, ', p_size, ' 2)'))) AS np,
             st_numgeometries(st_geomfromtext(CONCAT('MULTIPOINT ((0 0), (', p_size, ' 1))'))) AS ng,
             st_isempty(st_geomfromtext('POLYGON EMPTY')) AS is_empty_true,
             st_isempty(st_point(CAST(p_size AS DOUBLE), 1.0D)) AS is_empty_false,
             st_isvalid(st_makeenvelope(0.0D, 0.0D, CAST(p_size AS DOUBLE), 1.0D)) AS is_valid,
             st_srid(st_setsrid(st_point(1.0D, 1.0D), 1000 + p_size)) AS srid,
             st_astext(st_geomfromwkb(st_asbinary(st_point(CAST(p_size AS DOUBLE), 2.0D)))) AS wkb_rt
      FROM part ORDER BY p_partkey""")),

    "st_wkt_transforms" -> ((s, d) => prep(s, d).sql("""
      SELECT p_partkey,
             st_astext(st_boundary(st_geomfromtext(CONCAT('LINESTRING (0 0, ', p_size, ' 3)')))) AS bnd_wkt,
             st_astext(st_normalize(st_convexhull(st_geomfromtext(CONCAT('MULTIPOINT ((0 0), (', p_size, ' 3))'))))) AS hull_wkt,
             st_astext(st_normalize(st_geomfromtext(CONCAT('MULTIPOINT ((', p_size, ' 3), (0 0))')))) AS norm_wkt,
             st_x(st_centroid(st_makeenvelope(0.0D, 0.0D, CAST(p_size AS DOUBLE), CAST(p_size + 2 AS DOUBLE)))) AS cx,
             st_astext(st_envelope(st_point(CAST(p_size AS DOUBLE), 2.0D))) AS env_pt
      FROM part ORDER BY p_partkey""")),

    "st_line_accessors" -> ((s, d) => prep(s, d).sql("""
      WITH t AS (SELECT p_partkey,
                        st_makeline(st_point(CAST(p_size AS DOUBLE), 1.0D),
                                    st_point(CAST(p_size + 3 AS DOUBLE), 5.0D)) AS ln
                 FROM part)
      SELECT p_partkey,
             st_x(st_startpoint(ln)) AS sx,
             st_y(st_endpoint(ln)) AS ey,
             st_x(st_pointn(ln, 2)) AS p2x,
             st_x(st_translate(st_startpoint(ln), 100.0D, 0.0D)) AS tx,
             st_y(st_flipcoordinates(st_startpoint(ln))) AS fy,
             st_dimension(ln) AS dim,
             st_x(st_closestpoint(ln, st_point(0.0D, 0.0D))) AS cx_is_sx_when_left_of_line
      FROM t ORDER BY p_partkey""")),

    // ----- predicates (§2.4) -----
    "st_contains_range" -> ((s, d) => prep(s, d).sql("""
      SELECT c_nationkey, COUNT(*) AS n FROM customer
      WHERE st_contains(st_polygonfromenvelope(0.005D, -0.5D, 5000.005D, 10.5D),
                        st_point(c_acctbal, CAST(c_nationkey AS DOUBLE)))
      GROUP BY c_nationkey ORDER BY c_nationkey""")),

    "st_within_range" -> ((s, d) => prep(s, d).sql("""
      SELECT c_nationkey, COUNT(*) AS n FROM customer
      WHERE st_within(st_point(c_acctbal, CAST(c_nationkey AS DOUBLE)),
                      st_polygonfromenvelope(1000.005D, 4.5D, 8000.005D, 19.5D))
      GROUP BY c_nationkey ORDER BY c_nationkey""")),

    "st_intersects_range" -> ((s, d) => prep(s, d).sql("""
      SELECT c_nationkey, COUNT(*) AS n FROM customer
      WHERE st_intersects(st_point(c_acctbal, CAST(c_nationkey AS DOUBLE)),
                          st_polygonfromenvelope(-500.005D, -0.5D, 2500.005D, 14.5D))
      GROUP BY c_nationkey ORDER BY c_nationkey""")),

    "st_disjoint_range" -> ((s, d) => prep(s, d).sql("""
      SELECT COUNT(*) AS n FROM customer
      WHERE st_disjoint(st_point(c_acctbal, CAST(c_nationkey AS DOUBLE)),
                        st_polygonfromenvelope(0.005D, -0.5D, 5000.005D, 24.5D))""")),

    "st_covers_range" -> ((s, d) => prep(s, d).sql("""
      SELECT COUNT(*) AS n FROM customer
      WHERE st_covers(st_polygonfromenvelope(0.005D, -0.5D, 5000.005D, 24.5D),
                      st_point(c_acctbal, CAST(c_nationkey AS DOUBLE)))""")),

    "st_coveredby_range" -> ((s, d) => prep(s, d).sql("""
      SELECT COUNT(*) AS n FROM customer
      WHERE st_coveredby(st_point(c_acctbal, CAST(c_nationkey AS DOUBLE)),
                         st_polygonfromenvelope(0.005D, -0.5D, 5000.005D, 24.5D))""")),

    "st_predicate_matrix" -> ((s, d) => prep(s, d).sql("""
      WITH t AS (SELECT p_partkey, CAST(p_size % 12 AS DOUBLE) AS p FROM part)
      SELECT p_partkey,
             st_crosses(st_geomfromtext('LINESTRING (0 0, 10 10)'),
                        st_makeline(st_point(p, -5.0D), st_point(p, 20.0D))) AS crosses,
             st_touches(st_makeenvelope(0.0D, 0.0D, 5.0D, 5.0D),
                        st_makeenvelope(p, 0.0D, p + 5.0D, 5.0D)) AS touches,
             st_overlaps(st_makeenvelope(0.0D, 0.0D, 5.0D, 5.0D),
                         st_makeenvelope(p, 0.0D, p + 5.0D, 5.0D)) AS overlaps,
             st_equals(st_makeenvelope(0.0D, 0.0D, 5.0D, 5.0D),
                       st_makeenvelope(p, 0.0D, p + 5.0D, 5.0D)) AS equals
      FROM t ORDER BY p_partkey""")),

    "st_dwithin_filter" -> ((s, d) => prep(s, d).sql("""
      SELECT c_custkey FROM customer
      WHERE st_dwithin(st_point(c_acctbal, CAST(c_nationkey AS DOUBLE)),
                       st_point(5000.0D, 12.0D), 1000.0D)
      ORDER BY c_custkey""")),

    // ----- spatial aggregates (§2.6) -----
    "st_envelope_aggr_bounds" -> ((s, d) => prep(s, d).sql("""
      SELECT c_nationkey,
             st_xmin(env) AS xmin, st_ymin(env) AS ymin,
             st_xmax(env) AS xmax, st_ymax(env) AS ymax
      FROM (SELECT c_nationkey,
                   st_envelope_aggr(st_point(c_acctbal, CAST(c_custkey % 100 AS DOUBLE))) AS env
            FROM customer GROUP BY c_nationkey)
      ORDER BY c_nationkey""")),

    "st_centroid_aggr_points" -> ((s, d) => prep(s, d).sql("""
      SELECT c_nationkey,
             st_x(ctr) AS cx, st_y(ctr) AS cy
      FROM (SELECT c_nationkey,
                   st_centroid_aggr(st_point(CAST(c_custkey % 97 AS DOUBLE), CAST(c_custkey % 89 AS DOUBLE))) AS ctr
            FROM customer GROUP BY c_nationkey)
      ORDER BY c_nationkey""")),

    "st_union_aggr_points" -> ((s, d) => prep(s, d).sql("""
      SELECT c_nationkey, st_numgeometries(st_union_aggr(pt)) AS n_distinct
      FROM (SELECT c_nationkey, st_point(CAST(c_custkey % 50 AS DOUBLE), CAST(c_nationkey AS DOUBLE)) AS pt
            FROM customer)
      GROUP BY c_nationkey ORDER BY c_nationkey""")),

    "st_collect_points" -> ((s, d) => prep(s, d).sql("""
      SELECT c_nationkey,
             st_numgeometries(st_collect(pt)) AS n_all,
             st_geometrytype(st_collect(pt)) AS gt
      FROM (SELECT c_nationkey, st_point(c_acctbal, CAST(c_custkey AS DOUBLE)) AS pt FROM customer)
      GROUP BY c_nationkey ORDER BY c_nationkey""")),

    // ----- spatial joins (§2.7) -----
    "spatial_tile_join" -> ((s, d) => {
      prep(s, d); import GraftFunctions._
      val env = s.table("nation").select(col("n_nationkey"),
        st_polygonFromEnvelope(col("n_nationkey") * 400.0 + 0.005, lit(-0.5),
          col("n_nationkey") * 400.0 + 800.005, lit(24.5)).as("env"))
      val pts = s.table("customer").select(col("c_custkey"),
        st_point(col("c_acctbal"), col("c_nationkey").cast("double")).as("pt"))
      graft.plans.SpatialJoin.tileJoin(env, col("env"), pts, col("pt"), "contains", cellSize = 500.0)
        .groupBy("n_nationkey").agg(count(lit(1)).as("n")).orderBy("n_nationkey")
    }),

    // The JoinQueryDetector-analog optimizer rule END-TO-END: a pure
    // spatial inner join written as plain SQL (which Spark alone would
    // execute as a BroadcastNestedLoopJoin) must be rewritten by
    // SpatialJoinRewrite into the tile join — injected here through
    // experimental.extraOptimizations so the driver's vanilla session
    // exercises the same rule GraftExtensions installs; the in-query
    // require proves it fired (no BNLJ/cartesian in the executed plan),
    // and the oracle pins the rewritten join's results.
    "spatial_rewrite_join" -> ((s, d) => {
      prep(s, d)
      // Inject the rule + cellSize ONLY for this query's plan, restoring
      // both afterwards: the require below forces executedPlan (memoized
      // on the returned frame's QueryExecution), so later consumption of
      // `out` keeps the rewritten plan while every OTHER query in the
      // session plans under pristine state — no order-dependent plans.
      val prevRules = s.experimental.extraOptimizations
      val cellKey = "spark.graft.join.cellSize"
      val prevCell = s.conf.getOption(cellKey)
      if (!prevRules.exists(_.isInstanceOf[graft.plans.SpatialJoinRewrite]))
        s.experimental.extraOptimizations =
          prevRules :+ graft.plans.SpatialJoinRewrite(s)
      s.conf.set(cellKey, "500.0")
      try {
        val out = s.sql("""
          SELECT n_nationkey, COUNT(*) AS n
          FROM nation JOIN customer
            ON st_contains(st_polygonfromenvelope(n_nationkey * 400.0D + 0.005D, -0.5D,
                                                  n_nationkey * 400.0D + 800.005D, 24.5D),
                           st_point(CAST(c_acctbal AS DOUBLE), CAST(c_nationkey AS DOUBLE)))
          GROUP BY n_nationkey ORDER BY n_nationkey""")
        val plan = out.queryExecution.executedPlan.toString
        require(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
          s"SpatialJoinRewrite did not fire:\n$plan")
        // materialize the REWRITTEN plan before the finally restores the
        // session: a later .count()/.write on the returned frame builds a
        // fresh QueryExecution from the logical plan, which would re-plan
        // without the rule — checkpointing pins what actually executed
        out.localCheckpoint()
      } finally {
        s.experimental.extraOptimizations = prevRules
        prevCell match {
          case Some(v) => s.conf.set(cellKey, v)
          case None => s.conf.unset(cellKey)
        }
      }
    }),

    "spatial_bcast_join" -> ((s, d) => {
      prep(s, d); import GraftFunctions._
      val env = s.table("nation").select(col("n_nationkey"),
        st_polygonFromEnvelope(col("n_nationkey") * 400.0 + 0.005, lit(-0.5),
          col("n_nationkey") * 400.0 + 600.005, lit(24.5)).as("env"))
      val pts = s.table("customer").select(col("c_custkey"),
        st_point(col("c_acctbal"), col("c_nationkey").cast("double")).as("pt"))
      graft.plans.SpatialJoin.broadcastTileJoin(pts, col("pt"), env, col("env"), "within", cellSize = 500.0)
        .groupBy("n_nationkey").agg(count(lit(1)).as("n")).orderBy("n_nationkey")
    }),

    "spatial_dwithin_join" -> ((s, d) => {
      prep(s, d); import GraftFunctions._
      val ctr = s.table("nation").select(col("n_nationkey"),
        st_point(col("n_nationkey") * 400.0, lit(12.0)).as("ctr"))
      val pts = s.table("customer").select(col("c_custkey"),
        st_point(col("c_acctbal"), col("c_nationkey").cast("double")).as("pt"))
      graft.plans.SpatialJoin.distanceJoin(pts, col("pt"), ctr, col("ctr"), dist = 300.0, cellSize = 250.0)
        .groupBy("n_nationkey").agg(count(lit(1)).as("n")).orderBy("n_nationkey")
    }),

    "spatial_knn_join" -> ((s, d) => {
      prep(s, d); import GraftFunctions._
      val ctr = s.table("nation").select(col("n_nationkey"),
        st_point(col("n_nationkey") * 400.0, lit(12.0)).as("ctr"))
      val pts = s.table("customer").select(col("c_custkey"),
        st_point(col("c_acctbal"), col("c_nationkey").cast("double")).as("pt"))
      graft.plans.SpatialJoin.knnJoin(pts, col("pt"), col("c_custkey"), ctr, col("ctr"),
          col("n_nationkey"), k = 3)
        .select(col("c_custkey"), col("n_nationkey"), col("knn_rank"))
        .orderBy(col("c_custkey"), col("knn_rank"))
    }),

    // the PARTITIONED (big-big) KNN join: same query, same oracle as
    // spatial_knn_join, but the neighborhoods come from eps-cell bucketed
    // equi-joins + bounded top-k aggregation — no side is ever broadcast
    // whole (graft.plans.KnnGridJoin; the 100 TB path for KNN and LOF)
    "spatial_knn_grid_join" -> ((s, d) => {
      prep(s, d); import GraftFunctions._
      val ctr = s.table("nation").select(col("n_nationkey"),
        st_point(col("n_nationkey") * 400.0, lit(12.0)).as("ctr"))
      val pts = s.table("customer").select(col("c_custkey"),
        st_point(col("c_acctbal"), col("c_nationkey").cast("double")).as("pt"))
      // left x right is ~375k here, so the operator's pre-ladder bound
      // routes this to the single bounded-product pass (the same decision
      // its in-loop early exit makes, taken before paying for round 1);
      // the full ring ladder stays driver-exercised by spatial_lof_grid's
      // 15000^2 self-join. Session shuffle width + AQE coalescing handle
      // task sizing — no hand-pinned width (r13 lesson: 8 long tasks were
      // maximally exposed to ambient core contention in the driver bench).
      graft.plans.KnnGridJoin.knnJoinPoints(pts, col("pt"), col("c_custkey"), ctr, col("ctr"),
          col("n_nationkey"), k = 3, cellSize = 500.0)
        .select(col("c_custkey"), col("n_nationkey"), col("knn_rank"))
        .orderBy(col("c_custkey"), col("knn_rank"))
    }),

    // ----- transformations (§2.5) -----
    // JTS point-buffer (quadrantSegments=8) is a regular 32-gon: area has
    // the closed form 16 r^2 sin(pi/16) (CrsSpec proves it to 1e-9), so
    // rounding to 4dp gives a robust DuckDB oracle.
    "st_buffer_area" -> ((s, d) => prep(s, d).sql("""
      SELECT p_partkey,
             ROUND(st_area(st_buffer(st_point(CAST(p_size AS DOUBLE), 0.0D),
                                     CAST(p_size % 5 + 1 AS DOUBLE))), 4) AS a
      FROM part ORDER BY p_partkey""")),

    // linear referencing + affine + distance metrics on 3-4-5 lines: every
    // value is exact in IEEE doubles (perfect-square sqrt, power-of-2
    // fractions), so the DuckDB oracle is plain arithmetic
    "st_line_ref" -> ((s, d) => prep(s, d).sql("""
      WITH t AS (SELECT p_partkey,
                        st_geomfromtext(CONCAT('LINESTRING (0 0, ', p_size * 4, ' ', p_size * 3, ')')) AS ln,
                        CAST(p_size AS DOUBLE) AS sz
                 FROM part)
      SELECT p_partkey,
             st_x(st_lineinterpolatepoint(ln, 0.25D)) AS qx,
             st_y(st_lineinterpolatepoint(ln, 0.25D)) AS qy,
             st_length(st_linesubstring(ln, 0.25D, 0.75D)) AS sublen,
             st_linelocatepoint(ln, st_point(sz * 2, sz * 1.5D)) AS locmid,
             st_x(st_scale(st_point(sz, sz + 1), 2.0D, 4.0D)) AS sx,
             st_hausdorffdistance(st_point(0.0D, 0.0D), st_point(sz * 3, sz * 4)) AS hd,
             st_length(st_boundingdiagonal(st_makeenvelope(0.0D, 0.0D, sz * 3, sz * 4))) AS diag
      FROM t ORDER BY p_partkey""")),

    // tier-3 functions with closed-form values: envelope gap (shortest
    // line), corner distance (max distance), exact 3-4-5 segmentize counts,
    // DE-9IM matrices by position, and Z round-trips — all IEEE-exact
    // arithmetic so the DuckDB oracle reproduces every double bit-for-bit
    "st_tier3_measures" -> ((s, d) => prep(s, d).sql("""
      WITH t AS (SELECT p_partkey, p_size, CAST(p_size AS DOUBLE) AS sz FROM part)
      SELECT p_partkey,
             st_length(st_shortestline(st_makeenvelope(0.0D, 0.0D, 1.0D, 1.0D),
                                       st_makeenvelope(sz + 1, 0.0D, sz + 2, 1.0D))) AS short_len,
             st_maxdistance(st_makeenvelope(0.0D, 0.0D, 1.0D, 1.0D),
                            st_makeenvelope(sz + 1, 0.0D, sz + 2, 1.0D)) AS maxd,
             st_npoints(st_segmentize(
               st_geomfromtext(CONCAT('LINESTRING (0 0, ', p_size * 4, ' ', p_size * 3, ')')),
               5.0D)) AS segn,
             st_z(st_makepointz(1.0D, 2.0D, sz)) AS zz,
             st_3ddistance(st_makepointz(0.0D, 0.0D, 0.0D),
                           st_makepointz(sz * 3, sz * 4, 0.0D)) AS d3,
             st_relate(st_point(sz, 0.5D), st_makeenvelope(0.0D, 0.0D, 25.0D, 1.0D)) AS de9im
      FROM t ORDER BY p_partkey""")),

    // closed-form web-mercator reprojection; strictly positive lon/lat so
    // no value rounds to +/-0 differently across engines
    "st_transform_mercator" -> ((s, d) => prep(s, d).sql("""
      WITH t AS (SELECT c_custkey,
                        st_point(CAST(c_nationkey * 7 + 3 AS DOUBLE),
                                 CAST(c_custkey % 50 + 5 AS DOUBLE)) AS pt
                 FROM customer)
      SELECT c_custkey,
             ROUND(st_x(st_transform(pt, 'EPSG:4326', 'EPSG:3857')), 1) AS mx,
             ROUND(st_y(st_transform(pt, 'EPSG:4326', 'EPSG:3857')), 1) AS my
      FROM t ORDER BY c_custkey""")),

    // Lambert-93 (EPSG:2154) reprojection over France-range lon/lat.
    // Oracle replays the Snyder LCC-2SP forward chain (m/t constants, n, F,
    // rho) in DuckDB SQL; mm rounding absorbs libm 1-ulp drift — same
    // convention as st_transform_mercator.
    "st_transform_lcc" -> ((s, d) => prep(s, d).sql("""
      WITH t AS (SELECT c_custkey,
                        st_point(CAST(c_custkey % 12 AS DOUBLE) - 4.0D + 0.5D,
                                 CAST(c_nationkey % 10 AS DOUBLE) + 42.0D + 0.25D) AS pt
                 FROM customer)
      SELECT c_custkey,
             ROUND(st_x(st_transform(pt, 'EPSG:4326', 'EPSG:2154')), 3) AS lx,
             ROUND(st_y(st_transform(pt, 'EPSG:4326', 'EPSG:2154')), 3) AS ly
      FROM t ORDER BY c_custkey""")),

    // Planar hex-grid binning (st_hexcell): per-cell point counts. The
    // whole cell computation is IEEE +,-,*,/,sqrt,floor,abs — no libm
    // transcendentals — so the DuckDB replay of the axial + cube-round
    // chain is bit-exact and the INTEGER (q, r) output needs no rounding.
    "hex_cell_counts" -> ((s, d) => prep(s, d).sql("""
      WITH pts AS (SELECT st_point(CAST(c_custkey % 97 AS DOUBLE) * CAST(0.37 AS DOUBLE),
                                   CAST(c_nationkey AS DOUBLE) * CAST(1.91 AS DOUBLE)
                                     - CAST(20.0 AS DOUBLE)) AS pt
                   FROM customer),
           cells AS (SELECT st_hexcell(pt, CAST(3.0 AS DOUBLE)) AS cell FROM pts)
      SELECT CAST(shiftright(cell, 32) AS INT) AS q,
             CAST(shiftright(shiftleft(cell, 32), 32) AS INT) AS r,
             count(*) AS n
      FROM cells GROUP BY 1, 2 ORDER BY q, r""")),

    // DBSCAN over synthetic integer-coordinate blobs (25-30 points each,
    // spacing 30 >> eps 2), a sparse noise arm (custkey % 11) and a
    // borderline "tail" position whose core-ness varies by blob
    // population — neighbor counts, core flags and min-id cluster labels
    // are all exact integer arithmetic, replayed by a recursive-CTE
    // transitive closure in DuckDB
    "spatial_dbscan" -> ((s, d) => {
      prep(s, d)
      val pts = s.sql("""
        SELECT c_custkey AS id,
               st_point(
                 CAST(CASE WHEN c_custkey % 11 = 0 THEN 500 + (c_custkey % 89) * 7
                           ELSE ((c_custkey % 50) % 10) * 30 +
                                (CASE WHEN c_custkey % 17 = 0 THEN 4 ELSE c_custkey % 3 END)
                      END AS DOUBLE),
                 CAST(CASE WHEN c_custkey % 11 = 0 THEN 500 + (c_custkey % 97) * 7
                           ELSE ((c_custkey % 50) DIV 10) * 30 +
                                (CASE WHEN c_custkey % 17 = 0 THEN 1 ELSE (c_custkey DIV 3) % 3 END)
                      END AS DOUBLE)) AS geo
        FROM customer""")
      graft.ops.SpatialCluster.dbscanPoints(pts, "id", "geo", eps = 2.0, minPts = 5)
        .orderBy("id")
    }),

    // C4/CCNet-style line-level boilerplate dedup: footers seeded in-flow
    // (corpus is synthetic) recur across >= minDocs docs and are removed
    // from every document; the 'short' line recurs but stays under the
    // length floor. Pure string ops — the oracle replays the rule exactly.
    "dedup_boilerplate_lines" -> ((s, d) => {
      prep(s, d)
      val seeded = s.sql("""
        SELECT doc_id,
               CONCAT(text,
                 CASE WHEN doc_id % 2 = 0
                      THEN CONCAT(CHR(10), 'Follow us on example.social for updates!') ELSE '' END,
                 CASE WHEN doc_id % 3 = 0
                      THEN CONCAT(CHR(10), 'Copyright 2024 Example Corp. All rights reserved.') ELSE '' END,
                 CASE WHEN doc_id % 7 = 0 THEN CONCAT(CHR(10), 'short') ELSE '' END) AS text
        FROM documents""")
      graft.ops.Dedup.dropBoilerplateLines(seeded, col("doc_id"), col("text"), minDocs = 50)
        .select(col("doc_id"), md5(col("clean_text")).as("clean_md5"),
          col("n_kept"), col("n_removed"))
        .orderBy("doc_id")
    }),

    // ExactSubstr-style duplicated-SPAN detection (within-document
    // granularity doc-level near-dup misses): 50-char windows sampled
    // every 10 chars; windows whose exact text recurs across >= 2 docs
    // flag a span. Per-doc rollup (flagged window count + first flagged
    // offset) — a stride drift, off-by-one window, or hash-collision
    // false positive changes counts or offsets. Pure string algebra, so
    // DuckDB replays the whole rule.
    "dedup_exact_substr" -> ((s, d) => {
      prep(s, d)
      graft.ops.Dedup.exactSubstrWindows(s.table("documents"),
          col("doc_id"), col("text"), window = 50, stride = 10, minDocs = 2)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_dup_windows"),
          min("pos").cast("bigint").as("first_pos"))
        .orderBy("doc_id")
    }),

    // Iceberg-style SQL time travel through the DSv2 catalog: two inserts
    // produce snapshots 1 and 2; VERSION AS OF must see exactly the rows
    // committed at each version (counts + key sums, replayed from the
    // same customer predicates in DuckDB)
    "geo_time_travel" -> ((s, d) => {
      prep(s, d)
      // Spark caches the catalog INSTANCE at first resolution — the
      // warehouse conf must be set once and reused, and the query made
      // idempotent (bench invokes it repeatedly on one session)
      ensureGeoCatalog(s, "geott", "geo_tt_wh")
      s.sql("CREATE NAMESPACE IF NOT EXISTS geott.db")
      s.sql("DROP TABLE IF EXISTS geott.db.tt")
      s.sql("CREATE TABLE geott.db.tt (id BIGINT, g BINARY) USING geo " +
        "TBLPROPERTIES('geometry.column'='g')")
      s.sql("""INSERT INTO geott.db.tt
               SELECT c_custkey, st_point(CAST(c_custkey % 100 AS DOUBLE), 0.0D)
               FROM customer WHERE c_custkey % 3 = 0""")
      s.sql("""INSERT INTO geott.db.tt
               SELECT c_custkey, st_point(CAST(c_custkey % 100 AS DOUBLE), 1.0D)
               FROM customer WHERE c_custkey % 3 = 1""")
      // timestamp leg: resolve v1/v2 again through TIMESTAMP AS OF using
      // the commit timestamps the manifests carry (format v3 `ts` line,
      // surfaced by the snapshots metadata table) — rows 101/102 must
      // reproduce rows 1/2 exactly
      val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
        .withZone(java.time.ZoneId.systemDefault())
      val Seq(ts1, ts2) = s.sql(
          "SELECT committed_at FROM geott.db.tt.snapshots WHERE version IN (1, 2) ORDER BY version")
        .collect().toSeq.map(r => fmt.format(r.getTimestamp(0).toInstant))
      // each snapshot is ONE aggregate pass (count + sum inside a single
      // struct-valued scalar subquery) — the original spelling ran TWO
      // scalar subqueries per snapshot, i.e. two full scans of every
      // snapshot. Keeping the legs as scalar subqueries (rather than a
      // plain union of aggregates) preserves Spark's concurrent driver-
      // thread execution of independent subqueries, so locally the five
      // snapshot scans still overlap; identical output rows.
      def leg(label: String, asOf: String) =
        s"""SELECT $label AS version, s.n AS n_rows, s.k AS key_sum FROM
           (SELECT (SELECT named_struct('n', COUNT(*), 'k', COALESCE(SUM(id), 0L))
                    FROM geott.db.tt $asOf) AS s)"""
      s.sql(Seq(
          leg("0", "VERSION AS OF 0"),
          leg("1", "VERSION AS OF 1"),
          leg("2", "VERSION AS OF 2"),
          leg("101", s"TIMESTAMP AS OF '$ts1'"),
          leg("102", s"TIMESTAMP AS OF '$ts2'"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY version"))
    }),

    // Incremental read of a geo table (Iceberg incremental-scan analog):
    // two appends then a native CoW DELETE; the insert leg reads the SQL
    // `changes` metadata table (file-granular changelog == net for pure
    // appends), the delete leg reads netChanges so the rewrite's
    // surviving rows cancel and exactly the deleted rows remain. DuckDB
    // replays both legs from the insert/delete predicates.
    "geo_changelog" -> ((s, d) => {
      prep(s, d)
      ensureGeoCatalog(s, "geocl", "geo_cl_wh")
      s.sql("CREATE NAMESPACE IF NOT EXISTS geocl.db")
      s.sql("DROP TABLE IF EXISTS geocl.db.cl")
      s.sql("CREATE TABLE geocl.db.cl (id BIGINT, nat BIGINT, g BINARY) USING geo " +
        "TBLPROPERTIES('geometry.column'='g')")
      s.sql("""INSERT INTO geocl.db.cl
               SELECT c_custkey, c_nationkey, st_point(CAST(c_custkey % 100 AS DOUBLE), 0.0D)
               FROM customer WHERE c_custkey % 3 = 0""")                     // v1
      s.sql("""INSERT INTO geocl.db.cl
               SELECT c_custkey, c_nationkey, st_point(CAST(c_custkey % 100 AS DOUBLE), 1.0D)
               FROM customer WHERE c_custkey % 3 = 1""")                     // v2
      s.sql("DELETE FROM geocl.db.cl WHERE id % 7 = 0")                      // v3 (CoW rewrite)
      val root = s.conf.get("spark.sql.catalog.geocl.warehouse") + "/db/cl"
      val inserts = s.read.option("to-version", 2).table("geocl.db.cl.changes")
        .select(lit(2).as("phase"), col("_change_type").as("change_type"),
          col("id"), col("nat"))
      val deletes = graft.tables.GeoTable.netChanges(s, root, 2, 3)
        .select(lit(3).as("phase"), col("_change_type").as("change_type"),
          col("id"), col("nat"))
      inserts.unionByName(deletes).orderBy("phase", "id")
    }),

    // Path-table streaming ingest (foreachBatch sink, the pre-DSv2 leg):
    // customers stream in two micro-batches through geoTableSink's
    // per-epoch atomic commits with the in-manifest batch watermark; the
    // oracle aggregates the source directly — a dropped or duplicated
    // epoch changes the hash (same exactly-once contract as the native
    // DSv2 sink, exercised on the PATH-table commit path).
    "geo_stream_sink_path" -> ((s, d) => {
      prep(s, d)
      val base = java.nio.file.Files.createTempDirectory("geo_skp").toString
      val root = base + "/t"
      val srcDir = base + "/files"
      // two micro-batches: the minimum that still proves the per-epoch
      // watermark discipline (a dropped or doubled epoch changes the hash)
      s.table("customer")
        .select(col("c_custkey").as("id"), col("c_nationkey").cast("long").as("nat"))
        .withColumn("b", col("id") % 2).repartition(2, col("b")).drop("b")
        .write.parquet(srcDir)
      val schema = s.read.parquet(srcDir).schema
      graft.tables.GeoTable.create(s, root,
        s.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema))
      val stream = s.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(srcDir)
      val q = graft.streaming.EventStreams.geoTableSink(stream, root,
        base + "/ck").start()
      q.processAllAvailable(); q.stop()
      graft.tables.GeoTable.read(s, root)
        .groupBy("nat")
        .agg(count(lit(1)).as("n_rows"), sum("id").cast("bigint").as("sum_id"))
        .orderBy("nat")
    }),

    // Streaming CDC ingest (keyed upsert sink): micro-batches of mixed
    // upserts and flagged deletes apply as ONE atomic commit each
    // (equality-delete keys + appended rows + batchId watermark in the
    // same manifest commit — cdcByKey). The two batches carry DISJOINT
    // key sets, so the final state is batch-order independent and the
    // oracle is pure set algebra; a dropped/doubled epoch, a delete that
    // resurrected, or an upsert that duplicated all change the hash.
    "geo_stream_upsert_sink" -> ((s, d) => {
      prep(s, d)
      val base = java.nio.file.Files.createTempDirectory("geo_cdc_sk").toString
      val root = base + "/t"
      val srcDir = base + "/files"
      // batch 1: the rows that stay untouched; batch 2: a CDC burst —
      // every %9 id carries TWO changes (seq 1: nat=-5, then seq 2:
      // nat=-1) and every %15 id an update-then-delete (seq 1: upsert,
      // seq 2: delete) — all within the %3 subset. Sequence netting must
      // keep only each key's LAST change or the hash moves.
      // one customer scan feeds both batch files (5 projections of it)
      s.sql("SELECT c_custkey AS id, CAST(c_nationkey AS BIGINT) AS nat FROM customer " +
        "WHERE c_custkey % 3 = 0").localCheckpoint()
        .createOrReplaceTempView("cdc_src3")
      s.sql("SELECT id, nat, false AS del, 0L AS seq FROM cdc_src3 " +
        "WHERE id % 9 <> 0 AND id % 15 <> 0")
        .coalesce(1).write.parquet(srcDir)
      s.sql("SELECT id, CAST(-5 AS BIGINT) AS nat, false AS del, 1L AS seq " +
        "FROM cdc_src3 WHERE id % 9 = 0 AND id % 15 <> 0 " +
        "UNION ALL SELECT id, CAST(-1 AS BIGINT), false, 2L " +
        "FROM cdc_src3 WHERE id % 9 = 0 AND id % 15 <> 0 " +
        "UNION ALL SELECT id, CAST(99 AS BIGINT), false, 1L " +
        "FROM cdc_src3 WHERE id % 15 = 0 " +
        "UNION ALL SELECT id, CAST(0 AS BIGINT), true, 2L " +
        "FROM cdc_src3 WHERE id % 15 = 0")
        .coalesce(1).write.mode("append").parquet(srcDir)
      val schema = s.read.parquet(srcDir).schema
      graft.tables.GeoTable.createEmpty(s, root,
        graft.tables.GeoSchema.fromDdl("id BIGINT, nat BIGINT"), None)
      val stream = s.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(srcDir)
      val q = graft.streaming.EventStreams.geoTableUpsertSink(
        stream, root, Seq("id"), base + "/ck", deleteFlagCol = Some("del"),
        sequenceCol = Some("seq")).start()
      q.processAllAvailable(); q.stop()
      graft.tables.GeoTable.read(s, root)
        .groupBy("nat")
        .agg(count(lit(1)).as("n_rows"), sum("id").cast("bigint").as("sum_id"))
        .orderBy("nat")
    }),

    // Onboarding WITHOUT rewrite (Iceberg migrate/add_files analog):
    // existing parquet registers by reference — importParquet creates
    // the table over one dir, addFiles appends a second, both via one
    // stats pass each and zero data movement. Phase 2's range predicate
    // must still answer from the imported layout's natural clustering
    // (auto stats transforms), so a mis-registered, double-counted, or
    // mis-pruned file changes the hash.
    "geo_import_parquet" -> ((s, d) => {
      prep(s, d)
      val base = java.nio.file.Files.createTempDirectory("geo_imp").toString
      s.sql("SELECT c_custkey AS id, CAST(c_nationkey AS BIGINT) AS nat FROM customer " +
        "WHERE c_custkey % 2 = 0")
        .repartitionByRange(4, col("id")).write.parquet(s"$base/a")
      s.sql("SELECT c_custkey AS id, CAST(c_nationkey AS BIGINT) AS nat FROM customer " +
        "WHERE c_custkey % 2 = 1")
        .repartitionByRange(2, col("id")).write.parquet(s"$base/b")
      graft.tables.GeoTable.importParquet(s, s"$base/t", s"$base/a")
      graft.tables.GeoTable.addFiles(s, s"$base/t",
        s.read.parquet(s"$base/b").inputFiles.toSeq)
      graft.tables.GeoTable.read(s, s"$base/t")
        .groupBy(lit(1).as("phase"))
        .agg(count(lit(1)).as("n_rows"), sum("id").cast("bigint").as("sum_id"))
        .unionAll(graft.tables.GeoTable.scan(s, s"$base/t", col("id") < 500)
          .groupBy(lit(2).as("phase"))
          .agg(count(lit(1)).as("n_rows"), sum("id").cast("bigint").as("sum_id")))
        .orderBy("phase")
    }),

    // INSERT OVERWRITE on a catalog table (DSv2 SupportsTruncate): the
    // overwrite atomically replaces the evens with the odds in ONE
    // versioned commit — require'd in-query: the pre-overwrite snapshot
    // still time-travels (an overwrite must version, not destroy). The
    // oracle replays the final state as set algebra.
    "geo_insert_overwrite" -> ((s, d) => {
      prep(s, d)
      ensureGeoCatalog(s, "geoiow", "geo_iow_wh")
      s.sql("CREATE NAMESPACE IF NOT EXISTS geoiow.db")
      s.sql("DROP TABLE IF EXISTS geoiow.db.ow")
      s.sql("CREATE TABLE geoiow.db.ow (k BIGINT, nat BIGINT) USING geo")
      s.sql("INSERT INTO geoiow.db.ow " +
        "SELECT c_custkey, c_nationkey FROM customer WHERE c_custkey % 2 = 0")
      s.sql("INSERT OVERWRITE geoiow.db.ow " +
        "SELECT c_custkey, c_nationkey FROM customer WHERE c_custkey % 2 = 1")
      s.sql("INSERT INTO geoiow.db.ow " +
        "SELECT c_custkey + 1000000, 99 FROM customer WHERE c_custkey <= 10")
      val root = s.conf.get("spark.sql.catalog.geoiow.warehouse") + "/db/ow"
      val v1 = graft.tables.GeoTable.readAt(s, root, 1).count()
      val evens = s.table("customer").where("c_custkey % 2 = 0").count()
      require(v1 == evens,
        s"pre-overwrite snapshot must still time-travel: v1 has $v1 rows, expected $evens")
      s.sql("SELECT nat, COUNT(*) AS n_rows, CAST(SUM(k) AS BIGINT) AS sum_k " +
        "FROM geoiow.db.ow GROUP BY nat ORDER BY nat")
    }),

    // By-reference onboarding through BOTH public spellings — the SQL verb
    // (ALTER TABLE t ADD FILES 'p', ...) and the Iceberg-parity CALL
    // procedure (add_files(table, files)) — onto one catalog table.
    // require'd in-query: the manifest references the SOURCE files by
    // path (zero copy). The union of both dirs is two thirds of customer.
    "geo_add_files_sql" -> ((s, d) => {
      prep(s, d)
      ensureGeoCatalog(s, "geoafs", "geo_afs_wh")
      s.sql("CREATE NAMESPACE IF NOT EXISTS geoafs.db")
      s.sql("DROP TABLE IF EXISTS geoafs.db.af")
      s.sql("CREATE TABLE geoafs.db.af (id BIGINT, nat BIGINT) USING geo")
      val base = java.nio.file.Files.createTempDirectory("geo_afs_src").toString
      s.sql("SELECT CAST(c_custkey AS BIGINT) AS id, CAST(c_nationkey AS BIGINT) AS nat " +
        "FROM customer WHERE c_custkey % 3 = 0").write.parquet(s"$base/a")
      s.sql("SELECT CAST(c_custkey AS BIGINT) AS id, CAST(c_nationkey AS BIGINT) AS nat " +
        "FROM customer WHERE c_custkey % 3 = 1").write.parquet(s"$base/b")
      val aFiles = s.read.parquet(s"$base/a").inputFiles.toSeq
      val bFiles = s.read.parquet(s"$base/b").inputFiles.toSeq
      graft.tables.GeoSql.exec(s,
        s"ALTER TABLE geoafs.db.af ADD FILES ${aFiles.map(f => s"'$f'").mkString(", ")}")
      s.sql(s"CALL geoafs.system.add_files(table => 'db.af', files => '${bFiles.mkString(",")}')")
      val root = s.conf.get("spark.sql.catalog.geoafs.warehouse") + "/db/af"
      val refd = graft.tables.GeoManifest.read(s, root).files
        .map(_.path.stripPrefix("file:")).toSet
      require(refd == (aFiles ++ bFiles).map(_.stripPrefix("file:")).toSet,
        "ADD FILES must reference the source files by path (zero copy)")
      s.sql("SELECT nat, COUNT(*) AS n_rows, CAST(SUM(id) AS BIGINT) AS sum_id " +
        "FROM geoafs.db.af GROUP BY nat ORDER BY nat")
    }),

    // Exact IN-value-set file pruning (the truncate-transform leg): every
    // probe key lands in the first 50-wide truncate partition, so the scan
    // must answer from ONE file however many the table holds — require'd
    // in-query. The oracle replays the IN filter over raw customer.
    "geo_in_prune" -> ((s, d) => {
      prep(s, d)
      ensureGeoCatalog(s, "geoinp", "geo_inp_wh")
      s.sql("CREATE NAMESPACE IF NOT EXISTS geoinp.db")
      s.sql("DROP TABLE IF EXISTS geoinp.db.ip")
      s.sql("CREATE TABLE geoinp.db.ip (k BIGINT, nat BIGINT) USING geo " +
        "PARTITIONED BY (truncate(50, k))")
      s.sql("INSERT INTO geoinp.db.ip SELECT c_custkey, c_nationkey FROM customer")
      val q = s.sql("SELECT k, nat FROM geoinp.db.ip WHERE k IN (3, 5, 17, 23, 41) ORDER BY k")
      val root = s.conf.get("spark.sql.catalog.geoinp.warehouse") + "/db/ip"
      val total = graft.tables.GeoManifest.read(s, root).files.count(_.rows > 0)
      val scans = graft.tables.GeoCowScan.collectIn(q.queryExecution.executedPlan)
      require(scans.nonEmpty, "no GeoCowScan in the executed plan")
      val scanned = scans.map(_.scannedFiles.count(_.rows > 0)).min
      require(total > 1 && scanned == 1,
        s"IN set within one truncate bucket must scan exactly 1 file: $scanned of $total")
      q
    }),

    // GeoBboxPushdown under the driver's own gate: the ST_Intersects range
    // query answers ONLY through derived bbox conjuncts that must reach
    // the parquet scan as data filters — require'd in-query against the
    // FileSourceScanExec (not a plan-string heuristic). The oracle replays
    // the envelope test as plain coordinate arithmetic.
    "geo_bbox_pushdown" -> ((s, d) => {
      prep(s, d)
      import graft.functions.GraftFunctions._
      val dir = java.nio.file.Files.createTempDirectory("geo_bpd").toString + "/pts"
      val pts = s.table("customer").select(col("c_custkey"),
        st_point(col("c_acctbal"), col("c_nationkey").cast("double")).as("geo"))
      graft.plans.GeoParquet.write(pts, "geo", dir, cellSize = 500.0)
      val q = graft.plans.GeoParquet.read(s, dir)
        .where(st_intersects(
          st_polygonFromEnvelope(lit(0.0), lit(2.5), lit(3000.0), lit(17.5)), col("geo")))
        .select(col("c_custkey").cast("bigint").as("id"))
      val pushed = q.queryExecution.executedPlan.collectLeaves().collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f.dataFilters.map(_.sql)
      }.flatten
      require(pushed.exists(_.contains("geo_xmin")) && pushed.exists(_.contains("geo_ymax")),
        s"bbox conjuncts did not reach the parquet scan: $pushed")
      q.orderBy("id")
    }),

    // Column-stats data skipping (Iceberg column-stats analog): an
    // UNPARTITIONED table records per-file min/max for eligible columns
    // automatically; three disjoint-range appends then range/equality
    // filters that the scan answers from a file subset. The oracle
    // replays the predicates — a skipped file that held matches, or a
    // mis-kept stats range, changes the hash.
    "geo_colstats" -> ((s, d) => {
      prep(s, d)
      ensureGeoCatalog(s, "geocs", "geo_cs_wh")
      s.sql("CREATE NAMESPACE IF NOT EXISTS geocs.db")
      s.sql("DROP TABLE IF EXISTS geocs.db.cs")
      s.sql("CREATE TABLE geocs.db.cs (id BIGINT, nat BIGINT) USING geo")
      // three commits over disjoint key thirds: tight per-file ranges
      (0 until 3).foreach { i =>
        s.sql(s"INSERT INTO geocs.db.cs SELECT c_custkey, c_nationkey FROM customer " +
          s"WHERE c_custkey % 3 = $i")
      }
      s.sql("""
        SELECT 1 AS phase, COUNT(*) AS n_rows, CAST(SUM(id) AS BIGINT) AS sum_id
        FROM geocs.db.cs WHERE id >= 100 AND id < 2000
        UNION ALL
        SELECT 2, COUNT(*), CAST(SUM(id) AS BIGINT) FROM geocs.db.cs WHERE nat = 7
        ORDER BY phase""")
    }),

    // t.colstats metadata table as literals (Iceberg table-stats surface):
    // ANALYZE ... FOR ALL COLUMNS records ndv / null_count / min / max in
    // the manifest; the metadata table replays them with zero data I/O.
    // null_count/min/max are exact aggregates -> DuckDB replays them
    // bit-for-bit. ndv is an HLL++ ESTIMATE (approx_count_distinct) whose
    // value at any cardinality can sit one register collision off the
    // exact count — so it is gated IN-QUERY against the default 5% rsd
    // (with a +-1 floor) rather than hash-compared.
    "geo_colstats_meta" -> ((s, d) => {
      prep(s, d)
      ensureGeoCatalog(s, "geocsm", "geo_csm_wh")
      s.sql("CREATE NAMESPACE IF NOT EXISTS geocsm.db")
      s.sql("DROP TABLE IF EXISTS geocsm.db.cs")
      s.sql("CREATE TABLE geocsm.db.cs (nat BIGINT, flag BIGINT, v BIGINT) USING geo")
      s.sql("""INSERT INTO geocsm.db.cs
               SELECT CAST(c_nationkey AS BIGINT), c_custkey % 3,
                      CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_custkey % 5 END
               FROM customer""")
      graft.tables.GeoSql.exec(s,
        "ANALYZE TABLE geocsm.db.cs COMPUTE STATISTICS FOR ALL COLUMNS")
      val exact = s.sql("""SELECT COUNT(DISTINCT nat), COUNT(DISTINCT flag),
        COUNT(DISTINCT v) FROM geocsm.db.cs""").head
      val want = Map("nat" -> exact.getLong(0), "flag" -> exact.getLong(1),
        "v" -> exact.getLong(2))
      s.sql("SELECT column, ndv FROM geocsm.db.cs.colstats").collect().foreach { r =>
        val (c, ndv, ex) = (r.getString(0), r.getLong(1), want(r.getString(0)))
        require(math.abs(ndv - ex) <= math.max(1L, math.round(0.05 * ex)),
          s"recorded ndv for '$c' ($ndv) outside the 5% sketch envelope of $ex")
      }
      s.sql("SELECT column, null_count, min, max FROM geocsm.db.cs.colstats " +
        "ORDER BY column")
    }),

    // Age-based snapshot expiry through the Iceberg CALL signature
    // (expire_snapshots older_than): the cutoff is v2's OWN in-manifest
    // commit timestamp, so exactly the history strictly older than v2
    // expires — require'd in-query: v1 is unreadable afterwards, v2
    // still time-travels. The oracle replays both surviving states.
    "geo_expire_age" -> ((s, d) => {
      prep(s, d)
      ensureGeoCatalog(s, "geoexp", "geo_exp_wh")
      s.sql("CREATE NAMESPACE IF NOT EXISTS geoexp.db")
      s.sql("DROP TABLE IF EXISTS geoexp.db.ret")
      s.sql("CREATE TABLE geoexp.db.ret (k BIGINT, nat BIGINT) USING geo")
      (0 until 3).foreach { i =>
        s.sql("INSERT INTO geoexp.db.ret SELECT c_custkey, c_nationkey FROM customer " +
          s"WHERE c_custkey % 3 = $i")
        Thread.sleep(5) // age cutoffs need strictly ordered commit timestamps
      }
      val root = s.conf.get("spark.sql.catalog.geoexp.warehouse") + "/db/ret"
      val ts2 = graft.tables.GeoManifest.commitTsOf(s, root, 2)
      require(graft.tables.GeoManifest.commitTsOf(s, root, 1) < ts2,
        "commit timestamps must order strictly for an age-cutoff check")
      val cut = graft.tables.GeoSql.formatUtcMillis(ts2)
      s.sql(s"CALL geoexp.system.expire_snapshots(table => 'db.ret', older_than => '$cut')")
      require(scala.util.Try(
        s.sql("SELECT COUNT(*) FROM geoexp.db.ret VERSION AS OF 1").collect()).isFailure,
        "v1 must be expired by the age cutoff")
      s.sql("""
        SELECT 1 AS phase, COUNT(*) AS n_rows, CAST(SUM(k) AS BIGINT) AS sum_k
        FROM geoexp.db.ret
        UNION ALL
        SELECT 2, COUNT(*), CAST(SUM(k) AS BIGINT)
        FROM geoexp.db.ret VERSION AS OF 2
        ORDER BY phase""")
    }),

    // Write-audit-publish through branch refs (Iceberg branch +
    // fast_forward analog): stage odd customers on a branch — main reads
    // stay pinned to the evens — audit via VERSION AS OF 'branch', then
    // publish fast-forwards main. Each phase hash-checks a snapshot the
    // pointer discipline must have produced exactly.
    "geo_wap" -> ((s, d) => {
      prep(s, d)
      ensureGeoCatalog(s, "geowp", "geo_wp_wh")
      s.sql("CREATE NAMESPACE IF NOT EXISTS geowp.db")
      s.sql("DROP TABLE IF EXISTS geowp.db.wp")
      s.sql("CREATE TABLE geowp.db.wp (id BIGINT, nat BIGINT) USING geo")
      s.sql("INSERT INTO geowp.db.wp SELECT c_custkey, c_nationkey FROM customer WHERE c_custkey % 2 = 0") // v1
      graft.tables.GeoSql.exec(s, "ALTER TABLE geowp.db.wp CREATE BRANCH stage")
      // staging is pure SQL too: INSERT INTO the branch table (the
      // Iceberg t.branch_<name> spelling) — only the branch ref moves
      s.sql("INSERT INTO geowp.db.wp.branch_stage " +
        "SELECT c_custkey, c_nationkey FROM customer WHERE c_custkey % 2 = 1")
      val phase12 = s.sql("""
        SELECT 1 AS phase, COUNT(*) AS n_rows, CAST(SUM(id) AS BIGINT) AS sum_id
        FROM geowp.db.wp
        UNION ALL
        SELECT 2, COUNT(*), CAST(SUM(id) AS BIGINT) FROM geowp.db.wp VERSION AS OF 'stage'""")
      // publish through the Iceberg-procedure spelling — CALL maps 1:1
      // onto the PUBLISH BRANCH verb, so the phase hashes cannot move
      s.sql("CALL geowp.system.publish_changes(table => 'db.wp', branch => 'stage')")
      phase12.unionAll(s.sql(
        "SELECT 3, COUNT(*), CAST(SUM(id) AS BIGINT) FROM geowp.db.wp"))
        .orderBy("phase")
    }),

    // ADD COLUMN ... DEFAULT (Iceberg v3 initial-default analog): the
    // add is metadata-only, yet every PRE-EXISTING row reads the FOLDED
    // constant (40 + 2 -> 42) through the catalog scan (EXISTS_DEFAULT,
    // read side); an INSERT whose column list omits the column fills it
    // via Spark's own analyzer (CURRENT_DEFAULT, write side); explicit
    // values persist. The group-by replays all three populations — a
    // null-filled row on either side changes the hash.
    "geo_column_default" -> ((s, d) => {
      prep(s, d)
      ensureGeoCatalog(s, "geocd", "geo_cd_wh")
      s.sql("CREATE NAMESPACE IF NOT EXISTS geocd.db")
      s.sql("DROP TABLE IF EXISTS geocd.db.cd")
      s.sql("CREATE TABLE geocd.db.cd (id BIGINT, nat BIGINT) USING geo")
      s.sql("INSERT INTO geocd.db.cd SELECT c_custkey, c_nationkey FROM customer WHERE c_custkey % 3 = 0")
      graft.tables.GeoSql.exec(s,
        "ALTER TABLE geocd.db.cd ADD COLUMN tier BIGINT DEFAULT 40 + 2")
      s.sql("INSERT INTO geocd.db.cd SELECT c_custkey, c_nationkey, CAST(c_nationkey AS BIGINT) " +
        "FROM customer WHERE c_custkey % 3 = 1")
      // write-side default: the column list omits `tier`
      s.sql("INSERT INTO geocd.db.cd (id, nat) SELECT c_custkey, c_nationkey " +
        "FROM customer WHERE c_custkey % 3 = 2")
      // TWO columns in ONE ALTER (the multi-column front-end splitting
      // surface): every pre-ALTER row reads BOTH folded defaults; a
      // post-ALTER insert lands explicit values for both
      graft.tables.GeoSql.exec(s, "ALTER TABLE geocd.db.cd ADD COLUMNS " +
        "(src STRING DEFAULT 'web', qty BIGINT DEFAULT 5 + 2)")
      s.sql("INSERT INTO geocd.db.cd SELECT c_custkey + 1000000, c_nationkey, " +
        "CAST(c_nationkey AS BIGINT), 'app', 9L FROM customer WHERE c_custkey % 5 = 0")
      s.sql("""SELECT tier, src, qty, COUNT(*) AS n_rows, CAST(SUM(id) AS BIGINT) AS sum_id
               FROM geocd.db.cd GROUP BY tier, src, qty ORDER BY tier, src, qty""")
    }),

    // CALL rewrite_position_delete_files end-to-end: two MoR deletes mint
    // two position sidecars; a partition-scoped compaction retires one
    // sidecar's target files (its entries now DANGLE); the CALL then
    // consolidates to ONE sidecar holding only the live entries. Every
    // phase row is closed-form from the delete predicates (sidecar count,
    // summed sidecar rows, table count), so a dropped/kept-dangling entry
    // or a data-file rewrite changes the hash.
    "geo_rewrite_deletes" -> ((s, d) => {
      prep(s, d)
      ensureGeoCatalog(s, "geord", "geo_rd_wh")
      s.sql("CREATE NAMESPACE IF NOT EXISTS geord.db")
      s.sql("DROP TABLE IF EXISTS geord.db.rd")
      s.sql("CREATE TABLE geord.db.rd (id BIGINT, grp BIGINT) USING geo")
      s.sql("INSERT INTO geord.db.rd SELECT c_custkey, 0 FROM customer WHERE c_custkey % 2 = 0")
      s.sql("INSERT INTO geord.db.rd SELECT c_custkey, 1 FROM customer WHERE c_custkey % 2 = 1")
      val root = s.conf.get("spark.sql.catalog.geord.warehouse") + "/db/rd"
      graft.tables.GeoTable.delete(s, root,
        col("id") % 10 === 4 && col("grp") === 0, mode = "mor")
      graft.tables.GeoTable.delete(s, root,
        col("id") % 10 === 7 && col("grp") === 1, mode = "mor")
      // phases collect EAGERLY (a lazy frame would re-read the mutated
      // table at execution time and show the final state in every phase)
      def phase(p: Int): (Int, Long, Long, Long) = {
        // one aggregate over the deletes metadata + one count over the
        // table — the old spelling ran three scalar subqueries (three
        // jobs, two of them scanning the same metadata); identical values
        val del = s.sql(
          """SELECT COUNT(*) AS n_sidecars,
                    CAST(COALESCE(SUM(rows), 0) AS BIGINT) AS sidecar_rows
             FROM geord.db.rd.deletes WHERE type = 'position'""").head()
        val n = s.sql("SELECT COUNT(*) FROM geord.db.rd").head().getLong(0)
        (p, del.getLong(0), del.getLong(1), n)
      }
      val p1 = phase(1)
      // retire grp 0's files: its sidecar entries dangle, reads unchanged
      graft.tables.GeoTable.compactWhere(s, root, col("grp") === 0, 1)
      val p2 = phase(2)
      s.sql("CALL geord.system.rewrite_position_delete_files(table => 'db.rd')")
      val p3 = phase(3)
      import s.implicits._
      Seq(p1, p2, p3).toDF("phase", "n_sidecars", "sidecar_rows", "n_rows")
        .orderBy("phase")
    }),

    // User table properties (Iceberg/Delta TBLPROPERTIES parity): SET
    // through Spark's native ALTER (one manifest commit), carried
    // untouched across data commits, UNSET removes, a re-SET updates;
    // SHOW TBLPROPERTIES and row counts require'd in-query, the final
    // t.properties metadata table lists survivors as literals.
    "geo_tblproperties" -> ((s, d) => {
      prep(s, d)
      ensureGeoCatalog(s, "geopr", "geo_pr_wh")
      s.sql("CREATE NAMESPACE IF NOT EXISTS geopr.db")
      s.sql("DROP TABLE IF EXISTS geopr.db.pr")
      // CREATE-time user properties must ride into the manifest exactly
      // like the path-table route (the config keys — geometry.column,
      // stats.columns, ... — are consumed as config, not stored)
      s.sql("CREATE TABLE geopr.db.pr (id BIGINT) USING geo " +
        "TBLPROPERTIES ('origin'='create-time', 'tier'='raw')")
      s.sql("INSERT INTO geopr.db.pr SELECT c_custkey FROM customer WHERE c_custkey % 2 = 0")
      s.sql("ALTER TABLE geopr.db.pr SET TBLPROPERTIES " +
        "('team'='data-eng', 'tier'='bronze', 'ttl.days'='7')")
      // props ride data commits untouched
      s.sql("INSERT INTO geopr.db.pr SELECT c_custkey FROM customer WHERE c_custkey % 2 = 1")
      s.sql("ALTER TABLE geopr.db.pr UNSET TBLPROPERTIES ('ttl.days')")
      s.sql("ALTER TABLE geopr.db.pr SET TBLPROPERTIES ('tier'='gold')")
      val shown = s.sql("SHOW TBLPROPERTIES geopr.db.pr").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      require(shown.get("team").contains("data-eng") && shown.get("tier").contains("gold"),
        s"SHOW TBLPROPERTIES must surface user properties, got $shown")
      require(shown.get("origin").contains("create-time"),
        s"CREATE-time TBLPROPERTIES must survive to the manifest, got $shown")
      require(s.table("geopr.db.pr").count() == s.table("customer").count(),
        "property commits must not disturb data")
      s.sql("SELECT key, value FROM geopr.db.pr.properties ORDER BY key")
    }),

    // SHOW CREATE TABLE end-to-end: create a path table with the full
    // clause surface (partitions, user props, a Delta-style constraint
    // prop, geometry typing), take its emitted DDL, replay it VERBATIM
    // under a new name+location, load the same rows into both, and emit
    // the REPLAYED table's metadata + row stats. Identical literals prove
    // the emitted statement is a complete, working migration recipe —
    // a dropped clause (partitioning, constraint, prop, CRS) changes a
    // row; the in-query require pins content equality too.
    "geo_show_create" -> ((s, d) => {
      prep(s, d)
      val sp = s
      import sp.implicits._
      val base = java.nio.file.Files.createTempDirectory("geo_sct").toString
      graft.tables.GeoSql.exec(s,
        s"""CREATE TABLE sct_q (id BIGINT NOT NULL, nat BIGINT, g GEOMETRY('EPSG:3857'))
           | USING geo PARTITIONED BY (bucket(4,id))
           | TBLPROPERTIES ('team'='data-eng', 'graft.constraints.id_pos'='id >= 0')
           | LOCATION '$base/t1'""".stripMargin)
      def fill(t: String): Unit = graft.tables.GeoSql.exec(s,
        s"INSERT INTO $t SELECT c_custkey, c_nationkey, " +
          "st_point(CAST(c_custkey % 100 AS DOUBLE), CAST(c_nationkey AS DOUBLE)) FROM customer")
      fill("sct_q")
      val stmt = graft.tables.GeoSql.exec(s, "SHOW CREATE TABLE sct_q")
        .head.getString(0)
      graft.tables.GeoSql.exec(s,
        stmt.replace("sct_q", "sct_q2").replace(s"$base/t1", s"$base/t2"))
      fill("sct_q2")
      val m2 = graft.tables.GeoManifest.read(s, s"$base/t2")
      require(s.table("sct_q2").count() == s.table("sct_q").count(),
        "replayed table must accept the same rows")
      val meta =
        m2.checks.map { case (n, sql) => ("check", s"$n: $sql") } ++
        m2.props.toSeq.map { case (k, v) => ("prop", s"$k=$v") } ++
        m2.partitions.filter(_.layout).map(p => ("partition", p.encode)) ++
        Seq(("geom", m2.geomCol.getOrElse("--")))
      val metaDf = meta.toDF("kind", "value")
      val stats = s.table("sct_q2")
        .agg(count(lit(1)).cast("long").as("n"), sum("id").cast("long").as("sum_id"))
        .select(lit("rows").as("kind"),
          concat(col("n").cast("string"), lit(":"), col("sum_id").cast("string")).as("value"))
      metaDf.unionByName(stats).orderBy("kind", "value")
    }),

    // SHOW CREATE TABLE for CATALOG names: the native V2 emitter cannot
    // round-trip a geo table (it leaks the derived bookkeeping props —
    // which CREATE refuses as reserved — and flattens GEOMETRY CRS
    // typing to BINARY), so the geo front-end owns the catalog spelling
    // too. Full clause surface in: native CREATE (GEOMETRY(3857),
    // PARTITIONED BY, TBLPROPERTIES with a quoted quote, a Delta-style
    // constraint, sort.order). The emitted DDL is require'd free of
    // derived keys + CRS-typed, replayed VERBATIM under a new name, and
    // the replayed table's metadata + row stats are the output.
    "geo_show_create_catalog" -> ((s, d) => {
      prep(s, d)
      val sp = s
      import sp.implicits._
      ensureGeoCatalog(s, "geoscc", "geo_scc_wh")
      s.conf.set("spark.sql.geospatial.enabled", "true")
      s.sql("CREATE NAMESPACE IF NOT EXISTS geoscc.db")
      s.sql("DROP TABLE IF EXISTS geoscc.db.sctc")
      s.sql("DROP TABLE IF EXISTS geoscc.db.sctc2")
      s.sql("CREATE TABLE geoscc.db.sctc " +
        "(id BIGINT NOT NULL, nat BIGINT, qty BIGINT DEFAULT 5 + 2, " +
        "g GEOMETRY(3857)) USING geo " +
        "PARTITIONED BY (bucket(4, id)) " +
        "TBLPROPERTIES ('team'='data-eng', 'note'='it''s quoted', " +
        "'graft.constraints.id_pos'='id >= 0', 'sort.order'='nat')")
      // the column list omits qty: BOTH tables must fill the declared
      // default write-side (the replayed table re-folds it from the DDL)
      def fill(t: String): Unit = s.sql(
        s"INSERT INTO $t (id, nat, g) SELECT c_custkey, c_nationkey, " +
          "st_point(CAST(c_custkey % 100 AS DOUBLE), CAST(c_nationkey AS DOUBLE)) " +
          "FROM customer")
      fill("geoscc.db.sctc")
      val stmt = graft.tables.GeoSql.exec(s, "SHOW CREATE TABLE geoscc.db.sctc")
        .head.getString(0)
      require(!stmt.contains("format-version") && !stmt.contains("snapshot-version") &&
        !stmt.contains("data-files") && !stmt.contains("total-rows"),
        s"derived bookkeeping must not leak into DDL:\n$stmt")
      require(stmt.contains("GEOMETRY('EPSG:3857')"),
        s"CRS typing must survive the emitter:\n$stmt")
      graft.tables.GeoSql.exec(s, stmt.replace("sctc", "sctc2"))
      fill("geoscc.db.sctc2")
      val root2 = s.conf.get("spark.sql.catalog.geoscc.warehouse") + "/db/sctc2"
      val m2 = graft.tables.GeoManifest.read(s, root2)
      require(s.table("geoscc.db.sctc2").count() == s.table("geoscc.db.sctc").count(),
        "replayed table must accept the same rows")
      val meta =
        m2.checks.map { case (n, sql) => ("check", s"$n: $sql") } ++
        m2.props.toSeq.map { case (k, v) => ("prop", s"$k=$v") } ++
        m2.partitions.filter(_.layout).map(p => ("partition", p.encode)) ++
        m2.partitions.filter(_.kind == "sort").map(p => ("sort", p.col)) ++
        Seq(("geom", m2.geomCol.getOrElse("--")),
            ("crs", graft.tables.GeoSchema.crsOf(m2.schema("g"))),
            ("default", "qty=" + m2.schema("qty").metadata.getString("CURRENT_DEFAULT")))
      val metaDf = meta.toDF("kind", "value")
      val stats = s.table("geoscc.db.sctc2")
        .agg(count(lit(1)).cast("long").as("n"), sum("id").cast("long").as("sum_id"),
          sum("qty").cast("long").as("sum_qty"))
        .select(lit("rows").as("kind"),
          concat(col("n").cast("string"), lit(":"), col("sum_id").cast("string"),
            lit(":"), col("sum_qty").cast("string")).as("value"))
      metaDf.unionByName(stats).orderBy("kind", "value")
    }),

    // CHECK constraints end-to-end: ADD validates+stores, enforcement
    // admits the valid inserts (counts require'd in-query — a violating
    // insert is an error, spec-covered), DROP removes one; the
    // t.constraints metadata table lists what survives as literals.
    "geo_constraints_meta" -> ((s, d) => {
      prep(s, d)
      ensureGeoCatalog(s, "geocst", "geo_cst_wh")
      s.sql("CREATE NAMESPACE IF NOT EXISTS geocst.db")
      s.sql("DROP TABLE IF EXISTS geocst.db.ck")
      s.sql("CREATE TABLE geocst.db.ck (id BIGINT, amt BIGINT) USING geo")
      s.sql("INSERT INTO geocst.db.ck SELECT c_custkey, c_nationkey + 1 FROM customer WHERE c_custkey % 2 = 0")
      graft.tables.GeoSql.exec(s, "ALTER TABLE geocst.db.ck ADD CONSTRAINT amt_pos CHECK (amt > 0)")
      graft.tables.GeoSql.exec(s, "ALTER TABLE geocst.db.ck ADD CONSTRAINT id_cap CHECK (id < 100000000)")
      s.sql("INSERT INTO geocst.db.ck SELECT c_custkey, c_nationkey + 1 FROM customer WHERE c_custkey % 2 = 1") // passes both
      graft.tables.GeoSql.exec(s, "ALTER TABLE geocst.db.ck DROP CONSTRAINT id_cap")
      val expected = s.table("customer").count()
      require(s.table("geocst.db.ck").count() == expected,
        "constraint-respecting inserts must all land")
      s.sql("SELECT name, expr FROM geocst.db.ck.constraints ORDER BY name")
    }),

    // Cherry-pick (Iceberg cherrypick_snapshot): stage an append on a
    // branch, let MAIN advance past the fork point — the divergence
    // publish/fast_forward refuses — then CALL cherrypick_snapshot with
    // the staged snapshot id: the staged files re-sequence onto the
    // advanced head with zero data copied. Phase 1 pins main's interim
    // state (pick not yet applied), phase 2 the post-pick union; the
    // oracle replays both as set algebra over the insert predicates.
    "geo_cherrypick" -> ((s, d) => {
      prep(s, d)
      ensureGeoCatalog(s, "geocp", "geo_cp_wh")
      s.sql("CREATE NAMESPACE IF NOT EXISTS geocp.db")
      s.sql("DROP TABLE IF EXISTS geocp.db.cp")
      s.sql("CREATE TABLE geocp.db.cp (id BIGINT, nat BIGINT) USING geo")
      s.sql("INSERT INTO geocp.db.cp SELECT c_custkey, c_nationkey FROM customer WHERE c_custkey % 3 = 0") // v1
      graft.tables.GeoSql.exec(s, "ALTER TABLE geocp.db.cp CREATE BRANCH stage")
      s.sql("INSERT INTO geocp.db.cp.branch_stage " +
        "SELECT c_custkey, c_nationkey FROM customer WHERE c_custkey % 3 = 1") // staged (branch head)
      // bounded metadata read: the staged snapshot id from t.refs
      val staged = s.sql(
        "SELECT version FROM geocp.db.cp.refs WHERE name = 'stage' AND type = 'BRANCH'")
        .head.getAs[Number](0).longValue
      s.sql("INSERT INTO geocp.db.cp SELECT c_custkey, c_nationkey FROM customer WHERE c_custkey % 3 = 2") // main advances
      val phase1 = s.sql(
        "SELECT 1 AS phase, COUNT(*) AS n_rows, CAST(SUM(id) AS BIGINT) AS sum_id FROM geocp.db.cp")
      s.sql(s"CALL geocp.system.cherrypick_snapshot(table => 'db.cp', snapshot_id => $staged)")
      phase1.unionAll(s.sql(
        "SELECT 2, COUNT(*), CAST(SUM(id) AS BIGINT) FROM geocp.db.cp"))
        .orderBy("phase")
    }),

    // Named snapshot refs (Iceberg tag analog): tag v1, mutate twice,
    // read through VERSION AS OF 'tag', then RESTORE from the tag. The
    // oracle replays the phases as set algebra over the DML predicates —
    // a ref resolving to the wrong snapshot changes the hash.
    "geo_refs" -> ((s, d) => {
      prep(s, d)
      ensureGeoCatalog(s, "georf", "geo_rf_wh")
      s.sql("CREATE NAMESPACE IF NOT EXISTS georf.db")
      s.sql("DROP TABLE IF EXISTS georf.db.rf")
      s.sql("CREATE TABLE georf.db.rf (id BIGINT, nat BIGINT) USING geo")
      s.sql("INSERT INTO georf.db.rf SELECT c_custkey, c_nationkey FROM customer WHERE c_custkey % 2 = 0") // v1
      graft.tables.GeoSql.exec(s, "ALTER TABLE georf.db.rf CREATE TAG base")
      s.sql("INSERT INTO georf.db.rf SELECT c_custkey, c_nationkey FROM customer WHERE c_custkey % 2 = 1") // v2
      s.sql("DELETE FROM georf.db.rf WHERE id % 5 = 0")                                                    // v3
      val phase12 = s.sql("""
        SELECT 1 AS phase, COUNT(*) AS n_rows, CAST(SUM(id) AS BIGINT) AS sum_id
        FROM georf.db.rf VERSION AS OF 'base'
        UNION ALL
        SELECT 2, COUNT(*), CAST(SUM(id) AS BIGINT) FROM georf.db.rf""")
      graft.tables.GeoSql.exec(s, "RESTORE TABLE georf.db.rf TO VERSION AS OF 'base'") // v4 == v1
      phase12.unionAll(s.sql(
        "SELECT 3, COUNT(*), CAST(SUM(id) AS BIGINT) FROM georf.db.rf"))
        .orderBy("phase")
    }),

    // Equality deletes (Iceberg v2 eqdelete analog): a keyed DELETE and a
    // keyed UPSERT commit key sidecars in O(keys) with no data-file scan
    // or rewrite; the catalog read merges them in-reader scoped by data
    // sequence numbers (the upsert's own rows survive its delete leg).
    // The oracle replays the key predicates as set algebra.
    // The SQL verbs for equality deletes: a catalog DELETE with a keyed
    // IN-list/equality predicate takes Spark's metadata-only delete path
    // (SupportsDeleteV2 -> key sidecar, no scan or rewrite); a path-table
    // DELETE with a keyed subquery and a keyed full-row MERGE route to
    // deleteByKey/upsertByKey through the front-end. The oracle replays
    // all four statements as set algebra over customer.
    "geo_dml_delete_eq_sql" -> ((s, d) => {
      prep(s, d)
      ensureGeoCatalog(s, "geoeqv", "geo_eqv_wh")
      s.sql("CREATE NAMESPACE IF NOT EXISTS geoeqv.db")
      s.sql("DROP TABLE IF EXISTS geoeqv.db.sq")
      s.sql("CREATE TABLE geoeqv.db.sq (id BIGINT, nat BIGINT) USING geo")
      // the even half: the four verbs' semantics don't need the full
      // table twice, and the oracle filters identically. ONE customer
      // scan (checkpointed) feeds every statement — the catalog INSERT,
      // the path-table create, the subquery DELETE's key source, and the
      // MERGE source; the workflow is 7 commits of fixed overhead, so
      // not re-paying the scan per statement is the cheap half of it.
      s.sql("SELECT c_custkey AS id, CAST(c_nationkey AS BIGINT) AS nat FROM customer " +
        "WHERE c_custkey % 2 = 0").localCheckpoint()
        .createOrReplaceTempView("eqsql_evens")
      s.sql("INSERT INTO geoeqv.db.sq SELECT id, nat FROM eqsql_evens")             // v1
      s.sql("DELETE FROM geoeqv.db.sq WHERE id IN (4, 10, 22, 40, 78)")             // v2 eq
      s.sql("DELETE FROM geoeqv.db.sq WHERE id = 100")                              // v3 eq
      val root = java.nio.file.Files.createTempDirectory("geo_eqs_p").toString + "/t"
      graft.tables.GeoTable.create(s, root, s.table("eqsql_evens"), None)
      graft.tables.GeoTable.register(s, "eqsql_path_t", root)
      graft.tables.GeoSql.exec(s, "DELETE FROM eqsql_path_t WHERE id IN " +
        "(SELECT id FROM eqsql_evens WHERE id % 31 = 9)")
      s.sql("SELECT id, CAST(-1 AS BIGINT) AS nat FROM eqsql_evens WHERE id % 7 = 0 " +
        "UNION ALL SELECT id + 10000000, CAST(-2 AS BIGINT) FROM eqsql_evens " +
        "WHERE id % 13 = 0")
        .createOrReplaceTempView("eqsql_path_src")
      graft.tables.GeoSql.exec(s,
        """MERGE INTO eqsql_path_t t USING eqsql_path_src s ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET id = s.id, nat = s.nat
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      s.sql("""
        SELECT 1 AS phase, COUNT(*) AS n_rows, CAST(SUM(id) AS BIGINT) AS sum_id,
               CAST(SUM(nat) AS BIGINT) AS sum_nat
        FROM geoeqv.db.sq
        UNION ALL
        SELECT 2, COUNT(*), CAST(SUM(id) AS BIGINT), CAST(SUM(nat) AS BIGINT)
        FROM eqsql_path_t
        ORDER BY phase""")
    }),

    "geo_dml_delete_eq" -> ((s, d) => {
      prep(s, d)
      ensureGeoCatalog(s, "geoeqd", "geo_eqd_wh")
      s.sql("CREATE NAMESPACE IF NOT EXISTS geoeqd.db")
      s.sql("DROP TABLE IF EXISTS geoeqd.db.eq")
      s.sql("CREATE TABLE geoeqd.db.eq (id BIGINT, nat BIGINT) USING geo")
      s.sql("INSERT INTO geoeqd.db.eq SELECT c_custkey, c_nationkey FROM customer") // v1
      val root = s.conf.get("spark.sql.catalog.geoeqd.warehouse") + "/db/eq"
      graft.tables.GeoTable.deleteByKey(s, root, Seq("id"),
        s.table("customer").where(col("c_custkey") % 11 === 5)
          .select(col("c_custkey").as("id")))                                       // v2
      graft.tables.GeoTable.upsertByKey(s, root, Seq("id"),
        s.table("customer").where(col("c_custkey") % 13 === 0)
          .select(col("c_custkey").as("id"), lit(-1L).as("nat")))                   // v3
      s.sql("""
        SELECT nat, COUNT(*) AS n_rows, CAST(SUM(id) AS BIGINT) AS sum_id
        FROM geoeqd.db.eq GROUP BY nat ORDER BY nat""")
    }),

    // Zero-copy SHALLOW CLONE end-to-end (Delta analog): clone a table
    // whose snapshot holds a CoW DELETE, then DIVERGE both sides — a
    // further DELETE on the source and an INSERT into the clone. Phase 1
    // pins the source's post-divergence content, phase 2 the clone's:
    // the clone must keep reading the source's pre-divergence files by
    // reference (no data was copied) while neither side sees the other's
    // new commits. The oracle replays both phases as set algebra.
    "geo_clone" -> ((s, d) => {
      prep(s, d)
      ensureGeoCatalog(s, "geocn", "geo_cn_wh")
      s.sql("CREATE NAMESPACE IF NOT EXISTS geocn.db")
      s.sql("DROP TABLE IF EXISTS geocn.db.dup")
      s.sql("DROP TABLE IF EXISTS geocn.db.src")
      s.sql("CREATE TABLE geocn.db.src (id BIGINT, nat BIGINT) USING geo")
      s.sql("INSERT INTO geocn.db.src SELECT c_custkey, c_nationkey FROM customer " +
        "WHERE c_custkey % 2 = 0")                                  // v1
      s.sql("DELETE FROM geocn.db.src WHERE id % 5 = 0")            // v2 CoW
      graft.tables.GeoSql.exec(s,
        "CREATE TABLE geocn.db.dup SHALLOW CLONE geocn.db.src")
      s.sql("DELETE FROM geocn.db.src WHERE id % 7 = 0")            // src diverges
      s.sql("INSERT INTO geocn.db.dup SELECT c_custkey, c_nationkey FROM customer " +
        "WHERE c_custkey % 2 = 1")                                  // dup diverges
      s.sql("""
        SELECT 1 AS phase, COUNT(*) AS n_rows, CAST(SUM(id) AS BIGINT) AS sum_id
        FROM geocn.db.src
        UNION ALL
        SELECT 2, COUNT(*), CAST(SUM(id) AS BIGINT) FROM geocn.db.dup
        ORDER BY phase""")
    }),

    // Spark 4.1 native GEOMETRY(srid) DDL end-to-end: CREATE with the
    // typed column (no TBLPROPERTIES workaround), INSERT through the
    // catalog, read back coordinates + the schema-carried CRS tag. The
    // oracle replays coordinates and pins the CRS literal — a dropped
    // SRID or a broken GeometryType->WKB mapping changes the hash.
    "geo_typed_ddl" -> ((s, d) => {
      prep(s, d); import GraftFunctions._
      ensureGeoCatalog(s, "geotd", "geo_td_wh")
      s.sql("CREATE NAMESPACE IF NOT EXISTS geotd.db")
      s.sql("DROP TABLE IF EXISTS geotd.db.td")
      s.conf.set("spark.sql.geospatial.enabled", "true")
      s.sql("CREATE TABLE geotd.db.td (id BIGINT, geo GEOMETRY(3857)) USING geo")
      s.sql("""INSERT INTO geotd.db.td
        SELECT c_custkey, st_point(CAST(c_custkey % 100 AS DOUBLE),
                                   CAST(c_nationkey AS DOUBLE))
        FROM customer""")
      val crs = graft.tables.GeoSchema.crsOf(s.table("geotd.db.td").schema("geo"))
      s.table("geotd.db.td")
        .select(col("id"), st_x(col("geo")).as("x"), st_y(col("geo")).as("y"),
          lit(crs).as("crs"))
        .orderBy("id")
    }),

    // Streaming CDC over a merge-on-read commit (Delta readChangeFeed
    // analog): insert all customers (v1), MoR-delete a residue class (v2 —
    // position-delete sidecar, no rewrite), then STREAM t.changes from
    // table start. The stream must emit every customer as insert at v1
    // plus exactly the sidecar-named rows as deletes at v2 — the oracle
    // recomputes both legs from the residue predicate; any duplicated or
    // missed row-granular delete changes the hash.
    "geo_cdc_mor" -> ((s, d) => {
      prep(s, d)
      ensureGeoCatalog(s, "geocd", "geo_cd_wh")
      s.sql("CREATE NAMESPACE IF NOT EXISTS geocd.db")
      s.sql("DROP TABLE IF EXISTS geocd.db.cd")
      s.sql("CREATE TABLE geocd.db.cd (id BIGINT, nat BIGINT) USING geo")
      s.sql("INSERT INTO geocd.db.cd SELECT c_custkey, c_nationkey FROM customer") // v1
      val root = s.conf.get("spark.sql.catalog.geocd.warehouse") + "/db/cd"
      graft.tables.GeoTable.delete(s, root, col("id") % 9 === 4L, mode = "mor")    // v2 MoR
      s.catalog.dropTempView("geo_cdc_mor_sink") // repeat-safe: bench runs twice
      val q = s.readStream.table("geocd.db.cd.changes")
        .writeStream.format("memory").queryName("geo_cdc_mor_sink").start()
      q.processAllAvailable(); q.stop()
      s.table("geo_cdc_mor_sink")
        .groupBy(col("_change_type").as("change_type"))
        .agg(count(lit(1)).as("n_rows"), sum("id").cast("bigint").as("sum_id"))
        .orderBy("change_type")
    }),

    // RESTORE (Delta RESTORE / Iceberg rollback analog): two appends, a
    // DELETE, a rollback of that delete, then a different DELETE on the
    // restored state. Each phase reads via time travel, so the hash pins
    // (a) restore undoing the delete, (b) history surviving the restore,
    // (c) post-restore DML operating on the restored state. The DuckDB
    // oracle replays the set algebra from the DML predicates alone.
    "geo_restore" -> ((s, d) => {
      prep(s, d)
      ensureGeoCatalog(s, "geors", "geo_rs_wh")
      s.sql("CREATE NAMESPACE IF NOT EXISTS geors.db")
      s.sql("DROP TABLE IF EXISTS geors.db.rs")
      s.sql("CREATE TABLE geors.db.rs (id BIGINT, nat BIGINT) USING geo")
      s.sql("INSERT INTO geors.db.rs SELECT c_custkey, c_nationkey FROM customer WHERE c_custkey % 3 = 0") // v1
      s.sql("INSERT INTO geors.db.rs SELECT c_custkey, c_nationkey FROM customer WHERE c_custkey % 3 = 1") // v2
      s.sql("DELETE FROM geors.db.rs WHERE id % 5 = 0")                    // v3
      // GeoSql.exec: the RESTORE statement needs the injected parser; the
      // correctness driver's vanilla session goes through the front-half
      graft.tables.GeoSql.exec(s, "RESTORE TABLE geors.db.rs TO VERSION AS OF 2") // v4 == v2
      s.sql("DELETE FROM geors.db.rs WHERE id % 7 = 0")                    // v5 on restored state
      s.sql("""
        SELECT 3 AS phase, COUNT(*) AS n_rows, CAST(SUM(id) AS BIGINT) AS sum_id
        FROM geors.db.rs VERSION AS OF 3
        UNION ALL
        SELECT 4, COUNT(*), CAST(SUM(id) AS BIGINT) FROM geors.db.rs VERSION AS OF 4
        UNION ALL
        SELECT 5, COUNT(*), CAST(SUM(id) AS BIGINT) FROM geors.db.rs
        ORDER BY phase""")
    }),

    // Native DSv2 streaming sink (Iceberg streaming-append analog):
    // customers stream through writeStream.toTable into a geo catalog
    // table — per-epoch atomic manifest commits with the exactly-once
    // watermark — then the TABLE is aggregated. The oracle aggregates the
    // source directly: any dropped/duplicated epoch changes the hash.
    "geo_stream_sink" -> ((s, d) => {
      prep(s, d)
      ensureGeoCatalog(s, "geosk", "geo_sk_wh")
      s.sql("CREATE NAMESPACE IF NOT EXISTS geosk.db")
      s.sql("DROP TABLE IF EXISTS geosk.db.sk")
      s.sql("CREATE TABLE geosk.db.sk (id BIGINT, nat BIGINT) USING geo")
      val schema = s.read.parquet(s"$d/customer.parquet").schema
      val ck = java.nio.file.Files.createTempDirectory("geo_sk_ck").toString
      // two micro-batches, not one gulp: maxFilesPerTrigger is file-
      // granular, so split the source into per-bucket files first — two
      // epochs is the minimum that still proves the per-epoch watermark
      val srcDir = java.nio.file.Files.createTempDirectory("geo_sk_src").toString + "/files"
      s.read.parquet(s"$d/customer.parquet")
        .withColumn("b", col("c_custkey") % 2)
        .repartition(2, col("b")).drop("b")
        .write.parquet(srcDir)
      val q = s.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(srcDir)
        .selectExpr("CAST(c_custkey AS BIGINT) AS id", "CAST(c_nationkey AS BIGINT) AS nat")
        .writeStream.option("checkpointLocation", ck).toTable("geosk.db.sk")
      q.processAllAvailable(); q.stop()
      s.table("geosk.db.sk").groupBy("nat")
        .agg(count("*").as("n_rows"), sum("id").as("sum_id"))
        .orderBy("nat")
    }),

    // Native DSv2 streaming SOURCE (offsets = manifest versions): two
    // committed snapshots stream out as two micro-batches into a memory
    // sink; the oracle aggregates the insert predicates directly — a
    // replayed, dropped or partially-read snapshot changes the hash.
    "geo_stream_source" -> ((s, d) => {
      prep(s, d)
      ensureGeoCatalog(s, "geoss", "geo_ss_wh")
      s.sql("CREATE NAMESPACE IF NOT EXISTS geoss.db")
      s.sql("DROP TABLE IF EXISTS geoss.db.src")
      s.sql("CREATE TABLE geoss.db.src (id BIGINT, nat BIGINT) USING geo")
      s.sql("INSERT INTO geoss.db.src SELECT c_custkey, c_nationkey FROM customer WHERE c_custkey % 2 = 0") // v1
      s.sql("INSERT INTO geoss.db.src SELECT c_custkey, c_nationkey FROM customer WHERE c_custkey % 2 = 1") // v2
      s.catalog.dropTempView("geo_stream_source_sink") // repeat-safe: bench runs twice
      val q = s.readStream.table("geoss.db.src")
        .writeStream.format("memory").queryName("geo_stream_source_sink").start()
      q.processAllAvailable(); q.stop()
      s.table("geo_stream_source_sink").groupBy("nat")
        .agg(count(lit(1)).as("n_rows"), sum("id").cast("bigint").as("sum_id"))
        .orderBy("nat")
    }),

    // streaming ADMISSION CONTROL end-to-end: a 5-version backlog drains
    // under max-files-per-micro-batch=1 with Trigger.AvailableNow — the
    // offset must advance by whole versions under the cap, across AT
    // LEAST 5 micro-batches (require'd from query progress), consuming
    // everything exactly-once: the sink hash-matches the batch oracle.
    "geo_stream_admit" -> ((s, d) => {
      prep(s, d)
      ensureGeoCatalog(s, "geoss", "geo_ss_wh")
      s.sql("CREATE NAMESPACE IF NOT EXISTS geoss.db")
      s.sql("DROP TABLE IF EXISTS geoss.db.adm")
      s.sql("CREATE TABLE geoss.db.adm (id BIGINT, nat BIGINT) USING geo")
      for (r <- 0 until 5)
        s.sql("INSERT INTO geoss.db.adm SELECT c_custkey, c_nationkey FROM customer " +
          s"WHERE c_custkey % 5 = $r") // v1..v5: the backlog
      s.catalog.dropTempView("geo_stream_admit_sink") // repeat-safe
      val q = s.readStream
        .option("max-files-per-micro-batch", "1")
        .table("geoss.db.adm")
        .writeStream.format("memory").queryName("geo_stream_admit_sink")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      val fed = q.recentProgress.count(_.numInputRows > 0)
      require(fed >= 5,
        s"admission control must split the 5-version backlog into >=5 bounded " +
          s"micro-batches, got $fed data-carrying triggers")
      s.table("geo_stream_admit_sink").groupBy("nat")
        .agg(count(lit(1)).as("n_rows"), sum("id").cast("bigint").as("sum_id"))
        .orderBy("nat")
    }),

    // stream-from-timestamp: replay begins at the first commit at/after a
    // cutoff resolved through the IN-MANIFEST commit timestamps — the
    // cutoff is v3's own recorded ts (strictly after v2's, require'd), so
    // the drained content is exactly versions 3..5 and DuckDB replays it
    // as the matching source predicate. Pins the timestamp->version
    // resolution end-to-end, not just the offset arithmetic.
    "geo_stream_from_ts" -> ((s, d) => {
      prep(s, d)
      ensureGeoCatalog(s, "geoss", "geo_ss_wh")
      s.sql("CREATE NAMESPACE IF NOT EXISTS geoss.db")
      s.sql("DROP TABLE IF EXISTS geoss.db.sft")
      s.sql("CREATE TABLE geoss.db.sft (id BIGINT, nat BIGINT) USING geo")
      for (r <- 0 until 5) {
        if (r > 0) Thread.sleep(30) // commit ts are millis: keep them distinct
        s.sql("INSERT INTO geoss.db.sft SELECT c_custkey, c_nationkey FROM customer " +
          s"WHERE c_custkey % 5 = $r") // v1..v5
      }
      val root = s.conf.get("spark.sql.catalog.geoss.warehouse").stripSuffix("/") + "/db/sft"
      val cutoff = graft.tables.GeoManifest.commitTsOf(s, root, 3)
      require(graft.tables.GeoManifest.commitTsOf(s, root, 2) < cutoff,
        "commit timestamps not distinct — cutoff would be ambiguous")
      s.catalog.dropTempView("geo_stream_from_ts_sink") // repeat-safe
      val q = s.readStream.option("stream-from-timestamp", cutoff.toString)
        .table("geoss.db.sft")
        .writeStream.format("memory").queryName("geo_stream_from_ts_sink")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.table("geo_stream_from_ts_sink").groupBy("nat")
        .agg(count(lit(1)).as("n_rows"), sum("id").cast("bigint").as("sum_id"))
        .orderBy("nat")
    }),

    // OPTIMIZE + VACUUM preserve content exactly: phases read the same
    // aggregate before compaction, after OPTIMIZE INTO 2 FILES, and after
    // VACUUM RETAIN 1 VERSIONS — identical by set algebra (the oracle
    // replays the DML predicates); the file-count contract is asserted
    // in-query (a compaction that didn't compact fails the query).
    "geo_optimize" -> ((s, d) => {
      prep(s, d)
      ensureGeoCatalog(s, "geoop", "geo_op_wh")
      s.sql("CREATE NAMESPACE IF NOT EXISTS geoop.db")
      s.sql("DROP TABLE IF EXISTS geoop.db.op")
      s.sql("CREATE TABLE geoop.db.op (id BIGINT, nat BIGINT) USING geo")
      (0 until 3).foreach { i =>
        s.sql(s"INSERT INTO geoop.db.op SELECT c_custkey, c_nationkey FROM customer " +
          s"WHERE c_custkey % 3 = $i")
      }
      s.sql("DELETE FROM geoop.db.op WHERE id % 5 = 0") // v4 CoW
      // each phase MATERIALIZES before the next DDL runs — the later
      // VACUUM deletes the files a lazy phase-1 plan would still reference
      val phase1 = s.sql(
        "SELECT 1 AS phase, COUNT(*) AS n_rows, CAST(SUM(id) AS BIGINT) AS sum_id FROM geoop.db.op")
        .localCheckpoint()
      graft.tables.GeoSql.exec(s, "OPTIMIZE geoop.db.op INTO 2 FILES")
      val filesAfter = s.sql("SELECT COUNT(*) FROM geoop.db.op.files").head().getLong(0)
      require(filesAfter <= 2, s"OPTIMIZE INTO 2 FILES left $filesAfter files")
      val phase2 = s.sql(
        "SELECT 2, COUNT(*), CAST(SUM(id) AS BIGINT) FROM geoop.db.op")
        .localCheckpoint()
      graft.tables.GeoSql.exec(s, "VACUUM geoop.db.op RETAIN 1 VERSIONS")
      phase1.unionAll(phase2).unionAll(s.sql(
        "SELECT 3, COUNT(*), CAST(SUM(id) AS BIGINT) FROM geoop.db.op"))
        .orderBy("phase")
    }),

    // ndjson GeoJSON interop: customers round-trip through
    // writeFeatures/readFeatures (Feature-per-line, properties + WKB
    // geometry); integer-valued coordinates keep the JSON decimal
    // round-trip exact, so the oracle replays the aggregate from the
    // parquet source directly.
    "geo_json_source" -> ((s, d) => {
      prep(s, d); import GraftFunctions._
      val dir = java.nio.file.Files.createTempDirectory("geo_nd").toString + "/nd"
      val src = s.table("customer").select(
        col("c_custkey").cast("long").as("id"),
        col("c_nationkey").cast("long").as("nat"),
        st_point((col("c_custkey") % 100).cast("double"),
          col("c_nationkey").cast("double")).as("geo"))
      graft.sources.GeoJsonSource.writeFeatures(src, "geo", dir)
      graft.sources.GeoJsonSource.readFeatures(s, dir, Seq("id", "nat"))
        .select(col("id").cast("long").as("id"), col("nat").cast("long").as("nat"),
          st_x(col("geometry")).as("x"))
        .groupBy("nat")
        .agg(count(lit(1)).as("n_rows"), sum("id").cast("bigint").as("sum_id"),
          sum("x").as("sum_x"))
        .orderBy("nat")
    }),

    // ST_MakeValid on a self-intersecting bowtie: the fixer splits it at
    // the crossing into two triangles of total area sz^2/2 — closed-form,
    // with the pre-fix invalidity asserted alongside
    "st_makevalid_area" -> ((s, d) => prep(s, d).sql("""
      WITH r AS (SELECT p_partkey, CAST(p_size AS DOUBLE) AS sz FROM part),
           g AS (SELECT p_partkey, sz,
                        st_geomfromtext(concat('POLYGON ((0 0, ', sz, ' 0, 0 ',
                                               sz, ', ', sz, ' ', sz, ', 0 0))')) AS bowtie
                 FROM r)
      SELECT p_partkey,
             st_area(st_makevalid(bowtie)) AS fixed_area,
             st_isvalid(bowtie) AS was_valid,
             st_isvalid(st_makevalid(bowtie)) AS is_valid
      FROM g ORDER BY p_partkey""")),

    // ST_OrderingEquals vs ST_Equals: identical sequences are
    // ordering-equal, reversed ones are only geometrically equal
    "st_orderingequals_matrix" -> ((s, d) => prep(s, d).sql("""
      WITH r AS (SELECT p_partkey, CAST(p_size AS DOUBLE) AS sz FROM part),
           g AS (SELECT p_partkey,
                        st_makeline(st_point(0.0D, 0.0D), st_point(sz, sz)) AS fwd,
                        st_makeline(st_point(sz, sz), st_point(0.0D, 0.0D)) AS rev
                 FROM r)
      SELECT p_partkey,
             st_orderingequals(fwd, fwd) AS same_order,
             st_orderingequals(fwd, rev) AS rev_order,
             st_equals(fwd, rev) AS geo_equal
      FROM g ORDER BY p_partkey""")),

    // Streaming content dedup end-to-end: documents arrive as a
    // multi-batch file stream, dropDuplicatesWithinWatermark keys on the
    // content fingerprint; the surviving row count equals the corpus's
    // distinct normalized texts (fingerprint injectivity on this corpus
    // is separately certified by text_fingerprint)
    "dedup_stream" -> ((s, d) => {
      prep(s, d)
      val srcDir = java.nio.file.Files.createTempDirectory("dedup_stream_src")
        .toString + "/files"
      // a deterministic half keeps the bench leg dominated by streaming
      // semantics, not source-dump IO; the oracle filters identically
      s.table("documents").where(col("doc_id") % 2 === 0)
        .withColumn("b", col("doc_id") % 4)
        .repartition(4, col("b")).drop("b").write.parquet(srcDir)
      val schema = s.read.parquet(srcDir).schema
      s.catalog.dropTempView("dedup_stream_sink") // repeat-safe: bench runs twice
      val stream = s.readStream.schema(schema).option("maxFilesPerTrigger", "2")
        .parquet(srcDir)
        .withColumn("ts", lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      withShufflePartitions(s, 8) {
        val q = graft.streaming.EventStreams.streamingDedup(stream, "ts", "text")
          .writeStream.format("memory").outputMode("append")
          .queryName("dedup_stream_sink").start()
        q.processAllAvailable(); q.stop()
      }
      s.table("dedup_stream_sink").agg(count(lit(1)).as("n_rows"))
    }),

    // Watermarked sliding-window aggregation END-TO-END as a stream:
    // events arrive as a multi-batch file stream, the 1h/30m windowed
    // count runs in complete mode, and the oracle replays window
    // membership arithmetic (each event in exactly two aligned windows).
    // Counts only — float sums are order-dependent across triggers.
    "stream_window_agg" -> ((s, d) => {
      prep(s, d)
      val srcDir = java.nio.file.Files.createTempDirectory("swin_src").toString + "/files"
      // the prepped view has ts normalized; multi-file => multi-batch
      s.table("events").where(col("event_id") % 2 === 0)
        .withColumn("b", col("event_id") % 4)
        .repartition(4, col("b")).drop("b").write.parquet(srcDir)
      val schema = s.read.parquet(srcDir).schema
      s.catalog.dropTempView("swin_sink") // repeat-safe: bench runs twice
      val stream = s.readStream.schema(schema).option("maxFilesPerTrigger", "2")
        .parquet(srcDir)
      withShufflePartitions(s, 8) {
        val q = graft.streaming.EventStreams.windowedAgg(stream)
          .writeStream.format("memory").outputMode("complete")
          .queryName("swin_sink").start()
        q.processAllAvailable(); q.stop()
      }
      s.table("swin_sink")
        .select(col("window.start").cast("long").as("w_start"),
          col("event_type"), col("n"))
        .orderBy("w_start", "event_type")
    }),

    // Binary overlay set operations on integer-coordinate rectangles:
    // union/intersection/difference/symdifference areas are closed-form
    // rectangle arithmetic, so the JTS overlay output is hash-checked
    // value-by-value (empty intersections at sz=1 included)
    "st_set_ops" -> ((s, d) => prep(s, d).sql("""
      WITH r AS (SELECT p_partkey, CAST(p_size AS DOUBLE) AS sz FROM part),
           g AS (SELECT p_partkey, sz,
                        st_makeenvelope(0.0D, 0.0D, sz, sz) AS a,
                        st_makeenvelope(sz / 2, 1.0D, sz + 3.0D, sz + 1.0D) AS b
                 FROM r)
      SELECT p_partkey,
             st_area(st_union(a, b)) AS u_area,
             st_area(st_intersection(a, b)) AS i_area,
             st_area(st_difference(a, b)) AS d_area,
             st_area(st_symdifference(a, b)) AS s_area
      FROM g ORDER BY p_partkey""")),

    // n-way envelope intersection aggregate: the common envelope of a
    // group is [max(mins), min(maxs)] per axis — closed-form in SQL
    "st_intersection_aggr_env" -> ((s, d) => prep(s, d).sql("""
      WITH e AS (SELECT c_nationkey AS nat,
                        st_makeenvelope(0.0D, 0.0D,
                          CAST(10 + c_custkey % 5 AS DOUBLE),
                          CAST(10 + c_custkey % 7 AS DOUBLE)) AS env
                 FROM customer)
      SELECT CAST(nat AS BIGINT) AS nat,
             st_area(st_intersection_aggr(env)) AS common_area
      FROM e GROUP BY nat ORDER BY nat""")),

    // GeoJSON writer/reader roundtrip: the parse must invert the writer
    // exactly, so st_astext of the roundtrip equals a directly-built WKT
    // string in the oracle (no JSON on the DuckDB side at all)
    "st_geojson_roundtrip" -> ((s, d) => prep(s, d).sql("""
      SELECT p_partkey,
             st_astext(st_geomfromgeojson(st_asgeojson(
               st_point(CAST(p_size AS DOUBLE), CAST(p_size + 1 AS DOUBLE))))) AS gj_pt,
             st_astext(st_geomfromgeojson(st_asgeojson(
               st_makeenvelope(0.0D, 0.0D, CAST(p_size AS DOUBLE),
                               CAST(p_size AS DOUBLE))))) AS gj_poly
      FROM part ORDER BY p_partkey""")),

    // GeoParquet write -> read roundtrip: Z-ordered bbox-sidecar files
    // written to a scratch dir, read back through a pushdown-eligible
    // ST_Contains filter; the oracle replays the predicate arithmetic on
    // the raw table (any row lost or duplicated by the layout changes
    // the hash)
    "geoparquet_roundtrip" -> ((s, d) => {
      prep(s, d)
      import graft.functions.GraftFunctions._
      val dir = java.nio.file.Files.createTempDirectory("geopq_rt").toString + "/pts"
      val pts = s.table("customer").select(col("c_custkey"), col("c_nationkey"),
        st_point(col("c_acctbal"), col("c_nationkey").cast("double")).as("geo"))
      graft.plans.GeoParquet.write(pts, "geo", dir, cellSize = 500.0)
      graft.plans.GeoParquet.read(s, dir)
        .where(st_contains(st_polygonFromEnvelope(lit(0.0), lit(-0.5), lit(4000.0), lit(12.5)),
          col("geo")))
        .groupBy(col("c_nationkey").cast("bigint").as("nat"))
        .agg(count(lit(1)).as("n_rows"), sum("c_custkey").cast("bigint").as("sum_id"))
        .orderBy("nat")
    }),

    // Standard GeoParquet footer interop: the written file carries the
    // spec's `geo` key, DuckDB reads the SAME footer bytes through its
    // built-in parquet_kv_metadata() and re-extracts every field with its
    // own JSON parser — raw-string AND field-level equality across two
    // independent readers is the interop claim. Content is SF-independent
    // (nation is 25 rows at every scale factor) so re-runs at other SFs
    // rewrite byte-identical metadata. In-query require: a hint-free
    // reader session recovers the GEOMETRY typing from the key alone.
    "geoparquet_geo_key" -> ((s, d) => {
      prep(s, d)
      import graft.functions.GraftFunctions._
      val dir = "/tmp/graft_geopq_meta/pts"
      val pts = s.table("nation").repartition(1).select(col("n_nationkey"),
        st_point((col("n_nationkey") * 2).cast("double"),
                 (col("n_regionkey") * 3).cast("double")).as("geo"))
      graft.plans.GeoParquet.write(pts, "geo", dir, cellSize = 10.0)
      val back = graft.plans.GeoParquet.read(s, dir)
      require(graft.tables.GeoSchema.isGeometry(back.schema("geo")),
        "geoparquet read did not recover GEOMETRY typing from the geo key")
      val raw = graft.sources.GeoParquetMeta.readGeoKey(s, dir)
        .getOrElse(sys.error("geo footer key missing"))
      val meta = graft.sources.GeoParquetMeta.parse(raw)
        .getOrElse(sys.error("geo footer key unparseable"))
      val c = meta.columns(meta.primary)
      val (bxmin, bymin, bxmax, bymax) = c.bbox.getOrElse(sys.error("bbox missing"))
      import s.implicits._
      Seq((raw, meta.version, meta.primary, c.encoding,
           c.geometryTypes.mkString(","), bxmin, bymin, bxmax, bymax,
           c.covering.getOrElse("xmin", Seq.empty).mkString("."), back.count()))
        .toDF("geo_json", "version", "primary_column", "encoding",
          "geometry_types", "xmin", "ymin", "xmax", "ymax", "cov_xmin", "n_rows")
    }),

    // KML/GML reader-writer roundtrip: the parse must invert the writer
    // exactly, so st_astext of the roundtrip equals a directly-built WKT
    // string in the oracle (no XML on the DuckDB side at all)
    "st_xml_roundtrip" -> ((s, d) => prep(s, d).sql("""
      SELECT p_partkey,
             st_astext(st_geomfromkml(st_askml(st_point(CAST(p_size AS DOUBLE),
                                                        CAST(p_size + 1 AS DOUBLE))))) AS kml_pt,
             st_astext(st_geomfromgml(st_asgml(
               st_makeenvelope(0.0D, 0.0D, CAST(p_size AS DOUBLE), CAST(p_size AS DOUBLE))))) AS gml_poly
      FROM part ORDER BY p_partkey""")),

    // Getis-Ord Gi* hotspots over the blob lattice with integer values
    // (every fifth blob runs hot): neighbor counts/sums and the global
    // mean/variance are integer-exact regardless of aggregation order, so
    // the z-score expression tree replays bit-for-bit in DuckDB
    "spatial_gi_star" -> ((s, d) => {
      prep(s, d)
      val pts = s.sql("""
        WITH t AS (SELECT c_custkey, c_custkey - 1 AS c0 FROM customer)
        SELECT c_custkey AS id,
               st_point(CAST(((c0 % 50) % 10) * 30 + (c0 % 3) AS DOUBLE),
                        CAST(((c0 % 50) DIV 10) * 30 + ((c0 DIV 3) % 3) AS DOUBLE)) AS geo,
               CASE WHEN (c0 % 50) % 5 = 0 THEN 15 + c0 % 5 ELSE c0 % 10 END AS v
        FROM t""")
      graft.ops.SpatialCluster.getisOrdGiStar(pts, "id", "geo", "v", radius = 2.0)
        .orderBy("id")
    }),

    // Local Outlier Factor over a 1D integer lattice in density blocks
    // (spacing 1/2/3 by block) with one displaced outlier per block —
    // distances are exact integers and every double sum in the operator is
    // a sequential fold in neighbor-rank order, so the DuckDB replay (same
    // chain written as an explicit expression tree) is bit-exact
    "spatial_lof" -> ((s, d) => {
      prep(s, d)
      val pts = s.sql("""
        WITH t AS (SELECT c_custkey, c_custkey - 1 AS c0 FROM customer)
        SELECT c_custkey AS id,
               st_point(CAST((c0 DIV 100) * 10000 + (c0 % 100) * (1 + (c0 DIV 100) % 3)
                             + CASE WHEN c0 % 100 = 99 THEN 500 ELSE 0 END AS DOUBLE),
                        0.0D) AS geo
        FROM t""")
      graft.ops.SpatialCluster.localOutlierFactor(pts, "id", "geo", k = 4)
        .orderBy("id")
    }),

    // the same LOF with the PARTITIONED KNN path pinned on (the route the
    // operator takes automatically above its broadcast threshold): scores
    // must hash identically to the broadcast-path oracle — the driver-level
    // proof that the scale path changes the plan, not one double
    "spatial_lof_grid" -> ((s, d) => {
      prep(s, d)
      val pts = s.sql("""
        WITH t AS (SELECT c_custkey, c_custkey - 1 AS c0 FROM customer)
        SELECT c_custkey AS id,
               st_point(CAST((c0 DIV 100) * 10000 + (c0 % 100) * (1 + (c0 DIV 100) % 3)
                             + CASE WHEN c0 % 100 = 99 THEN 500 ELSE 0 END AS DOUBLE),
                        0.0D) AS geo
        FROM t""")
      // same width-to-data sizing as spatial_knn_grid_join; scores are
      // partitioning-independent by the rank-ordered fold contract
      withShufflePartitions(s, 8) {
        graft.ops.SpatialCluster.localOutlierFactor(pts, "id", "geo", k = 4,
            driverNbrThreshold = 1L << 22, forceGrid = true)
          .orderBy("id")
      }
    }),

    // M-measure linear referencing (tier 5): measures assigned by
    // st_addmeasure are pure IEEE +,-,*,/ over exact integer-valued
    // doubles, so the DuckDB oracle replays every value bit-for-bit with
    // the same parenthesization (mv2 shared via CTE — (100+x)-100 != x in
    // general, the replay must reuse the stored double)
    "st_m_linear_ref" -> ((s, d) => prep(s, d).sql("""
      WITH t AS (SELECT p_partkey, CAST(p_size AS DOUBLE) AS sz FROM part),
           l AS (SELECT p_partkey, sz,
                        st_addmeasure(st_makeline(st_point(0.0D, 0.0D), st_point(sz, 0.0D),
                                                  st_point(sz, sz * 2)),
                                      100.0D, 100.0D + sz * 3) AS ln
                 FROM t)
      SELECT p_partkey,
             st_m(st_endpoint(ln)) AS m_end,
             st_m(st_pointn(ln, 2)) AS m_v2,
             st_mmin(ln) AS m_min,
             st_mmax(ln) AS m_max,
             st_y(st_geometryn(st_locatealong(ln, 100.0D + sz * 1.5D), 1)) AS loc_y,
             st_interpolatepoint(ln, st_point(sz / 2, -3.0D)) AS interp_m,
             st_zmflag(ln) AS zmf,
             st_ndims(ln) AS nd
      FROM l ORDER BY p_partkey""")),

    // ring orientation + misc tier-5 parity: every output is either exact
    // integer arithmetic or a boolean with a closed-form integer rule, so
    // the oracle needs no geometry at all
    "st_orientation_misc" -> ((s, d) => prep(s, d).sql("""
      WITH t AS (SELECT p_partkey, p_size, CAST(p_size AS DOUBLE) AS sz FROM part),
           g AS (SELECT p_partkey, p_size, sz,
                  CASE WHEN p_size % 2 = 0
                       THEN st_geomfromtext(CONCAT('POLYGON ((0 0, 0 ', p_size, ', ', p_size, ' ',
                                                   p_size, ', ', p_size, ' 0, 0 0))'))
                       ELSE st_geomfromtext(CONCAT('POLYGON ((0 0, ', p_size, ' 0, ', p_size, ' ',
                                                   p_size, ', 0 ', p_size, ', 0 0))'))
                  END AS poly,
                  st_makeline(st_point(0.0D, 0.0D), st_point(sz, 0.0D), st_point(sz * 2, 0.0D)) AS seg3,
                  st_point(CAST(p_size * 7 % 360 AS DOUBLE) - 180.0D + 0.5D,
                           CAST(p_size % 18 AS DOUBLE) * 10.0D - 85.0D + 0.5D) AS pt
                 FROM t)
      SELECT p_partkey,
             st_ispolygoncw(poly) AS is_cw,
             st_ispolygonccw(poly) AS is_ccw,
             st_area(st_forcerhr(poly)) AS area_rhr,
             st_nrings(poly) AS nrings,
             st_iscollection(st_multi(poly)) AS is_coll,
             st_npoints(st_removerepeatedpoints(seg3, 10.0D)) AS np_dedup,
             st_crossesdateline(st_makeline(st_point(sz - 100.0D, 0.0D),
                                            st_point(100.0D - sz, 0.0D))) AS crosses,
             st_bestsrid(pt) AS best_srid
      FROM g ORDER BY p_partkey""")),

    // spherical geodesy (tier 4): haversine distance/length + planar
    // projection. Integer-degree inputs; outputs rounded (mm for meters,
    // 1e-9 for coordinates) so engine libm 1-ulp differences vanish —
    // same convention as st_transform_mercator. pi()/4.0 instead of a
    // decimal azimuth literal: both engines derive the identical double.
    "st_geodesy" -> ((s, d) => prep(s, d).sql("""
      WITH t AS (SELECT n_nationkey,
                        CAST(n_nationkey AS DOUBLE) AS lon,
                        CAST(n_regionkey * 10 - 20 AS DOUBLE) AS lat
                 FROM nation)
      SELECT n_nationkey,
             ROUND(st_distancesphere(st_point(lon, lat), st_point(0.0D, 0.0D)), 3) AS dist_m,
             ROUND(st_lengthsphere(st_makeline(st_point(lon, lat),
               st_point(lon + 1.0D, lat), st_point(lon + 1.0D, lat + 1.0D))), 3) AS len_m,
             ROUND(st_x(st_project(st_point(lon, 0.0D), 1000.0D, pi() / 4.0D)), 9) AS proj_x,
             ROUND(st_y(st_project(st_point(lon, 0.0D), 1000.0D, pi() / 4.0D)), 9) AS proj_y
      FROM t ORDER BY n_nationkey""")),

    // WGS84-spheroid geodesy (tier 6): meridian arcs make Vincenty's
    // inverse non-iterative (lambda converges to 0 on the first pass), so
    // the oracle replays the closed form in the solver's exact IEEE op
    // order; rectangle areas reduce the ellipsoidal band quadrature to
    // two constant-latitude edges. Integer-degree inputs, mm/1e-3-km^2
    // rounding as st_geodesy.
    "st_spheroid_geodesy" -> ((s, d) => prep(s, d).sql("""
      WITH t AS (SELECT n_nationkey,
                        CAST(n_nationkey AS DOUBLE) AS lon,
                        CAST(n_regionkey * 10 - 20 AS DOUBLE) AS lat
                 FROM nation)
      SELECT n_nationkey,
             ROUND(st_distancespheroid(st_point(lon, lat), st_point(lon, lat + 2.0D)), 3) AS dist_m,
             ROUND(st_lengthspheroid(st_makeline(st_point(lon, lat),
               st_point(lon, lat + 2.0D), st_point(lon, lat + 3.0D))), 3) AS len_m,
             ROUND(st_areaspheroid(st_polygonfromenvelope(lon, lat, lon + 2.0D, lat + 1.0D))
                   / 1000000.0D, 3) AS area_km2
      FROM t ORDER BY n_nationkey""")),

    // discrete global grids (tier 6): geohash cell-bounds polygons
    // (dyadic intervals -> exact floor-arithmetic oracle) and S2 cell ids
    // at levels 1 and 2 (face-cube projection + Hilbert digits, replayed
    // bit-for-bit in SQL; lon spread hits faces 0/1/3/4 and the signed
    // 64-bit wrap of faces >= 4)
    // geohash inputs: integer degrees (cell edges are dyadic, halving ==
    // floor arithmetic bit-for-bit); S2 inputs: 15-degree lon strides
    // offset by -187 and lat offset by -19, which stay >= 2 degrees from
    // every face seam and level-1/2 Hilbert boundary, so 1-ulp libm
    // differences cannot flip a branch
    "st_cell_systems" -> ((s, d) => prep(s, d).sql("""
      WITH t AS (SELECT n_nationkey,
                        CAST(n_nationkey AS DOUBLE) AS glon,
                        CAST(n_regionkey * 10 - 20 AS DOUBLE) AS glat,
                        CAST(n_nationkey * 15 - 187 AS DOUBLE) AS slon,
                        CAST(n_regionkey * 10 - 19 AS DOUBLE) AS slat
                 FROM nation),
           g AS (SELECT n_nationkey, slon, slat,
                        st_geomfromgeohash(st_geohash(st_point(glon, glat), 2)) AS cell
                 FROM t)
      SELECT n_nationkey,
             ROUND(st_xmin(cell), 9) AS gh_x0, ROUND(st_xmax(cell), 9) AS gh_x1,
             ROUND(st_ymin(cell), 9) AS gh_y0, ROUND(st_ymax(cell), 9) AS gh_y1,
             element_at(st_s2cellids(st_point(slon, slat), 1), 1) AS s2_l1,
             element_at(st_s2cellids(st_point(slon, slat), 2), 1) AS s2_l2
      FROM g ORDER BY n_nationkey""")),

    // line tooling + validity detail (tier 6): segment decomposition,
    // 3-D interpolation at a power-of-two fraction (exact lerp), and
    // st_isvaliddetail over a parity-selected valid envelope / bowtie
    // (crossing at sz/2 closed-form)
    "st_line_detail" -> ((s, d) => prep(s, d).sql("""
      WITH r AS (SELECT p_partkey, CAST(p_size AS DOUBLE) AS sz,
                        p_partkey % 2 = 0 AS ok FROM part),
           g AS (SELECT p_partkey, sz, ok,
                        CASE WHEN ok
                             THEN st_makeline(st_point(0.0D, 0.0D), st_point(sz, 0.0D),
                                              st_point(sz, sz))
                             ELSE st_makeline(st_point(0.0D, 0.0D), st_point(sz, 0.0D)) END AS line,
                        st_geomfromtext(concat('LINESTRING Z (0 0 0, ', sz, ' 0 ', sz, ')')) AS l3,
                        CASE WHEN ok THEN st_polygonfromenvelope(0.0D, 0.0D, sz, sz)
                             ELSE st_geomfromtext(concat('POLYGON ((0 0, ', sz, ' 0, 0 ',
                                                         sz, ', ', sz, ' ', sz, ', 0 0))')) END AS poly
                 FROM r),
           v AS (SELECT p_partkey, sz, ok, line, l3, st_isvaliddetail(poly) AS d FROM g)
      SELECT p_partkey,
             size(st_linesegments(line)) AS n_segs,
             ROUND(st_length(element_at(st_linesegments(line), -1)), 9) AS last_len,
             ROUND(st_x(st_3dlineinterpolatepoint(l3, 0.25D)), 9) AS x25,
             ROUND(st_z(st_3dlineinterpolatepoint(l3, 0.25D)), 9) AS z25,
             d.valid AS is_valid, d.reason AS reason,
             ROUND(st_x(d.location), 9) AS loc_x, ROUND(st_y(d.location), 9) AS loc_y
      FROM v ORDER BY p_partkey""")),

    // ----- text analysis (§2.11) -----
    "doc_token_count" -> ((s, d) => prep(s, d).sql("""
      SELECT doc_id, SIZE(SPLIT(TRIM(text), ' +')) AS n_tokens FROM documents ORDER BY doc_id""")),

    "doc_char_stats" -> ((s, d) => prep(s, d).sql("""
      SELECT doc_id, LENGTH(text) AS len,
             LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) AS n_spaces,
             n_chars
      FROM documents ORDER BY doc_id""")),

    // exact interpolated percentiles per source (corpus length profiling);
    // Spark percentile == DuckDB quantile_cont (both p*(n-1) linear interp)
    "doc_length_quantiles" -> ((s, d) => prep(s, d).sql("""
      SELECT source,
             percentile(n_chars, 0.5D) AS p50,
             percentile(n_chars, 0.9D) AS p90,
             percentile(n_chars, 0.99D) AS p99,
             CAST(MIN(n_chars) AS BIGINT) AS min_len,
             CAST(MAX(n_chars) AS BIGINT) AS max_len
      FROM documents GROUP BY source ORDER BY source""")),

    "dedup_exact" -> ((s, d) => prep(s, d).sql("""
      SELECT MIN(doc_id) AS keep_id, COUNT(*) AS copies
      FROM documents GROUP BY text ORDER BY keep_id""")),

    // ----- dedup (§2.9) -----
    "dedup_jaccard_exact" -> ((s, d) => prep(s, d).sql("""
      WITH t AS (SELECT doc_id, array_distinct(split(trim(text), ' +')) AS w
                 FROM documents WHERE doc_id < 60)
      SELECT a.doc_id AS id1, b.doc_id AS id2,
             CAST(size(array_intersect(a.w, b.w)) AS DOUBLE)
               / (size(a.w) + size(b.w) - size(array_intersect(a.w, b.w))) AS jaccard
      FROM t a JOIN t b ON a.doc_id < b.doc_id
      WHERE CAST(size(array_intersect(a.w, b.w)) AS DOUBLE)
               / (size(a.w) + size(b.w) - size(array_intersect(a.w, b.w))) >= 0.2
      ORDER BY id1, id2""")),

    "dedup_minhash_pairs" -> ((s, d) => {
      prep(s, d)
      graft.ops.Dedup.minhashDedup(s.table("documents"), col("doc_id"), col("text"),
          threshold = 0.4, shingleK = 5, numHashes = 128, bands = 16)
        .orderBy("id1", "id2")
    }),

    "dedup_near_clusters" -> ((s, d) => {
      prep(s, d)
      graft.ops.Dedup.clusterPairs(
          graft.ops.Dedup.minhashDedup(s.table("documents"), col("doc_id"), col("text"),
            threshold = 0.4, shingleK = 5))
        .orderBy("id")
    }),

    // portable 16-bit simhash (polynomial token hash) so the banded
    // candidate join is DuckDB-replicable — the oracle recomputes the
    // same signatures and the EXACT all-pairs hamming answer; pigeonhole
    // banding must therefore have perfect recall to hash-match. The
    // xxhash64-based 64-bit variant stays spec-covered (OpsSpec).
    "dedup_simhash_pairs" -> ((s, d) => {
      prep(s, d)
      graft.ops.Dedup.simhashCandidatesPortable(s.table("documents"), col("doc_id"), col("text"),
          maxHamming = 1)
        .orderBy("id1", "id2")
    }),

    // The raw embeddings table is near-random (max pairwise cos ~0.6), so a
    // high-threshold near-dup query over it alone is vacuous. Seed one
    // deterministic near-duplicate per vector IN THE FLOW (x*0.95 + 0.005,
    // cos >= 0.999 vs its source; background pairs stay <= 0.62) — the same
    // construction is exactly expressible in the DuckDB oracle, which
    // computes the EXACT all-pairs answer; banded LSH must recall 100% of
    // it to hash-match. ids only (cos floats can differ in the last ulp
    // between engines).
    "dedup_embedding_pairs" -> ((s, d) => {
      prep(s, d)
      val base = s.table("embeddings").select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
      val pert = s.table("embeddings").select((col("vec_id") + 100000).as("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE) * 0.95D + 0.005D)").as("emb"))
      graft.ops.Similarity.cosineNearDupPairs(base.union(pert), col("emb"),
          col("vec_id"), threshold = 0.9, bitsPerBand = 16, bands = 8)
        .select("id1", "id2")
        .orderBy("id1", "id2")
    }),

    // SemDedup (cluster-bucketed semantic dedup) end-to-end: same seeded
    // near-dup construction as dedup_embedding_pairs; iters=0 pins the
    // k-means centroids to vectors 0..7 so the oracle replays cluster
    // assignment (argmax cosine, lowest cluster on ties) AND the greedy
    // within-cluster drop set in closed form. A twin that lands in a
    // DIFFERENT cluster than its source must KEEP (SemDedup's semantics:
    // pairs never straddle clusters) — the oracle checks that boundary
    // behavior too, not just the pair recall.
    "cluster_semdedup" -> ((s, d) => {
      prep(s, d)
      val base = s.table("embeddings").select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
      val pert = s.table("embeddings").select((col("vec_id") + 100000).as("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE) * 0.95D + 0.005D)").as("emb"))
      graft.ops.Similarity.semDedup(base.union(pert), col("emb"), col("vec_id"),
          k = 8, tau = 0.9, iters = 0)
        .orderBy("vec_id")
    }),

    // KNN-graph machinery under a verifiable contract: same seeded
    // construction as dedup_embedding_pairs (one cos>=0.999 twin per
    // vector, background <=0.62), k=1 — every seeded vector's nearest
    // neighbor MUST be its source, which the oracle states in closed form.
    // The banded candidate generation must recall every seeded pair AND
    // rank it first to hash-match. The unseeded corpus-wide variant stays
    // rows-only (ann_knn_graph) — exact recall there is not guaranteeable.
    "ann_knn_graph_seeded" -> ((s, d) => {
      prep(s, d)
      val base = s.table("embeddings").select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
      val pert = s.table("embeddings").select((col("vec_id") + 100000).as("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE) * 0.95D + 0.005D)").as("emb"))
      graft.ops.Similarity.knnGraph(base.union(pert), col("emb"), col("vec_id"),
          k = 1, bitsPerBand = 16, bands = 8)
        .where(col("id1") >= 100000)
        .select("id1", "id2")
        .orderBy("id1")
    }),

    // ----- similarity search (§2.10) -----
    "ann_brute_top10" -> ((s, d) => {
      prep(s, d)
      val q = s.table("embeddings").where(col("vec_id") === 0)
        .select("embedding").head.getSeq[Float](0).toArray
      import org.apache.spark.sql.expressions.Window
      graft.ops.Similarity.bruteTopK(s.table("embeddings"), col("embedding"), col("vec_id"), q, 10)
        .withColumn("rank", row_number().over(Window.orderBy(desc("score"), asc("vec_id"))))
        .select(col("vec_id"), col("rank"))
        .orderBy("rank")
    }),

    // maxHamming is corpus-tuned: 12 is the measured max signature distance
    // of the true top-10 across ALL verify SFs (tools/LshRecallProbe:
    // sf0.001 peaks at 12 — vec 483; sf0.01/sf0.1 at 10), so the prefilter
    // passes every true neighbor and the result equals the exact top-10 —
    // which is what the DuckDB oracle computes. (The old value 10 was tuned
    // against one SF and silently missed sf0.001's hamming-12 neighbor —
    // caught by this round's full small-SF selfcheck.) On a real
    // (clustered) corpus the same structure runs with a much tighter
    // threshold; the recall/threshold trade-off itself is covered by the
    // OpsSpec recall spec, the oracle checks the prefilter+rerank machinery.
    "ann_lsh_top10" -> ((s, d) => {
      prep(s, d)
      val q = s.table("embeddings").where(col("vec_id") === 0)
        .select("embedding").head.getSeq[Float](0).toArray
      import org.apache.spark.sql.expressions.Window
      graft.ops.Similarity.lshTopK(s.table("embeddings"), col("embedding"), col("vec_id"),
          q, k = 10, nbits = 16, maxHamming = 12)
        .withColumn("rank", row_number().over(Window.orderBy(desc("score"), asc("vec_id"))))
        .select(col("vec_id"), col("rank"))
        .orderBy("rank")
    }),

    // Batch ANN over a deterministic query subsample (vec_id % 20 == 0)
    // against the full corpus. Band config is corpus-tuned for EXACT
    // recall at the verify SF (KnnGraphProbe: bits=3/bands=48 recalls
    // 125/125 true top-5 pairs, with margin down to bands=32), so the
    // output equals the exact per-query top-5 — which is what the DuckDB
    // oracle computes. Same contract note as ann_lsh_top10/ann_ivf_top10:
    // the recall-vs-params trade-off is covered by the OpsSpec recall
    // specs; the oracle checks the banded candidate + rerank machinery
    // end-to-end. (The corpus-wide graph variant stays oracle-verified via
    // its seeded twin ann_knn_graph_seeded.)
    "ann_knn_graph" -> ((s, d) => {
      prep(s, d)
      graft.ops.Similarity.knnQueries(s.table("embeddings"), col("embedding"), col("vec_id"),
          isQuery = col("vec_id") % 20 === 0, k = 5, bitsPerBand = 3, bands = 48)
        .select("id1", "id2", "knn_rank")
        .orderBy("id1", "knn_rank")
    }),

    // nprobe=5 covers every cluster holding a true top-10 neighbor at the
    // verify SF (AnnProbe: clusters 0/5/7, probe order 0,7,6,3,5), making
    // the probed search exact — the oracle is the exact top-10. Same
    // contract note as ann_lsh_top10: recall-vs-nprobe is spec'd
    // separately; the oracle checks the assign/probe/rerank machinery.
    "ann_ivf_top10" -> ((s, d) => {
      prep(s, d)
      val q = s.table("embeddings").where(col("vec_id") === 0)
        .select("embedding").head.getSeq[Float](0).toArray
      val (assigned, cents) = graft.ops.Similarity.kmeansAssign(
        s.table("embeddings"), col("embedding"), col("vec_id"), k = 8, iters = 2)
      import org.apache.spark.sql.expressions.Window
      graft.ops.Similarity.ivfTopK(assigned, cents, q, k = 10, nprobe = 5)
        .withColumn("rank", row_number().over(Window.orderBy(desc("score"), asc("vec_id"))))
        .select(col("vec_id"), col("rank"))
        .orderBy("rank")
    }),

    // Persisted IVF index: k-means runs ONCE at build; the returned
    // result is the SECOND probe of the stored index (centroids +
    // cluster-partitioned vectors as geo tables), so the oracle verifies
    // the store→prune→probe machinery, not a fresh clustering. Same
    // corpus-tuned exactness contract as ann_ivf_top10 (nprobe=5 covers
    // every true top-10 neighbor's cluster at the verify SF).
    "ann_ivf_persisted_top10" -> ((s, d) => {
      prep(s, d)
      val q = s.table("embeddings").where(col("vec_id") === 0)
        .select("embedding").head.getSeq[Float](0).toArray
      val idx = java.nio.file.Files.createTempDirectory("graft_ivf_idx").toString + "/i"
      graft.ops.Similarity.buildIvfIndex(s, idx,
        s.table("embeddings"), col("embedding"), col("vec_id"), k = 8, iters = 2)
      graft.ops.Similarity.ivfSearch(s, idx, q, k = 10, nprobe = 5).count() // first probe
      import org.apache.spark.sql.expressions.Window
      graft.ops.Similarity.ivfSearch(s, idx, q, k = 10, nprobe = 5)       // second probe
        .withColumn("rank", row_number().over(Window.orderBy(desc("score"), asc("vec_id"))))
        .select(col("vec_id"), col("rank"))
        .orderBy("rank")
    }),

    // Incremental index ingest: build the persisted IVF on HALF the
    // corpus, appendToIvfIndex the other half (nearest-centroid assign
    // against the STORED centroids, cluster-clustered append, NO
    // re-training — the 100 TB ingest shape), then probe ALL k clusters:
    // the post-append top-10 must equal brute force over the WHOLE corpus
    // (the same DuckDB oracle every ANN query answers to), so an append
    // that drops, duplicates, or corrupts a vector changes the hash.
    // nprobe = k because half-corpus centroids shift the cluster geometry
    // (a true neighbor can legally sit outside any fixed probe subset —
    // inherent IVF approximation, not an append defect); probe
    // SELECTIVITY after append is pinned by SimilaritySpec at its tuning.
    "ann_ivf_append_top10" -> ((s, d) => {
      prep(s, d)
      val q = s.table("embeddings").where(col("vec_id") === 0)
        .select("embedding").head.getSeq[Float](0).toArray
      val idx = java.nio.file.Files.createTempDirectory("graft_ivf_app").toString + "/i"
      graft.ops.Similarity.buildIvfIndex(s, idx,
        s.table("embeddings").where(col("vec_id") % 2 === 0),
        col("embedding"), col("vec_id"), k = 8, iters = 2)
      graft.ops.Similarity.appendToIvfIndex(s, idx,
        s.table("embeddings").where(col("vec_id") % 2 === 1),
        col("embedding"), col("vec_id"))
      import org.apache.spark.sql.expressions.Window
      graft.ops.Similarity.ivfSearch(s, idx, q, k = 10, nprobe = 8)
        .withColumn("rank", row_number().over(Window.orderBy(desc("score"), asc("vec_id"))))
        .select(col("vec_id"), col("rank"))
        .orderBy("rank")
    }),

    // Full index churn: build on half the corpus, append the rest, then
    // REMOVE a slice by id (the post-build curation verb — dedup
    // verdicts, takedowns). The removal is one equality-delete sidecar
    // commit (O(keys), no vector rewrite); the probe's cluster-pruned
    // scan merges the sidecar, so the result must equal brute force over
    // exactly the surviving vectors (nprobe=8 covers all clusters at the
    // verify SFs → exact).
    "ann_ivf_delete_top10" -> ((s, d) => {
      prep(s, d)
      val q = s.table("embeddings").where(col("vec_id") === 0)
        .select("embedding").head.getSeq[Float](0).toArray
      val idx = java.nio.file.Files.createTempDirectory("graft_ivf_del").toString + "/i"
      graft.ops.Similarity.buildIvfIndex(s, idx,
        s.table("embeddings").where(col("vec_id") % 2 === 0),
        col("embedding"), col("vec_id"), k = 8, iters = 2)
      graft.ops.Similarity.appendToIvfIndex(s, idx,
        s.table("embeddings").where(col("vec_id") % 2 === 1),
        col("embedding"), col("vec_id"))
      graft.ops.Similarity.removeFromIvfIndex(s, idx,
        s.table("embeddings").where(col("vec_id") % 5 === 2).select("vec_id"))
      import org.apache.spark.sql.expressions.Window
      graft.ops.Similarity.ivfSearch(s, idx, q, k = 10, nprobe = 8)
        .withColumn("rank", row_number().over(Window.orderBy(desc("score"), asc("vec_id"))))
        .select(col("vec_id"), col("rank"))
        .orderBy("rank")
    }),

    // CDC replacement: build over the whole corpus, then UPSERT a slice
    // with a deterministically transformed embedding (negation — exact
    // in IEEE floats, so DuckDB replays it bit-for-bit). The replaced
    // vectors' OLD embeddings must never surface; the new ones probe
    // immediately (fresh rows out-sequence the removal's delete).
    "ann_ivf_upsert_top10" -> ((s, d) => {
      prep(s, d)
      val q = s.table("embeddings").where(col("vec_id") === 0)
        .select("embedding").head.getSeq[Float](0).toArray
      val idx = java.nio.file.Files.createTempDirectory("graft_ivf_ups").toString + "/i"
      graft.ops.Similarity.buildIvfIndex(s, idx,
        s.table("embeddings"), col("embedding"), col("vec_id"), k = 8, iters = 2)
      graft.ops.Similarity.upsertIvfIndex(s, idx,
        s.table("embeddings").where(col("vec_id") % 7 === 1)
          .select(col("vec_id"),
            transform(col("embedding"), x => -x).as("embedding")),
        col("embedding"), col("vec_id"))
      import org.apache.spark.sql.expressions.Window
      graft.ops.Similarity.ivfSearch(s, idx, q, k = 10, nprobe = 8)
        .withColumn("rank", row_number().over(Window.orderBy(desc("score"), asc("vec_id"))))
        .select(col("vec_id"), col("rank"))
        .orderBy("rank")
    }),

    // The REBUILD maintenance verb (tools/ChurnScale's recipe, closing
    // the index lifecycle: build -> append -> remove -> upsert -> stream
    // -> REBUILD): build IVF-PQ, churn it (remove one slice, upsert
    // another with negated embeddings — exact in IEEE floats), then
    // rebuildIvfIndex over the survivors at a fresh root. Training
    // params (k, m, pqK) come back from the STORED tables — callers
    // never re-specify them. The rebuilt index must probe EXACTLY brute
    // force over the churned corpus (nprobe=all, covering pool) and
    // start sidecar-free (require'd).
    "ann_ivf_rebuild_top10" -> ((s, d) => {
      prep(s, d)
      val q = s.table("embeddings").where(col("vec_id") === 0)
        .select("embedding").head.getSeq[Float](0).toArray
      val base = java.nio.file.Files.createTempDirectory("graft_ivf_rb").toString
      val idx = base + "/i"
      val idx2 = base + "/i2"
      graft.ops.Similarity.buildIvfPqIndex(s, idx,
        s.table("embeddings"), col("embedding"), col("vec_id"),
        k = 8, iters = 2, m = 16, pqK = 16)
      graft.ops.Similarity.removeFromIvfIndex(s, idx,
        s.table("embeddings").where(col("vec_id") % 5 === 2).select("vec_id"))
      graft.ops.Similarity.upsertIvfIndex(s, idx,
        s.table("embeddings")
          .where(col("vec_id") % 7 === 1 && col("vec_id") % 5 =!= 2)
          .select(col("vec_id"),
            transform(col("embedding"), x => -x).as("embedding")),
        col("embedding"), col("vec_id"))
      val rebuilt = graft.ops.Similarity.rebuildIvfIndex(s, idx, idx2)
      require(rebuilt == graft.tables.GeoTable.read(s, s"$idx/vectors").count(),
        "rebuild must carry every survivor")
      require(graft.tables.GeoManifest.read(s, s"$idx2/vectors").eqDeletes.isEmpty,
        "a rebuilt index starts sidecar-free")
      import org.apache.spark.sql.expressions.Window
      graft.ops.Similarity.ivfPqSearch(s, idx2, q, k = 10, nprobe = 8,
          candidates = 512)
        .withColumn("rank", row_number().over(Window.orderBy(desc("score"), asc("vec_id"))))
        .select(col("vec_id"), col("rank"))
        .orderBy("rank")
    }),

    // Persisted IVF-PQ: the composed 100 TB ANN shape. Build pays both
    // Lloyd's levels once and stores vectors (+ PQ codes) cluster-
    // partitioned with the centroid and codebook tables; the returned
    // result is the SECOND probe — coarse prune opens only the probed
    // clusters' FILES, the ADC sweep reads codes (never the floats), and
    // exact cosine reranks the 192-candidate pool. Exact under the two
    // composed recall contracts (nprobe cluster coverage x candidate
    // pool coverage), which the brute oracle pins at the verify SFs.
    "ann_ivfpq_top10" -> ((s, d) => {
      prep(s, d)
      val q = s.table("embeddings").where(col("vec_id") === 0)
        .select("embedding").head.getSeq[Float](0).toArray
      val idx = java.nio.file.Files.createTempDirectory("graft_ivfpq_idx").toString + "/i"
      graft.ops.Similarity.buildIvfPqIndex(s, idx,
        s.table("embeddings"), col("embedding"), col("vec_id"),
        k = 8, iters = 2, m = 16, pqK = 16)
      graft.ops.Similarity.ivfPqSearch(s, idx, q, k = 10, nprobe = 5,
        candidates = 192).count() // first probe
      import org.apache.spark.sql.expressions.Window
      graft.ops.Similarity.ivfPqSearch(s, idx, q, k = 10, nprobe = 5,
          candidates = 192) // second probe
        .withColumn("rank", row_number().over(Window.orderBy(desc("score"), asc("vec_id"))))
        .select(col("vec_id"), col("rank"))
        .orderBy("rank")
    }),

    // Product quantization: codebooks train on a driver sample, vectors
    // encode to m=16 4-bit codes, the candidate sweep reads ONLY codes
    // (asymmetric distance: one 16x16 lut per query), exact cosine
    // reranks the pool. Exactness contract: the 192-candidate pool
    // covers the true top-10 at the verify SFs, so approximate == exact
    // and the brute-force oracle hash-matches bit-for-bit.
    "ann_pq_top10" -> ((s, d) => {
      prep(s, d)
      val q = s.table("embeddings").where(col("vec_id") === 0)
        .select("embedding").head.getSeq[Float](0).toArray
      val cb = graft.ops.Similarity.pqTrain(
        s.table("embeddings"), col("embedding"), col("vec_id"), m = 16, k = 16)
      val enc = graft.ops.Similarity.pqEncode(
        s.table("embeddings"), col("embedding"), col("vec_id"), cb)
      import org.apache.spark.sql.expressions.Window
      graft.ops.Similarity.pqTopK(enc, cb, q, k = 10, candidates = 192)
        .withColumn("rank", row_number().over(Window.orderBy(desc("score"), asc("vec_id"))))
        .select(col("vec_id"), col("rank"))
        .orderBy("rank")
    }),

    // ----- text analysis (§2.11) -----
    "text_quality_components" -> ((s, d) => prep(s, d).sql("""
      SELECT doc_id,
             SIZE(SPLIT(TRIM(text), ' +')) AS n_tokens,
             SIZE(FILTER(SPLIT(TRIM(text), ' +'),
                  x -> x IN ('the','a','an','of','and','to','in','is','for','on'))) AS n_stop
      FROM documents ORDER BY doc_id""")),

    "text_quality_score" -> ((s, d) => {
      prep(s, d)
      s.table("documents").select(col("doc_id"),
          graft.ops.TextAnalysis.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id")
    }),

    "text_langid" -> ((s, d) => {
      prep(s, d)
      s.table("documents").select(col("doc_id"),
          graft.ops.TextAnalysis.langId(col("text")).as("pred_lang"))
        .orderBy("doc_id")
    }),

    // Gopher rule battery (Rae et al. 2021): every component is an exact
    // integer and the verdict is cross-multiplied integer comparisons,
    // so the oracle replays components AND verdict bit-exactly
    "text_gopher_rules" -> ((s, d) => {
      prep(s, d)
      s.table("documents")
        .select(col("doc_id"),
          graft.ops.TextAnalysis.gopherStats(col("text")).as("g"))
        .select(col("doc_id"), col("g.n_words"), col("g.sum_word_len"),
          col("g.n_symbol_words"), col("g.n_alpha_words"), col("g.n_stop_hits"),
          col("g.passes"))
        .orderBy("doc_id")
    }),

    // Persisted BM25 index: build once (postings geo table bucketed by
    // term + one-row stats), probe via a term-IN scan that file-prunes to
    // the query terms' buckets. Must produce the exact ranking of the
    // ad-hoc BM25 query — same oracle (the stored-index machinery cannot
    // change a single score).
    "text_bm25_indexed_topk" -> ((s, d) => {
      prep(s, d)
      import org.apache.spark.sql.expressions.Window
      val idx = java.nio.file.Files.createTempDirectory("graft_bm25").toString + "/i"
      graft.ops.TextAnalysis.buildTextIndex(s, idx,
        s.table("documents"), col("doc_id"), col("text"))
      graft.ops.TextAnalysis.bm25Search(s, idx,
          query = Seq("spark", "customer", "merge"), k = 10)
        .withColumn("rank", row_number().over(
          Window.orderBy(round(col("score"), 6).desc, asc("doc_id"))))
        .select(col("doc_id"), col("rank"))
        .orderBy("rank")
    }),

    // Incremental BM25 index ingest: build on HALF the corpus, append
    // the other half (postings append bucket-clustered, stats merge by
    // recovering n*avgdl — no re-tokenize of existing postings), probe.
    // Must reproduce the ad-hoc BM25 ranking over the WHOLE corpus —
    // same oracle; a dropped/duplicated posting or a drifted stats row
    // changes the ranking.
    "text_bm25_append_topk" -> ((s, d) => {
      prep(s, d)
      import org.apache.spark.sql.expressions.Window
      val idx = java.nio.file.Files.createTempDirectory("graft_bm25a").toString + "/i"
      val docs = s.table("documents")
      graft.ops.TextAnalysis.buildTextIndex(s, idx,
        docs.where(col("doc_id") % 2 === 0), col("doc_id"), col("text"))
      graft.ops.TextAnalysis.appendToTextIndex(s, idx,
        docs.where(col("doc_id") % 2 === 1), col("doc_id"), col("text"))
      graft.ops.TextAnalysis.bm25Search(s, idx,
          query = Seq("spark", "customer", "merge"), k = 10)
        .withColumn("rank", row_number().over(
          Window.orderBy(round(col("score"), 6).desc, asc("doc_id"))))
        .select(col("doc_id"), col("rank"))
        .orderBy("rank")
    }),

    // STREAMED BM25 index ingest, exactly-once: build on the even half,
    // stream the odd half in (maxFilesPerTrigger=1 forces >= 2
    // micro-batches, require'd in-query), each batch committing postings
    // + stats + its epoch watermark atomically. A manual re-delivery of
    // the last batch id must be a no-op (watermark skip, version
    // unchanged — require'd). Probe must equal ad-hoc BM25 over the
    // union corpus: a dropped, doubled, or stats-skewed epoch changes
    // the hash. Shares the ad-hoc oracle.
    "text_bm25_stream_ingest" -> ((s, d) => {
      prep(s, d)
      import org.apache.spark.sql.expressions.Window
      val base = java.nio.file.Files.createTempDirectory("graft_bm25s").toString
      val idx = base + "/i"
      val srcDir = base + "/files"
      val docs = s.table("documents")
      graft.ops.TextAnalysis.buildTextIndex(s, idx,
        docs.where(col("doc_id") % 2 === 0), col("doc_id"), col("text"))
      // two sequential one-file writes: >= 2 source files (hence >= 2
      // micro-batches under maxFilesPerTrigger=1) in ANY session config —
      // a hash repartition can land both keys in one partition
      val odd = docs.where(col("doc_id") % 2 === 1).select("doc_id", "text")
      odd.where((col("doc_id") / 2).cast("long") % 2 === 0)
        .coalesce(1).write.parquet(srcDir)
      odd.where((col("doc_id") / 2).cast("long") % 2 === 1)
        .coalesce(1).write.mode("append").parquet(srcDir)
      val schema = s.read.parquet(srcDir).schema
      val stream = s.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(srcDir)
      val q = graft.ops.TextAnalysis.textIndexSink(stream, idx,
        col("doc_id"), col("text"), base + "/ck").start()
      q.processAllAvailable(); q.stop()
      val m = graft.tables.GeoManifest.read(s, idx + "/postings")
      val (sinkId, lastBatch) = m.streamCommits.toSeq.maxBy(_._2)
      require(lastBatch >= 1, s"expected >= 2 micro-batches, saw last id $lastBatch")
      // crash-replay idempotence: re-deliver the last batch id verbatim
      val replayed = graft.ops.TextAnalysis.appendToTextIndexBatch(s, idx,
        docs.where(col("doc_id") % 2 === 1), col("doc_id"), col("text"),
        sinkId, lastBatch)
      require(!replayed &&
          graft.tables.GeoManifest.read(s, idx + "/postings").version == m.version,
        "a replayed micro-batch must be skipped by the watermark")
      graft.ops.TextAnalysis.bm25Search(s, idx,
          query = Seq("spark", "customer", "merge"), k = 10)
        .withColumn("rank", row_number().over(
          Window.orderBy(round(col("score"), 6).desc, asc("doc_id"))))
        .select(col("doc_id"), col("rank"))
        .orderBy("rank")
    }),

    // STREAMED ANN index ingest, exactly-once: build IVF on the even
    // half, stream the odd half (>= 2 micro-batches, replay no-op —
    // require'd in-query as above). Probe over ALL clusters so the
    // result is unconditionally exact — must hash-match brute force over
    // the whole corpus (a dropped/doubled vector changes it).
    "ann_ivf_stream_ingest" -> ((s, d) => {
      prep(s, d)
      import org.apache.spark.sql.expressions.Window
      val base = java.nio.file.Files.createTempDirectory("graft_ivfs").toString
      val idx = base + "/i"
      val srcDir = base + "/files"
      val emb = s.table("embeddings")
      val q0 = emb.where(col("vec_id") === 0)
        .select("embedding").head.getSeq[Float](0).toArray
      graft.ops.Similarity.buildIvfIndex(s, idx,
        emb.where(col("vec_id") % 2 === 0), col("embedding"), col("vec_id"),
        k = 8, iters = 2)
      val odd = emb.where(col("vec_id") % 2 === 1).select("vec_id", "embedding")
      odd.where((col("vec_id") / 2).cast("long") % 2 === 0)
        .coalesce(1).write.parquet(srcDir)
      odd.where((col("vec_id") / 2).cast("long") % 2 === 1)
        .coalesce(1).write.mode("append").parquet(srcDir)
      val schema = s.read.parquet(srcDir).schema
      val stream = s.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(srcDir)
      val q = graft.ops.Similarity.ivfIndexSink(stream, idx,
        col("embedding"), col("vec_id"), base + "/ck").start()
      q.processAllAvailable(); q.stop()
      val m = graft.tables.GeoManifest.read(s, idx + "/vectors")
      val (sinkId, lastBatch) = m.streamCommits.toSeq.maxBy(_._2)
      require(lastBatch >= 1, s"expected >= 2 micro-batches, saw last id $lastBatch")
      val replayed = graft.ops.Similarity.appendToIvfIndexBatch(s, idx,
        emb.where(col("vec_id") % 2 === 1), col("embedding"), col("vec_id"),
        sinkId, lastBatch)
      require(!replayed &&
          graft.tables.GeoManifest.read(s, idx + "/vectors").version == m.version,
        "a replayed micro-batch must be skipped by the watermark")
      graft.ops.Similarity.ivfSearch(s, idx, q0, k = 10, nprobe = 8)
        .withColumn("rank", row_number().over(Window.orderBy(desc("score"), asc("vec_id"))))
        .select(col("vec_id"), col("rank"))
        .orderBy("rank")
    }),

    // Full index churn for BM25: build on half, append the rest, REMOVE
    // a slice by doc id (the post-build curation verb). The removal is
    // one equality-delete sidecar on the postings table plus a stats-row
    // adjustment from the changelog's delete leg; the probe's pruned
    // scan merges the sidecar, so tf, df, N and avgdl all reflect
    // exactly the surviving corpus — the ranking must equal ad-hoc BM25
    // over `documents WHERE doc_id % 7 <> 3`.
    "text_bm25_delete_topk" -> ((s, d) => {
      prep(s, d)
      import org.apache.spark.sql.expressions.Window
      val idx = java.nio.file.Files.createTempDirectory("graft_bm25d").toString + "/i"
      val docs = s.table("documents")
      graft.ops.TextAnalysis.buildTextIndex(s, idx,
        docs.where(col("doc_id") % 2 === 0), col("doc_id"), col("text"))
      graft.ops.TextAnalysis.appendToTextIndex(s, idx,
        docs.where(col("doc_id") % 2 === 1), col("doc_id"), col("text"))
      graft.ops.TextAnalysis.removeFromTextIndex(s, idx,
        docs.where(col("doc_id") % 7 === 3).select("doc_id"))
      graft.ops.TextAnalysis.bm25Search(s, idx,
          query = Seq("spark", "customer", "merge"), k = 10)
        .withColumn("rank", row_number().over(
          Window.orderBy(round(col("score"), 6).desc, asc("doc_id"))))
        .select(col("doc_id"), col("rank"))
        .orderBy("rank")
    }),

    // CDC replacement for BM25: build over the whole corpus, UPSERT a
    // slice whose text gains two query-term hits (a concat both engines
    // spell identically) — the ranking must equal ad-hoc BM25 over the
    // modified corpus: replaced docs score under their NEW text (old
    // postings sequenced out), dl/avgdl/df all follow.
    "text_bm25_upsert_topk" -> ((s, d) => {
      prep(s, d)
      import org.apache.spark.sql.expressions.Window
      val idx = java.nio.file.Files.createTempDirectory("graft_bm25u").toString + "/i"
      val docs = s.table("documents")
      graft.ops.TextAnalysis.buildTextIndex(s, idx,
        docs, col("doc_id"), col("text"))
      graft.ops.TextAnalysis.upsertTextIndex(s, idx,
        docs.where(col("doc_id") % 5 === 0)
          .select(col("doc_id"), concat(col("text"), lit(" spark merge")).as("text")),
        col("doc_id"), col("text"))
      graft.ops.TextAnalysis.bm25Search(s, idx,
          query = Seq("spark", "customer", "merge"), k = 10)
        .withColumn("rank", row_number().over(
          Window.orderBy(round(col("score"), 6).desc, asc("doc_id"))))
        .select(col("doc_id"), col("rank"))
        .orderBy("rank")
    }),

    // Hybrid retrieval by reciprocal-rank fusion (Cormack, Clarke &
    // Büttcher, SIGIR 2009): BM25 lexical leg × brute-cosine dense leg
    // over the shared doc_id/vec_id space, each cut to its top-50,
    // fused as Σ 1/(60+rank). Rank-only output, same FP-robustness
    // argument as text_bm25_topk: the fused score is an exact function
    // of the legs' INTEGER ranks, but the BM25 leg's top-50 rank order
    // rests on double scores whose last ulp may differ across engines —
    // emitting ranks keeps the oracle pinned to the fused ORDER without
    // betting on leg-score ulps at every SF.
    "hybrid_rrf_top10" -> ((s, d) => {
      prep(s, d)
      import org.apache.spark.sql.expressions.Window
      val q = s.table("embeddings").where(col("vec_id") === 0)
        .select("embedding").head.getSeq[Float](0).toArray
      graft.ops.Retrieval.hybridTopK(
          s.table("documents"), col("doc_id"), col("text"),
          Seq("spark", "customer", "merge"),
          s.table("embeddings"), col("vec_id"), col("embedding"), q,
          k = 10)
        .withColumn("rank", row_number().over(
          Window.orderBy(desc("rrf_score"), asc("id"))))
        .select(col("id").as("doc_id"), col("rank"))
        .orderBy("rank")
    }),

    // The SAME fusion through persisted indexes: term-bucket-pruned BM25
    // probe + cluster-pruned IVF probe. The dense leg probes EVERY
    // cluster here so index-vs-oracle equality is unconditional at any
    // SF (selective nprobe is the production knob; its recall contract
    // is ann_ivf_top10's). Shares the ad-hoc oracle — the stored-index
    // machinery must not move a single fused rank.
    "hybrid_rrf_indexed_top10" -> ((s, d) => {
      prep(s, d)
      import org.apache.spark.sql.expressions.Window
      val q = s.table("embeddings").where(col("vec_id") === 0)
        .select("embedding").head.getSeq[Float](0).toArray
      val tIdx = java.nio.file.Files.createTempDirectory("graft_hyb_t").toString + "/i"
      val vIdx = java.nio.file.Files.createTempDirectory("graft_hyb_v").toString + "/i"
      graft.ops.TextAnalysis.buildTextIndex(s, tIdx,
        s.table("documents"), col("doc_id"), col("text"))
      graft.ops.Similarity.buildIvfIndex(s, vIdx,
        s.table("embeddings"), col("embedding"), col("vec_id"), k = 8, iters = 2)
      graft.ops.Retrieval.hybridSearch(s, tIdx, vIdx,
          Seq("spark", "customer", "merge"), q, k = 10, nprobe = 8)
        .withColumn("rank", row_number().over(
          Window.orderBy(desc("rrf_score"), asc("id"))))
        .select(col("id").as("doc_id"), col("rank"))
        .orderBy("rank")
    }),

    // The fusion again with the dense leg on a persisted IVF-PQ index:
    // hybridSearch auto-detects the stored codebooks and routes through
    // ivfPqSearch, whose ADC sweep scans (vec_id, pq_code) ONLY — the
    // float column loads for the ≤candidates rerank pool alone (the
    // 100 TB probe shape; OpsSpec asserts the codes-only read schema).
    // nprobe covers every cluster and candidates=512 covers the whole
    // 500-row corpus, so the PQ leg is unconditionally exact and the
    // query shares the ad-hoc oracle — the quantized machinery must not
    // move a single fused rank.
    "hybrid_rrf_pq_top10" -> ((s, d) => {
      prep(s, d)
      import org.apache.spark.sql.expressions.Window
      val q = s.table("embeddings").where(col("vec_id") === 0)
        .select("embedding").head.getSeq[Float](0).toArray
      val tIdx = java.nio.file.Files.createTempDirectory("graft_hybp_t").toString + "/i"
      val vIdx = java.nio.file.Files.createTempDirectory("graft_hybp_v").toString + "/i"
      graft.ops.TextAnalysis.buildTextIndex(s, tIdx,
        s.table("documents"), col("doc_id"), col("text"))
      graft.ops.Similarity.buildIvfPqIndex(s, vIdx,
        s.table("embeddings"), col("embedding"), col("vec_id"),
        k = 8, iters = 2, m = 16, pqK = 16)
      graft.ops.Retrieval.hybridSearch(s, tIdx, vIdx,
          Seq("spark", "customer", "merge"), q, k = 10, nprobe = 8,
          candidates = 512)
        .withColumn("rank", row_number().over(
          Window.orderBy(desc("rrf_score"), asc("id"))))
        .select(col("id").as("doc_id"), col("rank"))
        .orderBy("rank")
    }),

    // Okapi BM25 end-to-end: posting filter -> tf/df aggregations ->
    // idf/length-normalized scoring -> top-k. Rank-only output, ranked
    // by the score QUANTIZED to 6 decimals (adjacent ranks differ by
    // >=1e-3 at the verify SFs, far above the quantum): two docs with
    // the same tf vector + doc length tie EXACTLY in math but land ulps
    // apart under each engine's own parallel-sum addend order — DuckDB
    // even flips them run-to-run — so the doc_id tiebreak only engages
    // portably after quantization (both sides rank by round(score, 6)).
    "text_bm25_topk" -> ((s, d) => {
      prep(s, d)
      import org.apache.spark.sql.expressions.Window
      graft.ops.TextAnalysis.bm25TopK(s.table("documents"), col("doc_id"), col("text"),
          query = Seq("spark", "customer", "merge"), k = 10)
        .withColumn("rank", row_number().over(
          Window.orderBy(round(col("score"), 6).desc, asc("doc_id"))))
        .select(col("doc_id"), col("rank"))
        .orderBy("rank")
    }),

    // invariant oracle: the 64-bit fingerprint is a dedup key — distinct
    // fingerprints must equal distinct whitespace-normalized texts (the
    // hash value itself is engine-specific xxhash64, checked by spec)
    "text_fingerprint" -> ((s, d) => {
      prep(s, d)
      s.table("documents")
        .select(graft.ops.TextAnalysis.fingerprint(col("text")).as("fp"),
          regexp_replace(lower(trim(col("text"))), "\\s+", " ").as("norm"))
        .agg(countDistinct(col("fp")).as("n_fp"),
          countDistinct(col("norm")).as("n_text"))
    }),

    "text_bpeish_tokens" -> ((s, d) => {
      prep(s, d)
      s.table("documents").select(col("doc_id"),
          graft.ops.TextAnalysis.bpeishTokenCount(col("text")).as("n_pieces"))
        .orderBy("doc_id")
    }),

    "lang_distribution" -> ((s, d) => prep(s, d).sql("""
      SELECT lang, COUNT(*) AS n, SUM(n_chars) AS total_chars
      FROM documents GROUP BY lang ORDER BY lang""")),

    // ----- training-data assembly (§2.11+: packing / mixing / scrubbing) -----
    // GPT-style concat-then-chunk packing: per-doc chunk placement for
    // 64-token training sequences, token stream laid out source-major
    "pack_chunks" -> ((s, d) => {
      prep(s, d)
      val docs = s.table("documents")
      graft.ops.TrainingData.chunkPack(docs, col("doc_id"),
          graft.ops.TextAnalysis.tokenCount(col("text")), col("source"), seqLen = 64)
        .orderBy("doc_id")
    }),

    // binPack's bin ASSIGNMENT is partition-dependent by design (first-fit
    // per task), so the oracle pins its INVARIANTS, which are not: every
    // doc packed exactly once (count == distinct == input count), token
    // mass conserved, and no multi-doc bin over capacity (single oversize
    // docs get their own bin — the one legal overflow)
    "pack_bins_invariants" -> ((s, d) => {
      prep(s, d)
      val bins = graft.ops.TrainingData.binPack(
          s.table("documents"), col("doc_id"), col("n_chars"), seqLen = 4096)
        .localCheckpoint() // two aggregates below; pack once
      val totals = bins.agg(
        sum("n_docs").cast("bigint").as("total_docs"),
        sum("bin_tokens").cast("bigint").as("total_tokens"),
        sum(when(col("n_docs") > 1 && col("bin_tokens") > 4096, 1L)
          .otherwise(0L)).cast("bigint").as("overflow_bins"))
      val distinct = bins.select(explode(col("doc_ids")).as("d"))
        .agg(count_distinct(col("d")).as("distinct_docs"))
      totals.crossJoin(distinct)
        .select("total_docs", "distinct_docs", "total_tokens", "overflow_bins")
    }),

    // data-mixing rates: reshape toward a 50/25/25 token split across
    // src0/src1/src3 without upsampling (scarcest target source kept whole)
    "mix_weights" -> ((s, d) => {
      prep(s, d)
      graft.ops.TrainingData.mixtureWeights(s.table("documents"), col("source"),
        graft.ops.TextAnalysis.tokenCount(col("text")),
        Map("src0" -> 0.5, "src1" -> 0.25, "src3" -> 0.25))
    }),

    // the mixing filter itself: deterministic multiplicative-hash sample at
    // the mix_weights rates — kept ids are engine-independent arithmetic
    "mix_sample" -> ((s, d) => {
      prep(s, d)
      val docs = s.table("documents")
      val rates = graft.ops.TrainingData.mixtureWeights(docs, col("source"),
        graft.ops.TextAnalysis.tokenCount(col("text")),
        Map("src0" -> 0.5, "src1" -> 0.25, "src3" -> 0.25))
      graft.ops.TrainingData.stratifiedSample(docs, col("doc_id"), col("source"), rates)
        .select(col("doc_id"), col("source"))
        .orderBy("doc_id")
    }),

    // Per-source document cap (C4/FineWeb domain-cap curation): keep the
    // cap smallest hashUniform(doc_id) per source — an unbiased
    // deterministic without-replacement sample, replayed exactly by the
    // oracle (the Knuth-hash integer formula is engine-portable). The
    // pre-filter shrinks two sources UNDER the cap so the pass-through
    // path is exercised alongside the ranked path.
    "curate_source_cap" -> ((s, d) => {
      prep(s, d)
      val corpus = s.table("documents")
        .where(!(col("source").isin("src2", "src3") && col("doc_id") % 2 === 1))
      graft.ops.TrainingData.capPerSource(corpus, col("doc_id"), col("source"), cap = 15)
        .select(col("doc_id"), col("source"))
        .orderBy("doc_id")
    }),

    // decontamination: probe set = every 17th document (a stand-in
    // benchmark), word 5-gram overlap, self-pairs excluded — the oracle
    // computes the identical string-gram join
    "decontaminate_overlap" -> ((s, d) => {
      prep(s, d)
      val docs = s.table("documents")
      val probes = docs.where(col("doc_id") % 17 === 0)
      graft.ops.TrainingData.contamination(docs, col("doc_id"), col("text"),
          probes, col("doc_id").as("pid"), col("text"), n = 5)
        .where(col("doc_id") =!= col("probe_id"))
        .orderBy("doc_id", "probe_id")
    }),

    // unigram LM quality proxy: corpus token frequencies -> per-doc average
    // log-prob (ROUND 6: the per-doc sum is ~30 doubles, far from any
    // 1e-6 boundary)
    "text_unigram_logprob" -> ((s, d) => {
      prep(s, d)
      graft.ops.TrainingData.unigramLogProb(s.table("documents"),
          col("doc_id"), col("text"))
        .select(col("doc_id"), round(col("avg_logprob"), 6).as("avg_logprob"),
          col("n_tokens"))
        .orderBy("doc_id")
    }),

    // Gopher-style repetition signals over word bigrams
    "text_repetition" -> ((s, d) => {
      prep(s, d)
      graft.ops.TrainingData.repetitionMetrics(s.table("documents"),
          col("doc_id"), col("text"))
        .orderBy("doc_id")
    }),

    // PII scrub: emails/phones seeded deterministically IN THE FLOW (the
    // corpus itself is synthetic word soup), then counted + redacted; the
    // oracle replays the same seeding and the md5 of the redacted text
    "pii_redact" -> ((s, d) => {
      prep(s, d)
      val seeded = s.table("documents")
        .withColumn("text2",
          when(col("doc_id") % 7 === 0,
            concat(col("text"), lit(" contact user"),
              col("doc_id").cast("string"), lit("@example.com now")))
            .otherwise(col("text")))
        .withColumn("text2",
          when(col("doc_id") % 11 === 0,
            concat(col("text2"), lit(" call +1-555-"),
              lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
            .otherwise(col("text2")))
      graft.ops.TrainingData.redactPii(seeded, col("text2"))
        .select(col("doc_id"), col("n_emails"), col("n_phones"),
          md5(col("redacted")).as("redacted_md5"))
        .orderBy("doc_id")
    }),

    // Luhn-verified card redaction: one seeded VALID card (the classic
    // 4111111111111111) must redact, one INVALID 16-digit run (same
    // number, last digit bumped — fails the checksum) must SURVIVE:
    // checksum verification is the whole point (regex-only redaction
    // destroys order ids). Exact integer arithmetic on both sides.
    "pii_redact_cards" -> ((s, d) => {
      prep(s, d)
      val seeded = s.table("documents")
        .withColumn("text2",
          when(col("doc_id") % 13 === 0,
            concat(col("text"), lit(" card 4111111111111111 ok")))
            .otherwise(col("text")))
        .withColumn("text2",
          when(col("doc_id") % 17 === 0,
            concat(col("text2"), lit(" ref 4111111111111112 x")))
            .otherwise(col("text2")))
      graft.ops.TrainingData.redactCards(seeded, col("text2"))
        .select(col("doc_id"), col("n_cards"), md5(col("redacted")).as("redacted_md5"))
        .orderBy("doc_id")
    }),

    // ----- spatial SQL DML over GeoTable (§2.8; reference
    // TestSedonaIcebergExtension.scala:85-91) — a fresh copy-on-write table
    // per run, mutated through the SQL front-half, result read back from the
    // committed snapshot. DuckDB oracle computes the same end state
    // relationally, so UPDATE semantics (matched rows changed, others and
    // row count preserved) are hash-checked, not just smoke-checked.
    "geo_dml_update" -> ((s, d) => {
      prep(s, d); import GraftFunctions._
      val root = java.nio.file.Files.createTempDirectory("geo_dml_u").toString + "/t"
      val src = s.table("customer").select(col("c_custkey"), col("c_nationkey"),
        st_point(col("c_acctbal"), col("c_nationkey").cast("double")).as("geo"),
        lit(0).as("flag"))
      graft.tables.GeoTable.create(s, root, src, Some("geo"))
      graft.tables.GeoTable.register(s, "geo_dml_upd_t", root)
      graft.tables.GeoSql.exec(s,
        "UPDATE geo_dml_upd_t SET flag = 1 WHERE st_within(geo, st_makeenvelope(0.005D, -0.5D, 5000.005D, 10.5D))")
      graft.tables.GeoTable.read(s, root)
        .select(col("c_custkey"), col("flag")).orderBy("c_custkey")
    }),

    "geo_dml_delete" -> ((s, d) => {
      prep(s, d); import GraftFunctions._
      val root = java.nio.file.Files.createTempDirectory("geo_dml_d").toString + "/t"
      val src = s.table("customer").select(col("c_custkey"), col("c_nationkey"),
        st_point(col("c_acctbal"), col("c_nationkey").cast("double")).as("geo"))
      graft.tables.GeoTable.create(s, root, src, Some("geo"))
      graft.tables.GeoTable.register(s, "geo_dml_del_t", root)
      graft.tables.GeoSql.exec(s,
        "DELETE FROM geo_dml_del_t WHERE st_intersects(geo, st_makeenvelope(2000.005D, 4.5D, 9000.005D, 19.5D))")
      graft.tables.GeoTable.read(s, root)
        .groupBy("c_nationkey").agg(count(lit(1)).as("n")).orderBy("c_nationkey")
    }),

    // Merge-on-read DELETE (Iceberg v2 position deletes): a sparse
    // predicate forced through the MoR path writes a (file, row-ordinal)
    // sidecar — no data file is rewritten (asserted) — and the read-side
    // anti-join must serve the same end state the CoW rewrite would.
    // DuckDB replays the end state relationally, so the sidecar merge is
    // hash-checked, not smoke-checked.
    "geo_dml_delete_mor" -> ((s, d) => {
      prep(s, d); import GraftFunctions._
      ensureGeoCatalog(s, "geomr", "geo_mr_wh")
      s.sql("CREATE NAMESPACE IF NOT EXISTS geomr.db")
      s.sql("DROP TABLE IF EXISTS geomr.db.dm")
      s.sql("CREATE TABLE geomr.db.dm (c_custkey BIGINT, c_nationkey BIGINT, geo BINARY) " +
        "USING geo TBLPROPERTIES('geometry.column'='geo')")
      s.sql("""INSERT INTO geomr.db.dm
               SELECT c_custkey, c_nationkey,
                      st_point(c_acctbal, CAST(c_nationkey AS DOUBLE)) FROM customer""")
      val root = s.conf.get("spark.sql.catalog.geomr.warehouse") + "/db/dm"
      val before = graft.tables.GeoManifest.read(s, root).files.map(_.key).toSet
      graft.tables.GeoTable.delete(s, root, expr("c_custkey % 97 = 0"), mode = "mor")
      val after = graft.tables.GeoManifest.read(s, root)
      require(after.files.map(_.key).toSet == before && after.deletes.nonEmpty,
        "merge-on-read delete must leave data files untouched and add a sidecar")
      // read back through the CATALOG scan: the sidecar anti-join runs
      // inside the DSv2 readers (row-index merge), not on the DataFrame
      // surface — deleted rows must not resurface and COUNT must not be
      // answered from parquet footers
      s.sql("""SELECT c_nationkey, COUNT(*) AS n, SUM(c_custkey) AS key_sum
               FROM geomr.db.dm GROUP BY c_nationkey ORDER BY c_nationkey""")
    }),

    // MERGE INTO end-state check: update + delete + insert in one statement
    // against a fresh copy-on-write table; DuckDB oracle reconstructs the
    // same end state relationally (left join for matched actions, anti-join
    // for inserts), so clause ordering AND row movement are hash-verified.
    "geo_dml_merge" -> ((s, d) => {
      prep(s, d); import GraftFunctions._
      val root = java.nio.file.Files.createTempDirectory("geo_dml_m").toString + "/t"
      val src = s.table("customer").select(col("c_custkey"), col("c_nationkey"),
        st_point(col("c_acctbal"), col("c_nationkey").cast("double")).as("geo"),
        lit(0).as("flag"))
      graft.tables.GeoTable.create(s, root, src, Some("geo"))
      graft.tables.GeoTable.register(s, "geo_dml_mrg_t", root)
      graft.tables.GeoSql.exec(s,
        """MERGE INTO geo_dml_mrg_t t USING (
          |  SELECT c_custkey AS sid, c_nationkey AS snat, c_acctbal AS sbal
          |  FROM customer WHERE c_custkey % 10 = 0
          |  UNION ALL
          |  SELECT c_custkey + 1000000, c_nationkey, c_acctbal
          |  FROM customer WHERE c_custkey % 100 = 0
          |) s ON t.c_custkey = s.sid
          |WHEN MATCHED AND s.snat < 5 THEN DELETE
          |WHEN MATCHED THEN UPDATE SET flag = 1
          |WHEN NOT MATCHED THEN INSERT (c_custkey, c_nationkey, geo, flag)
          |  VALUES (s.sid, s.snat, st_point(s.sbal, CAST(s.snat AS DOUBLE)), 2)
          |""".stripMargin)
      val out = graft.tables.GeoTable.read(s, root)
        .groupBy("flag").agg(count(lit(1)).as("n"),
          sum("c_custkey").as("key_sum")).orderBy("flag")
      graft.tables.GeoTable.drop(s, "geo_dml_mrg_t")
      out
    }),

    // schema evolution end-to-end: ADD COLUMN is a metadata-only commit,
    // pre-evolution rows read the new column as NULL, post-evolution
    // inserts carry values — the oracle restates the same end state
    // relationally (Iceberg-style evolution contract)
    "geo_ddl_evolution" -> ((s, d) => {
      prep(s, d); import GraftFunctions._
      val root = java.nio.file.Files.createTempDirectory("geo_evo").toString + "/t"
      val src = s.table("customer").where(col("c_custkey") % 2 === 0)
        .select(col("c_custkey"), col("c_nationkey"),
          st_point(col("c_acctbal"), col("c_nationkey").cast("double")).as("geo"))
      graft.tables.GeoTable.create(s, root, src, Some("geo"))
      graft.tables.GeoTable.register(s, "geo_evo_q_t", root)
      // multi-column ADD COLUMNS incl. a parameterized DECIMAL (the round-8
      // paren fix) exercised through the oracle, not just the spec
      graft.tables.GeoSql.exec(s,
        "ALTER TABLE geo_evo_q_t ADD COLUMNS (tier INT, score DECIMAL(10,2))")
      graft.tables.GeoSql.exec(s,
        """INSERT INTO geo_evo_q_t
          |SELECT c_custkey + 1000000, c_nationkey,
          |       st_point(c_acctbal, CAST(c_nationkey AS DOUBLE)),
          |       CAST(c_nationkey % 3 AS INT),
          |       CAST(c_nationkey AS DECIMAL(10,2)) / 4.0
          |FROM customer WHERE c_custkey % 2 = 1""".stripMargin)
      val out = graft.tables.GeoTable.read(s, root)
        .groupBy(coalesce(col("tier"), lit(-1)).as("tier"))
        .agg(count(lit(1)).as("n"), sum("c_custkey").as("key_sum"),
          sum(col("score")).cast("double").as("score_sum"))
        .orderBy("tier")
      graft.tables.GeoTable.drop(s, "geo_evo_q_t")
      out
    }),

    // CTAS roundtrip: write a table from a query, read the committed
    // snapshot back — storage must preserve every row and value exactly.
    "geo_ctas" -> ((s, d) => {
      prep(s, d); import GraftFunctions._
      val root = java.nio.file.Files.createTempDirectory("geo_ctas").toString + "/t"
      graft.tables.GeoSql.exec(s,
        s"""CREATE TABLE geo_ctas_t USING GEO LOCATION '$root' AS
           |SELECT c_custkey, c_nationkey,
           |       st_point(c_acctbal, CAST(c_nationkey AS DOUBLE)) AS geo
           |FROM customer WHERE c_acctbal > 0.005""".stripMargin)
      val out = graft.tables.GeoTable.read(s, root)
        .select(col("c_custkey"), col("c_nationkey"),
          st_x(col("geo")).as("x"), st_y(col("geo")).as("y"))
        .orderBy("c_custkey")
      graft.tables.GeoTable.drop(s, "geo_ctas_t")
      out
    }),

    // t.partitions metadata table, oracle-checked: per-partition ROW
    // counts are layout-independent (clustered writes roll files at
    // transform-tuple boundaries, so every file is single-valued on
    // days(dd) and partitions group exactly by day). DuckDB replays the
    // day ordinals + counts from the raw source; the in-query require
    // pins the single-valued rendering (a range label would mean the
    // write clustering contract broke). file_count is excluded — it IS
    // layout-dependent.
    "geo_partitions_meta" -> ((s, d) => {
      prep(s, d)
      ensureGeoCatalog(s, "geoptm", "geo_ptm_wh")
      s.sql("CREATE NAMESPACE IF NOT EXISTS geoptm.db")
      s.sql("DROP TABLE IF EXISTS geoptm.db.pd")
      s.sql("CREATE TABLE geoptm.db.pd (k BIGINT, dd DATE) USING geo " +
        "PARTITIONED BY (months(dd))")
      // rollMinRows=1 for THIS insert: files must roll at every month
      // boundary even where a month holds few rows (the default 4096 is
      // the right 100 TB behavior — tiny partitions share files — but
      // this query pins the per-tuple bookkeeping, so force the roll)
      val rollKey = "spark.graft.write.rollMinRows"
      val oldRoll = s.conf.getOption(rollKey)
      s.conf.set(rollKey, "1")
      try s.sql("INSERT INTO geoptm.db.pd SELECT o_orderkey, CAST(o_orderdate AS DATE) FROM orders")
      finally oldRoll match {
        case Some(v) => s.conf.set(rollKey, v)
        case None => s.conf.unset(rollKey)
      }
      val out = s.sql(
        "SELECT partition, row_count FROM geoptm.db.pd.partitions ORDER BY partition")
      require(out.collect().forall(_.getString(0).matches("""months\(dd\)=\d+""")),
        "partitions rendered a range or unknown label — clustered-write contract broke")
      s.sql("SELECT partition, row_count FROM geoptm.db.pd.partitions ORDER BY partition")
    }),

    // t.snapshots metadata table, oracle-checked on its layout-INDEPENDENT
    // columns: version sequence, operation verbs, cumulative total_rows and
    // the per-commit added_rows diff all follow from the verb sequence and
    // the source data alone (added/removed FILE counts are layout-dependent
    // and excluded). TRUNCATE exercises the removed-rows direction.
    "geo_snapshots_meta" -> ((s, d) => {
      prep(s, d)
      ensureGeoCatalog(s, "geoptm", "geo_ptm_wh")
      s.sql("CREATE NAMESPACE IF NOT EXISTS geoptm.db")
      s.sql("DROP TABLE IF EXISTS geoptm.db.snap")
      s.sql("CREATE TABLE geoptm.db.snap (k BIGINT) USING geo")
      s.sql("INSERT INTO geoptm.db.snap SELECT o_orderkey FROM orders WHERE o_orderkey % 2 = 0")
      s.sql("INSERT INTO geoptm.db.snap SELECT o_orderkey FROM orders WHERE o_orderkey % 2 = 1")
      s.sql("""SELECT version, operation, total_rows, added_rows
               FROM geoptm.db.snap.snapshots ORDER BY version""")
    }),

    // t.deletes metadata table, oracle-checked on its layout-independent
    // columns: keyed DELETEs commit equality-delete sidecars whose type /
    // key count / key columns / sequence / key range follow from the
    // statements alone (paths excluded). Pins the O(keys) route's
    // bookkeeping end-to-end.
    "geo_deletes_meta" -> ((s, d) => {
      prep(s, d)
      ensureGeoCatalog(s, "geoptm", "geo_ptm_wh")
      s.sql("CREATE NAMESPACE IF NOT EXISTS geoptm.db")
      s.sql("DROP TABLE IF EXISTS geoptm.db.ed")
      s.sql("CREATE TABLE geoptm.db.ed (id BIGINT, nat BIGINT) USING geo")
      s.sql("INSERT INTO geoptm.db.ed SELECT c_custkey, CAST(c_nationkey AS BIGINT) FROM customer")
      s.sql("DELETE FROM geoptm.db.ed WHERE id IN (4, 10, 22, 40, 78)")
      s.sql("DELETE FROM geoptm.db.ed WHERE id = 100")
      s.sql("""SELECT type, rows, key_columns, sequence, key_min, key_max
               FROM geoptm.db.ed.deletes ORDER BY sequence""")
    }),

    // t.refs metadata table, oracle-checked as literals: a known verb
    // sequence (tag at v1, branch forked at v2 and advanced to v3 by a
    // branch-table INSERT, a CALL create_tag pinned at snapshot 1 through
    // the bigint procedure surface) fully determines every row.
    "geo_refs_meta" -> ((s, d) => {
      prep(s, d)
      ensureGeoCatalog(s, "geoptm", "geo_ptm_wh")
      s.sql("CREATE NAMESPACE IF NOT EXISTS geoptm.db")
      s.sql("DROP TABLE IF EXISTS geoptm.db.rm")
      s.sql("CREATE TABLE geoptm.db.rm (k BIGINT) USING geo")
      s.sql("INSERT INTO geoptm.db.rm SELECT o_orderkey FROM orders WHERE o_orderkey % 2 = 0") // v1
      graft.tables.GeoSql.exec(s, "ALTER TABLE geoptm.db.rm CREATE TAG t1")
      s.sql("INSERT INTO geoptm.db.rm SELECT o_orderkey FROM orders WHERE o_orderkey % 2 = 1") // v2
      graft.tables.GeoSql.exec(s, "ALTER TABLE geoptm.db.rm CREATE BRANCH b1")
      s.sql("INSERT INTO geoptm.db.rm.branch_b1 SELECT o_orderkey FROM orders WHERE o_orderkey % 7 = 0") // b1 -> v3
      s.sql("CALL geoptm.system.create_tag(table => 'db.rm', tag => 't2', snapshot_id => 1)")
      s.sql("SELECT name, type, version FROM geoptm.db.rm.refs ORDER BY name")
    }),

    // t.all_files metadata table, oracle-checked on its layout-independent
    // aggregate: a keyed equality DELETE leaves the data files intact (v2
    // is sidecar-only), then a CALL compaction to ONE file retires every
    // v1 file — so live -> summed rows follows from the verbs and the
    // source counts alone (added_at_version is a v6-manifest surface and
    // reads 0 once compaction folds the deletes away, so it is excluded).
    // The single-live-file layout is require'd in-query
    // (target_file_count => 1 forces it).
    "geo_allfiles_meta" -> ((s, d) => {
      prep(s, d)
      ensureGeoCatalog(s, "geoptm", "geo_ptm_wh")
      s.sql("CREATE NAMESPACE IF NOT EXISTS geoptm.db")
      s.sql("DROP TABLE IF EXISTS geoptm.db.af")
      s.sql("CREATE TABLE geoptm.db.af (id BIGINT, nat BIGINT) USING geo")
      s.sql("INSERT INTO geoptm.db.af SELECT c_custkey, CAST(c_nationkey AS BIGINT) FROM customer") // v1
      s.sql("DELETE FROM geoptm.db.af WHERE id IN (7, 19, 23)") // v2: equality sidecar only
      s.sql("CALL geoptm.system.rewrite_data_files(table => 'db.af', target_file_count => 1)") // v3
      require(s.sql(
          "SELECT COUNT(*) FROM geoptm.db.af.all_files WHERE live").head.getLong(0) == 1,
        "compaction must leave exactly one live file")
      s.sql("""SELECT live, CAST(SUM(rows) AS BIGINT) AS n_rows
               FROM geoptm.db.af.all_files GROUP BY live ORDER BY live""")
    }),

    // FunctionCatalog transform functions invoked straight from SQL
    // (Iceberg SparkFunctions analog): truncate/days/months/years are
    // pure arithmetic DuckDB replays exactly — the same code path the
    // clustered writer and scan pruning evaluate, so a drifted transform
    // changes the hash. bucket() is excluded (murmur3 has no DuckDB
    // replay); its write/scan parity is property-tested in GeoFnSpec.
    "geo_transform_fns" -> ((s, d) => {
      prep(s, d)
      ensureGeoCatalog(s, "geoptm", "geo_ptm_wh")
      s.sql("""
        SELECT o_orderkey AS k,
               geoptm.system.truncate(1000, o_orderkey) AS trunc_k,
               geoptm.system.days(CAST(o_orderdate AS DATE)) AS d_days,
               geoptm.system.months(CAST(o_orderdate AS DATE)) AS d_months,
               geoptm.system.years(CAST(o_orderdate AS DATE)) AS d_years
        FROM orders ORDER BY k""")
    }),

    // partition-scoped OPTIMIZE ... WHERE: only the targeted partition's
    // files compact (require'd via t.partitions file counts — the other
    // partition's layout must be untouched); rows pass through for DuckDB.
    "geo_optimize_where" -> ((s, d) => {
      prep(s, d)
      ensureGeoCatalog(s, "geoptm", "geo_ptm_wh")
      s.sql("CREATE NAMESPACE IF NOT EXISTS geoptm.db")
      s.sql("DROP TABLE IF EXISTS geoptm.db.ow")
      s.sql("CREATE TABLE geoptm.db.ow (id BIGINT, nat BIGINT) USING geo " +
        "PARTITIONED BY (nat)")
      for (r <- 0 until 3)
        s.sql("INSERT INTO geoptm.db.ow SELECT c_custkey, CAST(c_nationkey % 2 AS BIGINT) " +
          s"FROM customer WHERE c_custkey % 3 = $r")
      def fileCount(p: String): Long = s.sql(
        s"SELECT file_count FROM geoptm.db.ow.partitions WHERE partition = '$p'")
        .head.getInt(0).toLong
      val (b0, b1) = (fileCount("nat=0"), fileCount("nat=1"))
      require(b0 >= 3 && b1 >= 3, s"expected >=3 files per partition, got $b0/$b1")
      graft.tables.GeoSql.exec(s, "OPTIMIZE geoptm.db.ow INTO 1 FILES WHERE nat = 0")
      val (a0, a1) = (fileCount("nat=0"), fileCount("nat=1"))
      require(a0 == 1, s"targeted partition not compacted to 1 file: $a0")
      require(a1 == b1, s"untargeted partition rewritten: $b1 -> $a1")
      s.sql("SELECT id, nat FROM geoptm.db.ow ORDER BY id")
    }),

    // MERGE with BOTH not-matched directions (Spark 3.4+ clause surface):
    // matched rows update, source-only rows insert, target-only rows split
    // between a conditional DELETE and a catch-all UPDATE. DuckDB has no
    // MERGE — the oracle replays the final state as set algebra over the
    // same predicates, so a mis-routed row in any clause changes the hash.
    "geo_merge_nmbs" -> ((s, d) => {
      prep(s, d)
      ensureGeoCatalog(s, "geoptm", "geo_ptm_wh")
      s.sql("CREATE NAMESPACE IF NOT EXISTS geoptm.db")
      s.sql("DROP TABLE IF EXISTS geoptm.db.mg")
      s.sql("CREATE TABLE geoptm.db.mg (id BIGINT, bal DOUBLE) USING geo")
      s.sql("""INSERT INTO geoptm.db.mg
               SELECT c_custkey, CAST(c_acctbal AS DOUBLE) FROM customer
               WHERE c_custkey % 3 = 0""")
      s.sql("""
        MERGE INTO geoptm.db.mg t
        USING (SELECT c_custkey AS id, CAST(c_acctbal AS DOUBLE) * 2 AS nb
               FROM customer WHERE c_custkey % 2 = 0) s
        ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET bal = s.nb
        WHEN NOT MATCHED THEN INSERT (id, bal) VALUES (s.id, s.nb)
        WHEN NOT MATCHED BY SOURCE AND t.id % 5 = 0 THEN DELETE
        WHEN NOT MATCHED BY SOURCE THEN UPDATE SET bal = -1.0""")
      s.sql("SELECT id, bal FROM geoptm.db.mg ORDER BY id")
    }),

    // OPTIMIZE ... SMALL BELOW n ROWS: three single-file VALUES inserts
    // land three sub-threshold files, one bulk insert lands full ones;
    // the verb must consolidate ONLY the small files (require'd via
    // t.files) while the rows pass through untouched for DuckDB to replay.
    "geo_optimize_small" -> ((s, d) => {
      prep(s, d)
      ensureGeoCatalog(s, "geoptm", "geo_ptm_wh")
      s.sql("CREATE NAMESPACE IF NOT EXISTS geoptm.db")
      s.sql("DROP TABLE IF EXISTS geoptm.db.sm")
      s.sql("CREATE TABLE geoptm.db.sm (k BIGINT, v STRING) USING geo")
      s.sql("INSERT INTO geoptm.db.sm VALUES (-1, 'a'), (-2, 'b'), (-3, 'c')")
      s.sql("INSERT INTO geoptm.db.sm VALUES (-4, 'd'), (-5, 'e')")
      s.sql("INSERT INTO geoptm.db.sm VALUES (-6, 'f')")
      s.sql("INSERT INTO geoptm.db.sm SELECT o_orderkey, o_orderstatus FROM orders")
      val before = s.sql(
        "SELECT COUNT(*) FROM geoptm.db.sm.files WHERE rows < 10").head.getLong(0)
      // >= 3: each VALUES insert lands AT LEAST one sub-threshold file
      // (local-relation parallelism may split rows further — layout)
      require(before >= 3, s"expected >=3 sub-threshold files before OPTIMIZE, got $before")
      graft.tables.GeoSql.exec(s, "OPTIMIZE geoptm.db.sm SMALL BELOW 10 ROWS")
      val after = s.sql(
        "SELECT COUNT(*) FROM geoptm.db.sm.files WHERE rows < 10").head.getLong(0)
      // <= 1, not == 1: a sub-threshold straggler from the bulk insert can
      // push the consolidated file to >= 10 rows (then after == 0) — the
      // verb's contract is consolidation, pinned by after < before
      require(after <= 1 && after < before,
        s"small files not consolidated: $before -> $after")
      s.sql("SELECT k, v FROM geoptm.db.sm ORDER BY k, v")
    }),

    // Iceberg stored-procedure spelling: the same maintenance verbs
    // through CALL cat.system.proc(k => v) — compact to one file, tag the
    // result, expire history — with the compaction and tag require'd
    // in-query; rows pass through untouched so DuckDB replays the inserts
    "geo_call_procedures" -> ((s, d) => {
      prep(s, d)
      ensureGeoCatalog(s, "geocall", "geo_call_wh")
      s.sql("CREATE NAMESPACE IF NOT EXISTS geocall.db")
      s.sql("DROP TABLE IF EXISTS geocall.db.mt")
      s.sql("CREATE TABLE geocall.db.mt (k BIGINT, price DOUBLE) USING geo")
      s.sql("INSERT INTO geocall.db.mt SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 3 = 0")
      s.sql("INSERT INTO geocall.db.mt SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 3 = 1")
      s.sql("CALL geocall.system.rewrite_data_files(table => 'db.mt', target_file_count => 1)")
      s.sql("CALL geocall.system.create_tag(table => 'db.mt', tag => 'post_compact')")
      s.sql("CALL geocall.system.expire_snapshots(table => 'db.mt', retain_last => 2)")
      val root = s.conf.get("spark.sql.catalog.geocall.warehouse").stripSuffix("/") + "/db/mt"
      require(graft.tables.GeoManifest.read(s, root).files.size == 1,
        "rewrite_data_files did not compact to one file")
      require(graft.tables.GeoManifest.refs(s, root).names.contains("post_compact"),
        "create_tag did not record the tag")
      s.sql("SELECT k, price FROM geocall.db.mt").orderBy("k")
    }),

    // CALL set_current_snapshot + ancestors_of with a starting snapshot:
    // the pointer moves BACKWARD to a named ancestor (phase 2's rows are
    // exactly the first insert) as a history-preserving commit, and the
    // ancestry chain read FROM that snapshot must be a proper tail of
    // the full chain (require'd in-query — timestamps are
    // nondeterministic, so the chain shape is pinned here and the row
    // states feed the hash).
    "geo_set_current_snapshot" -> ((s, d) => {
      prep(s, d)
      ensureGeoCatalog(s, "geoscs", "geo_scs_wh")
      s.sql("CREATE NAMESPACE IF NOT EXISTS geoscs.db")
      s.sql("DROP TABLE IF EXISTS geoscs.db.sc")
      s.sql("CREATE TABLE geoscs.db.sc (id BIGINT, nat BIGINT) USING geo")
      s.sql("INSERT INTO geoscs.db.sc SELECT c_custkey, c_nationkey FROM customer WHERE c_custkey % 2 = 0") // v1
      val root = s.conf.get("spark.sql.catalog.geoscs.warehouse").stripSuffix("/") + "/db/sc"
      val v1 = graft.tables.GeoManifest.read(s, root).version
      s.sql("INSERT INTO geoscs.db.sc SELECT c_custkey, c_nationkey FROM customer WHERE c_custkey % 2 = 1") // v2
      val full = s.sql("CALL geoscs.system.ancestors_of(table => 'db.sc')")
        .select("snapshot_id").collect().map(_.getLong(0)).toSeq
      val fromV1 = s.sql(
        s"CALL geoscs.system.ancestors_of(table => 'db.sc', snapshot_id => $v1)")
        .select("snapshot_id").collect().map(_.getLong(0)).toSeq
      require(fromV1.headOption.contains(v1.toLong) && fromV1.length < full.length &&
          full.takeRight(fromV1.length) == fromV1,
        s"ancestors_of(snapshot_id => $v1) must be the chain's tail from v$v1: " +
          s"$fromV1 vs full $full")
      // phases collect EAGERLY (a lazy frame would re-read the moved
      // pointer at execution time and show the final state in both)
      def phase(p: Int): (Int, Long, Long) = {
        val r = s.sql("SELECT COUNT(*), CAST(SUM(id) AS BIGINT) FROM geoscs.db.sc").head()
        (p, r.getLong(0), r.getLong(1))
      }
      val p1 = phase(1)
      s.sql(s"CALL geoscs.system.set_current_snapshot(table => 'db.sc', snapshot_id => $v1)")
      val p2 = phase(2)
      require(graft.tables.GeoManifest.read(s, root).version > v1,
        "set_current_snapshot must move the pointer via a NEW commit (history preserved)")
      import s.implicits._
      Seq(p1, p2).toDF("phase", "n_rows", "sum_id").orderBy("phase")
    }),

    // CALL snapshot: zero-copy onboarding of an existing readable table
    // (here a temp view over freshly-written parquet) as a NEW geo table
    // — version 0 must reference the SOURCE files by absolute path
    // (require'd against the manifest: no copy, no rewrite) and the rows
    // pass through for DuckDB to replay.
    "geo_snapshot_table" -> ((s, d) => {
      prep(s, d)
      ensureGeoCatalog(s, "geocall", "geo_call_wh")
      s.sql("CREATE NAMESPACE IF NOT EXISTS geocall.db")
      s.sql("DROP TABLE IF EXISTS geocall.db.snp")
      val dir = java.nio.file.Files.createTempDirectory("geo_snap_src").toString + "/files"
      s.sql("SELECT c_custkey AS id, CAST(c_nationkey AS BIGINT) AS nat " +
        "FROM customer WHERE c_custkey % 2 = 0").write.parquet(dir)
      s.read.parquet(dir).createOrReplaceTempView("geo_snap_src")
      s.sql("CALL geocall.system.snapshot(table => 'db.snp', " +
        "source_table => 'geo_snap_src')")
      val root = s.conf.get("spark.sql.catalog.geocall.warehouse")
        .stripSuffix("/") + "/db/snp"
      val refd = graft.tables.GeoManifest.read(s, root).files
        .map(_.path.stripPrefix("file:")).toSet
      val src = s.read.parquet(dir).inputFiles.map(_.stripPrefix("file:")).toSet
      require(refd == src, "snapshot must reference the source files by path (zero copy)")
      s.sql("SELECT id, nat FROM geocall.db.snp ORDER BY id")
    }),

    // Persisted views (Iceberg ViewCatalog analog): CREATE OR REPLACE VIEW
    // through the SQL front-half (works on the driver's vanilla session),
    // definition stored beside the table manifests, body uses a BARE table
    // name resolved against the view's stored catalog.namespace context,
    // read back through the no-extension path (GeoViews.readView — parse,
    // CTE-substitute, qualify, analyze). Values pass through untouched, so
    // DuckDB replays the view SQL over the raw source. In-query require:
    // SHOW VIEWS lists the definition.
    "geo_view" -> ((s, d) => {
      prep(s, d)
      ensureGeoCatalog(s, "geovw", "geo_vw_wh")
      s.sql("CREATE NAMESPACE IF NOT EXISTS geovw.db")
      s.sql("DROP TABLE IF EXISTS geovw.db.ords")
      s.sql("CREATE TABLE geovw.db.ords (k BIGINT, price DOUBLE, flag STRING) USING geo")
      s.sql("INSERT INTO geovw.db.ords " +
        "SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders")
      graft.tables.GeoSql.exec(s,
        """CREATE OR REPLACE VIEW geovw.db.big_orders AS
           SELECT flag, COUNT(*) AS n, SUM(k) AS sum_k
           FROM ords WHERE price > 1000.0 GROUP BY flag""")
      val shown = graft.tables.GeoSql.exec(s, "SHOW VIEWS IN geovw.db").collect()
      require(shown.exists(_.getString(1) == "big_orders"),
        "SHOW VIEWS does not list the created view")
      graft.tables.GeoViews.readView(s, "geovw.db.big_orders").orderBy("flag")
    }),

    // Partitioned geo table (Iceberg hidden-partitioning analog): DDL
    // carries days(d) + bucket(8, k) on one table and truncate(1000, k)
    // on a second; writes cluster rows by transform value, the manifest
    // records per-file transform min/max, and all legs run against files
    // pruned from the pushed filters (date window prunes days(), point
    // lookup prunes bucket(), key range prunes truncate()). Values pass
    // through untouched, so DuckDB replays the filters over the raw source.
    "geo_partitioned" -> ((s, d) => {
      prep(s, d)
      ensureGeoCatalog(s, "geopq", "geo_pq_wh")
      s.sql("CREATE NAMESPACE IF NOT EXISTS geopq.db")
      s.sql("DROP TABLE IF EXISTS geopq.db.pt")
      s.sql("CREATE TABLE geopq.db.pt (k BIGINT, dd DATE, price DOUBLE) USING geo " +
        "PARTITIONED BY (days(dd), bucket(8, k))")
      s.sql("""INSERT INTO geopq.db.pt
               SELECT o_orderkey, CAST(o_orderdate AS DATE), o_totalprice FROM orders""")
      s.sql("DROP TABLE IF EXISTS geopq.db.ptt")
      s.sql("CREATE TABLE geopq.db.ptt (k BIGINT, dd DATE, price DOUBLE) USING geo " +
        "PARTITIONED BY (truncate(1000, k))")
      s.sql("""INSERT INTO geopq.db.ptt
               SELECT o_orderkey, CAST(o_orderdate AS DATE), o_totalprice FROM orders""")
      s.sql("""
        SELECT 1 AS phase, k, dd, price FROM geopq.db.pt
        WHERE dd >= DATE'1995-01-01' AND dd < DATE'1995-02-01'
        UNION ALL
        SELECT 2, k, dd, price FROM geopq.db.pt WHERE k = 7
        UNION ALL
        SELECT 3, k, dd, price FROM geopq.db.ptt WHERE k >= 2000 AND k < 3000
        ORDER BY phase, k""")
    }),

    // Declared write sort order (Iceberg write.sort-order analog):
    // TBLPROPERTIES('sort.order'='price_cents') clusters every INSERT by
    // the sort key, so per-file min/max stay tight WITHOUT any OPTIMIZE —
    // require'd in-query: a range filter on the sort column scans fewer
    // files than the table holds. The oracle replays the filter over raw
    // orders (values pass through untouched).
    "geo_sort_order" -> ((s, d) => {
      prep(s, d)
      ensureGeoCatalog(s, "geosoq", "geo_soq_wh")
      s.sql("CREATE NAMESPACE IF NOT EXISTS geosoq.db")
      s.sql("DROP TABLE IF EXISTS geosoq.db.so")
      s.sql("CREATE TABLE geosoq.db.so (k BIGINT, s BIGINT) USING geo " +
        "TBLPROPERTIES('sort.order'='s')")
      // insertion order is key order; s is scrambled relative to it —
      // exactly the shape where only a declared sort makes the s-ranges
      // prunable (pure-integer derivation: identical in the oracle)
      s.sql("""INSERT INTO geosoq.db.so
               SELECT o_orderkey, (o_orderkey * 7919) % 100000 FROM orders""")
      val q = s.sql(
        "SELECT k, s FROM geosoq.db.so WHERE s < 10000 ORDER BY k")
      val root = s.conf.get("spark.sql.catalog.geosoq.warehouse") + "/db/so"
      val total = graft.tables.GeoManifest.read(s, root).files.count(_.rows > 0)
      val scanned = graft.tables.GeoCowScan.collectIn(q.queryExecution.executedPlan)
        .map(_.scannedFiles.count(_.rows > 0)).min
      require(total > 2 && scanned < total,
        s"sort.order must prune the range scan: $scanned of $total")
      q
    }),

    // Metadata-only DELETE (Iceberg metadata-delete analog — the 100 TB
    // retention shape): a months(dd)-partitioned table drops everything
    // before a month boundary as a pure manifest commit. require'd
    // IN-QUERY: the DELETE runs ZERO Spark jobs (stats-only, no scan of
    // the expiring data), mints no files (no rewrite), files no sidecars,
    // and stamps op=delete. The oracle replays the retention filter over
    // raw orders — the drop must remove exactly the aligned partitions.
    "geo_metadata_delete" -> ((s, d) => {
      prep(s, d)
      ensureGeoCatalog(s, "geomdq", "geo_mdq_wh")
      s.sql("CREATE NAMESPACE IF NOT EXISTS geomdq.db")
      s.sql("DROP TABLE IF EXISTS geomdq.db.ret")
      s.sql("CREATE TABLE geomdq.db.ret (k BIGINT, dd DATE, price DOUBLE) USING geo " +
        "PARTITIONED BY (months(dd))")
      // roll at month-tuple boundaries so every file is single-month —
      // the aligned layout a production table has at real partition sizes
      s.conf.set("spark.graft.write.rollMinRows", "1")
      try s.sql("""INSERT INTO geomdq.db.ret
               SELECT o_orderkey, CAST(o_orderdate AS DATE), o_totalprice FROM orders""")
      finally s.conf.unset("spark.graft.write.rollMinRows")
      val root = s.conf.get("spark.sql.catalog.geomdq.warehouse") + "/db/ret"
      val before = graft.tables.GeoManifest.read(s, root)
      val beforeKeys = before.files.map(_.key).toSet
      val sc = s.sparkContext
      sc.setJobGroup("gmd_drop", "metadata retention delete")
      s.sql("DELETE FROM geomdq.db.ret WHERE dd < DATE'1997-01-01'")
      sc.clearJobGroup()
      require(sc.statusTracker.getJobIdsForGroup("gmd_drop").isEmpty,
        "metadata DELETE must run zero Spark jobs (stats-only whole-file drop)")
      val m = graft.tables.GeoManifest.read(s, root)
      require(m.files.map(_.key).toSet.subsetOf(beforeKeys),
        "metadata DELETE must not rewrite files")
      require(m.files.size < before.files.size, "metadata DELETE dropped nothing")
      require(m.deletes.isEmpty && m.eqDeletes.isEmpty,
        "metadata DELETE must not file sidecars")
      require(m.op.contains("delete"), s"op: ${m.op}")
      s.sql("""SELECT dd, COUNT(*) AS n, MIN(k) AS kmin, MAX(k) AS kmax
               FROM geomdq.db.ret GROUP BY dd ORDER BY dd""")
    }),

    // Partition-spec evolution END-TO-END (Iceberg's flagship
    // metadata-only operation): a table bucketed on the key ingests half
    // its rows, evolves to days(dd) partitioning WITHOUT rewriting a
    // byte (require'd: identical file set across the ALTER), ingests the
    // rest under the new spec, and then both a date-window and a key
    // query prune FILES with each file interpreted under its OWN spec —
    // require'd scanned < total on the date phase. The oracle replays
    // the filters over raw orders: evolution must never change results.
    "geo_spec_evolution" -> ((s, d) => {
      prep(s, d)
      ensureGeoCatalog(s, "geoevq", "geo_evq_wh")
      s.sql("CREATE NAMESPACE IF NOT EXISTS geoevq.db")
      s.sql("DROP TABLE IF EXISTS geoevq.db.evo")
      s.sql("CREATE TABLE geoevq.db.evo (k BIGINT, dd DATE, price DOUBLE) USING geo " +
        "PARTITIONED BY (bucket(8, k))")
      s.sql("""INSERT INTO geoevq.db.evo
               SELECT o_orderkey, CAST(o_orderdate AS DATE), o_totalprice
               FROM orders WHERE o_orderkey % 2 = 0""")
      val root = s.conf.get("spark.sql.catalog.geoevq.warehouse") + "/db/evo"
      val before = graft.tables.GeoManifest.read(s, root)
      graft.tables.GeoSql.exec(s, "ALTER TABLE geoevq.db.evo SET PARTITIONED BY (days(dd))")
      val mid = graft.tables.GeoManifest.read(s, root)
      require(mid.files.map(_.key).toSet == before.files.map(_.key).toSet &&
        mid.specId == 1 && mid.pastSpecs.nonEmpty,
        "SET PARTITIONED BY must be metadata-only (same files, spec retired)")
      s.sql("""INSERT INTO geoevq.db.evo
               SELECT o_orderkey, CAST(o_orderdate AS DATE), o_totalprice
               FROM orders WHERE o_orderkey % 2 = 1""")
      val m = graft.tables.GeoManifest.read(s, root)
      require(m.files.filter(_.rows > 0).map(_.spec).toSet == Set(0, 1),
        "files from both specs must coexist after evolution")
      val q = s.sql("""
        SELECT 1 AS phase, k, dd, price FROM geoevq.db.evo
        WHERE dd >= DATE'1995-03-01' AND dd < DATE'1995-04-01'
        UNION ALL
        SELECT 2, k, dd, price FROM geoevq.db.evo WHERE k = 7
        ORDER BY phase, k""")
      // mixed-spec pruning: the date window narrows OLD files through
      // spec 0's stats transform on dd and NEW files through the days
      // layout — the scan's build-time file counts prove both pruned
      val planStr = q.queryExecution.executedPlan.toString
      val counts = "GeoCowScan\\(files=(\\d+)".r
        .findAllMatchIn(planStr).map(_.group(1).toInt).toSeq
      val total = m.files.count(_.rows > 0)
      require(counts.nonEmpty && counts.min < total,
        s"date window must prune files under both specs: $counts of $total\n$planStr")
      lastMaterializedPlan = Some(planStr)
      q
    }),

    // Multi-column Z-ordering END-TO-END (Delta ZORDER analog): a
    // hash-scrambled ingest leaves every file straddling both the key
    // and the date range (nothing prunes); OPTIMIZE ... ZORDER BY (k,
    // dd) interleaves the two dimensions, after which BOTH a key-range
    // and a date-range scan prune files — require'd scanned < total on
    // each. The oracle replays the filters on raw orders: layout
    // maintenance must never change results.
    "geo_zorder" -> ((s, d) => {
      prep(s, d)
      ensureGeoCatalog(s, "geozoq", "geo_zoq_wh")
      s.sql("CREATE NAMESPACE IF NOT EXISTS geozoq.db")
      s.sql("DROP TABLE IF EXISTS geozoq.db.zt")
      s.sql("CREATE TABLE geozoq.db.zt (k BIGINT, dd DATE, price DOUBLE) USING geo")
      s.sql("""INSERT INTO geozoq.db.zt
               SELECT o_orderkey, CAST(o_orderdate AS DATE), o_totalprice
               FROM orders DISTRIBUTE BY hash(o_orderkey) SORT BY hash(o_orderkey)""")
      graft.tables.GeoSql.exec(s, "OPTIMIZE geozoq.db.zt INTO 12 FILES ZORDER BY (k, dd)")
      val root = s.conf.get("spark.sql.catalog.geozoq.warehouse") + "/db/zt"
      val total = graft.tables.GeoManifest.read(s, root).files.count(_.rows > 0)
      def scanned(sql: String): Int = {
        val plan = s.sql(sql).queryExecution.executedPlan.toString
        "GeoCowScan\\(files=(\\d+)".r.findAllMatchIn(plan).map(_.group(1).toInt).min
      }
      val byK = scanned("SELECT * FROM geozoq.db.zt WHERE k >= 1000 AND k < 3000")
      val byD = scanned("SELECT * FROM geozoq.db.zt " +
        "WHERE dd >= DATE'1994-06-01' AND dd < DATE'1994-09-01'")
      require(total >= 8 && byK < total && byD < total,
        s"ZORDER must let BOTH dimensions prune: k->$byK, dd->$byD of $total files")
      s.sql("""
        SELECT 1 AS phase, k, dd, price FROM geozoq.db.zt
        WHERE k >= 1000 AND k < 3000
        UNION ALL
        SELECT 2, k, dd, price FROM geozoq.db.zt
        WHERE dd >= DATE'1994-06-01' AND dd < DATE'1994-09-01'
        ORDER BY phase, k, dd""")
    }),

    // Storage-partitioned join END-TO-END (Iceberg SPJ analog): two geo
    // tables co-bucketed on the join key; transform-clustered writes roll
    // files at tuple boundaries (single-valued files), the scans report
    // KeyGroupedPartitioning, and the equi-join plans with NO shuffle on
    // either side — require'd in-plan (<=1 Exchange total: only the final
    // group-by re-partitions). The oracle replays the join + aggregate
    // from the raw source tables.
    "geo_spj" -> ((s, d) => {
      prep(s, d)
      ensureGeoCatalog(s, "geospjq", "geo_spjq_wh")
      s.sql("CREATE NAMESPACE IF NOT EXISTS geospjq.db")
      s.sql("DROP TABLE IF EXISTS geospjq.db.cust")
      s.sql("DROP TABLE IF EXISTS geospjq.db.ord")
      val confs = Seq(
        // bench-scale buckets hold fewer rows than the production
        // rollMinRows default — pin rolling on so files are single-valued
        "spark.graft.write.rollMinRows" -> "1",
        "spark.sql.sources.v2.bucketing.enabled" -> "true",
        "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1")
      val prev = confs.map { case (k, _) => k -> s.conf.getOption(k) }
      confs.foreach { case (k, v) => s.conf.set(k, v) }
      try {
        s.sql("CREATE TABLE geospjq.db.cust (c_custkey BIGINT, c_nationkey BIGINT) " +
          "USING geo PARTITIONED BY (bucket(8, c_custkey))")
        s.sql("INSERT INTO geospjq.db.cust SELECT c_custkey, c_nationkey FROM customer")
        s.sql("CREATE TABLE geospjq.db.ord (o_custkey BIGINT, o_orderkey BIGINT, " +
          "o_totalprice DOUBLE) USING geo PARTITIONED BY (bucket(8, o_custkey))")
        s.sql("INSERT INTO geospjq.db.ord " +
          "SELECT o_custkey, o_orderkey, CAST(o_totalprice AS DOUBLE) FROM orders")
        val j = s.sql("""
          SELECT c.c_nationkey, COUNT(*) AS n, SUM(o.o_orderkey) AS sum_ok,
                 MAX(o.o_totalprice) AS max_price
          FROM geospjq.db.cust c JOIN geospjq.db.ord o ON c.c_custkey = o.o_custkey
          GROUP BY c.c_nationkey ORDER BY c.c_nationkey""")
        // the SPJ claim, checked precisely on the STATIC plan (pre-AQE —
        // no query-stage wrappers to hide nodes from collect): the join
        // executes with ZERO Exchange beneath it on either side; the
        // group-by/order-by above keep their own legitimate shuffles
        val p0 = j.queryExecution.sparkPlan
        val joins = p0.collect {
          case s: org.apache.spark.sql.execution.joins.SortMergeJoinExec => s
          case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
        }
        require(joins.nonEmpty, s"no join in plan:\n$p0")
        val underJoin = joins.flatMap(_.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
        })
        require(underJoin.isEmpty,
          s"storage-partitioned join must not shuffle the join inputs " +
            s"(${underJoin.length} exchanges under the join):\n$p0")
        val out = j.localCheckpoint()
        lastMaterializedPlan = Some(j.queryExecution.executedPlan.toString)
        out
      } finally prev.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None) => s.conf.unset(k)
      }
    }),

    // Storage-partitioned join SURVIVING CoW DML: after a row-level
    // DELETE rewrites order files and an UPDATE rewrites customer files,
    // the same co-bucketed equi-join must STILL plan with zero Exchange
    // under the join — require'd in-plan exactly as geo_spj. A DML writer
    // that lost the bucket clustering (multi-valued rewritten files)
    // would force a shuffle and fail the require; wrong surviving rows
    // change the hash. The oracle replays DELETE+UPDATE as set algebra.
    "geo_spj_dml" -> ((s, d) => {
      prep(s, d)
      ensureGeoCatalog(s, "geospjd", "geo_spjd_wh")
      s.sql("CREATE NAMESPACE IF NOT EXISTS geospjd.db")
      s.sql("DROP TABLE IF EXISTS geospjd.db.cust")
      s.sql("DROP TABLE IF EXISTS geospjd.db.ord")
      val confs = Seq(
        "spark.graft.write.rollMinRows" -> "1",
        "spark.sql.sources.v2.bucketing.enabled" -> "true",
        "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1")
      val prev = confs.map { case (k, _) => k -> s.conf.getOption(k) }
      confs.foreach { case (k, v) => s.conf.set(k, v) }
      try {
        s.sql("CREATE TABLE geospjd.db.cust (c_custkey BIGINT, c_nationkey BIGINT) " +
          "USING geo PARTITIONED BY (bucket(8, c_custkey))")
        s.sql("INSERT INTO geospjd.db.cust SELECT c_custkey, c_nationkey FROM customer")
        s.sql("CREATE TABLE geospjd.db.ord (o_custkey BIGINT, o_orderkey BIGINT, " +
          "o_totalprice DOUBLE) USING geo PARTITIONED BY (bucket(8, o_custkey))")
        s.sql("INSERT INTO geospjd.db.ord " +
          "SELECT o_custkey, o_orderkey, CAST(o_totalprice AS DOUBLE) FROM orders")
        // CoW row-level DML on BOTH sides: files rewrite, clustering must hold
        s.sql("DELETE FROM geospjd.db.ord WHERE o_orderkey % 10 = 0")
        s.sql("UPDATE geospjd.db.cust SET c_nationkey = 99 WHERE c_custkey % 100 = 0")
        val j = s.sql("""
          SELECT c.c_nationkey, COUNT(*) AS n, SUM(o.o_orderkey) AS sum_ok,
                 MAX(o.o_totalprice) AS max_price
          FROM geospjd.db.cust c JOIN geospjd.db.ord o ON c.c_custkey = o.o_custkey
          GROUP BY c.c_nationkey ORDER BY c.c_nationkey""")
        val p0 = j.queryExecution.sparkPlan
        val joins = p0.collect {
          case s: org.apache.spark.sql.execution.joins.SortMergeJoinExec => s
          case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
        }
        require(joins.nonEmpty, s"no join in plan:\n$p0")
        val underJoin = joins.flatMap(_.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
        })
        require(underJoin.isEmpty,
          s"SPJ must survive CoW DML without re-shuffling the join inputs " +
            s"(${underJoin.length} exchanges under the join):\n$p0")
        val out = j.localCheckpoint()
        lastMaterializedPlan = Some(j.queryExecution.executedPlan.toString)
        out
      } finally prev.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None) => s.conf.unset(k)
      }
    }),

    // Runtime file pruning END-TO-END (DPP / Iceberg runtime-filtering
    // analog): a fact geo table partitioned by nation key joins a
    // selectively-filtered dim; Spark's dynamic partition pruning hands
    // the scan the matching keys at execution and the scan keeps only
    // files whose transform ranges can hold them — require'd in-plan
    // (dynamicpruning subquery present AND scanned files < total).
    "geo_runtime_prune" -> ((s, d) => {
      prep(s, d)
      ensureGeoCatalog(s, "geodppq", "geo_dppq_wh")
      s.sql("CREATE NAMESPACE IF NOT EXISTS geodppq.db")
      s.sql("DROP TABLE IF EXISTS geodppq.db.fact")
      s.sql("CREATE TABLE geodppq.db.fact (nk BIGINT, bal DOUBLE) USING geo " +
        "PARTITIONED BY (nk)")
      s.sql("INSERT INTO geodppq.db.fact SELECT CAST(c_nationkey AS BIGINT), " +
        "CAST(c_acctbal AS DOUBLE) FROM customer")
      val j = s.sql("""
        SELECT f.nk, COUNT(*) AS n,
               CAST(MAX(f.bal) AS DOUBLE) AS max_bal
        FROM geodppq.db.fact f
        JOIN nation d ON f.nk = d.n_nationkey
        WHERE d.n_name IN ('NATION_3', 'NATION_17')
        GROUP BY f.nk ORDER BY f.nk""")
      val out = j.localCheckpoint() // executes: runtime filters fire
      val planStr = j.queryExecution.executedPlan.toString
      require(planStr.contains("dynamicpruning"),
        s"no dynamic-pruning subquery in:\n$planStr")
      // walk AQE stages for the GeoCowScan and check it narrowed
      val scans = graft.tables.GeoCowScan.collectIn(j.queryExecution.executedPlan)
      require(scans.nonEmpty, s"no GeoCowScan in:\n$planStr")
      val root = s.conf.get("spark.sql.catalog.geodppq.warehouse") + "/db/fact"
      val total = graft.tables.GeoManifest.read(s, root).files.count(_.rows > 0)
      val scanned = scans.map(_.scannedFiles.count(_.rows > 0)).min
      require(scanned < total,
        s"runtime filter did not prune fact files: $scanned of $total")
      lastMaterializedPlan = Some(planStr)
      out
    }),

    // Per-file BLOOM FILTER file skipping END-TO-END (Iceberg parquet
    // bloom / puffin analog): the table clusters by bucket(nationkey), so
    // custkey interleaves across every file and min/max range pruning
    // keeps ALL files for a point lookup — the per-file bloom built at
    // commit time is the only thing that can skip. The require pins
    // scanned < total on the executed scan; the oracle pins the rows.
    "geo_bloom_prune" -> ((s, d) => {
      prep(s, d)
      ensureGeoCatalog(s, "geoblq", "geo_blq_wh")
      s.sql("CREATE NAMESPACE IF NOT EXISTS geoblq.db")
      s.sql("DROP TABLE IF EXISTS geoblq.db.cust")
      s.sql("CREATE TABLE geoblq.db.cust (nk BIGINT, ck BIGINT, c_name STRING, " +
        "bal DOUBLE) USING geo PARTITIONED BY (bucket(8, nk)) " +
        "TBLPROPERTIES('bloom.columns'='ck', 'bloom.items'='16384')")
      s.sql("INSERT INTO geoblq.db.cust SELECT CAST(c_nationkey AS BIGINT), " +
        "CAST(c_custkey AS BIGINT), c_name, CAST(c_acctbal AS DOUBLE) FROM customer")
      val q = s.sql("""
        SELECT ck, c_name, bal FROM geoblq.db.cust
        WHERE ck IN (17, 42, 133) ORDER BY ck""")
      val out = q.localCheckpoint()
      val scans = graft.tables.GeoCowScan.collectIn(q.queryExecution.executedPlan)
      require(scans.nonEmpty, s"no GeoCowScan in:\n${q.queryExecution.executedPlan}")
      val root = s.conf.get("spark.sql.catalog.geoblq.warehouse") + "/db/cust"
      val m = graft.tables.GeoManifest.read(s, root)
      val total = m.files.count(_.rows > 0)
      require(m.blooms.nonEmpty, "commit did not build a bloom sidecar")
      val scanned = scans.map(_.scannedFiles.count(_.rows > 0)).min
      require(total >= 4 && scanned < total,
        s"bloom did not skip files: scanned $scanned of $total")
      lastMaterializedPlan = Some(q.queryExecution.executedPlan.toString)
      out
    }),

    // ANALYZE TABLE column statistics END-TO-END: NDV/min-max collected
    // into the manifest, reported through the scan's V2 column stats, and
    // CBO then picks a broadcast join for the selective filter — the
    // require pins the plan (static, pre-AQE: >=1 broadcast hash join,
    // zero sort-merge), the oracle pins the results.
    "geo_analyze" -> ((s, d) => {
      prep(s, d)
      ensureGeoCatalog(s, "geoanaq", "geo_anaq_wh")
      s.sql("CREATE NAMESPACE IF NOT EXISTS geoanaq.db")
      s.sql("DROP TABLE IF EXISTS geoanaq.db.ord")
      s.sql("DROP TABLE IF EXISTS geoanaq.db.cust")
      s.sql("CREATE TABLE geoanaq.db.ord (o_orderkey BIGINT, o_custkey BIGINT) USING geo")
      s.sql("INSERT INTO geoanaq.db.ord SELECT o_orderkey, o_custkey FROM orders")
      s.sql("CREATE TABLE geoanaq.db.cust (c_custkey BIGINT, c_nationkey BIGINT) USING geo")
      s.sql("INSERT INTO geoanaq.db.cust SELECT c_custkey, c_nationkey FROM customer")
      graft.tables.GeoSql.exec(s,
        "ANALYZE TABLE geoanaq.db.ord COMPUTE STATISTICS FOR COLUMNS o_orderkey, o_custkey")
      val confs = Seq("spark.sql.cbo.enabled" -> "true",
        "spark.sql.autoBroadcastJoinThreshold" -> "16384")
      val prev = confs.map { case (k, _) => k -> s.conf.getOption(k) }
      confs.foreach { case (k, v) => s.conf.set(k, v) }
      try {
        val j = s.sql("""
          SELECT c.c_custkey, c.c_nationkey FROM geoanaq.db.ord o
          JOIN geoanaq.db.cust c ON o.o_custkey = c.c_custkey
          WHERE o.o_orderkey = 1 ORDER BY c.c_custkey""")
        val p = j.queryExecution.sparkPlan
        val bhj = p.collect {
          case x: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => x }.size
        val smj = p.collect {
          case x: org.apache.spark.sql.execution.joins.SortMergeJoinExec => x }.size
        require(bhj >= 1 && smj == 0,
          s"NDV stats must drive a static broadcast plan (bhj=$bhj smj=$smj):\n$p")
        lastMaterializedPlan = Some(p.toString)
        j.localCheckpoint()
      } finally prev.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None) => s.conf.unset(k)
      }
    }),

    // Sharded manifest lists (format v5, the Iceberg manifest-list split):
    // with the shard threshold forced low, three multi-file appends and a
    // CoW delete run the full shard lifecycle — fresh shards, reuse across
    // commits, dissolve on rewrite — and the catalog scan serves the result
    // (asserted sharded). DuckDB replays the end state from the raw source,
    // so shard resolution is hash-checked, not smoke-checked.
    "geo_sharded" -> ((s, d) => {
      prep(s, d)
      ensureGeoCatalog(s, "geosh", "geo_sh_wh")
      s.sql("CREATE NAMESPACE IF NOT EXISTS geosh.db")
      s.sql("DROP TABLE IF EXISTS geosh.db.sh")
      s.conf.set("spark.graft.manifest.shardSize", "2")
      try {
        s.sql("CREATE TABLE geosh.db.sh (k BIGINT, nat BIGINT) USING geo")
        (0 to 2).foreach { r =>
          s.sql(s"""INSERT INTO geosh.db.sh
                    SELECT c_custkey, c_nationkey FROM customer WHERE c_custkey % 3 = $r""")
        }
        s.sql("DELETE FROM geosh.db.sh WHERE k % 10 = 0")
        val root = s.conf.get("spark.sql.catalog.geosh.warehouse") + "/db/sh"
        val m = graft.tables.GeoManifest.read(s, root)
        require(m.baseShards.nonEmpty, "the manifest must be sharded (v5)")
      } finally s.conf.unset("spark.graft.manifest.shardSize")
      s.sql("""SELECT nat, COUNT(*) AS n, SUM(k) AS key_sum
               FROM geosh.db.sh GROUP BY nat ORDER BY nat""")
    }),

    // scale path for dedup planning: HLL++ estimate vs exact count — at
    // 100 TB the estimate is a single map-side sketch merge, no shuffle of
    // distinct values. The sketch value is engine-specific, so the oracle
    // checks the exact count plus a 15% accuracy INVARIANT on the sketch
    // (default rsd 5%; 15% leaves 3 sigma of headroom).
    "dedup_scale_estimate" -> ((s, d) => prep(s, d).sql("""
      SELECT exact_distinct,
             ABS(CAST(approx_distinct AS DOUBLE) - CAST(exact_distinct AS DOUBLE))
               / CAST(exact_distinct AS DOUBLE) < 0.15 AS approx_ok
      FROM (SELECT COUNT(DISTINCT text) AS exact_distinct,
                   approx_count_distinct(text) AS approx_distinct
            FROM documents)""")),
  )

  /** DuckDB-dialect oracle per query (same aliases, same ordering). */
  private val oracleBase: Map[String, String] = Map(
    "q1_pricing" -> """
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
             COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",

    "q3_shipping" -> """
      SELECT l_orderkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
             CAST(o_orderdate AS DATE) AS o_orderdate
      FROM customer JOIN orders ON c_custkey = o_custkey
                    JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
        AND l_shipdate > TIMESTAMP '1997-03-15 00:00:00'
      GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
      ORDER BY revenue DESC, l_orderkey
      LIMIT 10""",

    "q5_local_supplier" -> """
      SELECT n_name,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM customer JOIN orders ON c_custkey = o_custkey
                    JOIN lineitem ON l_orderkey = o_orderkey
                    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
                    JOIN nation ON s_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY n_name
      ORDER BY revenue DESC, n_name""",

    "topk_per_group" -> """
      SELECT p_brand, p_partkey, rn FROM (
        SELECT p_brand, p_partkey,
               ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn
        FROM part) t
      WHERE rn <= 3
      ORDER BY p_brand, rn""",

    "sessionize_batch" -> """
      WITH e AS (
        SELECT user_id, event_id, CAST(epoch(ts) AS BIGINT) AS sec FROM events
      ), flagged AS (
        SELECT user_id, sec,
               CASE WHEN sec - LAG(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) > 1800
                    OR LAG(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_sess
        FROM e
      ), sess AS (
        SELECT user_id, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY sec ROWS UNBOUNDED PRECEDING) AS sess_id
        FROM flagged
      )
      SELECT user_id, COUNT(DISTINCT sess_id) AS n_sessions, COUNT(*) AS n_events
      FROM sess GROUP BY user_id ORDER BY user_id""",

    "events_hourly" -> """
      SELECT CAST(epoch(DATE_TRUNC('hour', ts)) AS BIGINT) AS hour_sec, event_type,
             COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY hour_sec, event_type""",

    "q_anti_join" -> """
      SELECT c_nationkey, COUNT(*) AS n_customers_no_orders
      FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      GROUP BY c_nationkey ORDER BY c_nationkey""",

    "q_semi_join" -> """
      SELECT p_brand, COUNT(*) AS n_parts_shipped
      FROM part WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
      GROUP BY p_brand ORDER BY p_brand""",

    "q_rollup" -> """
      SELECT COALESCE(l_returnflag, 'ALL') AS rf, COALESCE(l_linestatus, 'ALL') AS ls,
             COUNT(*) AS n
      FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY rf, ls""",

    "q_distinct_agg" -> """
      SELECT l_returnflag, CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
             CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "sessionize_fmgws" -> """
      WITH e AS (
        SELECT user_id, event_id, epoch_ms(ts) AS ms FROM events
      ), flagged AS (
        SELECT user_id,
               CASE WHEN ms - LAG(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) > 1800000
                    OR LAG(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_sess
        FROM e)
      SELECT user_id, CAST(SUM(new_sess) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
      FROM flagged GROUP BY user_id ORDER BY user_id""",

    "range_join_bands" -> """
      SELECT n_nationkey, COUNT(*) AS n
      FROM nation JOIN customer
        ON c_acctbal >= n_nationkey*400.0 + 0.005 AND c_acctbal <= n_nationkey*400.0 + 600.005
      GROUP BY n_nationkey ORDER BY n_nationkey""",

    "asof_join_events" -> """
      WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events WHERE event_type = 'purchase'),
           e AS (SELECT user_id, epoch_us(ts) AS us, MAX(event_id) AS err_id
                 FROM events WHERE event_type = 'error' GROUP BY 1, 2)
      SELECT p.event_id, e.err_id
      FROM p ASOF LEFT JOIN e ON p.user_id = e.user_id AND p.us >= e.us
      ORDER BY p.event_id""",

    "geofence_batch" -> """
      SELECT event_type, COUNT(*) AS n FROM events
      WHERE value > 0.005 AND value < 120.005
        AND (user_id % 25) >= 0 AND (user_id % 25) <= 14
      GROUP BY event_type ORDER BY event_type""",

    "st_point_xy" -> """
      SELECT c_custkey, c_acctbal AS x, CAST(c_nationkey AS DOUBLE) AS y
      FROM customer ORDER BY c_custkey""",

    "st_astext_point" -> """
      SELECT c_custkey,
             'POINT (' || CAST(c_nationkey AS VARCHAR) || ' ' || CAST(c_custkey % 7 AS VARCHAR) || ')' AS wkt
      FROM customer ORDER BY c_custkey""",

    "st_area_envelope" -> """
      SELECT p_partkey, CAST(p_size AS DOUBLE) * CAST(p_size + 2 AS DOUBLE) AS area
      FROM part ORDER BY p_partkey""",

    "st_distance_points" -> """
      SELECT p_partkey,
             sqrt(CAST(p_size AS DOUBLE) * CAST(p_size AS DOUBLE)
                  + CAST(p_size + 1 AS DOUBLE) * CAST(p_size + 1 AS DOUBLE)) AS dist
      FROM part ORDER BY p_partkey""",

    "st_length_line" -> """
      SELECT p_partkey,
             sqrt(CAST(p_size AS DOUBLE) * CAST(p_size AS DOUBLE)
                  + CAST(p_size + 2 AS DOUBLE) * CAST(p_size + 2 AS DOUBLE)) AS len
      FROM part ORDER BY p_partkey""",

    "st_makeline_length" -> """
      SELECT p_partkey,
             sqrt(CAST(p_size AS DOUBLE) * CAST(p_size AS DOUBLE)
                  + CAST(p_size + 2 AS DOUBLE) * CAST(p_size + 2 AS DOUBLE)) AS len
      FROM part ORDER BY p_partkey""",

    "st_geometrytype_mix" -> """
      SELECT p_partkey, 'ST_Point' AS pt_type, 'ST_Polygon' AS poly_type
      FROM part ORDER BY p_partkey""",

    "st_misc_accessors" -> """
      SELECT p_partkey,
             3 AS np, 2 AS ng,
             TRUE AS is_empty_true, FALSE AS is_empty_false, TRUE AS is_valid,
             1000 + p_size AS srid,
             'POINT (' || p_size || ' 2)' AS wkb_rt
      FROM part ORDER BY p_partkey""",

    "st_wkt_transforms" -> """
      SELECT p_partkey,
             'MULTIPOINT ((0 0), (' || p_size || ' 3))' AS bnd_wkt,
             'LINESTRING (0 0, ' || p_size || ' 3)' AS hull_wkt,
             'MULTIPOINT ((0 0), (' || p_size || ' 3))' AS norm_wkt,
             CAST(p_size AS DOUBLE) / 2 AS cx,
             'POINT (' || p_size || ' 2)' AS env_pt
      FROM part ORDER BY p_partkey""",

    "st_line_accessors" -> """
      SELECT p_partkey,
             CAST(p_size AS DOUBLE) AS sx,
             5.0 AS ey,
             CAST(p_size + 3 AS DOUBLE) AS p2x,
             CAST(p_size AS DOUBLE) + 100.0 AS tx,
             CAST(p_size AS DOUBLE) AS fy,
             1 AS dim,
             CAST(p_size AS DOUBLE) AS cx_is_sx_when_left_of_line
      FROM part ORDER BY p_partkey""",

    "st_contains_range" -> """
      SELECT c_nationkey, COUNT(*) AS n FROM customer
      WHERE c_acctbal > 0.005 AND c_acctbal < 5000.005
        AND c_nationkey >= 0 AND c_nationkey <= 10
      GROUP BY c_nationkey ORDER BY c_nationkey""",

    "st_within_range" -> """
      SELECT c_nationkey, COUNT(*) AS n FROM customer
      WHERE c_acctbal > 1000.005 AND c_acctbal < 8000.005
        AND c_nationkey >= 5 AND c_nationkey <= 19
      GROUP BY c_nationkey ORDER BY c_nationkey""",

    "st_intersects_range" -> """
      SELECT c_nationkey, COUNT(*) AS n FROM customer
      WHERE c_acctbal > -500.005 AND c_acctbal < 2500.005
        AND c_nationkey >= 0 AND c_nationkey <= 14
      GROUP BY c_nationkey ORDER BY c_nationkey""",

    "st_disjoint_range" -> """
      SELECT COUNT(*) AS n FROM customer
      WHERE NOT (c_acctbal > 0.005 AND c_acctbal < 5000.005
                 AND c_nationkey >= 0 AND c_nationkey <= 24)""",

    "st_covers_range" -> """
      SELECT COUNT(*) AS n FROM customer
      WHERE c_acctbal > 0.005 AND c_acctbal < 5000.005
        AND c_nationkey >= 0 AND c_nationkey <= 24""",

    "st_coveredby_range" -> """
      SELECT COUNT(*) AS n FROM customer
      WHERE c_acctbal > 0.005 AND c_acctbal < 5000.005
        AND c_nationkey >= 0 AND c_nationkey <= 24""",

    "st_predicate_matrix" -> """
      WITH t AS (SELECT p_partkey, p_size % 12 AS p FROM part)
      SELECT p_partkey,
             p BETWEEN 1 AND 9 AS crosses,
             p = 5 AS touches,
             p BETWEEN 1 AND 4 AS overlaps,
             p = 0 AS equals
      FROM t ORDER BY p_partkey""",

    "st_dwithin_filter" -> """
      SELECT c_custkey FROM customer
      WHERE sqrt((c_acctbal - 5000.0) * (c_acctbal - 5000.0)
                 + (CAST(c_nationkey AS DOUBLE) - 12.0) * (CAST(c_nationkey AS DOUBLE) - 12.0)) <= 1000.0
      ORDER BY c_custkey""",

    "st_envelope_aggr_bounds" -> """
      SELECT c_nationkey,
             MIN(c_acctbal) AS xmin, MIN(CAST(c_custkey % 100 AS DOUBLE)) AS ymin,
             MAX(c_acctbal) AS xmax, MAX(CAST(c_custkey % 100 AS DOUBLE)) AS ymax
      FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""",

    "st_centroid_aggr_points" -> """
      SELECT c_nationkey,
             SUM(CAST(c_custkey % 97 AS DOUBLE)) / COUNT(*) AS cx,
             SUM(CAST(c_custkey % 89 AS DOUBLE)) / COUNT(*) AS cy
      FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""",

    "st_union_aggr_points" -> """
      SELECT c_nationkey, CAST(COUNT(DISTINCT c_custkey % 50) AS INT) AS n_distinct
      FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""",

    "st_collect_points" -> """
      SELECT c_nationkey, CAST(COUNT(*) AS INT) AS n_all, 'ST_MultiPoint' AS gt
      FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""",

    "spatial_tile_join" -> """
      SELECT n_nationkey, COUNT(*) AS n
      FROM nation JOIN customer
        ON c_acctbal > n_nationkey*400.0 + 0.005 AND c_acctbal < n_nationkey*400.0 + 800.005
      GROUP BY n_nationkey ORDER BY n_nationkey""",

    // the rewritten spatial join replays as the same x-band arithmetic
    // (y is always strictly inside the envelope)
    "spatial_rewrite_join" -> """
      SELECT n_nationkey, COUNT(*) AS n
      FROM nation JOIN customer
        ON c_acctbal > n_nationkey*400.0 + 0.005 AND c_acctbal < n_nationkey*400.0 + 800.005
      GROUP BY n_nationkey ORDER BY n_nationkey""",

    "spatial_bcast_join" -> """
      SELECT n_nationkey, COUNT(*) AS n
      FROM nation JOIN customer
        ON c_acctbal > n_nationkey*400.0 + 0.005 AND c_acctbal < n_nationkey*400.0 + 600.005
      GROUP BY n_nationkey ORDER BY n_nationkey""",

    "spatial_dwithin_join" -> """
      SELECT n_nationkey, COUNT(*) AS n
      FROM nation JOIN customer
        ON sqrt((c_acctbal - n_nationkey*400.0)*(c_acctbal - n_nationkey*400.0)
                + (CAST(c_nationkey AS DOUBLE) - 12.0)*(CAST(c_nationkey AS DOUBLE) - 12.0)) <= 300.0
      GROUP BY n_nationkey ORDER BY n_nationkey""",

    "spatial_knn_join" -> """
      SELECT c_custkey, n_nationkey, CAST(rn AS INT) AS knn_rank FROM (
        SELECT c_custkey, n_nationkey,
               ROW_NUMBER() OVER (PARTITION BY c_custkey ORDER BY
                 sqrt((c_acctbal - n_nationkey*400.0)*(c_acctbal - n_nationkey*400.0)
                      + (CAST(c_nationkey AS DOUBLE) - 12.0)*(CAST(c_nationkey AS DOUBLE) - 12.0)) ASC,
                 n_nationkey) AS rn
        FROM customer CROSS JOIN nation) t
      WHERE rn <= 3
      ORDER BY c_custkey, rn""",

    "doc_token_count" -> """
      SELECT doc_id, CAST(len(string_split_regex(TRIM(text), ' +')) AS INT) AS n_tokens
      FROM documents ORDER BY doc_id""",

    "doc_char_stats" -> """
      SELECT doc_id, CAST(LENGTH(text) AS INT) AS len,
             CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) AS INT) AS n_spaces,
             n_chars
      FROM documents ORDER BY doc_id""",

    "dedup_exact" -> """
      SELECT MIN(doc_id) AS keep_id, COUNT(*) AS copies
      FROM documents GROUP BY text ORDER BY keep_id""",

    // closed-form answer of the seeded construction: each perturbed
    // vector's nearest neighbor is its source
    "ann_knn_graph_seeded" -> """
      SELECT vec_id + 100000 AS id1, vec_id AS id2
      FROM embeddings ORDER BY id1""",

    // exact per-query top-5 over the full corpus: the banded-LSH config is
    // parameterized for full recall on the deterministic query subsample at
    // the verify SF (see the query's comment), so approximate == exact
    "ann_knn_graph" -> """
      WITH q AS (SELECT vec_id AS id1, CAST(embedding AS DOUBLE[]) AS v1
                 FROM embeddings WHERE vec_id % 20 = 0),
           c AS (SELECT vec_id AS id2, CAST(embedding AS DOUBLE[]) AS v2
                 FROM embeddings),
           s AS (SELECT id1, id2, list_cosine_similarity(v1, v2) AS cos
                 FROM q CROSS JOIN c WHERE id1 <> id2)
      SELECT id1, id2, CAST(rn AS INT) AS knn_rank FROM (
        SELECT id1, id2,
               ROW_NUMBER() OVER (PARTITION BY id1 ORDER BY cos DESC, id2) AS rn
        FROM s) t
      WHERE rn <= 5 ORDER BY id1, knn_rank""",

    "doc_length_quantiles" -> """
      SELECT source,
             quantile_cont(n_chars, 0.5) AS p50,
             quantile_cont(n_chars, 0.9) AS p90,
             quantile_cont(n_chars, 0.99) AS p99,
             CAST(MIN(n_chars) AS BIGINT) AS min_len,
             CAST(MAX(n_chars) AS BIGINT) AS max_len
      FROM documents GROUP BY source ORDER BY source""",

    "dedup_jaccard_exact" -> """
      WITH t AS (SELECT doc_id, list_distinct(string_split_regex(trim(text), ' +')) AS w
                 FROM documents WHERE doc_id < 60)
      SELECT a.doc_id AS id1, b.doc_id AS id2,
             CAST(len(list_intersect(a.w, b.w)) AS DOUBLE)
               / (len(a.w) + len(b.w) - len(list_intersect(a.w, b.w))) AS jaccard
      FROM t a JOIN t b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.w, b.w)) AS DOUBLE)
               / (len(a.w) + len(b.w) - len(list_intersect(a.w, b.w))) >= 0.2
      ORDER BY id1, id2""",

    // exact all-pairs simhash answer: replays the portable token hash
    // (base-31 codepoint fold mod 2^20, Knuth-mixed onto the 32-bit ring)
    // and the 16 per-bit vote signs, then joins all pairs — the Spark
    // side's pigeonhole banding must have perfect recall to hash-match
    "dedup_simhash_pairs" -> {
      val bitVote = (0 until 16).map(j =>
        s"CASE WHEN list_sum(list_transform(hs, h -> 2 * ((h >> $j) & 1) - 1)) >= 0 THEN ${1L << j} ELSE 0 END")
        .mkString("\n               + ")
      s"""
      -- ASCII-only contract: string_split(tok,'') iterates GRAPHEMES; the
      -- Spark twins iterate split("") elements / codepoints. Identical
      -- hashes are guaranteed only for ASCII text (the testdata's domain).
      WITH t AS (
        SELECT doc_id,
               list_transform(string_split_regex(trim(text), ' +'),
                 tok -> (list_reduce(
                           list_prepend(CAST(0 AS BIGINT),
                             list_transform(string_split(tok, ''), c -> CAST(ascii(c) AS BIGINT))),
                           (a, b) -> (a * 31 + b) % 1048576) * 2654435761) % 4294967296) AS hs
        FROM documents),
      sig AS (
        SELECT doc_id, $bitVote AS s
        FROM t)
      SELECT a.doc_id AS id1, b.doc_id AS id2,
             CAST(bit_count(xor(a.s, b.s)) AS INT) AS hamming
      FROM sig a JOIN sig b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.s, b.s)) <= 1
      ORDER BY id1, id2"""
    },

    // exact DSIR replay: same portable 20-bit polynomial token hash as
    // the simhash oracle (ASCII contract), same Laplace smoothing and
    // log-ratio; rank-only output (see the query comment for gaps)
    "dsir_weights_topk" -> """
      WITH rawtok AS (SELECT doc_id, unnest(string_split_regex(trim(text),' +')) AS tok
                      FROM documents),
           rb AS (SELECT doc_id, ((list_reduce(list_prepend(CAST(0 AS BIGINT),
                    list_transform(string_split(tok,''), c -> CAST(ascii(c) AS BIGINT))),
                    (a,b) -> (a*31+b) % 1048576) * 2654435761) % 4294967296) % 4096 AS b
                  FROM rawtok),
           tdocs AS (SELECT text FROM documents
                     WHERE list_contains(string_split_regex(trim(text),' +'), 'spark')),
           ttok AS (SELECT unnest(string_split_regex(trim(text),' +')) AS tok FROM tdocs),
           tb AS (SELECT ((list_reduce(list_prepend(CAST(0 AS BIGINT),
                    list_transform(string_split(tok,''), c -> CAST(ascii(c) AS BIGINT))),
                    (a,b) -> (a*31+b) % 1048576) * 2654435761) % 4294967296) % 4096 AS b
                  FROM ttok),
           rc AS (SELECT b, count(*) AS rcnt FROM rb GROUP BY b),
           tc AS (SELECT b, count(*) AS tcnt FROM tb GROUP BY b),
           rt AS (SELECT sum(rcnt) AS rtot FROM rc),
           tt AS (SELECT sum(tcnt) AS ttot FROM tc),
           ratio AS (SELECT coalesce(rc.b, tc.b) AS b,
               ln((coalesce(tcnt,0)+1)/(ttot+4096.0)) - ln((coalesce(rcnt,0)+1)/(rtot+4096.0)) AS lr
               FROM rc FULL OUTER JOIN tc ON rc.b = tc.b CROSS JOIN rt CROSS JOIN tt),
           w AS (SELECT doc_id, sum(lr) AS weight FROM rb JOIN ratio USING (b) GROUP BY doc_id)
      SELECT doc_id, CAST(rn AS INT) AS rank FROM (
        SELECT doc_id, ROW_NUMBER() OVER (ORDER BY weight DESC, doc_id) AS rn FROM w) t
      WHERE rn <= 15 ORDER BY rn""",

    // exact all-pairs answer; the Spark side's banded LSH must have 100%
    // recall on the seeded near-dups to match (verified: seeded pairs have
    // cos >= 0.999, background <= 0.62, threshold 0.9 sits in the gap)
    "dedup_embedding_pairs" -> """
      WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
           pert AS (SELECT vec_id + 100000 AS vec_id,
                           list_transform(CAST(embedding AS DOUBLE[]),
                                          x -> x * CAST(0.95 AS DOUBLE) + CAST(0.005 AS DOUBLE)) AS emb
                    FROM embeddings),
           allv AS (SELECT * FROM base UNION ALL SELECT * FROM pert)
      SELECT a.vec_id AS id1, b.vec_id AS id2
      FROM allv a JOIN allv b ON a.vec_id < b.vec_id
      WHERE list_cosine_similarity(a.emb, b.emb) >= 0.9
      ORDER BY id1, id2""",

    // closed-form SemDedup replay: assignment = argmax cosine against the
    // pinned seed centroids (vectors 0..7; lowest cluster wins ties, same
    // as the Spark fold's strict >), drop = any smaller-id same-cluster
    // row with cos >= tau
    "cluster_semdedup" -> """
      WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
           pert AS (SELECT vec_id + 100000 AS vec_id,
                           list_transform(CAST(embedding AS DOUBLE[]),
                                          x -> x * CAST(0.95 AS DOUBLE) + CAST(0.005 AS DOUBLE)) AS emb
                    FROM embeddings),
           allv AS (SELECT * FROM base UNION ALL SELECT * FROM pert),
           seeds AS (SELECT vec_id AS cl, emb AS cemb FROM base WHERE vec_id < 8),
           assign AS (
             SELECT vec_id, emb, CAST(cl AS INT) AS cluster FROM (
               SELECT v.vec_id, v.emb, s.cl,
                      ROW_NUMBER() OVER (PARTITION BY v.vec_id
                        ORDER BY list_cosine_similarity(v.emb, s.cemb) DESC, s.cl) AS rn
               FROM allv v CROSS JOIN seeds s) t
             WHERE rn = 1),
           drops AS (
             SELECT DISTINCT b.vec_id
             FROM assign a JOIN assign b
               ON a.cluster = b.cluster AND a.vec_id < b.vec_id
             WHERE list_cosine_similarity(a.emb, b.emb) >= 0.9)
      SELECT v.vec_id, v.cluster, (d.vec_id IS NULL) AS keep
      FROM assign v LEFT JOIN drops d ON v.vec_id = d.vec_id
      ORDER BY v.vec_id""",

    "ann_brute_top10" -> """
      SELECT vec_id, CAST(rn AS INT) AS rank FROM (
        SELECT vec_id, ROW_NUMBER() OVER (ORDER BY
          list_cosine_similarity(CAST(embedding AS DOUBLE[]),
            (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)) DESC,
          vec_id) AS rn
        FROM embeddings) t
      WHERE rn <= 10 ORDER BY rn""",

    // exact top-10 through the PQ rerank contract: the ADC candidate
    // pool covers the true top-10 at the verify SF, so the final exact
    // rerank equals brute force bit-for-bit
    "ann_pq_top10" -> """
      SELECT vec_id, CAST(rn AS INT) AS rank FROM (
        SELECT vec_id, ROW_NUMBER() OVER (ORDER BY
          list_cosine_similarity(CAST(embedding AS DOUBLE[]),
            (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)) DESC,
          vec_id) AS rn
        FROM embeddings) t
      WHERE rn <= 10 ORDER BY rn""",

    // exact top-10: the LSH prefilter is parameterized for full recall at
    // the verify SF (see the query's comment), so approximate == exact here
    "ann_lsh_top10" -> """
      SELECT vec_id, CAST(rn AS INT) AS rank FROM (
        SELECT vec_id, ROW_NUMBER() OVER (ORDER BY
          list_cosine_similarity(CAST(embedding AS DOUBLE[]),
            (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)) DESC,
          vec_id) AS rn
        FROM embeddings) t
      WHERE rn <= 10 ORDER BY rn""",

    // exact top-10 through BOTH recall contracts composed: nprobe covers
    // every true neighbor's cluster AND the ADC candidate pool covers the
    // true top-10 within the probed clusters at the verify SF
    "ann_ivfpq_top10" -> """
      SELECT vec_id, CAST(rn AS INT) AS rank FROM (
        SELECT vec_id, ROW_NUMBER() OVER (ORDER BY
          list_cosine_similarity(CAST(embedding AS DOUBLE[]),
            (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)) DESC,
          vec_id) AS rn
        FROM embeddings) t
      WHERE rn <= 10 ORDER BY rn""",

    // exact top-10 (same contract as ann_ivf_top10): the probe of the
    // persisted index covers every true neighbor's cluster at verify SF
    "ann_ivf_persisted_top10" -> """
      SELECT vec_id, CAST(rn AS INT) AS rank FROM (
        SELECT vec_id, ROW_NUMBER() OVER (ORDER BY
          list_cosine_similarity(CAST(embedding AS DOUBLE[]),
            (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)) DESC,
          vec_id) AS rn
        FROM embeddings) t
      WHERE rn <= 10 ORDER BY rn""",

    // exact top-10: nprobe covers every true neighbor's cluster at the
    // verify SF, so the probed IVF search returns the exact answer
    "ann_ivf_top10" -> """
      SELECT vec_id, CAST(rn AS INT) AS rank FROM (
        SELECT vec_id, ROW_NUMBER() OVER (ORDER BY
          list_cosine_similarity(CAST(embedding AS DOUBLE[]),
            (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)) DESC,
          vec_id) AS rn
        FROM embeddings) t
      WHERE rn <= 10 ORDER BY rn""",

    // post-append search must equal brute force over the WHOLE corpus
    "ann_ivf_append_top10" -> """
      SELECT vec_id, CAST(rn AS INT) AS rank FROM (
        SELECT vec_id, ROW_NUMBER() OVER (ORDER BY
          list_cosine_similarity(CAST(embedding AS DOUBLE[]),
            (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)) DESC,
          vec_id) AS rn
        FROM embeddings) t
      WHERE rn <= 10 ORDER BY rn""",

    // post-upsert search must equal brute force over the MODIFIED corpus
    // (negation is exact in IEEE floats — both engines agree bit-for-bit)
    "ann_ivf_upsert_top10" -> """
      SELECT vec_id, CAST(rn AS INT) AS rank FROM (
        SELECT vec_id, ROW_NUMBER() OVER (ORDER BY
          list_cosine_similarity(CAST(CASE WHEN vec_id % 7 = 1
              THEN list_transform(embedding, x -> -x)
              ELSE embedding END AS DOUBLE[]),
            (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)) DESC,
          vec_id) AS rn
        FROM embeddings) t
      WHERE rn <= 10 ORDER BY rn""",

    // the rebuilt index must rank exactly as brute force over the
    // churned corpus: %5==2 removed, surviving %7==1 negated
    "ann_ivf_rebuild_top10" -> """
      SELECT vec_id, CAST(rn AS INT) AS rank FROM (
        SELECT vec_id, ROW_NUMBER() OVER (ORDER BY
          list_cosine_similarity(CAST(CASE WHEN vec_id % 7 = 1
              THEN list_transform(embedding, x -> -x)
              ELSE embedding END AS DOUBLE[]),
            (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)) DESC,
          vec_id) AS rn
        FROM embeddings WHERE vec_id % 5 <> 2) t
      WHERE rn <= 10 ORDER BY rn""",

    // post-removal search must equal brute force over exactly the
    // SURVIVING vectors — the removed slice can never resurface
    "ann_ivf_delete_top10" -> """
      SELECT vec_id, CAST(rn AS INT) AS rank FROM (
        SELECT vec_id, ROW_NUMBER() OVER (ORDER BY
          list_cosine_similarity(CAST(embedding AS DOUBLE[]),
            (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)) DESC,
          vec_id) AS rn
        FROM embeddings WHERE vec_id % 5 <> 2) t
      WHERE rn <= 10 ORDER BY rn""",

    "text_quality_score" -> """
      WITH t AS (
        SELECT doc_id, text,
               string_split_regex(trim(text), ' +') AS toks,
               replace(text, ' ', '') AS nospace
        FROM documents)
      SELECT doc_id,
             least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) * 0.4
             + least(CAST(len(list_filter(toks, x -> x IN ('the','a','an','of','and','to','in','is','for','on','with','that','as','at','by','it','from','or','be','are'))) AS DOUBLE) / len(toks) * 5.0, 1.0) * 0.4
             + (1.0 - CAST(length(nospace) - length(regexp_replace(nospace, '[[:punct:]]', '', 'g')) AS DOUBLE) / greatest(length(nospace), 1)) * 0.2 AS quality
      FROM t ORDER BY doc_id""",

    "st_buffer_area" -> """
      SELECT p_partkey,
             ROUND(16.0 * CAST(p_size % 5 + 1 AS DOUBLE) * CAST(p_size % 5 + 1 AS DOUBLE)
                   * sin(pi() / 16), 4) AS a
      FROM part ORDER BY p_partkey""",

    "st_line_ref" -> """
      SELECT p_partkey,
             CAST(p_size AS DOUBLE) AS qx,
             CAST(p_size AS DOUBLE) * 0.75 AS qy,
             CAST(p_size AS DOUBLE) * 2.5 AS sublen,
             CAST(0.5 AS DOUBLE) AS locmid,
             CAST(p_size AS DOUBLE) * 2 AS sx,
             CAST(p_size AS DOUBLE) * 5 AS hd,
             CAST(p_size AS DOUBLE) * 5 AS diag
      FROM part ORDER BY p_partkey""",

    "st_transform_mercator" -> """
      SELECT c_custkey,
             ROUND(6378137.0 * radians(CAST(c_nationkey * 7 + 3 AS DOUBLE)), 1) AS mx,
             ROUND(6378137.0 * ln(tan(pi() / 4 + radians(CAST(c_custkey % 50 + 5 AS DOUBLE)) / 2)), 1) AS my
      FROM customer ORDER BY c_custkey""",

    // axial + cube-round hex assignment replayed in the exact op order of
    // Hex.cellOf (floor(x+0.5) rounding on both sides — portable, unlike
    // round() which differs on negative halves). Only one cube axis is
    // ever fixed, and it uses the other two ORIGINAL rounded values, so
    // q/r are each a single CASE.
    "hex_cell_counts" -> """
      WITH pts AS (SELECT CAST(c_custkey % 97 AS DOUBLE) * CAST(0.37 AS DOUBLE) AS x,
                          CAST(c_nationkey AS DOUBLE) * CAST(1.91 AS DOUBLE)
                            - CAST(20.0 AS DOUBLE) AS y
                   FROM customer),
           f AS (SELECT (sqrt(CAST(3.0 AS DOUBLE))/3.0 * x - 1.0/3.0 * y) / CAST(3.0 AS DOUBLE) AS cx,
                        (2.0/3.0 * y) / CAST(3.0 AS DOUBLE) AS cz
                 FROM pts),
           g AS (SELECT cx, cz, -cx - cz AS cy,
                        floor(cx + 0.5) AS rx0, floor(-cx - cz + 0.5) AS ry0,
                        floor(cz + 0.5) AS rz0
                 FROM f),
           h AS (SELECT rx0, ry0, rz0,
                        abs(rx0 - cx) AS dx, abs(ry0 - cy) AS dy, abs(rz0 - cz) AS dz
                 FROM g),
           cells AS (SELECT
                 CAST(CASE WHEN dx > dy AND dx > dz THEN -ry0 - rz0 ELSE rx0 END AS INT) AS q,
                 CAST(CASE WHEN NOT (dx > dy AND dx > dz) AND NOT (dy > dz)
                           THEN -rx0 - ry0 ELSE rz0 END AS INT) AS r
                 FROM h)
      SELECT q, r, count(*) AS n FROM cells GROUP BY q, r ORDER BY q, r""",

    // Lambert conformal conic 2SP forward replayed from the published
    // Snyder closed forms (GRS80, lat0 46.5, parallels 44/49, lon0 3,
    // false origin 700000/6600000); constants derived in a CTE chain,
    // per-point rho/theta inline. ROUND(,3) = mm grid, far above the
    // ~1e-7 m cross-engine libm drift at these magnitudes.
    "st_transform_lcc" -> """
      WITH k AS (
        SELECT CAST(6378137.0 AS DOUBLE) AS a,
               (1.0/298.257222101) * (2.0 - 1.0/298.257222101) AS e2
      ), k2 AS (
        SELECT a, e2, sqrt(e2) AS e,
               radians(CAST(46.5 AS DOUBLE)) AS phi0,
               radians(CAST(44.0 AS DOUBLE)) AS phi1,
               radians(CAST(49.0 AS DOUBLE)) AS phi2,
               radians(CAST(3.0 AS DOUBLE)) AS lam0
        FROM k
      ), k3 AS (
        SELECT *,
               cos(phi1)/sqrt(1.0 - e2*sin(phi1)*sin(phi1)) AS m1,
               cos(phi2)/sqrt(1.0 - e2*sin(phi2)*sin(phi2)) AS m2,
               tan(pi()/4.0 - phi0/2.0)/power((1.0 - e*sin(phi0))/(1.0 + e*sin(phi0)), e/2.0) AS t0,
               tan(pi()/4.0 - phi1/2.0)/power((1.0 - e*sin(phi1))/(1.0 + e*sin(phi1)), e/2.0) AS t1,
               tan(pi()/4.0 - phi2/2.0)/power((1.0 - e*sin(phi2))/(1.0 + e*sin(phi2)), e/2.0) AS t2
        FROM k2
      ), k4 AS (SELECT *, (ln(m1)-ln(m2))/(ln(t1)-ln(t2)) AS n FROM k3
      ), k5 AS (SELECT *, m1/(n*power(t1,n)) AS bigF FROM k4
      ), k6 AS (SELECT *, a*bigF*power(t0,n) AS rho0 FROM k5
      ), pts AS (
        SELECT c_custkey,
               radians(CAST(c_custkey % 12 AS DOUBLE) - 4.0 + 0.5) AS lam,
               radians(CAST(c_nationkey % 10 AS DOUBLE) + 42.0 + 0.25) AS phi
        FROM customer
      ), proj AS (
        SELECT c_custkey,
               a*bigF*power(tan(pi()/4.0 - phi/2.0)
                 / power((1.0 - e*sin(phi))/(1.0 + e*sin(phi)), e/2.0), n) AS rho,
               n*(lam - lam0) AS theta, rho0
        FROM pts CROSS JOIN k6
      )
      SELECT c_custkey,
             ROUND(700000.0 + rho*sin(theta), 3) AS lx,
             ROUND(6600000.0 + rho0 - rho*cos(theta), 3) AS ly
      FROM proj ORDER BY c_custkey""",

    // DBSCAN replay: O(n^2) pair join is fine at oracle scale; core =
    // neighborhood count (self included) >= minPts; cluster = min core id
    // via recursive transitive closure over core-core edges (self-pairs
    // seed each core with its own label); borders adopt the min cluster
    // among core neighbors; noise = -1 — mirrors SpatialCluster.dbscanPoints
    "spatial_dbscan" -> """
      WITH RECURSIVE pts AS (
        SELECT c_custkey AS id,
               CAST(CASE WHEN c_custkey % 11 = 0 THEN 500 + (c_custkey % 89) * 7
                         ELSE ((c_custkey % 50) % 10) * 30 +
                              (CASE WHEN c_custkey % 17 = 0 THEN 4 ELSE c_custkey % 3 END)
                    END AS DOUBLE) AS x,
               CAST(CASE WHEN c_custkey % 11 = 0 THEN 500 + (c_custkey % 97) * 7
                         ELSE ((c_custkey % 50) // 10) * 30 +
                              (CASE WHEN c_custkey % 17 = 0 THEN 1 ELSE (c_custkey // 3) % 3 END)
                    END AS DOUBLE) AS y
        FROM customer),
      prs AS (
        SELECT a.id AS ida, b.id AS idb FROM pts a JOIN pts b
        ON (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 4.0),
      core AS (SELECT ida AS id FROM prs GROUP BY ida HAVING COUNT(*) >= 5),
      ce AS (SELECT p.ida AS u, p.idb AS v FROM prs p
             JOIN core c1 ON c1.id = p.ida JOIN core c2 ON c2.id = p.idb),
      reach AS (SELECT u AS id, v AS r FROM ce
                UNION SELECT e.u, r.r FROM ce e JOIN reach r ON e.v = r.id),
      cc AS (SELECT id, MIN(r) AS cluster FROM reach GROUP BY id),
      brd AS (
        SELECT p.ida AS id, MIN(cc.cluster) AS cluster
        FROM prs p JOIN core c2 ON c2.id = p.idb JOIN cc ON cc.id = p.idb
        WHERE p.ida NOT IN (SELECT id FROM core)
        GROUP BY p.ida)
      SELECT p.id, (c.id IS NOT NULL) AS is_core,
             CAST(COALESCE(cc.cluster, brd.cluster, -1) AS BIGINT) AS cluster
      FROM pts p LEFT JOIN core c ON c.id = p.id
      LEFT JOIN cc ON cc.id = p.id
      LEFT JOIN brd ON brd.id = p.id
      ORDER BY p.id""",

    // boilerplate replay: same seeding, same >= minDocs distinct-doc rule
    // with the length floor, same positional rebuild (string_agg ORDER BY
    // the zipped unnest ordinal)
    // full replay of the window sampling + cross-doc recurrence rule
    "dedup_exact_substr" -> """
      WITH w AS (
        SELECT doc_id, p AS pos, substring(text, CAST(p + 1 AS INT), 50) AS win
        FROM documents,
             LATERAL unnest(range(0, greatest(length(text) - 50 + 1, 0), 10)) AS t(p)
        WHERE length(text) >= 50),
      flagged AS (SELECT win FROM w GROUP BY win HAVING COUNT(DISTINCT doc_id) >= 2)
      SELECT doc_id, COUNT(*) AS n_dup_windows, CAST(MIN(pos) AS BIGINT) AS first_pos
      FROM w JOIN flagged USING (win)
      GROUP BY doc_id ORDER BY doc_id""",

    "dedup_boilerplate_lines" -> """
      WITH seeded AS (
        SELECT doc_id,
               text
                 || CASE WHEN doc_id % 2 = 0
                         THEN chr(10) || 'Follow us on example.social for updates!' ELSE '' END
                 || CASE WHEN doc_id % 3 = 0
                         THEN chr(10) || 'Copyright 2024 Example Corp. All rights reserved.' ELSE '' END
                 || CASE WHEN doc_id % 7 = 0 THEN chr(10) || 'short' ELSE '' END AS text
        FROM documents),
      ls AS (SELECT doc_id, string_split(text, chr(10)) AS l FROM seeded),
      lines AS (SELECT doc_id, unnest(l) AS line,
                       unnest(generate_series(1, len(l))) AS pos FROM ls),
      boiler AS (SELECT trim(line) AS bline FROM lines
                 WHERE length(trim(line)) >= 10
                 GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 50),
      kept AS (SELECT doc_id, pos, line FROM lines
               WHERE trim(line) NOT IN (SELECT bline FROM boiler)),
      agg AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text,
                     COUNT(*) AS n_kept
              FROM kept GROUP BY doc_id),
      cnt AS (SELECT doc_id, COUNT(*) AS n_lines FROM lines GROUP BY doc_id)
      SELECT c.doc_id, md5(COALESCE(a.clean_text, '')) AS clean_md5,
             COALESCE(a.n_kept, 0) AS n_kept,
             c.n_lines - COALESCE(a.n_kept, 0) AS n_removed
      FROM cnt c LEFT JOIN agg a USING (doc_id) ORDER BY c.doc_id""",

    // time travel reduces to the insert predicates: snapshot v1 holds the
    // %3=0 rows, v2 adds the %3=1 rows
    "geo_time_travel" -> """
      WITH v1 AS (SELECT c_custkey FROM customer WHERE c_custkey % 3 = 0),
           v2 AS (SELECT c_custkey FROM customer WHERE c_custkey % 3 = 1)
      SELECT 0 AS version, CAST(0 AS BIGINT) AS n_rows, CAST(0 AS BIGINT) AS key_sum
      UNION ALL
      SELECT 1, (SELECT COUNT(*) FROM v1), (SELECT CAST(SUM(c_custkey) AS BIGINT) FROM v1)
      UNION ALL
      SELECT 2, (SELECT COUNT(*) FROM v1) + (SELECT COUNT(*) FROM v2),
             (SELECT CAST(SUM(c_custkey) AS BIGINT) FROM v1)
               + (SELECT CAST(SUM(c_custkey) AS BIGINT) FROM v2)
      UNION ALL
      SELECT 101, (SELECT COUNT(*) FROM v1), (SELECT CAST(SUM(c_custkey) AS BIGINT) FROM v1)
      UNION ALL
      SELECT 102, (SELECT COUNT(*) FROM v1) + (SELECT COUNT(*) FROM v2),
             (SELECT CAST(SUM(c_custkey) AS BIGINT) FROM v1)
               + (SELECT CAST(SUM(c_custkey) AS BIGINT) FROM v2)
      ORDER BY version""",

    // changelog reduces to the DML predicates: inserts = the two append
    // predicates (tagged at commit 2, the upper bound of the queried
    // range), deletes = the delete predicate over what was inserted
    "geo_changelog" -> """
      SELECT 2 AS phase, 'insert' AS change_type, c_custkey AS id, c_nationkey AS nat
      FROM customer WHERE c_custkey % 3 IN (0, 1)
      UNION ALL
      SELECT 3, 'delete', c_custkey, c_nationkey
      FROM customer WHERE c_custkey % 3 IN (0, 1) AND c_custkey % 7 = 0
      ORDER BY phase, id""",

    // path-table streaming ingest reduces to the source aggregate:
    // exactly-once means every customer lands exactly once
    "geo_stream_sink_path" -> """
      SELECT CAST(c_nationkey AS BIGINT) AS nat, COUNT(*) AS n_rows,
             CAST(SUM(c_custkey) AS BIGINT) AS sum_id
      FROM customer GROUP BY 1 ORDER BY nat""",

    // import-by-reference: the union of both registered dirs must be the
    // whole customer table; the pruned phase is a plain range predicate
    "geo_import_parquet" -> """
      SELECT 1 AS phase, COUNT(*) AS n_rows, CAST(SUM(c_custkey) AS BIGINT) AS sum_id
      FROM customer
      UNION ALL
      SELECT 2, COUNT(*), CAST(SUM(c_custkey) AS BIGINT)
      FROM customer WHERE c_custkey < 500
      ORDER BY phase""",

    // overwrite replaces the evens wholesale; the tail append survives
    "geo_insert_overwrite" -> """
      WITH fin AS (
        SELECT CAST(c_custkey AS BIGINT) AS k, CAST(c_nationkey AS BIGINT) AS nat
        FROM customer WHERE c_custkey % 2 = 1
        UNION ALL
        SELECT CAST(c_custkey + 1000000 AS BIGINT), CAST(99 AS BIGINT)
        FROM customer WHERE c_custkey <= 10)
      SELECT nat, COUNT(*) AS n_rows, CAST(SUM(k) AS BIGINT) AS sum_k
      FROM fin GROUP BY nat ORDER BY nat""",

    // both ADD FILES spellings register thirds of customer by reference
    "geo_add_files_sql" -> """
      SELECT CAST(c_nationkey AS BIGINT) AS nat, COUNT(*) AS n_rows,
             CAST(SUM(c_custkey) AS BIGINT) AS sum_id
      FROM customer WHERE c_custkey % 3 IN (0, 1)
      GROUP BY nat ORDER BY nat""",

    // IN-set pruning must return exactly the probed keys
    "geo_in_prune" -> """
      SELECT CAST(c_custkey AS BIGINT) AS k, CAST(c_nationkey AS BIGINT) AS nat
      FROM customer WHERE c_custkey IN (3, 5, 17, 23, 41) ORDER BY k""",

    // point-in-envelope reduces to coordinate range arithmetic (boundary
    // inclusive — ST_Intersects, not ST_ContainsProperly)
    "geo_bbox_pushdown" -> """
      SELECT CAST(c_custkey AS BIGINT) AS id FROM customer
      WHERE c_acctbal >= 0.0 AND c_acctbal <= 3000.0
        AND c_nationkey >= 2.5 AND c_nationkey <= 17.5
      ORDER BY id""",

    // the CDC upsert sink reduces to set algebra: %15 deleted, %9
    // updated to -1, the rest of the %3 subset untouched
    "geo_stream_upsert_sink" -> """
      WITH fin AS (
        SELECT c_custkey AS id,
               CASE WHEN c_custkey % 9 = 0 THEN -1
                    ELSE CAST(c_nationkey AS BIGINT) END AS nat
        FROM customer
        WHERE c_custkey % 3 = 0 AND c_custkey % 15 <> 0)
      SELECT nat, COUNT(*) AS n_rows, CAST(SUM(id) AS BIGINT) AS sum_id
      FROM fin GROUP BY nat ORDER BY nat""",

    // column-stats skipping must return exactly the predicate's rows
    "geo_colstats" -> """
      SELECT 1 AS phase, COUNT(*) AS n_rows, CAST(SUM(c_custkey) AS BIGINT) AS sum_id
      FROM customer WHERE c_custkey >= 100 AND c_custkey < 2000
      UNION ALL
      SELECT 2, COUNT(*), CAST(SUM(c_custkey) AS BIGINT) FROM customer WHERE c_nationkey = 7
      ORDER BY phase""",

    // write-audit-publish reduces to set algebra: phase 1 = main before
    // publish (evens), phase 2 = the staged branch (all), phase 3 = main
    // after the fast-forward (all)
    "geo_wap" -> """
      WITH ev AS (SELECT c_custkey AS id FROM customer WHERE c_custkey % 2 = 0),
           al AS (SELECT c_custkey AS id FROM customer)
      SELECT 1 AS phase, COUNT(*) AS n_rows, CAST(SUM(id) AS BIGINT) AS sum_id FROM ev
      UNION ALL
      SELECT 2, COUNT(*), CAST(SUM(id) AS BIGINT) FROM al
      UNION ALL
      SELECT 3, COUNT(*), CAST(SUM(id) AS BIGINT) FROM al
      ORDER BY phase""",

    // thirds {0,2} get the folded 42 (read-side fill and write-side
    // analyzer default respectively), third {1} carries explicit tiers
    "geo_column_default" -> """
      WITH al AS (
        SELECT CAST(42 AS BIGINT) AS tier, 'web' AS src, CAST(7 AS BIGINT) AS qty,
               c_custkey AS id
        FROM customer WHERE c_custkey % 3 = 0 OR c_custkey % 3 = 2
        UNION ALL
        SELECT CAST(c_nationkey AS BIGINT), 'web', CAST(7 AS BIGINT), c_custkey
        FROM customer WHERE c_custkey % 3 = 1
        UNION ALL
        SELECT CAST(c_nationkey AS BIGINT), 'app', CAST(9 AS BIGINT), c_custkey + 1000000
        FROM customer WHERE c_custkey % 5 = 0)
      SELECT tier, src, qty, COUNT(*) AS n_rows, CAST(SUM(id) AS BIGINT) AS sum_id
      FROM al GROUP BY tier, src, qty ORDER BY tier, src, qty""",

    // closed-form from the delete predicates: two live sidecars before
    // the verb (their recorded rows = the matched counts), still two
    // after the partition-scoped compaction (one now dangling), ONE
    // holding only the live entries after the rewrite; table count never
    // moves (the verb must not touch data)
    "geo_rewrite_deletes" -> """
      WITH c AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM customer),
           d4 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM customer WHERE c_custkey % 10 = 4),
           d7 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM customer WHERE c_custkey % 10 = 7)
      SELECT CAST(phase AS INT) AS phase, n_sidecars, sidecar_rows, n_rows FROM (
        SELECT 1 AS phase, CAST(2 AS BIGINT) AS n_sidecars, d4.n + d7.n AS sidecar_rows,
               c.total - d4.n - d7.n AS n_rows FROM c, d4, d7
        UNION ALL SELECT 2, CAST(2 AS BIGINT), d4.n + d7.n, c.total - d4.n - d7.n FROM c, d4, d7
        UNION ALL SELECT 3, CAST(1 AS BIGINT), d7.n, c.total - d4.n - d7.n FROM c, d4, d7
      ) t ORDER BY phase""",

    // the replayed table's surface as literals: one constraint, one user
    // prop, the bucket layout + the auto stats transforms the replay
    // re-derives (id NOT NULL and nat are stats-eligible; geometry is
    // not), the CRS-typed geometry column, and the loaded row stats
    "geo_show_create" -> """
      SELECT * FROM (
        VALUES ('check', 'id_pos: id >= 0'),
               ('prop', 'team=data-eng'),
               ('partition', 'bucket(4,id)'),
               ('geom', 'g')
        UNION ALL
        SELECT 'rows', CAST(COUNT(*) AS VARCHAR) || ':' || CAST(SUM(c_custkey) AS VARCHAR)
        FROM customer
      ) t(kind, value) ORDER BY kind, value""",

    // the catalog-name replay's metadata as literals (the quote in
    // 'note' survives emit -> unescape; the constraint, partition, sort
    // order, geometry CRS, and the column DEFAULT all rebuild from the
    // emitted DDL; both tables' qty filled write-side from the default)
    "geo_show_create_catalog" -> """
      SELECT * FROM (
        VALUES ('check', 'id_pos: id >= 0'),
               ('prop', 'note=it''s quoted'),
               ('prop', 'team=data-eng'),
               ('partition', 'bucket(4,id)'),
               ('sort', 'nat'),
               ('geom', 'g'),
               ('crs', 'EPSG:3857'),
               ('default', 'qty=5 + 2')
        UNION ALL
        SELECT 'rows', CAST(COUNT(*) AS VARCHAR) || ':' || CAST(SUM(c_custkey) AS VARCHAR)
                       || ':' || CAST(COUNT(*) * 7 AS VARCHAR)
        FROM customer
      ) t(kind, value) ORDER BY kind, value""",

    // the surviving user properties as literals (origin from CREATE-time
    // TBLPROPERTIES, ttl.days was unset, tier was re-set to gold over its
    // create-time 'raw')
    "geo_tblproperties" -> """
      SELECT * FROM (VALUES ('origin', 'create-time'), ('team', 'data-eng'),
                            ('tier', 'gold')) t(key, value)
      ORDER BY key""",

    // the surviving constraint as literals (id_cap was dropped)
    "geo_constraints_meta" -> """
      SELECT * FROM (VALUES ('amt_pos', 'amt > 0')) t(name, expr) ORDER BY name""",

    // cherry-pick reduces to set algebra: phase 1 = thirds {0,2} (main
    // advanced past the fork, staged third {1} NOT visible), phase 2 =
    // the full table once the staged append is picked onto the new head
    "geo_cherrypick" -> """
      WITH pre AS (SELECT c_custkey AS id FROM customer
                   WHERE c_custkey % 3 = 0 OR c_custkey % 3 = 2),
           al AS (SELECT c_custkey AS id FROM customer)
      SELECT 1 AS phase, COUNT(*) AS n_rows, CAST(SUM(id) AS BIGINT) AS sum_id FROM pre
      UNION ALL
      SELECT 2, COUNT(*), CAST(SUM(id) AS BIGINT) FROM al
      ORDER BY phase""",

    // refs reduce to set algebra: the tag pins the even-key snapshot,
    // phase 2 is the post-DML state, phase 3 the restore back to the tag
    "geo_refs" -> """
      WITH ev AS (SELECT c_custkey AS id FROM customer WHERE c_custkey % 2 = 0),
           al AS (SELECT c_custkey AS id FROM customer)
      SELECT 1 AS phase, COUNT(*) AS n_rows, CAST(SUM(id) AS BIGINT) AS sum_id FROM ev
      UNION ALL
      SELECT 2, COUNT(*), CAST(SUM(id) AS BIGINT) FROM al WHERE id % 5 <> 0
      UNION ALL
      SELECT 3, COUNT(*), CAST(SUM(id) AS BIGINT) FROM ev
      ORDER BY phase""",

    // the four keyed SQL verbs as set algebra: phase 1 = customers minus
    // the two literal-keyed deletes; phase 2 = the subquery delete then
    // the keyed MERGE (matched %7 rows -> nat -1 everywhere, unmatched
    // %31=9 non-%7 rows stay deleted, offset %13 rows inserted as -2)
    "geo_dml_delete_eq_sql" -> """
      WITH evens AS (SELECT * FROM customer WHERE c_custkey % 2 = 0),
      p1 AS (
        SELECT c_custkey AS id, CAST(c_nationkey AS BIGINT) AS nat FROM evens
        WHERE c_custkey NOT IN (4, 10, 22, 40, 78) AND c_custkey <> 100),
      p2 AS (
        SELECT c_custkey AS id, CAST(-1 AS BIGINT) AS nat FROM evens
        WHERE c_custkey % 7 = 0
        UNION ALL
        SELECT c_custkey, CAST(c_nationkey AS BIGINT) FROM evens
        WHERE c_custkey % 7 <> 0 AND c_custkey % 31 <> 9
        UNION ALL
        SELECT c_custkey + 10000000, CAST(-2 AS BIGINT) FROM evens
        WHERE c_custkey % 13 = 0)
      SELECT 1 AS phase, COUNT(*) AS n_rows, CAST(SUM(id) AS BIGINT) AS sum_id,
             CAST(SUM(nat) AS BIGINT) AS sum_nat
      FROM p1
      UNION ALL
      SELECT 2, COUNT(*), CAST(SUM(id) AS BIGINT), CAST(SUM(nat) AS BIGINT) FROM p2
      ORDER BY phase""",

    // equality delete + upsert reduce to set algebra on the residue
    // predicates: %13 rows upserted with nat=-1 (surviving their own
    // delete leg), remaining %11=5 rows equality-deleted
    "geo_dml_delete_eq" -> """
      WITH fin AS (
        SELECT c_custkey AS id,
               CASE WHEN c_custkey % 13 = 0 THEN -1
                    ELSE CAST(c_nationkey AS BIGINT) END AS nat
        FROM customer
        WHERE c_custkey % 13 = 0 OR c_custkey % 11 <> 5)
      SELECT nat, COUNT(*) AS n_rows, CAST(SUM(id) AS BIGINT) AS sum_id
      FROM fin GROUP BY nat ORDER BY nat""",

    // the CDC stream's two legs from the residue predicate: every customer
    // inserted at v1, the MoR-deleted residue class deleted at v2
    "geo_cdc_mor" -> """
      SELECT 'delete' AS change_type, COUNT(*) AS n_rows,
             CAST(SUM(c_custkey) AS BIGINT) AS sum_id
      FROM customer WHERE c_custkey % 9 = 4
      UNION ALL
      SELECT 'insert', COUNT(*), CAST(SUM(c_custkey) AS BIGINT) FROM customer
      ORDER BY change_type""",

    // restore reduces to set algebra over the DML predicates: phase 3 =
    // inserts minus the first delete, phase 4 = inserts (delete undone),
    // phase 5 = inserts minus the second delete
    "geo_restore" -> """
      WITH ins AS (SELECT c_custkey AS id FROM customer WHERE c_custkey % 3 IN (0, 1))
      SELECT 3 AS phase, COUNT(*) AS n_rows, CAST(SUM(id) AS BIGINT) AS sum_id
      FROM ins WHERE id % 5 <> 0
      UNION ALL
      SELECT 4, COUNT(*), CAST(SUM(id) AS BIGINT) FROM ins
      UNION ALL
      SELECT 5, COUNT(*), CAST(SUM(id) AS BIGINT) FROM ins WHERE id % 7 <> 0
      ORDER BY phase""",

    // streaming sink reduces to the source aggregate: exactly-once means
    // the streamed table holds each customer exactly once
    "geo_stream_sink" -> """
      SELECT CAST(c_nationkey AS BIGINT) AS nat, COUNT(*) AS n_rows,
             CAST(SUM(c_custkey) AS BIGINT) AS sum_id
      FROM customer GROUP BY 1 ORDER BY nat""",

    // streaming source reduces the same way: both snapshots stream out
    // whole, each customer exactly once
    "geo_stream_source" -> """
      SELECT CAST(c_nationkey AS BIGINT) AS nat, COUNT(*) AS n_rows,
             CAST(SUM(c_custkey) AS BIGINT) AS sum_id
      FROM customer GROUP BY 1 ORDER BY nat""",

    // the admission-controlled drain must consume the same rows
    // exactly-once as one unbounded batch would
    "geo_stream_admit" -> """
      SELECT CAST(c_nationkey AS BIGINT) AS nat, COUNT(*) AS n_rows,
             CAST(SUM(c_custkey) AS BIGINT) AS sum_id
      FROM customer GROUP BY 1 ORDER BY nat""",

    // replay from v3's commit timestamp = exactly the last three inserts
    "geo_stream_from_ts" -> """
      SELECT CAST(c_nationkey AS BIGINT) AS nat, COUNT(*) AS n_rows,
             CAST(SUM(c_custkey) AS BIGINT) AS sum_id
      FROM customer WHERE c_custkey % 5 IN (2, 3, 4)
      GROUP BY 1 ORDER BY nat""",

    // compaction + vacuum preserve content: all three phases equal the
    // post-DELETE set by algebra on the predicates
    "geo_optimize" -> """
      WITH live AS (SELECT c_custkey AS id FROM customer WHERE c_custkey % 5 <> 0)
      SELECT 1 AS phase, COUNT(*) AS n_rows, CAST(SUM(id) AS BIGINT) AS sum_id FROM live
      UNION ALL
      SELECT 2, COUNT(*), CAST(SUM(id) AS BIGINT) FROM live
      UNION ALL
      SELECT 3, COUNT(*), CAST(SUM(id) AS BIGINT) FROM live
      ORDER BY phase""",

    // ndjson Feature round-trip reduces to the source aggregate; x is the
    // integer-valued point coordinate (exact through JSON decimals)
    "geo_json_source" -> """
      SELECT CAST(c_nationkey AS BIGINT) AS nat, COUNT(*) AS n_rows,
             CAST(SUM(c_custkey) AS BIGINT) AS sum_id,
             CAST(SUM(c_custkey % 100) AS DOUBLE) AS sum_x
      FROM customer GROUP BY 1 ORDER BY nat""",

    // XML roundtrip reduces to identity: build the same WKT strings directly
    "st_xml_roundtrip" -> """
      SELECT p_partkey,
             'POINT (' || CAST(p_size AS VARCHAR) || ' ' || CAST(p_size + 1 AS VARCHAR) || ')' AS kml_pt,
             'POLYGON ((0 0, ' || CAST(p_size AS VARCHAR) || ' 0, '
               || CAST(p_size AS VARCHAR) || ' ' || CAST(p_size AS VARCHAR) || ', 0 '
               || CAST(p_size AS VARCHAR) || ', 0 0))' AS gml_poly
      FROM part ORDER BY p_partkey""",

    // every event lands in exactly two 1h windows aligned to 30m: the one
    // starting at floor_1800(t) and the one 1800s earlier
    "stream_window_agg" -> """
      WITH e AS (SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) AS es, event_type
                 FROM events WHERE event_id % 2 = 0),
           w AS (SELECT es - es % 1800 AS w_start, event_type FROM e
                 UNION ALL
                 SELECT es - es % 1800 - 1800, event_type FROM e)
      SELECT w_start, event_type, COUNT(*) AS n
      FROM w GROUP BY 1, 2 ORDER BY w_start, event_type""",

    // bowtie fix: two triangles, sz^2/2 exactly; invalid before, valid after
    "st_makevalid_area" -> """
      SELECT p_partkey,
             CAST(p_size AS DOUBLE) * CAST(p_size AS DOUBLE) / 2 AS fixed_area,
             FALSE AS was_valid, TRUE AS is_valid
      FROM part ORDER BY p_partkey""",

    // sequence identity vs geometric identity
    "st_orderingequals_matrix" -> """
      SELECT p_partkey, TRUE AS same_order, FALSE AS rev_order, TRUE AS geo_equal
      FROM part ORDER BY p_partkey""",

    // clone phases by set algebra: src = evens minus %5 minus %7; dup =
    // (evens minus %5) plus odds — the clone kept the pre-divergence
    // snapshot and neither side saw the other's commits
    "geo_clone" -> """
      WITH base AS (SELECT c_custkey AS id FROM customer
                    WHERE c_custkey % 2 = 0 AND c_custkey % 5 <> 0)
      SELECT 1 AS phase, COUNT(*) AS n_rows, CAST(SUM(id) AS BIGINT) AS sum_id
      FROM base WHERE id % 7 <> 0
      UNION ALL
      SELECT 2, COUNT(*), CAST(SUM(id) AS BIGINT) FROM (
        SELECT id FROM base
        UNION ALL
        SELECT c_custkey FROM customer WHERE c_custkey % 2 = 1)
      ORDER BY phase""",

    // typed-DDL round trip reduces to the source coordinates + the CRS
    // the DDL declared
    "geo_typed_ddl" -> """
      SELECT c_custkey AS id,
             CAST(c_custkey % 100 AS DOUBLE) AS x,
             CAST(c_nationkey AS DOUBLE) AS y,
             'EPSG:3857' AS crs
      FROM customer ORDER BY id""",

    // binPack invariants replay from the input alone: every doc exactly
    // once, token mass conserved, zero multi-doc over-capacity bins
    "pack_bins_invariants" -> """
      SELECT COUNT(*) AS total_docs,
             COUNT(DISTINCT doc_id) AS distinct_docs,
             CAST(SUM(n_chars) AS BIGINT) AS total_tokens,
             CAST(0 AS BIGINT) AS overflow_bins
      FROM documents""",

    // streaming dedup keeps one row per distinct normalized text
    "dedup_stream" -> """
      SELECT COUNT(DISTINCT regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS n_rows
      FROM documents WHERE doc_id % 2 = 0""",

    // rectangle overlay algebra: inter = [sz/2, sz] x [1, sz] (empty at
    // sz = 1), union/difference/symdifference derive by inclusion-exclusion
    "st_set_ops" -> """
      WITH r AS (SELECT p_partkey, CAST(p_size AS DOUBLE) AS sz FROM part),
           c AS (SELECT p_partkey,
                        sz * sz AS a_area,
                        (sz / 2 + 3) * sz AS b_area,
                        (sz / 2) * GREATEST(sz - 1, 0) AS i_area
                 FROM r)
      SELECT p_partkey,
             a_area + b_area - i_area AS u_area,
             i_area,
             a_area - i_area AS d_area,
             a_area + b_area - 2 * i_area AS s_area
      FROM c ORDER BY p_partkey""",

    // origin-anchored envelopes: the group intersection is
    // [0, min(x)] x [0, min(y)], its area the product of the mins
    "st_intersection_aggr_env" -> """
      SELECT CAST(c_nationkey AS BIGINT) AS nat,
             CAST(MIN(10 + c_custkey % 5) AS DOUBLE)
               * CAST(MIN(10 + c_custkey % 7) AS DOUBLE) AS common_area
      FROM customer GROUP BY 1 ORDER BY nat""",

    // the GeoJSON roundtrip must reproduce the constructors exactly —
    // same string oracle as the KML/GML leg
    "st_geojson_roundtrip" -> """
      SELECT p_partkey,
             'POINT (' || CAST(p_size AS VARCHAR) || ' ' || CAST(p_size + 1 AS VARCHAR) || ')' AS gj_pt,
             'POLYGON ((0 0, ' || CAST(p_size AS VARCHAR) || ' 0, '
               || CAST(p_size AS VARCHAR) || ' ' || CAST(p_size AS VARCHAR) || ', 0 '
               || CAST(p_size AS VARCHAR) || ', 0 0))' AS gj_poly
      FROM part ORDER BY p_partkey""",

    // two independent readers of one footer: DuckDB's parquet_kv_metadata
    // + its JSON extension re-derive every column the Spark side produced
    // from its own footer read — string-identical or the key is wrong
    "geoparquet_geo_key" -> """
      WITH kv AS (
        SELECT decode(value) AS v
        FROM parquet_kv_metadata('/tmp/graft_geopq_meta/pts/*.parquet')
        WHERE decode(key) = 'geo')
      SELECT v AS geo_json,
             json_extract_string(v, '$.version') AS version,
             json_extract_string(v, '$.primary_column') AS primary_column,
             json_extract_string(v, '$.columns.geo.encoding') AS encoding,
             json_extract_string(v, '$.columns.geo.geometry_types[0]') AS geometry_types,
             CAST(json_extract(v, '$.columns.geo.bbox[0]') AS DOUBLE) AS xmin,
             CAST(json_extract(v, '$.columns.geo.bbox[1]') AS DOUBLE) AS ymin,
             CAST(json_extract(v, '$.columns.geo.bbox[2]') AS DOUBLE) AS xmax,
             CAST(json_extract(v, '$.columns.geo.bbox[3]') AS DOUBLE) AS ymax,
             json_extract_string(v, '$.columns.geo.covering.bbox.xmin[0]') AS cov_xmin,
             (SELECT COUNT(*) FROM parquet_scan('/tmp/graft_geopq_meta/pts/*.parquet')) AS n_rows
      FROM kv""",

    // the roundtrip preserves rows exactly; ST_Contains is strict, so
    // boundary values fall out on both sides identically
    "geoparquet_roundtrip" -> """
      SELECT CAST(c_nationkey AS BIGINT) AS nat, COUNT(*) AS n_rows,
             CAST(SUM(c_custkey) AS BIGINT) AS sum_id
      FROM customer
      WHERE c_acctbal > 0 AND c_acctbal < 4000
        AND c_nationkey > -0.5 AND c_nationkey < 12.5
      GROUP BY 1 ORDER BY nat""",

    // Gi* replay: O(n^2) neighbor join at oracle scale; the z-score is the
    // SAME expression tree the operator builds (xbar/sdev recomputed in
    // place, numerator then band-corrected denominator)
    "spatial_gi_star" -> """
      WITH t AS (SELECT c_custkey, c_custkey - 1 AS c0 FROM customer),
      p AS (SELECT c_custkey AS id,
              CAST(((c0 % 50) % 10) * 30 + (c0 % 3) AS DOUBLE) AS x,
              CAST(((c0 % 50) // 10) * 30 + ((c0 // 3) % 3) AS DOUBLE) AS y,
              CAST(CASE WHEN (c0 % 50) % 5 = 0 THEN 15 + c0 % 5 ELSE c0 % 10 END AS DOUBLE) AS v
            FROM t),
      g AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, SUM(v) AS sx, SUM(v * v) AS sxx FROM p),
      nb AS (SELECT a.id, CAST(COUNT(*) AS DOUBLE) AS w_sum, SUM(b.v) AS v_sum
             FROM p a JOIN p b
             ON (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 4.0
             GROUP BY a.id)
      SELECT nb.id, nb.w_sum, nb.v_sum,
             (nb.v_sum - (g.sx / g.n) * nb.w_sum)
             / (sqrt(g.sxx / g.n - (g.sx / g.n) * (g.sx / g.n))
                * sqrt((g.n * nb.w_sum - nb.w_sum * nb.w_sum) / (g.n - 1.0))) AS gi_star
      FROM nb CROSS JOIN g ORDER BY nb.id""",

    // LOF replay: exactly-k neighborhoods with (dist, id) tie-break;
    // reachability sums are integers (order-free), the lrd-ratio sum is
    // written as the SAME left-fold chain the operator computes
    // (((l1+l2)+l3)+l4 — aggregate over rank-sorted array), so the scores
    // hash bit-for-bit
    "spatial_lof" -> """
      WITH pts AS (
        SELECT c_custkey AS id,
               CAST(((c_custkey - 1) // 100) * 10000
                    + ((c_custkey - 1) % 100) * (1 + ((c_custkey - 1) // 100) % 3)
                    + CASE WHEN (c_custkey - 1) % 100 = 99 THEN 500 ELSE 0 END AS DOUBLE) AS x
        FROM customer),
      d AS (SELECT a.id AS id, b.id AS nbr, ABS(a.x - b.x) AS dist
            FROM pts a JOIN pts b ON a.id <> b.id),
      r AS (SELECT id, nbr, dist,
                   ROW_NUMBER() OVER (PARTITION BY id ORDER BY dist, nbr) AS rk FROM d),
      n AS (SELECT * FROM r WHERE rk <= 4),
      kd AS (SELECT id, MAX(dist) AS k_dist FROM n GROUP BY id),
      rc AS (SELECT n.id, n.rk, GREATEST(kd.k_dist, n.dist) AS rdist
             FROM n JOIN kd ON kd.id = n.nbr),
      rs AS (SELECT id,
                    ((MAX(CASE WHEN rk = 1 THEN rdist END) + MAX(CASE WHEN rk = 2 THEN rdist END))
                     + MAX(CASE WHEN rk = 3 THEN rdist END)) + MAX(CASE WHEN rk = 4 THEN rdist END) AS rsum
             FROM rc GROUP BY id),
      ld AS (SELECT id, CAST(4.0 AS DOUBLE) / rsum AS lrd FROM rs),
      ls AS (SELECT n.id,
                    ((MAX(CASE WHEN n.rk = 1 THEN l.lrd END) + MAX(CASE WHEN n.rk = 2 THEN l.lrd END))
                     + MAX(CASE WHEN n.rk = 3 THEN l.lrd END)) + MAX(CASE WHEN n.rk = 4 THEN l.lrd END) AS lsum
             FROM n JOIN ld l ON l.id = n.nbr GROUP BY n.id)
      SELECT p.id, kd.k_dist, ld.lrd, ls.lsum / ld.lrd / CAST(4.0 AS DOUBLE) AS lof
      FROM pts p JOIN kd ON kd.id = p.id JOIN ld ON ld.id = p.id JOIN ls ON ls.id = p.id
      ORDER BY p.id""",

    // StAddMeasure replay: vertex measures are m0 + (m1-m0) * (acc/total)
    // over exact integer-valued doubles (axis-aligned segments make every
    // sqrt exact). mv2 is computed ONCE and reused — the interp/locate
    // expressions must see the stored double, not an algebraic equivalent.
    // interp_m replays JTS LineSegment.projectionFactor's op order;
    // loc_y replays StLocateAlong's segment interpolation.
    "st_m_linear_ref" -> """
      WITH t AS (SELECT p_partkey, CAST(p_size AS DOUBLE) AS sz FROM part),
           c AS (SELECT p_partkey, sz,
                        CAST(100.0 AS DOUBLE) + sz * 3 AS m3,
                        CAST(100.0 AS DOUBLE)
                          + (sz * 3) * (sz / (sz + sz * 2)) AS mv2
                 FROM t)
      SELECT p_partkey,
             m3 AS m_end,
             mv2 AS m_v2,
             CAST(100.0 AS DOUBLE) AS m_min,
             m3 AS m_max,
             CAST(0.0 AS DOUBLE) + (sz * 2 - CAST(0.0 AS DOUBLE))
               * (((CAST(100.0 AS DOUBLE) + sz * 1.5) - mv2) / (m3 - mv2)) AS loc_y,
             CAST(100.0 AS DOUBLE) + (mv2 - CAST(100.0 AS DOUBLE))
               * (((sz / 2) * sz + (CAST(-3.0 AS DOUBLE) - CAST(0.0 AS DOUBLE)) * CAST(0.0 AS DOUBLE))
                  / (sz * sz + CAST(0.0 AS DOUBLE) * CAST(0.0 AS DOUBLE))) AS interp_m,
             1 AS zmf,
             3 AS nd
      FROM c ORDER BY p_partkey""",

    // closed-form integer/boolean rules: orientation by construction
    // parity, dedup count by the 2-segment distance cases, dateline by
    // |200 - 2*sz| > 180, best SRID by the PostGIS UTM/UPS rule
    "st_orientation_misc" -> """
      WITH t AS (SELECT p_partkey, p_size, CAST(p_size AS DOUBLE) AS sz FROM part),
           g AS (SELECT p_partkey, p_size, sz,
                        CAST(p_size * 7 % 360 AS DOUBLE) - 180.0 + 0.5 AS lon,
                        CAST(p_size % 18 AS DOUBLE) * 10.0 - 85.0 + 0.5 AS lat
                 FROM t)
      SELECT p_partkey,
             p_size % 2 = 0 AS is_cw,
             p_size % 2 <> 0 AS is_ccw,
             sz * sz AS area_rhr,
             1 AS nrings,
             TRUE AS is_coll,
             CASE WHEN p_size > 10 THEN 3 WHEN p_size > 5 THEN 2 ELSE 3 END AS np_dedup,
             p_size < 10 AS crosses,
             CASE WHEN lat > 84.0 THEN 32661
                  WHEN lat < -80.0 THEN 32761
                  ELSE (CASE WHEN lat >= 0.0 THEN 32600 ELSE 32700 END)
                       + LEAST(60, GREATEST(1, CAST(FLOOR((lon + 180.0) / 6.0) + 1.0 AS INT)))
             END AS best_srid
      FROM g ORDER BY p_partkey""",

    // haversine replayed in Geodesy.haversine's exact IEEE op order
    // (deg * (pi/180), sp*sp + cos*cos*sl*sl, (2*R)*asin); CASTs keep
    // DuckDB's decimal literals out of the arithmetic
    "st_geodesy" -> {
      def hv(lon1: String, lat1: String, lon2: String, lat2: String): String =
        s"""(CAST(2.0 AS DOUBLE) * CAST(6371008.8 AS DOUBLE) * asin(least(CAST(1.0 AS DOUBLE), sqrt(
           sin((($lat2) - ($lat1)) * (pi() / 180.0) / 2.0) * sin((($lat2) - ($lat1)) * (pi() / 180.0) / 2.0)
           + cos(($lat1) * (pi() / 180.0)) * cos(($lat2) * (pi() / 180.0))
             * sin((($lon2) - ($lon1)) * (pi() / 180.0) / 2.0)
             * sin((($lon2) - ($lon1)) * (pi() / 180.0) / 2.0)))))"""
      s"""
      WITH t AS (SELECT n_nationkey,
                        CAST(n_nationkey AS DOUBLE) AS lon,
                        CAST(n_regionkey * 10 - 20 AS DOUBLE) AS lat
                 FROM nation)
      SELECT n_nationkey,
             ROUND(${hv("lon", "lat", "0.0", "0.0")}, 3) AS dist_m,
             ROUND(${hv("lon", "lat", "lon + 1.0", "lat")}
                   + ${hv("lon + 1.0", "lat", "lon + 1.0", "lat + 1.0")}, 3) AS len_m,
             ROUND(lon + CAST(1000.0 AS DOUBLE) * sin(pi() / 4.0), 9) AS proj_x,
             ROUND(CAST(0.0 AS DOUBLE) + CAST(1000.0 AS DOUBLE) * cos(pi() / 4.0), 9) AS proj_y
      FROM t ORDER BY n_nationkey"""
    },

    // meridian Vincenty is non-iterative (lambda: 0 -> 0 on the first
    // pass, sinAlpha = 0, cosSqAlpha = 1), so the closed form below IS the
    // solver's arithmetic in its exact IEEE op order (exact-zero terms
    // like cu2*sin(0) and *1.0 / /1.0 factors dropped — bit-exact no-ops);
    // rectangle areas reduce the Simpson band quadrature to the two
    // constant-latitude edges (meridian edges multiply by an exact 0)
    "st_spheroid_geodesy" -> """
      WITH t AS (SELECT n_nationkey,
                        CAST(n_nationkey AS DOUBLE) AS lon,
                        CAST(n_regionkey * 10 - 20 AS DOUBLE) AS lat
                 FROM nation),
      k0 AS (SELECT CAST(1.0 AS DOUBLE) / CAST(298.257223563 AS DOUBLE) AS ff,
                    CAST(6378137.0 AS DOUBLE) AS ax),
      k1 AS (SELECT ff, ax, ax * (1.0 - ff) AS bx, ff * (2.0 - ff) AS e2x,
                    sqrt(ff * (2.0 - ff)) AS ex FROM k0),
      k2 AS (SELECT *, (ax * ax - bx * bx) / (bx * bx) AS usq FROM k1),
      k3 AS (SELECT *,
               1.0 + usq / 16384.0 * (4096.0 + usq * (-768.0 + usq * (320.0 - 175.0 * usq))) AS biga,
               usq / 1024.0 * (256.0 + usq * (-128.0 + usq * (74.0 - 47.0 * usq))) AS bigb
             FROM k2),
      s0 AS (SELECT t.*, ff, ax, bx, e2x, ex, biga, bigb FROM t CROSS JOIN k3),
      s1 AS (SELECT *,
               atan((1.0 - ff) * tan(lat * (pi() / 180.0))) AS au1,
               atan((1.0 - ff) * tan((lat + 2.0) * (pi() / 180.0))) AS au2,
               atan((1.0 - ff) * tan((lat + 3.0) * (pi() / 180.0))) AS bu2
             FROM s0),
      s2 AS (SELECT *, sin(au1) AS asu1, cos(au1) AS acu1,
                       sin(au2) AS asu2, cos(au2) AS acu2,
                       sin(bu2) AS bsu2, cos(bu2) AS bcu2 FROM s1),
      s3 AS (SELECT *,
               sqrt(pow(acu1 * asu2 - asu1 * acu2, 2)) AS a_ss,
               asu1 * asu2 + acu1 * acu2 AS a_cs,
               sqrt(pow(acu2 * bsu2 - asu2 * bcu2, 2)) AS b_ss,
               asu2 * bsu2 + acu2 * bcu2 AS b_cs
             FROM s2),
      s4 AS (SELECT *,
               atan2(a_ss, a_cs) AS a_sig, a_cs - 2.0 * asu1 * asu2 AS a_c2m,
               atan2(b_ss, b_cs) AS b_sig, b_cs - 2.0 * asu2 * bsu2 AS b_c2m
             FROM s3),
      s5 AS (SELECT *,
               bigb * a_ss * (a_c2m + bigb / 4.0 * (a_cs * (-1.0 + 2.0 * a_c2m * a_c2m)
                 - bigb / 6.0 * a_c2m * (-3.0 + 4.0 * a_ss * a_ss)
                   * (-3.0 + 4.0 * a_c2m * a_c2m))) AS a_dsig,
               bigb * b_ss * (b_c2m + bigb / 4.0 * (b_cs * (-1.0 + 2.0 * b_c2m * b_c2m)
                 - bigb / 6.0 * b_c2m * (-3.0 + 4.0 * b_ss * b_ss)
                   * (-3.0 + 4.0 * b_c2m * b_c2m))) AS b_dsig
             FROM s4),
      s6 AS (SELECT *, bx * biga * (a_sig - a_dsig) AS a_dist,
                       bx * biga * (b_sig - b_dsig) AS b_dist FROM s5),
      q0 AS (SELECT *, sin(lat * (pi() / 180.0)) AS qsl,
                       sin((lat + 1.0) * (pi() / 180.0)) AS qsh FROM s6),
      q1 AS (SELECT *,
               (bx * bx / 2.0) * (qsl / (1.0 - e2x * qsl * qsl)
                 + (1.0 / (2.0 * ex)) * ln((1.0 + ex * qsl) / (1.0 - ex * qsl))) AS qlo,
               (bx * bx / 2.0) * (qsh / (1.0 - e2x * qsh * qsh)
                 + (1.0 / (2.0 * ex)) * ln((1.0 + ex * qsh) / (1.0 - ex * qsh))) AS qhi
             FROM q0),
      q2 AS (SELECT *,
               ((lon + 2.0) - lon) * (pi() / 180.0) * ((qlo + 4.0 * qlo + qlo) / 6.0)
                 + (lon - (lon + 2.0)) * (pi() / 180.0) * ((qhi + 4.0 * qhi + qhi) / 6.0) AS ring
             FROM q1)
      SELECT n_nationkey,
             ROUND(a_dist, 3) AS dist_m,
             ROUND(a_dist + b_dist, 3) AS len_m,
             ROUND(ABS(ring) / 1000000.0, 3) AS area_km2
      FROM q2 ORDER BY n_nationkey""",

    // geohash bounds by floor arithmetic (bit-exact vs the encoder's
    // interval halving on dyadic integer-degree inputs); S2 level-1/2 ids
    // replay the face-cube projection, quadratic st transform, and the
    // first two Hilbert digits (kPosToIJ inverses), with faces >= 4
    // wrapped to the signed-64 id the JVM produces
    "st_cell_systems" -> """
      WITH t AS (SELECT n_nationkey,
                        CAST(n_nationkey AS DOUBLE) AS glon,
                        CAST(n_regionkey * 10 - 20 AS DOUBLE) AS glat,
                        CAST(n_nationkey * 15 - 187 AS DOUBLE) AS slon,
                        CAST(n_regionkey * 10 - 19 AS DOUBLE) AS slat
                 FROM nation),
      gh AS (SELECT *,
               -180.0 + FLOOR((glon + 180.0) / 11.25) * 11.25 AS gx0,
               -90.0 + FLOOR((glat + 90.0) / 5.625) * 5.625 AS gy0
             FROM t),
      u0 AS (SELECT *, slon * (pi() / 180.0) AS lonr, slat * (pi() / 180.0) AS latr FROM gh),
      u1 AS (SELECT *, cos(latr) * cos(lonr) AS px, cos(latr) * sin(lonr) AS py,
                       sin(latr) AS pz FROM u0),
      u2 AS (SELECT *, CASE WHEN abs(px) > abs(py)
                            THEN (CASE WHEN abs(px) > abs(pz) THEN 0 ELSE 2 END)
                            ELSE (CASE WHEN abs(py) > abs(pz) THEN 1 ELSE 2 END) END AS f0
             FROM u1),
      u3 AS (SELECT *, CASE WHEN (CASE f0 WHEN 0 THEN px WHEN 1 THEN py ELSE pz END) < 0.0
                            THEN f0 + 3 ELSE f0 END AS face FROM u2),
      u4 AS (SELECT *,
               CASE face WHEN 0 THEN py / px WHEN 1 THEN -px / py WHEN 2 THEN -px / pz
                         WHEN 3 THEN pz / px WHEN 4 THEN pz / py ELSE -py / pz END AS uu,
               CASE face WHEN 0 THEN pz / px WHEN 1 THEN pz / py WHEN 2 THEN -py / pz
                         WHEN 3 THEN py / px WHEN 4 THEN -px / py ELSE -px / pz END AS vv
             FROM u3),
      u5 AS (SELECT *,
               CASE WHEN uu >= 0.0 THEN 0.5 * sqrt(1.0 + 3.0 * uu)
                    ELSE 1.0 - 0.5 * sqrt(1.0 - 3.0 * uu) END AS ss,
               CASE WHEN vv >= 0.0 THEN 0.5 * sqrt(1.0 + 3.0 * vv)
                    ELSE 1.0 - 0.5 * sqrt(1.0 - 3.0 * vv) END AS tt
             FROM u4),
      u6 AS (SELECT *,
               CAST(LEAST(GREATEST(FLOOR(ss * 1073741824.0), 0.0), 1073741823.0) AS BIGINT) AS ii,
               CAST(LEAST(GREATEST(FLOOR(tt * 1073741824.0), 0.0), 1073741823.0) AS BIGINT) AS jj
             FROM u5),
      u7 AS (SELECT *, face % 2 AS o0,
               ((ii // 536870912) % 2) * 2 + (jj // 536870912) % 2 AS ij1,
               ((ii // 268435456) % 2) * 2 + (jj // 268435456) % 2 AS ij2
             FROM u6),
      u8 AS (SELECT *,
               CASE WHEN o0 = 0 THEN (CASE ij1 WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 3 ELSE 2 END)
                    ELSE (CASE ij1 WHEN 0 THEN 0 WHEN 1 THEN 3 WHEN 2 THEN 1 ELSE 2 END) END AS pos1
             FROM u7),
      u9 AS (SELECT *, xor(o0, CASE pos1 WHEN 0 THEN 1 WHEN 3 THEN 3 ELSE 0 END) AS o1 FROM u8),
      ua AS (SELECT *,
               CASE WHEN o1 = 0 THEN (CASE ij2 WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 3 ELSE 2 END)
                    WHEN o1 = 1 THEN (CASE ij2 WHEN 0 THEN 0 WHEN 1 THEN 3 WHEN 2 THEN 1 ELSE 2 END)
                    WHEN o1 = 2 THEN (CASE ij2 WHEN 0 THEN 2 WHEN 1 THEN 3 WHEN 2 THEN 1 ELSE 0 END)
                    ELSE (CASE ij2 WHEN 0 THEN 2 WHEN 1 THEN 1 WHEN 2 THEN 3 ELSE 0 END) END AS pos2
             FROM u9),
      ub AS (SELECT *, CAST(CASE WHEN face >= 4 THEN face - 8 ELSE face END AS BIGINT) AS facew
             FROM ua)
      SELECT n_nationkey,
             ROUND(gx0, 9) AS gh_x0, ROUND(gx0 + 11.25, 9) AS gh_x1,
             ROUND(gy0, 9) AS gh_y0, ROUND(gy0 + 5.625, 9) AS gh_y1,
             facew * 2305843009213693952 + pos1 * 576460752303423488
               + 288230376151711744 AS s2_l1,
             facew * 2305843009213693952 + pos1 * 576460752303423488
               + pos2 * 144115188075855872 + 72057594037927936 AS s2_l2
      FROM ub ORDER BY n_nationkey""",

    // closed forms: last segment length sz (vertical/horizontal), exact
    // quarter-point lerp, bowtie crossing at (sz/2, sz/2)
    "st_line_detail" -> """
      SELECT p_partkey,
             CASE WHEN p_partkey % 2 = 0 THEN 2 ELSE 1 END AS n_segs,
             ROUND(CAST(p_size AS DOUBLE), 9) AS last_len,
             ROUND(CAST(p_size AS DOUBLE) * 0.25, 9) AS x25,
             ROUND(CAST(p_size AS DOUBLE) * 0.25, 9) AS z25,
             p_partkey % 2 = 0 AS is_valid,
             CASE WHEN p_partkey % 2 = 0 THEN NULL ELSE 'Self-intersection' END AS reason,
             CASE WHEN p_partkey % 2 = 0 THEN NULL
                  ELSE ROUND(CAST(p_size AS DOUBLE) / 2.0, 9) END AS loc_x,
             CASE WHEN p_partkey % 2 = 0 THEN NULL
                  ELSE ROUND(CAST(p_size AS DOUBLE) / 2.0, 9) END AS loc_y
      FROM part ORDER BY p_partkey""",

    // exact DuckDB replica of the langId heuristic: per-lang marker hit
    // counts, argmax with ties to the lexicographically greatest lang
    // (matches Spark's array_max over struct(hits, lang)), 'und' on zero
    "text_langid" -> """
      WITH t AS (SELECT doc_id, string_split_regex(trim(lower(text)), ' +') AS toks FROM documents),
      h AS (SELECT doc_id,
        len(list_filter(toks, x -> x IN ('the','and','of','to','is','in','that','it','for','with'))) AS h_en,
        len(list_filter(toks, x -> x IN ('le','la','les','de','et','est','un','une','dans','pour'))) AS h_fr,
        len(list_filter(toks, x -> x IN ('el','la','los','de','y','es','un','una','en','para'))) AS h_es,
        len(list_filter(toks, x -> x IN ('der','die','das','und','ist','ein','eine','in','für','mit'))) AS h_de,
        len(list_filter(toks, x -> x IN ('的','是','在','了','和','有','我','他','这','中'))) AS h_zh
        FROM t)
      SELECT doc_id,
             CASE WHEN greatest(h_en, h_fr, h_es, h_de, h_zh) = 0 THEN 'und'
                  WHEN h_zh = greatest(h_en, h_fr, h_es, h_de, h_zh) THEN 'zh'
                  WHEN h_fr = greatest(h_en, h_fr, h_es, h_de, h_zh) THEN 'fr'
                  WHEN h_es = greatest(h_en, h_fr, h_es, h_de, h_zh) THEN 'es'
                  WHEN h_en = greatest(h_en, h_fr, h_es, h_de, h_zh) THEN 'en'
                  ELSE 'de' END AS pred_lang
      FROM h ORDER BY doc_id""",

    // bit-exact Gopher replay: integer components, cross-multiplied
    // integer threshold comparisons (no float anywhere); the line rules
    // drop out of the projection (single-line corpus) but stay inside
    // `passes` identically on both sides (0 bullet/ellipsis lines)
    "text_gopher_rules" -> """
      WITH t AS (SELECT doc_id, text,
                        string_split_regex(trim(text), ' +') AS toks,
                        string_split(text, chr(10)) AS lines
                 FROM documents)
      SELECT doc_id,
        CAST(len(toks) AS BIGINT) AS n_words,
        CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS sum_word_len,
        CAST(len(list_filter(toks, x -> contains(x, '#') OR contains(x, '...')
                                        OR contains(x, '…'))) AS BIGINT) AS n_symbol_words,
        CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS n_alpha_words,
        CAST(len(list_filter(['the','be','to','of','and','that','have','with'],
                             w -> list_contains(toks, w))) AS BIGINT) AS n_stop_hits,
        (len(toks) >= 50 AND len(toks) <= 100000
         AND list_sum(list_transform(toks, x -> length(x))) >= len(toks) * 3
         AND list_sum(list_transform(toks, x -> length(x))) <= len(toks) * 10
         AND len(list_filter(toks, x -> contains(x, '#') OR contains(x, '...')
                                        OR contains(x, '…'))) * 10 <= len(toks)
         AND len(list_filter(lines, l -> starts_with(trim(l), '-')
                 OR starts_with(trim(l), '*') OR starts_with(trim(l), '•'))) * 10
             <= len(lines) * 9
         AND len(list_filter(lines, l -> suffix(trim(l), '...')
                 OR suffix(trim(l), '…'))) * 10 <= len(lines) * 3
         AND len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) * 5
             >= len(toks) * 4
         AND len(list_filter(['the','be','to','of','and','that','have','with'],
                             w -> list_contains(toks, w))) >= 2) AS passes
      FROM t ORDER BY doc_id""",

    // exact BM25 replay: same +1-idf Okapi formulation, rank-only output
    // (see the query comment for the FP-robustness argument)
    // RRF fusion replayed exactly: BM25 top-50 ranks (the verified CTE
    // stack) full-outer-joined with cosine top-50 ranks, fused as
    // 1/(60+rank) sums; rank-only output (the fused score is exact in
    // the legs' integer ranks, but the BM25 leg's rank order rests on
    // double scores — see the query comment)
    "hybrid_rrf_top10" -> """
      WITH toks AS (SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS term
                    FROM documents),
           dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
           stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
           tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
                  WHERE term IN ('spark','customer','merge') GROUP BY doc_id, term),
           dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
           scored AS (
             SELECT t.doc_id,
                    sum(ln(1 + (s.n - f.df + 0.5) / (f.df + 0.5)) * t.tf * 2.2 /
                        (t.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / s.avgdl))) AS score
             FROM tf t JOIN dfreq f USING (term) JOIN dl d USING (doc_id)
                  CROSS JOIN stats s
             GROUP BY t.doc_id),
           lex AS (SELECT doc_id AS id, rn FROM (
                     SELECT doc_id, ROW_NUMBER() OVER (ORDER BY round(score, 6) DESC, doc_id) AS rn
                     FROM scored) t WHERE rn <= 50),
           dense AS (SELECT vec_id AS id, rn FROM (
                     SELECT vec_id, ROW_NUMBER() OVER (ORDER BY
                       list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                         (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)) DESC,
                       vec_id) AS rn
                     FROM embeddings) t WHERE rn <= 50),
           fused AS (SELECT COALESCE(l.id, v.id) AS doc_id,
                            COALESCE(1.0/(60 + l.rn), 0) + COALESCE(1.0/(60 + v.rn), 0) AS rrf_score
                     FROM lex l FULL OUTER JOIN dense v ON l.id = v.id)
      SELECT doc_id, CAST(rn AS INT) AS rank FROM (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY rrf_score DESC, doc_id) AS rn
        FROM fused) t
      WHERE rn <= 10 ORDER BY rn""",

    // the stored-index spelling must not move a single fused rank
    "hybrid_rrf_indexed_top10" -> """
      WITH toks AS (SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS term
                    FROM documents),
           dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
           stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
           tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
                  WHERE term IN ('spark','customer','merge') GROUP BY doc_id, term),
           dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
           scored AS (
             SELECT t.doc_id,
                    sum(ln(1 + (s.n - f.df + 0.5) / (f.df + 0.5)) * t.tf * 2.2 /
                        (t.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / s.avgdl))) AS score
             FROM tf t JOIN dfreq f USING (term) JOIN dl d USING (doc_id)
                  CROSS JOIN stats s
             GROUP BY t.doc_id),
           lex AS (SELECT doc_id AS id, rn FROM (
                     SELECT doc_id, ROW_NUMBER() OVER (ORDER BY round(score, 6) DESC, doc_id) AS rn
                     FROM scored) t WHERE rn <= 50),
           dense AS (SELECT vec_id AS id, rn FROM (
                     SELECT vec_id, ROW_NUMBER() OVER (ORDER BY
                       list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                         (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)) DESC,
                       vec_id) AS rn
                     FROM embeddings) t WHERE rn <= 50),
           fused AS (SELECT COALESCE(l.id, v.id) AS doc_id,
                            COALESCE(1.0/(60 + l.rn), 0) + COALESCE(1.0/(60 + v.rn), 0) AS rrf_score
                     FROM lex l FULL OUTER JOIN dense v ON l.id = v.id)
      SELECT doc_id, CAST(rn AS INT) AS rank FROM (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY rrf_score DESC, doc_id) AS rn
        FROM fused) t
      WHERE rn <= 10 ORDER BY rn""",

    // the PQ-quantized dense leg (ADC sweep + exact rerank, candidates
    // covering the corpus) must reproduce the exact fused ranks too
    "hybrid_rrf_pq_top10" -> """
      WITH toks AS (SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS term
                    FROM documents),
           dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
           stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
           tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
                  WHERE term IN ('spark','customer','merge') GROUP BY doc_id, term),
           dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
           scored AS (
             SELECT t.doc_id,
                    sum(ln(1 + (s.n - f.df + 0.5) / (f.df + 0.5)) * t.tf * 2.2 /
                        (t.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / s.avgdl))) AS score
             FROM tf t JOIN dfreq f USING (term) JOIN dl d USING (doc_id)
                  CROSS JOIN stats s
             GROUP BY t.doc_id),
           lex AS (SELECT doc_id AS id, rn FROM (
                     SELECT doc_id, ROW_NUMBER() OVER (ORDER BY round(score, 6) DESC, doc_id) AS rn
                     FROM scored) t WHERE rn <= 50),
           dense AS (SELECT vec_id AS id, rn FROM (
                     SELECT vec_id, ROW_NUMBER() OVER (ORDER BY
                       list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                         (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)) DESC,
                       vec_id) AS rn
                     FROM embeddings) t WHERE rn <= 50),
           fused AS (SELECT COALESCE(l.id, v.id) AS doc_id,
                            COALESCE(1.0/(60 + l.rn), 0) + COALESCE(1.0/(60 + v.rn), 0) AS rrf_score
                     FROM lex l FULL OUTER JOIN dense v ON l.id = v.id)
      SELECT doc_id, CAST(rn AS INT) AS rank FROM (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY rrf_score DESC, doc_id) AS rn
        FROM fused) t
      WHERE rn <= 10 ORDER BY rn""",

    "text_bm25_topk" -> """
      WITH toks AS (SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS term
                    FROM documents),
           dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
           stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
           tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
                  WHERE term IN ('spark','customer','merge') GROUP BY doc_id, term),
           dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
           scored AS (
             SELECT t.doc_id,
                    sum(ln(1 + (s.n - f.df + 0.5) / (f.df + 0.5)) * t.tf * 2.2 /
                        (t.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / s.avgdl))) AS score
             FROM tf t JOIN dfreq f USING (term) JOIN dl d USING (doc_id)
                  CROSS JOIN stats s
             GROUP BY t.doc_id)
      SELECT doc_id, CAST(rn AS INT) AS rank FROM (
        SELECT doc_id, ROW_NUMBER() OVER (ORDER BY round(score, 6) DESC, doc_id) AS rn
        FROM scored) t
      WHERE rn <= 10 ORDER BY rn""",

    // post-upsert BM25 must rank like ad-hoc BM25 over the MODIFIED
    // corpus: replaced docs score under their new text only
    "text_bm25_upsert_topk" -> """
      WITH corpus AS (SELECT doc_id,
                             CASE WHEN doc_id % 5 = 0 THEN text || ' spark merge'
                                  ELSE text END AS text
                      FROM documents),
           toks AS (SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS term
                    FROM corpus),
           dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
           stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
           tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
                  WHERE term IN ('spark','customer','merge') GROUP BY doc_id, term),
           dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
           scored AS (
             SELECT t.doc_id,
                    sum(ln(1 + (s.n - f.df + 0.5) / (f.df + 0.5)) * t.tf * 2.2 /
                        (t.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / s.avgdl))) AS score
             FROM tf t JOIN dfreq f USING (term) JOIN dl d USING (doc_id)
                  CROSS JOIN stats s
             GROUP BY t.doc_id)
      SELECT doc_id, CAST(rn AS INT) AS rank FROM (
        SELECT doc_id, ROW_NUMBER() OVER (ORDER BY round(score, 6) DESC, doc_id) AS rn
        FROM scored) t
      WHERE rn <= 10 ORDER BY rn""",

    // post-removal BM25 over the index must rank like ad-hoc BM25 over
    // the SURVIVING corpus: tf and df lose the removed docs via the
    // sidecar merge, N/avgdl via the stats-row changelog delta
    "text_bm25_delete_topk" -> """
      WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 3),
           toks AS (SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS term
                    FROM corpus),
           dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
           stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
           tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
                  WHERE term IN ('spark','customer','merge') GROUP BY doc_id, term),
           dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
           scored AS (
             SELECT t.doc_id,
                    sum(ln(1 + (s.n - f.df + 0.5) / (f.df + 0.5)) * t.tf * 2.2 /
                        (t.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / s.avgdl))) AS score
             FROM tf t JOIN dfreq f USING (term) JOIN dl d USING (doc_id)
                  CROSS JOIN stats s
             GROUP BY t.doc_id)
      SELECT doc_id, CAST(rn AS INT) AS rank FROM (
        SELECT doc_id, ROW_NUMBER() OVER (ORDER BY round(score, 6) DESC, doc_id) AS rn
        FROM scored) t
      WHERE rn <= 10 ORDER BY rn""",

    "text_quality_components" -> """
      SELECT doc_id,
             CAST(len(string_split_regex(trim(text), ' +')) AS INT) AS n_tokens,
             CAST(len(list_filter(string_split_regex(trim(text), ' +'),
                  x -> x IN ('the','a','an','of','and','to','in','is','for','on'))) AS INT) AS n_stop
      FROM documents ORDER BY doc_id""",

    "lang_distribution" -> """
      SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS total_chars
      FROM documents GROUP BY lang ORDER BY lang""",

    // concat-then-chunk packing: group offsets via a window over per-source
    // totals, then within-source running sums; // is DuckDB integer division
    // (Spark side uses DIV on the same BIGINT offsets)
    "pack_chunks" -> """
      WITH t AS (
        SELECT doc_id, source,
               CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS tok
        FROM documents),
      g AS (SELECT source, CAST(SUM(tok) AS BIGINT) AS gt FROM t GROUP BY source),
      go AS (SELECT source,
                    CAST(SUM(gt) OVER (ORDER BY source) - gt AS BIGINT) AS goff
             FROM g),
      c AS (
        SELECT t.doc_id, t.tok,
               CAST(go.goff + SUM(t.tok) OVER (PARTITION BY t.source ORDER BY t.doc_id)
                    - t.tok AS BIGINT) AS cumb
        FROM t JOIN go USING (source))
      SELECT doc_id,
             cumb // 64 AS first_chunk,
             (cumb + greatest(tok, 1) - 1) // 64 AS last_chunk,
             ((cumb + greatest(tok, 1) - 1) // 64) - (cumb // 64) + 1 AS n_chunks
      FROM c ORDER BY doc_id""",

    // same arithmetic as TrainingData.mixtureWeights: targets 0.5/0.25/0.25
    // are exactly-representable doubles, every derived value is the same
    // IEEE expression tree on both engines
    "mix_weights" -> """
      WITH per AS (
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT)) AS BIGINT)
                 AS actual_tokens
        FROM documents GROUP BY source),
      fr AS (
        SELECT source, n_docs, actual_tokens,
               CAST(actual_tokens AS DOUBLE) / SUM(actual_tokens) OVER () AS actual_frac,
               CASE source WHEN 'src0' THEN 0.5 WHEN 'src1' THEN 0.25
                           WHEN 'src3' THEN 0.25 ELSE 0.0 END AS target_frac
        FROM per),
      sc AS (
        SELECT *, MIN(CASE WHEN target_frac > 0 THEN actual_frac / target_frac END)
                    OVER () AS c
        FROM fr)
      SELECT source, n_docs, actual_tokens, actual_frac, target_frac,
             CASE WHEN target_frac > 0
                  THEN least(1.0, c * target_frac / actual_frac)
                  ELSE 0.0 END AS sample_rate
      FROM sc ORDER BY source""",

    // replay of hashUniform: Knuth multiplicative hash on the 32-bit ring,
    // pure BIGINT arithmetic (doc_id >= 0 so % == pmod), with the same
    // split 16-bit multiply as TrainingData.hashUniform so the formula is
    // overflow-free in DuckDB too (naive id*K raises BIGINT overflow above
    // ~3.5e9 there)
    "mix_sample" -> """
      WITH per AS (
        SELECT source,
               CAST(SUM(CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT)) AS BIGINT)
                 AS actual_tokens
        FROM documents GROUP BY source),
      fr AS (
        SELECT source, actual_tokens,
               CAST(actual_tokens AS DOUBLE) / SUM(actual_tokens) OVER () AS actual_frac,
               CASE source WHEN 'src0' THEN 0.5 WHEN 'src1' THEN 0.25
                           WHEN 'src3' THEN 0.25 ELSE 0.0 END AS target_frac
        FROM per),
      sc AS (
        SELECT *, MIN(CASE WHEN target_frac > 0 THEN actual_frac / target_frac END)
                    OVER () AS c
        FROM fr),
      rates AS (
        SELECT source,
               CASE WHEN target_frac > 0
                    THEN least(1.0, c * target_frac / actual_frac)
                    ELSE 0.0 END AS sample_rate
        FROM sc)
      SELECT d.doc_id, d.source
      FROM documents d JOIN rates r USING (source)
      WHERE CAST((((d.doc_id % 4294967296) % 65536) * 2654435761
                  + ((((d.doc_id % 4294967296) // 65536) * 2654435761) % 65536) * 65536
                  + 104729) % 4294967296 AS DOUBLE)
            / 4294967296.0 < r.sample_rate
      ORDER BY d.doc_id""",

    // rank-by-portable-hash per source, keep rank <= cap (under-cap
    // sources pass whole: their every rank <= count <= cap)
    "curate_source_cap" -> """
      WITH corpus AS (SELECT doc_id, source FROM documents
                      WHERE NOT (source IN ('src2','src3') AND doc_id % 2 = 1)),
           h AS (SELECT doc_id, source,
                   CAST((((doc_id % 4294967296) % 65536) * 2654435761
                         + ((((doc_id % 4294967296) // 65536) * 2654435761) % 65536) * 65536
                         + 104729) % 4294967296 AS DOUBLE) / 4294967296.0 AS u
                 FROM corpus),
           r AS (SELECT doc_id, source,
                   ROW_NUMBER() OVER (PARTITION BY source ORDER BY u, doc_id) AS rn
                 FROM h)
      SELECT doc_id, source FROM r WHERE rn <= 15 ORDER BY doc_id""",

    "decontaminate_overlap" -> """
      -- Spark joins on xxhash64(gram) fingerprints; this oracle joins on
      -- the gram strings. Counts agree because the output only counts
      -- matches (fingerprinting changes the key width, not the matches,
      -- barring a 2^-64 collision).
      WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), ' +') AS t FROM documents),
      grams AS (
        SELECT doc_id,
               unnest(list_distinct(CASE WHEN len(t) >= 5
                 THEN list_transform(range(1, len(t) - 4 + 1),
                        i -> array_to_string(t[CAST(i AS INT):CAST(i AS INT) + 4], ' '))
                 ELSE [] END)) AS g
        FROM toks)
      SELECT d.doc_id AS doc_id, p.doc_id AS probe_id, COUNT(*) AS shared_ngrams
      FROM grams d JOIN grams p USING (g)
      WHERE p.doc_id % 17 = 0 AND d.doc_id <> p.doc_id
      GROUP BY d.doc_id, p.doc_id
      ORDER BY d.doc_id, probe_id""",

    "text_unigram_logprob" -> """
      WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS tok FROM documents),
      freqs AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
      tot AS (SELECT SUM(cnt) AS total FROM freqs)
      SELECT doc_id,
             ROUND(AVG(ln(CAST(cnt AS DOUBLE) / total)), 6) AS avg_logprob,
             COUNT(*) AS n_tokens
      FROM toks JOIN freqs USING (tok), tot
      GROUP BY doc_id ORDER BY doc_id""",

    "text_repetition" -> """
      WITH t AS (
        SELECT doc_id, string_split_regex(trim(text), ' +') AS toks FROM documents),
      b AS (
        SELECT doc_id,
               list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
                 i -> toks[CAST(i AS INT)] || ' ' || toks[CAST(i AS INT) + 1]) AS bi
        FROM t)
      SELECT doc_id,
             CAST(len(bi) AS INT) AS n_bigrams,
             CASE WHEN len(bi) > 0
                  THEN 1.0 - CAST(len(list_distinct(bi)) AS DOUBLE) / len(bi)
                  ELSE 0.0 END AS dup_bigram_frac,
             CASE WHEN len(bi) > 0
                  THEN CAST(list_max(list_transform(list_distinct(bi),
                         d -> len(list_filter(bi, x -> x = d)))) AS DOUBLE) / len(bi)
                  ELSE 0.0 END AS top_bigram_frac
      FROM b ORDER BY doc_id""",

    // seeding replayed 1:1; RE2 and Java regex agree on these patterns
    // (plain char classes, no lookaround); md5 hex is lowercase on both
    "pii_redact" -> """
      WITH seeded AS (
        SELECT doc_id,
               CASE WHEN doc_id % 11 = 0
                    THEN base || ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                    ELSE base END AS text2
        FROM (
          SELECT doc_id,
                 CASE WHEN doc_id % 7 = 0
                      THEN text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
                      ELSE text END AS base
          FROM documents))
      SELECT doc_id,
             CAST(len(regexp_extract_all(text2, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
             CAST(len(regexp_extract_all(text2, '\+1-[0-9]{3}-[0-9]{4}')) AS INT) AS n_phones,
             md5(regexp_replace(regexp_replace(text2,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                 '\+1-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g')) AS redacted_md5
      FROM seeded ORDER BY doc_id""",

    // same seeding; Luhn replay: 1-based list_transform index i, so EVEN
    // i doubles (Spark's 0-based transform doubles odd i — same digits).
    // Extraction = maximal digit runs + length filter; replacement =
    // span-anchored regexp per verified run with the 'g' flag (DuckDB's
    // regexp_replace is first-match-only by default; Spark's is global)
    "pii_redact_cards" -> """
      WITH seeded AS (
        SELECT doc_id,
               CASE WHEN doc_id % 17 = 0 THEN base || ' ref 4111111111111112 x'
                    ELSE base END AS text2
        FROM (
          SELECT doc_id,
                 CASE WHEN doc_id % 13 = 0 THEN text || ' card 4111111111111111 ok'
                      ELSE text END AS base
          FROM documents)),
      cands AS (
        SELECT doc_id, text2,
               list_filter(regexp_extract_all(text2, '[0-9]+'),
                 c -> length(c) BETWEEN 13 AND 19 AND
                      list_sum(list_transform(list_reverse(string_split(c, '')),
                        (d, i) -> CASE WHEN i % 2 = 0
                                       THEN CAST(d AS INT) * 2 -
                                            CASE WHEN CAST(d AS INT) * 2 > 9 THEN 9 ELSE 0 END
                                       ELSE CAST(d AS INT) END)) % 10 = 0) AS valid
        FROM seeded)
      SELECT doc_id, CAST(len(valid) AS INT) AS n_cards,
             md5(list_reduce(list_prepend(text2, valid),
                 (acc, c) -> regexp_replace(acc, '(^|[^0-9])' || c || '([^0-9]|$)',
                                            '\1<CARD>\2', 'g'))) AS redacted_md5
      FROM cands ORDER BY doc_id""",

    // end state of UPDATE ... WHERE st_within(point, envelope): strict
    // interior, bounds at non-representable decimals so no point sits on a
    // boundary (same convention as st_within_range)
    "dedup_scale_estimate" -> """
      SELECT COUNT(DISTINCT text) AS exact_distinct, TRUE AS approx_ok
      FROM documents""",

    "zone_enrich_batch" -> """
      SELECT n_nationkey AS zone_id, COUNT(*) AS n
      FROM nation JOIN events
        ON value > n_nationkey*40.0 + 0.005 AND value < n_nationkey*40.0 + 60.005
        AND (user_id % 25) >= 0 AND (user_id % 25) <= 24
      GROUP BY n_nationkey ORDER BY zone_id""",

    "geo_dml_update" -> """
      SELECT c_custkey,
             CASE WHEN c_acctbal > 0.005 AND c_acctbal < 5000.005
                   AND c_nationkey >= 0 AND c_nationkey <= 10
                  THEN 1 ELSE 0 END AS flag
      FROM customer ORDER BY c_custkey""",

    "geo_dml_delete" -> """
      SELECT c_nationkey, COUNT(*) AS n FROM customer
      WHERE NOT (c_acctbal > 2000.005 AND c_acctbal < 9000.005
                 AND c_nationkey >= 5 AND c_nationkey <= 19)
      GROUP BY c_nationkey ORDER BY c_nationkey""",

    // merge-on-read delete reduces to the same relational shape: survivors
    // of the sparse predicate, aggregated
    "geo_dml_delete_mor" -> """
      SELECT c_nationkey, COUNT(*) AS n, CAST(SUM(c_custkey) AS BIGINT) AS key_sum
      FROM customer WHERE c_custkey % 97 <> 0
      GROUP BY c_nationkey ORDER BY c_nationkey""",

    "geo_dml_merge" -> """
      WITH src AS (
        SELECT c_custkey AS sid, c_nationkey AS snat FROM customer WHERE c_custkey % 10 = 0
        UNION ALL
        SELECT c_custkey + 1000000, c_nationkey FROM customer WHERE c_custkey % 100 = 0
      ),
      tgt AS (SELECT c_custkey, 0 AS flag FROM customer),
      merged AS (
        SELECT t.c_custkey,
               CASE WHEN s.sid IS NOT NULL THEN 1 ELSE t.flag END AS flag,
               CASE WHEN s.sid IS NOT NULL AND s.snat < 5 THEN 1 ELSE 0 END AS del
        FROM tgt t LEFT JOIN src s ON t.c_custkey = s.sid
      ),
      final AS (
        SELECT c_custkey, flag FROM merged WHERE del = 0
        UNION ALL
        SELECT s.sid, 2 FROM src s LEFT JOIN tgt t ON t.c_custkey = s.sid
        WHERE t.c_custkey IS NULL
      )
      SELECT flag, COUNT(*) AS n, CAST(SUM(c_custkey) AS BIGINT) AS key_sum
      FROM final GROUP BY flag ORDER BY flag""",

    // score values are nationkey/4 — exact at DECIMAL(10,2) scale (.0/.25/
    // .5/.75), so the decimal column's sum cast to DOUBLE replays exactly
    "geo_ddl_evolution" -> """
      WITH evo AS (
        SELECT c_custkey, CAST(NULL AS INT) AS tier, CAST(NULL AS DOUBLE) AS score
        FROM customer WHERE c_custkey % 2 = 0
        UNION ALL
        SELECT c_custkey + 1000000, CAST(c_nationkey % 3 AS INT),
               c_nationkey / CAST(4.0 AS DOUBLE)
        FROM customer WHERE c_custkey % 2 = 1)
      SELECT coalesce(tier, -1) AS tier, COUNT(*) AS n,
             CAST(SUM(c_custkey) AS BIGINT) AS key_sum,
             CAST(SUM(score) AS DOUBLE) AS score_sum
      FROM evo GROUP BY 1 ORDER BY tier""",

    "geo_ctas" -> """
      SELECT c_custkey, c_nationkey,
             c_acctbal AS x, CAST(c_nationkey AS DOUBLE) AS y
      FROM customer WHERE c_acctbal > 0.005 ORDER BY c_custkey""",

    // per-day row counts replayed from the raw source; the partition
    // label is the UTC day ordinal the days() transform records
    "geo_partitions_meta" -> """
      SELECT 'months(dd)=' ||
               CAST((year(CAST(o_orderdate AS DATE)) - 1970) * 12
                    + month(CAST(o_orderdate AS DATE)) - 1 AS VARCHAR)
               AS "partition",
             CAST(COUNT(*) AS BIGINT) AS row_count
      FROM orders GROUP BY 1 ORDER BY "partition"""",

    // two keyed DELETE statements fully determine their sidecar rows
    "geo_deletes_meta" -> """
      SELECT * FROM (
        SELECT 'equality' AS type, CAST(5 AS BIGINT) AS "rows", 'id' AS key_columns,
               2 AS "sequence", CAST(4 AS BIGINT) AS key_min, CAST(78 AS BIGINT) AS key_max
        UNION ALL
        SELECT 'equality', CAST(1 AS BIGINT), 'id', 3, CAST(100 AS BIGINT), CAST(100 AS BIGINT))
      ORDER BY "sequence"""",

    // the verb sequence + source counts reproduce every non-layout column
    "geo_snapshots_meta" -> """
      WITH c AS (
        SELECT CAST(COUNT(*) FILTER (WHERE o_orderkey % 2 = 0) AS BIGINT) AS n0,
               CAST(COUNT(*) FILTER (WHERE o_orderkey % 2 = 1) AS BIGINT) AS n1
        FROM orders)
      SELECT * FROM (
        SELECT 0 AS version, 'create' AS operation,
               CAST(0 AS BIGINT) AS total_rows, CAST(0 AS BIGINT) AS added_rows FROM c
        UNION ALL
        SELECT 1, 'append', n0, n0 FROM c
        UNION ALL
        SELECT 2, 'append', n0 + n1, n1 FROM c) ORDER BY version""",

    // the ref verb sequence fully determines every t.refs row
    "geo_refs_meta" -> """
      SELECT * FROM (VALUES ('b1', 'BRANCH', 3), ('t1', 'TAG', 1), ('t2', 'TAG', 1))
        t(name, type, version) ORDER BY name""",

    // keyed DELETE leaves data files intact (sidecar-only commit); the
    // CALL compaction retires every v1 file into one live v3 file holding
    // the merged (deleted-rows-applied) count
    "geo_allfiles_meta" -> """
      WITH c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n0 FROM customer)
      SELECT * FROM (
        SELECT FALSE AS live, n0 AS n_rows FROM c
        UNION ALL
        SELECT TRUE, n0 - 3 FROM c) ORDER BY live""",

    // the partition transforms are pure arithmetic: truncate = floor to a
    // multiple (positive keys), days = epoch days, months/years = offsets
    // from 1970 (all UTC-floored, matching the layout column resolution)
    "geo_transform_fns" -> """
      SELECT o_orderkey AS k,
             CAST(o_orderkey - (o_orderkey % 1000) AS BIGINT) AS trunc_k,
             CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS d_days,
             CAST((year(CAST(o_orderdate AS DATE)) - 1970) * 12
                  + month(CAST(o_orderdate AS DATE)) - 1 AS BIGINT) AS d_months,
             CAST(year(CAST(o_orderdate AS DATE)) - 1970 AS BIGINT) AS d_years
      FROM orders ORDER BY k""",

    // partition-scoped compaction is pure maintenance: rows pass through
    "geo_optimize_where" -> """
      SELECT c_custkey AS id, CAST(c_nationkey % 2 AS BIGINT) AS nat
      FROM customer ORDER BY id""",

    // set-algebra replay of the four MERGE clauses: evens end at 2x
    // balance (matched-update or not-matched-insert), target-only rows
    // (odd multiples of 3) delete when %5=0 and park at -1 otherwise
    "geo_merge_nmbs" -> """
      SELECT * FROM (
        SELECT c_custkey AS id, CAST(c_acctbal AS DOUBLE) * 2 AS bal
        FROM customer WHERE c_custkey % 2 = 0
        UNION ALL
        SELECT c_custkey, -1.0 FROM customer
        WHERE c_custkey % 3 = 0 AND c_custkey % 2 = 1 AND c_custkey % 5 <> 0)
      ORDER BY id""",

    // small-file consolidation is pure maintenance: rows pass through
    "geo_optimize_small" -> """
      SELECT * FROM (
        SELECT o_orderkey AS k, o_orderstatus AS v FROM orders
        UNION ALL
        SELECT * FROM (VALUES (-1, 'a'), (-2, 'b'), (-3, 'c'),
                              (-4, 'd'), (-5, 'e'), (-6, 'f')) t(k, v))
      ORDER BY k, v""",

    // snapshot is zero-copy registration: rows pass through unchanged
    "geo_snapshot_table" -> """
      SELECT c_custkey AS id, CAST(c_nationkey AS BIGINT) AS nat
      FROM customer WHERE c_custkey % 2 = 0 ORDER BY id""",

    // CALL procedures are pure maintenance: compaction + tagging + expiry
    // never change row values — the final table is the two inserts' union
    "geo_call_procedures" -> """
      SELECT o_orderkey AS k, o_totalprice AS price
      FROM orders WHERE o_orderkey % 3 IN (0, 1) ORDER BY k""",

    // set_current_snapshot rolls the pointer back to the first insert:
    // phase 1 sees both inserts, phase 2 exactly the first
    "geo_set_current_snapshot" -> """
      SELECT 1 AS phase, COUNT(*) AS n_rows,
             CAST(SUM(c_custkey) AS BIGINT) AS sum_id FROM customer
      UNION ALL
      SELECT 2, COUNT(*), CAST(SUM(c_custkey) AS BIGINT)
      FROM customer WHERE c_custkey % 2 = 0
      ORDER BY phase""",

    // the view is a pass-through aggregation over the geo table's rows,
    // which are the orders rows unchanged — replay the view SQL directly
    "geo_view" -> """
      SELECT o_orderstatus AS flag, COUNT(*) AS n,
             CAST(SUM(o_orderkey) AS BIGINT) AS sum_k
      FROM orders WHERE o_totalprice > 1000.0
      GROUP BY 1 ORDER BY flag""",

    // partitioned-table legs reduce to the same filters over the source:
    // storage clusters/prunes by transform but never changes row values
    "geo_runtime_prune" -> """
      SELECT CAST(c.c_nationkey AS BIGINT) AS nk, COUNT(*) AS n,
             CAST(MAX(c.c_acctbal) AS DOUBLE) AS max_bal
      FROM customer c JOIN nation d ON c.c_nationkey = d.n_nationkey
      WHERE d.n_name IN ('NATION_3', 'NATION_17')
      GROUP BY 1 ORDER BY 1""",

    "geo_analyze" -> """
      SELECT CAST(c.c_custkey AS BIGINT) AS c_custkey,
             CAST(c.c_nationkey AS BIGINT) AS c_nationkey
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE o.o_orderkey = 1 ORDER BY c.c_custkey""",

    "geo_bloom_prune" -> """
      SELECT CAST(c_custkey AS BIGINT) AS ck, c_name,
             CAST(c_acctbal AS DOUBLE) AS bal
      FROM customer WHERE c_custkey IN (17, 42, 133) ORDER BY 1""",

    "geo_spj" -> """
      SELECT CAST(c.c_nationkey AS BIGINT) AS c_nationkey,
             COUNT(*) AS n, CAST(SUM(CAST(o.o_orderkey AS BIGINT)) AS BIGINT) AS sum_ok,
             MAX(CAST(o.o_totalprice AS DOUBLE)) AS max_price
      FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY 1 ORDER BY 1""",

    // phase 1 = everything (current); phase 2 = the first two thirds (v2)
    "geo_expire_age" -> """
      SELECT 1 AS phase, COUNT(*) AS n_rows, CAST(SUM(c_custkey) AS BIGINT) AS sum_k
      FROM customer
      UNION ALL
      SELECT 2, COUNT(*), CAST(SUM(c_custkey) AS BIGINT)
      FROM customer WHERE c_custkey % 3 IN (0, 1)
      ORDER BY phase""",

    // the exact recorded statistics (ndv is sketch-gated in-query, not
    // hash-compared) are plain aggregates over the same rows
    "geo_colstats_meta" -> """
      WITH src AS (
        SELECT CAST(c_nationkey AS BIGINT) AS nat,
               CAST(c_custkey % 3 AS BIGINT) AS flag,
               CASE WHEN c_custkey % 7 = 0 THEN NULL
                    ELSE CAST(c_custkey % 5 AS BIGINT) END AS v
        FROM customer)
      SELECT 'flag' AS "column",
             COUNT(*) FILTER (WHERE flag IS NULL) AS null_count,
             MIN(flag) AS min, MAX(flag) AS max FROM src
      UNION ALL
      SELECT 'nat',
             COUNT(*) FILTER (WHERE nat IS NULL), MIN(nat), MAX(nat) FROM src
      UNION ALL
      SELECT 'v',
             COUNT(*) FILTER (WHERE v IS NULL), MIN(v), MAX(v) FROM src
      ORDER BY "column"""",

    // DELETE drops every 10th order; UPDATE retags every 100th customer
    "geo_spj_dml" -> """
      WITH c AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 100 = 0 THEN 99
                    ELSE CAST(c_nationkey AS BIGINT) END AS c_nationkey
        FROM customer),
      o AS (SELECT * FROM orders WHERE o_orderkey % 10 <> 0)
      SELECT c.c_nationkey,
             COUNT(*) AS n, CAST(SUM(CAST(o.o_orderkey AS BIGINT)) AS BIGINT) AS sum_ok,
             MAX(CAST(o.o_totalprice AS DOUBLE)) AS max_price
      FROM c JOIN o ON c.c_custkey = o.o_custkey
      GROUP BY 1 ORDER BY 1""",

    "geo_partitioned" -> """
      SELECT 1 AS phase, o_orderkey AS k, CAST(o_orderdate AS DATE) AS dd,
             o_totalprice AS price
      FROM orders
      WHERE CAST(o_orderdate AS DATE) >= DATE '1995-01-01'
        AND CAST(o_orderdate AS DATE) < DATE '1995-02-01'
      UNION ALL
      SELECT 2, o_orderkey, CAST(o_orderdate AS DATE), o_totalprice
      FROM orders WHERE o_orderkey = 7
      UNION ALL
      SELECT 3, o_orderkey, CAST(o_orderdate AS DATE), o_totalprice
      FROM orders WHERE o_orderkey >= 2000 AND o_orderkey < 3000
      ORDER BY phase, k""",

    // the range filter over the sort column, replayed on raw orders
    // (pure-integer derivation: no float conversion ambiguity)
    "geo_sort_order" -> """
      SELECT o_orderkey AS k, (o_orderkey * 7919) % 100000 AS s
      FROM orders
      WHERE (o_orderkey * 7919) % 100000 < 10000
      ORDER BY k""",

    // survivors of the retention cutoff, aggregated per date (bit-stable:
    // counts and key extrema, no float sums)
    "geo_metadata_delete" -> """
      SELECT CAST(o_orderdate AS DATE) AS dd, COUNT(*) AS n,
             MIN(o_orderkey) AS kmin, MAX(o_orderkey) AS kmax
      FROM orders
      WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
      GROUP BY 1 ORDER BY 1""",

    "geo_zorder" -> """
      SELECT 1 AS phase, o_orderkey AS k, CAST(o_orderdate AS DATE) AS dd,
             o_totalprice AS price
      FROM orders WHERE o_orderkey >= 1000 AND o_orderkey < 3000
      UNION ALL
      SELECT 2, o_orderkey, CAST(o_orderdate AS DATE), o_totalprice
      FROM orders
      WHERE CAST(o_orderdate AS DATE) >= DATE '1994-06-01'
        AND CAST(o_orderdate AS DATE) < DATE '1994-09-01'
      ORDER BY phase, k, dd""",

    "geo_spec_evolution" -> """
      SELECT 1 AS phase, o_orderkey AS k, CAST(o_orderdate AS DATE) AS dd,
             o_totalprice AS price
      FROM orders
      WHERE CAST(o_orderdate AS DATE) >= DATE '1995-03-01'
        AND CAST(o_orderdate AS DATE) < DATE '1995-04-01'
      UNION ALL
      SELECT 2, o_orderkey, CAST(o_orderdate AS DATE), o_totalprice
      FROM orders WHERE o_orderkey = 7
      ORDER BY phase, k""",

    "geo_sharded" -> """
      SELECT c_nationkey AS nat, COUNT(*) AS n, CAST(SUM(c_custkey) AS BIGINT) AS key_sum
      FROM customer WHERE c_custkey % 10 <> 0
      GROUP BY c_nationkey ORDER BY c_nationkey""",

    "st_tier3_measures" -> """
      SELECT p_partkey,
             CAST(p_size AS DOUBLE) AS short_len,
             SQRT((p_size + 2.0) * (p_size + 2.0) + 1.0) AS maxd,
             p_size + 1 AS segn,
             CAST(p_size AS DOUBLE) AS zz,
             CAST(5.0 * p_size AS DOUBLE) AS d3,
             CASE WHEN p_size < 25 THEN '0FFFFF212'
                  WHEN p_size = 25 THEN 'F0FFFF212'
                  ELSE 'FF0FFF212' END AS de9im
      FROM part ORDER BY p_partkey""",

    // BPE-ish pieces = alnum runs + individual non-alnum chars; RE2's \p{L}
    // \p{N} classes agree with Java's on this corpus
    "text_bpeish_tokens" -> """
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '[\p{L}\p{N}]+'))
                  + (length(text) - length(regexp_replace(text, '[^\p{L}\p{N}]', '', 'g'))) AS INT)
               AS n_pieces
      FROM documents ORDER BY doc_id""",

    "interval_join_batch" -> """
      WITH v AS (SELECT event_id AS view_id, user_id, epoch_us(ts) AS us
                 FROM events WHERE event_type = 'view'),
           b AS (SELECT event_id AS buy_id, user_id, epoch_us(ts) AS us
                 FROM events WHERE event_type = 'purchase')
      SELECT v.user_id, COUNT(*) AS n_pairs,
             CAST(SUM(b.buy_id - v.view_id) AS BIGINT) AS id_delta_sum
      FROM v JOIN b ON v.user_id = b.user_id
        AND b.us >= v.us AND b.us <= v.us + 3600000000
      GROUP BY v.user_id ORDER BY v.user_id""",

    // native session_window semantics in microseconds: merge while the
    // next event is STRICTLY inside [prev, prev+gap) — an event exactly
    // gap later starts a new session (note >=, unlike the fmgws oracle)
    "sessionize_native_stream" -> """
      WITH e AS (
        SELECT user_id, event_id, epoch_us(ts) AS us FROM events
      ), flagged AS (
        SELECT user_id,
               CASE WHEN LAG(us) OVER w IS NULL
                    OR us - LAG(us) OVER w >= 1800000000
                    THEN 1 ELSE 0 END AS new_sess
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id))
      SELECT user_id, CAST(SUM(new_sess) AS BIGINT) AS n_sessions,
             COUNT(*) AS n_events
      FROM flagged GROUP BY user_id ORDER BY user_id""",

    // batch replica of the streamed LEFT OUTER interval join: every view
    // appears (matched n times or null-extended once)
    "stream_interval_join_outer" -> """
      WITH v AS (SELECT event_id AS view_id, user_id, epoch_us(ts) AS us
                 FROM events WHERE event_type = 'view'),
           b AS (SELECT event_id AS buy_id, user_id, epoch_us(ts) AS us
                 FROM events WHERE event_type = 'purchase')
      SELECT v.user_id, COUNT(*) AS n_rows, COUNT(b.buy_id) AS n_matched,
             COUNT(*) - COUNT(b.buy_id) AS n_unmatched,
             CAST(COALESCE(SUM(b.buy_id - v.view_id), 0) AS BIGINT) AS id_delta_sum
      FROM v LEFT JOIN b ON v.user_id = b.user_id
        AND b.us >= v.us AND b.us <= v.us + 3600000000
      GROUP BY v.user_id ORDER BY v.user_id""",

    // fingerprint invariant: a collision-free dedup key over normalized text
    "text_fingerprint" -> """
      SELECT COUNT(DISTINCT hash(norm)) AS n_fp, COUNT(DISTINCT norm) AS n_text
      FROM (SELECT regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
            FROM documents)""",

    // multimodal plumbing invariant: every row yields dim-16 unit features
    "multimodal_features" -> """
      SELECT doc_id AS media_id, 16 AS dim, TRUE AS unit_norm
      FROM documents ORDER BY media_id""",

    // closed-form replay of the decoded-pixel channel sums: the gradient
    // rgb((id+3x+5y), (2id+7x+11y), (3id+9x+11y)) never wraps mod 256 at
    // these sizes, so sum over the w x h raster is pure arithmetic.
    // PNG is lossless -> a correct decoder reproduces the exact integers.
    "multimodal_image_decode" -> """
      WITH n AS (
        SELECT CAST(n_nationkey AS BIGINT) AS id,
               CAST(8 + n_nationkey % 5 AS BIGINT) AS w,
               CAST(6 + n_nationkey % 3 AS BIGINT) AS h
        FROM nation)
      SELECT id AS media_id,
             CAST(w AS INT) AS width,
             CAST(h AS INT) AS height,
             3 AS channels,
             CAST(w*h*id   + 3*h*(w*(w-1)//2) +  5*w*(h*(h-1)//2) AS BIGINT) AS sum_r,
             CAST(w*h*2*id + 7*h*(w*(w-1)//2) + 11*w*(h*(h-1)//2) AS BIGINT) AS sum_g,
             CAST(w*h*3*id + 9*h*(w*(w-1)//2) + 11*w*(h*(h-1)//2) AS BIGINT) AS sum_b
      FROM n ORDER BY media_id""",

    // closed-form replay of the decoded-sample channel sums: sample i of
    // channel c is (id + 3i + 7c), so over fr frames the channel sum is
    // pure arithmetic. WAV/PCM16 is lossless -> a correct decoder (header
    // rate/channel facts included) reproduces the exact integers.
    "multimodal_audio_decode" -> """
      WITH n AS (
        SELECT CAST(n_nationkey AS BIGINT) AS id,
               CAST(200 + n_nationkey * 17 AS BIGINT) AS fr,
               CAST(1 + n_nationkey % 2 AS INT) AS ch,
               CAST(8000 + 500 * (n_nationkey % 3) AS INT) AS rate
        FROM nation)
      SELECT id AS media_id, rate AS sample_rate, ch AS channels, fr AS frames,
             CAST(fr*id + 3*(fr*(fr-1)//2) AS BIGINT) AS sum_c0,
             CAST(CASE WHEN ch = 2 THEN fr*id + 3*(fr*(fr-1)//2) + 7*fr
                       ELSE 0 END AS BIGINT) AS sum_c1
      FROM n ORDER BY media_id""",

    // closed-form replay of the END-TO-END audio->embedding->ANN ranking,
    // SCORES INCLUDED: bin b of id embeds as exactly
    // 256*(4+(31*id+17*b) mod 64)/2^15 (dyadic — no rounding anywhere on
    // the Spark path), and the cosine's dot/norm sums are exact dyadic
    // sums too, so sum-order doesn't matter and the only rounded ops
    // (sqrt, the nx*ny multiply, the final divide) are IEEE-identical in
    // both engines -> the DOUBLE scores hash-match bit-for-bit.
    "multimodal_ann_top10" -> """
      WITH b AS (SELECT unnest(range(8)) AS b),
      e AS (SELECT CAST(n.n_nationkey AS BIGINT) AS id, b.b AS b,
                   CAST(256*(4 + (n.n_nationkey*31 + b.b*17) % 64) AS DOUBLE)/32768 AS v
            FROM nation n, b),
      q AS (SELECT b, CAST(256*(4 + (b*17) % 64) AS DOUBLE)/32768 AS v FROM b),
      s AS (SELECT e.id AS vec_id,
                   sum(e.v*q.v)/(sqrt(sum(e.v*e.v))*sqrt(sum(q.v*q.v))) AS score
            FROM e JOIN q USING (b) GROUP BY e.id)
      SELECT vec_id, score FROM s ORDER BY score DESC, vec_id LIMIT 10""",

    // independent full-pairwise replica of the banded-LSH + exact-Jaccard
    // near-dup pairs: char-5-gram shingle Jaccard over ALL pairs. Matching
    // hashes ALSO proves the LSH bands have 100% recall at this threshold
    // on this corpus (a miss would drop a row the oracle keeps).
    "dedup_minhash_pairs" -> """
      WITH sh AS (
        SELECT doc_id, list_distinct(list_transform(range(1, greatest(length(text)-4, 1)+1),
              i -> substring(text, CAST(i AS INT), 5))) AS s
        FROM documents)
      SELECT a.doc_id AS id1, b.doc_id AS id2,
             CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jaccard
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
            / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.4
      ORDER BY id1, id2""",

    // connected components over those pairs via recursive min-label
    // propagation — validates the distributed clusterPairs loop against a
    // from-scratch relational CC
    "dedup_near_clusters" -> """
      WITH RECURSIVE sh AS (
        SELECT doc_id, list_distinct(list_transform(range(1, greatest(length(text)-4, 1)+1),
              i -> substring(text, CAST(i AS INT), 5))) AS s
        FROM documents),
      pairs AS (
        SELECT a.doc_id AS id1, b.doc_id AS id2
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
              / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.4),
      edges AS (SELECT id1 AS u, id2 AS v FROM pairs UNION ALL SELECT id2, id1 FROM pairs),
      reach AS (SELECT u AS id, v AS r FROM edges
                UNION SELECT e.u, r.r FROM edges e JOIN reach r ON e.v = r.id)
      SELECT id, CAST(least(MIN(r), id) AS BIGINT) AS cluster
      FROM reach GROUP BY id ORDER BY id""",

    // the full four-stage pipeline replicated relationally: quality/lang
    // filters, exact dedup (min-id per text), all-pairs Jaccard near-dup
    // edges, recursive-CTE connected components, per-language rollup
    "pipeline_clean_corpus" -> """
      WITH RECURSIVE scored AS (
        SELECT doc_id, text, lang,
               CAST(len(string_split_regex(trim(text), ' +')) AS INT) AS n_tokens,
               least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) * 0.4
               + least(CAST(len(list_filter(string_split_regex(trim(text), ' +'),
                   x -> x IN ('the','a','an','of','and','to','in','is','for','on','with','that','as','at','by','it','from','or','be','are'))) AS DOUBLE)
                   / len(string_split_regex(trim(text), ' +')) * 5.0, 1.0) * 0.4
               + (1.0 - CAST(length(replace(text,' ','')) - length(regexp_replace(replace(text,' ',''), '[[:punct:]]', '', 'g')) AS DOUBLE)
                        / greatest(length(replace(text,' ','')), 1)) * 0.2 AS quality
        FROM documents),
      filtered AS (
        SELECT * FROM scored WHERE quality >= 0.3 AND n_tokens >= 10
          AND lang IN ('en','fr','es','de')),
      exact AS (
        SELECT doc_id, text, lang, n_tokens FROM (
          SELECT *, MIN(doc_id) OVER (PARTITION BY text) AS grp_min FROM filtered)
        WHERE doc_id = grp_min),
      sh AS (
        SELECT doc_id, list_distinct(list_transform(range(1, greatest(length(text)-4, 1)+1),
              i -> substring(text, CAST(i AS INT), 5))) AS s
        FROM exact),
      pairs AS (
        SELECT a.doc_id AS id1, b.doc_id AS id2
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
              / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5),
      edges AS (SELECT id1 AS u, id2 AS v FROM pairs UNION ALL SELECT id2, id1 FROM pairs),
      reach AS (SELECT u AS id, v AS r FROM edges
                UNION SELECT e.u, r.r FROM edges e JOIN reach r ON e.v = r.id),
      clus AS (SELECT id, least(MIN(r), id) AS rep FROM reach GROUP BY id),
      drops AS (SELECT id FROM clus WHERE rep < id),
      final AS (SELECT * FROM exact WHERE doc_id NOT IN (SELECT id FROM drops))
      SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
      FROM final GROUP BY lang ORDER BY lang""",
  )

  /** Shared engine for the stream_interval_join [C] query and its bench
    * split (one implementation — the split cannot drift from what the
    * oracle hashes): writes a 4-file parquet copy of `events`, runs the
    * two file streams through the SAME intervalJoin operator with
    * maxFilesPerTrigger=2 (state must carry matches across micro-batches)
    * into a memory sink, and returns (sink, setupSec, streamSec). */
  private def runStreamIntervalJoin(s: SparkSession): (DataFrame, Double, Double) = {
    val t0 = System.nanoTime()
    val srcDir = java.nio.file.Files.createTempDirectory("ssj_src").toString + "/files"
    s.table("events").withColumn("b", col("event_id") % 4)
      .repartition(4, col("b")).drop("b").write.parquet(srcDir)
    val schema = s.read.parquet(srcDir).schema
    s.catalog.dropTempView("ssj_sink") // repeat-safe: bench runs twice
    def src() = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "2").parquet(srcDir)
    val views = src().where(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"), col("ts").as("vts"))
    val buys = src().where(col("event_type") === "purchase")
      .select(col("event_id").as("buy_id"), col("user_id"), col("ts").as("bts"))
    val t1 = System.nanoTime()
    withShufflePartitions(s, 4) {
      val q = graft.streaming.EventStreams.intervalJoin(views, buys,
          "user_id", "vts", "bts", intervalSeconds = 3600)
        .writeStream.format("memory").outputMode("append")
        .queryName("ssj_sink").start()
      q.processAllAvailable(); q.stop()
    }
    val t2 = System.nanoTime()
    (s.table("ssj_sink"), (t1 - t0) / 1e9, (t2 - t1) / 1e9)
  }

  /** Write the 4-file events wave plus a LATER-mtime flush file (one
    * far-future sentinel row per join side, user_id = -999). The file
    * source processes files oldest-mtime-first, so the sentinel arrives
    * last and advances watermarks past every data row's window. Returns
    * (srcDir, spanSec): spanSec is the data's full ts span — the right
    * watermark delay so no data row is ever late before the flush. */
  private def writeEventsWaveWithFlush(s: SparkSession): (String, Long) = {
    import s.implicits._
    val srcDir = java.nio.file.Files.createTempDirectory("ssoj_src").toString + "/files"
    s.table("events").withColumn("b", col("event_id") % 4)
      .repartition(4, col("b")).drop("b").write.parquet(srcDir)
    val mm = s.table("events")
      .agg(min(col("ts")).cast("long"), max(col("ts")).cast("long")).head
    val spanSec = math.max(mm.getLong(1) - mm.getLong(0), 7200L) + 3700L
    val flushTs = mm.getLong(1) + 2 * spanSec
    Thread.sleep(15) // the flush wave must carry a strictly later mtime
    Seq(("view", -101L), ("purchase", -102L)).toDF("event_type", "event_id")
      .select(col("event_id"), timestamp_seconds(lit(flushTs)).as("ts"),
        lit(-999L).as("user_id"), col("event_type"),
        lit(0.0).as("value"), lit("").as("props"))
      .coalesce(1).write.mode("append").parquet(srcDir)
    (srcDir, spanSec)
  }

  /** Stream-stream LEFT OUTER interval join engine over the flush-file
    * wave: the sentinel advances BOTH watermarks past every view's join
    * window, so the state store must EMIT the unmatched views as
    * null-extended rows — the outer-eviction path an inner join never
    * exercises. Returns (sink, setupSec, streamSec). */
  private def runStreamOuterIntervalJoin(s: SparkSession): (DataFrame, Double, Double) = {
    val t0 = System.nanoTime()
    val (srcDir, spanSec) = writeEventsWaveWithFlush(s)
    val schema = s.read.parquet(srcDir).schema
    s.catalog.dropTempView("ssoj_sink") // repeat-safe: bench runs twice
    def src() = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "2").parquet(srcDir)
    val views = src().where(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"), col("ts").as("vts"))
    val buys = src().where(col("event_type") === "purchase")
      .select(col("event_id").as("buy_id"), col("user_id"), col("ts").as("bts"))
    val t1 = System.nanoTime()
    withShufflePartitions(s, 4) {
      val q = graft.streaming.EventStreams.intervalJoin(views, buys,
          "user_id", "vts", "bts", watermark = s"$spanSec seconds",
          intervalSeconds = 3600, joinType = "left_outer")
        .writeStream.format("memory").outputMode("append")
        .queryName("ssoj_sink").start()
      q.processAllAvailable(); q.stop()
    }
    val t2 = System.nanoTime()
    (s.table("ssoj_sink").where(col("user_id") =!= -999L),
      (t1 - t0) / 1e9, (t2 - t1) / 1e9)
  }

  /** The grid (partitioned-KNN) variants replay EXACTLY the SQL of their
    * broadcast twins: the partitioned path changes the plan shape, not a
    * single output double — that identity is the point of the query. */
  def oracleSql: Map[String, String] = oracleBase +
    ("spatial_knn_grid_join" -> oracleBase("spatial_knn_join")) +
    ("spatial_lof_grid" -> oracleBase("spatial_lof")) +
    // the STREAMED interval join must land on the exact rows the batch
    // leg produces — same oracle, different execution machinery
    ("stream_interval_join" -> oracleBase("interval_join_batch")) +
    // the persisted-index probe must reproduce the ad-hoc BM25 ranking
    // exactly — same oracle, different storage machinery
    ("text_bm25_indexed_topk" -> oracleBase("text_bm25_topk")) +
    // ...and so must a probe after incremental ingest (build half,
    // append half): the index machinery cannot change the ranking
    ("text_bm25_append_topk" -> oracleBase("text_bm25_topk")) +
    // STREAMED index ingest (exactly-once foreachBatch sinks) must land
    // on the identical union corpus — same oracles as the batch paths;
    // a dropped/doubled/stats-skewed epoch changes the hash
    ("text_bm25_stream_ingest" -> oracleBase("text_bm25_topk")) +
    ("ann_ivf_stream_ingest" -> oracleBase("ann_brute_top10"))

  /**
   * Bench-only build/probe split for the index-backed ANN queries. The
   * headline [C] queries time index TRAINING + two probes inside one wall
   * — honest, but it masks the metric a user of a persisted index cares
   * about: probe latency against an ALREADY-BUILT index. These run the
   * same code with the stopwatch at the build/probe boundaries (cold =
   * first touch of the stored index, probe = steady state); correctness
   * stays pinned by the [C] queries, which hash the probe output.
   */
  def benchSplits: Map[String, (SparkSession, String) => Seq[(String, Double)]] = Map(
    // the headline wall conflates in-query setup (a 4-file source write +
    // temp dir) with the two file streams' state machinery — this split
    // separates them so a state-store regression can't hide in setup noise
    "stream_interval_join" -> ((s, d) => {
      prep(s, d)
      val (sink, setup, stream) = runStreamIntervalJoin(s)
      val t0 = System.nanoTime()
      sink.groupBy("user_id").agg(count(lit(1)).as("n_pairs"),
          sum(col("buy_id") - col("view_id")).as("id_delta_sum"))
        .orderBy("user_id").collect()
      val t1 = System.nanoTime()
      Seq("setup" -> setup, "stream" -> stream, "agg" -> (t1 - t0) / 1e9)
    }),
    // same shape for the outer flavor: setup (source + flush-file write)
    // vs the state machinery incl. the watermark-driven final eviction
    "stream_interval_join_outer" -> ((s, d) => {
      prep(s, d)
      val (sink, setup, stream) = runStreamOuterIntervalJoin(s)
      val t0 = System.nanoTime()
      sink.groupBy("user_id").agg(count(lit(1)).as("n_rows"),
          count(col("buy_id")).as("n_matched")).orderBy("user_id").collect()
      val t1 = System.nanoTime()
      Seq("setup" -> setup, "stream" -> stream, "agg" -> (t1 - t0) / 1e9)
    }),
    // build/append/probe split for incremental BM25 ingest: the headline
    // wall is dominated by TWO index constructions; the number a user of
    // incremental ingest cares about is the append wall (new docs only)
    "text_bm25_append_topk" -> ((s, d) => {
      prep(s, d)
      val idx = java.nio.file.Files.createTempDirectory("graft_bm25a_split").toString + "/i"
      val docs = s.table("documents")
      val t0 = System.nanoTime()
      graft.ops.TextAnalysis.buildTextIndex(s, idx,
        docs.where(col("doc_id") % 2 === 0), col("doc_id"), col("text"))
      val t1 = System.nanoTime()
      graft.ops.TextAnalysis.appendToTextIndex(s, idx,
        docs.where(col("doc_id") % 2 === 1), col("doc_id"), col("text"))
      val t2 = System.nanoTime()
      graft.ops.TextAnalysis.bm25Search(s, idx,
        Seq("spark", "customer", "merge"), k = 10).count()
      val t3 = System.nanoTime()
      Seq("build" -> (t1 - t0) / 1e9, "append" -> (t2 - t1) / 1e9,
        "probe" -> (t3 - t2) / 1e9)
    }),
    // build/probe split for the persisted BM25 index, same rationale as
    // the ANN splits: the headline wall conflates tokenize-and-store with
    // the probe latency a user of a stored index actually cares about
    "text_bm25_indexed_topk" -> ((s, d) => {
      prep(s, d)
      val idx = java.nio.file.Files.createTempDirectory("graft_bm25_split").toString + "/i"
      val t0 = System.nanoTime()
      graft.ops.TextAnalysis.buildTextIndex(s, idx,
        s.table("documents"), col("doc_id"), col("text"))
      val t1 = System.nanoTime()
      graft.ops.TextAnalysis.bm25Search(s, idx,
        Seq("spark", "customer", "merge"), k = 10).count()
      val t2 = System.nanoTime()
      graft.ops.TextAnalysis.bm25Search(s, idx,
        Seq("spark", "customer", "merge"), k = 10).count()
      val t3 = System.nanoTime()
      Seq("build" -> (t1 - t0) / 1e9, "probe_cold" -> (t2 - t1) / 1e9,
        "probe" -> (t3 - t2) / 1e9)
    }),
    // the headline conflates TWO index builds with the fusion itself —
    // this split isolates the fused-probe latency a retrieval user pays
    "hybrid_rrf_indexed_top10" -> ((s, d) => {
      prep(s, d)
      val q = s.table("embeddings").where(col("vec_id") === 0)
        .select("embedding").head.getSeq[Float](0).toArray
      val tIdx = java.nio.file.Files.createTempDirectory("graft_hyb_ts").toString + "/i"
      val vIdx = java.nio.file.Files.createTempDirectory("graft_hyb_vs").toString + "/i"
      val t0 = System.nanoTime()
      graft.ops.TextAnalysis.buildTextIndex(s, tIdx,
        s.table("documents"), col("doc_id"), col("text"))
      val t1 = System.nanoTime()
      graft.ops.Similarity.buildIvfIndex(s, vIdx,
        s.table("embeddings"), col("embedding"), col("vec_id"), k = 8, iters = 2)
      val t2 = System.nanoTime()
      graft.ops.Retrieval.hybridSearch(s, tIdx, vIdx,
        Seq("spark", "customer", "merge"), q, k = 10, nprobe = 8).count()
      val t3 = System.nanoTime()
      graft.ops.Retrieval.hybridSearch(s, tIdx, vIdx,
        Seq("spark", "customer", "merge"), q, k = 10, nprobe = 8).count()
      val t4 = System.nanoTime()
      Seq("build_text" -> (t1 - t0) / 1e9, "build_ivf" -> (t2 - t1) / 1e9,
        "probe_cold" -> (t3 - t2) / 1e9, "probe" -> (t4 - t3) / 1e9)
    }),
    // streamed BM25 ingest: separate the in-query source setup + build
    // from the micro-batch machinery and the probe, so a state/commit
    // regression can't hide in setup noise (same rationale as the
    // stream_interval_join splits)
    "text_bm25_stream_ingest" -> ((s, d) => {
      prep(s, d)
      val base = java.nio.file.Files.createTempDirectory("graft_bm25s_sp").toString
      val idx = base + "/i"
      val srcDir = base + "/files"
      val docs = s.table("documents")
      val t0 = System.nanoTime()
      graft.ops.TextAnalysis.buildTextIndex(s, idx,
        docs.where(col("doc_id") % 2 === 0), col("doc_id"), col("text"))
      // two sequential one-file writes: >= 2 source files (hence >= 2
      // micro-batches under maxFilesPerTrigger=1) in ANY session config —
      // a hash repartition can land both keys in one partition
      val odd = docs.where(col("doc_id") % 2 === 1).select("doc_id", "text")
      odd.where((col("doc_id") / 2).cast("long") % 2 === 0)
        .coalesce(1).write.parquet(srcDir)
      odd.where((col("doc_id") / 2).cast("long") % 2 === 1)
        .coalesce(1).write.mode("append").parquet(srcDir)
      val t1 = System.nanoTime()
      val schema = s.read.parquet(srcDir).schema
      val stream = s.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(srcDir)
      val q = graft.ops.TextAnalysis.textIndexSink(stream, idx,
        col("doc_id"), col("text"), base + "/ck").start()
      q.processAllAvailable(); q.stop()
      val t2 = System.nanoTime()
      graft.ops.TextAnalysis.bm25Search(s, idx,
        Seq("spark", "customer", "merge"), k = 10).count()
      val t3 = System.nanoTime()
      Seq("setup" -> (t1 - t0) / 1e9, "stream" -> (t2 - t1) / 1e9,
        "probe" -> (t3 - t2) / 1e9)
    }),
    "ann_ivfpq_top10" -> ((s, d) => {
      prep(s, d)
      val q = s.table("embeddings").where(col("vec_id") === 0)
        .select("embedding").head.getSeq[Float](0).toArray
      val idx = java.nio.file.Files.createTempDirectory("graft_ivfpq_split").toString + "/i"
      val t0 = System.nanoTime()
      graft.ops.Similarity.buildIvfPqIndex(s, idx,
        s.table("embeddings"), col("embedding"), col("vec_id"),
        k = 8, iters = 2, m = 16, pqK = 16)
      val t1 = System.nanoTime()
      graft.ops.Similarity.ivfPqSearch(s, idx, q, k = 10, nprobe = 5,
        candidates = 192).count()
      val t2 = System.nanoTime()
      graft.ops.Similarity.ivfPqSearch(s, idx, q, k = 10, nprobe = 5,
        candidates = 192).count()
      val t3 = System.nanoTime()
      Seq("build" -> (t1 - t0) / 1e9, "probe_cold" -> (t2 - t1) / 1e9,
        "probe" -> (t3 - t2) / 1e9)
    }),
    "ann_ivf_persisted_top10" -> ((s, d) => {
      prep(s, d)
      val q = s.table("embeddings").where(col("vec_id") === 0)
        .select("embedding").head.getSeq[Float](0).toArray
      val idx = java.nio.file.Files.createTempDirectory("graft_ivf_split").toString + "/i"
      val t0 = System.nanoTime()
      graft.ops.Similarity.buildIvfIndex(s, idx,
        s.table("embeddings"), col("embedding"), col("vec_id"), k = 8, iters = 2)
      val t1 = System.nanoTime()
      graft.ops.Similarity.ivfSearch(s, idx, q, k = 10, nprobe = 5).count()
      val t2 = System.nanoTime()
      graft.ops.Similarity.ivfSearch(s, idx, q, k = 10, nprobe = 5).count()
      val t3 = System.nanoTime()
      Seq("build" -> (t1 - t0) / 1e9, "probe_cold" -> (t2 - t1) / 1e9,
        "probe" -> (t3 - t2) / 1e9)
    }))
}
