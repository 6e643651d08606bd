package graft

import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.sql.Timestamp

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp = new Timestamp(1700000000000L + min * 60000L)

  test("windowed aggregation with watermark over a memory stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val agg = EventStreams.windowedAgg(input.toDF(), "10 minutes", "1 hour", "30 minutes")
    input.addData(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(10), 1, "click", 2.0),
      Event(3, ts(40), 2, "buy", 5.0))
    val q = agg.writeStream.format("memory").queryName("win_agg")
      .outputMode("update").start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("win_agg").collect()
    assert(rows.nonEmpty)
    // the (0:00-1:00] window sees all three events; sliding windows overlap
    val clicks = spark.table("win_agg").where($"event_type" === "click")
      .selectExpr("max(n)").head.getLong(0)
    assert(clicks == 2)
  }

  test("streaming sessionization closes sessions on gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = EventStreams.sessionize(input.toDS().withWatermark("ts", "0 seconds").as[Event], gapMinutes = 30)
    // user 1: two sessions separated by 2h; user 2: one session
    input.addData(
      Event(1, ts(0), 1, "a", 1.0), Event(2, ts(10), 1, "a", 1.0),
      Event(3, ts(130), 1, "a", 1.0),
      Event(4, ts(5), 2, "b", 2.0))
    val q = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    q.processAllAvailable()
    // advance watermark far enough to time out all sessions
    input.addData(Event(99, ts(10000), 9, "z", 0.0))
    q.processAllAvailable(); q.stop()
    val out = spark.table("sessions").as[EventStreams.Session].collect()
    val u1 = out.filter(_.user_id == 1).sortBy(_.session_start.getTime)
    assert(u1.length == 2, s"expected 2 closed sessions for user 1, got ${out.mkString(", ")}")
    assert(u1.head.n_events == 2 && u1.last.n_events == 1)
  }

  test("sessionize also runs in batch mode with identical grouping") {
    val batch = Seq(
      Event(1, ts(0), 1, "a", 1.0), Event(2, ts(10), 1, "a", 1.0),
      Event(3, ts(130), 1, "a", 1.0)).toDS()
    val sessions = EventStreams.sessionize(batch, gapMinutes = 30).collect()
    assert(sessions.length == 2)
  }

  test("file-source stream over the real events table: windowed agg matches batch") {
    // stream the actual events parquet (copied so the source dir is ours)
    val srcDir = java.nio.file.Files.createTempDirectory("evstream")
    val batchDf = EventStreams.eventsDataset(spark, "/root/testdata/sf0.001").toDF()
    batchDf.write.mode("overwrite").parquet(srcDir.toString)

    val stream = spark.readStream
      .schema(spark.read.parquet(srcDir.toString).schema)
      .parquet(srcDir.toString)
    val agg = EventStreams.windowedAgg(stream, "10 minutes", "1 hour", "1 hour")
    val q = agg.writeStream.format("memory").queryName("ev_file_agg")
      .outputMode("update").start()
    q.processAllAvailable(); q.stop()

    val streamed = spark.table("ev_file_agg")
      .selectExpr("window.start AS ws", "event_type", "n")
      .as[(java.sql.Timestamp, String, Long)].collect()
      .groupBy(r => (r._1, r._2)).map { case (k, v) => k -> v.map(_._3).max } // last update wins
    val batch = EventStreams.windowedAgg(batchDf, "10 minutes", "1 hour", "1 hour")
      .selectExpr("window.start AS ws", "event_type", "n")
      .as[(java.sql.Timestamp, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(streamed == batch, s"stream/batch mismatch: ${streamed.size} vs ${batch.size} groups")
  }

  test("stream-static spatial join: streaming points vs static fences via tile join") {
    implicit val sqlCtx = spark.sqlContext
    import graft.functions.GraftFunctions._
    import org.apache.spark.sql.functions.{col, lit}
    val fences = spark.range(3).select(col("id").as("fence_id"),
      st_polygonFromEnvelope(col("id").cast("double") * 10.0, lit(0.0),
        col("id").cast("double") * 10.0 + 10.0, lit(10.0)).as("fence"))
    val input = MemoryStream[(Long, Double, Double)]
    val pts = input.toDF().toDF("pt_id", "x", "y")
      .withColumn("pt", st_point(col("x"), col("y")))
    val joined = graft.plans.SpatialJoin.tileJoin(
      pts, col("pt"), fences, col("fence"), "within", cellSize = 10.0)
    input.addData((1L, 5.0, 5.0), (2L, 15.0, 5.0), (3L, 25.0, 5.0), (4L, 99.0, 5.0))
    val q = joined.select("pt_id", "fence_id").writeStream.format("memory")
      .queryName("stream_spatial").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("stream_spatial").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 0L), (2L, 1L), (3L, 2L)))
  }

  test("streaming exact dedup drops duplicate doc ids within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val deduped = input.toDF().toDF("doc_id", "text", "ts")
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("doc_id")
    input.addData((1L, "a", ts(0)), (2L, "b", ts(1)), (1L, "a-dup", ts(2)), (3L, "c", ts(3)))
    val q = deduped.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val ids = spark.table("dedup_stream").select("doc_id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L))
  }

  test("streaming content dedup: fingerprint dropDuplicatesWithinWatermark, batch parity") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val stream = EventStreams.streamingDedup(
      input.toDF().toDF("doc_id", "text", "ts"), "ts", "text", "1 hour")
    // docs 1 and 3 have identical content modulo case/whitespace -> same
    // fingerprint; doc 3 must be dropped even though its id differs
    input.addData(
      (1L, "Hello  World", ts(0)), (2L, "other doc", ts(1)),
      (3L, "hello world", ts(2)), (4L, "third", ts(3)))
    val q = stream.writeStream.format("memory").queryName("fp_dedup")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    assert(spark.table("fp_dedup").select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 4L))
    // batch path: same op, same semantics
    val batch = EventStreams.streamingDedup(
      Seq((1L, "Hello  World", ts(0)), (3L, "hello world", ts(2)), (5L, "x", ts(4)))
        .toDF("doc_id", "text", "ts"), "ts", "text")
    assert(batch.select("doc_id").as[Long].collect().toSet == Set(1L, 5L))
  }

  test("stream-static zone enrichment: broadcast contains join, no stream-side state") {
    implicit val sqlCtx = spark.sqlContext
    import graft.functions.GraftFunctions._
    import org.apache.spark.sql.functions.{col, lit}
    val zones = spark.range(3).select(col("id").as("zone_id"),
      st_polygonFromEnvelope(col("id").cast("double") * 10.0, lit(0.0),
        col("id").cast("double") * 10.0 + 10.0, lit(10.0)).as("zone"))
    val input = MemoryStream[(Long, Double, Double)]
    val enriched = EventStreams.zoneEnrich(
      input.toDF().toDF("ev_id", "x", "y"), "x", "y", zones, col("zone"))
    input.addData((1L, 5.0, 5.0), (2L, 15.0, 5.0), (3L, 99.0, 5.0))
    val q = enriched.select("ev_id", "zone_id").writeStream.format("memory")
      .queryName("zone_enriched").outputMode("append").start()
    q.processAllAvailable()
    // stream-static join keeps NO state (stateless map-side join)
    assert(q.lastProgress == null || q.lastProgress.stateOperators.isEmpty)
    q.stop()
    assert(spark.table("zone_enriched").as[(Long, Long)].collect().toSet ==
      Set((1L, 0L), (2L, 1L)))
  }

  test("stream-stream interval join: bounded state, batch parity") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val buys = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val joined = EventStreams.intervalJoin(
      views.toDF().toDF("view_id", "user_id", "vts"),
      buys.toDF().toDF("buy_id", "buy_user", "bts").withColumnRenamed("buy_user", "user_id"),
      "user_id", "vts", "bts", watermark = "4 hours", intervalSeconds = 3600)
    // ts() is minute-granular: user 1 buys 30min after the view (inside the
    // 1h interval); user 2 buys 2h after (outside); user 3 buys BEFORE
    views.addData((10L, 1L, ts(0)), (11L, 2L, ts(0)), (12L, 3L, ts(60)))
    buys.addData((20L, 1L, ts(30)), (21L, 2L, ts(120)), (22L, 3L, ts(0)))
    val q = joined.select("view_id", "buy_id").writeStream.format("memory")
      .queryName("interval_joined").outputMode("append").start()
    q.processAllAvailable()
    // stream-stream join MUST be stateful (buffered rows on both sides)
    assert(q.lastProgress != null && q.lastProgress.stateOperators.nonEmpty,
      "interval join must run with join state")
    q.stop()
    assert(spark.table("interval_joined").as[(Long, Long)].collect().toSet == Set((10L, 20L)))

    // batch path: identical semantics on plain DataFrames
    val bv = Seq((10L, 1L, ts(0)), (11L, 2L, ts(0)), (12L, 3L, ts(60)))
      .toDF("view_id", "user_id", "vts")
    val bb = Seq((20L, 1L, ts(30)), (21L, 2L, ts(120)), (22L, 3L, ts(0)))
      .toDF("buy_id", "user_id", "bts")
    val batch = EventStreams.intervalJoin(bv, bb, "user_id", "vts", "bts",
      intervalSeconds = 3600)
    assert(batch.select("view_id", "buy_id").as[(Long, Long)].collect().toSet == Set((10L, 20L)))
  }

  test("streaming ingest into a GeoTable: per-batch atomic commits, spatial read-back") {
    implicit val sqlCtx = spark.sqlContext
    import graft.functions.GraftFunctions._
    import graft.tables.{GeoManifest, GeoTable}
    import org.apache.spark.sql.functions.{col, lit}
    val root = java.nio.file.Files.createTempDirectory("geosink").toString + "/t"
    val ckpt = java.nio.file.Files.createTempDirectory("geosink_ckpt").toString
    GeoTable.createEmpty(spark, root,
      graft.tables.GeoSchema.fromDdl("id BIGINT, geo GEOMETRY"), Some("geo"))
    val input = MemoryStream[(Long, Double, Double)]
    val pts = input.toDF().toDF("id", "x", "y")
      .select(col("id"), st_point(col("x"), col("y")).as("geo"))
    val q = EventStreams.geoTableSink(pts, root, ckpt).start()
    input.addData((1L, 1.0, 1.0), (2L, 2.0, 2.0))
    q.processAllAvailable()
    val vAfterBatch1 = GeoManifest.read(spark, root).version
    assert(GeoTable.read(spark, root).count() == 2)
    input.addData((3L, 30.0, 30.0))
    q.processAllAvailable(); q.stop()
    // each micro-batch is one atomic versioned commit
    assert(GeoManifest.read(spark, root).version == vAfterBatch1 + 1)
    assert(GeoTable.read(spark, root).count() == 3)
    // ingested data participates in stats-based file pruning + spatial scan
    assert(GeoTable.scan(spark, root,
      st_dwithin(col("geo"), st_point(lit(29.0), lit(29.0)), lit(5.0)))
      .select("id").as[Long].collect().toSeq == Seq(3L))
  }

  test("geoTableSink replayed micro-batch is skipped, not duplicated (exactly-once)") {
    import graft.functions.GraftFunctions._
    import graft.tables.{GeoSchema, GeoTable}
    import org.apache.spark.sql.functions.{col, lit}
    val root = java.nio.file.Files.createTempDirectory("geosink_replay").toString + "/t"
    GeoTable.createEmpty(spark, root,
      GeoSchema.fromDdl("id BIGINT, geo GEOMETRY"), Some("geo"))
    val sinkId = EventStreams.sinkIdFor("/ckpt/a")
    def batchDf(ids: Long*) = ids.toDF("id")
      .select(col("id"), st_point(col("id").cast("double"), lit(0.0)).as("geo"))

    assert(EventStreams.commitMicroBatch(root, sinkId, 0L, batchDf(1L, 2L)))
    assert(GeoTable.lastStreamBatch(spark, root, sinkId).contains(0L))
    assert(GeoTable.read(spark, root).count() == 2)
    // crash between table commit and checkpoint write => engine replays batch 0
    assert(!EventStreams.commitMicroBatch(root, sinkId, 0L, batchDf(1L, 2L)))
    assert(GeoTable.read(spark, root).count() == 2) // no duplicates
    // next batch advances the watermark normally
    assert(EventStreams.commitMicroBatch(root, sinkId, 1L, batchDf(3L)))
    assert(GeoTable.lastStreamBatch(spark, root, sinkId).contains(1L))
    assert(GeoTable.read(spark, root).count() == 3)
    // a DIFFERENT sink (another checkpoint) has its own watermark
    val other = EventStreams.sinkIdFor("/ckpt/b")
    assert(GeoTable.lastStreamBatch(spark, root, other).isEmpty)
    assert(EventStreams.commitMicroBatch(root, other, 0L, batchDf(4L)))
    assert(GeoTable.read(spark, root).count() == 4)
  }

  test("geoTableUpsertSink: CDC micro-batches apply atomically with exactly-once replay") {
    implicit val sqlCtx = spark.sqlContext
    import graft.tables.{GeoManifest, GeoTable}
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("geosink_cdc").toString + "/t"
    val ckpt = java.nio.file.Files.createTempDirectory("geosink_cdc_ck").toString
    GeoTable.createEmpty(spark, root,
      graft.tables.GeoSchema.fromDdl("id BIGINT, v STRING"), None)
    // CDC stream: (id, v, op) with op = 'd' for deletes
    val input = MemoryStream[(Long, String, String)]
    val cdc = input.toDF().toDF("id", "v", "op")
    // the flag column rides the stream; build it before the sink
    val q2 = EventStreams.geoTableUpsertSink(
      cdc.withColumn("__del", col("op") === "d").drop("op"),
      root, Seq("id"), ckpt, deleteFlagCol = Some("__del")).start()
    input.addData((1L, "a", "u"), (2L, "b", "u"), (3L, "c", "u"))
    q2.processAllAvailable()
    assert(GeoTable.read(spark, root).count() == 3)
    val vAfter1 = GeoManifest.read(spark, root).version
    // batch 2: update id 2, delete id 3, insert id 4 — ONE commit
    input.addData((2L, "B", "u"), (3L, "", "d"), (4L, "d4", "u"))
    q2.processAllAvailable(); q2.stop()
    val m = GeoManifest.read(spark, root)
    assert(m.version == vAfter1 + 1, "a CDC batch is one atomic commit")
    val got = GeoTable.read(spark, root).select("id", "v").as[(Long, String)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "a"), (2L, "B"), (4L, "d4")), s"got $got")

    // replay discipline (crash between table commit and checkpoint):
    // re-applying the SAME batch id must be skipped, not re-applied
    val sinkId = EventStreams.sinkIdFor(spark, ckpt)
    val last = GeoTable.lastStreamBatch(spark, root, sinkId).get
    val replay = Seq((2L, "WRONG", true)).toDF("id", "v", "__del")
    assert(!EventStreams.upsertMicroBatch(root, Seq("id"), Some("__del"),
      sinkId, last, replay))
    assert(GeoTable.read(spark, root).where(col("id") === 2L)
      .select("v").as[String].head() == "B")
    // a fresh batch id applies (delete-only batch: files empty, keys filed)
    assert(EventStreams.upsertMicroBatch(root, Seq("id"), Some("__del"),
      sinkId, last + 1, replay.withColumn("v", col("v"))))
    assert(GeoTable.read(spark, root).select("id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 4L))

    // sequence column: a multi-change burst per key nets to the LAST
    // change (insert seq1 -> update seq2 -> delete seq3 == delete; a
    // key whose last change is an update lands that update alone)
    val burst = Seq(
      (10L, "i", false, 1L), (10L, "u", false, 2L), (10L, "", true, 3L),
      (4L, "D4a", false, 5L), (4L, "D4b", false, 7L)
    ).toDF("id", "v", "__del", "seq")
    EventStreams.upsertMicroBatch(root, Seq("id"), Some("__del"),
      sinkId, last + 2, burst, sequenceCol = Some("seq"))
    val after = GeoTable.read(spark, root).select("id", "v").as[(Long, String)]
      .collect().sortBy(_._1).toSeq
    assert(after == Seq((1L, "a"), (4L, "D4b")), s"got $after")

    // map-typed payload columns survive the sequence tie-break (it
    // hashes the JSON rendering; raw xxhash64 rejects MapType)
    val rootM = java.nio.file.Files.createTempDirectory("geosink_cdcm").toString + "/t"
    GeoTable.createEmpty(spark, rootM,
      graft.tables.GeoSchema.fromDdl("id BIGINT, props MAP<STRING, STRING>"), None)
    val mBatch = Seq(
      (7L, Map("a" -> "1"), false, 1L), (7L, Map("a" -> "2"), false, 2L)
    ).toDF("id", "props", "__del", "seq")
    GeoTable.cdcByKey(spark, rootM, Seq("id"), mBatch, col("__del"),
      sequenceCol = Some(col("seq")))
    assert(GeoTable.read(spark, rootM).selectExpr("props['a']").as[String].head() == "2")
  }

  test("sink identity is bound to the checkpoint's query id: a reset checkpoint gets a fresh id") {
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt_reset").toString
    val pathOnly = EventStreams.sinkIdFor(ckpt)
    // before the query ever starts there is no metadata file => path-only fallback
    assert(EventStreams.sinkIdFor(spark, ckpt) == pathOnly)
    // the engine writes <ckpt>/metadata {"id": ...} at query start
    val meta = java.nio.file.Paths.get(ckpt, "metadata")
    java.nio.file.Files.write(meta, """{"id":"11111111-2222-3333-4444-555555555555"}""".getBytes)
    val firstRun = EventStreams.sinkIdFor(spark, ckpt)
    assert(firstRun != pathOnly)
    assert(EventStreams.checkpointQueryId(spark, ckpt).contains("11111111-2222-3333-4444-555555555555"))
    // user deletes the checkpoint and reprocesses from scratch at the SAME
    // path: the engine mints a new query id => new sink identity, so old
    // watermarks in the table manifest no longer suppress the new batches
    java.nio.file.Files.write(meta, """{"id":"aaaaaaaa-bbbb-cccc-dddd-eeeeeeeeeeee"}""".getBytes)
    assert(EventStreams.sinkIdFor(spark, ckpt) != firstRun)
  }

  test("two concurrent sinks appending to one table: commit races retry, no lost or duplicate batches") {
    import graft.functions.GraftFunctions._
    import graft.tables.{GeoSchema, GeoTable}
    import org.apache.spark.sql.functions.{col, lit}
    val root = java.nio.file.Files.createTempDirectory("geosink_race").toString + "/t"
    GeoTable.createEmpty(spark, root,
      GeoSchema.fromDdl("id BIGINT, geo GEOMETRY"), Some("geo"))
    def batchDf(ids: Long*) = ids.toDF("id")
      .select(col("id"), st_point(col("id").cast("double"), lit(0.0)).as("geo"))
    val nBatches = 4
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = Seq("sinkA", "sinkB").zipWithIndex.map { case (sink, off) =>
      new Thread(() => {
        try (0 until nBatches).foreach { b =>
          assert(EventStreams.commitMicroBatch(root, sink, b.toLong,
            batchDf(1000L * off + b), maxAttempts = 20))
        } catch { case t: Throwable => errs.add(t) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"concurrent sink failed: ${Option(errs.peek()).map(_.toString)}")
    assert(GeoTable.read(spark, root).count() == 2L * nBatches)
    assert(GeoTable.lastStreamBatch(spark, root, "sinkA").contains(nBatches - 1L))
    assert(GeoTable.lastStreamBatch(spark, root, "sinkB").contains(nBatches - 1L))
    // every id landed exactly once
    assert(GeoTable.read(spark, root).select("id").as[Long].collect().toSet ==
      (0 until nBatches).flatMap(b => Seq(b.toLong, 1000L + b)).toSet)
  }

  test("geofence filter on a stream keeps only in-fence events") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Double, Double)]
    val fenced = EventStreams.geofence(
      input.toDF().toDF("id", "x", "y"), "x", "y", "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    input.addData((1L, 5.0, 5.0), (2L, 15.0, 5.0), (3L, 2.0, 9.0))
    val q = fenced.writeStream.format("memory").queryName("fenced")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    assert(spark.table("fenced").select("id").as[Long].collect().toSet == Set(1L, 3L))
  }
}
