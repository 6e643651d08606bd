package graft.streaming

import graft.functions.GraftFunctions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import java.sql.Timestamp

/**
 * Structured Streaming operators over the events stream (SURVEY.md §2.13).
 * Same transforms run on a batch DataFrame (tested that way too) — the
 * streaming/batch unification is the point of building on Spark.
 *
 * Scale notes: windowed aggregation is a streaming stateful agg with
 * watermark-bounded state; sessionization keeps one small state object per
 * active user key and emits on timeout — both shapes run identically on a
 * 1000-executor cluster with state in the checkpointed state store.
 */
/** Mutable-by-update session accumulator (top-level: encoder codegen). */
case class SessionState(start: Long, last: Long, n: Long, total: Double)

object EventStreams {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)
  case class Session(user_id: Long, session_start: Timestamp, session_end: Timestamp, n_events: Long, total_value: Double)

  /** Sliding-window counts/sums with a watermark (late data bounded). */
  def windowedAgg(events: DataFrame, watermark: String = "10 minutes",
                  window_ : String = "1 hour", slide: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_, slide), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))

  /**
   * Gap-based sessionization via flatMapGroupsWithState: a session closes
   * after `gapMinutes` of inactivity (event-time timeout in streams).
   */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(user, new Timestamp(s.start), new Timestamp(s.last), s.n, s.total))
          } else {
            // batch of events for this trigger; process in time order
            val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var closed = List.empty[Session]
            var cur = state.getOption
            for (e <- sorted) {
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(SessionState(s.start, t, s.n + 1, s.total + e.value))
                case Some(s) =>
                  closed ::= Session(user, new Timestamp(s.start), new Timestamp(s.last), s.n, s.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              if (eventTimeAvailable(state)) {
                // streaming: keep the open session in state, close on timeout
                state.update(s)
                state.setTimeoutTimestamp(s.last + gapMs)
              } else {
                // batch: all data seen — the trailing session is final
                closed ::= Session(user, new Timestamp(s.start), new Timestamp(s.last), s.n, s.total)
              }
            }
            closed.reverseIterator
          }
      }
  }

  /** Timeout can only be set when a watermark exists (streaming); in batch
    * execution flatMapGroupsWithState sees all data at once so timeouts are
    * irrelevant — detect by probing. */
  private def eventTimeAvailable(state: GroupState[_]): Boolean =
    try { state.getCurrentWatermarkMs(); true } catch { case _: Throwable => false }

  /** Streaming geofence: keep events whose (x,y) lies inside `fence` WKT. */
  def geofence(events: DataFrame, xCol: String, yCol: String, fenceWkt: String): DataFrame = {
    import GraftFunctions._
    events.where(st_contains(
      st_geomFromText(lit(fenceWkt)),
      st_point(col(xCol), col(yCol))))
  }

  /**
   * Streaming dedup for an ingest pipeline: drop rows whose content
   * fingerprint was already seen within the watermark horizon. State is
   * one (fingerprint) key per distinct document inside the horizon and is
   * evicted by the watermark — bounded state, exactly the shape Spark's
   * `dropDuplicatesWithinWatermark` maintains on a cluster. Works
   * identically in batch (plain dropDuplicates semantics per horizon).
   */
  def streamingDedup(docs: DataFrame, tsCol: String, textCol: String,
                     watermark: String = "10 minutes"): DataFrame = {
    val fp = graft.ops.TextAnalysis.fingerprint(col(textCol))
    val withFp = docs.withColumn("__fp", fp)
    val deduped =
      if (withFp.isStreaming)
        withFp.withWatermark(tsCol, watermark).dropDuplicatesWithinWatermark("__fp")
      else withFp.dropDuplicates("__fp")
    deduped.drop("__fp")
  }

  /**
   * Stream-static spatial enrichment: tag each event point with the zone
   * that contains it. The zones table is a broadcast static side — the
   * join runs map-only on the stream (no stream-side shuffle, no state),
   * which is the right plan for a firehose against a small dimension.
   */
  def zoneEnrich(events: DataFrame, xCol: String, yCol: String,
                 zones: DataFrame, zoneGeom: org.apache.spark.sql.Column,
                 how: String = "inner"): DataFrame = {
    import GraftFunctions._
    events.join(broadcast(zones),
      st_contains(zoneGeom, st_point(col(xCol), col(yCol))), how)
  }

  /**
   * Stream-stream interval join: pair each left event with right events of
   * the same key whose time falls in `[left.ts, left.ts + intervalSeconds]`.
   * BOTH sides carry watermarks and the join condition bounds event time in
   * both directions, so Spark derives a state-cleanup horizon: a buffered
   * left row is dropped once the right watermark passes `ts + interval`,
   * and a right row once the left watermark passes its `ts` — bounded state
   * on an unbounded firehose, the one shape at which stream-stream joins
   * survive 100 TB/day. Works identically in batch (watermark is a no-op).
   *
   * The right key column is renamed internally so self-joins (same source
   * on both sides) need no manual aliasing.
   */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   tsLeft: String, tsRight: String,
                   watermark: String = "10 minutes",
                   intervalSeconds: Long = 60,
                   joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(tsLeft, watermark)
    val r = right.withColumnRenamed(key, "__graft_rkey")
      .withWatermark(tsRight, watermark)
    // outer flavors ride the same state machinery: matched pairs emit
    // eagerly, unmatched left rows emit null-extended ONCE the watermark
    // closes their join window (both sides watermarked + the time-range
    // conjunct below are exactly Spark's outer-eviction preconditions)
    l.join(r,
        col(key) === col("__graft_rkey") &&
          col(tsRight) >= col(tsLeft) &&
          col(tsRight) <= col(tsLeft) + expr(s"INTERVAL $intervalSeconds SECONDS"),
        joinType)
      .drop("__graft_rkey")
  }

  /**
   * Streaming ingest into a GeoTable: each micro-batch appends as one
   * atomic versioned commit — readers only ever see whole batches; a
   * crashed batch leaves data files without a manifest pointer, invisible
   * and vacuumable. The micro-batch id is recorded IN the same manifest
   * commit as the files (keyed by a sink id derived from the checkpoint
   * location), and a replayed batch with id <= the recorded watermark is
   * skipped — so a crash between the table commit and the streaming
   * checkpoint write does NOT duplicate rows. This is the same
   * idempotent-replay contract as Iceberg's streaming sink (which dedups
   * on the committed batchId). The stream's columns must conform to the
   * table schema (same rule as INSERT). Use `trigger(AvailableNow)` for
   * catch-up ingest, a processing-time trigger for continuous ingest.
   *
   * At scale: appends never rewrite existing files, commit cost is one
   * manifest write + a stats pass over ONLY the new files, and file
   * count growth is curbed with periodic `OPTIMIZE` (compact) — the
   * standard log-structured ingest loop.
   */
  def geoTableSink(stream: DataFrame, root: String,
                   checkpointDir: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // sink id resolved lazily PER BATCH: by the first micro-batch the
        // engine has written <checkpoint>/metadata (the query id), so a
        // deleted-and-recreated checkpoint yields a fresh identity instead
        // of silently skipping batch ids below the old watermark
        commitMicroBatch(root, sinkIdFor(batch.sparkSession, checkpointDir), batchId, batch): Unit
      }
  }

  /**
   * Streaming CDC ingest into a GeoTable (keyed upsert sink): each
   * micro-batch applies as ONE atomic commit — rows where
   * `deleteFlagCol` (when given) is true file only their key tuple as an
   * equality delete, every other row replaces-by-key and appends
   * ([[graft.tables.GeoTable.cdcByKey]]; without a flag column the whole
   * batch upserts). Commit cost is O(batch) — no target scan, the
   * streaming-upsert property equality deletes exist for. The batchId
   * watermark rides the same commit, so crash-replayed batches are
   * skipped, not re-applied (same exactly-once contract as
   * [[geoTableSink]]). Sidecar growth is bounded by the table's inline
   * fold ceiling; periodic OPTIMIZE folds and re-clusters.
   *
   * A batch carrying SEVERAL changes for one key (the normal Debezium
   * shape) needs `sequenceCol`: only the highest-sequence change per key
   * applies — an insert+update+delete burst nets to the delete. Without
   * it, keys must be unique per batch.
   */
  def geoTableUpsertSink(stream: DataFrame, root: String, keyCols: Seq[String],
                         checkpointDir: String, deleteFlagCol: Option[String] = None,
                         sequenceCol: Option[String] = None)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        upsertMicroBatch(root, keyCols, deleteFlagCol,
          sinkIdFor(batch.sparkSession, checkpointDir), batchId, batch,
          sequenceCol = sequenceCol): Unit
      }
  }

  /** [[geoTableUpsertSink]]'s per-batch body (factored for direct
    * testing): same watermark-skip + commit-race retry discipline as
    * [[commitMicroBatch]], with cdcByKey as the apply. */
  private[graft] def upsertMicroBatch(root: String, keyCols: Seq[String],
                                      deleteFlagCol: Option[String],
                                      sinkId: String, batchId: Long, batch: DataFrame,
                                      maxAttempts: Int = 5,
                                      sequenceCol: Option[String] = None): Boolean = {
    val spark = batch.sparkSession
    var attempt = 0
    while (true) {
      attempt += 1
      val committed = graft.tables.GeoTable.lastStreamBatch(spark, root, sinkId)
      if (committed.exists(_ >= batchId)) {
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"geoTableUpsertSink: skipping micro-batch $batchId for sink $sinkId " +
            s"(table already committed batch ${committed.get}); expected only on crash replay")
        return false
      }
      val flag = deleteFlagCol.map(org.apache.spark.sql.functions.col)
        .getOrElse(org.apache.spark.sql.functions.lit(false))
      try {
        // cdcByKey itself skips the commit for a batch that nets to
        // nothing — no separate isEmpty probe job per batch
        val (nu, nk) = graft.tables.GeoTable.cdcByKey(spark, root, keyCols, batch, flag,
          streamCommit = Some(sinkId -> batchId),
          sequenceCol = sequenceCol.map(org.apache.spark.sql.functions.col))
        return nu + nk > 0
      } catch {
        case e: java.util.ConcurrentModificationException if attempt < maxAttempts =>
          org.slf4j.LoggerFactory.getLogger(getClass).info(
            s"geoTableUpsertSink: commit race on $root (attempt $attempt), retrying: ${e.getMessage}")
      }
    }
    false // unreachable
  }

  /** The sink's per-batch body, factored out for direct testing: appends
    * `batch` with the batchId watermark, UNLESS this sink already
    * committed an id >= `batchId` (a replayed micro-batch after a crash
    * that lost the checkpoint write) — then it is skipped, not
    * duplicated. Returns true when the batch was appended.
    *
    * Two streams appending to the SAME table race on the manifest pointer;
    * the loser's optimistic commit throws ConcurrentModificationException.
    * That is retried here against a fresh manifest (the watermark re-check
    * included, so a replay that lost the race is still skipped, never
    * doubled) — multi-sink ingest degrades to retries, not failed batches. */
  private[graft] def commitMicroBatch(root: String, sinkId: String,
                                      batchId: Long, batch: DataFrame,
                                      maxAttempts: Int = 5): Boolean = {
    val spark = batch.sparkSession
    var attempt = 0
    while (true) {
      attempt += 1
      val committed = graft.tables.GeoTable.lastStreamBatch(spark, root, sinkId)
      if (committed.exists(_ >= batchId)) {
        // a skip is correct for a crash-replayed batch but silent data loss
        // for a user who reset the checkpoint while reusing its path — the
        // query-id component of sinkId prevents the latter; log regardless
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"geoTableSink: skipping micro-batch $batchId for sink $sinkId " +
            s"(table already committed batch ${committed.get}); expected only on crash replay")
        return false
      }
      try {
        // append itself skips the commit (and returns 0) for an empty
        // micro-batch — no separate isEmpty probe job per batch
        return graft.tables.GeoTable.append(spark, root, batch,
          streamCommit = Some(sinkId -> batchId)) > 0
      } catch {
        case e: java.util.ConcurrentModificationException if attempt < maxAttempts =>
          org.slf4j.LoggerFactory.getLogger(getClass).info(
            s"geoTableSink: commit race on $root (attempt $attempt), retrying: ${e.getMessage}")
      }
    }
    false // unreachable
  }

  /** Stable sink identity for exactly-once bookkeeping: one streaming
    * query = one checkpoint location = one watermark entry in the table
    * manifest. Hash, not raw path, to keep manifest lines clean. */
  private[graft] def sinkIdFor(checkpointDir: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(checkpointDir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
  }

  /** Sink identity bound to the STREAMING QUERY, not just the checkpoint
    * path: the engine persists the query id in `<checkpoint>/metadata` and
    * regenerates it when the checkpoint is deleted, so "rm -rf checkpoint
    * and reprocess from scratch" gets a fresh watermark entry instead of
    * silently skipping every batch id below the old one (the Iceberg
    * streaming sink keys its dedup the same way). Falls back to the
    * path-only hash when the metadata file isn't readable (e.g. called
    * before the query ever started). */
  private[graft] def sinkIdFor(spark: SparkSession, checkpointDir: String): String =
    sinkIdFor(checkpointDir + checkpointQueryId(spark, checkpointDir).fold("")("#" + _))

  private val queryIdRe = """"id"\s*:\s*"([0-9a-fA-F-]+)"""".r

  /** The streaming query id recorded in `<checkpoint>/metadata`, if any. */
  private[graft] def checkpointQueryId(spark: SparkSession, checkpointDir: String): Option[String] =
    try {
      val p = new org.apache.hadoop.fs.Path(checkpointDir, "metadata")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val text = try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
                   finally in.close()
        queryIdRe.findFirstMatchIn(text).map(_.group(1))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Batch view of the events table shaped as Dataset[Event]. */
  def eventsDataset(spark: SparkSession, dir: String): Dataset[Event] = {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.SparkEntry.normalizeEventsTs(spark.read.parquet(s"$dir/events.parquet"))
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Event]
  }
}
