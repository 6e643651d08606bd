package graft.tables

import graft.tables.GeoManifest.Manifest

import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/**
 * Native DSv2 streaming sink for geo catalog tables:
 * `df.writeStream.toTable("geo.db.t")` — no foreachBatch wrapper. The
 * capability match is Iceberg's streaming `append()`/`complete()` sink on
 * the reference's `USING ICEBERG` tables (the write half of the streaming
 * story; the read half is [[GeoChangelog]]'s micro-batch source).
 *
 * Execution model:
 *  - Executors write parquet straight from the streaming query's tasks
 *    via [[GeoCowDataWriterFactory]] (Spark's own ParquetOutputWriter;
 *    epoch id tagged into the file name so replayed epochs never collide
 *    with committed files).
 *  - The driver's per-epoch `commit` folds the new files into ONE atomic
 *    manifest commit that also records `(sinkId -> epochId)` — data and
 *    the idempotence watermark can never disagree. A crash between the
 *    table commit and Spark's own checkpoint write replays the epoch;
 *    the watermark detects it and the replay is skipped (its files
 *    deleted), not appended twice: exactly-once, the same discipline as
 *    [[graft.streaming.EventStreams.geoTableSink]] and Iceberg's
 *    committed-batchId dedup.
 *  - OutputMode.Append appends; OutputMode.Complete (Spark calls
 *    `truncate()` on the write builder) replaces the table's contents
 *    each epoch — the streaming-aggregation sink shape.
 *  - Commit races with other writers (another stream, batch INSERT,
 *    OPTIMIZE) land on [[GeoManifest.commit]]'s compare-and-swap and are
 *    retried against a fresh manifest, watermark re-checked, so
 *    multi-writer ingest degrades to retries, never duplicates.
 *
 * At scale: appends never touch existing files; per-epoch commit cost is
 * a stats pass over only the new files plus O(changed) manifest metadata
 * (sharded lists above the threshold). File-count growth under frequent
 * triggers is curbed with periodic OPTIMIZE, the standard log-structured
 * ingest loop.
 *
 * `sinkId` derives from the streaming query id, which Spark persists in
 * the checkpoint — stable across restarts, fresh for a new checkpoint
 * (so a reset checkpoint starts a new watermark line instead of silently
 * skipping old epoch ids).
 */
class GeoStreamingWrite(root: String, incoming: StructType, sinkId: String,
                        truncate: Boolean) extends StreamingWrite {

  private def spark: SparkSession = SparkSession.active
  // schema pinned at plan time: writers and stats must agree even if the
  // table evolves mid-stream (the next run re-plans against the new schema)
  // NOTE: epoch clustering for partitioned tables comes from the catalog
  // Write's RequiresDistributionAndOrdering (V2Writes.prepareQuery applies
  // it to each micro-batch) — the distribution contract lives on the
  // Write, not here on the StreamingWrite.
  private val m: Manifest = GeoManifest.read(spark, root)
  private val commitDir = s"$root/data/s${java.util.UUID.randomUUID().toString.take(12)}"
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)
  // the constraint set the CURRENT epoch's writers enforce (re-read per
  // micro-batch in createStreamingWriterFactory); commit compares the
  // fresh manifest against this to catch a constraint ADDed inside the
  // factory-to-commit window
  @volatile private var epochChecks: Seq[(String, String)] = m.checks

  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    val dataIdx = m.schema.fields.map(f => incoming.fieldIndex(f.name))
    val job = Job.getInstance(spark.sparkContext.hadoopConfiguration)
    val owf = graft.sources.GeoParquetMeta.prepareWrite(spark, job, m.schema, m.geomCol)
    GeoManifest.fs(spark, root).mkdirs(new Path(commitDir))
    val (se, hasBbox) = GeoManifest.boundStatsExprs(spark, m.schema, m.geomCol, m.partitions)
    // CHECK constraints re-read FRESH here (this factory method runs once
    // per micro-batch, unlike the plan-time-pinned schema above): a
    // constraint added while the stream runs starts enforcing on the next
    // epoch instead of silently skipping until a restart
    val freshChecks = GeoManifest.read(spark, root).checks
    epochChecks = freshChecks
    GeoStreamingWriterFactory(GeoCowDataWriterFactory(owf,
      new SerializableConfiguration(job.getConfiguration),
      commitDir, m.schema, incoming, dataIdx,
      statsExprs = se, statsHasBbox = hasBbox,
      checks = GeoManifest.boundCheckExprs(spark, m.schema, freshChecks)))
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val written = GeoCowCommitMessage.flatten(messages)
    // entries from the writers' inline stats (stats schema pinned at plan
    // time like the write schema); computed once, reused across retries
    var entries: Seq[GeoManifest.FileEntry] = null
    var entriesSpec: (Seq[GeoPartition.PTransform], Option[String]) = null
    val maxAttempts = 5
    var attempt = 0
    while (true) {
      attempt += 1
      val fresh = GeoManifest.read(spark, root)
      if (fresh.streamCommits.get(sinkId).exists(_ >= epochId)) {
        // crash-replayed epoch: the table already holds these rows — skip
        // and drop this attempt's files so nothing waits for vacuum
        log.warn(s"geo streaming sink: skipping replayed epoch $epochId for sink $sinkId " +
          s"on $root (watermark ${fresh.streamCommits(sinkId)}); expected only on crash replay")
        dropFiles(written.map(_.path))
        return
      }
      // writer-inline stats were accumulated against the PLAN-TIME
      // manifest's geomCol/partition transforms; pruning consumes the
      // transform-range stats positionally, so if either drifted between
      // stream planning and this commit attempt (partition specs are
      // immutable today — this guards the invariant, not a live path),
      // re-read the written files under the FRESH spec instead of
      // committing misaligned stats. Recomputed only when the spec under
      // the commit changes; otherwise reused across retries as before.
      if (entries == null || entriesSpec != ((fresh.partitions, fresh.geomCol))) {
        entriesSpec = (fresh.partitions, fresh.geomCol)
        entries =
          if (fresh.partitions == m.partitions && fresh.geomCol == m.geomCol)
            GeoManifest.entriesFromMessages(spark, m.schema,
              written, m.geomCol, m.partitions)
          else GeoManifest.collectStats(spark, m.schema,
            written.filter(_.rows > 0).map(_.path), fresh.geomCol, fresh.partitions)
      }
      try {
        // a constraint ADDed after this epoch's writer factory bound its
        // checks never reached the writers — re-validate just the new
        // files against it before committing the epoch
        GeoTable.revalidateNewChecks(spark, fresh, epochChecks, entries,
          s"epoch $epochId")
        GeoManifest.commit(spark, root, fresh.copy(
          version = fresh.version + 1,
          files = if (truncate) entries else fresh.files ++ entries,
          deletes = if (truncate) Seq.empty else fresh.deletes,
          streamCommits = fresh.streamCommits + (sinkId -> epochId)), fresh.version,
          op = if (truncate) "stream-overwrite" else "stream-append")
        dropFiles(written.collect { case m if m.rows == 0 => m.path }) // empty task files
        return
      } catch {
        case e: java.util.ConcurrentModificationException if attempt < maxAttempts =>
          log.info(s"geo streaming sink: commit race on $root (attempt $attempt), " +
            s"retrying epoch $epochId: ${e.getMessage}")
      }
    }
  }

  /** Abort must never destroy committed data (same rule as
    * [[GeoCowBatchWrite.abort]]): only files the current manifest does
    * not reference are removed. */
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    try {
      val live = GeoManifest.read(spark, root).files.map(_.key).toSet
      val fs = GeoManifest.fs(spark, root)
      GeoCowCommitMessage.flatten(messages).map(_.path)
        .filterNot(p => live.contains(GeoManifest.norm(p)))
        .foreach(p => fs.delete(new Path(p), false))
    } catch { case scala.util.control.NonFatal(_) => () }

  /** Best-effort: leftovers are vacuum's job, never a commit failure. */
  private def dropFiles(ps: Seq[String]): Unit =
    try {
      val fs = GeoManifest.fs(spark, root)
      ps.foreach(p => fs.delete(new Path(p), false))
    } catch { case scala.util.control.NonFatal(_) => () }
}

/** Epoch-aware shim over the batch writer factory: the epoch id lands in
  * the file name, keeping every (epoch, partition, task) write unique. */
case class GeoStreamingWriterFactory(inner: GeoCowDataWriterFactory)
  extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    inner.copy(tag = s"-e$epochId").createWriter(partitionId, taskId)
}
