package graft.tables

import graft.tables.GeoManifest.Manifest

import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriterFactory, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/**
 * Native DSv2 batch write for geo catalog tables — INSERT INTO / INSERT
 * OVERWRITE / CTAS-append execute as real V2 writes, not the V1
 * InsertableRelation fallback. The switch is load-bearing, not cosmetic:
 * Spark only honors a Write's `RequiresDistributionAndOrdering` on the
 * V2 execution path (`AppendDataExecV1` runs the pre-`prepareQuery`
 * query), so partitioned tables' transform-space clustering — resolved
 * through [[GeoFunctions]] via this catalog — needs the V2 path to reach
 * the executors. One shuffle, planned by Catalyst, replaces the V1
 * path's driver-side re-layout.
 *
 * Executors write parquet via [[GeoCowDataWriterFactory]] (Spark's own
 * ParquetOutputWriter, GEOMETRY field metadata intact); the driver
 * commit stats-scans ONLY the new files and folds them into one atomic
 * manifest commit — append, or full replacement under `truncate`
 * (INSERT OVERWRITE). Commit races retry against a fresh manifest;
 * abort never deletes manifest-referenced files.
 */
class GeoBatchWrite(root: String, incoming: StructType, truncate: Boolean)
  extends BatchWrite {

  private def spark: SparkSession = SparkSession.active
  private val m: Manifest = GeoManifest.read(spark, root)
  private val commitDir = s"$root/data/b${java.util.UUID.randomUUID().toString.take(12)}"
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val dataIdx = m.schema.fields.map(f => incoming.fieldIndex(f.name))
    val job = Job.getInstance(spark.sparkContext.hadoopConfiguration)
    val owf = new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat()
      .prepareWrite(spark, job, Map.empty, m.schema)
    GeoManifest.fs(spark, root).mkdirs(new Path(commitDir))
    GeoCowDataWriterFactory(owf, new SerializableConfiguration(job.getConfiguration),
      commitDir, m.schema, incoming, dataIdx)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val written = messages.collect { case GeoCowCommitMessage(p, n) => (p, n) }.toSeq
    val entries = GeoManifest.collectStats(spark, m.schema,
      written.collect { case (p, n) if n > 0 => p }, m.geomCol, m.partitions)
    val maxAttempts = 5
    var attempt = 0
    var committed = false
    while (!committed) {
      attempt += 1
      val fresh = GeoManifest.read(spark, root)
      try {
        GeoManifest.commit(spark, root, fresh.copy(
          version = fresh.version + 1,
          files = if (truncate) entries else fresh.files ++ entries,
          deletes = if (truncate) Seq.empty else fresh.deletes), fresh.version)
        committed = true
      } catch {
        case e: java.util.ConcurrentModificationException if attempt < maxAttempts =>
          log.info(s"geo batch write: commit race on $root (attempt $attempt): ${e.getMessage}")
      }
    }
    // zero-row task files never enter the manifest; best-effort cleanup
    try {
      val fs = GeoManifest.fs(spark, root)
      written.collect { case (p, n) if n == 0 => p }
        .foreach(p => fs.delete(new Path(p), false))
    } catch { case scala.util.control.NonFatal(_) => () }
  }

  /** Same rule as [[GeoCowBatchWrite.abort]]: never delete files the
    * current manifest references (abort can fire after a successful
    * commit if a post-commit step fails). */
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    try {
      val fs = GeoManifest.fs(spark, root)
      val live = GeoManifest.read(spark, root).files.map(_.key).toSet
      val dirKey = GeoManifest.norm(commitDir)
      if (live.exists(_.startsWith(dirKey + "/")))
        messages.collect { case GeoCowCommitMessage(p, _) => p }
          .filterNot(p => live.contains(GeoManifest.norm(p)))
          .foreach(p => fs.delete(new Path(p), false))
      else fs.delete(new Path(commitDir), true)
    } catch { case scala.util.control.NonFatal(_) => () }
}
