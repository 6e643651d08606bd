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
    val owf = graft.sources.GeoParquetMeta.prepareWrite(spark, job, m.schema, m.geomCol)
    GeoManifest.fs(spark, root).mkdirs(new Path(commitDir))
    val (se, hasBbox) = GeoManifest.boundStatsExprs(spark, m.schema, m.geomCol, m.partitions)
    // the write's requiredDistribution/Ordering sorts rows by the layout
    // transforms, so the writer rolls files at tuple boundaries —
    // single-valued files, the storage-partitioned-join precondition
    GeoCowDataWriterFactory(owf, new SerializableConfiguration(job.getConfiguration),
      commitDir, m.schema, incoming, dataIdx, statsExprs = se, statsHasBbox = hasBbox,
      rollIdx = m.partitions.zipWithIndex.filter(_._1.layout).map(_._2).toArray,
      rollMinRows = GeoRowLevel.rollMinRows(spark),
      checks = GeoManifest.boundCheckExprs(spark, m.schema, m.checks))
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val written = GeoCowCommitMessage.flatten(messages)
    // writer-collected inline stats: no read-back scan of the new files
    val entries = GeoManifest.entriesFromMessages(spark, m.schema,
      written, m.geomCol, m.partitions)
    val maxAttempts = 5
    var attempt = 0
    var committed = false
    while (!committed) {
      attempt += 1
      val fresh = GeoManifest.read(spark, root)
      try {
        // a concurrent SET PARTITIONED BY between load and commit must
        // not mis-attribute these entries' stats to the new spec
        val aligned = GeoManifest.alignSpec(entries, m, fresh)
        // a constraint ADDed since plan time never reached the writers —
        // re-validate just the new files against it before committing
        GeoTable.revalidateNewChecks(spark, fresh, m.checks, aligned, "this INSERT")
        GeoManifest.commit(spark, root, fresh.copy(
          version = fresh.version + 1,
          files = if (truncate) aligned else fresh.files ++ aligned,
          deletes = if (truncate) Seq.empty else fresh.deletes,
          // truncate replaced every old file — retired specs survive
          // only if the aligned entries themselves still carry one
          pastSpecs =
            if (truncate) fresh.pastSpecs.view.filterKeys(id =>
              aligned.exists(_.spec == id)).toMap
            else fresh.pastSpecs), fresh.version,
          op = if (truncate) "overwrite" else "append")
        committed = true
      } catch {
        case e: java.util.ConcurrentModificationException if attempt < maxAttempts =>
          log.info(s"geo batch write: commit race on $root (attempt $attempt): ${e.getMessage}")
      }
    }
    // zero-row task files never enter the manifest; best-effort cleanup
    try {
      val fs = GeoManifest.fs(spark, root)
      written.collect { case m if m.rows == 0 => m.path }
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
        GeoCowCommitMessage.flatten(messages).map(_.path)
          .filterNot(p => live.contains(GeoManifest.norm(p)))
          .foreach(p => fs.delete(new Path(p), false))
      else fs.delete(new Path(commitDir), true)
    } catch { case scala.util.control.NonFatal(_) => () }
}

/**
 * The SQL surface for branch writes (Iceberg's `INSERT INTO t.branch_x`
 * spelling): `geo.db.t.branch_<name>` resolves to this table — reads see
 * the branch HEAD snapshot (same state as `VERSION AS OF '<name>'`),
 * `INSERT INTO` appends a staged commit that moves only the branch ref,
 * never `_current`. With the audit (`SELECT ... VERSION AS OF`) and
 * `ALTER TABLE ... PUBLISH BRANCH` verbs this closes the
 * write-audit-publish loop in pure SQL. Writes carry the same
 * transform-space clustering contract as main-table inserts.
 */
class GeoBranchTable(tableName: String, root: String, branch: String,
                     head: Manifest)
  extends org.apache.spark.sql.connector.catalog.Table
  with org.apache.spark.sql.connector.catalog.SupportsRead
  with org.apache.spark.sql.connector.catalog.SupportsWrite {

  import org.apache.spark.sql.connector.catalog.TableCapability
  import org.apache.spark.sql.connector.read.ScanBuilder
  import org.apache.spark.sql.connector.write.{LogicalWriteInfo, Write, WriteBuilder}
  import org.apache.spark.sql.util.CaseInsensitiveStringMap

  private def spark: SparkSession = SparkSession.active

  override def name(): String = tableName

  override def schema(): StructType = head.schema

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GeoCowScanBuilder(spark, head.schema, head.files, options, _ => (),
      specs = head.specSet, deletes = head.deletes,
      eqDeletes = head.eqDeletes, colStats = head.colStats,
      bloomCols = head.bloomCols, blooms = head.blooms)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write
        with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {
        // same transform-space clustering as main-table inserts (see
        // GeoV2Table.newWriteBuilder) — staged files get the layout and
        // per-file transform ranges main files do
        import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
        import org.apache.spark.sql.connector.expressions.SortOrder
        private val sorts: Array[SortOrder] = GeoPartition.v2SortOrders(head.partitions)
        override def requiredDistribution(): Distribution =
          if (sorts.isEmpty) Distributions.unspecified()
          else Distributions.ordered(sorts)
        override def requiredOrdering(): Array[SortOrder] = sorts
        override def requiredNumPartitions(): Int =
          if (sorts.isEmpty) 0
          else SparkSession.active.sessionState.conf.numShufflePartitions
        override def toBatch: org.apache.spark.sql.connector.write.BatchWrite =
          new GeoBranchBatchWrite(root, branch, info.schema())
      }
    }
}

/** Branch-append commit: like [[GeoBatchWrite]] but the manifest goes to
  * the shared linear sequence via commitBranch — only the branch ref
  * moves. Races against concurrent branch writers retry off the fresh
  * branch head. */
class GeoBranchBatchWrite(root: String, branch: String, incoming: StructType)
  extends BatchWrite {

  private def spark: SparkSession = SparkSession.active
  private val m: Manifest = {
    val r = GeoManifest.refs(spark, root)
    val b = r.branches.getOrElse(branch, throw new IllegalArgumentException(
      s"no branch '$branch' on $root (branches: ${r.branches.keys.toSeq.sorted.mkString(", ")})"))
    GeoManifest.readVersion(spark, root, b.head)
  }
  private val commitDir = s"$root/data/b${java.util.UUID.randomUUID().toString.take(12)}"
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val dataIdx = m.schema.fields.map(f => incoming.fieldIndex(f.name))
    val job = Job.getInstance(spark.sparkContext.hadoopConfiguration)
    val owf = graft.sources.GeoParquetMeta.prepareWrite(spark, job, m.schema, m.geomCol)
    GeoManifest.fs(spark, root).mkdirs(new Path(commitDir))
    val (se, hasBbox) = GeoManifest.boundStatsExprs(spark, m.schema, m.geomCol, m.partitions)
    // branch writes carry the same clustering contract as main inserts,
    // so they roll to single-valued files the same way
    GeoCowDataWriterFactory(owf, new SerializableConfiguration(job.getConfiguration),
      commitDir, m.schema, incoming, dataIdx, statsExprs = se, statsHasBbox = hasBbox,
      rollIdx = m.partitions.zipWithIndex.filter(_._1.layout).map(_._2).toArray,
      rollMinRows = GeoRowLevel.rollMinRows(spark),
      checks = GeoManifest.boundCheckExprs(spark, m.schema, m.checks))
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val written = GeoCowCommitMessage.flatten(messages)
    val entries = GeoManifest.entriesFromMessages(spark, m.schema,
      written, m.geomCol, m.partitions)
    val maxAttempts = 5
    var attempt = 0
    var committed = false
    while (!committed) {
      attempt += 1
      val r = GeoManifest.refs(spark, root)
      val b = r.branches.getOrElse(branch, throw new IllegalStateException(
        s"branch '$branch' of $root was dropped while this INSERT ran"))
      val fresh = GeoManifest.readVersion(spark, root, b.head)
      try {
        val aligned = GeoManifest.alignSpec(entries, m, fresh)
        GeoTable.revalidateNewChecks(spark, fresh, m.checks, aligned,
          s"this INSERT into branch '$branch'")
        GeoManifest.commitBranch(spark, root,
          fresh.copy(version = b.head + 1, files = fresh.files ++ aligned),
          branch, b.head, op = "append")
        committed = true
      } catch {
        case e: java.util.ConcurrentModificationException if attempt < maxAttempts =>
          log.info(s"geo branch write: commit race on $root@$branch " +
            s"(attempt $attempt): ${e.getMessage}")
      }
    }
    try {
      val fs = GeoManifest.fs(spark, root)
      written.collect { case m if m.rows == 0 => m.path }
        .foreach(p => fs.delete(new Path(p), false))
    } catch { case scala.util.control.NonFatal(_) => () }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    try {
      val fs = GeoManifest.fs(spark, root)
      val r = GeoManifest.refs(spark, root)
      val live = r.branches.get(branch)
        .map(b => GeoManifest.readVersion(spark, root, b.head).files.map(_.key).toSet)
        .getOrElse(Set.empty)
      val dirKey = GeoManifest.norm(commitDir)
      if (live.exists(_.startsWith(dirKey + "/")))
        GeoCowCommitMessage.flatten(messages).map(_.path)
          .filterNot(p => live.contains(GeoManifest.norm(p)))
          .foreach(p => fs.delete(new Path(p), false))
      else fs.delete(new Path(commitDir), true)
    } catch { case scala.util.control.NonFatal(_) => () }
}
