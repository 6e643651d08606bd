package graft.tables

import graft.tables.GeoManifest.{FileEntry, Manifest}

import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.hadoop.mapreduce.{Job, TaskAttemptID, TaskType}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.connector.catalog.MetadataColumn
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.execution.datasources.v2.FileScanBuilder
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.execution.datasources.{FilePartition, InMemoryFileIndex, OutputWriterFactory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/**
 * Native DataSourceV2 row-level DML for GeoTable — `UPDATE geo.db.t SET
 * ... WHERE ST_Intersects(...)`, DELETE and MERGE INTO resolve through
 * Spark's OWN analyzer and row-level rewrite rules, no regex front-end
 * (capability match for the reference's Iceberg DML — reference:
 * extension/src/test/scala/org/apache/iceberg/TestSedonaIcebergExtension
 * .scala:83-91 runs exactly these statements against a catalog table).
 *
 * Copy-on-write at FILE granularity, the same discipline as
 * [[GeoTable.update]]/delete/merge:
 *
 *  - [[GeoRowLevelOperation]] implements `SupportsRowLevelOperations`'
 *    group-based contract: Spark rewrites the DML into `ReplaceData`
 *    (scan affected groups, recompute their rows, swap the groups).
 *  - [[GeoCowScan]] is the group scan: Spark's own vectorized ParquetScan
 *    over the manifest's file list (filter pushdown and column pruning
 *    delegate to it untouched), plus a `_file` METADATA COLUMN so rows
 *    carry their group identity.
 *  - `SupportsRuntimeV2Filtering` on `_file` is the scale lever: Spark's
 *    RowLevelOperationRuntimeGroupFiltering first runs a matching-rows
 *    subquery (`SELECT DISTINCT _file WHERE cond`), then narrows the main
 *    scan to exactly the files holding matches — an UPDATE of one
 *    Z-ordered neighborhood rewrites a handful of files no matter how big
 *    the table is, the Iceberg CoW behavior.
 *  - [[GeoCowBatchWrite]] writes replacement parquet from the executors
 *    (Spark's own ParquetOutputWriter) and commits ONE atomic manifest
 *    swap: untouched files carry over by reference, scanned files are
 *    replaced by the rewritten ones. Concurrent-commit detection rides on
 *    [[GeoManifest.commit]]'s compare-and-swap versioning as everywhere.
 */
object GeoRowLevel {
  val FileCol = "_file"

  /** scratch debug switch (CowDebug tool) */
  @volatile var debug = false

  /** Min rows an open file must hold before a transform-tuple boundary
    * rolls it (`spark.graft.write.rollMinRows`, the row-count analog of
    * Iceberg's target file size): production-sized partitions dwarf the
    * default and always roll single-valued for storage-partitioned
    * joins, while small-partition tables (day-partitioned at test scale)
    * keep task-sized files instead of exploding into per-tuple
    * micro-files — they just don't report SPJ until their partitions
    * carry real volume. Demos/tests pin it low to exercise SPJ at toy
    * scale. */
  def rollMinRows(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.write.rollMinRows")
      .map(_.toLong).getOrElse(4096L)

  val metadataColumns: Array[MetadataColumn] = Array(new MetadataColumn {
    override def name(): String = FileCol
    override def dataType(): org.apache.spark.sql.types.DataType = StringType
    override def isNullable: Boolean = false
    override def comment(): String = "data file holding the row (CoW group id)"
  })
}

/** One DML statement's operation: shared between its scan (group
  * discovery) and its write (group replacement) so the commit knows
  * exactly which files the scan ended up reading after runtime group
  * filtering. */
class GeoRowLevelOperation(root: String, cmd: RowLevelOperation.Command)
  extends RowLevelOperation {

  // the main ReplaceData scan is identified STRUCTURALLY: it is the only
  // scan whose pruned schema still covers every table column plus `_file`
  // (it must — ReplaceData rewrites whole rows). The runtime-group-filter's
  // matching scan prunes to `_file` + condition columns, so it can never
  // be mistaken for it regardless of which optimizer batch builds first.
  @volatile private var mainScan: GeoCowScan = _
  private[tables] def scannedFiles: Option[Seq[FileEntry]] = Option(mainScan).map(_.scannedFiles)

  private def spark: SparkSession = SparkSession.active

  // ONE manifest read per DML statement: the scan, the write's required
  // distribution, and the write's base snapshot all see the same
  // snapshot (on a 1M-file table each read is ~40 shard fetches — three
  // independent reads were pure fixed overhead). Commit-time conflict
  // validation still re-reads FRESH inside GeoCowBatchWrite.commit.
  private lazy val m0: Manifest = GeoManifest.read(spark, root)

  override def command(): RowLevelOperation.Command = cmd

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val m = m0
    // MoR sidecars merge inside the scan readers (GeoMorReaderFactory):
    // the rewrite sees only visible rows, so hidden rows never resurrect
    // through a CoW rewrite; commit prunes sidecar entries that pointed
    // into the replaced files (their rows are gone for good).
    new GeoCowScanBuilder(spark, m.schema, m.files, options,
      s => if (mainScan == null && s.coversFullRow) mainScan = s,
      deletes = m.deletes, eqDeletes = m.eqDeletes,
      bloomCols = m.bloomCols, blooms = m.blooms)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write
        with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {
        // CoW rewrites request the same transform-space clustering as
        // batch inserts: without it a single UPDATE writes files that
        // straddle partition values and silently degrades every
        // subsequent join on a co-partitioned table to full shuffles
        // until OPTIMIZE. With it, DML PRESERVES the storage-partitioned
        // join precondition (files stay single-valued; the rolling
        // writer below closes files at tuple boundaries).
        import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
        import org.apache.spark.sql.connector.expressions.SortOrder
        private val sorts: Array[SortOrder] = GeoPartition.v2SortOrders(m0.partitions)
        override def requiredDistribution(): Distribution =
          if (sorts.isEmpty) Distributions.unspecified()
          else Distributions.ordered(sorts)
        override def requiredOrdering(): Array[SortOrder] = sorts
        override def requiredNumPartitions(): Int =
          if (sorts.isEmpty) 0
          else SparkSession.active.sessionState.conf.numShufflePartitions
        override def toBatch: BatchWrite =
          new GeoCowBatchWrite(root, info.schema(), () => scannedFiles, cmd, m0)
      }
    }

  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array(Expressions.column(GeoRowLevel.FileCol))

  override def description(): String = s"GeoRowLevelOperation($cmd, $root)"
}

/**
 * ScanBuilder handling the `_file` metadata column; everything else
 * (filter pushdown, column pruning) delegates to Spark's
 * ParquetScanBuilder over the manifest's explicit file list — so plans
 * keep PushedFilters/ReadSchema exactly as the plain read path does.
 */
class GeoCowScanBuilder(spark: SparkSession, tableSchema: StructType,
                        files: Seq[FileEntry], options: CaseInsensitiveStringMap,
                        onBuild: GeoCowScan => Unit,
                        streamRoot: Option[String] = None,
                        specs: GeoPartition.SpecSet = GeoPartition.SpecSet.empty,
                        deletes: Seq[GeoManifest.DeleteEntry] = Seq.empty,
                        eqDeletes: Seq[GeoManifest.EqDeleteEntry] = Seq.empty,
                        colStats: Map[String, GeoManifest.ColStat] = Map.empty,
                        bloomCols: Seq[GeoBloom.BloomSpec] = Seq.empty,
                        blooms: Seq[GeoBloom.BloomEntry] = Seq.empty)
  extends ScanBuilder
  with SupportsPushDownRequiredColumns
  with SupportsPushDownAggregates
  with org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters {

  private val inner = org.apache.spark.sql.graft.GraftShim
    .parquetScanBuilder(spark, files.map(_.path), tableSchema, options)
    .asInstanceOf[FileScanBuilder]
  private var needFile = false
  private var fullRow = false

  // merge-on-read: the scan also reads Spark's parquet row-index column
  // (generated, not stored — the same machinery behind
  // _metadata.row_index, correct under predicate pushdown) so the reader
  // can anti-join (file, row-ordinal) delete sidecars inline. nullable =
  // true is load-bearing: the column is absent from the files, and an
  // optional-missing column is null-filled then overwritten by the
  // generator, while a required one fails the reader's schema check.
  private def rowIdxField = StructField(
    ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME,
    org.apache.spark.sql.types.LongType, nullable = true)

  // equality deletes filter on key COLUMNS: any key column the query
  // pruned away is read anyway (then projected off by the reader)
  private val eqKeyCols: Seq[String] = eqDeletes.flatMap(_.cols).distinct
  private var extraEqCols: Seq[String] = Seq.empty

  override def pruneColumns(required: StructType): Unit = {
    needFile = required.fieldNames.contains(GeoRowLevel.FileCol)
    val names = required.fieldNames.toSet
    fullRow = needFile && tableSchema.fieldNames.forall(names.contains)
    val base = required.fields.filterNot(_.name == GeoRowLevel.FileCol)
    extraEqCols = eqKeyCols.filterNot(names.contains)
    val withEq = base ++ extraEqCols.map(c => tableSchema(c))
    inner.pruneColumns(StructType(
      if (deletes.isEmpty) withEq else withEq :+ rowIdxField))
  }

  // filters feed BOTH the parquet pushdown (inner) and manifest-level
  // partition pruning (per-file transform min/max, applied at build)
  private var allFilters: Seq[org.apache.spark.sql.catalyst.expressions.Expression] = Seq.empty

  override def pushFilters(filters: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = {
    allFilters = filters
    inner.pushFilters(filters)
  }

  override def pushedFilters(): Array[Predicate] = inner.pushedFilters

  // MIN/MAX/COUNT pushdown into parquet footers, same as the plain
  // ParquetScanBuilder path; a group-by on `_file` (the runtime-filter
  // matching scan's DISTINCT) is not a parquet column so the inner
  // builder rejects it and we read rows as usual. With MoR sidecars the
  // footers still count deleted rows, so pushdown must not answer.
  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    deletes.isEmpty && eqDeletes.isEmpty &&
      inner.asInstanceOf[SupportsPushDownAggregates].supportCompletePushDown(agg)

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    deletes.isEmpty && eqDeletes.isEmpty &&
      inner.asInstanceOf[SupportsPushDownAggregates].pushAggregation(agg)

  override def build(): Scan = {
    // delete sidecars are commit-bounded small (MorMaxRatio admission);
    // the driver-side materialization is memoized by (immutable) sidecar
    // path set, so repeated scans of an unchanged table load them once
    val deletedPos: Map[String, Array[Long]] =
      GeoSidecarCache.positions(spark, deletes)
    // manifest-level partition pruning FIRST: per-file transform ranges
    // vs the filter-derived bounds (conservative — underivable filters
    // keep all), each file under ITS OWN partition spec — so the sidecar
    // selection below sees the narrowed set
    val pruned = {
      val ranged =
        if (allFilters.nonEmpty)
          GeoPartition.pruneBySpec(files, specs, tableSchema, allFilters)
        else files
      // per-file bloom probe for =/IN conjuncts on bloom columns: the
      // point-lookup skipping min/max cannot give on unclustered columns
      GeoBloom.prune(spark, blooms, bloomCols, tableSchema, allFilters, ranged)
    }
    // equality-delete keys load once driver-side as UnsafeRows cast to the
    // table column types — byte-layout-identical to what the reader's key
    // projection emits, so membership is a hash-set probe on raw bytes.
    // Sidecars whose key range intersects NO surviving file are skipped
    // entirely: a partition-scoped scan loads only the deletes that can
    // touch it (O(intersecting sidecars), not O(live sidecars)).
    val liveEq = eqDeletes.sortBy(_.version).filter(e =>
      pruned.exists(f => GeoManifest.eqApplies(specs.of(f), e, f)))
    val eqGroups: Seq[GeoEqGroup] = liveEq.map { e =>
      GeoEqGroup(e.version, e.cols, GeoSidecarCache.eqKeys(spark, e, tableSchema))
    }
    val s = new GeoCowScan(spark, inner.build().asInstanceOf[ParquetScan],
      tableSchema, files, needFile, fullRow, streamRoot, options, deletedPos,
      eqGroups, extraEqCols, specs, liveEq, colStats, bloomCols, blooms)
    if (pruned.length < files.length) s.filterTo(pruned)
    if (GeoRowLevel.debug) System.err.println(
      s"[cow] build scan ${System.identityHashCode(s)} needFile=$needFile files=${files.length}")
    onBuild(s)
    s
  }
}

object GeoCowScan {
  /** Every [[GeoCowScan]] in an EXECUTED plan — walks into AQE query
    * stages and reused exchanges, which plain collect() treats as
    * leaves. The one helper behind every scanned-files assertion
    * (benches, specs, in-query requires). */
  def collectIn(plan: org.apache.spark.sql.execution.SparkPlan): Seq[GeoCowScan] = {
    val buf = scala.collection.mutable.ListBuffer.empty[GeoCowScan]
    def walk(n: org.apache.spark.sql.execution.SparkPlan): Unit = n match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        walk(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => walk(r.child)
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.scan match { case s: GeoCowScan => buf += s; case _ => () }
      case other => other.children.foreach(walk)
    }
    walk(plan)
    buf.toList
  }
}

/**
 * The group scan: Spark's ParquetScan over (a runtime-narrowed subset of)
 * the manifest file list, optionally appending the constant-per-file
 * `_file` column. Runtime group filtering arrives as `_file IN (...)`
 * V2 predicates; everything else about reading is the stock vectorized
 * parquet path.
 */
class GeoCowScan(spark: SparkSession, inner0: ParquetScan, tableSchema: StructType,
                 allFiles: Seq[FileEntry], needFile: Boolean,
                 val coversFullRow: Boolean = false,
                 streamRoot: Option[String] = None,
                 options: CaseInsensitiveStringMap = CaseInsensitiveStringMap.empty(),
                 deletedPos: Map[String, Array[Long]] = Map.empty,
                 eqGroups: Seq[GeoEqGroup] = Seq.empty,
                 extraEqCols: Seq[String] = Seq.empty,
                 specs: GeoPartition.SpecSet = GeoPartition.SpecSet.empty,
                 eqEntries: Seq[GeoManifest.EqDeleteEntry] = Seq.empty,
                 colStats: Map[String, GeoManifest.ColStat] = Map.empty,
                 bloomCols: Seq[GeoBloom.BloomSpec] = Seq.empty,
                 blooms: Seq[GeoBloom.BloomEntry] = Seq.empty)
  extends Scan with Batch with SupportsRuntimeV2Filtering with SupportsReportStatistics
  with SupportsReportPartitioning {

  // the CURRENT spec's transforms: what new writes cluster by, what SPJ
  // and runtime filterAttributes advertise; per-FILE stats consumers
  // resolve specs.of(f) instead (spec evolution)
  private def partitions: Seq[GeoPartition.PTransform] = specs.current

  // file key -> ordinals (into eqGroups) of the equality deletes that can
  // touch the file — sequence number AND key-range applicability (under
  // the file's own spec), so a file outside a sidecar's key range never
  // pays the probe
  private val eqApplicableByKey: Map[String, Array[Int]] =
    if (eqGroups.isEmpty) Map.empty
    else allFiles.map(f => f.key -> eqEntries.zipWithIndex.collect {
      case (e, i) if GeoManifest.eqApplies(specs.of(f), e, f) => i
    }.toArray).toMap

  @volatile private var current: Seq[FileEntry] = allFiles
  def scannedFiles: Seq[FileEntry] = current

  /** Build-time narrowing (partition pruning from pushed filters). */
  private[tables] def filterTo(fs: Seq[FileEntry]): Unit = { current = fs }

  /** `spark.readStream.table("geo.db.t")`: micro-batches replay appended
    * files version-by-version; pruned columns and pushed filters carry
    * over through inner0 (see [[GeoMicroBatchStream]]). */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    streamRoot match {
      case Some(root) => new GeoMicroBatchStream(spark, root, inner0, tableSchema, options)
      case None => super.toMicroBatchStream(checkpointLocation)
    }

  // planning-time statistics: byte size from the stock FileScan estimate
  // (without it the catalog table reports defaultSizeInBytes = Long.Max
  // and auto-broadcast never fires), EXACT row counts from the manifest
  // (file rows minus position-delete rows; eq-deletes make it an upper
  // bound — fine for an estimate, the admission rule bounds them), and
  // ANALYZE-collected per-column NDV/null/min-max so CBO can estimate
  // filter selectivity and pick broadcast joins before runtime.
  override def estimateStatistics(): Statistics = {
    val base = inner0.estimateStatistics()
    val snap = current
    val rows = snap.map(_.rows).sum -
      snap.map(f => deletedPos.get(f.key).map(_.length.toLong).getOrElse(0L)).sum
    val colMap = new java.util.HashMap[NamedReference,
      org.apache.spark.sql.connector.read.colstats.ColumnStatistics]()
    colStats.foreach { case (c, st) =>
      tableSchema.fields.find(_.name.equalsIgnoreCase(c)).foreach { f =>
        // min/max carry the CATALYST-internal value of the column's type
        // (embedding mapped back: DATE = epoch-day int, TIMESTAMP =
        // micros long) so estimation ranges compare correctly
        def internal(v: Long): Object = f.dataType match {
          case org.apache.spark.sql.types.ByteType => java.lang.Byte.valueOf(v.toByte)
          case org.apache.spark.sql.types.ShortType => java.lang.Short.valueOf(v.toShort)
          case org.apache.spark.sql.types.IntegerType |
               org.apache.spark.sql.types.DateType => java.lang.Integer.valueOf(v.toInt)
          case _ => java.lang.Long.valueOf(v)
        }
        colMap.put(Expressions.column(f.name),
          new org.apache.spark.sql.connector.read.colstats.ColumnStatistics {
            override def distinctCount(): java.util.OptionalLong =
              java.util.OptionalLong.of(st.ndv)
            override def nullCount(): java.util.OptionalLong =
              java.util.OptionalLong.of(st.nulls)
            override def min(): java.util.Optional[Object] =
              st.min.map(v => java.util.Optional.of(internal(v)))
                .getOrElse(java.util.Optional.empty[Object]())
            override def max(): java.util.Optional[Object] =
              st.max.map(v => java.util.Optional.of(internal(v)))
                .getOrElse(java.util.Optional.empty[Object]())
          })
      }
    }
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong = base.sizeInBytes()
      override def numRows(): java.util.OptionalLong = java.util.OptionalLong.of(rows)
      override def columnStats(): java.util.Map[NamedReference,
        org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = colMap
    }
  }

  // the parquet row-index column and the force-read equality-delete key
  // columns are reader-internal: they feed the MoR/eq merges in the
  // wrappers and never reach the scan's output schema
  private def innerOutSchema: StructType = StructType(inner0.readSchema().fields
    .filterNot(f => f.name == ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME ||
      extraEqCols.contains(f.name)))

  override def readSchema(): StructType =
    if (needFile) StructType(innerOutSchema.fields :+
      StructField(GeoRowLevel.FileCol, StringType, nullable = false))
    else innerOutSchema

  override def toBatch: Batch = this

  // DML scans (which project `_file`) advertise runtime group filtering
  // on `_file`; plain reads of a partitioned table advertise the
  // transform SOURCE columns instead — Spark's dynamic partition pruning
  // then runs the dimension side's filter first and hands this scan the
  // matching join-key values, which prune to exactly the files whose
  // per-transform ranges can hold them (Iceberg runtime-filtering
  // analog: a selective dim filter prunes fact FILES at runtime). A
  // `_file` reference must never leak into plain reads (dynamic-pruning
  // resolution would trip on a column absent from the relation output).
  override def filterAttributes(): Array[NamedReference] =
    if (needFile) Array(Expressions.column(GeoRowLevel.FileCol))
    else {
      // only columns that SURVIVED pruning: Spark resolves these against
      // the scan relation's output and throws on a missing one. Bloom
      // columns advertise too — a runtime IN list (DPP's join-key values)
      // probes their per-file blooms just like a pushed literal list.
      val out = readSchema().fieldNames.map(_.toLowerCase).toSet
      (partitions.map(_.col) ++ bloomCols.map(_.col)).distinct
        .filter(c => out.contains(c.toLowerCase))
        .map(c => Expressions.column(c): NamedReference).toArray
    }

  /** Runtime narrowing: `_file IN (...)`/`= ...` narrows the DML group
    * set; `col IN (...)`/`= ...` on a transform source column keeps only
    * files whose recorded range for SOME transform on that column can
    * hold at least one of the values. Any unrecognized predicate is
    * ignored (keeping more files is always correct). */
  override def filter(predicates: Array[Predicate]): Unit = {
    val keeps = predicates.flatMap { p =>
      p.name() match {
        case "IN" | "=" =>
          val cs = p.children()
          cs.headOption match {
            case Some(ref: NamedReference)
                if ref.fieldNames().sameElements(Array(GeoRowLevel.FileCol)) =>
              // every value must be a Literal, or the predicate is
              // ignored wholesale: pruning against a PARTIAL value list
              // would drop files matching the non-literal remainder —
              // silent row loss, the one direction this contract forbids
              val vs = cs.tail.map {
                case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
                  Some(GeoManifest.norm(String.valueOf(l.value())))
                case _ => None
              }
              if (vs.exists(_.isEmpty)) None else Some(vs.flatten.toSet)
            case _ => None
          }
        case _ => None
      }
    }
    if (keeps.nonEmpty) {
      val keep = keeps.reduce(_ intersect _)
      current = current.filter(f => keep.contains(f.key))
    }
    // data-column runtime filters (dynamic partition pruning): for each
    // transform on the filtered column, a file survives if ANY value's
    // derived transform value lands inside the file's recorded range
    predicates.foreach { p =>
      p.name() match {
        case "IN" | "=" =>
          val cs = p.children()
          cs.headOption match {
            case Some(ref: NamedReference) if ref.fieldNames().length == 1 &&
                !ref.fieldNames()(0).equalsIgnoreCase(GeoRowLevel.FileCol) =>
              val colName = ref.fieldNames()(0)
              val dt = tableSchema.fields
                .find(_.name.equalsIgnoreCase(colName)).map(_.dataType)
              val allLits = cs.tail.forall(
                _.isInstanceOf[org.apache.spark.sql.connector.expressions.Literal[_]])
              // a non-literal child means the value list is not fully
              // known here — skip the whole predicate (no pruning) rather
              // than prune against the partial literal subset, which
              // would silently drop files matching the unknown values
              if (dt.isDefined && allLits) {
                val lits = cs.tail.collect {
                  case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
                    l.value().asInstanceOf[Any]
                }
                // every literal must derive for every transform we use,
                // or that transform contributes no pruning. Derived value
                // sets are PER SPEC (memoized): a file's recorded ranges
                // are positional against its own spec's transforms, and a
                // spec without a transform on the column prunes nothing
                // for its files (conservative).
                val perSpec = scala.collection.mutable.Map
                  .empty[Int, Seq[(Int, Option[Seq[Long]])]]
                def perTFor(sid: Int): Seq[(Int, Option[Seq[Long]])] =
                  perSpec.getOrElseUpdate(sid,
                    specs.byId.getOrElse(sid, Seq.empty).zipWithIndex
                      .filter(_._1.col.equalsIgnoreCase(colName))
                      .map { case (t, i) =>
                        val vs = lits.map(v =>
                          scala.util.Try(GeoPartition.valueOf(t, v, dt.get)).toOption.flatten)
                        (i, if (vs.exists(_.isEmpty)) None else Some(vs.flatten.toSeq))
                      })
                current = current.filter { f =>
                  val perT = perTFor(if (f.spec < 0) specs.cur else f.spec)
                  f.pstats.isEmpty || perT.forall {
                    case (i, Some(vals)) => f.pstats.lift(i).forall {
                      case (lo, hi) => vals.exists(v => v >= lo && v <= hi)
                    }
                    case (_, None) => true
                  }
                }
                // per-file bloom probe on the same runtime values: exact
                // point-lookup skipping where transform ranges are loose
                // (or absent — bloom columns need no transform at all)
                current = GeoBloom.pruneValues(spark, blooms, bloomCols,
                  colName, dt.get, lits, current)
              }
            case _ => ()
          }
        case _ => ()
      }
    }
    if (GeoRowLevel.debug) System.err.println(
      s"[cow] filter on ${System.identityHashCode(this)}: preds=${predicates.map(_.name()).mkString(",")} -> files=${current.length}")
  }

  // -------------------------------------------------------------------
  // Storage-partitioned joins (Iceberg SPJ analog). When every scanned
  // file is SINGLE-VALUED in every layout transform — which clustered
  // writes produce and OPTIMIZE preserves — the scan reports
  // KeyGroupedPartitioning over the transform expressions and tags each
  // input split with its file's partition tuple. Two geo tables
  // co-partitioned on the same transforms then equi-join on those keys
  // with ZERO Exchange (under spark.sql.sources.v2.bucketing.enabled):
  // at fact-fact scale that shuffle is the single biggest avoidable
  // cost. Files without pstats (legacy, or a transform that saw nulls)
  // or straddling several partition values simply disable the report —
  // pruning and reading are unaffected, the join just shuffles as
  // before. DML scans (needFile) keep their runtime-group-filter
  // contract and never report.
  // -------------------------------------------------------------------
  private def layoutIdx: Seq[(GeoPartition.PTransform, Int)] =
    partitions.zipWithIndex.filter(_._1.layout)

  /** The file's partition tuple as catalyst-typed values, or None when
    * the file is not single-valued on some layout transform. Values must
    * carry the TYPE the resolved transform expression evaluates to:
    * LongType for function transforms (every V2 transform function here
    * returns LONG), the column's own type for identity (the long
    * embedding maps back: DATE = epoch days int, TIMESTAMP = micros). */
  private def keyValuesOf(f: FileEntry): Option[Seq[Any]] = {
    // a file written under a RETIRED partition spec has pstats over
    // different transforms entirely — it cannot claim a key tuple in the
    // current spec's key space. Pruning/reading are unaffected; the join
    // shuffles until OPTIMIZE rewrites the stragglers to the new spec.
    if (!specs.isCurrent(f)) return None
    if (f.pstats.length != partitions.length) return None
    // min/max ignore nulls: a file holding nulls plus one value X reads
    // lo==hi==X, but NULL is itself a legal partition value the stats
    // cannot express — require the writer-recorded saw-null flags and
    // refuse any file whose layout-transform source column saw a null
    // (or predates the flag). Pruning is unaffected; the join shuffles.
    if (f.pnulls.length != partitions.length) return None
    val vals = layoutIdx.map { case (t, i) =>
      if (f.pnulls(i)) return None
      val (lo, hi) = f.pstats(i)
      if (lo != hi) return None
      if (t.kind == "identity") tableSchema(t.col).dataType match {
        case org.apache.spark.sql.types.ByteType => lo.toByte
        case org.apache.spark.sql.types.ShortType => lo.toShort
        case org.apache.spark.sql.types.IntegerType => lo.toInt
        case org.apache.spark.sql.types.DateType => lo.toInt
        case _ => lo // LongType, TimestampType
      } else lo
    }
    Some(vals)
  }

  /** (norm(path) -> partition key row, distinct tuple count), when EVERY
    * current file qualifies. */
  private def spjKeys: Option[(Map[String, InternalRow], Int)] = {
    if (needFile || layoutIdx.isEmpty || current.isEmpty) return None
    val snap = current
    val kvs = snap.map(keyValuesOf)
    if (kvs.exists(_.isEmpty)) None
    else {
      val vals = kvs.map(_.get)
      Some((snap.zip(vals).map { case (f, vs) =>
        f.key -> (InternalRow.fromSeq(vs): InternalRow)
      }.toMap, vals.distinct.size))
    }
  }

  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning =
    spjKeys match {
      // This scan also advertises runtime V2 filtering (filterAttributes
      // on the transform source columns), which can shrink the group set
      // AFTER planning; Spark only re-plans that mismatch when
      // pushPartValues is enabled — with bucketing on but pushPartValues
      // off, an SPJ+DPP query fails at execution ("Data source must have
      // preserved the original partitioning during runtime filtering")
      // instead of degrading to a shuffle. Gate the report on the conf
      // pair so the combination degrades gracefully.
      case Some(_) if !org.apache.spark.sql.internal.SQLConf.get
          .v2BucketingPushPartValuesEnabled =>
        new org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning(0)
      case Some((_, distinct)) =>
        val exprs: Seq[org.apache.spark.sql.connector.expressions.Expression] =
          layoutIdx.map { case (t, _) =>
            t.kind match {
              case "identity" => Expressions.identity(t.col)
              case "bucket" => Expressions.bucket(t.n, t.col)
              case "truncate" => Expressions.apply("truncate",
                Expressions.literal(Integer.valueOf(t.n)), Expressions.column(t.col))
              case k => Expressions.apply(k, Expressions.column(t.col))
            }
          }
        new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
          exprs.toArray, distinct)
      case None =>
        new org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning(0)
    }

  // NO caching of the partition plan: Spark probes the batch at PLANNING
  // time (e.g. for columnar support), and the runtime group filter only
  // arrives at EXECUTION time — planInputPartitions must therefore
  // re-snapshot `current` on every call, or it would serve the
  // pre-filter file list frozen at planning. The reader factory is
  // file-list independent (schemas + conf only), so it can come from the
  // original scan.
  private def snapshotBatch(): Batch =
    (if (current eq allFiles) inner0
     else inner0.copy(fileIndex = new InMemoryFileIndex(
       spark, current.map(f => new Path(f.path)), Map.empty, Some(tableSchema)))).toBatch

  override def planInputPartitions(): Array[InputPartition] = {
    val parts = snapshotBatch().planInputPartitions()
    val keyed = spjKeys
    if (keyed.isDefined) {
      // one partition per SPLIT, each tagged with its file's partition
      // tuple; splits sharing a tuple are key-grouped by Spark's
      // BatchScanExec. Also one-file-per-partition, so the MoR/eq/_file
      // reader wrappers keep their per-partition-constant path contract.
      val (keyMap, _) = keyed.get
      val pfs = parts.flatMap(_.asInstanceOf[FilePartition].files)
      val keys = pfs.map(pf => keyMap.get(GeoManifest.norm(pf.filePath.toString)))
      if (keys.forall(_.isDefined))
        return pfs.zipWithIndex.map { case (pf, i) =>
          new GeoKeyedFilePartition(i, Array(pf), keys(i).get): InputPartition
        }
      // a split path missing from the manifest map should be impossible;
      // degrade to the unkeyed plan rather than mis-group
    }
    if (!needFile && deletedPos.isEmpty && eqGroups.isEmpty) parts
    else {
      // one partition per file split => the file path is a per-partition
      // constant (the `_file` column for DML; the sidecar lookup for MoR
      // and equality deletes)
      val pfs = parts.flatMap(_.asInstanceOf[FilePartition].files)
      pfs.zipWithIndex.map { case (pf, i) => FilePartition(i, Array(pf)): InputPartition }
    }
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val f = inner0.toBatch.createReaderFactory()
    // factory chain: parquet -> MoR position merge (drops rowIdx) ->
    // equality-delete filter (drops the extra key cols) -> `_file` append
    val afterMor: PartitionReaderFactory =
      if (deletedPos.isEmpty) f
      else {
        // row-based only while a scanned file actually has deleted rows
        // (a ColumnarBatch admits no row selection); if pruning dropped
        // every sidecar'd file, batches stay vectorized minus the index col
        val morActive = current.exists(f => deletedPos.contains(f.key))
        GeoMorReaderFactory(f, deletedPos, inner0.readSchema(), morActive)
      }
    val postMorSchema = StructType(inner0.readSchema().fields
      .filterNot(_.name == ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME))
    val afterEq: PartitionReaderFactory =
      if (eqGroups.isEmpty) afterMor
      else {
        val eqActive = current.exists(f =>
          eqApplicableByKey.get(f.key).exists(_.nonEmpty))
        GeoEqReaderFactory(afterMor, postMorSchema, eqGroups, extraEqCols,
          eqApplicableByKey, eqActive)
      }
    if (needFile) GeoAppendFileReaderFactory(afterEq) else afterEq
  }

  // keep the inner parquet description: PushedFilters / ReadSchema stay
  // visible in explain output exactly as on the plain read path
  override def description(): String =
    s"GeoCowScan(files=${current.length}, needFile=$needFile) ${inner0.description()}"
}

/** A parquet file split carrying its file's partition-transform tuple —
  * what lets Spark key-group the scan's output for storage-partitioned
  * joins. IS-A [[FilePartition]] so every downstream reader factory
  * (vectorized parquet, the MoR/eq/_file wrappers) treats it exactly as
  * the stock split. */
class GeoKeyedFilePartition(
    index0: Int,
    files0: Array[org.apache.spark.sql.execution.datasources.PartitionedFile],
    key: InternalRow)
  extends FilePartition(index0, files0) with HasPartitionKey {
  override def partitionKey(): InternalRow = key
}

/** Wraps the parquet reader factory to append the row's file path as the
  * trailing `_file` column — the path is constant per partition by
  * construction (one split per file). Columnar reads stay on the
  * vectorized parquet reader: each batch gets a `ConstantColumnVector`
  * appended (the same mechanism Spark uses for its own constant metadata
  * columns), so DML rewrite scans never fall back to row-based IO. */
case class GeoAppendFileReaderFactory(inner: PartitionReaderFactory)
  extends PartitionReaderFactory {

  private def pathOf(p: InputPartition): String =
    p.asInstanceOf[FilePartition].files.head.filePath.toString

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val r = inner.createReader(p)
    new PartitionReader[InternalRow] {
      private val joined = new JoinedRow
      private val suffix = InternalRow(UTF8String.fromString(pathOf(p)))
      override def next(): Boolean = r.next()
      override def get(): InternalRow = joined(r.get(), suffix)
      override def close(): Unit = r.close()
    }
  }

  override def createColumnarReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    val r = inner.createColumnarReader(p)
    val pathUtf8 = UTF8String.fromString(pathOf(p))
    new PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
      override def next(): Boolean = r.next()
      override def get(): org.apache.spark.sql.vectorized.ColumnarBatch = {
        val b = r.get()
        val const = new org.apache.spark.sql.execution.vectorized.ConstantColumnVector(
          b.numRows(), StringType)
        const.setUtf8String(pathUtf8)
        val cols = Array.tabulate[org.apache.spark.sql.vectorized.ColumnVector](
          b.numCols() + 1)(i => if (i < b.numCols()) b.column(i) else const)
        new org.apache.spark.sql.vectorized.ColumnarBatch(cols, b.numRows())
      }
      override def close(): Unit = r.close()
    }
  }

  override def supportColumnarReads(p: InputPartition): Boolean =
    inner.supportColumnarReads(p)
}

/**
 * Merge-on-read scan wrapper: the inner parquet reader emits the table
 * columns plus the generated row-index column; rows whose (file,
 * row-ordinal) appear in a delete sidecar are dropped, and the index
 * column is projected away. Partitions are one file split each, so the
 * sidecar lookup is resolved once per partition; files without deleted
 * rows pay only the projection. When NO scanned file has deletions
 * (`morActive` false — pruning dropped every sidecar'd file) reads stay
 * columnar and the wrapper just rebuilds batches without the index
 * vector.
 */
case class GeoMorReaderFactory(inner: PartitionReaderFactory,
                               deleted: Map[String, Array[Long]],
                               innerSchema: StructType,
                               morActive: Boolean)
  extends PartitionReaderFactory {

  private val idxOrd = innerSchema.fieldIndex(
    ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME)

  private def pathOf(p: InputPartition): String =
    p.asInstanceOf[FilePartition].files.head.filePath.toString

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val dels = deleted.getOrElse(GeoManifest.norm(pathOf(p)), Array.empty[Long])
    val r = inner.createReader(p)
    val keep = innerSchema.fields.indices.filterNot(_ == idxOrd)
    val proj = UnsafeProjection.create(keep.map(i =>
      BoundReference(i, innerSchema(i).dataType, innerSchema(i).nullable)).toArray)
    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      override def next(): Boolean = {
        while (r.next()) {
          val row = r.get()
          if (dels.isEmpty ||
              java.util.Arrays.binarySearch(dels, row.getLong(idxOrd)) < 0) {
            cur = row; return true
          }
        }
        false
      }
      override def get(): InternalRow = proj(cur)
      override def close(): Unit = r.close()
    }
  }

  override def createColumnarReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    val r = inner.createColumnarReader(p)
    new PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
      override def next(): Boolean = r.next()
      override def get(): org.apache.spark.sql.vectorized.ColumnarBatch = {
        val b = r.get()
        val cols = innerSchema.fields.indices.filterNot(_ == idxOrd)
          .map(b.column).toArray
        new org.apache.spark.sql.vectorized.ColumnarBatch(cols, b.numRows())
      }
      override def close(): Unit = r.close()
    }
  }

  override def supportColumnarReads(p: InputPartition): Boolean =
    !morActive && inner.supportColumnarReads(p)
}

/** One equality-delete sidecar loaded for the scan: its commit version,
  * key column names, and the key tuples as UnsafeRows cast to the table
  * column types (byte-layout-identical to the reader's key projection
  * output, so membership is a raw-bytes hash probe). */
case class GeoEqGroup(version: Int, cols: Seq[String], keys: Array[InternalRow])

/**
 * Equality-delete scan wrapper: drops rows whose key tuple appears in a
 * sidecar that APPLIES to the partition's file (sidecar version > file's
 * data sequence number), then projects away any key columns the query
 * didn't ask for. Partitions are one file split each, so applicability
 * resolves once per partition; files no live sidecar applies to (fresh
 * appends) pass through — columnar reads included when no key columns
 * had to be force-read.
 */
case class GeoEqReaderFactory(inner: PartitionReaderFactory,
                              innerSchema: StructType,
                              groups: Seq[GeoEqGroup],
                              extraCols: Seq[String],
                              applicableByKey: Map[String, Array[Int]],
                              eqActive: Boolean)
  extends PartitionReaderFactory {

  private def pathOf(p: InputPartition): String =
    p.asInstanceOf[FilePartition].files.head.filePath.toString

  // per-file applicable set precomputed driver-side (sequence number +
  // key-range pruning); a file absent from the map conservatively probes
  // every group
  private def applicable(p: InputPartition): Seq[GeoEqGroup] =
    applicableByKey.get(GeoManifest.norm(pathOf(p))) match {
      case Some(idx) => idx.toSeq.map(groups)
      case None => groups
    }

  private val keepOrds: Seq[Int] =
    innerSchema.fields.indices.filterNot(i => extraCols.contains(innerSchema(i).name))
  private def outProj: UnsafeProjection = UnsafeProjection.create(keepOrds.map(i =>
    BoundReference(i, innerSchema(i).dataType, innerSchema(i).nullable)).toArray)

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val r = inner.createReader(p)
    val app = applicable(p)
    if (app.isEmpty && extraCols.isEmpty) return r
    // per-group: a projection of the row's key tuple + a byte-hash set of
    // deleted tuples. A row with a null key column projects to a tuple no
    // set contains (sidecars are null-free) — equality never matches null.
    val probes = app.map { g =>
      val proj = UnsafeProjection.create(g.cols.map { c =>
        val i = innerSchema.fieldIndex(c)
        BoundReference(i, innerSchema(i).dataType, innerSchema(i).nullable)
          : org.apache.spark.sql.catalyst.expressions.Expression
      }.toArray)
      val set = new java.util.HashSet[InternalRow](g.keys.length * 2)
      g.keys.foreach(set.add)
      (proj, set)
    }
    val proj = outProj
    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      override def next(): Boolean = {
        while (r.next()) {
          val row = r.get()
          if (!probes.exists { case (kp, set) => set.contains(kp(row)) }) {
            cur = proj(row); return true
          }
        }
        false
      }
      override def get(): InternalRow = cur
      override def close(): Unit = r.close()
    }
  }

  override def createColumnarReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    inner.createColumnarReader(p)

  // uniform across the scan (Spark rejects mixed row/columnar partition
  // sets): columnar only when NO scanned file has an applicable delete
  override def supportColumnarReads(p: InputPartition): Boolean =
    !eqActive && extraCols.isEmpty && inner.supportColumnarReads(p)
}

/** Per-file stats accumulated INLINE by the data writer as rows stream
  * through (the Iceberg write-side stats model): geometry bbox and
  * per-partition-transform min/max. Eliminates the post-write stats
  * read-back scan — at ingest scale that read-back doubles write I/O. */
case class GeoFileStats(xmin: Double, ymin: Double, xmax: Double, ymax: Double,
                        pmins: Array[Long], pmaxs: Array[Long],
                        pSeen: Array[Boolean],
                        pNull: Array[Boolean] = Array.empty)

/** Commit message: one written parquet file, its row count, and (when the
  * writer factory carried stats expressions) the inline file stats. */
case class GeoCowCommitMessage(path: String, rows: Long,
                               stats: Option[GeoFileStats] = None)
  extends WriterCommitMessage

/** A rolling writer's task message: several files from one task (one per
  * partition-transform tuple the sorted input streamed through). */
case class GeoCowTaskCommitMessage(files: Seq[GeoCowCommitMessage])
  extends WriterCommitMessage

object GeoCowCommitMessage {
  /** Per-file messages regardless of task packing — every commit/abort
    * path consumes writer output through this. */
  def flatten(messages: Iterable[WriterCommitMessage]): Seq[GeoCowCommitMessage] =
    messages.iterator.flatMap {
      case m: GeoCowCommitMessage => Iterator.single(m)
      case GeoCowTaskCommitMessage(fs) => fs.iterator
      case _ => Iterator.empty
    }.toSeq
}

/**
 * The ReplaceData write: executors write replacement parquet via Spark's
 * own ParquetOutputWriter; the driver commit collects per-file stats and
 * swaps the scanned files for the new ones in ONE optimistic manifest
 * commit. Rows arriving with extra metadata columns (e.g. `_file`) are
 * projected down to the table schema by name.
 */
class GeoCowBatchWrite(root: String, incoming: StructType,
                       scanned: () => Option[Seq[FileEntry]],
                       cmd: RowLevelOperation.Command = RowLevelOperation.Command.UPDATE,
                       base: Manifest = null)
  extends BatchWrite {

  private def spark: SparkSession = SparkSession.active
  // the operation's shared snapshot when it provides one; commit-time
  // conflict validation always re-reads fresh regardless
  private val m: Manifest =
    if (base != null) base else GeoManifest.read(spark, root)
  private val commitDir = s"$root/data/c${java.util.UUID.randomUUID().toString.take(12)}"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val dataIdx = m.schema.fields.map(f => incoming.fieldIndex(f.name))
    val job = Job.getInstance(spark.sparkContext.hadoopConfiguration)
    val owf = graft.sources.GeoParquetMeta.prepareWrite(spark, job, m.schema, m.geomCol)
    GeoManifest.fs(spark, root).mkdirs(new Path(commitDir))
    val (se, hasBbox) = GeoManifest.boundStatsExprs(spark, m.schema, m.geomCol, m.partitions)
    // the write's requiredDistribution/Ordering (see GeoRowLevelOperation)
    // delivers rows sorted by the layout transforms: rolling at tuple
    // boundaries keeps DML output single-valued, preserving SPJ
    GeoCowDataWriterFactory(owf, new SerializableConfiguration(job.getConfiguration),
      commitDir, m.schema, incoming, dataIdx, statsExprs = se, statsHasBbox = hasBbox,
      rollIdx = m.partitions.zipWithIndex.filter(_._1.layout).map(_._2).toArray,
      rollMinRows = GeoRowLevel.rollMinRows(spark),
      checks = GeoManifest.boundCheckExprs(spark, m.schema, m.checks))
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    if (GeoRowLevel.debug) System.err.println(
      s"[cow] commit: scanned=${scanned().map(_.length)} written=${messages.length}")
    val entries0 = GeoManifest.entriesFromMessages(spark, m.schema,
      GeoCowCommitMessage.flatten(messages),
      m.geomCol, m.partitions)
    val fresh = GeoManifest.read(spark, root)
    // a concurrent SET PARTITIONED BY between scan and commit must not
    // mis-attribute these entries' stats to the new spec (this commit
    // tolerates concurrent non-conflicting committers by design)
    val entries = GeoManifest.alignSpec(entries0, m, fresh)
    // a constraint ADDed since plan time never reached the writers —
    // re-validate just the replacement files against it before the swap
    GeoTable.revalidateNewChecks(spark, fresh, m.checks, entries,
      s"this ${cmd.toString.toLowerCase}")
    val replaced = scanned().map(_.map(_.key).toSet)
      .getOrElse(fresh.files.map(_.key).toSet)
    // Write-conflict validation (the Iceberg CoW rule): every file this
    // operation SCANNED must still be live. A concurrent committer that
    // rewrote one of them (its own UPDATE/DELETE/compact) already
    // re-homed those rows — carrying its new files over AND adding our
    // rewrite of the old ones would silently duplicate rows. Concurrent
    // APPENDS are fine: their files are untouched-by-us and carry over.
    val live = fresh.files.map(_.key).toSet
    val gone = replaced.diff(live)
    if (gone.nonEmpty)
      throw new java.util.ConcurrentModificationException(
        s"row-level operation on $root scanned ${gone.size} file(s) that a concurrent " +
          s"commit replaced (e.g. ${gone.head}); re-run the statement against the new snapshot")
    // MoR sidecar upkeep: positions pointing into replaced files are
    // spent (the rewrite read the MERGED view, so those hidden rows are
    // gone for good); entries on untouched files must survive. A sidecar
    // parquet can mix both, so survivors are compacted into one fresh
    // sidecar rather than trusting per-file bookkeeping.
    val (keptDeletes, hiddenInReplaced) =
      if (fresh.deletes.isEmpty) (fresh.deletes, 0L)
      else {
        val pairs = spark.read.parquet(fresh.deletes.map(_.path): _*)
          .select("file_path", "pos").collect()
          .map(r => (r.getString(0), r.getLong(1)))
        val (spent, live) = pairs.partition(p => replaced.contains(GeoManifest.norm(p._1)))
        if (spent.isEmpty) (fresh.deletes, 0L)
        else if (live.isEmpty) (Seq.empty[GeoManifest.DeleteEntry], spent.length.toLong)
        else {
          val dir = s"$root/data/d${java.util.UUID.randomUUID().toString.take(12)}"
          val sp = spark
          import sp.implicits._
          live.toSeq.toDF("file_path", "pos").coalesce(1).write.parquet(dir)
          val es = GeoManifest.listParquet(spark, dir).map(p =>
            GeoManifest.DeleteEntry(p, live.length.toLong))
          (es, spent.length.toLong)
        }
      }
    // CoW UPDATE rewrites every VISIBLE row of every replaced file —
    // written total must equal the replaced files' rows minus their
    // MoR-hidden rows exactly. Catches any future scan-identification bug
    // (writing a narrowed subset while replacing the full file set would
    // silently drop rows) before the swap.
    if (cmd == RowLevelOperation.Command.UPDATE) {
      val replacedRows = fresh.files.filter(f => replaced.contains(f.key)).map(_.rows).sum
      val writtenRows = GeoCowCommitMessage.flatten(messages).map(_.rows).sum
      if (writtenRows != replacedRows - hiddenInReplaced)
        throw new IllegalStateException(
          s"UPDATE on $root wrote $writtenRows row(s) but is replacing files holding " +
            s"${replacedRows - hiddenInReplaced} visible row(s) — scan/replace mismatch, " +
            "refusing to commit")
    }
    val untouched = fresh.files.filterNot(f => replaced.contains(f.key))
    GeoManifest.commit(spark, root,
      fresh.copy(version = fresh.version + 1, files = untouched ++ entries,
        deletes = keptDeletes), fresh.version,
      op = cmd.toString.toLowerCase)
    // zero-row replacement files never enter the manifest; drop them now
    // rather than leaving unreferenced garbage for vacuum. Best-effort:
    // the manifest swap above already succeeded, so a transient FS error
    // here must NOT surface as a commit failure (Spark would abort() and
    // delete live data) — leftovers are vacuum's job.
    try {
      val kept = entries.map(_.key).toSet
      val fs = GeoManifest.fs(spark, root)
      GeoCowCommitMessage.flatten(messages).collect { case m if m.rows == 0 => m.path }
        .foreach(p => if (!kept.contains(GeoManifest.norm(p))) fs.delete(new Path(p), false))
    } catch { case scala.util.control.NonFatal(_) => () }
  }

  /** Abort must never destroy committed data: if the manifest swap
    * already went through (abort fired by a post-commit failure), files
    * under commitDir are live table rows. Re-read the manifest and only
    * remove what it does not reference. */
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

/** `statsExprs` (bound against the TABLE schema; see
  * [[GeoManifest.boundStatsExprs]]) turn the writer into the stats
  * collector: bbox + transform ranges accumulate inline as rows stream
  * through, so the commit needs no read-back scan of the new files.
  *
  * `rollIdx` (indices into the transform section of `statsExprs`) turns
  * the writer into a PARTITIONED writer: because transform-clustered
  * writes deliver rows sorted by the layout transforms, closing the
  * current file and opening the next whenever the tuple changes yields
  * files SINGLE-VALUED in every layout transform — the property that
  * lets the scan report KeyGroupedPartitioning for storage-partitioned
  * joins (the Iceberg fanout-writer analog, without the fanout: sorted
  * input needs only one open file). Two guards keep file counts sane
  * when partitions are small relative to the data: `rollCap` bounds
  * files-per-task outright, and `rollMinRows` skips a tuple boundary
  * while the open file is still tiny (a days-partitioned table with a
  * handful of rows per day keeps writing task-sized files — it simply
  * does not report SPJ until its partitions carry real volume, which at
  * production scale they do). */
case class GeoCowDataWriterFactory(owf: OutputWriterFactory,
                                   conf: SerializableConfiguration,
                                   dir: String, tableSchema: StructType,
                                   incoming: StructType, dataIdx: Array[Int],
                                   tag: String = "",
                                   statsExprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression] = Seq.empty,
                                   statsHasBbox: Boolean = false,
                                   rollIdx: Array[Int] = Array.empty,
                                   rollCap: Int = 64,
                                   rollMinRows: Long = 4096L,
                                   checks: Seq[(String, org.apache.spark.sql.catalyst.expressions.Expression)] = Seq.empty)
  extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val ctx = new TaskAttemptContextImpl(conf.value,
        new TaskAttemptID("graft", 0, TaskType.MAP, partitionId, (taskId % Int.MaxValue).toInt))
      // project by name when the incoming rows carry metadata columns
      private val proj =
        if (dataIdx.length == incoming.length && dataIdx.zipWithIndex.forall { case (a, b) => a == b }) null
        else UnsafeProjection.create(dataIdx.map(i =>
          BoundReference(i, incoming(i).dataType, incoming(i).nullable)))

      // inline stats machinery (only when statsExprs were supplied)
      private val statsProj =
        if (statsExprs.isEmpty) null else UnsafeProjection.create(statsExprs)

      // CHECK constraints: one compiled projection over every predicate,
      // evaluated on the projected (table-schema-order) row. SQL
      // semantics — only FALSE violates, UNKNOWN (null) passes.
      private val checkProj =
        if (checks.isEmpty) null else UnsafeProjection.create(checks.map(_._2))
      private val nT = statsExprs.length - (if (statsHasBbox) 1 else 0)
      private val base = if (statsHasBbox) 1 else 0

      // per-FILE state — reset on every roll
      private var fileNo = 0
      private var path: String = null
      private var writer: org.apache.spark.sql.execution.datasources.OutputWriter = null
      private var n = 0L
      private var bx0 = 0.0; private var by0 = 0.0
      private var bx1 = 0.0; private var by1 = 0.0
      private var seenGeom = false
      private val pmins = Array.fill(math.max(nT, 0))(Long.MaxValue)
      private val pmaxs = Array.fill(math.max(nT, 0))(Long.MinValue)
      private val pSeen = new Array[Boolean](math.max(nT, 0))
      private val pNull = new Array[Boolean](math.max(nT, 0))

      private val done = scala.collection.mutable.ListBuffer.empty[GeoCowCommitMessage]

      // rolling state: the previous row's layout-transform tuple
      private val rollOn = rollIdx.nonEmpty && statsProj != null
      private val prevVals = new Array[Long](rollIdx.length)
      private val prevNull = new Array[Boolean](rollIdx.length)
      private var havePrev = false

      private def openFile(): Unit = {
        // `tag` disambiguates reuse of (partitionId, taskId) across epochs
        // when the factory serves a streaming write; file 0 keeps the
        // historical name, rolled files append -r<n>
        path = f"$dir/part-$partitionId%05d-$taskId$tag" +
          (if (fileNo == 0) "" else s"-r$fileNo") + ".parquet"
        writer = owf.newInstance(path, tableSchema, ctx)
        n = 0L
        bx0 = Double.PositiveInfinity; by0 = Double.PositiveInfinity
        bx1 = Double.NegativeInfinity; by1 = Double.NegativeInfinity
        seenGeom = false
        java.util.Arrays.fill(pmins, Long.MaxValue)
        java.util.Arrays.fill(pmaxs, Long.MinValue)
        java.util.Arrays.fill(pSeen, false)
        java.util.Arrays.fill(pNull, false)
      }
      openFile()

      private def closeFile(): Unit = {
        writer.close()
        val stats =
          if (statsProj == null) None
          else Some(GeoFileStats(
            if (seenGeom) bx0 else Double.NaN, if (seenGeom) by0 else Double.NaN,
            if (seenGeom) bx1 else Double.NaN, if (seenGeom) by1 else Double.NaN,
            pmins.clone(), pmaxs.clone(), pSeen.clone(), pNull.clone()))
        done += GeoCowCommitMessage(path, n, stats)
        fileNo += 1
      }

      override def write(row: InternalRow): Unit = {
        val out = if (proj == null) row else proj(row)
        if (checkProj != null) {
          val cv = checkProj(out)
          var ci = 0
          while (ci < checks.length) {
            if (!cv.isNullAt(ci) && !cv.getBoolean(ci))
              throw new IllegalArgumentException(
                s"CHECK constraint '${checks(ci)._1}' violated by an incoming row " +
                  s"(${checks(ci)._2.sql}); the write aborts, nothing committed")
            ci += 1
          }
        }
        val st = if (statsProj == null) null else statsProj(out)
        if (rollOn) {
          var changed = false
          var j = 0
          while (j < rollIdx.length) {
            val idx = base + rollIdx(j)
            val isNull = st.isNullAt(idx)
            val v = if (isNull) 0L else st.getLong(idx)
            if (havePrev && (isNull != prevNull(j) || (!isNull && v != prevVals(j))))
              changed = true
            prevNull(j) = isNull; prevVals(j) = v
            j += 1
          }
          havePrev = true
          if (changed && n >= rollMinRows && fileNo < rollCap - 1) {
            closeFile(); openFile()
          }
        }
        writer.write(out)
        n += 1
        if (st != null) {
          if (statsHasBbox && !st.isNullAt(0)) {
            val b = st.getStruct(0, 4)
            if (b.getDouble(0) < bx0) bx0 = b.getDouble(0)
            if (b.getDouble(1) < by0) by0 = b.getDouble(1)
            if (b.getDouble(2) > bx1) bx1 = b.getDouble(2)
            if (b.getDouble(3) > by1) by1 = b.getDouble(3)
            seenGeom = true
          }
          var j = 0
          while (j < nT) {
            if (!st.isNullAt(base + j)) {
              val v = st.getLong(base + j)
              if (v < pmins(j)) pmins(j) = v
              if (v > pmaxs(j)) pmaxs(j) = v
              pSeen(j) = true
            } else pNull(j) = true
            j += 1
          }
        }
      }
      override def commit(): WriterCommitMessage = {
        closeFile()
        if (done.size == 1) done.head else GeoCowTaskCommitMessage(done.toSeq)
      }
      override def abort(): Unit = {
        try writer.close() catch { case scala.util.control.NonFatal(_) => () }
        val fs = new Path(path).getFileSystem(conf.value)
        (done.map(_.path) :+ path).distinct.foreach { p =>
          try fs.delete(new Path(p), false)
          catch { case scala.util.control.NonFatal(_) => () }
        }
      }
      override def close(): Unit = ()
    }
}
