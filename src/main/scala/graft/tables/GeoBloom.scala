package graft.tables

import graft.tables.GeoManifest.{FileEntry, Manifest}

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, EqualTo, Expression, In, Literal}
import org.apache.spark.sql.functions.{broadcast, col, input_file_name, lower}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/**
 * Per-file bloom filters for point-lookup file skipping — the capability
 * Iceberg gets from parquet bloom filters / puffin index files (the
 * reference's Iceberg tables inherit it via write.parquet.bloom-filter-*
 * table properties). Min/max stats prune RANGE predicates, but a point
 * lookup (`id = x`, `id IN (...)`) on a high-cardinality column the
 * layout does NOT cluster by hits every file's [min,max] envelope — at
 * 100 TB that is a full-table scan for one row. A per-file bloom answers
 * "might this file contain value v" in O(1) with no IO against the data
 * file, so the scan opens only the handful of files that can match.
 *
 * Mechanics, manifest-first like everything else in GeoTable:
 *  - `TBLPROPERTIES('bloom.columns'='id[,c2]')` (CREATE or ALTER ... SET)
 *    records [[BloomSpec]]s in the manifest (`bloomspec` lines).
 *  - Every commit that adds data files runs ONE distributed pass over
 *    JUST the fresh files (column-pruned to the bloom columns), builds a
 *    bloom per (file, column), and writes them as an immutable parquet
 *    sidecar under `data/` referenced by a `bloom` manifest line — the
 *    commit stays O(changed files), never O(table).
 *  - Scans consult the blooms for `=`/`IN` conjuncts on bloom columns
 *    (driver-side, sidecars memoized via [[GeoSidecarCache]]) and drop
 *    files no probed value can be in; runtime V2 filters (dynamic
 *    partition pruning's IN values) get the same check. A file without a
 *    bloom is always kept — the conservative direction, so legacy files,
 *    aborted builds and renamed columns degrade to no-prune, never to
 *    row loss.
 *  - Sidecars accumulate one per commit; past `bloom.maxSidecars` the
 *    next commit folds the live rows into one sidecar (same maintenance
 *    discipline as the delete-sidecar fold).
 *
 * Values hash through the SAME long embedding the partition transforms
 * use (`GeoPartition.valueOf` identity semantics: DATE = epoch days,
 * TIMESTAMP = micros), strings hash as UTF-8 — so the build side (a
 * column scan) and the probe side (a pushed literal) agree exactly.
 * NULL never enters a bloom: `c = NULL` is never a pushable filter, and
 * IS NULL prunes via the transform null flags, not here.
 *
 * Scale envelope: blooms AUTO-SIZE from each file's row count (items=0,
 * the default — a fixed size silently saturates on bigger files and a
 * saturated bloom prunes nothing), ~0.9 MB per million rows at the
 * default 3% fpp — ~0.2% of a 512 MB data file. At or under
 * `bloom.maxProbeFiles` candidates the probe runs on the DRIVER over
 * memoized sidecars; past it the probe goes DISTRIBUTED ([[pruneBig]]:
 * one planning-time job over the sidecar bytes, candidate-filtered,
 * only excluded file keys return) — the 100k-file point lookup is the
 * very case blooms exist for and must not silently lose them.
 */
object GeoBloom {

  /** Bloom configuration for one column (manifest `bloomspec` line).
    * `items` = expected distinct values per FILE; 0 = auto-size from each
    * file's actual row count — the default, because a fixed size silently
    * SATURATES on files with more rows (a saturated bloom answers "maybe"
    * for everything: zero pruning, no error) while auto keeps the fpp
    * contract at any file size (~0.9 MB per million rows at 3%). */
  final case class BloomSpec(col: String, fpp: Double, items: Long)

  /** One immutable bloom sidecar: parquet rows (file, col, bloom bytes)
    * covering the data files fresh in the commit that wrote it. */
  final case class BloomEntry(path: String, cols: Seq[String]) {
    lazy val key: String = GeoManifest.norm(path)
  }

  def fppDefault(spark: SparkSession): Double =
    spark.conf.get("spark.graft.bloom.fpp", "0.03").toDouble
  def itemsDefault(spark: SparkSession): Long =
    spark.conf.get("spark.graft.bloom.items", "0").toLong // 0 = per-file auto
  def maxSidecars(spark: SparkSession): Int =
    spark.conf.get("spark.graft.bloom.maxSidecars", "64").toInt
  def maxProbeFiles(spark: SparkSession): Int =
    spark.conf.get("spark.graft.bloom.maxProbeFiles", "4096").toInt

  /** Column types a bloom can index: anything with the ordered long
    * embedding (integral/date/timestamp) plus strings. */
  def supports(dt: DataType): Boolean =
    GeoPartition.supports("stats", dt) || dt == StringType

  /** TBLPROPERTIES('bloom.columns'='a,b'[, 'bloom.fpp'=.., 'bloom.items'=..])
    * → validated specs. Empty string disables. fpp/items accept either
    * ONE value (applies to every column) or a comma list aligned with
    * bloom.columns — the exact form SHOW TBLPROPERTIES prints when
    * per-column knobs diverge, so displayed properties always re-apply
    * via ALTER ... SET TBLPROPERTIES. */
  def parseSpecs(spark: SparkSession, schema: StructType, colsProp: String,
                 fppProp: Option[String], itemsProp: Option[String]): Seq[BloomSpec] = {
    val cols = colsProp.split(',').map(_.trim).filter(_.nonEmpty).toSeq
    def aligned[A](prop: Option[String], name: String, default: => A,
                   parse: String => A): Seq[A] = prop match {
      case None => Seq.fill(cols.length)(default)
      case Some(raw) =>
        val vs = raw.split(',').map(_.trim).filter(_.nonEmpty).toSeq.map(parse)
        if (vs.length == 1) Seq.fill(cols.length)(vs.head)
        else {
          require(vs.length == cols.length,
            s"$name: ${vs.length} values for ${cols.length} bloom.columns — " +
              "give one value or a comma list aligned with bloom.columns")
          vs
        }
    }
    val fpps = aligned(fppProp, "bloom.fpp", fppDefault(spark), _.toDouble)
    fpps.foreach(f => require(f > 0.0 && f < 1.0, s"bloom.fpp must be in (0, 1), got $f"))
    val itemss = aligned(itemsProp, "bloom.items", itemsDefault(spark), _.toLong)
    itemss.foreach(i =>
      require(i >= 0, s"bloom.items must be >= 0 (0 = auto per-file), got $i"))
    cols.zipWithIndex.map { case (c, i) =>
      val f = schema.fields.find(_.name.equalsIgnoreCase(c)).getOrElse(
        throw new IllegalArgumentException(s"bloom.columns: '$c' is not a table column"))
      require(supports(f.dataType),
        s"bloom.columns: '$c' (${f.dataType.simpleString}) — blooms need an " +
          "integral/date/timestamp/string column")
      BloomSpec(f.name, fpps(i), itemss(i))
    }
  }

  // -------------------------------------------------------------------
  // Build (commit-time, fresh files only)
  // -------------------------------------------------------------------

  /** The commit hook (called by GeoManifest's write paths): build a bloom
    * sidecar for this manifest's FRESH files (addedAt sentinel), then
    * fold the sidecar list when it has grown past the cap. No-op for
    * tables without bloom columns. */
  private[tables] def withBlooms(spark: SparkSession, root: String, m: Manifest): Manifest = {
    if (m.bloomCols.isEmpty) return m
    val fresh = m.files.filter(f => f.addedAt < 0 && f.rows > 0)
    val m1 = build(spark, root, m.schema, fresh, m.bloomCols) match {
      case Some(e) => m.copy(blooms = m.blooms :+ e)
      case None => m
    }
    foldIfNeeded(spark, root, m1)
  }

  /** One distributed pass over `files` (column-pruned to the bloom
    * columns), a bloom per (file, column), one parquet sidecar out.
    * Partial per-partition blooms merge by OR — same parameters, so
    * [[BloomFilter.mergeInPlace]] is exact. */
  private[tables] def build(spark: SparkSession, root: String, schema: StructType,
                            files: Seq[FileEntry],
                            specs: Seq[BloomSpec]): Option[BloomEntry] = {
    if (files.isEmpty || specs.isEmpty) return None
    val cols = specs.filter(s => schema.fields.exists(f =>
      f.name.equalsIgnoreCase(s.col) && supports(f.dataType)))
    if (cols.isEmpty) return None
    val isStr: Array[Boolean] = cols.map(s =>
      schema.fields.find(_.name.equalsIgnoreCase(s.col)).get.dataType == StringType).toArray
    val selects = input_file_name().as("__graft_file") +: cols.zipWithIndex.map { case (s, i) =>
      val f = schema.fields.find(_.name.equalsIgnoreCase(s.col)).get
      val c = if (isStr(i)) col(f.name)
              else GeoPartition.transformCol(GeoPartition.PTransform("stats", 0, f.name), schema)
      c.as(s"__graft_b$i")
    }
    val df = spark.read.schema(schema).parquet(files.map(_.path): _*).select(selects: _*)
    val n = cols.length
    val fpps: Array[Double] = cols.map(_.fpp).toArray
    val items: Array[Long] = cols.map(_.items).toArray
    val colNames: Array[String] = cols.map(_.col).toArray
    // items = 0 (auto): size each file's bloom from ITS row count, known
    // from the manifest entries — a fixed size saturates on bigger files
    // (answers "maybe" for everything), auto keeps the fpp contract
    val fileRows: Map[String, Long] = files.map(f => f.key -> math.max(f.rows, 64L)).toMap
    val pairs = df.queryExecution.toRdd.mapPartitions { it =>
      val acc = scala.collection.mutable.HashMap.empty[(String, Int), BloomFilter]
      it.foreach { r =>
        val fkey = r.getUTF8String(0).toString
        var i = 0
        while (i < n) {
          if (!r.isNullAt(i + 1)) {
            val bf = acc.getOrElseUpdate((fkey, i), {
              val expected =
                if (items(i) > 0) items(i)
                else fileRows.getOrElse(GeoManifest.norm(fkey), 1L << 20)
              BloomFilter.create(expected, fpps(i))
            })
            if (isStr(i)) bf.putString(r.getUTF8String(i + 1).toString)
            else bf.putLong(r.getLong(i + 1))
          }
          i += 1
        }
      }
      acc.iterator.map { case (k, bf) => (k, serialize(bf)) }
    }.reduceByKey { (a, b) =>
      val bf = deserialize(a)
      bf.mergeInPlace(deserialize(b))
      serialize(bf)
    }.map { case ((f, i), bytes) => Row(GeoManifest.norm(f), colNames(i), bytes) }
    val out = spark.createDataFrame(pairs, sidecarSchema).coalesce(1)
    val dir = s"$root/data/bl${java.util.UUID.randomUUID().toString.take(12)}"
    out.write.parquet(dir)
    val written = GeoManifest.listParquet(spark, dir)
    // zero matching rows (all-null bloom columns) still writes an empty
    // part file — a valid, trivially conservative sidecar
    written.headOption.map(p => BloomEntry(p, cols.map(_.col)))
  }

  private val sidecarSchema = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("col", StringType, nullable = false),
    StructField("bloom", BinaryType, nullable = false)))

  private def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  private[tables] def deserialize(b: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(b))

  /** Fold the sidecar list into one when it passed the cap: keep only
    * rows for files still in the manifest and columns still configured
    * (dead rows from compacted/deleted files drop here — the analog of
    * the delete-sidecar fold). Old sidecars stay on disk for time travel
    * until vacuum expires their referencing snapshots. */
  private def foldIfNeeded(spark: SparkSession, root: String, m: Manifest): Manifest = {
    if (m.blooms.length <= maxSidecars(spark)) return m
    import spark.implicits._
    val liveCols = m.bloomCols.map(_.col.toLowerCase)
    val live = m.files.map(_.key).toDF("file")
    val folded = spark.read.parquet(m.blooms.map(_.path): _*)
      .where(lower(col("col")).isin(liveCols: _*))
      .join(broadcast(live), "file")
    val dir = s"$root/data/bl${java.util.UUID.randomUUID().toString.take(12)}"
    folded.coalesce(1).write.parquet(dir)
    val entries = GeoManifest.listParquet(spark, dir)
      .map(p => BloomEntry(p, m.bloomCols.map(_.col)))
    m.copy(blooms = entries)
  }

  // -------------------------------------------------------------------
  // Probe (scan planning + runtime filtering)
  // -------------------------------------------------------------------

  /** A probe value in bloom space: Right(long embedding) or Left(string). */
  private type Probe = Either[String, Long]

  private def canonical(v: Any, dt: DataType): Option[Probe] = dt match {
    case StringType => v match {
      case null => None
      case u: UTF8String => Some(Left(u.toString))
      case s: String => Some(Left(s))
      case _ => None
    }
    case _ =>
      GeoPartition.valueOf(GeoPartition.PTransform("stats", 0, "c"), v, dt).map(Right(_))
  }

  private def mightContain(bf: BloomFilter, p: Probe): Boolean = p match {
    case Left(s) => bf.mightContainString(s)
    case Right(l) => bf.mightContainLong(l)
  }

  /** Probe lists per bloom column (lowercased) from pushed catalyst
    * filters — `=`/`IN` conjuncts with fully-literal value lists only;
    * anything else proves nothing (keeping files is always correct). */
  private def probesOf(bloomCols: Seq[BloomSpec], schema: StructType,
                       filters: Seq[Expression]): Map[String, Seq[Probe]] = {
    if (bloomCols.isEmpty || filters.isEmpty) return Map.empty
    val conjuncts = filters.map(GeoPartition.foldConstants).flatMap(GeoPartition.splitAnd)
    val out = scala.collection.mutable.Map.empty[String, Seq[Probe]]
    bloomCols.foreach { s =>
      val dt = schema.fields.find(_.name.equalsIgnoreCase(s.col))
        .map(_.dataType).getOrElse(NullType)
      def matches(e: Expression): Boolean = e match {
        case a: Attribute => a.name.equalsIgnoreCase(s.col)
        case _ => false
      }
      val key = s.col.toLowerCase
      conjuncts.foreach {
        case EqualTo(a, Literal(v, _)) if matches(a) =>
          canonical(v, dt).foreach(p => out(key) = out.getOrElse(key, Seq.empty) :+ p)
        case EqualTo(Literal(v, _), a) if matches(a) =>
          canonical(v, dt).foreach(p => out(key) = out.getOrElse(key, Seq.empty) :+ p)
        case In(a, vs) if matches(a) && vs.forall(_.isInstanceOf[Literal]) =>
          val ps = vs.collect { case Literal(v, _) => canonical(v, dt) }
          // every value must canonicalize, or the conjunct proves nothing
          if (ps.nonEmpty && ps.forall(_.isDefined))
            out(key) = out.getOrElse(key, Seq.empty) ++ ps.flatten
        // the optimizer rewrites IN lists past inSetConversionThreshold
        // (default 10) to InSet — exactly the shape of a real multi-key
        // point lookup, so it must probe too
        case org.apache.spark.sql.catalyst.expressions.InSet(a, hset) if matches(a) =>
          val ps = hset.toSeq.map(v => canonical(v, dt))
          if (ps.nonEmpty && ps.forall(_.isDefined))
            out(key) = out.getOrElse(key, Seq.empty) ++ ps.flatten
        case _ => ()
      }
    }
    out.toMap
  }

  /** Keep the files some probed value might be in. Each `=`/`IN` conjunct
    * filters independently (all must pass — they are conjuncts); a file
    * with no bloom for the column always stays. Tables at or under
    * `bloom.maxProbeFiles` candidates probe on the DRIVER over memoized
    * sidecars; larger tables probe DISTRIBUTED (see [[pruneBig]]) — the
    * very case blooms exist for must not silently lose them. */
  def prune(spark: SparkSession, blooms: Seq[BloomEntry], bloomCols: Seq[BloomSpec],
            schema: StructType, filters: Seq[Expression],
            files: Seq[FileEntry]): Seq[FileEntry] = {
    if (blooms.isEmpty || files.isEmpty) return files
    val probes = probesOf(bloomCols, schema, filters)
    if (probes.isEmpty) return files
    if (files.length > maxProbeFiles(spark)) return pruneBig(spark, blooms, probes, files)
    val bfs = GeoSidecarCache.blooms(spark, blooms)
    if (bfs.isEmpty) return files
    files.filter { f =>
      probes.forall { case (c, vals) =>
        bfs.get((f.key, c)).forall(bf => vals.exists(v => mightContain(bf, v)))
      }
    }
  }

  /** Runtime variant (`SupportsRuntimeV2Filtering`): the values of one
    * `col IN (...)` / `col = v` V2 predicate, already literal. */
  def pruneValues(spark: SparkSession, blooms: Seq[BloomEntry], bloomCols: Seq[BloomSpec],
                  colName: String, dt: DataType, values: Seq[Any],
                  files: Seq[FileEntry]): Seq[FileEntry] = {
    if (blooms.isEmpty || files.isEmpty || values.isEmpty) return files
    if (!bloomCols.exists(_.col.equalsIgnoreCase(colName))) return files
    val ps = values.map(v => canonical(v, dt))
    if (ps.exists(_.isEmpty)) return files // unknown value: prove nothing
    val probes = Map(colName.toLowerCase -> ps.flatten)
    if (files.length > maxProbeFiles(spark)) return pruneBig(spark, blooms, probes, files)
    val bfs = GeoSidecarCache.blooms(spark, blooms)
    if (bfs.isEmpty) return files
    val key = colName.toLowerCase
    files.filter { f =>
      bfs.get((f.key, key)).forall(bf => probes(key).exists(p => mightContain(bf, p)))
    }
  }

  /** Distributed probe for scans past `bloom.maxProbeFiles`: the blooms
    * of a 100k-file table (~0.2% of the table's bytes) cannot live on
    * the driver, so the sidecars are read as a dataset, each bloom is
    * probed EXECUTOR-side, and only the keys of EXCLUDED files come back
    * (a file is excluded when any probed column's bloom rejects every
    * value — the same conjunct semantics as the driver path). One
    * planning-time job over the sidecar bytes replaces a scan of the
    * table — ~500x less IO for a point lookup that would otherwise read
    * everything. */
  private def pruneBig(spark: SparkSession, blooms: Seq[BloomEntry],
                       probes: Map[String, Seq[Probe]],
                       files: Seq[FileEntry]): Seq[FileEntry] = {
    val strProbes: Map[String, Array[String]] =
      probes.map { case (c, ps) => c -> ps.collect { case Left(s) => s }.toArray }
    val longProbes: Map[String, Array[Long]] =
      probes.map { case (c, ps) => c -> ps.collect { case Right(l) => l }.toArray }
    // candidate keys ride in the same broadcast: sidecars can carry rows
    // for files outside this scan (dead, time-travel, other-spec) — they
    // must neither cost a deserialization nor leak into the verdict
    val bc = spark.sparkContext.broadcast(
      (strProbes, longProbes, files.map(_.key).toSet))
    import spark.implicits._
    val excluded = spark.read.parquet(blooms.map(_.path): _*)
      .select("file", "col", "bloom")
      .as[(String, String, Array[Byte])]
      .mapPartitions { it =>
        val (ss, ls, cand) = bc.value
        it.flatMap { case (f, c, bytes) =>
          val key = c.toLowerCase
          val fkey = GeoManifest.norm(f)
          if (!ss.contains(key) || !cand.contains(fkey)) None
          else {
            val bf = deserialize(bytes)
            val hit = ss(key).exists(bf.mightContainString) ||
              ls(key).exists(bf.mightContainLong)
            if (hit) None else Some(fkey)
          }
        }
      }.collect().toSet
    if (excluded.isEmpty) files else files.filterNot(f => excluded.contains(f.key))
  }
}
