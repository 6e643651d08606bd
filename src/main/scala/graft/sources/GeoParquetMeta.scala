package graft.sources

import graft.tables.GeoSchema

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.hadoop.mapreduce.Job
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetOutputFormat}
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.OutputWriterFactory
import org.apache.spark.sql.execution.datasources.parquet.{ParquetFileFormat, ParquetWriteSupport}
import org.apache.spark.sql.types.{BinaryType, DataType, StructType}

/**
 * Standard GeoParquet (opengeospatial/geoparquet) file metadata: every
 * parquet file holding geometry gets the spec's `geo` key in its footer
 * key-value metadata, so GDAL / GeoPandas / DuckDB-spatial read graft
 * exports as typed geometry instead of opaque binary — the interop
 * contract the reference inherits from Sedona's GeoParquet writer
 * (reference: the vendored patched-sedona GeoParquetFileFormat; field
 * list per the public GeoParquet 1.1 spec, not that code).
 *
 * Write side: [[GeoParquetWriteSupport]] subclasses Spark's parquet
 * WriteSupport; per-file bbox and geometry_types accumulate INLINE from
 * the WKB bytes as rows stream out (a flat envelope scan, no JTS object
 * per row) and the JSON lands in the footer at file close via
 * `finalizeWrite()` — zero extra passes, zero read-backs, per-file-exact
 * bbox. Wired in by [[GeoParquetFileFormat]] (the `geoparquet` source) and
 * by every GeoTable data-file writer via [[GeoParquetMeta.prepareWrite]].
 *
 * Read side: [[GeoParquetFileFormat.inferSchema]] reads the first file's
 * `geo` key and tags the named columns with graft's GEOMETRY metadata
 * (GeoSchema), so a session with no hints recovers typing from files
 * written by graft OR by any standard GeoParquet writer (GeoPandas, GDAL).
 */
object GeoParquetMeta {

  val GeoKey = "geo"
  val SpecVersion = "1.1.0"
  /** Writer option: which column is `primary_column` (default: first
    * GEOMETRY-tagged field of the schema). */
  val PrimaryOption = "geo.primary"
  /** Writer option prefix: per-column CRS, e.g. `geo.crs.geom=EPSG:3857`. */
  val CrsOptionPrefix = "geo.crs."
  /** Hadoop-conf carrier from prepareWrite to the task-side WriteSupport:
    * `primary<TAB>name=crs<TAB>name=crs...` */
  val ColsConfKey = "graft.geoparquet.columns"

  private val NameRe = "^[A-Za-z_][A-Za-z0-9_]*$".r

  /** Can `n` travel through [[encodeSpec]] (tab/`=` separators) and the
    * hand-built `geo` JSON (quoted, unescaped) unmangled? Admits non-ASCII
    * and spaced names; rejects only separator/JSON-breaking characters. */
  private def encodable(n: String): Boolean =
    n.nonEmpty && !n.exists(c => c == '\t' || c == '=' || c == '"' || c == '\\' || c < ' ')

  def encodeSpec(primary: String, cols: Seq[(String, String)]): String =
    (primary +: cols.map { case (n, c) => s"$n=$c" }).mkString("\t")

  def decodeSpec(s: String): (String, Seq[(String, String)]) = {
    val parts = s.split('\t')
    (parts.head, parts.tail.toSeq.map { p =>
      val i = p.indexOf('='); (p.substring(0, i), p.substring(i + 1))
    })
  }

  /** Resolve (primary, columns->crs) from writer options + schema GEOMETRY
    * tags. Options win over tags for CRS; the primary defaults to the first
    * tagged field. None = no geometry anywhere -> plain parquet behavior. */
  def specFrom(options: Map[String, String], schema: StructType)
      : Option[(String, Seq[(String, String)])] = {
    val lower = options.map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v }
    def schemaName(n: String): Option[String] =
      schema.fieldNames.find(_.equalsIgnoreCase(n))
    val crsOpts: Map[String, String] = lower.collect {
      case (k, v) if k.startsWith(CrsOptionPrefix) =>
        schemaName(k.stripPrefix(CrsOptionPrefix)).getOrElse(k.stripPrefix(CrsOptionPrefix)) -> v
    }
    val tagged = GeoSchema.geometryColumns(schema)
    val primaryOpt = lower.get(PrimaryOption).flatMap(schemaName)
    val all = (tagged.map(_._1) ++ primaryOpt).distinct
      .filter(n => schema.fields(schema.fieldIndex(n)).dataType == BinaryType)
    val names = all.filter(encodable)
    all.filterNot(encodable).foreach(n => org.slf4j.LoggerFactory
      .getLogger(getClass).warn(
        s"geometry column '$n' excluded from the geo footer: its name cannot " +
        "be represented in the footer spec (tab/'='/quote/control character)"))
    if (names.isEmpty) return None
    val taggedCrs = tagged.toMap
    val cols = names.map { n =>
      n -> crsOpts.getOrElse(n, taggedCrs.getOrElse(n, GeoSchema.DefaultCrs))
    }
    val primary = primaryOpt.filter(names.contains).getOrElse(names.head)
    Some((primary, cols))
  }

  /** GeoTable writers' entry point: plain parquet prepareWrite plus the
    * `geo` footer wiring whenever the table schema carries geometry. */
  def prepareWrite(spark: SparkSession, job: Job, schema: StructType,
                   geomCol: Option[String]): OutputWriterFactory = {
    val opts = geomCol.filter(g => schema.fieldNames.exists(_.equalsIgnoreCase(g)))
      .map(g => Map(PrimaryOption -> g)).getOrElse(Map.empty[String, String])
    new GeoParquetFileFormat().prepareWrite(spark, job, opts, schema)
  }

  // ---------------------------------------------------------------------
  // geo JSON (write side: built by hand for deterministic field order)

  /** The spec's `geo` JSON for one finished file. */
  private[sources] def geoJson(primary: String, accs: Array[GeomAcc]): String = {
    val cols = accs.sortBy(_.name).map { a =>
      val it = a.types.iterator()
      val sb = new StringBuilder
      // a poisoned scan publishes an EMPTY type list (spec: "unknown") and
      // no bbox — the partial accumulation could under-describe the file
      while (!a.poisoned && it.hasNext) { if (sb.nonEmpty) sb += ','; sb ++= "\"" + it.next() + "\"" }
      val bbox = if (a.seen) s""","bbox":[${a.xmin},${a.ymin},${a.xmax},${a.ymax}]""" else ""
      // spec-1.1 covering: points third-party readers at the per-row bbox
      // sidecar columns GeoParquet.write lays down, so THEIR row-group
      // pruning uses the same doubles ours does
      val covering = if (a.hasCovering)
        s""","covering":{"bbox":{"xmin":["${a.name}_xmin"],"ymin":["${a.name}_ymin"],""" +
          s""""xmax":["${a.name}_xmax"],"ymax":["${a.name}_ymax"]}}"""
      else ""
      s""""${a.name}":{"encoding":"WKB","geometry_types":[$sb]$bbox$covering${crsJson(a.crs)}}"""
    }.mkString(",")
    s"""{"version":"$SpecVersion","primary_column":"$primary","columns":{$cols}}"""
  }

  /** CRS fragment: omitted for the spec default (lon/lat WGS84 — our
    * EPSG:4326 WKB is coordinate-order-identical to OGC:CRS84); otherwise a
    * minimal PROJJSON carrying the authority id, which is what GDAL keys
    * lookup on. */
  private def crsJson(crs: String): String = crs match {
    case "EPSG:4326" | "OGC:CRS84" | "" | null => ""
    case other => other.split(':') match {
      case Array(auth, code) if NameRe.findFirstIn(auth).isDefined && code.forall(_.isDigit) =>
        s""","crs":{"id":{"authority":"$auth","code":$code}}"""
      case _ => ""
    }
  }

  // ---------------------------------------------------------------------
  // read side

  case class GeoColumn(encoding: String, crs: String,
                       bbox: Option[(Double, Double, Double, Double)],
                       geometryTypes: Seq[String],
                       covering: Map[String, Seq[String]] = Map.empty)
  case class GeoMeta(version: String, primary: String, columns: Map[String, GeoColumn])

  /** Tolerant parse of a `geo` footer value (ours or a third party's). */
  def parse(json: String): Option[GeoMeta] = try {
    import com.fasterxml.jackson.databind.ObjectMapper
    val root = new ObjectMapper().readTree(json)
    val primary = root.path("primary_column").asText("")
    val colsNode = root.path("columns")
    if (primary.isEmpty || !colsNode.isObject) return None
    val cols = scala.collection.mutable.Map[String, GeoColumn]()
    val it = colsNode.fields()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue
      val crsNode = c.path("crs")
      val crs =
        if (crsNode.isMissingNode || crsNode.isNull) GeoSchema.DefaultCrs
        else {
          val id = crsNode.path("id")
          val auth = id.path("authority").asText("")
          val code = id.path("code").asText("")
          if (auth.nonEmpty && code.nonEmpty) s"$auth:$code" else GeoSchema.DefaultCrs
        }
      val bboxNode = c.path("bbox")
      // spec bbox: [xmin,ymin,xmax,ymax] (2D) or [xmin,ymin,zmin,xmax,
      // ymax,zmax] (3D) — the max block starts at the midpoint
      val bbox = if (bboxNode.isArray && bboxNode.size() >= 4) {
        val k = bboxNode.size() / 2
        Some((bboxNode.get(0).asDouble(), bboxNode.get(1).asDouble(),
          bboxNode.get(k).asDouble(), bboxNode.get(k + 1).asDouble()))
      } else None
      val tn = c.path("geometry_types")
      val types = if (tn.isArray) (0 until tn.size()).map(i => tn.get(i).asText()) else Seq.empty
      val covNode = c.path("covering").path("bbox")
      val covering = if (covNode.isObject) {
        val cb = scala.collection.mutable.Map[String, Seq[String]]()
        val cit = covNode.fields()
        while (cit.hasNext) {
          val ce = cit.next()
          if (ce.getValue.isArray)
            cb(ce.getKey) = (0 until ce.getValue.size()).map(ce.getValue.get(_).asText())
        }
        cb.toMap
      } else Map.empty[String, Seq[String]]
      cols(e.getKey) = GeoColumn(c.path("encoding").asText(""), crs, bbox, types, covering)
    }
    Some(GeoMeta(root.path("version").asText(""), primary, cols.toMap))
  } catch { case scala.util.control.NonFatal(_) => None }

  /** The raw `geo` footer value of the (name-ordered) first parquet file
    * under `path` (or of `path` itself when it is a file). */
  def readGeoKey(spark: SparkSession, path: String): Option[String] = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val file =
      if (fs.getFileStatus(p).isFile) Some(p)
      else firstParquet(fs, p)
    file.flatMap(f => readGeoKeyOfFile(conf, f))
  }

  private def firstParquet(fs: org.apache.hadoop.fs.FileSystem, dir: Path): Option[Path] = {
    val entries = fs.listStatus(dir).sortBy(_.getPath.getName)
    entries.collectFirst {
      case s if s.isFile && s.getPath.getName.endsWith(".parquet") => s.getPath
    }.orElse(entries.collect { case s if s.isDirectory => s.getPath }
      .iterator.flatMap(d => firstParquet(fs, d)).nextOption())
  }

  def readGeoKeyOfFile(conf: Configuration, file: Path): Option[String] = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try Option(reader.getFooter.getFileMetaData.getKeyValueMetaData.get(GeoKey))
    finally reader.close()
  }

  /** Conf key: cap on the cross-file CRS-consistency footer reads at
    * schema-inference time (first read per file is memoized, so repeated
    * planning over an unchanged snapshot costs zero footer opens). */
  val CrsCheckMaxKey = "spark.graft.geoparquet.crsCheck.maxFiles"

  /** Conf key: when true, a plan whose file count exceeds
    * [[CrsCheckMaxKey]] REFUSES instead of best-effort-checking the
    * first `maxFiles` (the cap otherwise lets a conflicting file past
    * with only a warn line). */
  val CrsCheckStrictKey = "spark.graft.geoparquet.crsCheck.strict"

  /** geo key per (path, length, mtime) — bounded LRU (access-ordered). */
  private val keyMemo = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[String, Option[String]](1024, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Option[String]]): Boolean = size() > 8192
    })

  /** Best-effort memoized footer open: a file that vanished under a
    * concurrent compaction/vacuum (or has a truncated footer) must not
    * fail PLANNING of queries that may never scan it — it is skipped from
    * the consistency check (logged, NOT memoized so a transient error
    * heals) and the scan itself surfaces any real read error later. */
  private def cachedGeoKey(conf: Configuration, f: FileStatus): Option[String] = {
    val k = s"${f.getPath}#${f.getLen}#${f.getModificationTime}"
    val v = keyMemo.get(k)
    if (v != null) v
    else try {
      val read = readGeoKeyOfFile(conf, f.getPath)
      keyMemo.put(k, read)
      read
    } catch {
      case scala.util.control.NonFatal(e) =>
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"skipping unreadable footer ${f.getPath} in the geo CRS check: $e")
        None
    }
  }

  private def normCrs(c: String): String =
    if (c == "OGC:CRS84") "EPSG:4326" else c // coordinate-order-identical in WKB

  /** The relation's `geo` metadata, CROSS-CHECKED for CRS consistency: a
    * directory mixing files from writers that declared DIFFERENT CRSs for
    * the same column is a silent wrong-coordinates hazard (first-file-wins
    * would tag every file with one writer's CRS), so it fails loudly with
    * both files named. One footer read per file, memoized by
    * (path, len, mtime) and parsed once per distinct raw JSON (writer
    * signature); capped at [[CrsCheckMaxKey]] files (default 1024, the
    * overflow logged) so million-file plans stay bounded. */
  def consistentGeoMeta(spark: SparkSession, conf: Configuration,
                        files: Seq[FileStatus]): Option[GeoMeta] = {
    val pq = files.filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val checked = capped(spark, pq)
    checkConsistent(checked.map(_.getPath.toString).zip(
      gatherParallel(checked, (f: FileStatus) => cachedGeoKey(conf, f),
        // pool only when something actually misses the memo — repeated
        // planning of an unchanged relation must not pay thread churn
        skipPool = checked.forall(f => keyMemo.containsKey(
          s"${f.getPath}#${f.getLen}#${f.getModificationTime}")))))
  }

  /** [[consistentGeoMeta]] over bare path strings — the import path: Spark
    * has ALREADY listed these files, so fetching a FileStatus per path just
    * to build memo keys would cost one serial metadata RPC per file
    * (minutes on a 100k-file object-store import). One-shot, unmemoized. */
  def consistentGeoMetaPaths(spark: SparkSession, conf: Configuration,
                             paths: Seq[String]): Option[GeoMeta] = {
    val pq = capped(spark, paths.filter(_.endsWith(".parquet")))
    checkConsistent(pq.zip(gatherParallel(pq, (p: String) =>
      try readGeoKeyOfFile(conf, new Path(p))
      catch {
        case scala.util.control.NonFatal(e) =>
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"skipping unreadable footer $p in the geo CRS check: $e")
          None
      }, skipPool = false)))
  }

  private def capped[A](spark: SparkSession, xs: Seq[A]): Seq[A] = {
    val max = math.max(spark.conf.get(CrsCheckMaxKey, "1024").toInt, 1)
    if (xs.length > max) {
      // past the cap the check is BEST-EFFORT: a conflicting file beyond
      // it slips through with only the warn line. Pipelines that would
      // rather pay 100k footer opens than risk silent wrong coordinates
      // opt into the strict mode and get a loud planning error instead.
      if (spark.conf.get(CrsCheckStrictKey, "false").toBoolean)
        throw new IllegalArgumentException(
          s"geoparquet CRS consistency check needs ${xs.length} footer reads but " +
            s"$CrsCheckMaxKey caps it at $max and $CrsCheckStrictKey is true — " +
            s"raise the cap to cover every file, or unset strict to accept a " +
            s"best-effort check over the first $max")
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"geoparquet CRS consistency check capped at $max of ${xs.length} files " +
          s"(BEST-EFFORT past the cap: a conflict beyond it is not detected; " +
          s"raise $CrsCheckMaxKey to widen, or set $CrsCheckStrictKey=true to " +
          s"refuse instead)")
    }
    xs.take(max)
  }

  /** Footer opens through a small pool (cold object storage pays ~10s of
    * ms per open; serial x1024 would stall planning), ORDER PRESERVED so
    * the conflict scan names the first conflicting pair deterministically.
    * The readers never throw (errors log + skip), so `get` cannot wrap a
    * planning-time failure. */
  private def gatherParallel[A](xs: Seq[A], read: A => Option[String],
                                skipPool: Boolean): Seq[Option[String]] =
    if (skipPool || xs.length <= 1) xs.map(read)
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(8, xs.length))
      try xs.map(x => pool.submit(new java.util.concurrent.Callable[Option[String]] {
        override def call(): Option[String] = read(x)
      })).map(_.get())
      finally pool.shutdown()
    }

  private def checkConsistent(pathKeys: Seq[(String, Option[String])]): Option[GeoMeta] = {
    val seenJson = scala.collection.mutable.Set[String]()
    val crsOf = scala.collection.mutable.Map[String, (String, String)]()
    var result: Option[GeoMeta] = None
    pathKeys.foreach { case (path, key) =>
      key.foreach { raw =>
        if (seenJson.add(raw)) parse(raw).foreach { meta =>
          meta.columns.foreach { case (n, c) =>
            crsOf.get(n) match {
              case Some((crs0, f0)) if normCrs(crs0) != normCrs(c.crs) =>
                throw new IllegalStateException(
                  s"conflicting geo footer CRS for column '$n': $f0 declares " +
                    s"$crs0 but $path declares ${c.crs} — reading them " +
                    "as one relation would tag every file with one writer's " +
                    "CRS (silent wrong coordinates); split the read or " +
                    "rewrite one side into the other's CRS")
              case None => crsOf(n) = (c.crs, path)
              case _ => ()
            }
          }
          if (result.isEmpty) result = Some(meta)
        }
      }
    }
    result
  }

  /** Schema with GEOMETRY tags applied from parsed `geo` metadata (only
    * BINARY fields named there; existing tags win). A declared `covering`
    * block rides along as graft.covering.* metadata so GeoBboxPushdown can
    * derive pruning conjuncts on the third party's OWN bbox columns. */
  def tagSchema(schema: StructType, meta: GeoMeta): StructType =
    StructType(schema.fields.map { f =>
      meta.columns.get(f.name) match {
        case Some(c) if c.encoding == "WKB" && f.dataType == BinaryType && !GeoSchema.isGeometry(f) =>
          val base = GeoSchema.geometryMetadata(c.crs, f.metadata)
          val corners = Seq("xmin", "ymin", "xmax", "ymax")
          val md =
            if (corners.forall(k => c.covering.get(k).exists(p =>
                p.nonEmpty && p.forall(s => s.nonEmpty && !s.contains('.'))))) {
              val b = new org.apache.spark.sql.types.MetadataBuilder().withMetadata(base)
              corners.foreach(k =>
                b.putString(GeoSchema.CoveringPrefix + k, c.covering(k).mkString(".")))
              b.build()
            } else base
          f.copy(metadata = md)
        case _ => f
      }
    })

  /** Test hook: what one WkbScan accumulation yields for a single WKB
    * value — (xmin, ymin, xmax, ymax, top-level type name), None when the
    * scan saw nothing (empty geometry / unscannable bytes). */
  private[graft] def scanOne(wkb: Array[Byte]): Option[(Double, Double, Double, Double, String)] = {
    val acc = new GeomAcc("g", GeoSchema.DefaultCrs, 0)
    WkbScan.accumulate(wkb, acc)
    if (!acc.seen) None
    else Some((acc.xmin, acc.ymin, acc.xmax, acc.ymax,
      if (acc.types.isEmpty) "" else acc.types.first()))
  }

  /** DataFrame variant of [[tagSchema]] for already-loaded frames. */
  def tag(df: DataFrame, meta: GeoMeta): DataFrame =
    meta.columns.foldLeft(df) {
      case (d, (name, c)) if c.encoding == "WKB" &&
          d.schema.fieldNames.contains(name) && d.schema(name).dataType == BinaryType =>
        GeoSchema.markGeometry(d, name, c.crs)
      case (d, _) => d
    }
}

/** Per-column per-file accumulator the write support fills row by row. */
private[sources] final class GeomAcc(val name: String, val crs: String, val idx: Int,
                                     val hasCovering: Boolean = false) {
  var xmin: Double = Double.PositiveInfinity
  var ymin: Double = Double.PositiveInfinity
  var xmax: Double = Double.NegativeInfinity
  var ymax: Double = Double.NegativeInfinity
  /** A row's WKB failed to scan (unsupported type code / malformed bytes).
    * Whatever coordinates WERE consumed may under-cover the file, and a
    * spec reader pruning on an under-covering bbox silently drops rows —
    * so a poisoned accumulator publishes NO bbox and NO geometry_types. */
  var poisoned: Boolean = false
  val types = new java.util.TreeSet[String]()
  def seen: Boolean = !poisoned && xmin <= xmax
}

/**
 * Allocation-free WKB envelope/type scan — handles both flavors graft
 * writes (JTS EWKB flag bits + optional SRID) and ISO 1000/2000/3000
 * type offsets, so third-party WKB accumulates correctly too.
 */
private[sources] object WkbScan {
  private val names = Array("", "Point", "LineString", "Polygon",
    "MultiPoint", "MultiLineString", "MultiPolygon", "GeometryCollection")

  def accumulate(bytes: Array[Byte], acc: GeomAcc): Unit =
    try scan(java.nio.ByteBuffer.wrap(bytes), acc, 0)
    catch { case _: RuntimeException => acc.poisoned = true }
    // malformed WKB: poison (the partial coordinates already consumed could
    // UNDER-cover the file — publishing that bbox would make spec-compliant
    // readers prune away matching rows); the write itself never fails

  private def scan(buf: java.nio.ByteBuffer, acc: GeomAcc, depth: Int): Unit = {
    if (depth > 16) throw new IllegalArgumentException("WKB nesting too deep")
    buf.order(if (buf.get() == 0) java.nio.ByteOrder.BIG_ENDIAN
              else java.nio.ByteOrder.LITTLE_ENDIAN)
    val raw = buf.getInt()
    val hasSrid = (raw & 0x20000000) != 0
    val t = raw & 0x0FFFFFFF
    val isoDim = t / 1000
    val base = t % 1000
    val hasZ = (raw & 0x80000000) != 0 || isoDim == 1 || isoDim == 3
    val hasM = (raw & 0x40000000) != 0 || isoDim == 2 || isoDim == 3
    val skip = ((if (hasZ) 1 else 0) + (if (hasM) 1 else 0)) * 8
    if (hasSrid) buf.getInt()
    base match {
      case 1 => coord(buf, acc, skip)
      case 2 => coords(buf, acc, skip, buf.getInt())
      case 3 =>
        var r = buf.getInt()
        while (r > 0) { coords(buf, acc, skip, buf.getInt()); r -= 1 }
      case 4 | 5 | 6 | 7 =>
        var n = buf.getInt()
        while (n > 0) { scan(buf, acc, depth + 1); n -= 1 }
      case other => throw new IllegalArgumentException(s"WKB type $other")
    }
    // only the outermost type names the file's content (a MultiPolygon's
    // shells must not also report "Polygon"); dimension suffixes follow
    // the OGC spelling (" Z" per the GeoParquet spec; " M"/" ZM" for
    // measured WKB, matching GDAL's extension of the same list)
    if (depth == 0) {
      val suffix =
        if (hasZ && hasM) " ZM" else if (hasZ) " Z" else if (hasM) " M" else ""
      acc.types.add(names(base) + suffix)
    }
  }

  private def coord(buf: java.nio.ByteBuffer, acc: GeomAcc, skip: Int): Unit = {
    val x = buf.getDouble(); val y = buf.getDouble()
    if (skip > 0) buf.position(buf.position() + skip)
    if (!java.lang.Double.isNaN(x) && !java.lang.Double.isNaN(y)) {
      if (x < acc.xmin) acc.xmin = x
      if (x > acc.xmax) acc.xmax = x
      if (y < acc.ymin) acc.ymin = y
      if (y > acc.ymax) acc.ymax = y
    }
  }

  private def coords(buf: java.nio.ByteBuffer, acc: GeomAcc, skip: Int, n: Int): Unit = {
    var i = n
    while (i > 0) { coord(buf, acc, skip); i -= 1 }
  }
}

/**
 * Spark's parquet WriteSupport plus the GeoParquet `geo` footer key.
 * Instantiated reflectively per task by ParquetOutputFormat; configured
 * through [[GeoParquetMeta.ColsConfKey]]. With no geometry spec in the
 * conf it behaves exactly like the vanilla writer.
 */
class GeoParquetWriteSupport extends ParquetWriteSupport {

  private var primary: String = _
  private var accs: Array[GeomAcc] = Array.empty

  override def init(configuration: Configuration): WriteSupport.WriteContext = {
    val ctx = super.init(configuration)
    accs = Array.empty
    val spec = configuration.get(GeoParquetMeta.ColsConfKey)
    if (spec != null) try {
      val (p, cols) = GeoParquetMeta.decodeSpec(spec)
      val schema = DataType.fromJson(
        configuration.get(ParquetWriteSupport.SPARK_ROW_SCHEMA)).asInstanceOf[StructType]
      primary = p
      accs = cols.flatMap { case (name, crs) =>
        val i = schema.fieldNames.indexOf(name)
        if (i >= 0 && schema.fields(i).dataType == BinaryType) {
          // GeoParquet.write sidecar doubles present -> declare them as
          // the spec's covering columns
          val covering = Seq("_xmin", "_ymin", "_xmax", "_ymax").forall { s =>
            val j = schema.fieldNames.indexOf(name + s)
            j >= 0 && schema.fields(j).dataType == org.apache.spark.sql.types.DoubleType
          }
          Some(new GeomAcc(name, crs, i, covering))
        } else None
      }.toArray
      if (!accs.exists(_.name == primary)) accs = Array.empty
    } catch { case scala.util.control.NonFatal(_) => accs = Array.empty }
    ctx
  }

  override def write(row: InternalRow): Unit = {
    var i = 0
    while (i < accs.length) {
      val a = accs(i)
      if (!row.isNullAt(a.idx)) WkbScan.accumulate(row.getBinary(a.idx), a)
      i += 1
    }
    super.write(row)
  }

  override def finalizeWrite(): WriteSupport.FinalizedWriteContext =
    if (accs.isEmpty)
      new WriteSupport.FinalizedWriteContext(java.util.Collections.emptyMap[String, String]())
    else {
      val m = new java.util.HashMap[String, String]()
      m.put(GeoParquetMeta.GeoKey, GeoParquetMeta.geoJson(primary, accs))
      new WriteSupport.FinalizedWriteContext(m)
    }
}

/**
 * The `geoparquet` source: parquet in every respect, plus (write) the
 * `geo` footer key on files holding geometry and (read) GEOMETRY tagging
 * recovered from that key with no session hints.
 */
class GeoParquetFileFormat extends ParquetFileFormat {

  override def shortName(): String = "geoparquet"
  override def toString: String = "GeoParquet"

  override def prepareWrite(sparkSession: SparkSession, job: Job,
                            options: Map[String, String],
                            dataSchema: StructType): OutputWriterFactory = {
    val factory = super.prepareWrite(sparkSession, job, options, dataSchema)
    GeoParquetMeta.specFrom(options, dataSchema).foreach { case (primary, cols) =>
      ParquetOutputFormat.setWriteSupportClass(job, classOf[GeoParquetWriteSupport])
      job.getConfiguration.set(GeoParquetMeta.ColsConfKey,
        GeoParquetMeta.encodeSpec(primary, cols))
    }
    factory
  }

  override def inferSchema(sparkSession: SparkSession,
                           parameters: Map[String, String],
                           files: Seq[FileStatus]): Option[StructType] =
    super.inferSchema(sparkSession, parameters, files).map { schema =>
      val conf = sparkSession.sessionState.newHadoopConf()
      // reads every footer's geo key (memoized, capped) and FAILS on
      // cross-writer CRS conflicts instead of first-file-wins tagging
      GeoParquetMeta.consistentGeoMeta(sparkSession, conf, files)
        .map(GeoParquetMeta.tagSchema(schema, _))
        .getOrElse(schema)
    }
}
