package graft.tables

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{CTESubstitution, NoSuchViewException, UnresolvedRelation}
import org.apache.spark.sql.catalyst.plans.logical.{AnalysisHelper, LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graft.GraftShim

/**
 * Persisted SQL views over geo catalogs — the Iceberg ViewCatalog analog
 * (Iceberg ships view support as a core catalog capability; OSS Spark 4.1
 * publishes the `ViewCatalog` API but no analyzer wiring, exactly like it
 * publishes nothing for Iceberg's views — engines bring their own
 * resolution rule, which is what [[GeoViewResolution]] is).
 *
 * Storage: one JSON file per view at `<warehouse>/<ns...>/<name>.view.json`
 * holding the SQL text, the creation-time catalog+namespace context, the
 * analyzed schema, and properties — the same stateless-over-filesystem
 * contract as GeoTable manifests (a view exists iff its file does, so the
 * SQL front-end and the ViewCatalog surface see one truth).
 *
 * Resolution: view names expand EAGERLY at resolution time — parse the
 * stored SQL, run CTE substitution on the body (the Substitution batch has
 * already passed when a resolution rule fires), qualify bare relation names
 * against the stored context (view/table in the view's own namespace wins;
 * anything else is left for the session), and recursively expand nested
 * views with cycle detection. The expanded subtree is ordinary unresolved
 * Catalyst that the analyzer finishes — predicate pushdown, pruning, SPJ
 * all see straight through a view.
 */
object GeoViews {

  val Suffix = ".view.json"

  case class ViewDef(sql: String, currentCatalog: String,
                     currentNamespace: Seq[String], schemaJson: String,
                     properties: Map[String, String])

  /** The warehouse root when `cat` names a configured GeoCatalog. */
  def warehouseFor(spark: SparkSession, cat: String): Option[String] =
    spark.conf.getOption(s"spark.sql.catalog.$cat")
      .filter(_ == classOf[GeoCatalog].getName)
      .flatMap(_ => spark.conf.getOption(s"spark.sql.catalog.$cat.warehouse"))
      .map(_.stripSuffix("/"))

  def viewPath(warehouse: String, ns: Seq[String], name: String): Path =
    new Path((warehouse +: ns).mkString("/"), name + Suffix)

  /** Existence memo: the resolution rule probes EVERY geo-catalog relation
    * for a view file, and a live fs.exists() per analyzer fixpoint
    * iteration is an object-store HEAD round-trip for the common no-view
    * case. Entries expire after [[CacheTtlMs]] (cross-process creates
    * become visible); local store/delete invalidate immediately. */
  private val CacheTtlMs = 30000L
  private val CacheMaxEntries = 4096
  private val existsCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Boolean, Long)]()

  private def invalidate(p: Path): Unit = existsCache.remove(p.toString): Unit

  /** Drop the whole memo — bulk filesystem changes (DROP NAMESPACE
    * CASCADE deletes view files without going through delete()). */
  def invalidateAll(): Unit = existsCache.clear()

  def exists(spark: SparkSession, warehouse: String, ns: Seq[String], name: String): Boolean = {
    val p = viewPath(warehouse, ns, name)
    val now = System.currentTimeMillis()
    val cached = existsCache.get(p.toString)
    if (cached != null && now - cached._2 < CacheTtlMs) cached._1
    else {
      val e = GeoManifest.fs(spark, warehouse).exists(p)
      // bounded: one entry per relation name ever probed would otherwise
      // grow for the life of the JVM; a rare full clear beats an LRU here
      if (existsCache.size >= CacheMaxEntries) existsCache.clear()
      existsCache.put(p.toString, (e, now))
      e
    }
  }

  /** Store a definition: write-temp + rename. Fresh CREATE renames onto a
    * must-not-exist target; REPLACE renames OVER the live file
    * (FileContext Rename.OVERWRITE — atomic where the FS supports it), so
    * readers never observe a missing or torn definition. */
  def store(spark: SparkSession, warehouse: String, ns: Seq[String], name: String,
            d: ViewDef, overwrite: Boolean): Unit = {
    val fs = GeoManifest.fs(spark, warehouse)
    val dst = viewPath(warehouse, ns, name)
    if (!overwrite && fs.exists(dst))
      throw new org.apache.spark.sql.catalyst.analysis.ViewAlreadyExistsException(
        org.apache.spark.sql.connector.catalog.Identifier.of(ns.toArray, name))
    fs.mkdirs(dst.getParent)
    val tmp = new Path(dst.getParent, s".${name}.view.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val out = fs.create(tmp, true)
    try out.write(toJson(d).getBytes("UTF-8")) finally out.close()
    try {
      if (overwrite && fs.exists(dst)) {
        // atomic replace where the FS supports it: no delete-then-rename
        // window where the view is missing (the old definition survives a
        // crash before the rename). Filesystems without an
        // AbstractFileSystem binding (FileContext is a separate API — many
        // object-store configs lack it) fall back to delete+rename: a
        // narrow window, but never a torn file.
        try {
          val fc = org.apache.hadoop.fs.FileContext.getFileContext(
            fs.makeQualified(dst).toUri, fs.getConf)
          fc.rename(fs.makeQualified(tmp), fs.makeQualified(dst),
            org.apache.hadoop.fs.Options.Rename.OVERWRITE)
        } catch {
          case scala.util.control.NonFatal(_) =>
            fs.delete(dst, false)
            if (!fs.rename(tmp, dst))
              throw new java.io.IOException(s"rename $tmp -> $dst failed")
        }
      } else if (!fs.rename(tmp, dst)) {
        throw new org.apache.spark.sql.catalyst.analysis.ViewAlreadyExistsException(
          org.apache.spark.sql.connector.catalog.Identifier.of(ns.toArray, name))
      }
    } catch {
      case t: Throwable =>
        try fs.delete(tmp, false) catch { case scala.util.control.NonFatal(_) => () }
        throw t
    } finally invalidate(dst)
  }

  def load(spark: SparkSession, warehouse: String, ns: Seq[String], name: String): Option[ViewDef] = {
    val fs = GeoManifest.fs(spark, warehouse)
    val p = viewPath(warehouse, ns, name)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val text = try {
        val bos = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, bos, 64 * 1024, false)
        bos.toString("UTF-8")
      } finally in.close()
      Some(fromJson(text))
    }
  }

  def delete(spark: SparkSession, warehouse: String, ns: Seq[String], name: String): Boolean = {
    val fs = GeoManifest.fs(spark, warehouse)
    val p = viewPath(warehouse, ns, name)
    try fs.exists(p) && fs.delete(p, false)
    finally invalidate(p)
  }

  def list(spark: SparkSession, warehouse: String, ns: Seq[String]): Seq[String] = {
    val fs = GeoManifest.fs(spark, warehouse)
    val dir = new Path((warehouse +: ns).mkString("/"))
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(Suffix) &&
        !s.getPath.getName.startsWith("."))
      .map(_.getPath.getName.stripSuffix(Suffix)).sorted
  }

  // ---------------------------------------------------------------------
  // JSON serde (Jackson — already on the Spark classpath, used by Geom)

  private def toJson(d: ViewDef): String = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = m.createObjectNode()
    root.put("sql", d.sql)
    root.put("currentCatalog", d.currentCatalog)
    val ns = root.putArray("currentNamespace")
    d.currentNamespace.foreach(ns.add)
    root.put("schemaJson", d.schemaJson)
    val props = root.putObject("properties")
    d.properties.toSeq.sortBy(_._1).foreach { case (k, v) => props.put(k, v) }
    m.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  private def fromJson(text: String): ViewDef = {
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(text)
    val ns = root.path("currentNamespace")
    val props = scala.collection.mutable.Map[String, String]()
    val it = root.path("properties").fields()
    while (it.hasNext) { val e = it.next(); props(e.getKey) = e.getValue.asText() }
    ViewDef(root.path("sql").asText(), root.path("currentCatalog").asText(),
      (0 until ns.size()).map(ns.get(_).asText()),
      root.path("schemaJson").asText(), props.toMap)
  }

  // ---------------------------------------------------------------------
  // name resolution + expansion

  /** (catalog, warehouse, namespace, view) when `parts` names a geo view. */
  def viewTarget(spark: SparkSession, parts: Seq[String])
      : Option[(String, String, Seq[String], String)] =
    if (parts.length < 2) None
    else warehouseFor(spark, parts.head)
      .filter(wh => exists(spark, wh, parts.tail.init, parts.last))
      .map(wh => (parts.head, wh, parts.tail.init, parts.last))

  /** A table (`_current`) or view file under `wh/ns/name`? */
  private def existsUnder(spark: SparkSession, wh: String, ns: Seq[String],
                          name: String): Boolean = {
    val fs = GeoManifest.fs(spark, wh)
    val base = new Path((wh +: ns).mkString("/"))
    fs.exists(new Path(base, name + Suffix)) ||
      fs.exists(new Path(new Path(base, name), "_current"))
  }

  /** Bare names inside a view body resolve in the view's own context
    * first (when a table/view actually exists there), session scope
    * second — Spark's own persisted-view resolution order. */
  private def qualify(spark: SparkSession, parts: Seq[String],
                      cat: String, ns: Seq[String]): Seq[String] =
    warehouseFor(spark, cat) match {
      case Some(wh) if parts.length == 1 && existsUnder(spark, wh, ns, parts.head) =>
        cat +: ns :+ parts.head
      case Some(wh) if parts.length == 2 && existsUnder(spark, wh, Seq(parts.head), parts(1)) =>
        cat +: parts
      case _ => parts
    }

  /** Stored SQL -> unresolved plan: parse, CTE-substitute, qualify against
    * the stored context, expand nested views (cycle-checked). */
  def expand(spark: SparkSession, cat: String, wh: String, ns: Seq[String],
             name: String, seen: Set[String] = Set.empty): LogicalPlan = {
    val key = (cat +: ns :+ name).mkString(".")
    if (seen.contains(key))
      throw new IllegalArgumentException(
        s"cyclic view reference: ${(seen + key).toSeq.sorted.mkString(" -> ")}")
    val d = load(spark, wh, ns, name).getOrElse(
      throw new NoSuchViewException(
        org.apache.spark.sql.connector.catalog.Identifier.of(ns.toArray, name)))
    expandDef(spark, d, name, seen + key)
  }

  /** [[expand]] for an in-memory definition — CREATE-time validation runs
    * this BEFORE anything lands on disk, with the self-key in `seen` so a
    * self-referencing body fails cleanly. */
  def expandDef(spark: SparkSession, d: ViewDef, alias: String,
                seen: Set[String]): LogicalPlan = {
    val parsed = GraftShim.parsePlan(spark, d.sql)
    // the analyzer's Substitution batch has already passed by the time a
    // resolution rule splices this subtree in — run CTE substitution on
    // the body ourselves so WITH-clauses inside views work
    val body = CTESubstitution(parsed)
    val expanded = AnalysisHelper.allowInvokingTransformsInAnalyzer {
      body.transformDownWithSubqueries {
        case u: UnresolvedRelation =>
          val q = qualify(spark, u.multipartIdentifier, d.currentCatalog, d.currentNamespace)
          viewTarget(spark, q) match {
            case Some((c2, w2, n2, v2)) =>
              SubqueryAlias(v2, expand(spark, c2, w2, n2, v2, seen))
            case None =>
              if (q != u.multipartIdentifier) u.copy(multipartIdentifier = q) else u
          }
      }
    }
    SubqueryAlias(alias, expanded)
  }

  /** Read a view as a DataFrame on ANY session (the vanilla-session path —
    * extension sessions just `spark.sql("SELECT ... FROM geo.db.v")`). */
  def readView(spark: SparkSession, name: String): DataFrame = {
    val parts = name.split('.').toSeq
    val (cat, wh, ns, v) = viewTarget(spark, parts).getOrElse(
      throw new NoSuchViewException(
        org.apache.spark.sql.connector.catalog.Identifier.of(
          parts.tail.init.toArray, parts.last)))
    GraftShim.ofRows(spark, expand(spark, cat, wh, ns, v))
  }
}

/** The stored definition surfaced through Spark's `View` interface. */
class GeoSparkView(fullName: String, d: GeoViews.ViewDef)
  extends org.apache.spark.sql.connector.catalog.View {
  import scala.jdk.CollectionConverters._
  override def name(): String = fullName
  override def query(): String = d.sql
  override def currentCatalog(): String = d.currentCatalog
  override def currentNamespace(): Array[String] = d.currentNamespace.toArray
  override def schema(): org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.DataType.fromJson(d.schemaJson)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
  // the stored ANALYZED schema's field names are the query's output
  // columns (Iceberg persists the same fact in its view metadata); no
  // column-list aliasing surface exists, so aliases/comments stay empty
  override def queryColumnNames(): Array[String] = schema().fieldNames
  override def columnAliases(): Array[String] = Array.empty
  override def columnComments(): Array[String] = Array.empty
  override def properties(): java.util.Map[String, String] = d.properties.asJava
}

/**
 * Injected resolution rule (GraftExtensions): any `geo.db.v` relation —
 * top level, join leg, or subquery — expands to its stored definition.
 * The analog of Iceberg's `ResolveViews` extension rule.
 */
case class GeoViewResolution(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case u: UnresolvedRelation =>
      GeoViews.viewTarget(spark, u.multipartIdentifier) match {
        case Some((cat, wh, ns, v)) => GeoViews.expand(spark, cat, wh, ns, v)
        case None => u
      }
  }
}
