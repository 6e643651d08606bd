package graft.tables

import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.{expr, lit}
import org.apache.spark.sql.types.{DataType, LongType, StructType}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/**
 * SQL DML front-end for GeoTable — the user-visible match for the
 * reference's spatial DML (reference: extension/src/test/scala/org/apache/
 * iceberg/TestSedonaIcebergExtension.scala:85-91 runs
 * `UPDATE demo.db.test_geom SET data = 'updated' WHERE ST_Intersects(...)`;
 * example/.../App.scala:66 the same against a live catalog).
 *
 * Statements handled (only for tables in GeoTable's registry, plus
 * `USING GEO` DDL — everything else delegates to Spark's parser):
 *  - CREATE TABLE t (id INT, geo GEOMETRY) USING GEO [LOCATION '<root>']
 *  - INSERT INTO t VALUES ... | SELECT ...
 *  - UPDATE t SET c = e[, ...] [WHERE cond]
 *  - DELETE FROM t [WHERE cond]
 *  - MERGE INTO t USING src ON cond WHEN [NOT] MATCHED ...
 *  - ALTER TABLE t ADD COLUMN c TYPE | DROP COLUMN c | RENAME COLUMN a TO b
 *  - ALTER TABLE t SET PARTITIONED BY (bucket(4, k), days(ts), ...) — spec evolution
 *  - OPTIMIZE t [INTO n FILES] [SMALL BELOW n ROWS] [ZORDER BY (c1, c2, ...)] [WHERE ...]
 *  - ALTER TABLE t CREATE TAG name [AS OF VERSION n] | DROP TAG name
 *  - ALTER TABLE t CREATE | DROP | PUBLISH BRANCH name (write-audit-publish)
 *  - OPTIMIZE t [INTO n FILES] [WHERE pred] · VACUUM t [RETAIN n VERSIONS|DAYS|HOURS]
 *  - CREATE TABLE t2 SHALLOW CLONE t1 [VERSION AS OF n]
 *  - RESTORE TABLE t TO VERSION AS OF n | 'ref' | TO TIMESTAMP AS OF 'ts'
 *
 * Split front/back: `GeoSqlParser` (injected via
 * SparkSessionExtensions.injectParser) turns matching statements into
 * `LeafRunnableCommand`s so `spark.sql("UPDATE ...")` works end-to-end;
 * `GeoSql.exec` runs the same front-half directly for sessions built
 * without the extension (e.g. the correctness driver's vanilla session).
 * The SET/WHERE fragments are re-parsed by Spark itself (`expr(...)`), so
 * the full ST_ catalog and every Spark SQL expression work in DML.
 */
object GeoSql {

  private val createRe =
    """(?is)\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?([\w.]+)\s*\((.+)\)\s*USING\s+GEO\b(.*?)\s*;?\s*""".r
  // CREATE tail clauses, any order: PARTITIONED BY (one paren level for
  // bucket(n,c)-style transforms), TBLPROPERTIES (quoted values may hold
  // parens), LOCATION. Anything else in the tail un-claims the statement
  // (strict bail — Spark's parser owns what we can't cleanly parse).
  private val createPartByRe =
    """(?is)^\s*PARTITIONED\s+BY\s*\(((?:[^()]|\([^()]*\))*)\)""".r
  private val createTblPropsRe =
    """(?is)^\s*TBLPROPERTIES\s*\(((?:[^()']|'[^']*')*)\)""".r
  private val createLocRe =
    """(?is)^\s*LOCATION\s+'([^']+)'""".r

  // TBLPROPERTIES token in any Spark spelling — 'k', "k", or a bare
  // identifier; a single-quoted token may escape a quote as '' (the
  // SHOW CREATE emitter's spelling, so emitted DDL round-trips verbatim)
  private val propToken = """(?:'((?:[^']|'')*)'|"([^"]*)"|([\w.-]+))"""
  private val propTokenRe = propToken.r
  private val propPairRe = (propToken + """\s*=\s*""" + propToken).r
  private def tokenOf(m: scala.util.matching.Regex.Match, off: Int): String =
    if (m.group(off + 1) != null) m.group(off + 1).replace("''", "'")
    else Seq(m.group(off + 2), m.group(off + 3)).find(_ != null).get
  // a pair list must be FULLY consumed: a malformed entry (mismatched
  // quote, an unquoted value with exotic characters) raises instead of
  // silently vanishing from the parsed set
  private def checkPropResidue(sql: String,
                               ms: Seq[scala.util.matching.Regex.Match]): Unit = {
    var pos = 0
    val gaps = ms.map { m =>
      val g = sql.substring(pos, m.start); pos = m.end; g
    } :+ sql.substring(pos)
    gaps.foreach { g =>
      require(g.forall(c => c == ',' || c.isWhitespace),
        s"unparseable TBLPROPERTIES fragment '${g.trim}' — every entry must " +
          "be 'k'='v' (or a bare key for UNSET); escape a quote inside a " +
          "single-quoted token as ''")
    }
  }

  /** TBLPROPERTIES ('k'='v', ...) — shared by CREATE tails, ALTER TABLE,
    * and ALTER VIEW. Raises on unparseable residue. */
  private[tables] def parsePropPairs(propsSql: String): Seq[(String, String)] = {
    val ms = propPairRe.findAllMatchIn(propsSql).toSeq
    checkPropResidue(propsSql, ms)
    ms.map(m => tokenOf(m, 0) -> tokenOf(m, 3))
  }

  /** UNSET TBLPROPERTIES ('k', ...) key list — same spellings and the
    * same no-silent-drop rule. */
  private[tables] def parsePropKeys(propsSql: String): Seq[String] = {
    val ms = propTokenRe.findAllMatchIn(propsSql).toSeq
    checkPropResidue(propsSql, ms)
    ms.map(tokenOf(_, 0))
  }

  /** (partition transform ddls, tblproperties pairs, location, leftover). */
  private[tables] def parseCreateTail(tail: String)
      : (Seq[String], Seq[(String, String)], Option[String], String) = {
    var rest = tail
    var parts = Seq.empty[String]
    var props = Seq.empty[(String, String)]
    var loc: Option[String] = None
    var progressed = true
    while (progressed && rest.trim.nonEmpty) {
      progressed = false
      createPartByRe.findPrefixMatchOf(rest).foreach { m =>
        parts ++= splitTopLevelCommas(m.group(1)); rest = rest.substring(m.end); progressed = true
      }
      if (!progressed) createTblPropsRe.findPrefixMatchOf(rest).foreach { m =>
        props ++= parsePropPairs(m.group(1))
        rest = rest.substring(m.end); progressed = true
      }
      if (!progressed) createLocRe.findPrefixMatchOf(rest).foreach { m =>
        loc = Some(m.group(1)); rest = rest.substring(m.end); progressed = true
      }
    }
    (parts, props, loc, rest.trim)
  }
  private val insertRe =
    """(?is)\s*INSERT\s+INTO\s+(?:TABLE\s+)?([\w.]+)\s*(?:\(([\w\s,]+)\)\s*)?(VALUES\b.+|SELECT\b.+|FROM\b.+|WITH\b.+|TABLE\b.+)\s*;?\s*""".r
  private val updateRe =
    """(?is)\s*UPDATE\s+([\w.]+)\s+SET\s+(.+?)\s*;?\s*""".r
  private val deleteRe =
    """(?is)\s*DELETE\s+FROM\s+([\w.]+)(.*?)\s*;?\s*""".r
  private val ctasRe =
    """(?is)\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?([\w.]+)\s+USING\s+GEO\b(?:\s+LOCATION\s+'([^']+)')?\s+AS\s+((?:SELECT|WITH|FROM|TABLE|VALUES)\b.+)\s*;?\s*""".r
  private val mergeRe =
    """(?is)\s*MERGE\s+INTO\s+([\w.]+)(?:\s+(?:AS\s+)?(\w+))?\s+USING\s+(.+?)\s*;?\s*""".r
  private val dropRe =
    """(?is)\s*DROP\s+TABLE\s+(IF\s+EXISTS\s+)?([\w.]+)\s*;?\s*""".r
  // Captures the raw remainder; an optional outer paren pair is stripped in
  // code (stripOuterParens) because a trailing `\)?` in the regex steals the
  // closing paren of parameterized types: `ADD COLUMN price DECIMAL(10,2)`
  // must keep its `)`.
  // by-reference file onboarding (Iceberg add_files procedure as a SQL
  // verb): ALTER TABLE t ADD FILES 'p1'[, 'p2' ...]
  private val alterAddFilesRe =
    """(?is)\s*ALTER\s+TABLE\s+([\w.]+)\s+ADD\s+FILES\s+(.+?)\s*;?\s*""".r
  private val alterAddRe =
    """(?is)\s*ALTER\s+TABLE\s+([\w.]+)\s+ADD\s+COLUMNS?\s+(.+?)\s*;?\s*""".r

  /** Split "c TYPE DEFAULT <expr>" at the LAST top-level DEFAULT keyword —
    * quote-aware, so a DEFAULT inside a string literal (a comment text,
    * a string default) never splits. None = no DEFAULT clause. */
  private[tables] def splitDefault(ddl: String): Option[(String, String)] = {
    val up = ddl.toUpperCase
    var i = 0
    var inQ = false
    var last = -1
    while (i < ddl.length) {
      val ch = ddl.charAt(i)
      if (ch == '\'') inQ = !inQ
      else if (!inQ && (ch == 'D' || ch == 'd') &&
          up.startsWith("DEFAULT", i) &&
          i > 0 && ddl.charAt(i - 1).isWhitespace &&
          i + 7 < ddl.length && ddl.charAt(i + 7).isWhitespace)
        last = i
      i += 1
    }
    if (last < 0) None
    else Some((ddl.substring(0, last).trim, ddl.substring(last + 7).trim))
  }

  /** Split a column-list ddl on TOP-LEVEL commas only — quote- and
    * paren-aware, so `DECIMAL(10, 2)` and a `DEFAULT 'a,b'` literal
    * never split. The multi-column ADD COLUMNS front-end applies
    * [[splitDefault]] per clause through this. */
  private[tables] def splitTopLevelCommas(ddl: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    var inQ = false
    var start = 0
    var i = 0
    while (i < ddl.length) {
      ddl.charAt(i) match {
        case '\'' => inQ = !inQ
        case '(' if !inQ => depth += 1
        case ')' if !inQ => depth -= 1
        case ',' if !inQ && depth == 0 =>
          out += ddl.substring(start, i).trim
          start = i + 1
        case _ => ()
      }
      i += 1
    }
    out += ddl.substring(start).trim
    out.result().filter(_.nonEmpty)
  }
  private val alterDropRe =
    """(?is)\s*ALTER\s+TABLE\s+([\w.]+)\s+DROP\s+COLUMNS?\s+\(?\s*(\w+)\s*\)?\s*;?\s*""".r
  private val alterRenameRe =
    """(?is)\s*ALTER\s+TABLE\s+([\w.]+)\s+RENAME\s+COLUMN\s+(\w+)\s+TO\s+(\w+)\s*;?\s*""".r
  // partition-spec evolution (Iceberg REPLACE PARTITION FIELD analog,
  // whole-spec form): metadata-only — see GeoTable.setPartitionSpec
  private val alterSetPartRe =
    """(?is)\s*ALTER\s+TABLE\s+([\w.]+)\s+SET\s+PARTITIONED\s+BY\s*\((.*?)\)\s*;?\s*""".r
  /** A GEOMETRY spelling Spark's native parser does NOT know: bare
    * `GEOMETRY` or the quoted-CRS form `GEOMETRY('EPSG:...')`. The native
    * 4.1 grammar only accepts `GEOMETRY(<srid>)` / `GEOMETRY(ANY)`. */
  private val nonNativeGeomRe =
    """(?i)\bGEOMETRY\b(?!\s*\(\s*(?:\d+|ANY)\s*\))""".r

  private val cloneRe =
    """(?is)\s*CREATE\s+TABLE\s+([\w.]+)\s+SHALLOW\s+CLONE\s+([\w.]+)(?:\s+VERSION\s+AS\s+OF\s+(\d+))?\s*;?\s*""".r
  private val optimizeRe =
    """(?is)\s*OPTIMIZE\s+([\w.]+)(?:\s+INTO\s+(\d+)\s+FILES)?(?:\s+SMALL\s+BELOW\s+(\d+)\s+ROWS)?(?:\s+ZORDER\s+BY\s*\(([^)]+)\))?(?:\s+WHERE\s+(.+?))?\s*;?\s*""".r
  private val analyzeRe =
    """(?is)\s*ANALYZE\s+TABLE\s+([\w.]+)\s+COMPUTE\s+STATISTICS\s+FOR\s+(?:(ALL)\s+COLUMNS|COLUMNS\s+(.+?))\s*;?\s*""".r
  private val vacuumRe =
    """(?is)\s*VACUUM\s+([\w.]+)(?:\s+RETAIN\s+(\d+)\s+(VERSIONS|DAYS|HOURS))?\s*;?\s*""".r
  private val restoreRe =
    """(?is)\s*RESTORE\s+TABLE\s+([\w.]+)\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*""".r
  private val restoreRefRe =
    """(?is)\s*RESTORE\s+TABLE\s+([\w.]+)\s+TO\s+VERSION\s+AS\s+OF\s+'([^']+)'\s*;?\s*""".r
  private val restoreTsRe =
    """(?is)\s*RESTORE\s+TABLE\s+([\w.]+)\s+TO\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)'\s*;?\s*""".r
  // Delta-parity CHECK constraints: write-time row enforcement, stored in
  // the manifest, validated against existing rows at ADD
  private val addConstraintRe =
    """(?is)\s*ALTER\s+TABLE\s+([\w.]+)\s+ADD\s+CONSTRAINT\s+(\w+)\s+CHECK\s*\((.+)\)\s*;?\s*""".r
  private val dropConstraintRe =
    """(?is)\s*ALTER\s+TABLE\s+([\w.]+)\s+DROP\s+CONSTRAINT\s+(\w+)\s*;?\s*""".r
  private val createTagRe =
    """(?is)\s*ALTER\s+TABLE\s+([\w.]+)\s+CREATE\s+TAG\s+([\w.-]+)(?:\s+AS\s+OF\s+VERSION\s+(\d+))?\s*;?\s*""".r
  private val dropTagRe =
    """(?is)\s*ALTER\s+TABLE\s+([\w.]+)\s+DROP\s+TAG\s+([\w.-]+)\s*;?\s*""".r
  // persisted views on geo catalogs (Iceberg ViewCatalog analog; only
  // claimed when the leading part names a configured GeoCatalog — session
  // temp views and other catalogs keep Spark's native handling)
  private val createViewRe =
    """(?is)\s*CREATE\s+(OR\s+REPLACE\s+)?VIEW\s+(IF\s+NOT\s+EXISTS\s+)?([\w.]+)\s+AS\s+((?:SELECT|WITH|FROM|TABLE|VALUES)\b.+)\s*;?\s*""".r
  private val dropViewRe =
    """(?is)\s*DROP\s+VIEW\s+(IF\s+EXISTS\s+)?([\w.]+)\s*;?\s*""".r
  private val showViewsRe =
    """(?is)\s*SHOW\s+VIEWS\s+(?:IN|FROM)\s+([\w.]+)\s*;?\s*""".r
  private val showCreateViewRe =
    """(?is)\s*SHOW\s+CREATE\s+VIEW\s+([\w.]+)\s*;?\s*""".r
  // user table properties on PATH-registered tables (catalog names fall
  // through to Spark's native SET TBLPROPERTIES → alterTable(SetProperty))
  private val alterTableSetPropsRe =
    """(?is)\s*ALTER\s+TABLE\s+([\w.]+)\s+SET\s+TBLPROPERTIES\s*\((.+)\)\s*;?\s*""".r
  private val alterTableUnsetPropsRe =
    """(?is)\s*ALTER\s+TABLE\s+([\w.]+)\s+UNSET\s+TBLPROPERTIES\s*\((.+)\)\s*;?\s*""".r
  private val showTblPropsRe =
    """(?is)\s*SHOW\s+TBLPROPERTIES\s+([\w.]+)\s*;?\s*""".r
  private val showCreateTableRe =
    """(?is)\s*SHOW\s+CREATE\s+TABLE\s+([\w.]+)\s*;?\s*""".r
  private val alterViewSetRe =
    """(?is)\s*ALTER\s+VIEW\s+([\w.]+)\s+SET\s+TBLPROPERTIES\s*\((.+)\)\s*;?\s*""".r
  private val alterViewUnsetRe =
    """(?is)\s*ALTER\s+VIEW\s+([\w.]+)\s+UNSET\s+TBLPROPERTIES\s*\((.+)\)\s*;?\s*""".r
  private val renameViewRe =
    """(?is)\s*ALTER\s+VIEW\s+([\w.]+)\s+RENAME\s+TO\s+([\w.]+)\s*;?\s*""".r
  private val describeViewRe =
    """(?is)\s*DESC(?:RIBE)?\s+VIEW\s+([\w.]+)\s*;?\s*""".r
  private val createBranchRe =
    """(?is)\s*ALTER\s+TABLE\s+([\w.]+)\s+CREATE\s+BRANCH\s+([\w.-]+)\s*;?\s*""".r
  private val dropBranchRe =
    """(?is)\s*ALTER\s+TABLE\s+([\w.]+)\s+DROP\s+BRANCH\s+([\w.-]+)\s*;?\s*""".r
  private val publishBranchRe =
    """(?is)\s*ALTER\s+TABLE\s+([\w.]+)\s+PUBLISH\s+BRANCH\s+([\w.-]+)\s*;?\s*""".r

  /**
   * Root of a geo table named in SQL: the path registry first, then
   * `cat.db.t` against a configured [[GeoCatalog]]'s warehouse (only when
   * a manifest actually exists there — otherwise the statement is left to
   * Spark, whose catalog errors are the right ones for missing tables).
   * This is what gives catalog tables the same spatial DML surface as
   * registered ones: `UPDATE geo.db.t SET ... WHERE ST_Intersects(...)`.
   */
  def resolveRoot(name: String): Option[String] =
    GeoTable.registeredRoot(name).orElse(
      GeoCatalog.resolveWarehouseRoot(name).filter(root =>
        SparkSession.getActiveSession.exists(s =>
          GeoManifest.currentVersion(s, root).isDefined)))

  /** Parse a timestamp literal through Spark's own CAST, so every SQL
    * timestamp form and the session timezone behave exactly as
    * TIMESTAMP AS OF reads do. Quotes are escaped, so a stray `'` in the
    * input yields the named cannot-parse error instead of a confusing
    * SQL parse failure inside the probe query. Epoch milliseconds. */
  private[tables] def parseTimestampMs(spark: SparkSession, ts: String): Long = {
    val t = spark.sql(s"SELECT CAST('${ts.replace("'", "''")}' AS TIMESTAMP)")
      .head.getTimestamp(0)
    require(t != null, s"cannot parse timestamp '$ts'")
    t.getTime
  }

  /** The inverse convention for builder-authored cutoffs: epoch millis
    * rendered in UTC with millisecond precision — the one formatting the
    * older_than procedure surface round-trips through [[parseTimestampMs]]
    * on UTC sessions. */
  def formatUtcMillis(ms: Long): String = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss.SSS").withZone(java.time.ZoneOffset.UTC)
    .format(java.time.Instant.ofEpochMilli(ms))

  private[tables] def rootOf(name: String): String = resolveRoot(name).getOrElse(
    throw new IllegalArgumentException(s"'$name' is not a geo table"))

  /** Post-DML refresh: registered names keep their temp-view snapshot in
    * sync; catalog-qualified names need nothing (the catalog re-reads the
    * manifest on every resolution). */
  private[tables] def refresh(spark: SparkSession, name: String, root: String): Unit =
    if (GeoTable.registeredRoot(name).isDefined) GeoTable.register(spark, name, root)

  /** Front-half: our command when the statement targets a geo table.
    * Any parse-time failure inside our regex front-half falls through to
    * `None` — Spark's parser then owns the statement (strict bail: a
    * statement we can't cleanly parse is never half-claimed). */
  def maybeCommand(sqlText: String): Option[LogicalPlan] =
    try maybeCommandUnsafe(sqlText)
    catch { case scala.util.control.NonFatal(_) => None }

  private def maybeCommandUnsafe(sqlText: String): Option[LogicalPlan] = sqlText match {
    case ctasRe(name, location, query) =>
      Some(GeoCtasCommand(name, Option(location), query))
    case createRe(name, colsDdl, tail) =>
      // the CREATE front-end exists to paper over Spark's parser not
      // spelling GEOMETRY; when the statement targets a configured
      // GeoCatalog AND the session's parser can take it natively
      // (spark.sql.geospatial.enabled, and every GEOMETRY is in the
      // native parenthesized spelling GEOMETRY(srid)/GEOMETRY(ANY) — the
      // 4.1 grammar has no bare GEOMETRY or quoted-CRS form), step
      // aside: GeoCatalog.createTable maps the native GeometryType to
      // tagged BINARY with full analyzer checks
      if (GeoCatalog.resolveWarehouseRoot(name).isDefined &&
          nonNativeGeomRe.findFirstIn(colsDdl).isEmpty &&
          (SparkSession.getActiveSession.exists(
            _.conf.get("spark.sql.geospatial.enabled", "false").toBoolean) ||
           // a DEFAULT clause needs Spark's parser (the front-end's
           // fromDdl cannot spell it); the catalog's declared
           // SUPPORT_COLUMN_DEFAULT_VALUE capability takes it natively
           (splitDefault(colsDdl).isDefined &&
            !"(?i)\\bGEOMETRY\\b".r.unanchored.matches(colsDdl)))) None
      else {
        val (parts, props, location, leftover) = parseCreateTail(tail)
        if (leftover.nonEmpty) None // unknown tail clause: Spark owns it
        // catalog names keep Spark's NATIVE CREATE for PARTITIONED BY /
        // TBLPROPERTIES (full analyzer checks, transform hints,
        // createTable's config routing) — the front-end's extended tail
        // exists for PATH tables, which have no native CREATE at all.
        // EXCEPT when a column uses a spelling the native grammar lacks
        // (bare GEOMETRY / quoted-CRS — SHOW CREATE TABLE emits the
        // latter): native would parse-error, so the front-end owns it
        else if (GeoCatalog.resolveWarehouseRoot(name).isDefined &&
                 (parts.nonEmpty || props.nonEmpty) &&
                 nonNativeGeomRe.findFirstIn(colsDdl).isEmpty) None
        else Some(GeoCreateTableCommand(name, colsDdl, location, parts, props))
      }
    // UPDATE/DELETE/MERGE: only PATH-REGISTERED tables use this front-end;
    // catalog tables (geo.db.t) run Spark's native row-level path
    // (SupportsRowLevelOperations on GeoV2Table) with full analyzer checks
    case mergeRe(name, alias, rest) if GeoTable.registeredRoot(name).isDefined =>
      parseMerge(name, Option(alias), rest)
    case dropRe(_, name) if GeoTable.registeredRoot(name).isDefined =>
      Some(GeoDropTableCommand(name))
    case alterAddFilesRe(name, pathsSql) if resolveRoot(name).isDefined =>
      // claim the statement even when no quoted path parsed: the command
      // then fails at execution with the REAL problem (quoting) instead
      // of falling through to Spark's parser and its unrelated syntax
      // error (maybeCommand swallows parse-time throws by design)
      Some(GeoAddFilesCommand(name,
        "'([^']+)'".r.findAllMatchIn(pathsSql).map(_.group(1)).toSeq))
    case alterAddRe(name, colDdl) if GeoTable.registeredRoot(name).isDefined =>
      // path-registered tables have no Spark-native ALTER path, so the
      // front-end owns the DEFAULT spelling too; catalog names
      // deliberately fall through to Spark's own parser, whose DEFAULT
      // support rides the catalog's declared SUPPORT_COLUMN_DEFAULT_VALUE
      // capability (every spelling works). DEFAULT detection is PER
      // COLUMN CLAUSE (top-level-comma split), so the multi-column form
      // `ADD COLUMNS (a INT DEFAULT 5, b INT)` parses each clause on its
      // own instead of splitting at the statement's last DEFAULT
      val clauses = splitTopLevelCommas(stripOuterParens(colDdl))
      val cols = clauses.map(c => GeoSql.splitDefault(c) match {
        case Some((cd, dflt)) => cd -> Some(dflt)
        case None => c -> None
      })
      if (cols.exists(_._2.isDefined)) Some(GeoAlterAddDefaultCommand(name, cols))
      else Some(GeoAlterAddCommand(name, stripOuterParens(colDdl)))
    case alterDropRe(name, colName) if GeoTable.registeredRoot(name).isDefined =>
      Some(GeoAlterDropCommand(name, colName))
    case alterRenameRe(name, from, to) if GeoTable.registeredRoot(name).isDefined =>
      Some(GeoAlterRenameCommand(name, from, to))
    case alterSetPartRe(name, transforms) if resolveRoot(name).isDefined =>
      Some(GeoSetPartitionSpecCommand(name, transforms))
    case cloneRe(target, source, v) if resolveRoot(source).isDefined =>
      Some(GeoCloneCommand(target, source, Option(v).map(_.toInt)))
    case optimizeRe(name, nFiles, smallRows, zorder, where) if resolveRoot(name).isDefined =>
      Some(GeoOptimizeCommand(name, Option(nFiles).map(_.toInt), Option(where),
        Option(zorder).toSeq.flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty),
        Option(smallRows).map(_.toLong)))
    case analyzeRe(name, all, colsCsv) if resolveRoot(name).isDefined =>
      Some(GeoAnalyzeCommand(name,
        if (all != null) Seq.empty
        else colsCsv.split(',').map(_.trim).filter(_.nonEmpty).toSeq))
    case vacuumRe(name, keep, unit) if resolveRoot(name).isDefined =>
      Some(GeoVacuumCommand(name, Option(keep).map(_.toInt),
        Option(unit).map(_.toUpperCase).getOrElse("VERSIONS")))
    case restoreRe(name, v) if resolveRoot(name).isDefined =>
      Some(GeoRestoreCommand(name, Left(v.toInt)))
    case restoreRefRe(name, ref) if resolveRoot(name).isDefined =>
      Some(GeoRestoreRefCommand(name, ref))
    case restoreTsRe(name, ts) if resolveRoot(name).isDefined =>
      Some(GeoRestoreCommand(name, Right(ts)))
    case addConstraintRe(name, cname, checkSql) if resolveRoot(name).isDefined =>
      Some(GeoAddConstraintCommand(name, cname, checkSql.trim))
    case dropConstraintRe(name, cname) if resolveRoot(name).isDefined =>
      Some(GeoDropConstraintCommand(name, cname))
    case createTagRe(name, tag, v) if resolveRoot(name).isDefined =>
      Some(GeoCreateTagCommand(name, tag, Option(v).map(_.toInt)))
    case dropTagRe(name, tag) if resolveRoot(name).isDefined =>
      Some(GeoDropTagCommand(name, tag))
    case createBranchRe(name, b) if resolveRoot(name).isDefined =>
      Some(GeoBranchCommand(name, b, "create"))
    case dropBranchRe(name, b) if resolveRoot(name).isDefined =>
      Some(GeoBranchCommand(name, b, "drop"))
    case publishBranchRe(name, b) if resolveRoot(name).isDefined =>
      Some(GeoBranchCommand(name, b, "publish"))
    // path tables only: Spark owns the catalog spelling natively. Matched
    // BEFORE the view regexes cannot collide (ALTER TABLE vs ALTER VIEW).
    // the pair list parses in execute(), not here: a malformed entry must
    // surface the residue error, not silently bail the whole statement to
    // Spark (which cannot see path tables anyway)
    case alterTableSetPropsRe(name, propsSql) if GeoTable.registeredRoot(name).isDefined =>
      Some(GeoSetTblPropsCommand(name, propsSql, unset = false))
    case alterTableUnsetPropsRe(name, propsSql) if GeoTable.registeredRoot(name).isDefined =>
      Some(GeoSetTblPropsCommand(name, propsSql, unset = true))
    case showTblPropsRe(name) if GeoTable.registeredRoot(name).isDefined =>
      Some(GeoShowTblPropsCommand(name))
    // path-registered AND catalog geo names: Spark's native V2 SHOW
    // CREATE cannot round-trip (it emits the derived props — which
    // CREATE rightly refuses as reserved — and flattens GEOMETRY CRS
    // typing to BINARY), so this front-end owns both spellings and emits
    // the replayable form
    case showCreateTableRe(name) if resolveRoot(name).isDefined =>
      Some(GeoShowCreateTableCommand(name))
    case createViewRe(orReplace, ifNotExists, name, query) if geoViewCatalog(name) =>
      Some(GeoCreateViewCommand(name, query.trim,
        orReplace != null, ifNotExists != null))
    case dropViewRe(ifExists, name) if geoViewCatalog(name) =>
      Some(GeoDropViewCommand(name, ifExists != null))
    case showCreateViewRe(name) if geoViewCatalog(name) =>
      Some(GeoShowCreateViewCommand(name))
    case alterViewSetRe(name, propsSql) if geoViewCatalog(name) =>
      Some(GeoAlterViewPropsCommand(name, propsSql, unset = false))
    case renameViewRe(name, newName) if geoViewCatalog(name) =>
      Some(GeoRenameViewCommand(name, newName))
    case describeViewRe(name) if geoViewCatalog(name) =>
      Some(GeoDescribeViewCommand(name))
    case alterViewUnsetRe(name, propsSql) if geoViewCatalog(name) =>
      Some(GeoAlterViewPropsCommand(name, propsSql, unset = true))
    case showViewsRe(nsName) if SparkSession.getActiveSession.exists(s =>
        GeoViews.warehouseFor(s, nsName.split('.').head).isDefined) =>
      Some(GeoShowViewsCommand(nsName))
    case insertRe(name, colList, query) if GeoTable.registeredRoot(name).isDefined =>
      Some(GeoInsertCommand(name, query,
        Option(colList).map(_.split(',').map(_.trim).toSeq).getOrElse(Seq.empty)))
    case updateRe(name, rest) if GeoTable.registeredRoot(name).isDefined =>
      // split SET clause from WHERE quote/paren-aware: a WHERE inside a
      // string literal must not split the statement
      val (setsSql, condSql) = splitAtKeyword(rest, "WHERE")
      Some(GeoUpdateCommand(name, splitAssignments(setsSql), condSql))
    case deleteRe(name, rest) if GeoTable.registeredRoot(name).isDefined =>
      val trimmed = rest.trim
      if (trimmed.isEmpty) Some(GeoDeleteCommand(name, None))
      else {
        val (pre, condSql) = splitAtKeyword(rest, "WHERE")
        if (pre.trim.nonEmpty || condSql.isEmpty) None // junk between table and WHERE
        else Some(GeoDeleteCommand(name, condSql))
      }
    case _ => None
  }

  /** CREATE TABLE guards (front-end paths that bypass
    * GeoCatalog.createTable): a table must not shadow a view. */
  private[tables] def requireNoView(spark: SparkSession, name: String): Unit = {
    val parts = name.split('.').toSeq
    if (parts.length >= 2)
      GeoViews.warehouseFor(spark, parts.head).foreach { wh =>
        require(!GeoViews.exists(spark, wh, parts.tail.init, parts.last),
          s"$name already exists as a VIEW")
      }
  }

  /** `cat.db.v` targets a configured GeoCatalog (the view verbs' gate). */
  private def geoViewCatalog(name: String): Boolean = {
    val parts = name.split('.')
    parts.length >= 2 && SparkSession.getActiveSession.exists(s =>
      GeoViews.warehouseFor(s, parts.head).isDefined)
  }

  /** Strips ONE outer paren pair iff it is balanced around the whole
    * string: `(a INT, b STRING)` → `a INT, b STRING`, but
    * `price DECIMAL(10,2)` and `(a INT), (b INT)` are untouched. */
  private[graft] def stripOuterParens(s0: String): String = {
    val s = s0.trim
    if (s.length < 2 || s.charAt(0) != '(' || s.charAt(s.length - 1) != ')') return s
    var depth = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '(') depth += 1
      else if (c == ')') {
        depth -= 1
        if (depth == 0 && i != s.length - 1) return s // outer '(' closes early
      }
      i += 1
    }
    if (depth == 0) s.substring(1, s.length - 1).trim else s
  }

  /** Split `s` at the first top-level (not in quotes/parens) occurrence of
    * the keyword (word-bounded, case-insensitive). Returns (before, after)
    * with after = None when the keyword is absent. */
  private[tables] def splitAtKeyword(s: String, kw: String): (String, Option[String]) = {
    var depth = 0; var quote: Char = 0; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0; i += 1 }
      else c match {
        case '\'' | '"' | '`' => quote = c; i += 1
        case '(' => depth += 1; i += 1
        case ')' => depth -= 1; i += 1
        case _ if depth == 0 && s.regionMatches(true, i, kw, 0, kw.length) &&
          (i == 0 || !Character.isLetterOrDigit(s.charAt(i - 1))) &&
          (i + kw.length >= s.length || !Character.isLetterOrDigit(s.charAt(i + kw.length))) =>
          return (s.substring(0, i).trim, Some(s.substring(i + kw.length).trim).filter(_.nonEmpty))
        case _ => i += 1
      }
    }
    (s.trim, None)
  }

  /** Run a statement through the geo front-half, else plain spark.sql —
    * works on any session, extension or not. */
  def exec(spark: SparkSession, sqlText: String): DataFrame =
    maybeCommand(sqlText) match {
      case Some(cmd: GeoRunnable) =>
        val rows = cmd.execute(spark)
        // schema from the command's own declared output (ANALYZE returns
        // (column, ndv) rows; everything else num_affected_rows)
        spark.createDataFrame(java.util.Arrays.asList(rows: _*),
          StructType(cmd.output.map(a =>
            org.apache.spark.sql.types.StructField(a.name, a.dataType, a.nullable))))
      case _ => spark.sql(sqlText)
    }

  /** `a = e1, b = e2` -> Seq(a -> "e1", b -> "e2"); commas inside
    * parens/quotes don't split. */
  private[tables] def splitAssignments(s: String): Seq[(String, String)] =
    splitTop(s, ',').map { a =>
      val i = topLevelEq(a)
      require(i > 0, s"bad SET assignment: '$a'")
      (a.substring(0, i).trim, a.substring(i + 1).trim)
    }

  /** Index of the first top-level '=' (not inside parens/quotes, not part
    * of <=, >=, !=, ==). */
  private def topLevelEq(s: String): Int = {
    var depth = 0; var quote: Char = 0; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else c match {
        case '\'' | '"' | '`' => quote = c
        case '(' => depth += 1
        case ')' => depth -= 1
        case '=' if depth == 0 =>
          val prev = if (i > 0) s.charAt(i - 1) else ' '
          val next = if (i + 1 < s.length) s.charAt(i + 1) else ' '
          if (prev != '<' && prev != '>' && prev != '!' && prev != '=' && next != '=') return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  // --- keyed-DML detection (the equality-delete SQL surface) ---

  private val keyedInRe = """(?is)\s*(\w+)\s+IN\s*\((.+)\)\s*""".r

  /** True when `e` parses as an expression referencing no column. */
  private def literalOnly(e: String): Boolean =
    try org.apache.spark.sql.graft.GraftShim.expression(expr(e)).collectFirst {
      case _: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute => ()
    }.isEmpty
    catch { case scala.util.control.NonFatal(_) => false }

  /** `(key column, keys producer)` when a DELETE condition is a pure
    * keyed IN predicate — `k IN (literal, ...)` or `k IN (SELECT ...)`
    * on one column with column-free values. These take the equality-
    * delete path: an O(keys) sidecar commit instead of a scan-and-
    * rewrite (Iceberg's write mode for keyed deletes). A bare
    * `col = literal` deliberately keeps the classic path — its
    * num_affected_rows contract (matched ROWS) is too established to
    * quietly change to filed keys. */
  private[tables] def keyedDeleteSpec(spark: SparkSession, condSql: String)
      : Option[(String, SparkSession => DataFrame)] = condSql match {
    case keyedInRe(c, inner)
        if inner.trim.matches("(?is)(SELECT|WITH|FROM|TABLE|VALUES)\\b.*") =>
      Some((c, s => s.sql(inner)))
    case keyedInRe(c, inner) =>
      val vals = splitTop(inner, ',')
      if (vals.nonEmpty && vals.forall(literalOnly))
        Some((c, s => s.sql(s"SELECT explode(array(${vals.mkString(", ")})) AS k")))
      else None
    case _ => None
  }

  private def splitAllAnd(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var remaining: Option[String] = Some(s)
    while (remaining.isDefined) {
      val (part, next) = splitAtKeyword(remaining.get, "AND")
      if (part.nonEmpty) out += part
      remaining = next
    }
    out.result()
  }

  private val aliasedEqRe = """(?is)\s*(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)\s*""".r

  /** Key columns when a MERGE is exactly the keyed-upsert shape —
    * ON a conjunction of `t.k = s.k`, one unconditional full-row UPDATE
    * (every non-key column set to the source's same-named column) and
    * one unconditional INSERT * — the statement [[GeoTable.upsertByKey]]
    * implements in O(rows) with no target scan. Anything else: None
    * (the broadcast-source CoW merge handles it). */
  private[tables] def keyedUpsertSpec(schema: StructType, tAlias: String, sAlias: String,
                                      onSql: String, clauses: Seq[MergeClauseSpec])
      : Option[Seq[String]] = {
    val keyCols = splitAllAnd(onSql).map {
      case aliasedEqRe(a1, c1, a2, c2) if c1.equalsIgnoreCase(c2) &&
          ((a1.equalsIgnoreCase(tAlias) && a2.equalsIgnoreCase(sAlias)) ||
            (a1.equalsIgnoreCase(sAlias) && a2.equalsIgnoreCase(tAlias))) =>
        schema.fields.find(_.name.equalsIgnoreCase(c1)).map(_.name)
      case _ => None
    }
    if (keyCols.isEmpty || keyCols.exists(_.isEmpty)) return None
    val keys = keyCols.flatten
    if (keys.exists(k => GeoSchema.isGeometry(schema(k)))) return None
    val (updates, inserts, others) = {
      val u = clauses.collect { case c: MergeUpdateSpec => c }
      val i = clauses.collect { case c: MergeInsertSpec => c }
      val o = clauses.filterNot(c => c.isInstanceOf[MergeUpdateSpec] ||
        c.isInstanceOf[MergeInsertSpec])
      (u, i, o)
    }
    if (others.nonEmpty || updates.length != 1 || inserts.length != 1) return None
    if (updates.head.cond.isDefined || inserts.head.cond.isDefined) return None
    if (inserts.head != MergeInsertSpec(None, None, None)) return None // INSERT * only
    val sets = updates.head.sets
    def isSourceRef(v: String, c: String): Boolean = {
      val t = v.trim
      t.equalsIgnoreCase(c) || t.equalsIgnoreCase(s"$sAlias.$c")
    }
    // every SET must assign a table column its source value; every
    // non-key column must be covered (keys are equal by the ON clause)
    val keySet = keys.map(_.toLowerCase).toSet
    val covered = sets.map { case (n, v) =>
      schema.fields.find(_.name.equalsIgnoreCase(n)) match {
        case Some(f) if isSourceRef(v, f.name) => Some(f.name.toLowerCase)
        case _ => None
      }
    }
    if (covered.exists(_.isEmpty)) return None
    val coveredSet = covered.flatten.toSet
    val needed = schema.fieldNames.map(_.toLowerCase).filterNot(keySet).toSet
    if (needed.subsetOf(coveredSet)) Some(keys) else None
  }

  // --- MERGE clause specs (raw SQL fragments; resolved with expr() at run) ---
  sealed trait MergeClauseSpec { def cond: Option[String] }
  final case class MergeUpdateSpec(cond: Option[String], sets: Seq[(String, String)]) extends MergeClauseSpec
  final case class MergeDeleteSpec(cond: Option[String]) extends MergeClauseSpec
  /** `values = None` means INSERT * ; `cols = None` with values means positional. */
  final case class MergeInsertSpec(cond: Option[String], cols: Option[Seq[String]],
                                   values: Option[Seq[String]]) extends MergeClauseSpec

  private val updateActRe = """(?is)\s*UPDATE\s+SET\s+(.+)\s*""".r
  private val deleteActRe = """(?is)\s*DELETE\s*""".r
  private val insertStarRe = """(?is)\s*INSERT\s+\*\s*""".r
  private val insertValsRe = """(?is)\s*INSERT\s*(?:\(([\w\s,]+)\)\s*)?VALUES\s*\((.+)\)\s*""".r

  /** Parse everything after `MERGE INTO name [alias] USING`:
    * `<source> ON <cond> WHEN [NOT] MATCHED [AND c] THEN <action> ...` */
  private[tables] def parseMerge(name: String, targetAlias: Option[String],
                                 rest: String): Option[LogicalPlan] = {
    val (srcPart, afterOnOpt) = splitAtKeyword(rest, "ON")
    val afterOn = afterOnOpt.getOrElse(return None)
    val (onSql, whenTextOpt) = splitAtKeyword(afterOn, "WHEN")
    val whenText = whenTextOpt.getOrElse(return None)
    if (onSql.isEmpty) return None

    // source: `(subquery) [AS] alias` or `table [AS] alias`
    val (sourceQuery, isSubquery, sourceAlias) =
      if (srcPart.startsWith("(")) {
        val close = matchParen(srcPart, 0)
        if (close < 0) return None
        val alias = srcPart.substring(close + 1).trim.replaceAll("(?i)^AS\\s+", "")
        (srcPart.substring(1, close).trim, true, Some(alias).filter(_.nonEmpty))
      } else {
        val toks = srcPart.split("\\s+").toSeq.filter(_.nonEmpty)
        toks match {
          case Seq(t) => (t, false, None)
          case Seq(t, a) => (t, false, Some(a))
          case Seq(t, as, a) if as.equalsIgnoreCase("AS") => (t, false, Some(a))
          case _ => return None
        }
      }

    // split the WHEN chain (quote/paren-aware)
    val clauseTexts = Seq.newBuilder[String]
    var remaining: Option[String] = Some(whenText)
    while (remaining.isDefined) {
      val (c, next) = splitAtKeyword(remaining.get, "WHEN")
      if (c.nonEmpty) clauseTexts += c
      remaining = next
    }

    val clauses = clauseTexts.result().map { clause =>
      val (head, actionOpt) = splitAtKeyword(clause, "THEN")
      val action = actionOpt.getOrElse(return None)
      val (matchedKw, condSql) = splitAtKeyword(head, "AND")
      val isNot = matchedKw.matches("(?is)\\s*NOT\\s+MATCHED(\\s+BY\\s+TARGET)?\\s*")
      val isMatched = matchedKw.matches("(?is)\\s*MATCHED\\s*")
      if (!isNot && !isMatched) return None
      action match {
        case updateActRe(sets) if isMatched => MergeUpdateSpec(condSql, splitAssignments(sets))
        case deleteActRe() if isMatched => MergeDeleteSpec(condSql)
        case insertStarRe() if isNot => MergeInsertSpec(condSql, None, None)
        case insertValsRe(cols, vals) if isNot =>
          MergeInsertSpec(condSql,
            Option(cols).map(_.split(',').map(_.trim).toSeq.filter(_.nonEmpty)),
            Some(splitTop(vals, ',')))
        case _ => return None
      }
    }
    if (clauses.isEmpty) None
    else Some(GeoMergeCommand(name, targetAlias, sourceQuery, isSubquery, sourceAlias,
      onSql, clauses))
  }

  /** Index of the ')' matching the '(' at `open`, or -1 (quote-aware). */
  private def matchParen(s: String, open: Int): Int = {
    var depth = 0; var quote: Char = 0; var i = open
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else c match {
        case '\'' | '"' | '`' => quote = c
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  private[tables] def splitTop(s: String, sep: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; var quote: Char = 0; var start = 0; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else c match {
        case '\'' | '"' | '`' => quote = c
        case '(' => depth += 1
        case ')' => depth -= 1
        case `sep` if depth == 0 => out += s.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(start)
    out.result().map(_.trim).filter(_.nonEmpty)
  }
}

/** Common shape: eager command returning `num_affected_rows`. */
sealed trait GeoRunnable extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("num_affected_rows", LongType, nullable = false)())
  def execute(spark: SparkSession): Seq[Row]
  override def run(sparkSession: SparkSession): Seq[Row] = execute(sparkSession)
}

/** CREATE TABLE ... USING GEO: GEOMETRY columns become tagged BINARY
  * (GeoSchema.fromDdl); default location under the warehouse dir. */
case class GeoCreateTableCommand(name: String, colsDdl: String,
                                 location: Option[String],
                                 partitionsDdl: Seq[String] = Seq.empty,
                                 tblProps: Seq[(String, String)] = Seq.empty)
    extends GeoRunnable {
  override def execute(spark: SparkSession): Seq[Row] = {
    GeoSql.requireNoView(spark, name)
    val props = tblProps.toMap
    // per-clause DEFAULT handling (the spelling SHOW CREATE emits, so
    // DEFAULT-bearing DDL round-trips): fromDdl cannot spell DEFAULT, so
    // strip it per top-level clause and fold it exactly as ADD COLUMN
    // ... DEFAULT does — both metadata keys pinned at CREATE (no
    // pre-column files exist yet, but one rule beats two)
    val schema0 = org.apache.spark.sql.types.StructType(
      GeoSql.splitTopLevelCommas(colsDdl).flatMap { clause =>
        val (colDdl, dflt) = GeoSql.splitDefault(clause) match {
          case Some((cd, d)) => (cd, Some(d))
          case None => (clause, None)
        }
        GeoSchema.fromDdl(colDdl).fields.map { f =>
          dflt match {
            case None => f
            case Some(sql) =>
              require(!GeoSchema.isGeometry(f),
                "a GEOMETRY column cannot carry a DEFAULT")
              val folded = GeoTable.foldedDefault(spark, sql, f.dataType)
              f.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
                .withMetadata(f.metadata)
                .putString("EXISTS_DEFAULT", folded.sql)
                .putString("CURRENT_DEFAULT", sql)
                .build())
          }
        }
      }.toArray)
    // TBLPROPERTIES('geometry.column'='g') tags an untyped BINARY column
    // (catalog-createTable parity); a GEOMETRY-typed column wins
    val propGeom = props.get(GeoCatalog.GeomColProp).filter(_.nonEmpty)
    val schema = propGeom.filterNot(g =>
        GeoSchema.geometryColumns(schema0).exists(_._1 == g))
      .foldLeft(schema0) { (sch, g) =>
        org.apache.spark.sql.types.StructType(sch.fields.map(f =>
          if (f.name == g) f.copy(metadata = GeoSchema.geometryMetadata(base = f.metadata))
          else f))
      }
    val geomCol = propGeom.orElse(GeoSchema.geometryColumns(schema).headOption.map(_._1))
    val catalogRoot = GeoCatalog.resolveWarehouseRoot(name)
    val root = location.orElse(catalogRoot).getOrElse {
      val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
      s"$wh/geo/${name.replace('.', '_')}"
    }
    if (GeoManifest.currentVersion(spark, root).isEmpty) {
      val layout = partitionsDdl.map(GeoPartition.decode)
      // stats.columns pins the stats set ('' disables); absent = the same
      // automatic default as the catalog's createTable
      val statsT = props.get("stats.columns") match {
        case Some(csv) => csv.split(',').map(_.trim).filter(_.nonEmpty).toSeq
          .map(c => GeoPartition.PTransform("stats", 0, c))
        case None =>
          if (spark.conf.get("spark.graft.stats.auto", "true").toBoolean)
            GeoPartition.statsFor(schema, layout)
          else Seq.empty
      }
      val sortT = props.get("sort.order").toSeq
        .flatMap(_.split(',').map(_.trim).filter(_.nonEmpty))
        .map(c => GeoPartition.PTransform("sort", 0, c))
      // user props = everything that is not a routed config key
      val configKeys = Set(GeoCatalog.GeomColProp, "stats.columns", "sort.order",
        "bloom.columns", "bloom.fpp", "bloom.items")
      val checkProps = props.keys.filter(_.startsWith("graft.constraints.")).toSeq
      val userProps = props -- configKeys -- checkProps
      GeoTable.createEmpty(spark, root, schema, geomCol,
        layout ++ statsT ++ sortT, props = userProps)
      if (props.get("bloom.columns").exists(_.nonEmpty))
        GeoTable.setBloomColumns(spark, root, props("bloom.columns"),
          props.get("bloom.fpp"), props.get("bloom.items"))
      // CHECK constraints Delta-style ('graft.constraints.<name>'='expr'
      // — the spelling SHOW CREATE TABLE emits); the table is empty, so
      // ADD-time validation is trivially green
      checkProps.sorted.foreach { k =>
        GeoTable.addCheckConstraint(spark, root,
          k.stripPrefix("graft.constraints."), props(k))
      }
    }
    // catalog-qualified names resolve through GeoCatalog (stateless over
    // the warehouse dir); only plain names get the registry + temp view
    if (catalogRoot.isEmpty) GeoTable.register(spark, name, root)
    Seq(Row(0L))
  }
}

case class GeoInsertCommand(name: String, query: String,
                            columns: Seq[String] = Seq.empty) extends GeoRunnable {
  override def execute(spark: SparkSession): Seq[Row] = {
    val root = GeoSql.rootOf(name)
    val src = spark.sql(query)
    // explicit column list: reorder to table order, NULL-fill the rest
    val aligned =
      if (columns.isEmpty) src
      else {
        val schema = GeoManifest.read(spark, root).schema
        val bad = columns.filterNot(c => schema.fieldNames.exists(_.equalsIgnoreCase(c)))
        require(bad.isEmpty, s"INSERT column(s) not in table: ${bad.mkString(", ")}")
        require(columns.length == src.columns.length,
          s"INSERT lists ${columns.length} columns but the query produces ${src.columns.length}")
        // positional rename first: unaliased query columns may contain
        // dots/parens that Dataset.apply would parse as nested paths
        val renamed = src.toDF(columns: _*)
        renamed.select(schema.fields.toSeq.map { f =>
          columns.find(_.equalsIgnoreCase(f.name)) match {
            case Some(c) => renamed(c).as(f.name)
            // an omitted column fills its declared DEFAULT (the same
            // CURRENT_DEFAULT the catalog path resolves through Spark's
            // analyzer) — writing NULL would contradict the column's
            // contract and EXISTS_DEFAULT could not repair a physically
            // written NULL
            case None if f.metadata.contains("CURRENT_DEFAULT") =>
              expr(f.metadata.getString("CURRENT_DEFAULT")).cast(f.dataType).as(f.name)
            case None => org.apache.spark.sql.functions.lit(null).cast(f.dataType).as(f.name)
          }
        }: _*)
      }
    val n = GeoTable.append(spark, root, aligned)
    GeoSql.refresh(spark, name, root)
    Seq(Row(n))
  }
}

case class GeoUpdateCommand(name: String, sets: Seq[(String, String)],
                            condSql: Option[String]) extends GeoRunnable {
  override def execute(spark: SparkSession): Seq[Row] = {
    val root = GeoSql.rootOf(name)
    val n = GeoTable.update(spark, root,
      sets.map { case (c, v) => c -> expr(v) },
      condSql.map(expr).getOrElse(lit(true)))
    GeoSql.refresh(spark, name, root)
    Seq(Row(n))
  }
}

/** DELETE FROM t [WHERE cond]. A condition shaped `k IN (<literals>)`,
  * `k IN (<subquery>)` or `k = <literal>` on one scalar column takes the
  * EQUALITY-DELETE path: an O(keys) key-sidecar commit, no scan, no
  * data-file rewrite (the mode Iceberg picks for keyed predicates —
  * num_affected_rows then reports filed KEY TUPLES, since nothing
  * counted the matching rows). Every other condition runs the existing
  * CoW/MoR rewrite. */
case class GeoDeleteCommand(name: String, condSql: Option[String]) extends GeoRunnable {
  override def execute(spark: SparkSession): Seq[Row] = {
    val root = GeoSql.rootOf(name)
    val n = condSql.flatMap(GeoSql.keyedDeleteSpec(spark, _)) match {
      case Some((keyCol, keys)) =>
        val m = GeoManifest.read(spark, root)
        if (m.schema.fields.exists(f => f.name.equalsIgnoreCase(keyCol) &&
            !GeoSchema.isGeometry(f)))
          GeoTable.deleteByKey(spark, root, Seq(keyCol), keys(spark).toDF(keyCol))
        else GeoTable.delete(spark, root, expr(condSql.get))
      case None => GeoTable.delete(spark, root, condSql.map(expr).getOrElse(lit(true)))
    }
    GeoSql.refresh(spark, name, root)
    Seq(Row(n))
  }
}

/** CREATE TABLE ... USING GEO AS SELECT ... — the reference's CTAS leg
  * (reference: example/.../App.scala:77 `CREATE TABLE ... USING ICEBERG AS
  * SELECT l.id id, r.geo geo FROM ...`). Geometry columns are found from
  * propagated GEOMETRY field metadata (selecting a geo table's column keeps
  * its tag); untagged BINARY outputs (e.g. a raw ST_Point(...) projection)
  * are sniffed from a 32-row sample — first column whose values parse as
  * WKB wins. */
case class GeoCtasCommand(name: String, location: Option[String],
                          query: String) extends GeoRunnable {
  override def execute(spark: SparkSession): Seq[Row] = {
    GeoSql.requireNoView(spark, name)
    val df = spark.sql(query)
    val geomCol = GeoSchema.geometryColumns(df.schema).headOption.map(_._1)
      .orElse(sniffGeometry(df))
    val catalogRoot = GeoCatalog.resolveWarehouseRoot(name)
    val root = location.orElse(catalogRoot).getOrElse {
      val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
      s"$wh/geo/${name.replace('.', '_')}"
    }
    if (GeoManifest.currentVersion(spark, root).isEmpty)
      GeoTable.create(spark, root, df, geomCol)
    if (catalogRoot.isEmpty) GeoTable.register(spark, name, root)
    Seq(Row(GeoManifest.read(spark, root).totalRows))
  }

  private def sniffGeometry(df: DataFrame): Option[String] = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.BinaryType
    val bins = df.schema.fields
      .filter(f => f.dataType == BinaryType && !f.metadata.contains(GeoSchema.TypeKey))
      .map(_.name).toSeq
    if (bins.isEmpty) None
    else {
      val sample = df.select(bins.map(col): _*).limit(32).collect()
      bins.find { b =>
        sample.iterator.map(_.getAs[Array[Byte]](b)).exists { v =>
          v != null && (try { graft.geom.Geom.deserialize(v); true }
          catch { case scala.util.control.NonFatal(_) => false })
        }
      }
    }
  }
}

/** MERGE INTO: delegates to GeoTable.merge (broadcast-source COW upsert).
  * Fragments are re-parsed by Spark's own expression parser, so the full
  * ST_ catalog works in ON / AND / SET / VALUES positions. */
case class GeoMergeCommand(name: String, targetAlias: Option[String],
                           sourceQuery: String, isSubquery: Boolean,
                           sourceAlias: Option[String], onSql: String,
                           clauses: Seq[GeoSql.MergeClauseSpec]) extends GeoRunnable {
  import GeoSql._
  override def execute(spark: SparkSession): Seq[Row] = {
    val root = GeoSql.rootOf(name)
    // alias-free qualified refs would misparse with dotted names; fall back
    // to the last identifier segment as the implicit alias
    val tAlias = targetAlias.getOrElse(name.split('.').last)
    val sAlias = sourceAlias.getOrElse(if (isSubquery) "s" else sourceQuery.split('.').last)
    val source = if (isSubquery) spark.sql(sourceQuery) else spark.table(sourceQuery)
    val schema = GeoManifest.read(spark, root).schema
    // keyed-upsert fast path: ON t.k = s.k + unconditional full-row
    // UPDATE + INSERT * is exactly upsertByKey — an O(rows) equality-
    // delete + append commit, no target scan or file rewrite. Duplicate
    // source keys fall back to the probing merge (which raises the
    // cardinality violation when a target row matches twice).
    GeoSql.keyedUpsertSpec(schema, tAlias, sAlias, onSql, clauses) match {
      case Some(keys)
          if schema.fieldNames.forall(c => source.columns.exists(_.equalsIgnoreCase(c))) =>
        val dup = source.groupBy(keys.map(k =>
            source(source.columns.find(_.equalsIgnoreCase(k)).get)): _*)
          .count().where(org.apache.spark.sql.functions.col("count") > 1)
          .limit(1).count() > 0
        if (!dup) {
          val aligned = source.select(schema.fieldNames.toSeq.map(c =>
            source(source.columns.find(_.equalsIgnoreCase(c)).get).as(c)): _*)
          val n = GeoTable.upsertByKey(spark, root, keys, aligned)
          GeoSql.refresh(spark, name, root)
          return Seq(Row(n))
        }
      case _ =>
    }
    val matched = clauses.collect {
      case MergeUpdateSpec(c, sets) =>
        GeoTable.MergeUpdate(c.map(expr), sets.map { case (n, v) => n -> expr(v) })
      case MergeDeleteSpec(c) => GeoTable.MergeDelete(c.map(expr))
    }
    val notMatched = clauses.collect {
      case MergeInsertSpec(c, _, None) => GeoTable.MergeInsert(c.map(expr), None)
      case MergeInsertSpec(c, cols, Some(vals)) =>
        val names = cols.getOrElse {
          require(vals.length == schema.fields.length,
            s"MERGE INSERT without a column list needs ${schema.fields.length} values, got ${vals.length}")
          schema.fieldNames.toSeq
        }
        require(names.length == vals.length,
          s"MERGE INSERT lists ${names.length} columns but ${vals.length} values")
        GeoTable.MergeInsert(c.map(expr), Some(names.zip(vals.map(expr))))
    }
    val n = GeoTable.merge(spark, root, source, expr(onSql), matched, notMatched, tAlias, sAlias)
    GeoSql.refresh(spark, name, root)
    Seq(Row(n))
  }
}

/** ALTER TABLE ADD COLUMN (metadata-only; see GeoTable.addColumn). */
case class GeoAlterAddCommand(name: String, colDdl: String) extends GeoRunnable {
  override def execute(spark: SparkSession): Seq[Row] = {
    val root = GeoSql.rootOf(name)
    GeoTable.addColumn(spark, root, colDdl)
    GeoSql.refresh(spark, name, root)
    Seq(Row(0L))
  }
}

/** ALTER TABLE t ADD COLUMN(S) with at least one DEFAULT clause —
  * metadata-only, one atomic commit for every column; old files read
  * each folded default via EXISTS_DEFAULT (Iceberg v3 initial-default
  * analog). See GeoTable.addColumnsWithDefaults. */
case class GeoAlterAddDefaultCommand(name: String,
                                     cols: Seq[(String, Option[String])])
  extends GeoRunnable {
  override def execute(spark: SparkSession): Seq[Row] = {
    val root = GeoSql.rootOf(name)
    GeoTable.addColumnsWithDefaults(spark, root, cols)
    GeoSql.refresh(spark, name, root)
    Seq(Row(0L))
  }
}

/** ALTER TABLE DROP COLUMN (metadata-only + tombstone; see GeoTable.dropColumn). */
case class GeoAlterDropCommand(name: String, colName: String) extends GeoRunnable {
  override def execute(spark: SparkSession): Seq[Row] = {
    val root = GeoSql.rootOf(name)
    GeoTable.dropColumn(spark, root, colName)
    GeoSql.refresh(spark, name, root)
    Seq(Row(0L))
  }
}

/** ALTER TABLE t SET PARTITIONED BY (transform, ...) — partition-spec
  * evolution: a metadata-only commit that retires the current spec and
  * clusters future writes by the new transforms; existing files keep
  * their own spec and prune under it. Empty list = unpartitioned going
  * forward. See [[GeoTable.setPartitionSpec]]. */
case class GeoSetPartitionSpecCommand(name: String, transformsSql: String) extends GeoRunnable {
  override def execute(spark: SparkSession): Seq[Row] = {
    val root = GeoSql.rootOf(name)
    val ts = GeoSql.splitTop(transformsSql, ',').map(_.trim).filter(_.nonEmpty)
      .map(GeoPartition.decode)
    GeoTable.setPartitionSpec(spark, root, ts)
    GeoSql.refresh(spark, name, root)
    Seq(Row(0L))
  }
}

/** ALTER TABLE RENAME COLUMN (copy-on-write rewrite; see GeoTable.renameColumn). */
case class GeoAlterRenameCommand(name: String, from: String, to: String) extends GeoRunnable {
  override def execute(spark: SparkSession): Seq[Row] = {
    val root = GeoSql.rootOf(name)
    GeoTable.renameColumn(spark, root, from, to)
    GeoSql.refresh(spark, name, root)
    Seq(Row(0L))
  }
}

/** CREATE TABLE t2 SHALLOW CLONE t1 [VERSION AS OF n]: zero-copy clone
  * (Delta analog) — the new table's manifest references the source's
  * files by path; see [[GeoTable.shallowClone]] for semantics and the
  * source-vacuum caveat. The target must be a geo-catalog-qualified
  * name (its root derives from the catalog warehouse); arbitrary roots
  * go through the Scala API. Returns the cloned version. */
case class GeoCloneCommand(target: String, source: String,
                           versionAsOf: Option[Int]) extends GeoRunnable {
  override def execute(spark: SparkSession): Seq[Row] = {
    val srcRoot = GeoSql.rootOf(source)
    val tgtRoot = GeoCatalog.resolveWarehouseRoot(target).getOrElse(
      throw new IllegalArgumentException(
        s"SHALLOW CLONE target '$target' must be a geo-catalog-qualified name " +
          "(for an explicit path use GeoTable.shallowClone)"))
    Seq(Row(GeoTable.shallowClone(spark, srcRoot, tgtRoot, versionAsOf).toLong))
  }
}

/** OPTIMIZE t [INTO n FILES] [WHERE pred]: compact the snapshot
  * (Z-ordered when the table has a geometry column) into ~n files —
  * small-file maintenance, Iceberg rewrite_data_files analog. WHERE
  * scopes the rewrite to the files whose manifest stats can satisfy the
  * predicate (file-granular, content-preserving) — the partition-
  * maintenance shape: compacting one hot partition never reads the
  * table. Returns the resulting file count. */
case class GeoOptimizeCommand(name: String, nFiles: Option[Int],
                              where: Option[String] = None,
                              zorderBy: Seq[String] = Seq.empty,
                              smallBelowRows: Option[Long] = None) extends GeoRunnable {
  override def execute(spark: SparkSession): Seq[Row] = {
    val root = GeoSql.rootOf(name)
    require(smallBelowRows.isEmpty || where.isEmpty,
      "OPTIMIZE: SMALL BELOW and WHERE are alternative selections — use one")
    val target = nFiles.getOrElse(
      math.max(1, spark.sparkContext.defaultParallelism / 4))
    (smallBelowRows, where) match {
      case (Some(rows), _) => GeoTable.compactSmall(spark, root, rows,
        nFiles.getOrElse(0), zorderBy = zorderBy)
      case (_, Some(w)) => GeoTable.compactWhere(spark, root,
        org.apache.spark.sql.functions.expr(w), target, zorderBy = zorderBy)
      case _ => GeoTable.compact(spark, root, target, zorderBy = zorderBy)
    }
    GeoSql.refresh(spark, name, root)
    Seq(Row(GeoManifest.read(spark, root).files.length.toLong))
  }
}

/** ANALYZE TABLE t COMPUTE STATISTICS FOR [ALL] COLUMNS [a, b]: one-pass
  * NDV/null/min-max collection into the manifest (GeoTable.analyzeColumns)
  * — the scan then reports them as V2 column statistics for CBO. Returns
  * one row per analyzed column with its recorded NDV. */
case class GeoAnalyzeCommand(name: String, cols: Seq[String]) extends GeoRunnable {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("column", org.apache.spark.sql.types.StringType,
      nullable = false)(),
    AttributeReference("ndv", LongType, nullable = false)())
  override def execute(spark: SparkSession): Seq[Row] = {
    val root = GeoSql.rootOf(name)
    val analyzed = GeoTable.analyzeColumns(spark, root, cols)
    val m = GeoManifest.read(spark, root)
    analyzed.map(c => Row(c, m.colStats(c).ndv))
  }
}

/** ALTER TABLE t ADD FILES 'p'[, ...] — by-reference onboarding of
  * existing parquet (the Iceberg add_files procedure as a SQL verb;
  * footer-validated, one stats pass, zero data movement — see
  * GeoTable.addFiles). Returns rows registered. */
case class GeoAddFilesCommand(name: String, paths: Seq[String]) extends GeoRunnable {
  override def execute(spark: SparkSession): Seq[Row] = {
    require(paths.nonEmpty,
      s"ALTER TABLE $name ADD FILES needs single-quoted paths: " +
        "ADD FILES '/p/a.parquet'[, '/p/b.parquet' ...]")
    val root = GeoSql.rootOf(name)
    val n = GeoTable.addFiles(spark, root, paths)
    GeoSql.refresh(spark, name, root)
    Seq(Row(n))
  }
}

/** VACUUM t [RETAIN n VERSIONS]: delete data files referenced only by
  * expired versions (Iceberg expire-snapshots analog). Returns the number
  * of files removed. */
case class GeoVacuumCommand(name: String, keep: Option[Int],
                            unit: String = "VERSIONS") extends GeoRunnable {
  override def execute(spark: SparkSession): Seq[Row] = {
    val root = GeoSql.rootOf(name)
    val removed = unit match {
      case "VERSIONS" => GeoTable.vacuum(spark, root, keep.getOrElse(1))
      case "DAYS" => GeoTable.vacuumOlderThan(spark, root,
        System.currentTimeMillis() - keep.getOrElse(7).toLong * 86400000L)
      case "HOURS" => GeoTable.vacuumOlderThan(spark, root,
        System.currentTimeMillis() - keep.getOrElse(24).toLong * 3600000L)
    }
    Seq(Row(removed.toLong))
  }
}

/** CALL expire_snapshots(older_than => 'ts'[, retain_last => n]) — the
  * Iceberg signature over [[GeoTable.vacuumExpire]]: expire snapshots
  * whose commit timestamp is older than the cutoff while always keeping
  * the newest `retain_last` (union semantics). The timestamp literal
  * parses through Spark's CAST exactly as TIMESTAMP AS OF reads do. */
case class GeoExpireSnapshotsCommand(name: String, olderThan: String,
                                     retainLast: Option[Int]) extends GeoRunnable {
  override def execute(spark: SparkSession): Seq[Row] =
    Seq(Row(GeoTable.vacuumExpire(spark, GeoSql.rootOf(name),
      Some(GeoSql.parseTimestampMs(spark, olderThan)), retainLast).toLong))
}

/** RESTORE TABLE t TO VERSION AS OF n | TO TIMESTAMP AS OF 'ts' (Delta
  * RESTORE / Iceberg rollback analog): commit a new version carrying the
  * target snapshot's data state — history preserved, O(1) data I/O.
  * Returns the restored snapshot's row count. */
case class GeoRestoreCommand(name: String, to: Either[Int, String]) extends GeoRunnable {
  override def execute(spark: SparkSession): Seq[Row] = {
    val root = GeoSql.rootOf(name)
    val rows = to match {
      case Left(v) => GeoTable.restore(spark, root, v)
      case Right(ts) =>
        GeoTable.restoreAsOf(spark, root, GeoSql.parseTimestampMs(spark, ts))
    }
    GeoSql.refresh(spark, name, root)
    Seq(Row(rows))
  }
}

/** RESTORE TABLE t TO VERSION AS OF 'ref': [[GeoRestoreCommand]] with the
  * target resolved through the table's refs — tags AND branch heads, the
  * same resolution as the catalog's `VERSION AS OF 'ref'` (a ref string
  * that works in a SELECT works here too). A branch head staged ABOVE
  * main can't restore (restore reaches only committed main snapshots);
  * the error points at PUBLISH BRANCH, the verb that means that. */
case class GeoRestoreRefCommand(name: String, ref: String) extends GeoRunnable {
  override def execute(spark: SparkSession): Seq[Row] = {
    val root = GeoSql.rootOf(name)
    val r = GeoManifest.refs(spark, root)
    val v = r.versionOf(ref).getOrElse(throw new IllegalArgumentException(
      s"no ref '$ref' on $name" +
        (if (r.isEmpty) "" else s" (refs: ${r.names.mkString(", ")})")))
    val cur = GeoManifest.read(spark, root).version
    if (r.branches.get(ref).exists(_.head > cur))
      throw new IllegalArgumentException(
        s"branch '$ref' of $name is staged ahead of main (head $v > current $cur); " +
          s"use ALTER TABLE $name PUBLISH BRANCH $ref to fast-forward main to it")
    val rows = GeoTable.restore(spark, root, v)
    GeoSql.refresh(spark, name, root)
    Seq(Row(rows))
  }
}

/** ALTER TABLE t ADD CONSTRAINT name CHECK (expr) — Delta-parity CHECK
  * constraint: validates EXISTING rows in one scan, then every future
  * write (path verbs, catalog INSERT, streaming sink, DML rewrites)
  * enforces it row-by-row in the shared writer. */
case class GeoAddConstraintCommand(name: String, cname: String, checkSql: String)
  extends GeoRunnable {
  override def execute(spark: SparkSession): Seq[Row] = {
    val root = GeoSql.rootOf(name)
    GeoTable.addCheckConstraint(spark, root, cname, checkSql)
    GeoSql.refresh(spark, name, root)
    Seq(Row(0L))
  }
}

/** ALTER TABLE t DROP CONSTRAINT name. */
case class GeoDropConstraintCommand(name: String, cname: String)
  extends GeoRunnable {
  override def execute(spark: SparkSession): Seq[Row] = {
    val root = GeoSql.rootOf(name)
    GeoTable.dropCheckConstraint(spark, root, cname)
    GeoSql.refresh(spark, name, root)
    Seq(Row(0L))
  }
}

/** ALTER TABLE t CREATE TAG name [AS OF VERSION n] — named snapshot ref
  * (Iceberg tag): `VERSION AS OF 'name'` resolves through it, vacuum
  * pins it. Returns the tagged version. */
case class GeoCreateTagCommand(name: String, tag: String, version: Option[Int])
  extends GeoRunnable {
  override def execute(spark: SparkSession): Seq[Row] = {
    val v = GeoTable.createTag(spark, GeoSql.rootOf(name), tag, version)
    Seq(Row(v.toLong))
  }
}

/** ALTER TABLE t DROP TAG name. */
case class GeoDropTagCommand(name: String, tag: String) extends GeoRunnable {
  override def execute(spark: SparkSession): Seq[Row] = {
    GeoTable.dropTag(spark, GeoSql.rootOf(name), tag)
    Seq.empty
  }
}

/** ALTER TABLE t CREATE|DROP|PUBLISH BRANCH name — write-audit-publish
  * refs: staged commits move only the branch head; PUBLISH fast-forwards
  * main to it (refused after divergence). Returns the head version for
  * create/publish. */
case class GeoBranchCommand(name: String, branch: String, op: String)
  extends GeoRunnable {
  override def execute(spark: SparkSession): Seq[Row] = {
    val root = GeoSql.rootOf(name)
    op match {
      case "create" => Seq(Row(GeoTable.createBranch(spark, root, branch).toLong))
      case "drop" => GeoTable.dropBranch(spark, root, branch); Seq.empty
      case "publish" =>
        val v = GeoTable.publishBranch(spark, root, branch)
        GeoSql.refresh(spark, name, root)
        Seq(Row(v.toLong))
    }
  }
}

/** CALL cherrypick_snapshot target: apply a staged snapshot's append
  * delta onto the (possibly advanced) current head — see
  * [[GeoTable.cherrypickSnapshot]]. Returns the new main version. */
case class GeoCherrypickCommand(name: String, snapshotId: Int)
  extends GeoRunnable {
  override def execute(spark: SparkSession): Seq[Row] = {
    val root = GeoSql.rootOf(name)
    val v = GeoTable.cherrypickSnapshot(spark, root, snapshotId)
    GeoSql.refresh(spark, name, root)
    Seq(Row(v.toLong))
  }
}

/** CALL rewrite_position_delete_files target: consolidate position-delete
  * sidecars (drop dangling entries) without rewriting data — see
  * [[GeoTable.rewritePositionDeletes]]. Returns sidecar files retired. */
case class GeoRewriteDeletesCommand(name: String) extends GeoRunnable {
  override def execute(spark: SparkSession): Seq[Row] = {
    val root = GeoSql.rootOf(name)
    val n = GeoTable.rewritePositionDeletes(spark, root)
    GeoSql.refresh(spark, name, root)
    Seq(Row(n))
  }
}

/** DROP TABLE on a registered geo table: unregister + delete the root dir.
  * Unregistered names never reach here (maybeCommand guards), so plain
  * Spark tables still go through Spark's own DROP. */
case class GeoDropTableCommand(name: String) extends GeoRunnable {
  override def execute(spark: SparkSession): Seq[Row] = {
    val root = GeoSql.rootOf(name)
    GeoTable.drop(spark, name)
    val fs = GeoManifest.fs(spark, root)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    Seq(Row(0L))
  }
}

/**
 * Delegating parser (SparkSessionExtensions.injectParser): geo DML/DDL is
 * recognized here; every other statement — and every non-plan parse — goes
 * straight to Spark's parser.
 */
/** CREATE [OR REPLACE] VIEW cat.db.v AS SELECT ... — validated (analyzed)
  * in the creation context BEFORE anything lands on disk; the analyzed
  * schema is stored with the definition (Iceberg view metadata shape). */
case class GeoCreateViewCommand(name: String, query: String, orReplace: Boolean,
                                ifNotExists: Boolean) extends GeoRunnable {
  override def execute(spark: SparkSession): Seq[Row] = {
    val parts = name.split('.').toSeq
    val wh = GeoViews.warehouseFor(spark, parts.head).getOrElse(
      throw new IllegalArgumentException(
        s"'${parts.head}' is not a configured GeoCatalog"))
    val (ns, v) = (parts.tail.init, parts.last)
    if (GeoViews.exists(spark, wh, ns, v) && ifNotExists) return Seq(Row(0L))
    require(GeoManifest.currentVersion(spark, (wh +: ns :+ v).mkString("/")).isEmpty,
      s"$name already exists as a TABLE")
    val d0 = GeoViews.ViewDef(query, parts.head, ns,
      org.apache.spark.sql.types.StructType(Seq.empty).json, Map.empty)
    // analyze now: bad SQL / missing tables / cycles fail the CREATE, and
    // the analyzed schema rides the stored definition
    val schema = org.apache.spark.sql.graft.GraftShim
      .ofRows(spark, GeoViews.expandDef(spark, d0, v, Set(parts.mkString(".")))).schema
    GeoViews.store(spark, wh, ns, v, d0.copy(schemaJson = schema.json),
      overwrite = orReplace)
    Seq(Row(0L))
  }
}

case class GeoDropViewCommand(name: String, ifExists: Boolean) extends GeoRunnable {
  override def execute(spark: SparkSession): Seq[Row] = {
    val parts = name.split('.').toSeq
    val wh = GeoViews.warehouseFor(spark, parts.head).getOrElse(
      throw new IllegalArgumentException(
        s"'${parts.head}' is not a configured GeoCatalog"))
    val dropped = GeoViews.delete(spark, wh, parts.tail.init, parts.last)
    if (!dropped && !ifExists)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(
        org.apache.spark.sql.connector.catalog.Identifier.of(
          parts.tail.init.toArray, parts.last))
    Seq(Row(if (dropped) 1L else 0L))
  }
}

/** CALL ancestors_of result set: the lineage of `from` (default: main's
  * current version), newest first, with the in-manifest commit timestamps
  * (Iceberg's ancestors_of shape, optional snapshot_id included). */
case class GeoAncestorsCommand(name: String, from: Option[Int] = None)
  extends GeoRunnable {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("snapshot_id", LongType, nullable = false)(),
    AttributeReference("committed_at_ms", LongType, nullable = false)())
  override def execute(spark: SparkSession): Seq[Row] = {
    val root = GeoSql.rootOf(name)
    val cur = from.getOrElse(GeoManifest.read(spark, root).version)
    GeoManifest.ancestry(spark, root, cur)
      .map(v => Row(v.toLong, GeoManifest.commitTsOf(spark, root, v)))
  }
}

/** CALL snapshot(table => 'db.t', source_table => 'any.readable.name') —
  * Iceberg snapshot-procedure analog: create a NEW geo table whose
  * version 0 references the source's existing parquet files by absolute
  * path (zero copy, one distributed stats pass; the source keeps file
  * ownership, so vacuum never touches them). The source is anything
  * `spark.table` resolves — a temp view over parquet, a catalog table —
  * as long as its data is parquet files with self-contained columns. */
case class GeoSnapshotTableCommand(dest: String, source: String) extends GeoRunnable {
  override def execute(spark: SparkSession): Seq[Row] = {
    val src = spark.table(source)
    val paths = src.inputFiles.toSeq
    require(paths.nonEmpty, s"source table '$source' exposes no input files")
    require(paths.forall(_.endsWith(".parquet")),
      s"snapshot needs a parquet-backed source; '$source' has non-parquet files")
    // Hive-partitioned sources keep partition VALUES in directory names;
    // a by-reference snapshot would read those columns as null forever
    val fileCols = spark.read.parquet(paths: _*).schema.fieldNames
      .map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    val missing = src.schema.fieldNames.filterNot(c =>
      fileCols.contains(c.toLowerCase(java.util.Locale.ROOT)))
    require(missing.isEmpty,
      s"cannot snapshot '$source' by reference: column(s) ${missing.mkString(", ")} " +
        "live outside the data files (Hive partition directories) — " +
        "materialize them (CTAS) instead")
    val root = GeoCatalog.resolveWarehouseRoot(dest).getOrElse(
      throw new IllegalArgumentException(
        s"'$dest' does not name a table under a configured GeoCatalog"))
    require(GeoManifest.currentVersion(spark, root).isEmpty,
      s"$dest already exists — snapshot creates a NEW table")
    GeoSql.requireNoView(spark, dest)
    Seq(Row(GeoTable.importFiles(spark, root, paths)))
  }
}

/** Orphan-file sweep that never expires history (the CALL
  * remove_orphan_files target; see GeoTable.removeOrphanFiles). */
case class GeoRemoveOrphanFilesCommand(name: String,
                                       olderThan: Option[String] = None) extends GeoRunnable {
  override def execute(spark: SparkSession): Seq[Row] =
    Seq(Row(GeoTable.removeOrphanFiles(spark, GeoSql.rootOf(name),
      olderThan.map(GeoSql.parseTimestampMs(spark, _))).toLong))
}

/** ALTER TABLE <path-registered> SET/UNSET TBLPROPERTIES — the user
  * table-property surface for path tables (one metadata-only commit;
  * catalog tables take Spark's native spelling through alterTable).
  * bloom.* keys route to [[GeoTable.setBloomColumns]] exactly as
  * GeoCatalog.alterTable routes them — the statement the error message
  * used to point at now WORKS on path tables too. */
case class GeoSetTblPropsCommand(name: String, propsSql: String,
                                 unset: Boolean) extends GeoRunnable {
  override def execute(spark: SparkSession): Seq[Row] = {
    val props =
      if (unset) GeoSql.parsePropKeys(propsSql).map(_ -> "")
      else GeoSql.parsePropPairs(propsSql)
    require(props.nonEmpty,
      if (unset) "could not parse any TBLPROPERTIES key — use ('k', ...) " +
        "with quoted or identifier keys"
      else "could not parse any TBLPROPERTIES pair — use ('k'='v', ...) " +
        "with quoted or identifier keys/values")
    val root = GeoSql.rootOf(name)
    val bloomKeys = Set("bloom.columns", "bloom.fpp", "bloom.items")
    val (bloom, user) = props.partition(p => bloomKeys.contains(p._1))
    if (unset) {
      bloom.map(_._1).foreach {
        case "bloom.columns" => GeoTable.setBloomColumns(spark, root, "")
        // UNSET of a tuning knob returns THAT knob to the session
        // default, keeping the column list and the sibling knob
        case knob =>
          val cur = GeoManifest.read(spark, root).bloomCols
          if (cur.nonEmpty) GeoTable.setBloomColumns(spark, root,
            cur.map(_.col).mkString(","),
            fpp = if (knob == "bloom.fpp")
              Some(GeoBloom.fppDefault(spark).toString) else None,
            items = if (knob == "bloom.items")
              Some(GeoBloom.itemsDefault(spark).toString) else None)
      }
      if (user.nonEmpty)
        GeoTable.setProperties(spark, root, Map.empty, user.map(_._1))
    } else {
      val bset = bloom.toMap
      if (bset.nonEmpty) {
        // tuning fpp/items without re-listing columns keeps the current set
        val cols = bset.getOrElse("bloom.columns",
          GeoManifest.read(spark, root).bloomCols.map(_.col).mkString(","))
        GeoTable.setBloomColumns(spark, root, cols,
          bset.get("bloom.fpp"), bset.get("bloom.items"))
      }
      if (user.nonEmpty) GeoTable.setProperties(spark, root, user.toMap)
    }
    GeoSql.refresh(spark, name, root)
    Seq(Row(props.length.toLong))
  }
}

/** SHOW TBLPROPERTIES <path-registered> — user properties of the current
  * snapshot as (key, value) rows, sorted by key. */
case class GeoShowTblPropsCommand(name: String) extends GeoRunnable {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("key", org.apache.spark.sql.types.StringType, nullable = false)(),
    AttributeReference("value", org.apache.spark.sql.types.StringType, nullable = false)())
  override def execute(spark: SparkSession): Seq[Row] =
    GeoTable.properties(spark, GeoSql.rootOf(name)).toSeq.sortBy(_._1)
      .map { case (k, v) => Row(k, v) }
}

/** SHOW CREATE TABLE (path-registered or catalog geo name) — reconstruct
  * a runnable CREATE statement from the manifest: columns (GEOMETRY
  * columns spelled with their CRS, NOT NULL and DEFAULT clauses
  * preserved), USING geo, PARTITIONED BY the layout transforms,
  * TBLPROPERTIES carrying user props plus the config surface
  * (stats.columns / sort.order / bloom.*) and CHECK constraints
  * Delta-style as `graft.constraints.<name>`, and the LOCATION. The
  * emitted text round-trips through this front-end's own CREATE TABLE
  * (spec-pinned), so it is a working migration recipe, not just
  * documentation. Spark's native V2 SHOW CREATE cannot do this for geo
  * tables: it emits the derived bookkeeping props — which CREATE
  * refuses as reserved — and flattens GEOMETRY CRS typing to BINARY. */
case class GeoShowCreateTableCommand(name: String) extends GeoRunnable {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("createtab_stmt", org.apache.spark.sql.types.StringType,
      nullable = false)())
  override def execute(spark: SparkSession): Seq[Row] = {
    val root = GeoSql.rootOf(name)
    val m = GeoManifest.read(spark, root)
    val cols = m.schema.fields.map { f =>
      val tpe =
        if (GeoSchema.isGeometry(f)) s"GEOMETRY('${GeoSchema.crsOf(f)}')"
        else f.dataType.sql
      val notNull = if (f.nullable) "" else " NOT NULL"
      val dflt =
        if (f.metadata.contains("CURRENT_DEFAULT"))
          s" DEFAULT ${f.metadata.getString("CURRENT_DEFAULT")}"
        else ""
      s"  ${f.name} $tpe$notNull$dflt"
    }.mkString(",\n")
    val layout = m.partitions.filter(_.layout)
    val partBy =
      if (layout.isEmpty) ""
      else layout.map(_.encode).mkString("\nPARTITIONED BY (", ", ", ")")
    // config surface rendered the way it is SET: stats/sort/bloom as
    // their TBLPROPERTIES spellings, constraints Delta-style
    val statsCols = m.partitions.filter(_.kind == "stats").map(_.col)
    val sortCols = m.partitions.filter(_.kind == "sort").map(_.col)
    val props =
      m.props.toSeq ++
      (if (statsCols.isEmpty) Seq.empty else Seq("stats.columns" -> statsCols.mkString(","))) ++
      (if (sortCols.isEmpty) Seq.empty else Seq("sort.order" -> sortCols.mkString(","))) ++
      (if (m.bloomCols.isEmpty) Seq.empty
       else Seq("bloom.columns" -> m.bloomCols.map(_.col).mkString(","))) ++
      m.geomCol.map(g => GeoCatalog.GeomColProp -> g).toSeq ++
      m.checks.map { case (n, sql) => s"graft.constraints.$n" -> sql }
    val tblProps =
      if (props.isEmpty) ""
      else props.sortBy(_._1)
        .map { case (k, v) =>
          s"'${k.replace("'", "''")}' = '${v.replace("'", "''")}'" }
        .mkString("\nTBLPROPERTIES (", ", ", ")")
    Seq(Row(s"CREATE TABLE $name (\n$cols\n) USING geo$partBy$tblProps\nLOCATION '$root'"))
  }
}

/** ALTER VIEW v SET/UNSET TBLPROPERTIES — the ViewChange surface in SQL. */
case class GeoAlterViewPropsCommand(name: String, propsSql: String,
                                    unset: Boolean) extends GeoRunnable {
  override def execute(spark: SparkSession): Seq[Row] = {
    val props =
      if (unset) GeoSql.parsePropKeys(propsSql).map(_ -> "")
      else GeoSql.parsePropPairs(propsSql)
    val parts = name.split('.').toSeq
    val wh = GeoViews.warehouseFor(spark, parts.head).getOrElse(
      throw new IllegalArgumentException(
        s"'${parts.head}' is not a configured GeoCatalog"))
    val (ns, v) = (parts.tail.init, parts.last)
    require(props.nonEmpty,
      if (unset) "could not parse any TBLPROPERTIES key — use ('k', ...) " +
        "with quoted or identifier keys"
      else "could not parse any TBLPROPERTIES pair — use ('k'='v', ...) " +
        "with quoted or identifier keys/values")
    val d = GeoViews.load(spark, wh, ns, v).getOrElse(
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(
        org.apache.spark.sql.connector.catalog.Identifier.of(ns.toArray, v)))
    val next =
      if (unset) d.properties -- props.map(_._1)
      else d.properties ++ props
    GeoViews.store(spark, wh, ns, v, d.copy(properties = next), overwrite = true)
    Seq(Row(props.length.toLong))
  }
}

/** SHOW CREATE VIEW cat.db.v — reconstructs the CREATE statement from the
  * stored definition (properties ride as TBLPROPERTIES). */
case class GeoShowCreateViewCommand(name: String) extends GeoRunnable {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("createview_stmt", org.apache.spark.sql.types.StringType,
      nullable = false)())
  override def execute(spark: SparkSession): Seq[Row] = {
    val parts = name.split('.').toSeq
    val wh = GeoViews.warehouseFor(spark, parts.head).getOrElse(
      throw new IllegalArgumentException(
        s"'${parts.head}' is not a configured GeoCatalog"))
    val (ns, v) = (parts.tail.init, parts.last)
    val d = GeoViews.load(spark, wh, ns, v).getOrElse(
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(
        org.apache.spark.sql.connector.catalog.Identifier.of(ns.toArray, v)))
    val props =
      if (d.properties.isEmpty) ""
      else d.properties.toSeq.sorted
        .map { case (k, p) =>
          s"'${k.replace("'", "''")}' = '${p.replace("'", "''")}'" }
        .mkString("\nTBLPROPERTIES (", ", ", ")")
    Seq(Row(s"CREATE VIEW ${(parts.head +: ns :+ v).mkString(".")}$props AS\n${d.sql}"))
  }
}

/** ALTER VIEW cat.db.v RENAME TO v2 (bare: same namespace) or to the
  * fully-qualified cat.db2.v2 within the SAME catalog — the SQL spelling
  * of ViewCatalog.renameView: refuses targets that exist as a view or
  * table. A 2-part target is REFUSED as ambiguous (it could mean
  * `cat.name` or `ns.name`) rather than silently mis-stored. Store-then-
  * delete, same crash window as ViewCatalog.renameView: a crash between
  * the two leaves both names readable (never a lost definition), and a
  * failed delete of the old name fails the command loudly. */
case class GeoRenameViewCommand(name: String, newName: String) extends GeoRunnable {
  override def execute(spark: SparkSession): Seq[Row] = {
    val parts = name.split('.').toSeq
    val wh = GeoViews.warehouseFor(spark, parts.head).getOrElse(
      throw new IllegalArgumentException(
        s"'${parts.head}' is not a configured GeoCatalog"))
    val (ns, v) = (parts.tail.init, parts.last)
    val newParts = newName.split('.').toSeq
    val (ns2, v2) =
      if (newParts.length == 1) (ns, newParts.head) // bare name: same namespace
      else if (newParts.length == parts.length && newParts.head == parts.head)
        (newParts.tail.init, newParts.last)
      else throw new IllegalArgumentException(
        if (newParts.head != parts.head && newParts.length == parts.length)
          s"RENAME cannot move a view across catalogs (${parts.head} -> " +
            s"${newParts.head}); the definitions live in the source catalog's " +
            "warehouse"
        else s"ambiguous RENAME target '$newName' — use a bare view name " +
          s"(stays in ${(parts.head +: ns).mkString(".")}) or the fully " +
          s"qualified ${parts.head}.<namespace>.<view>")
    val d = GeoViews.load(spark, wh, ns, v).getOrElse(
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(
        org.apache.spark.sql.connector.catalog.Identifier.of(ns.toArray, v)))
    require(GeoViews.load(spark, wh, ns2, v2).isEmpty,
      s"${(parts.head +: ns2 :+ v2).mkString(".")} already exists as a VIEW")
    require(GeoManifest.currentVersion(spark,
        (wh +: ns2 :+ v2).mkString("/")).isEmpty,
      s"${(parts.head +: ns2 :+ v2).mkString(".")} already exists as a TABLE")
    GeoViews.store(spark, wh, ns2, v2, d, overwrite = false)
    if (!GeoViews.delete(spark, wh, ns, v))
      throw new IllegalStateException(
        s"rename stored ${(parts.head +: ns2 :+ v2).mkString(".")} but could " +
          s"not remove $name — both names currently resolve; DROP VIEW $name " +
          "to finish the rename")
    Seq(Row(1L))
  }
}

/** DESCRIBE VIEW cat.db.v — one row per output column from the stored
  * analyzed schema, then a # View Information block (text, catalog,
  * namespace, properties), Spark's DESCRIBE output shape. */
case class GeoDescribeViewCommand(name: String) extends GeoRunnable {
  private val S = org.apache.spark.sql.types.StringType
  override val output: Seq[Attribute] = Seq(
    AttributeReference("col_name", S, nullable = false)(),
    AttributeReference("data_type", S, nullable = false)(),
    AttributeReference("comment", S, nullable = true)())
  override def execute(spark: SparkSession): Seq[Row] = {
    val parts = name.split('.').toSeq
    val wh = GeoViews.warehouseFor(spark, parts.head).getOrElse(
      throw new IllegalArgumentException(
        s"'${parts.head}' is not a configured GeoCatalog"))
    val (ns, v) = (parts.tail.init, parts.last)
    val d = GeoViews.load(spark, wh, ns, v).getOrElse(
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(
        org.apache.spark.sql.connector.catalog.Identifier.of(ns.toArray, v)))
    val schema = org.apache.spark.sql.types.DataType.fromJson(d.schemaJson)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val cols = schema.fields.toSeq.map(f =>
      Row(f.name, f.dataType.simpleString, null))
    val props = d.properties.toSeq.sorted
      .map { case (k, p) => s"$k=$p" }.mkString(", ")
    cols ++ Seq(
      Row("", "", null),
      Row("# View Information", "", null),
      Row("View Text", d.sql, null),
      Row("View Catalog", d.currentCatalog, null),
      Row("View Namespace", d.currentNamespace.mkString("."), null)) ++
      (if (props.isEmpty) Seq.empty else Seq(Row("View Properties", props, null)))
  }
}

/** SHOW VIEWS IN cat.db — same output shape as Spark's native SHOW VIEWS. */
case class GeoShowViewsCommand(nsName: String) extends GeoRunnable {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("namespace", org.apache.spark.sql.types.StringType,
      nullable = false)(),
    AttributeReference("viewName", org.apache.spark.sql.types.StringType,
      nullable = false)(),
    AttributeReference("isTemporary", org.apache.spark.sql.types.BooleanType,
      nullable = false)())
  override def execute(spark: SparkSession): Seq[Row] = {
    val parts = nsName.split('.').toSeq
    val wh = GeoViews.warehouseFor(spark, parts.head).getOrElse(
      throw new IllegalArgumentException(
        s"'${parts.head}' is not a configured GeoCatalog"))
    GeoViews.list(spark, wh, parts.tail)
      .map(v => Row(parts.tail.mkString("."), v, false))
  }
}

class GeoSqlParser(delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    GeoSql.maybeCommand(sqlText).getOrElse(delegate.parsePlan(sqlText))
  override def parseExpression(sqlText: String): Expression = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier = delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier = delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] = delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType = delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType = delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType = delegate.parseDataType(sqlText)
}
