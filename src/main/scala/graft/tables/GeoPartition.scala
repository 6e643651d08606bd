package graft.tables

import graft.tables.GeoManifest.FileEntry

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, IsNotNull, IsNull, LessThan, LessThanOrEqual, Literal, Murmur3Hash, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Partition transforms for GeoCatalog tables — `PARTITIONED BY (col)`,
 * `bucket(n, col)`, `days(ts)` (+ hours/months/years), the Iceberg
 * hidden-partitioning surface (the reference's tables are Iceberg,
 * whose DDL carries exactly these transforms).
 *
 * The layout stays manifest-first, not directory-first: writes CLUSTER
 * rows by transform value (range-repartition + sort), and the manifest
 * records each file's per-transform min/max. Scans derive transform
 * bounds from pushed filters and drop files whose recorded range cannot
 * match — the same per-file stats pruning the bbox machinery does for
 * geometry, so partition pruning needs no hive-style directories and
 * composes with Z-order and bbox pruning. Clustering quality only
 * affects pruning PRECISION; correctness comes from the per-file
 * min/max, so appends that straddle values (or legacy files with no
 * stats) are simply kept.
 *
 * Transform values are LONGs:
 *  - identity: integral value; DATE → epoch days; TIMESTAMP → micros
 *  - days/hours/months/years: floored epoch units (timestamps at UTC,
 *    matching Spark's own extract semantics at session UTC)
 *  - bucket(n): pmod(murmur3(col), n) — Spark's `hash` function, so the
 *    written clustering and driver-side literal derivation agree
 *  - truncate(w): integral → floored to a multiple of w (monotonic, so
 *    ranges derive); string → first 8 UTF-8 bytes of the w-code-point
 *    prefix packed big-endian with the sign bit flipped, an ORDER
 *    EMBEDDING of the truncated string (signed long compare == unsigned
 *    lexicographic byte compare), so string ranges derive too
 */
object GeoPartition {

  /** One transform: kind ∈ identity|bucket|truncate|days|hours|months|
    * years — or `stats`, a STATS-ONLY identity: per-file min/max recorded
    * and pruned on exactly like identity, but exempt from write
    * clustering (the Iceberg column-stats analog: data skipping on
    * filters over columns the layout does not order by) — or `sort`, a
    * declared WRITE sort order (Iceberg write.sort-order analog): writes
    * cluster by it AFTER the layout keys so per-file min/max stay tight
    * on every ingest (no OPTIMIZE needed), but it defines no partition
    * tuples — files don't roll at its boundaries and SPJ ignores it. */
  final case class PTransform(kind: String, n: Int, col: String) {
    def encode: String = kind match {
      case "bucket" => s"bucket($n,$col)"
      case "truncate" => s"truncate($n,$col)"
      case "identity" => col
      case k => s"$k($col)"
    }
    /** True for transforms that define the partition LAYOUT (tuple
      * boundaries, SPJ key grouping, partition display) — all but the
      * stats-only and sort-only kinds. */
    def layout: Boolean = kind != "stats" && kind != "sort"
    /** True for transforms the WRITE path clusters rows by (layout keys
      * first, then declared sort keys; stats never cluster). */
    def clusters: Boolean = kind != "stats"
    override def toString: String = encode
  }

  private val unitRe = "(days|hours|months|years|stats|sort)\\(([^)]+)\\)".r
  private val bucketRe = "bucket\\((\\d+),([^)]+)\\)".r
  private val truncateRe = "truncate\\((\\d+),([^)]+)\\)".r

  def decode(s: String): PTransform = s.trim match {
    case bucketRe(n, c) => PTransform("bucket", n.toInt, c.trim)
    case truncateRe(n, c) => PTransform("truncate", n.toInt, c.trim)
    case unitRe(k, c) => PTransform(k, 0, c.trim)
    case c => PTransform("identity", 0, c)
  }

  /** Column types a transform accepts (identity needs an ordered long
    * embedding; bucket anything murmur3 hashes). */
  private[tables] def supports(kind: String, dt: DataType): Boolean = kind match {
    case "identity" | "stats" | "sort" => dt match {
      case ByteType | ShortType | IntegerType | LongType | DateType | TimestampType => true
      case _ => false
    }
    case "bucket" => dt match {
      case ByteType | ShortType | IntegerType | LongType | DateType |
           TimestampType | StringType => true
      case _ => false
    }
    case "truncate" => dt match {
      case ByteType | ShortType | IntegerType | LongType | StringType => true
      case _ => false
    }
    case _ => dt == DateType || dt == TimestampType
  }

  /** DDL Transform → PTransform, or Left(reason) when unsupported. */
  def parseDdl(t: org.apache.spark.sql.connector.expressions.Transform,
               schema: StructType): Either[String, PTransform] = {
    def field(name: String): Either[String, StructField] =
      schema.fields.find(_.name.equalsIgnoreCase(name))
        .toRight(s"column '$name' not in the table schema")
    val refs = t.references()
    if (refs.length != 1) return Left(s"$t: multi-column transforms are not supported")
    val colName = refs.head.fieldNames().mkString(".")
    t.name().toLowerCase match {
      case "identity" => field(colName).flatMap { f =>
        if (supports("identity", f.dataType)) Right(PTransform("identity", 0, f.name))
        else Left(s"identity partitioning needs an integral/date/timestamp column, " +
          s"'${f.name}' is ${f.dataType.simpleString}")
      }
      case "bucket" =>
        val n = t.arguments().collectFirst {
          case l: org.apache.spark.sql.connector.expressions.Literal[_]
            if l.value().isInstanceOf[Number] => l.value().asInstanceOf[Number].intValue()
        }.getOrElse(0)
        if (n <= 0) Left(s"$t: bucket count must be a positive literal")
        else field(colName).flatMap { f =>
          if (supports("bucket", f.dataType)) Right(PTransform("bucket", n, f.name))
          else Left(s"bucket partitioning cannot hash ${f.dataType.simpleString}")
        }
      case "truncate" =>
        val w = t.arguments().collectFirst {
          case l: org.apache.spark.sql.connector.expressions.Literal[_]
            if l.value().isInstanceOf[Number] => l.value().asInstanceOf[Number].intValue()
        }.getOrElse(0)
        if (w <= 0) Left(s"$t: truncate width must be a positive literal")
        else field(colName).flatMap { f =>
          if (supports("truncate", f.dataType)) Right(PTransform("truncate", w, f.name))
          else Left(s"truncate partitioning needs an integral/string column, " +
            s"'${f.name}' is ${f.dataType.simpleString}")
        }
      case k @ ("days" | "hours" | "months" | "years") => field(colName).flatMap { f =>
        if (supports(k, f.dataType)) Right(PTransform(k, 0, f.name))
        else Left(s"$k() needs a date/timestamp column, '${f.name}' is ${f.dataType.simpleString}")
      }
      case other => Left(s"transform $other is not supported")
    }
  }

  /** The transform as a LongType column over the table's rows. */
  def transformCol(t: PTransform, schema: StructType): Column = {
    val f = schema.fields.find(_.name.equalsIgnoreCase(t.col)).getOrElse(
      throw new IllegalArgumentException(s"partition column '${t.col}' missing from schema"))
    val c = col(f.name)
    t.kind match {
      case "identity" | "stats" | "sort" => f.dataType match {
        case DateType => datediff(c, to_date(lit("1970-01-01"))).cast(LongType)
        case TimestampType => unix_micros(c)
        case _ => c.cast(LongType)
      }
      case "bucket" => pmod(hash(c), lit(t.n)).cast(LongType)
      case "truncate" => f.dataType match {
        // Iceberg truncate: floor to a multiple of the width (pmod is
        // non-negative, so negatives floor downward, not toward zero)
        case ByteType | ShortType | IntegerType | LongType =>
          (c.cast(LongType) - pmod(c.cast(LongType), lit(t.n.toLong))).cast(LongType)
        case _ =>
          org.apache.spark.sql.graft.GraftShim.column(
            StrTruncPack(org.apache.spark.sql.graft.GraftShim.expression(c), t.n))
      }
      case "days" => f.dataType match {
        case DateType => datediff(c, to_date(lit("1970-01-01"))).cast(LongType)
        case _ => floor(unix_micros(c).cast(DoubleType) / 86400000000.0).cast(LongType)
      }
      case "hours" => floor(unix_micros(c.cast(TimestampType)).cast(DoubleType) / 3600000000.0).cast(LongType)
      case "months" => ((year(c) - 1970) * 12 + month(c) - 1).cast(LongType)
      case "years" => (year(c) - 1970).cast(LongType)
    }
  }

  /** The layout transforms as V2 SortOrders — the `ordered` distribution
    * every write path (batch INSERT, streaming epoch, CoW DML rewrite)
    * requests so rows reach the rolling writer clustered in transform
    * space and files come out single-valued (the SPJ precondition).
    * Function transforms resolve through the catalog's FunctionCatalog. */
  def v2SortOrders(transforms: Seq[PTransform])
      : Array[org.apache.spark.sql.connector.expressions.SortOrder] = {
    import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection}
    transforms.filter(_.clusters).map { p =>
      val e = p.kind match {
        // a declared sort key orders by the raw column — its long
        // embedding is order-isomorphic, no function resolution needed
        case "identity" | "sort" => Expressions.column(p.col)
        case "bucket" => Expressions.bucket(p.n, p.col)
        case "truncate" => Expressions.apply("truncate",
          Expressions.literal(p.n), Expressions.column(p.col))
        case k => Expressions.apply(k, Expressions.column(p.col))
      }
      Expressions.sort(e, SortDirection.ASCENDING)
    }.toArray
  }

  /** Table property selecting the clustered-write exchange: `range`
    * (default — global transform order across files) or `hash` (hash the
    * transform tuple). `hash` exists because `repartitionByRange` runs a
    * RANGE-SAMPLE job over its input first — for a derived frame (an IVF
    * assignment, a tokenize+aggregate postings batch) that is a second
    * full computation of the input per write, at 100 TB a second corpus
    * pass. Hash partitioning is sample-free and ONE pass. File contents
    * stay equivalent for pruning either way: `sortWithinPartitions` on
    * the transform tuple plus the writer's tuple-boundary file rolling
    * keep every file single-valued per layout tuple (the SPJ
    * precondition), and per-file transform stats stay exact — only which
    * worker wrote which tuple changes. The Iceberg analog is
    * write.distribution-mode = hash vs range. */
  val LayoutModeProp = "graft.write.layout"
  def layoutMode(props: Map[String, String]): String =
    props.getOrElse(LayoutModeProp, "range") match {
      case m @ ("range" | "hash") => m
      case other => throw new IllegalArgumentException(
        s"$LayoutModeProp must be 'range' or 'hash', got '$other'")
    }

  /** Cluster rows so files hold tight transform ranges. The partition
    * count is pinned (AQE would coalesce an unsized range shuffle into
    * one file and destroy the grouping); empty ranges produce zero-row
    * files that the commit drops. `mode` picks the exchange — see
    * [[LayoutModeProp]]. */
  def layout(df: DataFrame, transforms: Seq[PTransform], schema: StructType,
             mode: String = "range"): DataFrame = {
    val active = transforms.filter(_.clusters) // stats transforms don't cluster
    if (active.isEmpty) return df
    val tcols = active.zipWithIndex.map { case (t, i) =>
      transformCol(t, schema).as(s"__graft_p$i")
    }
    val withT = df.select((df.columns.map(col) ++ tcols): _*)
    val pnames = active.indices.map(i => col(s"__graft_p$i"))
    val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val shaped = mode match {
      case "hash" => withT.repartition(math.max(n, 1), pnames: _*)
      case _ => withT.repartitionByRange(math.max(n, 1), pnames: _*)
    }
    shaped.sortWithinPartitions(pnames: _*)
      .drop(active.indices.map(i => s"__graft_p$i"): _*)
  }

  /** Auto stats transforms (Iceberg column-stats analog): one `stats`
    * entry per eligible column not already covered by a layout
    * transform — per-file min/max lands in the same single stats pass
    * every commit already runs, and scans prune on it for free. Capped
    * so a very wide table cannot bloat its manifest lines. */
  def statsFor(schema: StructType, existing: Seq[PTransform],
               cap: Int = 8): Seq[PTransform] = {
    // a bucket transform does NOT cover its column for stats purposes:
    // bucket min/max prunes only equality probes, while a stats entry on
    // the raw column gives monotone range pruning AND the per-file key
    // ranges equality-delete exemption needs (Manifest.eqApplies)
    val covered = existing.filter(_.kind != "bucket").map(_.col.toLowerCase).toSet
    schema.fields.iterator
      .filter(f => supports("stats", f.dataType))
      .filterNot(f => covered.contains(f.name.toLowerCase))
      .take(cap)
      .map(f => PTransform("stats", 0, f.name))
      .toSeq
  }

  // -------------------------------------------------------------------
  // Driver-side literal transform (must agree with transformCol)
  // -------------------------------------------------------------------

  /** Transform a pushed-filter literal to its partition value. None =
    * underivable (prune conservatively). `dt` is the COLUMN's type. */
  def valueOf(t: PTransform, v: Any, dt: DataType): Option[Long] = {
    if (v == null) return None
    def micros: Option[Long] = dt match {
      case TimestampType => Some(v.asInstanceOf[Long])
      case DateType => Some(v.asInstanceOf[Int].toLong * 86400000000L)
      case _ => None
    }
    t.kind match {
      case "identity" | "stats" | "sort" => dt match {
        case DateType => Some(v.asInstanceOf[Int].toLong)
        case TimestampType => Some(v.asInstanceOf[Long])
        case ByteType | ShortType | IntegerType | LongType =>
          Some(v.asInstanceOf[Number].longValue())
        case _ => None
      }
      case "bucket" =>
        val h = Murmur3Hash(Seq(Literal.create(v, dt)), 42).eval(null).asInstanceOf[Int]
        val m = h % t.n
        Some(if (m < 0) m + t.n else m)
      case "truncate" => dt match {
        case ByteType | ShortType | IntegerType | LongType =>
          val l = v.asInstanceOf[Number].longValue()
          Some(l - Math.floorMod(l, t.n.toLong))
        case StringType =>
          val u = v match {
            case s: UTF8String => s
            case s: String => UTF8String.fromString(s)
            case _ => return None
          }
          Some(packPrefix(u, t.n))
        case _ => None
      }
      case "days" => micros.map(u => Math.floorDiv(u, 86400000000L))
      case "hours" => micros.map(u => Math.floorDiv(u, 3600000000L))
      case "months" => micros.map { u =>
        val d = java.time.Instant.ofEpochSecond(Math.floorDiv(u, 1000000L))
          .atZone(java.time.ZoneOffset.UTC).toLocalDate
        (d.getYear - 1970).toLong * 12 + d.getMonthValue - 1
      }
      case "years" => micros.map { u =>
        java.time.Instant.ofEpochSecond(Math.floorDiv(u, 1000000L))
          .atZone(java.time.ZoneOffset.UTC).getYear.toLong - 1970
      }
      case _ => None
    }
  }

  /** Monotonic transforms admit range derivation; bucket only equality. */
  private def monotonic(kind: String): Boolean = kind != "bucket"

  /** Derive per-transform [lo, hi] bounds from pushed catalyst filters
    * (conjuncts only — an underivable conjunct just derives nothing). */
  private def bounds(transforms: Seq[PTransform], schema: StructType,
                     filters: Seq[Expression]): Map[Int, (Long, Long)] = {
    val conjuncts = filters.flatMap(splitAnd)
    val out = scala.collection.mutable.Map.empty[Int, (Long, Long)]
    def tighten(i: Int, lo: Long, hi: Long): Unit = {
      val (l0, h0) = out.getOrElse(i, (Long.MinValue, Long.MaxValue))
      out(i) = (math.max(l0, lo), math.min(h0, hi))
    }
    for ((t, i) <- transforms.zipWithIndex) {
      val f = schema.fields.find(_.name.equalsIgnoreCase(t.col))
      val dt = f.map(_.dataType).getOrElse(NullType)
      def attrMatches(e: Expression): Boolean = e match {
        case a: Attribute => a.name.equalsIgnoreCase(t.col)
        case _ => false
      }
      conjuncts.foreach {
        case EqualTo(a, Literal(v, _)) if attrMatches(a) =>
          valueOf(t, v, dt).foreach(tv => tighten(i, tv, tv))
        case EqualTo(Literal(v, _), a) if attrMatches(a) =>
          valueOf(t, v, dt).foreach(tv => tighten(i, tv, tv))
        case In(a, vs) if attrMatches(a) && vs.forall(_.isInstanceOf[Literal]) =>
          val tvs = vs.collect { case Literal(v, _) => valueOf(t, v, dt) }
          if (tvs.nonEmpty && tvs.forall(_.isDefined)) {
            val xs = tvs.flatten
            tighten(i, xs.min, xs.max)
          }
        case GreaterThan(a, Literal(v, _)) if attrMatches(a) && monotonic(t.kind) =>
          valueOf(t, v, dt).foreach(tv => tighten(i, tv, Long.MaxValue))
        case GreaterThanOrEqual(a, Literal(v, _)) if attrMatches(a) && monotonic(t.kind) =>
          valueOf(t, v, dt).foreach(tv => tighten(i, tv, Long.MaxValue))
        case LessThan(a, Literal(v, _)) if attrMatches(a) && monotonic(t.kind) =>
          valueOf(t, v, dt).foreach(tv => tighten(i, Long.MinValue, tv))
        case LessThanOrEqual(a, Literal(v, _)) if attrMatches(a) && monotonic(t.kind) =>
          valueOf(t, v, dt).foreach(tv => tighten(i, Long.MinValue, tv))
        case LessThan(Literal(v, _), a) if attrMatches(a) && monotonic(t.kind) =>
          valueOf(t, v, dt).foreach(tv => tighten(i, tv, Long.MaxValue))
        case GreaterThan(Literal(v, _), a) if attrMatches(a) && monotonic(t.kind) =>
          valueOf(t, v, dt).foreach(tv => tighten(i, Long.MinValue, tv))
        case _ => ()
      }
    }
    out.toMap
  }

  private[tables] def splitAnd(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitAnd(l) ++ splitAnd(r)
    case other => Seq(other)
  }

  /** Fold foldable subtrees to literals before derivation. The ANALYZED
    * (not optimized) condition is what pruning callers can get their
    * hands on, and the analyzer wraps type-coerced literals in Cast —
    * `id < 500` on a BIGINT column arrives as `id < cast(500 as bigint)`
    * and a bare-Literal pattern match silently derives NOTHING. Folding
    * here is what makes the patterns actually fire. */
  private[tables] def foldConstants(e: Expression): Expression = e.transformUp {
    case f if f.foldable && !f.isInstanceOf[Literal] =>
      try Literal.create(f.eval(null), f.dataType)
      catch { case scala.util.control.NonFatal(_) => f }
  }

  /** First 8 UTF-8 bytes of the w-code-point prefix, packed big-endian
    * with the sign bit flipped: SIGNED long order equals the truncated
    * string's lexicographic (unsigned byte) order, non-strictly —
    * strings sharing the packed 8 bytes collapse to one value, which is
    * the conservative direction for min/max pruning. Called from
    * generated code (static forwarder). */
  def packPrefix(s: UTF8String, w: Int): Long = {
    val b = s.substringSQL(1, w).getBytes
    var v = 0L
    var i = 0
    while (i < 8) {
      v = (v << 8) | (if (i < b.length) b(i) & 0xffL else 0L)
      i += 1
    }
    v ^ Long.MinValue
  }

  /** Keep the files whose recorded per-transform ranges can satisfy the
    * filters; files without stats (legacy, all-null values) always stay. */
  def prune(files: Seq[FileEntry], transforms: Seq[PTransform],
            schema: StructType, filters: Seq[Expression]): Seq[FileEntry] = {
    if (transforms.isEmpty || filters.isEmpty) return files
    val folded = filters.map(foldConstants)
    val bs = bounds(transforms, schema, folded)
    val vs = valueSets(transforms, schema, folded)
    if (bs.isEmpty && vs.isEmpty) return files
    files.filter { f =>
      f.pstats.isEmpty || (
        bs.forall { case (i, (lo, hi)) =>
          f.pstats.lift(i).forall { case (pmin, pmax) => pmin <= hi && pmax >= lo }
        } &&
        vs.forall { case (i, values) =>
          f.pstats.lift(i).forall { case (pmin, pmax) =>
            values.exists(v => v >= pmin && v <= pmax)
          }
        })
    }
  }

  /** A table's partition specs (Iceberg partition-spec-evolution analog):
    * `byId` maps every spec id the table has ever written under to its
    * transform list, `cur` names the spec NEW writes use. A file's pstats
    * vector is positional against ITS OWN spec's transforms — after an
    * `ALTER TABLE ... SET PARTITION SPEC`, old files keep their old spec
    * (evolution is metadata-only; nothing rewrites 100 TB), and every
    * stats consumer (pruning, equality-delete ranges, SPJ) resolves the
    * file's spec first. An unknown spec id resolves to no transforms —
    * the conservative keep-everything direction. */
  final case class SpecSet(cur: Int, byId: Map[Int, Seq[PTransform]]) {
    def current: Seq[PTransform] = byId.getOrElse(cur, Seq.empty)
    /** The transforms `f`'s pstats were recorded under. Fresh entries
      * (spec sentinel -1, not yet stamped by a manifest write) are
      * current-spec by construction. */
    def of(f: FileEntry): Seq[PTransform] =
      if (f.spec < 0) current else byId.getOrElse(f.spec, Seq.empty)
    def isCurrent(f: FileEntry): Boolean = f.spec < 0 || f.spec == cur
  }
  object SpecSet {
    val empty: SpecSet = SpecSet(0, Map.empty)
    /** A single-spec table (the pre-evolution shape). */
    def single(transforms: Seq[PTransform]): SpecSet =
      SpecSet(0, Map(0 -> transforms))
  }

  /** [[prune]] across mixed partition specs: each file's recorded ranges
    * are interpreted under its OWN spec's transform list. Order-preserving;
    * single-spec inputs take the plain path. */
  def pruneBySpec(files: Seq[FileEntry], specs: SpecSet,
                  schema: StructType, filters: Seq[Expression]): Seq[FileEntry] = {
    if (files.isEmpty || filters.isEmpty) return files
    if (files.forall(specs.isCurrent)) return prune(files, specs.current, schema, filters)
    val keep = files.groupBy(f => if (f.spec < 0) specs.cur else f.spec)
      .iterator.flatMap { case (id, fs) =>
        prune(fs, specs.byId.getOrElse(id, Seq.empty), schema, filters).map(_.key)
      }.toSet
    files.filter(f => keep.contains(f.key))
  }

  /** EXACT derived-value sets for IN/= conjuncts, per transform: a file
    * survives only if SOME listed value lands inside its recorded range.
    * Strictly stronger than the [min,max] envelope `bounds` gives IN — a
    * sparse probe list (e.g. IVF nprobe clusters {3, 870}) spans nearly
    * the whole envelope but hits very few files. */
  private def valueSets(transforms: Seq[PTransform], schema: StructType,
                        filters: Seq[Expression]): Map[Int, Seq[Long]] = {
    val conjuncts = filters.flatMap(splitAnd)
    val out = scala.collection.mutable.Map.empty[Int, Seq[Long]]
    for ((t, i) <- transforms.zipWithIndex) {
      val f = schema.fields.find(_.name.equalsIgnoreCase(t.col))
      val dt = f.map(_.dataType).getOrElse(NullType)
      def attrMatches(e: Expression): Boolean = e match {
        case a: Attribute => a.name.equalsIgnoreCase(t.col)
        case _ => false
      }
      conjuncts.foreach {
        case In(a, vals) if attrMatches(a) && vals.forall(_.isInstanceOf[Literal]) =>
          val tvs = vals.collect { case Literal(v, _) => valueOf(t, v, dt) }
          // every value must derive, or the conjunct proves nothing
          if (tvs.nonEmpty && tvs.forall(_.isDefined))
            out(i) = out.get(i).fold(tvs.flatten)(_ intersect tvs.flatten)
        // IN lists past inSetConversionThreshold (default 10) arrive as
        // InSet — a wide nprobe list must not silently lose pruning
        case org.apache.spark.sql.catalyst.expressions.InSet(a, hset) if attrMatches(a) =>
          val tvs = hset.toSeq.map(v => valueOf(t, v, dt))
          if (tvs.nonEmpty && tvs.forall(_.isDefined))
            out(i) = out.get(i).fold(tvs.flatten.toSeq)(_ intersect tvs.flatten.toSeq)
        case _ => ()
      }
    }
    out.toMap
  }

  // -------------------------------------------------------------------
  // Metadata-only DELETE (Iceberg metadata-delete analog): decide, from
  // manifest stats alone, whether every file is WHOLLY inside or WHOLLY
  // outside a predicate — a retention delete on a partition-aligned
  // boundary then drops whole files with ZERO data I/O instead of
  // scanning/rewriting 100 TB of expiring data.
  // -------------------------------------------------------------------

  /** One parsed predicate conjunct: `col <op> literals`. */
  private final case class Atom(col: String, op: String, lits: Seq[Any])

  /** Parse EVERY conjunct into an [[Atom]], or None (caller falls back
    * to the scan path). Literals must already carry the column's type
    * (foldConstants collapses the analyzer's casts first). */
  private def parseAtoms(schema: StructType, filters: Seq[Expression]): Option[Seq[Atom]] = {
    val conjuncts = filters.map(foldConstants).flatMap(splitAnd)
    def field(e: Expression): Option[StructField] = e match {
      case a: Attribute => schema.fields.find(_.name.equalsIgnoreCase(a.name))
      case _ => None
    }
    def atom(a: Expression, op: String, v: Any, vdt: DataType): Option[Atom] =
      field(a).filter(f => f.dataType == vdt && v != null).map(f => Atom(f.name, op, Seq(v)))
    val parsed = conjuncts.map {
      case LessThan(a, Literal(v, dt)) => atom(a, "lt", v, dt)
      case LessThanOrEqual(a, Literal(v, dt)) => atom(a, "le", v, dt)
      case GreaterThan(a, Literal(v, dt)) => atom(a, "gt", v, dt)
      case GreaterThanOrEqual(a, Literal(v, dt)) => atom(a, "ge", v, dt)
      case LessThan(Literal(v, dt), a) => atom(a, "gt", v, dt)
      case LessThanOrEqual(Literal(v, dt), a) => atom(a, "ge", v, dt)
      case GreaterThan(Literal(v, dt), a) => atom(a, "lt", v, dt)
      case GreaterThanOrEqual(Literal(v, dt), a) => atom(a, "le", v, dt)
      case EqualTo(a, Literal(v, dt)) => atom(a, "eq", v, dt)
      case EqualTo(Literal(v, dt), a) => atom(a, "eq", v, dt)
      case In(a, vals) if vals.forall(_.isInstanceOf[Literal]) =>
        val vs = vals.collect { case Literal(v, _) => v }
        val dts = vals.collect { case Literal(_, dt) => dt }.distinct
        field(a).filter(f => dts == Seq(f.dataType) && vs.forall(_ != null))
          .map(f => Atom(f.name, "in", vs))
      case org.apache.spark.sql.catalyst.expressions.InSet(a, hset) =>
        field(a).filter(_ => hset.nonEmpty && !hset.contains(null))
          .map(f => Atom(f.name, "in", hset.toSeq))
      case IsNull(a) => field(a).map(f => Atom(f.name, "isnull", Seq.empty))
      case IsNotNull(a) => field(a).map(f => Atom(f.name, "notnull", Seq.empty))
      case _ => None
    }
    if (parsed.forall(_.isDefined)) Some(parsed.flatten) else None
  }

  /** Embedding strength of a transform for whole-file reasoning:
    *  - "exact": identity/stats on integral/date/timestamp — transform
    *    space IS value space, both directions decide;
    *  - "floor": truncate on ints and the time transforms — monotone
    *    value→floor(value/unit); wholly-inside needs STRICT embedding
    *    inequality (pmax < emb(v) proves col < start(emb(v)) <= v);
    *  - "mono": truncate on strings (packPrefix) — monotone non-strict,
    *    sound for wholly-OUTSIDE range disjointness only;
    *  - "eq": bucket — equality/IN disjointness only;
    *  - "none": no reasoning. */
  private def embClass(t: PTransform, dt: DataType): String = t.kind match {
    case "identity" | "stats" | "sort" => dt match {
      case ByteType | ShortType | IntegerType | LongType | DateType | TimestampType => "exact"
      case _ => "none"
    }
    case "truncate" => dt match {
      case ByteType | ShortType | IntegerType | LongType => "floor"
      case StringType => "mono"
      case _ => "none"
    }
    case "days" | "hours" | "months" | "years" => "floor"
    case "bucket" => "eq"
    case _ => "none"
  }

  /** True when the literal sits exactly on an embedding boundary — every
    * integer is a boundary for exact embeddings; a floor embedding's
    * boundary is the start of its unit (midnight for days, a multiple of
    * w for truncate). At a boundary, `col < v` is EQUIVALENT to
    * `emb(col) < emb(v)` (no partial unit below v), which upgrades the
    * lt/ge rules — exactly the retention-cutoff shape. */
  private def alignedBoundary(t: PTransform, v: Any, dt: DataType): Boolean = {
    def micros: Option[Long] = dt match {
      case TimestampType => Some(v.asInstanceOf[Long])
      case DateType => Some(v.asInstanceOf[Int].toLong * 86400000000L)
      case _ => None
    }
    t.kind match {
      case "identity" | "stats" | "sort" => true
      case "truncate" => dt match {
        case ByteType | ShortType | IntegerType | LongType =>
          Math.floorMod(v.asInstanceOf[Number].longValue(), t.n.toLong) == 0
        case _ => false
      }
      case "days" => micros.exists(us => Math.floorMod(us, 86400000000L) == 0)
      case "hours" => micros.exists(us => Math.floorMod(us, 3600000000L) == 0)
      case "months" | "years" => micros.exists { us =>
        val z = java.time.Instant
          .ofEpochSecond(Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L)
          .atZone(java.time.ZoneOffset.UTC)
        z.getDayOfMonth == 1 && z.toLocalTime == java.time.LocalTime.MIDNIGHT &&
          (t.kind == "months" || z.getMonthValue == 1)
      }
      case _ => false
    }
  }

  /** Tri-state: Some(true) = every row of the file satisfies the atom,
    * Some(false) = no row does, None = undecidable. Null rows never
    * satisfy a comparison, so wholly-outside never needs null knowledge,
    * while wholly-inside requires the file's saw-null flag recorded
    * FALSE for the column. */
  private def atomState(atom: Atom, transforms: Seq[PTransform],
                        schema: StructType, f: FileEntry): Option[Boolean] = {
    val dt = schema.fields.find(_.name.equalsIgnoreCase(atom.col))
      .map(_.dataType).getOrElse(NullType)
    var anyTrue = false
    var anyFalse = false
    for ((t, i) <- transforms.zipWithIndex
         if t.col.equalsIgnoreCase(atom.col) && f.pstats.lift(i).isDefined) {
      val (lo, hi) = f.pstats(i)
      val cls = embClass(t, dt)
      // saw-null flag: known-and-false is the only state that permits
      // wholly-inside (flags align positionally with pstats when present)
      val noNull = f.pnulls.length == f.pstats.length && f.pnulls.length > i && !f.pnulls(i)
      def emb(v: Any): Option[Long] = valueOf(t, v, dt)
      atom.op match {
        case "lt" | "le" | "gt" | "ge" if cls != "eq" && cls != "none" =>
          emb(atom.lits.head).foreach { e =>
            val al = alignedBoundary(t, atom.lits.head, dt)
            val outside = atom.op match {
              // rows satisfying col<v have emb <= e (monotone); at an
              // aligned boundary col<v <=> emb<e, so lo >= e excludes
              case "lt" => if (al) lo >= e else lo > e
              case "le" => lo > e
              // col>v: exact emb means emb >= e+1; floor units keep rows
              // above v inside unit e, so only hi < e excludes
              case "gt" => if (cls == "exact") hi <= e else hi < e
              case _ => hi < e // ge
            }
            val inside = noNull && cls != "mono" && (atom.op match {
              case "lt" => hi < e // col <= start(hi+1)-1 < start(e) <= v
              case "le" => if (cls == "exact") hi <= e else hi < e
              case "gt" => lo > e
              case "ge" => if (al) lo >= e else lo > e
            })
            if (outside) anyFalse = true else if (inside) anyTrue = true
          }
        case "eq" | "in" if cls != "none" =>
          val es = atom.lits.map(emb)
          if (es.forall(_.isDefined)) {
            val vs = es.flatten
            if (!vs.exists(v => v >= lo && v <= hi)) anyFalse = true
            // single-valued file on a listed value, exact space, no nulls
            else if (cls == "exact" && noNull && lo == hi && vs.contains(lo)) anyTrue = true
          }
        case "isnull" => if (noNull) anyFalse = true
        case "notnull" => if (noNull) anyTrue = true
        case _ => ()
      }
    }
    if (anyFalse) Some(false) else if (anyTrue) Some(true) else None
  }

  /** Whole-file DELETE set: Some(drop) when EVERY file decides wholly
    * inside (drop) or wholly outside (keep) the conjunction; None when
    * any file straddles or any conjunct is beyond stats reasoning —
    * callers fall back to the scan/rewrite path. Files are judged under
    * their OWN spec's transforms (partition-spec evolution safe). */
  def metadataDeleteSet(files: Seq[FileEntry], specs: SpecSet, schema: StructType,
                        filters: Seq[Expression]): Option[Seq[FileEntry]] = {
    if (files.isEmpty) return Some(Seq.empty)
    parseAtoms(schema, filters).filter(_.nonEmpty).flatMap { atoms =>
      val drop = Seq.newBuilder[FileEntry]
      for (f <- files) {
        val states = atoms.map(a => atomState(a, specs.of(f), schema, f))
        if (states.contains(Some(false))) () // wholly outside: keep
        else if (states.forall(_.contains(true))) drop += f
        else return None // straddles / undecidable: the whole DELETE falls back
      }
      Some(drop.result())
    }
  }
}

/** `truncate(w, stringCol)` partition value: [[GeoPartition.packPrefix]]
  * of the column, as a codegen'd LONG expression so the write-side
  * clustering shuffle stays inside whole-stage codegen. */
case class StrTruncPack(child: Expression, w: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    GeoPartition.packPrefix(input.asInstanceOf[UTF8String], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.tables.GeoPartition.packPrefix($a, $w)")
  override protected def withNewChildInternal(newChild: Expression): StrTruncPack =
    copy(child = newChild)
  override def prettyName: String = "graft_trunc_pack"
}
