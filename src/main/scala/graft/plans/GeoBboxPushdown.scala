package graft.plans

import graft.functions._
import graft.geom.Geom

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/**
 * Optimizer rule (SURVEY.md §2.8): derives range conjuncts on GeoParquet
 * sidecar bbox columns from ST_ predicates against literal geometry —
 * the Spark-native analog of the reference's SedonaPredicatePushDown
 * (reference: extension/.../SedonaPredicatePushDown.scala:59, which maps
 * ST_ predicates to Iceberg stCovers/stIntersects expressions).
 *
 * `Filter(ST_Contains(<lit poly>, g), scan)` with sidecar columns
 * `g_xmin..g_ymax` in scope gains `g_xmin >= lit.xmin AND ...` — plain
 * comparisons Spark pushes into the parquet scan (PushedFilters), giving
 * row-group min/max skipping and partition pruning on `g_cell`. The
 * original exact predicate stays for the refine.
 */
case class GeoBboxPushdown(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val existing = splitConj(cond)
      val derived = existing.flatMap(p => conjunctsFor(p, child))
        .filterNot(d => existing.exists(_.semanticEquals(d)))
      if (derived.isEmpty) f
      else Filter((existing ++ derived).reduce(And), child)
  }

  private def splitConj(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConj(l) ++ splitConj(r)
    case other => Seq(other)
  }

  /** Sidecar expressions for a geometry attribute, if present: the
    * spec `covering` paths recorded in the attribute's metadata win
    * (third-party GeoParquet — possibly struct fields like `bbox.xmin`),
    * else graft's own flat naming convention. */
  private def sidecars(g: Expression, child: LogicalPlan)
      : Option[(Expression, Expression, Expression, Expression, Boolean)] =
    g match {
      case a: Attribute =>
        // covering path: an UNTRUSTED writer may hold a NULL bbox beside a
        // non-null geometry (spec-noncompliant but readable), so its
        // conjuncts need a null-guard. Graft's own sidecars are null only
        // when the geometry itself is null — and then the exact ST_
        // predicate drops the row anyway — so the flat path stays bare.
        coveringSidecars(a, child).map { case (x0, y0, x1, y1) => (x0, y0, x1, y1, true) }
          .orElse {
            def find(s: String): Option[Expression] = child.output.find(c =>
              c.name == s"${a.name}_$s" && c.dataType == org.apache.spark.sql.types.DoubleType)
            for (x0 <- find("xmin"); y0 <- find("ymin"); x1 <- find("xmax"); y1 <- find("ymax"))
              yield (x0, y0, x1, y1, false)
          }
      case _ => None
    }

  /** `cmp` null-guarded when the column may be null on an untrusted
    * writer's file — the row must fall through to the exact predicate,
    * never be dropped by a derived conjunct. */
  private def guarded(guard: Boolean, col: Expression, cmp: Expression): Expression =
    if (guard && col.nullable) Or(cmp, IsNull(col)) else cmp

  /** Third-party GeoParquet files declare their bbox columns in the `geo`
    * footer's spec-1.1 `covering` block; GeoParquetMeta.tagSchema records
    * the four paths in the geometry field's metadata at read. Resolve each
    * dotted path against the child's output — struct steps via
    * ExtractValue; parquet pushes nested-field comparisons too, so a
    * `bbox.xmin >= v` conjunct still reaches PushedFilters. */
  private def coveringSidecars(a: Attribute, child: LogicalPlan)
      : Option[(Expression, Expression, Expression, Expression)] = {
    def path(corner: String): Option[Expression] = {
      val key = graft.tables.GeoSchema.CoveringPrefix + corner
      if (!a.metadata.contains(key)) None
      else {
        val parts = a.metadata.getString(key).split('.')
        // same resolver as the struct steps (honors spark.sql.caseSensitive)
        child.output.find(c => conf.resolver(c.name, parts.head)).flatMap { root =>
          try {
            val e = parts.tail.foldLeft(root: Expression)((acc, f) =>
              ExtractValue(acc, Literal(f), conf.resolver))
            if (e.dataType == org.apache.spark.sql.types.DoubleType) Some(e) else None
          } catch { case scala.util.control.NonFatal(_) => None }
        }
      }
    }
    for (x0 <- path("xmin"); y0 <- path("ymin"); x1 <- path("xmax"); y1 <- path("ymax"))
      yield (x0, y0, x1, y1)
  }

  /** Envelope of a foldable geometry literal; None when the literal
    * evaluates to null (e.g. st_geomfromtext(NULL) constant-folded) or to
    * bytes that don't parse — the rule then derives nothing rather than
    * crashing the whole optimization pass. */
  private def env(lit: Expression): Option[org.locationtech.jts.geom.Envelope] =
    try Option(lit.eval(null))
      .map(v => Geom.deserialize(v.asInstanceOf[Array[Byte]]).getEnvelopeInternal)
    catch { case scala.util.control.NonFatal(_) => None }

  private def d(v: Double) = Literal(v)

  /** bbox conjuncts implied by one ST_ predicate (empty when not applicable). */
  private def conjunctsFor(p: Expression, child: LogicalPlan): Seq[Expression] = p match {
    // literal CONTAINS/COVERS column  ->  column bbox inside literal bbox
    case StContains(l, g) if l.foldable && l.deterministic => env(l).toSeq.flatMap(inside(g, _, child))
    case StCovers(l, g) if l.foldable && l.deterministic => env(l).toSeq.flatMap(inside(g, _, child))
    // column WITHIN/COVEREDBY literal -> same containment direction
    case StWithin(g, l) if l.foldable && l.deterministic => env(l).toSeq.flatMap(inside(g, _, child))
    case StCoveredBy(g, l) if l.foldable && l.deterministic => env(l).toSeq.flatMap(inside(g, _, child))
    // intersects either way -> bbox overlap
    case StIntersects(l, g) if l.foldable && l.deterministic => env(l).toSeq.flatMap(overlap(g, _, child, 0.0))
    case StIntersects(g, l) if l.foldable && l.deterministic => env(l).toSeq.flatMap(overlap(g, _, child, 0.0))
    // dwithin(col, lit, dist) / dwithin(lit, col, dist) -> expanded overlap
    case StDWithin(Seq(g, l, dist)) if l.foldable && l.deterministic && dist.foldable =>
      distOpt(dist).toSeq.flatMap(dd => env(l).toSeq.flatMap(overlap(g, _, child, dd)))
    case StDWithin(Seq(l, g, dist)) if l.foldable && l.deterministic && dist.foldable =>
      distOpt(dist).toSeq.flatMap(dd => env(l).toSeq.flatMap(overlap(g, _, child, dd)))
    case _ => Seq.empty
  }

  private def distOpt(dist: Expression): Option[Double] =
    Option(dist.eval(null)).map(StKit.dbl)

  private def inside(g: Expression, e: org.locationtech.jts.geom.Envelope, child: LogicalPlan): Seq[Expression] =
    sidecars(g, child).toSeq.flatMap { case (x0, y0, x1, y1, guard) =>
      Seq(
        guarded(guard, x0, GreaterThanOrEqual(x0, d(e.getMinX))),
        guarded(guard, x1, LessThanOrEqual(x1, d(e.getMaxX))),
        guarded(guard, y0, GreaterThanOrEqual(y0, d(e.getMinY))),
        guarded(guard, y1, LessThanOrEqual(y1, d(e.getMaxY))))
    } ++ cellPruning(g, e, child)

  /** For containment predicates the geometry's bbox (hence its center) lies
    * inside the literal envelope, so the GeoParquet `<geom>_cell` partition
    * column can only take values from the envelope's covering cells — an
    * IN-list Spark turns into partition pruning. STRICTLY OPT-IN: fires only
    * when `spark.graft.geoparquet.cellSize` is explicitly set, and it MUST
    * equal the cellSize the data was written with (a mismatch would prune
    * wrongly). The bbox range conjuncts above are always safe regardless. */
  private def cellPruning(g: Expression, e: org.locationtech.jts.geom.Envelope, child: LogicalPlan): Seq[Expression] =
    g match {
      case a: Attribute =>
        for {
          cellAttr <- child.output.find(_.name == s"${a.name}_cell").toSeq
          cs <- spark.conf.getOption("spark.graft.geoparquet.cellSize").map(_.toDouble).toSeq
          ix0 = math.floor(e.getMinX / cs).toLong; ix1 = math.floor(e.getMaxX / cs).toLong
          iy0 = math.floor(e.getMinY / cs).toLong; iy1 = math.floor(e.getMaxY / cs).toLong
          n = (ix1 - ix0 + 1) * (iy1 - iy0 + 1)
          if n > 0 && n <= 4096 // don't blow up the IN-list
        } yield In(cellAttr,
          (for (ix <- ix0 to ix1; iy <- iy0 to iy1)
            yield Literal(graft.functions.StBbox.pack(ix, iy))))
      case _ => Seq.empty
    }

  private def overlap(g: Expression, e: org.locationtech.jts.geom.Envelope, child: LogicalPlan, dist: Double): Seq[Expression] =
    sidecars(g, child).toSeq.flatMap { case (x0, y0, x1, y1, guard) =>
      Seq(
        guarded(guard, x0, LessThanOrEqual(x0, d(e.getMaxX + dist))),
        guarded(guard, x1, GreaterThanOrEqual(x1, d(e.getMinX - dist))),
        guarded(guard, y0, LessThanOrEqual(y0, d(e.getMaxY + dist))),
        guarded(guard, y1, GreaterThanOrEqual(y1, d(e.getMinY - dist))))
    }
}
