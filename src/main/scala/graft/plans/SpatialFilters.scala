package graft.plans

import graft.functions._
import graft.geom.Geom

import org.apache.spark.sql.catalyst.expressions._
import org.locationtech.jts.geom.Envelope

/**
 * Shared envelope extraction from ST_ predicates against literal geometry —
 * the same derivations GeoBboxPushdown injects as scan conjuncts, exposed
 * standalone so FILE-level pruning (GeoTable/GeoManifest) can evaluate them
 * against per-file bbox stats on the driver, the way Iceberg prunes data
 * files from manifest column stats before planning the scan (reference:
 * extension/.../SedonaPredicatePushDown.scala:59 maps ST_ predicates to
 * Iceberg expressions for exactly this).
 */
object SpatialFilters {

  /** Envelope such that rows of `geomCol` NOT bbox-intersecting it cannot
    * satisfy `cond`. Conjunctions intersect their envelopes; unrecognized
    * conjuncts contribute nothing (safe: pruning only tightens). None when
    * no conjunct constrains `geomCol`. */
  def queryEnvelope(cond: Expression, geomCol: String): Option[Envelope] = {
    val envs = conjuncts(cond).flatMap(envelopeOf(_, geomCol))
    if (envs.isEmpty) None
    else Some(envs.reduce((a, b) => a.intersection(b)))
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  private def isCol(e: Expression, name: String): Boolean = e match {
    case a: Attribute => a.name == name
    case _ => false
  }

  private def lit(e: Expression): Option[Envelope] =
    if (!e.foldable || !e.deterministic) None
    else try Option(e.eval(null)).map(v =>
      Geom.deserialize(v.asInstanceOf[Array[Byte]]).getEnvelopeInternal)
    catch { case scala.util.control.NonFatal(_) => None }

  private def expand(e: Envelope, d: Double): Envelope = {
    val r = new Envelope(e); r.expandBy(d); r
  }

  /** The bbox constraint one predicate places on `geomCol`, if any. */
  private def envelopeOf(p: Expression, geomCol: String): Option[Envelope] = p match {
    case StContains(l, g) if isCol(g, geomCol) => lit(l)
    case StCovers(l, g) if isCol(g, geomCol) => lit(l)
    case StWithin(g, l) if isCol(g, geomCol) => lit(l)
    case StCoveredBy(g, l) if isCol(g, geomCol) => lit(l)
    case StIntersects(l, g) if isCol(g, geomCol) => lit(l)
    case StIntersects(g, l) if isCol(g, geomCol) => lit(l)
    case StEquals(g, l) if isCol(g, geomCol) => lit(l)
    case StEquals(l, g) if isCol(g, geomCol) => lit(l)
    case StDWithin(Seq(g, l, dist)) if isCol(g, geomCol) && dist.foldable =>
      for (e <- lit(l); d <- Option(dist.eval(null)).map(StKit.dbl)) yield expand(e, d)
    case StDWithin(Seq(l, g, dist)) if isCol(g, geomCol) && dist.foldable =>
      for (e <- lit(l); d <- Option(dist.eval(null)).map(StKit.dbl)) yield expand(e, d)
    case _ => None
  }
}
