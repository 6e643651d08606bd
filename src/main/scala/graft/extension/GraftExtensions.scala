package graft.extension

import graft.functions.GraftFunctions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/**
 * `spark.sql.extensions=graft.extension.GraftExtensions` entry point —
 * the analog of the reference's SedonaIcebergExtensions
 * (reference: extension/.../SedonaIcebergExtensions.scala:33): registers the
 * full ST_ catalog at session build time. Optimizer rules / planner
 * strategies (spatial join rewrite, bbox pushdown) are injected here too as
 * they land.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.catalog.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name), new ExpressionInfo("graft", name), builder))
    }
    ext.injectOptimizerRule(graft.plans.GeoBboxPushdown.apply)
    ext.injectOptimizerRule(graft.plans.SpatialJoinRewrite.apply)
  }
}
