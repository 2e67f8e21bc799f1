package graft.plans

import graft.functions.{CosineSim, SqL2}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension wiring for the engine's native functions.
  *
  * Usage: `SparkSession.builder().withExtensions(new GraftExtensions)`
  * or `--conf spark.sql.extensions=graft.plans.GraftExtensions`.
  * Query fns that need `cosine_sim` also call `CosineSim.register`
  * directly so they work on the driver-built session, which is
  * constructed without extensions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSim(exprs.head, exprs(1))))
    e.injectFunction((
      FunctionIdentifier("sq_l2"),
      new ExpressionInfo(classOf[SqL2].getName, "sq_l2"),
      (exprs: Seq[Expression]) => SqL2(exprs.head, exprs(1))))
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    e.injectOptimizerRule(_ => AccelerateCosine)
    e.injectOptimizerRule(_ => AccelerateSqL2)
    e.injectPostHocResolutionRule(s => ResolveCosineTopK(s))
  }
}
