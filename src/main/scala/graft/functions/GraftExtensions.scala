package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** `SparkSessionExtensions` hook: makes every graft codec/vector
  * function available in any session built with
  * `.withExtensions(new GraftExtensions)` (or
  * `spark.sql.extensions=graft.functions.GraftExtensions`) — no
  * imperative register() call needed — and injects the engine's
  * optimizer rules (currently [[graft.plans.NanosRangeRewrite]], which
  * turns epoch-nanos time-range predicates over TIMESTAMP_NTZ sources
  * back into pushdown-able scan ranges).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExpressions.builders.foreach { case (name, b) =>
      e.injectFunction((new FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.GraftExpressions", name), b))
    }
    e.injectOptimizerRule(_ => graft.plans.NanosRangeRewrite)
  }
}
