package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** `SparkSessionExtensions` hook: makes every graft codec/vector
  * function available in any session built with
  * `.withExtensions(new GraftExtensions)` (or
  * `spark.sql.extensions=graft.functions.GraftExtensions`) — no
  * imperative register() call needed. This is the injection point where
  * a custom Rule/Strategy would also go; none is needed for this
  * engine's surface (SURVEY.md §7.3 — built-ins + expressions suffice).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExpressions.builders.foreach { case (name, b) =>
      e.injectFunction((new FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.GraftExpressions", name), b))
    }
}
