package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Spark extension entry point: makes every graft native expression
  * available in ANY session created with
  *
  * {{{
  * spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * — the idiomatic packaging for a library of Catalyst expressions
  * (cluster-wide via spark-defaults.conf, no code-side `register` call
  * needed; `spark-sql` / JDBC / notebook sessions all see the functions).
  * The in-code `VectorExpressions.register` / `HyperplaneExpressions
  * .register` paths stay for sessions built without the conf; both draw
  * from the same builder lists so the surfaces cannot drift.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    (functions.VectorExpressions.builders ++
      functions.HyperplaneExpressions.builders).foreach {
      case (name, builder) =>
        ext.injectFunction((
          FunctionIdentifier(name),
          new ExpressionInfo("graft.functions", name),
          builder))
    }
    // native as-of join planner strategy + its pushdown-restoring
    // optimizer rule (plans.AsofJoinNative); the code-side path installs
    // the same objects via experimental strategies/optimizations
    ext.injectPlannerStrategy(_ => plans.AsofJoinNative.AsofJoinStrategy)
    ext.injectOptimizerRule(_ => plans.AsofJoinNative.AsofPushdownRule)
  }
}
