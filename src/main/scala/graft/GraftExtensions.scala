package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.DotProduct

/** Session extensions (SURVEY.md §2.K): installs the engine's native
  * expressions into every session built with
  * `spark.sql.extensions=graft.GraftExtensions` (Verify/Bench set this),
  * making them available to SQL (`SELECT dot_product(a, b)`) as well as
  * the DataFrame API — the idiomatic Spark packaging for a library's
  * Catalyst additions. `graft.functions.VectorExprs.register` remains
  * as a per-session fallback for externally built sessions. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      { args: Seq[Expression] =>
        require(args.length == 2, "dot_product(a, b) takes two arguments")
        DotProduct(args.head, args(1))
      }))
  }
}
