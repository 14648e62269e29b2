package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.{And, Expression}
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.execution.datasources.DataSourceStrategy
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

/** The second (and last) `private[sql]` doorway graft borrows — the
  * sibling of [[GraftStreamingShim]], same minimal-surface policy:
  * translate a user-facing `Column` predicate into the V1 `Filter`s
  * Spark itself would push to a data source. A bare `Column` is a LAZY
  * unresolved tree (`ColumnNodeExpression` over `UnresolvedFunction`/
  * `UnresolvedAttribute` in Spark 4), so the predicate is first
  * resolved and optimized against the table schema through the REAL
  * pipeline — a zero-IO `emptyDF.filter(pred)` plan, whose analyzer
  * binds attributes and whose optimizer folds literal casts
  * (`UnwrapCastInBinaryComparison`, `ConstantFolding`) exactly as a
  * production scan sees them — and only then fed to
  * `DataSourceStrategy.translateFilter`, the exact literal-conversion
  * and attribute-extraction rules every file-source scan uses (not a
  * re-implementation that could drift). The columnar fleet tier's
  * planning-time file pruning ([[graft.sources.ParquetFleet.scan]])
  * feeds the result to the shared `FleetStats.neverMatches` proofs.
  *
  * Best-effort by contract: a conjunct that doesn't translate (UDFs,
  * arithmetic on the column side) is silently dropped, and any
  * analysis failure yields no filters at all — the caller re-applies
  * the FULL predicate on whatever survives pruning, so a missing
  * translation costs a read, never a row. */
object GraftPushdownShim {

  def pushableFilters(s: SparkSession, schema: StructType,
      pred: Column): Seq[Filter] = {
    def conjuncts(x: Expression): Seq[Expression] = x match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    try {
      // LogicalRDD (unknown cardinality), NOT LocalRelation(Nil): the
      // optimizer must keep the Filter node rather than propagate
      // emptiness through it
      val df = s.createDataFrame(s.sparkContext.emptyRDD[Row], schema)
      df.filter(pred).queryExecution.optimizedPlan.collect {
        case f: logical.Filter => f.condition
      }.flatMap(conjuncts).flatMap { c =>
        try DataSourceStrategy.translateFilter(c,
          supportNestedPredicatePushdown = false)
        catch { case scala.util.control.NonFatal(_) => None }
      }
    } catch { case scala.util.control.NonFatal(_) => Seq.empty }
  }
}
