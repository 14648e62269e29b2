package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables._
import graft.util.Determinism._

/** Aggregation operators (SURVEY.md §2.D) — hash aggregation, distinct,
  * rollup/cube/grouping-sets, pivot, stats moments, collected lists.
  *
  * Scale: every query here is a partial→final HashAggregate — map-side
  * combine happens before the shuffle, so shuffle volume is O(groups),
  * not O(rows). Group-by keys are low-cardinality (flags, dates, types),
  * so the final stage is tiny even at 100 TB.
  */
object Aggregates {

  /** Flagship: TPC-H Q1-style pricing summary (SURVEY.md §7.3). */
  def qAggGroup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    lineitem(s, dir)
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        r4(sum($"l_quantity")).as("sum_qty"),
        r4(sum($"l_extendedprice")).as("sum_base_price"),
        r4(sum($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("sum_disc_price"),
        r4(avg($"l_quantity")).as("avg_qty"),
        r4(avg($"l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_agg_group" -> qAggGroup _
  )

  val oracleSql: Map[String, String] = Map(
    "q_agg_group" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 4) AS sum_qty,
        |  round(sum(l_extendedprice), 4) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
