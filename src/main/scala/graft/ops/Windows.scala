package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.Tables._
import graft.util.Determinism._

/** Window functions (SURVEY.md §2.E).
  *
  * Scale: a window = one shuffle on the partition key + a sort within
  * partitions; all five shapes here partition on a real key (custkey /
  * user_id) so work distributes. Frames are explicit ROWS/RANGE specs —
  * never the implicit default — both for determinism and because the
  * running/sliding frames stream in O(1) memory per row.
  */
object Windows {

  /** §2.E ranking family over a total order (date + key tie-break). */
  def qWinRank(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    orders(s, dir)
      .select($"o_custkey", $"o_orderkey",
        row_number().over(w).cast("long").as("rn"),
        rank().over(w).cast("long").as("rk"),
        dense_rank().over(w).cast("long").as("drk"),
        r6(percent_rank().over(w)).as("prk"),
        ntile(4).over(w).cast("long").as("quartile"),
        r6(cume_dist().over(w)).as("cd"))
      .orderBy($"o_custkey", $"rn")
  }

  /** §2.E analytic family (lag/lead/first/last/nth) with explicit frame. */
  def qWinLag(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, dir)
      .select($"user_id", $"event_id",
        lag($"value", 1).over(w).as("prev_value"),
        lead($"value", 1).over(w).as("next_value"),
        first($"event_id").over(wf).as("first_id"),
        last($"event_id").over(wf).as("last_id"),
        nth_value($"event_id", 2).over(wf).as("second_id"))
      .orderBy($"user_id", $"event_id")
  }

  /** §2.E running aggregate, ROWS unbounded-preceding frame. */
  def qWinRunning(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders(s, dir)
      .select($"o_custkey", $"o_orderkey",
        r4(sum($"o_totalprice").over(w)).as("running_spend"),
        count(lit(1)).over(w).as("running_n"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  /** §2.E sliding ROWS frame (3-row trailing average). */
  def qWinSliding(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(-2, Window.currentRow)
    events(s, dir)
      .select($"user_id", $"event_id",
        r4(avg($"value").over(w)).as("avg3"),
        r4(min($"value").over(w)).as("min3"))
      .orderBy($"user_id", $"event_id")
  }

  /** §2.E RANGE frame over epoch seconds: 30-day trailing spend. */
  def qWinRange(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy(unix_timestamp($"o_orderdate"))
      .rangeBetween(-86400L * 30, 0)
    orders(s, dir)
      .select($"o_custkey", $"o_orderkey",
        r4(sum($"o_totalprice").over(w)).as("spend_30d"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  /** §2.K typed sorted-group processing — the SECONDARY-SORT primitive
    * (`KeyValueGroupedDataset.flatMapSortedGroups`): per-user event
    * gaps computed by an imperative iterator over each user's events
    * in timestamp order. Same answer as a `lag` window (the oracle IS
    * the lag formulation), but a different — and at scale, sometimes
    * the only viable — physical shape: the sort rides the shuffle
    * (sort-based aggregation within partitions, no window buffer), and
    * the group handler holds O(1) state regardless of group size, so
    * arbitrarily long per-key histories stream through without
    * materializing a window frame. This is the Spark-4 idiom replacing
    * the RDD-era `repartitionAndSortWithinPartitions` secondary sort;
    * use it when the per-group logic is genuinely imperative (session
    * stitching, legacy parser state machines) — for anything
    * SQL-expressible the declarative window twin (`q_win_lag`) keeps
    * codegen. Gaps are whole seconds (events are minutes apart; the
    * sort key is the same truncated-second + event_id pair the oracle
    * orders by, so the orders agree exactly). */
  def qWinSortedGroups(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    events(s, dir)
      .select($"user_id", $"event_id", unix_timestamp($"ts").as("ts_s"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapSortedGroups($"ts_s", $"event_id") { (uid, it) =>
        var prev = Long.MinValue
        it.map { case (_, eid, tsS) =>
          val gap = if (prev == Long.MinValue) -1L else tsS - prev
          prev = tsS
          (uid, eid, gap)
        }
      }
      .toDF("user_id", "event_id", "gap_s")
      .orderBy($"user_id", $"event_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_win_rank" -> qWinRank _,
    "q_win_sorted_groups" -> qWinSortedGroups _,
    "q_win_lag" -> qWinLag _,
    "q_win_running" -> qWinRunning _,
    "q_win_sliding" -> qWinSliding _,
    "q_win_range" -> qWinRange _
  )

  val oracleSql: Map[String, String] = Map(
    "q_win_sorted_groups" ->
      """WITH e AS (
        |  SELECT user_id, event_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
        |  FROM events)
        |SELECT user_id, event_id,
        |  coalesce(ts_s - lag(ts_s, 1) OVER w, -1) AS gap_s
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)
        |ORDER BY user_id, event_id""".stripMargin,
    "q_win_rank" ->
      """SELECT o_custkey, o_orderkey,
        |  row_number() OVER w AS rn,
        |  rank() OVER w AS rk,
        |  dense_rank() OVER w AS drk,
        |  round(percent_rank() OVER w, 6) AS prk,
        |  ntile(4) OVER w AS quartile,
        |  round(cume_dist() OVER w, 6) AS cd
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, rn""".stripMargin,
    "q_win_lag" ->
      """SELECT user_id, event_id,
        |  lag(value, 1) OVER w AS prev_value,
        |  lead(value, 1) OVER w AS next_value,
        |  first_value(event_id) OVER wf AS first_id,
        |  last_value(event_id) OVER wf AS last_id,
        |  nth_value(event_id, 2) OVER wf AS second_id
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
        |  wf AS (PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,
    "q_win_running" ->
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER w, 4) AS running_spend,
        |  count(*) OVER w AS running_n
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_win_sliding" ->
      """SELECT user_id, event_id,
        |  round(avg(value) OVER w, 4) AS avg3,
        |  round(min(value) OVER w, 4) AS min3
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,
    "q_win_range" ->
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER w, 4) AS spend_30d
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
        |             RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin
  )
}
