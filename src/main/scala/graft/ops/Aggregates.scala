package graft.ops

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.CentroidAgg
import graft.util.Tables._
import graft.util.Determinism._

/** Aggregation operators (SURVEY.md §2.D) — hash aggregation, distinct,
  * rollup/cube/grouping-sets, pivot, stats moments, collected lists,
  * sketches, and a typed UDAF.
  *
  * Scale: every query is a partial→final HashAggregate — map-side combine
  * before the shuffle, so shuffle volume is O(groups), not O(rows).
  * Group keys are low-cardinality (flags, types, labels). `collect_list`
  * is only ever applied per low-cardinality group (bounded list size);
  * the sketches (HLL, approx percentile) are the 100 TB path for
  * distinct/quantile — mergeable, constant memory.
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

  /** §2.D two-phase SALTED aggregation — the hand-rolled skew escape
    * hatch for when one group key carries a disproportionate share of a
    * 100 TB table (here `l_returnflag`: 3 values over 600k rows at
    * sf0.1, a genuinely hot key). Phase 1 groups by (key, salt) so the
    * hot key's rows spread across 16 reducers; phase 2 re-groups by key
    * to combine the decomposable partials (sum/count/min/max combine
    * losslessly; avg is derived as sum/count at the END — averaging
    * partial averages would be wrong under uneven salt buckets). The
    * result is bit-identical to the direct groupBy under the r4
    * rounding discipline, which is exactly the point: the oracle IS the
    * unsalted formulation. Spark's own map-side partial aggregation
    * already gives much of this for free — the explicit salt matters
    * when partial aggregation is defeated (high-cardinality composite
    * aggregates, `collect_list`, exact distinct), and AQE skew handling
    * only covers joins, not aggregations. */
  def qAggSkewTwophase(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    lineitem(s, dir)
      .groupBy($"l_returnflag", pmod($"l_orderkey", lit(16)).as("salt"))
      .agg(
        sum($"l_quantity").as("p_qty"),
        count(lit(1)).as("p_n"),
        min($"l_extendedprice").as("p_min"),
        max($"l_extendedprice").as("p_max"))
      .groupBy($"l_returnflag")
      .agg(
        r4(sum($"p_qty")).as("sum_qty"),
        sum($"p_n").as("n_rows"),
        r4(sum($"p_qty") / sum($"p_n")).as("avg_qty"),
        r4(min($"p_min")).as("min_price"),
        r4(max($"p_max")).as("max_price"))
      .orderBy($"l_returnflag")
  }

  /** §2.D ungrouped (global) aggregates — single-row output. */
  def qAggGlobal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    lineitem(s, dir).agg(
      count(lit(1)).as("n_rows"),
      r4(sum($"l_extendedprice")).as("sum_price"),
      r4(avg($"l_quantity")).as("avg_qty"),
      r4(min($"l_extendedprice")).as("min_price"),
      r4(max($"l_extendedprice")).as("max_price"),
      dstr(min($"l_shipdate")).as("min_ship"),
      dstr(max($"l_shipdate")).as("max_ship"))
  }

  /** §2.D distinct aggregates. */
  def qAggDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(
        countDistinct($"l_partkey").as("nd_part"),
        countDistinct($"l_suppkey").as("nd_supp"),
        count(lit(1)).as("n_rows"))
      .orderBy($"l_returnflag")
  }

  /** §2.D sketches: HLL distinct + approx percentile — the 100 TB path
    * for distinct counts/quantiles (mergeable, constant memory). No
    * oracle: sketch internals are engine-specific; the rows-only check
    * plus the ScalaTest 5%-of-exact bound cover it. */
  def qAggApproxDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(
        approx_count_distinct($"l_partkey").as("and_part"),
        percentile_approx($"l_quantity", lit(0.5), lit(1000)).as("ap_qty_p50"))
      .orderBy($"l_returnflag")
  }

  /** §2.D exact interpolated percentiles (matches DuckDB quantile_cont). */
  def qAggPercentile(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(
        r4(expr("percentile(l_quantity, 0.25)")).as("qty_p25"),
        r4(expr("percentile(l_quantity, 0.5)")).as("qty_p50"),
        r4(expr("percentile(l_quantity, 0.75)")).as("qty_p75"))
      .orderBy($"l_returnflag")
  }

  /** §2.D approximate percentile — the SKETCH twin of qAggPercentile:
    * `percentile_approx` (Greenwald–Khanna QuantileSummaries; bounded
    * O(accuracy) state per group, map-side combinable) at accuracy
    * 10000. At 100 TB this is the percentile you can actually run —
    * the exact form materializes and sorts every group's values, the
    * sketch streams them. Returns an actual element (no
    * interpolation), and the summary layout is engine-specific → no
    * oracle (the HLL pattern); OperatorSpec bounds every reported
    * quantile against the exact percentile instead. */
  def qAggPercentileApprox(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(
        r4(percentile_approx($"l_quantity", lit(0.25), lit(10000))).as("qty_p25"),
        r4(percentile_approx($"l_quantity", lit(0.5), lit(10000))).as("qty_p50"),
        r4(percentile_approx($"l_quantity", lit(0.75), lit(10000))).as("qty_p75"))
      .orderBy($"l_returnflag")
  }

  /** §2.D statistical moments. Spark's skewness/kurtosis are population
    * moments (m3/m2^1.5, m4/m2²−3); the oracle reproduces those with
    * explicit moment arithmetic since DuckDB's builtins are
    * sample-corrected. */
  def qAggStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(
        r6(stddev_samp($"l_quantity")).as("sd_qty"),
        r6(var_samp($"l_quantity")).as("var_qty"),
        r6(corr($"l_quantity", $"l_extendedprice")).as("corr_qp"),
        r6(covar_samp($"l_quantity", $"l_extendedprice")).as("cov_qp"),
        r6(skewness($"l_quantity")).as("skew_qty"),
        r6(kurtosis($"l_quantity")).as("kurt_qty"))
      .orderBy($"l_returnflag")
  }

  /** §2.D linear-regression aggregates (ANSI regr_* family): slope /
    * intercept / r² / point count of extendedprice over quantity per
    * return flag. Single-pass moment accumulators — map-side
    * combinable, O(1) state per group at any scale. Slope/intercept
    * magnitudes are ~1e3–1e4, so they round at 4 dp (the r4 discipline
    * for large aggregates); r² ∈ [0,1] rounds at 6. */
  def qAggRegr(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(
        r4(regr_slope($"l_extendedprice", $"l_quantity")).as("slope"),
        r4(regr_intercept($"l_extendedprice", $"l_quantity")).as("icept"),
        r6(regr_r2($"l_extendedprice", $"l_quantity")).as("r2"),
        regr_count($"l_extendedprice", $"l_quantity").as("n"))
      .orderBy($"l_returnflag")
  }

  /** §2.D list/set aggregation (reference: "column as array"); arrays
    * sorted for determinism. */
  def qAggCollect(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    customer(s, dir)
      .groupBy($"c_nationkey")
      .agg(
        // serialized ('|'-joined), not a raw array: the driver's pandas
        // comparator cannot hash array cells (round-1 lesson)
        concat_ws("|", sort_array(collect_set($"c_mktsegment"))).as("segments"),
        count(lit(1)).as("n_cust"))
      .orderBy($"c_nationkey")
  }

  /** §2.D conditional aggregation family: count_if / bool_and /
    * bool_or / filtered sum — the FILTER-clause semantics of ANSI SQL,
    * all map-side-combinable. */
  def qAggConditional(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(
        count_if($"l_discount" > 0.05).as("n_disc"),
        bool_and($"l_quantity" > 0.0).as("all_pos_qty"),
        bool_or($"l_tax" > 0.07).as("any_hi_tax"),
        r4(coalesce(sum(when($"l_linestatus" === "F", $"l_extendedprice")),
          lit(0.0))).as("price_f"),
        count(lit(1)).as("n"))
      .orderBy($"l_returnflag")
  }

  /** §2.K TypedImperativeAggregate: Misra–Gries heavy hitters per
    * returnflag over event/status values. k=16 exceeds the column's
    * distinct count, so the sketch is provably EXACT here and the
    * oracle is a plain GROUP BY re-serialized to the same
    * "item:count|…" string; the approximation + merge behavior under
    * k < distinct is locked in by ScalaTests. */
  def qAggFreqSketch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.FreqSketch.register(s)
    lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(call_function("freq_sketch", $"l_linestatus", lit(16))
        .as("status_counts"))
      .orderBy($"l_returnflag")
  }

  /** §2.D binned (histogram) aggregation: fixed-width value buckets —
    * one map-side-combined shuffle at any scale (the spreadsheet
    * histogram op). */
  def qAggHistogram(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    lineitem(s, dir)
      .groupBy(floor($"l_extendedprice" / lit(100.0)).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"), r4(avg($"l_quantity")).as("avg_qty"))
      .orderBy($"bucket")
  }

  /** §2.D ordered string aggregation (ANSI LISTAGG ... WITHIN GROUP;
    * Spark 4 syntax) — multiset concatenation, unlike q_agg_collect's
    * DISTINCT set form. */
  def qAggListagg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    customer(s, dir)
      .filter($"c_custkey" <= 200) // keep the concatenated row bounded
      .createOrReplaceTempView("graft_listagg_cust")
    s.sql("""
      SELECT c_nationkey,
        listagg(c_mktsegment, '|') WITHIN GROUP (ORDER BY c_mktsegment)
          AS segs,
        count(*) AS n
      FROM graft_listagg_cust
      GROUP BY c_nationkey
      ORDER BY c_nationkey""")
  }

  /** §2.D rollup with grouping id; subtotal keys coalesced to 'ALL'. */
  def qAggRollup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    lineitem(s, dir)
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(grouping_id().as("gid"),
        r4(sum($"l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce($"l_returnflag", lit("ALL")).as("flag"),
        coalesce($"l_linestatus", lit("ALL")).as("status"),
        $"gid", $"sum_qty", $"n")
      .orderBy($"flag", $"status")
  }

  /** §2.D cube. */
  def qAggCube(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    orders(s, dir)
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(grouping_id().as("gid"),
        r4(sum($"o_totalprice")).as("sum_price"), count(lit(1)).as("n"))
      .select(
        coalesce($"o_orderstatus", lit("ALL")).as("status"),
        coalesce($"o_orderpriority", lit("ALL")).as("priority"),
        $"gid", $"sum_price", $"n")
      .orderBy($"status", $"priority")
  }

  /** §2.D grouping sets: by status and by priority, one pass. */
  def qAggGsets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    orders(s, dir)
      .groupingSets(
        Seq(Seq($"o_orderstatus"), Seq($"o_orderpriority")),
        $"o_orderstatus", $"o_orderpriority")
      .agg(r4(sum($"o_totalprice")).as("sum_price"), count(lit(1)).as("n"))
      .select(
        coalesce($"o_orderstatus", lit("ALL")).as("status"),
        coalesce($"o_orderpriority", lit("ALL")).as("priority"),
        $"sum_price", $"n")
      .orderBy($"status", $"priority")
  }

  /** §2.D pivot with an explicit value list (one pass at any scale —
    * no extra job to discover pivot values). */
  def qAggPivot(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    events(s, dir)
      .groupBy($"user_id")
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .agg(r4(sum($"value")))
      .orderBy($"user_id")
  }

  /** §2.D typed UDAF: per-label embedding centroid via Aggregator
    * (graft.functions.CentroidAgg), exploded to long form (label, dim,
    * val) so the oracle stays trivially SQL-expressible. */
  def qAggCustomCentroid(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val centroid = udaf(CentroidAgg, ExpressionEncoder[Seq[Float]]())
    embeddings(s, dir)
      .groupBy($"label")
      .agg(centroid($"embedding").as("centroid"))
      .select($"label", posexplode($"centroid").as(Seq("dim", "v")))
      .select($"label", $"dim".cast("long").as("dim"), r6($"v").as("cval"))
      .orderBy($"label", $"dim")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_agg_group" -> qAggGroup _,
    "q_agg_skew_twophase" -> qAggSkewTwophase _,
    "q_agg_global" -> qAggGlobal _,
    "q_agg_distinct" -> qAggDistinct _,
    "q_agg_approx_distinct" -> qAggApproxDistinct _,
    "q_agg_percentile" -> qAggPercentile _,
    "q_agg_percentile_approx" -> qAggPercentileApprox _,
    "q_agg_stats" -> qAggStats _,
    "q_agg_regr" -> qAggRegr _,
    "q_agg_collect" -> qAggCollect _,
    "q_agg_conditional" -> qAggConditional _,
    "q_agg_freq_sketch" -> qAggFreqSketch _,
    "q_agg_histogram" -> qAggHistogram _,
    "q_agg_listagg" -> qAggListagg _,
    "q_agg_rollup" -> qAggRollup _,
    "q_agg_cube" -> qAggCube _,
    "q_agg_gsets" -> qAggGsets _,
    "q_agg_pivot" -> qAggPivot _,
    "q_agg_custom_centroid" -> qAggCustomCentroid _
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
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_agg_skew_twophase" ->
      """SELECT l_returnflag,
        |  round(sum(l_quantity), 4) AS sum_qty,
        |  count(*) AS n_rows,
        |  round(sum(l_quantity) / count(*), 4) AS avg_qty,
        |  round(min(l_extendedprice), 4) AS min_price,
        |  round(max(l_extendedprice), 4) AS max_price
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q_agg_global" ->
      """SELECT count(*) AS n_rows,
        |  round(sum(l_extendedprice), 4) AS sum_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(min(l_extendedprice), 4) AS min_price,
        |  round(max(l_extendedprice), 4) AS max_price,
        |  strftime(min(l_shipdate), '%Y-%m-%d') AS min_ship,
        |  strftime(max(l_shipdate), '%Y-%m-%d') AS max_ship
        |FROM lineitem""".stripMargin,
    "q_agg_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS nd_part,
        |  count(DISTINCT l_suppkey) AS nd_supp,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_agg_percentile" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.25), 4) AS qty_p25,
        |  round(quantile_cont(l_quantity, 0.5), 4) AS qty_p50,
        |  round(quantile_cont(l_quantity, 0.75), 4) AS qty_p75
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_agg_regr" ->
      """SELECT l_returnflag,
        |  round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        |  round(regr_intercept(l_extendedprice, l_quantity), 4) AS icept,
        |  round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
        |  CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q_agg_stats" ->
      """SELECT l_returnflag,
        |  round(stddev_samp(l_quantity), 6) AS sd_qty,
        |  round(var_samp(l_quantity), 6) AS var_qty,
        |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
        |  round(covar_samp(l_quantity, l_extendedprice), 6) AS cov_qp,
        |  round(avg(pow(l_quantity - m_qty, 3))
        |        / pow(avg(pow(l_quantity - m_qty, 2)), 1.5), 6) AS skew_qty,
        |  round(avg(pow(l_quantity - m_qty, 4))
        |        / pow(avg(pow(l_quantity - m_qty, 2)), 2) - 3, 6) AS kurt_qty
        |FROM (SELECT l_returnflag, l_quantity, l_extendedprice,
        |        avg(l_quantity) OVER (PARTITION BY l_returnflag) AS m_qty
        |      FROM lineitem)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_agg_collect" ->
      """SELECT c_nationkey,
        |  array_to_string(list_sort(list(DISTINCT c_mktsegment)), '|') AS segments,
        |  count(*) AS n_cust
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q_agg_conditional" ->
      """SELECT l_returnflag,
        |  count(*) FILTER (l_discount > 0.05) AS n_disc,
        |  bool_and(l_quantity > 0.0) AS all_pos_qty,
        |  bool_or(l_tax > 0.07) AS any_hi_tax,
        |  round(coalesce(sum(l_extendedprice) FILTER (l_linestatus = 'F'),
        |    0.0), 4) AS price_f,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_agg_histogram" ->
      """SELECT CAST(floor(l_extendedprice / 100.0) AS BIGINT) AS bucket,
        |  count(*) AS n, round(avg(l_quantity), 4) AS avg_qty
        |FROM lineitem GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q_agg_listagg" ->
      """SELECT c_nationkey,
        |  string_agg(c_mktsegment, '|' ORDER BY c_mktsegment) AS segs,
        |  count(*) AS n
        |FROM customer WHERE c_custkey <= 200
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q_agg_freq_sketch" ->
      """SELECT l_returnflag,
        |  string_agg(l_linestatus || ':' || cnt, '|' ORDER BY l_linestatus)
        |    AS status_counts
        |FROM (SELECT l_returnflag, l_linestatus, count(*) AS cnt
        |      FROM lineitem GROUP BY l_returnflag, l_linestatus)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_agg_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
        |  coalesce(l_linestatus, 'ALL') AS status,
        |  grouping(l_returnflag, l_linestatus) AS gid,
        |  round(sum(l_quantity), 4) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY flag, status""".stripMargin,
    "q_agg_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  grouping(o_orderstatus, o_orderpriority) AS gid,
        |  round(sum(o_totalprice), 4) AS sum_price,
        |  count(*) AS n
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,
    "q_agg_gsets" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  round(sum(o_totalprice), 4) AS sum_price,
        |  count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        |ORDER BY status, priority""".stripMargin,
    "q_agg_pivot" ->
      """SELECT user_id,
        |  round(sum(value) FILTER (event_type = 'click'), 4) AS click,
        |  round(sum(value) FILTER (event_type = 'view'), 4) AS view,
        |  round(sum(value) FILTER (event_type = 'purchase'), 4) AS purchase,
        |  round(sum(value) FILTER (event_type = 'signup'), 4) AS signup,
        |  round(sum(value) FILTER (event_type = 'error'), 4) AS error
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_agg_custom_centroid" ->
      """SELECT label, dim, round(avg(v), 6) AS cval
        |FROM (SELECT label,
        |        generate_subscripts(embedding, 1) - 1 AS dim,
        |        unnest(embedding) AS v
        |      FROM embeddings)
        |GROUP BY label, dim ORDER BY label, dim""".stripMargin
  )
}
