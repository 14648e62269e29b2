package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.Tables._
import graft.util.Determinism._

/** Composition queries: whole pipelines built from the engine's own
  * operators — the "a user runs their entire prep pipeline on this"
  * demonstrators.
  *
  * Scale: both queries are chains of the already-scale-audited pieces
  * (hash dedup, quality gate, broadcast/keyed joins, windows); nothing
  * new shuffles. The training-set builder's joins key on doc_id/vec_id
  * so the whole chain co-partitions after the first shuffle.
  */
object Pipeline {

  /** LLM training-set builder: documents → exact-dedup winners →
    * quality gate → language allowlist → attach embeddings → emit
    * training rows with token counts and labels. */
  def qPipelineTrainset(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // exact-dedup winners (SHARED core with q_dedup_exact) → the SHARED
    // quality gate (same thresholds as q_text_quality) → lang allowlist
    val winners = LlmOps.withDedupRank(documents(s, dir))
      .filter($"rn" === 1)
      .select($"doc_id", $"text", $"lang", $"n_chars")
    val kept = winners
      .withColumn("n_tokens", size(split(lower($"text"), " ")).cast("long"))
      .filter(TextOps.qualityOk($"text", $"n_chars") &&
        $"lang".isin("en", "fr", "es"))
    // attach embeddings (doc_id = vec_id in the fixtures)
    kept
      .join(embeddings(s, dir), kept("doc_id") === col("vec_id"), "inner")
      .select($"doc_id", $"lang", $"n_tokens", $"label",
        r6(element_at($"embedding".cast("array<double>"), 1)).as("e0"))
      .orderBy($"doc_id")
  }

  /** Conversion funnel: per user, clicks followed by a purchase within
    * two hours (event-sequence analysis over the interval-join shape). */
  def qPipelineFunnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = events(s, dir)
    val clicks = e.filter($"event_type" === "click")
      .select($"user_id", $"ts".as("click_ts"))
    val purchases = e.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"event_id".as("purchase_id"),
        $"ts".as("p_ts"))
    val conv = clicks.join(purchases,
      $"user_id" === $"p_user" &&
        $"p_ts" > $"click_ts" &&
        $"p_ts" <= $"click_ts" + expr("INTERVAL 2 HOURS"))
      .groupBy($"user_id")
      .agg(countDistinct($"purchase_id").as("n_conversions"))
    e.groupBy($"user_id")
      .agg(
        count(when($"event_type" === "click", 1)).as("n_clicks"),
        count(when($"event_type" === "purchase", 1)).as("n_purchases"))
      .join(conv, Seq("user_id"), "left_outer")
      .select($"user_id", $"n_clicks", $"n_purchases",
        coalesce($"n_conversions", lit(0L)).as("n_conversions"),
        (coalesce($"n_conversions", lit(0L)) > 0).as("converted"))
      .orderBy($"user_id")
  }

  /** The SQL entry point (SURVEY.md §3.2 E2) exercised end-to-end: the
    * reference's "workbook = named collection of sheets" becomes temp
    * views in the session catalog, queried with multi-join ANSI SQL.
    * Same Catalyst pipeline from analysis onward as the DSL queries. */
  def qSqlRevenue(s: SparkSession, dir: String): DataFrame = {
    Seq("orders", "customer", "nation", "region")
      .foreach(n => t(s, dir, n).createOrReplaceTempView(s"v_$n"))
    s.sql(
      """SELECT r.r_name AS region, n.n_name AS nation,
        |  round(sum(o.o_totalprice), 4) AS revenue,
        |  count(*) AS n_orders
        |FROM v_orders o
        |JOIN v_customer c ON o.o_custkey = c.c_custkey
        |JOIN v_nation n ON c.c_nationkey = n.n_nationkey
        |JOIN v_region r ON n.n_regionkey = r.r_regionkey
        |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
        |GROUP BY r.r_name, n.n_name
        |ORDER BY region, nation""".stripMargin)
  }

  /** TPC-H Q3-shaped shipping-priority pipeline in the DSL (the SQL
    * twin of this shape is `q_sql_revenue`): a selective dimension
    * filter (one market segment ≈ 1/5 of customers), two date windows,
    * a 3-table join, revenue aggregation per order, top-10. The
    * Catalyst showcase: both filters reach their parquet scans
    * (PushedFilters), the customer side joins broadcast (post-filter
    * it is small), join reorder keys off the selective dimension, and
    * the top-10 lowers to TakeOrderedAndProject — no global sort of
    * the aggregate. */
  def qSqlShippingPriority(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cutoff = lit("1998-06-15").cast("timestamp")
    val cust = customer(s, dir).filter($"c_mktsegment" === "BUILDING")
      .select($"c_custkey")
    val ords = orders(s, dir).filter($"o_orderdate" < cutoff)
      .select($"o_orderkey", $"o_custkey", $"o_orderdate", $"o_orderpriority")
    val li = lineitem(s, dir).filter($"l_shipdate" > cutoff)
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
    li.join(ords, $"l_orderkey" === $"o_orderkey")
      .join(cust, $"o_custkey" === $"c_custkey")
      .groupBy($"o_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg(r4(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")))
        .as("revenue"))
      .select($"o_orderkey", $"revenue", dstr($"o_orderdate").as("order_date"),
        $"o_orderpriority")
      .orderBy($"revenue".desc, $"o_orderkey")
      .limit(10)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pipeline_trainset" -> qPipelineTrainset _,
    "q_pipeline_funnel" -> qPipelineFunnel _,
    "q_sql_revenue" -> qSqlRevenue _,
    "q_sql_shipping_priority" -> qSqlShippingPriority _
  )

  val oracleSql: Map[String, String] = Map(
    "q_pipeline_trainset" ->
      """WITH winners AS (
        |  SELECT doc_id, text, lang, n_chars FROM (
        |    SELECT doc_id, text, lang, n_chars,
        |      row_number() OVER (PARTITION BY sha256(lower(trim(text)))
        |                         ORDER BY doc_id) AS rn
        |    FROM documents)
        |  WHERE rn = 1),
        |kept AS (
        |  SELECT doc_id, lang,
        |    len(string_split(lower(text), ' ')) AS n_tokens
        |  FROM winners
        |  WHERE len(string_split(lower(text), ' ')) BETWEEN 5 AND 1000
        |    AND len(list_filter(string_split(lower(text), ' '),
        |          x -> x IN ('the','a','of','and','or','is','in')))
        |        / CAST(len(string_split(lower(text), ' ')) AS DOUBLE) < 0.5
        |    AND length(text) / CAST(n_chars AS DOUBLE) > 0.1
        |    AND lang IN ('en', 'fr', 'es'))
        |SELECT k.doc_id, k.lang, k.n_tokens, e.label,
        |  round(CAST(e.embedding[1] AS DOUBLE), 6) AS e0
        |FROM kept k JOIN embeddings e ON k.doc_id = e.vec_id
        |ORDER BY k.doc_id""".stripMargin,
    "q_pipeline_funnel" ->
      """WITH conv AS (
        |  SELECT c.user_id, count(DISTINCT p.event_id) AS n_conversions
        |  FROM (SELECT * FROM events WHERE event_type = 'click') c
        |  JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |    ON p.user_id = c.user_id
        |   AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 2 HOUR
        |  GROUP BY c.user_id),
        |totals AS (
        |  SELECT user_id,
        |    count(*) FILTER (event_type = 'click') AS n_clicks,
        |    count(*) FILTER (event_type = 'purchase') AS n_purchases
        |  FROM events GROUP BY user_id)
        |SELECT t.user_id, t.n_clicks, t.n_purchases,
        |  coalesce(conv.n_conversions, 0) AS n_conversions,
        |  coalesce(conv.n_conversions, 0) > 0 AS converted
        |FROM totals t LEFT JOIN conv ON t.user_id = conv.user_id
        |ORDER BY t.user_id""".stripMargin,
    "q_sql_shipping_priority" ->
      """SELECT l.l_orderkey AS o_orderkey,
        |  round(sum(l.l_extendedprice * (1.0 - l.l_discount)), 4) AS revenue,
        |  strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
        |  o.o_orderpriority
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND o.o_orderdate < TIMESTAMP '1998-06-15'
        |  AND l.l_shipdate > TIMESTAMP '1998-06-15'
        |GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 10""".stripMargin,
    "q_sql_revenue" ->
      """SELECT r.r_name AS region, n.n_name AS nation,
        |  round(sum(o.o_totalprice), 4) AS revenue,
        |  count(*) AS n_orders
        |FROM orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
        |GROUP BY r.r_name, n.n_name
        |ORDER BY region, nation""".stripMargin
  )
}
