package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.Tables._
import graft.util.Determinism._

/** Training-set preparation operators (SURVEY.md §2.J extension):
  * benchmark decontamination, stratified corpus sampling, greedy
  * sequence packing, and domain-mixture reweighting — the steps between
  * "deduplicated corpus" and "batches on the trainer".
  *
  * Scale notes:
  *  - Decontamination is an inverted-index equi-join on the shingle,
  *    never doc×doc: the eval pool's distinct shingle set is tiny
  *    relative to the corpus (benchmarks are MBs, corpora are TBs), so
  *    it broadcasts and the train side streams map-side.
  *  - Packing never windows over an unbounded key: the per-language
  *    running sum is sharded — shard-local window sums over
  *    (lang, shard = doc_id div shardSize) plus broadcast per-shard
  *    offsets — so the largest window partition is shardSize rows no
  *    matter how big one language's slice of the corpus gets.
  *  - Mixture weighting is two hash aggregations and a broadcast of a
  *    one-row total — O(corpus) scan, O(domains) state.
  */
object TrainPrep {

  /** The deterministic eval/train split used by the decontamination
    * query: every 20th doc_id plays the held-out benchmark. A real
    * pipeline reads the benchmark from its own table; the split keeps
    * the fixture self-contained while exercising the identical plan. */
  private val evalSplit = 20

  /** §2.J benchmark decontamination: flag training documents sharing
    * any word-3-gram with the held-out eval pool (the n-gram-overlap
    * rule used for LLM train-set hygiene). Reuses the corpus-wide
    * distinct-shingle cache shared with the dedup/fingerprint family,
    * so decontamination adds no tokenize pass of its own. */
  def qDecontaminate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = documents(s, dir)
    val sh = graft.util.Shingles.tokDistinct(s, docs, 3)
    val isEval = pmod($"doc_id", lit(evalSplit)) === 0
    // the eval pool's shingle SET (not per-doc): contaminated-or-not
    // needs membership only, and the distinct set is the broadcast side
    val evalSh = sh.filter(isEval).select($"shingle").distinct()
    val overlap = sh.filter(!isEval)
      .join(broadcast(evalSh), Seq("shingle"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_overlap"))
    docs.filter(!isEval).select($"doc_id")
      .join(overlap, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"n_overlap", lit(0L)).as("n_overlap"),
        (coalesce($"n_overlap", lit(0L)) > 0).as("contaminated"))
      .orderBy($"doc_id")
  }

  /** §2.J stratified deterministic sampling: per-language rates via the
    * same content-addressed md5-prefix threshold as q_sample_hash
    * (reproducible across runs, engines, and cluster sizes — no RNG,
    * no partitioning dependence). Rates are the mixture knob: keep half
    * of en, 25% of zh, ~10% of the rest. */
  def qSampleStratified(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    documents(s, dir)
      .withColumn("hpfx",
        substring(md5(concat_ws("#", $"doc_id", $"text")), 1, 2))
      .withColumn("thresh",
        when($"lang" === "en", lit("80"))      // 128/256 = 50%
          .when($"lang" === "zh", lit("40"))   //  64/256 = 25%
          .otherwise(lit("1a")))               //  26/256 ≈ 10%
      .filter($"hpfx" < $"thresh")
      .select($"doc_id", $"lang", $"hpfx")
      .orderBy($"doc_id")
  }

  /** §2.J EXACT-QUOTA stratified sampling — the complement of the
    * rate-based sampler: take exactly min(K, |group|) docs per
    * language, chosen by content-hash order (md5 asc, doc_id
    * tie-break) so the selection is reproducible across runs, engines,
    * and cluster sizes with no RNG. The rank-≤-K filter is the shape
    * Catalyst lowers to `WindowGroupLimit` (plan-asserted in
    * TrainPrepSpec): each map task pre-filters to its local top-K
    * BEFORE the shuffle, so a 5-language window over 100 TB moves
    * O(tasks·K) rows per language, not the corpus — the window twin of
    * the fleet TopN pushdown. */
  def qSampleQuota(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"lang").orderBy(md5($"text"), $"doc_id")
    documents(s, dir)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= 50)
      .select($"doc_id", $"lang", $"rk")
      .orderBy($"doc_id")
  }

  /** Sharded cumulative-sum packing core: the language-wide running
    * token count is decomposed into shard-local window sums plus a
    * per-shard offset, so NO window partition ever exceeds `shardSize`
    * rows. A plain `Window.partitionBy(lang)` puts an entire language's
    * cumulative sum on ONE task — terabytes through a single executor
    * at corpus scale. Here:
    *   1. shard = doc_id div shardSize — bounded, order-preserving
    *      (doc_id order within a lang is shard-major, then local);
    *   2. shard-local running sums window over (lang, shard);
    *   3. per-shard totals (one row per (lang, shard) — corpus/shardSize
    *      rows, tiny) get exclusive running offsets via a window over
    *      that TINY frame, then broadcast-join back.
    * Output is bit-identical to the single-window definition — the
    * oracle keeps the straightforward form, so the driver gate itself
    * proves the sharded plan output-equivalent. */
  private[graft] def packBins(s: SparkSession, toks: DataFrame,
      capacity: Long, shardSize: Long): DataFrame = {
    import s.implicits._
    require(capacity > 0, s"packBins capacity must be positive: $capacity")
    // cached: both the offsets branch and the cumsum branch read this
    // frame, and the groupBy shuffle vs window shuffle are not identical
    // subplans (no exchange reuse) — without the cache the full token
    // scan runs twice. Released via graft.util.Caches.clear.
    val sharded = toks.withColumn("shard",
      floor($"doc_id" / shardSize).cast("long")).cache()
    val wLocal = Window.partitionBy($"lang", $"shard").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // offsets frame: one row per (lang, shard); its lang-partitioned
    // window sees corpus/shardSize rows, not corpus rows
    val wOff = Window.partitionBy($"lang").orderBy($"shard")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sharded.groupBy($"lang", $"shard")
      .agg(sum($"n_tokens").as("shard_tot"))
      .withColumn("offset", coalesce(sum($"shard_tot").over(wOff), lit(0L)))
      .select($"lang", $"shard", $"offset")
    sharded.withColumn("cum_local", sum($"n_tokens").over(wLocal))
      .join(broadcast(offsets), Seq("lang", "shard"))
      // integral `div`: exact for ANY capacity (double `/` is exact only
      // for power-of-two capacities below 2^53) and matches the DuckDB
      // `//` oracle bit-for-bit on the non-negative cumulative sums
      .withColumn("start_tok", $"offset" + $"cum_local" - $"n_tokens")
      .select($"doc_id", $"lang", $"n_tokens",
        expr(s"start_tok div ${capacity}L").as("bin"))
  }

  /** §2.J greedy sequence packing: assign documents to fixed-capacity
    * token bins (capacity 2048) in arrival (doc_id) order within each
    * language — the contiguous-fill approximation of batch packing,
    * where a bin is the cumulative token count before the doc divided
    * by capacity. Runs through the sharded core: shardSize 128 gives 4
    * shards at fixture scale (doc_id 0–499) so the multi-shard path is
    * what the correctness gate checks; production wants ~100k-row
    * shards (or a (domain, date-bucket) key) — same plan shape. */
  def qPackGreedy(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = documents(s, dir)
      .select($"doc_id", $"lang",
        size(split($"text", " ")).cast("long").as("n_tokens"))
    packBins(s, toks, capacity = 2048L, shardSize = 128L)
      .orderBy($"doc_id")
  }

  /** §2.J domain-mixture reweighting: per (lang, source) token share of
    * the corpus and the sampling weight that would equalize the mixture
    * (weight = uniform-target-share / observed-share). The DoReMi-style
    * reweighting step reduced to its data-engine core: two hash
    * aggregations plus a broadcast one-row total. */
  def qMixWeights(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cells = documents(s, dir)
      .groupBy($"lang", $"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split($"text", " ")).cast("long")).as("n_tokens"))
    val tot = cells.agg(sum($"n_tokens").as("tot"),
      count(lit(1)).as("ncells"))
    cells.crossJoin(broadcast(tot))
      .select($"lang", $"source", $"n_docs", $"n_tokens",
        r6($"n_tokens" / $"tot").as("share"),
        r6($"tot" / ($"ncells" * $"n_tokens")).as("weight"))
      .orderBy($"lang", $"source")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_decontaminate" -> qDecontaminate _,
    "q_sample_stratified" -> qSampleStratified _,
    "q_sample_quota" -> qSampleQuota _,
    "q_pack_greedy" -> qPackGreedy _,
    "q_mix_weights" -> qMixWeights _
  )

  val oracleSql: Map[String, String] = Map(
    "q_decontaminate" ->
      """WITH sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(string_split(lower(text), ' ')) >= 3 THEN
        |      list_transform(
        |        generate_series(1, len(string_split(lower(text), ' ')) - 2),
        |        i -> string_split(lower(text), ' ')[i] || ' ' ||
        |             string_split(lower(text), ' ')[i+1] || ' ' ||
        |             string_split(lower(text), ' ')[i+2])
        |    ELSE [lower(text)] END)) AS shingle
        |  FROM documents),
        |ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 20 = 0),
        |ov AS (
        |  SELECT s.doc_id, count(*) AS n_overlap
        |  FROM sh s JOIN ev USING (shingle)
        |  WHERE s.doc_id % 20 <> 0
        |  GROUP BY s.doc_id)
        |SELECT d.doc_id, coalesce(ov.n_overlap, 0) AS n_overlap,
        |  coalesce(ov.n_overlap, 0) > 0 AS contaminated
        |FROM documents d LEFT JOIN ov USING (doc_id)
        |WHERE d.doc_id % 20 <> 0
        |ORDER BY doc_id""".stripMargin,
    "q_sample_stratified" ->
      """SELECT doc_id, lang, hpfx FROM (
        |  SELECT doc_id, lang,
        |    substring(md5(concat_ws('#', doc_id, text)), 1, 2) AS hpfx,
        |    CASE lang WHEN 'en' THEN '80' WHEN 'zh' THEN '40'
        |      ELSE '1a' END AS thresh
        |  FROM documents)
        |WHERE hpfx < thresh
        |ORDER BY doc_id""".stripMargin,
    "q_sample_quota" ->
      """SELECT doc_id, lang, rk FROM (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |                       ORDER BY md5(text), doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= 50
        |ORDER BY doc_id""".stripMargin,
    "q_pack_greedy" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    len(string_split(text, ' ')) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, lang, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t)
        |SELECT doc_id, lang, n_tokens,
        |  CAST((cum - n_tokens) // 2048 AS BIGINT) AS bin
        |FROM c ORDER BY doc_id""".stripMargin,
    "q_mix_weights" ->
      """WITH cells AS (
        |  SELECT lang, source, count(*) AS n_docs,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY lang, source),
        |tot AS (SELECT sum(n_tokens) AS tot, count(*) AS ncells FROM cells)
        |SELECT lang, source, n_docs, n_tokens,
        |  round(n_tokens / tot, 6) AS share,
        |  round(tot / (ncells * n_tokens), 6) AS weight
        |FROM cells, tot ORDER BY lang, source""".stripMargin
  )
}
