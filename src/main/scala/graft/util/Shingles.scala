package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Word n-gram shingle tokenization shared by the dedup/text operators.
  *
  * Deliberately NOT the higher-order-function form
  * (`transform(sequence(...), i -> concat_ws(...))`): Catalyst
  * interprets lambda expressions row-by-row (~1 ms/doc measured), while
  * this explode + window-`lead` formulation stays inside whole-stage
  * codegen end-to-end. One shuffle on doc_id; at 100 TB that shuffle
  * co-partitions with every downstream per-doc aggregation.
  */
object Shingles {

  /** (doc_id, shingle) rows: word n-grams in document order (repeats
    * kept). With `includeShort`, documents with fewer than n words
    * contribute their whole (lowercased) text as a single shingle. */
  def tok(s: SparkSession, docs: DataFrame, n: Int,
      includeShort: Boolean = true): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"doc_id").orderBy($"pos")
    // Repartition the narrow (doc_id, text) rows BEFORE the explode:
    // the per-doc window below forces a hashpartitioning(doc_id)
    // exchange either way, so moving it ahead of `posexplode` shuffles
    // the text ONCE instead of its ~n×-larger word rows (guide §2.3
    // "project before the exchange") — and the explode + window then
    // run at full cluster width even when the scan side has fewer
    // splits than cores (the single-file fixture serialized the whole
    // tokenization into ONE scan task before this; guide §2.5 input
    // skew). Exchange count is unchanged: Generate preserves its
    // child's partitioning, so the window reuses this shuffle.
    val words = docs.select($"doc_id", $"text").repartition($"doc_id")
      .select($"doc_id",
        posexplode(split(lower($"text"), " ")).as(Seq("pos", "w0")))
    val lead2 = (1 until n).foldLeft(words) { (df, i) =>
      df.withColumn(s"w$i", lead($"w0", i).over(w))
    }
    val gram = concat_ws(" ", (0 until n).map(i => col(s"w$i")): _*)
    val grams = lead2
      .filter(col(s"w${n - 1}").isNotNull)
      .select($"doc_id", gram.as("shingle"))
    if (!includeShort) grams
    else grams.unionByName(
      docs.filter(size(split(lower($"text"), " ")) < n)
        .select($"doc_id", lower($"text").as("shingle")))
  }

  /** Distinct (doc_id, shingle) — the set form used by Jaccard/MinHash/
    * SimHash. Cached: four registry queries build this exact plan, and
    * Spark's CacheManager matches canonicalized plans, so the first
    * query materializes it (~250k rows ≈ 30 MB at sf0.1) and the rest
    * reuse it. Cache lifecycle contract (applies to every `.cache()` in
    * the query registry): sessions are short-lived mains (Verify/Bench/
    * tests) and caches die with them; a long-lived embedding service
    * should wrap queries with explicit `unpersist()` hooks instead. */
  def tokDistinct(s: SparkSession, docs: DataFrame, n: Int): DataFrame =
    tok(s, docs, n).distinct().cache()
}
