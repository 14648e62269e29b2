package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cache lifecycle for the query registry (SURVEY.md §2.J scale notes).
  *
  * Several registry queries `.cache()` shared subtrees — the normalized
  * embeddings (`LlmOps.embD`), the distinct shingle set
  * (`Shingles.tokDistinct`), the Jaccard inverted index, the LSH feature
  * frames — and Spark's CacheManager matches them by canonicalized plan,
  * so one materialization serves many queries within a session. The
  * short-lived mains (Verify/Bench/tests) die with their session, but a
  * long-lived embedding application must be able to release executor
  * storage without restarting. This is that hook: call `clear` between
  * workloads (Verify and Bench call it before `spark.stop()`).
  */
object Caches {

  /** Drop every cached plan registered in this session. All registry
    * caches are plan-level `.cache()`s (no raw persisted RDDs), so
    * clearing the catalog cache releases all of their storage; the
    * queries re-register their caches lazily on next use. */
  def clear(spark: SparkSession): Unit = {
    slots.clear()
    spark.catalog.clearCache()
  }

  private val slots =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  /** Cache `df` as the ONE live cached frame for `slot`, unpersisting
    * the slot's previous holder — for per-invocation intermediates
    * (e.g. `LlmOps.stripBoilerplate`'s covered-position table) whose
    * cache is only useful WITHIN one returned plan: without a slot,
    * every invocation in a long-lived session leaks a storage-memory
    * entry that only a full `clear` reclaims. A repeated call with the
    * SAME canonical plan keeps its live cache (CacheManager already
    * dedupes those); a call with a new plan retires the old entry.
    * Unpersisting never breaks a still-referenced earlier plan — it
    * recomputes instead of reading storage, the standard cache
    * contract. */
  def swapPersist(slot: String, df: DataFrame): DataFrame = {
    df.cache()
    val prev = slots.put(slot, df)
    if (prev != null &&
        !prev.queryExecution.analyzed.sameResult(df.queryExecution.analyzed))
      prev.unpersist()
    df
  }
}
