package graft.util

import org.apache.spark.sql.SparkSession

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
  def clear(spark: SparkSession): Unit =
    spark.catalog.clearCache()
}
