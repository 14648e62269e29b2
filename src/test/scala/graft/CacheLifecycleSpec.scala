package graft

/** Cache lifecycle contract (round-2 verdict item #4): the registry's
  * shared `.cache()` subtrees must be releasable by an embedding
  * application without restarting the session. */
class CacheLifecycleSpec extends SparkSpec {

  test("Caches.clear empties the CacheManager and releases storage") {
    // materialize two queries that register shared caches
    ops.LlmOps.qSimCosineTopk(spark, sfDir).count()      // embD
    ops.TextOps.qTextFingerprint(spark, sfDir).count()   // tokDistinct
    assert(!spark.sharedState.cacheManager.isEmpty,
      "expected registry queries to register cached plans")

    graft.util.Caches.clear(spark)

    assert(spark.sharedState.cacheManager.isEmpty,
      "CacheManager still holds cached plans after clear")
    // storage memory actually returns to zero (unpersist can be async —
    // poll briefly before judging)
    def cached = spark.sparkContext.getRDDStorageInfo.filter(_.isCached)
    val deadline = System.nanoTime() + 10_000_000_000L
    while (cached.nonEmpty && System.nanoTime() < deadline) Thread.sleep(100)
    assert(cached.isEmpty,
      s"cached RDD storage remains: ${cached.map(_.name).mkString(", ")}")
  }

  test("queries re-register caches lazily after clear (clear is not a break)") {
    graft.util.Caches.clear(spark)
    val n = ops.LlmOps.qSimCosineTopk(spark, sfDir).count()
    assert(n > 0)
    assert(!spark.sharedState.cacheManager.isEmpty,
      "query should have re-registered its shared cache")
  }
}
