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

  test("repeated stripBoilerplate calls retire the previous covered cache") {
    import spark.implicits._
    graft.util.Caches.clear(spark)
    // distinct corpora per call → distinct covered plans; without the
    // slot swap each call would leak one storage entry until a full
    // clear (the round-8 verdict's long-lived-session leak)
    def corpus(tag: String) = (0 until 40).map(i =>
      (i.toLong, s"$tag shared boiler plate header $i body words here"))
      .toDF("doc_id", "text")
    def cachedNow = spark.sparkContext.getRDDStorageInfo.count(_.isCached)
    val sizes = (0 until 3).map { k =>
      ops.LlmOps.stripBoilerplate(spark, corpus(s"v$k"), 3, 5).count()
      // unpersist is async — poll briefly before judging
      val deadline = System.nanoTime() + 10_000_000_000L
      while (cachedNow > 1 && System.nanoTime() < deadline) Thread.sleep(100)
      cachedNow
    }
    assert(sizes.forall(_ <= 1), s"covered caches accumulated: $sizes")
    graft.util.Caches.clear(spark)
  }

  test("repeated knn-lsh calls leave no orphan cached RDDs") {
    // r14/r15 advisory, closed r16: qSimKnnLsh's featurized frame now
    // rides a Caches slot. Same dir → same canonical plan → the swap
    // keeps the ONE live cache; invocations must not accumulate
    // storage entries, and a full clear must release everything.
    graft.util.Caches.clear(spark)
    def cachedNow = spark.sparkContext.getRDDStorageInfo.count(_.isCached)
    ops.LlmOps.qSimKnnLsh(spark, sfDir).count()
    val afterFirst = cachedNow
    ops.LlmOps.qSimKnnLsh(spark, sfDir).count()
    ops.LlmOps.qSimKnnLsh(spark, sfDir).count()
    assert(cachedNow <= afterFirst,
      s"knn-lsh invocations accumulated caches: $afterFirst -> $cachedNow")
    graft.util.Caches.clear(spark)
    val deadline = System.nanoTime() + 10_000_000_000L
    while (cachedNow > 0 && System.nanoTime() < deadline) Thread.sleep(100)
    assert(cachedNow == 0,
      "clear left knn-lsh storage entries behind")
  }

  test("swapPersist keeps the live cache on a same-plan repeat") {
    import spark.implicits._
    import org.apache.spark.storage.StorageLevel
    graft.util.Caches.clear(spark)
    val df = (1 to 10).toDF("x").filter($"x" > 3)
    graft.util.Caches.swapPersist("spec.slot", df).count()
    assert(df.storageLevel != StorageLevel.NONE)
    // the SAME canonical plan swapped again must NOT unpersist itself
    // (the sameResult guard — without it, re-registering an identical
    // plan would silently drop its own just-reused cache)
    val again = (1 to 10).toDF("x").filter($"x" > 3)
    graft.util.Caches.swapPersist("spec.slot", again)
    assert(again.storageLevel != StorageLevel.NONE,
      "same-plan swap dropped the live cache")
    // a DIFFERENT plan retires the old entry
    val other = (1 to 20).toDF("x").filter($"x" > 5)
    graft.util.Caches.swapPersist("spec.slot", other)
    val deadline = System.nanoTime() + 10_000_000_000L
    while (df.storageLevel != StorageLevel.NONE &&
        System.nanoTime() < deadline) Thread.sleep(100)
    assert(df.storageLevel == StorageLevel.NONE,
      "different-plan swap failed to retire the previous cache")
    graft.util.Caches.clear(spark)
  }
}
