package graft

/** The shared-computation cache (SparkEntry.sharedNgramPairs) must not
  * leak persisted blocks past clearCaches() — Bench/Verify call it on
  * teardown; a long-lived multi-tenant host would otherwise accumulate
  * pinned pair lists for the life of the JVM.
  */
class CacheLifecycleSpec extends GraftSpec {

  test("clearCaches unpersists the shared n-gram pair computation") {
    // Another suite in the same JVM (PlanSpec explains dedup queries)
    // may have populated the cache already — start from a clean slate
    // so the persisted-while-in-use assertion is order-independent.
    SparkEntry.clearCaches()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    // dedup_ngram_jaccard routes through sharedNgramPairs and persists it.
    SparkEntry.queries("dedup_ngram_jaccard")(spark, sfDir).count()
    val during = spark.sparkContext.getPersistentRDDs.keySet
    assert((during -- before).nonEmpty,
      "the shared pair computation should be persisted while in use")
    SparkEntry.clearCaches()
    val after = spark.sparkContext.getPersistentRDDs.keySet
    // Assert on the ids persisted BY the call above (during -- before),
    // not the whole set delta — unrelated persists can't flake this.
    assert((after intersect (during -- before)).isEmpty,
      s"clearCaches must remove every cache-owned persisted RDD, left: ${after intersect (during -- before)}")
    // And the surface still works after invalidation (cache repopulates).
    assert(SparkEntry.queries("dedup_ngram_jaccard")(spark, sfDir).count() > 0)
    SparkEntry.clearCaches()
  }
}
