package graft

import org.apache.spark.sql.functions._
import graft.ops.{Aggregates, GraphOps, IncrementalOps, Relational}

/** Specs for the round-13 additions: graph analytics, incremental
  * dedup against the persisted fingerprint store, the single-pass
  * constraint suite, and the two-phase salted aggregation. */
class GraphIncrementalSpec extends SparkSpec {

  test("pagerank conserves rank mass and spreads on the irregular graph") {
    import spark.implicits._
    val pr = GraphOps.qGraphPagerank(spark, sfDir)
    // EXACT mass conservation in the integer formulation: Σ rank = 1
    // per iteration ⇒ Σ rank_scaled = N·120³ precisely — any
    // contribution loss or double-count breaks the equality
    val n = graft.util.Tables.documents(spark, sfDir).count()
    val total = pr.agg(sum($"rank_scaled")).collect()(0).getLong(0)
    assert(total == n * 1728000L,
      s"rank mass $total != ${n * 1728000L} — contribution loss or double-count")
    // ranks spread: the graph's in-degrees are irregular, so ranks
    // must differ across nodes (a degenerate all-equal result means
    // contributions never flowed)
    assert(pr.select($"rank_scaled").distinct().count() > 1)
  }

  test("deep pagerank (10 iters, checkpointed) is label-exact vs a BigInt replay") {
    import spark.implicits._
    val iters = 10
    val got = GraphOps.pagerankExact(spark, sfDir, iters, checkpointEvery = 4)
      .collect()
      .map(r => r.getLong(0) -> BigInt(r.getDecimal(1).toBigInteger))
      .toMap
    // driver-side reference: the same recurrence over the collected
    // edge list in exact BigInt arithmetic
    val edges = GraphOps.edges(spark, sfDir)
      .select($"src", $"dst", $"w").collect()
      .map(r => (r.getLong(0), r.getLong(1), BigInt(r.getLong(2))))
    val nodes = got.keys.toSeq
    var rank = nodes.map(_ -> BigInt(1)).toMap
    var scale = BigInt(1)
    for (_ <- 1 to iters) {
      val contrib = scala.collection.mutable.Map[Long, BigInt]()
      edges.foreach { case (src, dst, w) =>
        contrib(dst) = contrib.getOrElse(dst, BigInt(0)) + w * rank(src)
      }
      val base = BigInt(18) * scale
      rank = nodes.map(n => n -> (base + contrib.getOrElse(n, BigInt(0)))).toMap
      scale *= 120
    }
    assert(got.size == rank.size)
    val bad = nodes.filter(n => got(n) != rank(n))
    assert(bad.isEmpty,
      s"${bad.size} nodes diverge; first: ${bad.headOption.map(n =>
        s"$n got=${got(n)} want=${rank(n)}")}")
    // and the depth actually exceeds the 64-bit regime: the max rank
    // must not fit a long, proving the decimal path is load-bearing
    assert(rank.values.max > BigInt(Long.MaxValue))
  }

  test("triangle census satisfies the handshake bounds") {
    val row = GraphOps.qGraphTriangles(spark, sfDir).collect()(0)
    val (nodes, edges, wedges, tris) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    assert(edges > 0 && edges <= 3 * nodes, "out-degree 3 bounds edges")
    // n_wedges is the FULL wedge count Σ C(deg,2); each triangle
    // closes three of them, so the standard coefficient is in [0,1]
    assert(3 * tris <= wedges, "every triangle closes three wedges")
    val clustering = row.getDouble(4)
    assert(clustering >= 0.0 && clustering <= 1.0)
  }

  test("incremental dedup admits exactly the store-absent batch winners") {
    import spark.implicits._
    val admitted = IncrementalOps.qDedupIncremental(spark, sfDir)
    // admitted docs are all from the new batch
    assert(admitted.filter(pmod($"doc_id", lit(4)) =!= 0).count() == 0)
    // no two admitted docs share a hash (in-batch winner-pick held)
    assert(admitted.groupBy($"content_hash").count()
      .filter($"count" > 1).count() == 0)
    // nothing admitted exists in the store (anti-join held)
    val store = IncrementalOps.fingerprintStore(spark, sfDir)
    assert(admitted.join(store, Seq("content_hash"), "left_semi").count() == 0)
  }

  test("admitting a batch and appending its hashes makes re-admission empty") {
    import spark.implicits._
    // the production ingest cycle's second half: after admitting, the
    // new hashes are APPENDED to the store — replaying the same batch
    // against the updated store must admit nothing (idempotent ingest)
    val admitted = IncrementalOps.qDedupIncremental(spark, sfDir)
    val updated = IncrementalOps.fingerprintStore(spark, sfDir)
      .select($"content_hash")
      .unionByName(admitted.select($"content_hash"))
    val replay = graft.util.Tables.documents(spark, sfDir)
      .filter(pmod($"doc_id", lit(4)) === 0)
      .select(sha2(lower(trim($"text")), 256).as("content_hash"))
      .join(updated, Seq("content_hash"), "left_anti")
    assert(replay.count() == 0,
      "replayed batch must admit nothing against the updated store")
  }

  test("ingest anti-join moves nothing on the store side") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SortExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
    def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => p +: nodes(a.executedPlan)
      case q: QueryStageExec => p +: nodes(q.plan)
      case r: ReusedExchangeExec => p +: nodes(r.child)
      case other => other +: other.children.flatMap(nodes)
    }
    def isStoreScan(p: SparkPlan): Boolean = p match {
      case f: FileSourceScanExec =>
        f.relation.location.rootPaths.exists(_.toString.contains("graft_fp_store"))
      case _ => false
    }
    // at fixture scale Catalyst (rightly) broadcasts the tiny store;
    // the 100 TB regime — the one this layout exists for — is a store
    // too big to broadcast. Simulate it by disabling broadcast on a
    // child session and pin the sort-merge plan the big store gets.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val q = IncrementalOps.qDedupIncremental(s2, sfDir)
    q.collect() // finalize AQE
    val all = nodes(q.queryExecution.executedPlan)
    // the store's bucketed scan is present and actually bucket-aware
    val storeScans = all.collect {
      case f: FileSourceScanExec if isStoreScan(f) => f
    }
    assert(storeScans.nonEmpty, "expected the bucketed store scan in plan")
    assert(storeScans.forall(_.bucketedScan),
      "store must be read AS a bucketed table (partitioning-reporting scan)")
    // the store-side LEG of the anti-join (everything between the join
    // and the store scan) must contain neither an exchange nor a sort:
    // the billions-row side at 100 TB never moves — only the batch
    // shuffles into the layout
    val storeLegs = all.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec
          if nodes(j.right).exists(isStoreScan) => j.right
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
          if nodes(j.right).exists(isStoreScan) => j.right
    }
    assert(storeLegs.nonEmpty,
      s"expected the store on a shuffled join's build leg:\n" +
        s"${q.queryExecution.executedPlan}")
    val moved = storeLegs.flatMap(nodes).collect {
      case e: ShuffleExchangeExec => e
      case s: SortExec => s
    }
    assert(moved.isEmpty,
      s"store side must neither shuffle nor sort:\n" +
        s"${q.queryExecution.executedPlan}")
    // the batch pays exactly one hash shuffle (its repartition into the
    // store layout); the only other exchange is the presentation sort
    val hashEx = all.collect {
      case e: ShuffleExchangeExec
          if e.outputPartitioning.isInstanceOf[
            org.apache.spark.sql.catalyst.plans.physical.HashPartitioning] => e
    }
    assert(hashEx.size == 1,
      s"expected ONE batch-side hash exchange, got ${hashEx.size}:\n" +
        s"${q.queryExecution.executedPlan}")
  }

  test("fingerprint store materializes once per fixture generation") {
    val p1 = IncrementalOps.fingerprintStore(spark, sfDir)
      .inputFiles.toSeq.sorted
    val p2 = IncrementalOps.fingerprintStore(spark, sfDir)
      .inputFiles.toSeq.sorted
    assert(p1.nonEmpty && p1 == p2,
      "second call must serve the same persisted store files")
  }

  test("constraint suite reports the fixture's real pass/fail pattern") {
    import spark.implicits._
    val res = Relational.qQualityConstraints(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    assert(res.size == 6)
    // the fixture genuinely satisfies these five...
    for (c <- Seq("completeness_l_shipdate", "domain_l_returnflag",
        "range_l_discount", "range_l_quantity", "size_min_1000"))
      assert(res(c)._2, s"$c unexpectedly failed: ${res(c)}")
    // ...and genuinely VIOLATES key uniqueness (duplicate
    // (l_orderkey, l_linenumber) pairs exist by construction) — the
    // suite must report the failure, not paper over it
    val (ratio, passed) = res("unique_l_orderkey_l_linenumber")
    assert(!passed && ratio < 1.0,
      s"uniqueness should fail on this fixture, got ratio=$ratio")
  }

  test("merge applies delete/update/insert clauses with unmatched no-ops") {
    import spark.implicits._
    val merged = graft.ops.Crud.qCrudMerge(spark, sfDir).cache()
    val base = graft.util.Tables.customer(spark, sfDir)
    // matched deletes: no key < 50 survives
    assert(merged.filter($"c_custkey" < 50).count() == 0)
    // matched updates: every surviving 50..149 key is doubled
    val upd = merged.filter($"c_custkey" >= 50 && $"c_custkey" < 150)
      .join(base, Seq("c_custkey"))
    assert(upd.filter(merged("action") =!= "updated").count() == 0)
    assert(upd.filter(
      merged("c_acctbal") =!= round(base("c_acctbal") * 2.0, 4)).count() == 0)
    // inserts land under fresh keys with the feed's values
    val ins = merged.filter($"c_custkey" >= 200000)
    assert(ins.count() == base.filter($"c_custkey" < 20).count())
    assert(ins.filter($"action" =!= "inserted" || $"c_acctbal" =!= 10.0)
      .count() == 0)
    // everything else is untouched
    assert(merged.filter($"action" === "kept")
      .join(base, Seq("c_custkey"))
      .filter(merged("c_acctbal") =!= round(base("c_acctbal"), 4))
      .count() == 0)
    merged.unpersist()
  }

  test("nearest as-of picks the minimum-distance direction with backward ties") {
    import spark.implicits._
    val near = graft.ops.Joins.qJoinAsofNearest(spark, sfDir)
    // reconstruct both directional candidates independently and verify
    // minimality: dist_us must equal min(backward, forward) per purchase
    val e = graft.util.Tables.events(spark, sfDir)
    val p = e.filter($"event_type" === "purchase")
      .select($"event_id".as("pid"), $"user_id".as("pu"),
        unix_micros($"ts").as("pus"))
    val c = e.filter($"event_type" === "click")
      .select($"user_id".as("cu"), unix_micros($"ts").as("cus"))
    val best = p.join(c, $"pu" === $"cu", "left")
      .groupBy($"pid")
      .agg(min(abs($"cus" - $"pus")).as("best_dist"))
    val bad = near.join(best, $"purchase_id" === $"pid")
      .filter($"dist_us" =!= $"best_dist" ||
        ($"dist_us".isNull =!= $"best_dist".isNull))
      .count()
    assert(bad == 0, s"$bad purchases picked a non-minimal click")
  }

  test("shipping-priority plan pushes filters, broadcasts the dim, and TakeOrders the top-10") {
    val df = graft.ops.Pipeline.qSqlShippingPriority(spark, sfDir)
    df.collect() // finalize AQE
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-10 must not globally sort:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"the filtered customer dim must broadcast:\n$plan")
    assert(plan.contains("PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)")
      || plan.contains("EqualTo(c_mktsegment,BUILDING)"),
      s"the segment filter must reach the customer scan:\n$plan")
  }

  test("Catalyst injects a runtime bloom filter on a selective shuffle join") {
    import spark.implicits._
    // the 100 TB posture for fact-to-filtered-dim SHUFFLE joins (when
    // the dim outgrows broadcast): InjectRuntimeFilter builds a bloom
    // of the filtered creation side and semi-filters the fact scan
    // before the shuffle. Thresholds are sized for clusters, so pin
    // them down to fixture scale for the assertion.
    val keep = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val dim = graft.util.Tables.orders(spark, sfDir)
        .filter($"o_totalprice" < 1000.0).select($"o_orderkey")
      val fact = graft.util.Tables.lineitem(spark, sfDir)
        .select($"l_orderkey", $"l_quantity")
      val joined = fact.join(dim, $"l_orderkey" === $"o_orderkey")
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") || plan.contains("BloomFilter"),
        s"expected an injected runtime bloom filter:\n$plan")
      // and it must not change results vs the un-filtered plan
      assert(joined.count() ==
        fact.join(dim.hint("broadcast"), $"l_orderkey" === $"o_orderkey").count())
    } finally keep.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("two-phase salted agg equals the direct groupBy and carries two exchanges") {
    import spark.implicits._
    val salted = Aggregates.qAggSkewTwophase(spark, sfDir)
    val direct = graft.util.Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(round(sum($"l_quantity"), 4).as("sum_qty"),
        count(lit(1)).as("n_rows"),
        round(sum($"l_quantity") / count(lit(1)), 4).as("avg_qty"),
        round(min($"l_extendedprice"), 4).as("min_price"),
        round(max($"l_extendedprice"), 4).as("max_price"))
      .orderBy($"l_returnflag")
    assert(salted.collect().toSeq == direct.collect().toSeq,
      "salting must not change the aggregate result")
    // string-match the AQE initial plan (AdaptiveSparkPlanExec holds
    // its input plan as a field, not a child — collect{} can't descend)
    val plan = salted.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges >= 2,
      s"two-phase agg must shuffle on (key, salt) then on key:\n$plan")
  }
}
