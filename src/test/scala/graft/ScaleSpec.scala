package graft

import org.apache.spark.sql.functions._

/** Scale-posture checks (SURVEY.md §4/§7.5): bucketed co-located joins
  * eliminate the shuffle, salting restores parallelism on hot keys, and
  * the session extension makes the native expressions SQL-visible. */
class ScaleSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    graft.util.Tables.orders(spark, sfDir)
      .write.bucketBy(4, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("b_orders")
    graft.util.Tables.customer(spark, sfDir)
      .write.bucketBy(4, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("b_customer")
    // disable broadcast so the join would OTHERWISE shuffle both sides
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("b_orders")
        .join(spark.table("b_customer"),
          col("o_custkey") === col("c_custkey"))
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      assert(j.count() == graft.util.Tables.orders(spark, sfDir).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("salted join equals plain join on skewed data") {
    import spark.implicits._
    // hot key: 90% of rows share key 1
    val big = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong else 1L, i))
      .toDF("k", "v")
    val small = Seq((1L, "hot"), (20L, "cold"), (30L, "cold")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).agg(count(lit(1)), sum($"v")).head()
    val salted = graft.util.Skew.saltedJoin(big, small, "k", 8)
      .agg(count(lit(1)), sum($"v")).head()
    assert(plain == salted, s"salted join diverged: $plain vs $salted")
  }

  test("saltedJoin rejects outer types that would replicate the small side") {
    import spark.implicits._
    val big = Seq((1L, 1)).toDF("k", "v")
    val small = Seq((1L, "x")).toDF("k", "name")
    val e = intercept[IllegalArgumentException] {
      graft.util.Skew.saltedJoin(big, small, "k", 4, "right_outer")
    }
    assert(e.getMessage.contains("saltedJoin supports"))
  }

  test("stop-shingle cap prunes hot-key candidate pairs") {
    import spark.implicits._
    // 30 docs sharing ONE universal 3-gram ("common alpha beta") plus
    // unique tails: uncapped, that single hot shingle generates all
    // C(30,2)=435 candidate pairs; with the 10% df cap it is dropped and
    // no candidates remain. This is the skew bound for the 100 TB path.
    val docs = (1 to 30)
      .map(i => (i.toLong, s"common alpha beta u$i v$i w$i x$i"))
      .toDF("doc_id", "text")
    val uncapped = ops.LlmOps.jaccardPairs(spark, docs, 3, 0.0, 1.0).count()
    val capped = ops.LlmOps.jaccardPairs(spark, docs, 3, 0.0, 0.1).count()
    assert(uncapped == 435L, s"expected 435 hot-key pairs, got $uncapped")
    assert(capped == 0L, s"cap failed to prune hot shingle: $capped pairs")
  }

  test("dedup family stays near-linear on a synthetic corpus ~300x the bench scale") {
    import spark.implicits._
    // Two-scale SLOPE canary (r22, was a single-run wall-clock bound):
    // the same op set runs at 150k docs and at 1.5M docs (~300x the
    // sf0.1 documents table), generated distributed and never
    // collected. An all-pairs join, an unbounded window, or a hot-key
    // candidate blowup reintroduced into jaccardPairs / fingerprints /
    // packBins makes the large run ~100x the small one instead of
    // ~10x — the sf0.1 bench can't see that class of regression. The
    // RATIO is asserted, not wall-clock: both runs share whatever CPU
    // steal/host contention the box has (the old 300s absolute bound
    // failed on a VM measuring ±50% same-code variance while the plan
    // was linear — it conflated environment slowness with plan shape).
    def run(n: Long): Double = {
      require(n % 1000 == 0, "planted-duplicate math needs 1000 | n")
      // mostly-unique 8-word texts; every 1000th doc duplicates its
      // neighbor so the near-dup output is non-empty (a silently-empty
      // candidate stage would otherwise pass a pure slope check)
      val base = when($"doc_id" % 1000 === 1, $"doc_id" - 1)
        .otherwise($"doc_id")
      val words = (0 until 8).map(j => concat(lit("w"), hex(base * 8 + j)))
      val docs = spark.range(n).select($"id".as("doc_id"))
        .withColumn("text", concat_ws(" ", words: _*))
        .withColumn("lang", concat(lit("l"), ($"doc_id" % 4).cast("string")))
      val t0 = System.nanoTime()
      val pairs = ops.LlmOps.jaccardPairs(spark, docs, 3, 0.9, 0.001).count()
      assert(pairs == n / 1000,
        s"expected ${n / 1000} planted duplicate pairs, got $pairs")
      // component resolution over the planted pairs: every component is
      // one (i, i+1) duplicate pair, so exactly 2 nodes per cluster and
      // the even id is canonical; the in-plan guard doubles as the
      // convergence assert
      val clusters = ops.LlmOps.clustersFromPairs(
        ops.LlmOps.jaccardPairs(spark, docs, 3, 0.9, 0.001)
          .select($"a_id", $"b_id"), rounds = 8)
        .agg(count(lit(1)).as("rows"),
          sum(when($"cluster_size" === 2, 0L).otherwise(1L)).as("bad_size"),
          sum(when($"cluster_id" % 1000 === 0, 0L).otherwise(1L)).as("bad_min"))
        .head()
      assert(clusters.getLong(0) == 2 * n / 1000 &&
        clusters.getLong(1) == 0 && clusters.getLong(2) == 0,
        s"cluster canary mismatch at n=$n: $clusters")
      // boilerplate list + strip at corpus scale: each planted pair's 6
      // 3-grams reach df=2, so minDf=2 lists exactly 6·(n/1000) grams
      // and the strip removes all 8 words of BOTH pair members, nothing
      // else
      val boiler = ops.LlmOps.boilerplateGrams(spark, docs, 3, 2).count()
      assert(boiler == 6 * n / 1000,
        s"expected ${6 * n / 1000} hot grams, got $boiler")
      val stripped = ops.LlmOps.stripBoilerplate(spark, docs, 3, 2)
        .agg(count(lit(1)).as("rows"), sum($"n_stripped").as("tot"),
          sum(when($"text_clean" === "", 1L).otherwise(0L)).as("empty"))
        .head()
      assert(stripped.getLong(0) == n &&
        stripped.getLong(1) == 16 * n / 1000 &&
        stripped.getLong(2) == 2 * n / 1000,
        s"strip canary mismatch at n=$n: $stripped")
      // verbatim-overlap pairs at corpus scale: the planted duplicates
      // share all 6 of their 3-grams (df=2, inside the 2..10 cap);
      // every other gram is unique (df=1, dropped) — exactly n/1000
      // pairs, all with n_shared=6. Guards the bounded collect+explode
      // pair shape (a regression to an uncapped expansion or a
      // skew-prone self-join shows up in the slope bound below)
      val sub = ops.LlmOps.substringPairs(spark, docs, 3)
        .agg(count(lit(1)).as("rows"),
          sum(when($"n_shared" === 6, 0L).otherwise(1L)).as("bad"))
        .head()
      assert(sub.getLong(0) == n / 1000 && sub.getLong(1) == 0,
        s"substring canary mismatch at n=$n: $sub")
      val fps = ops.DedupAdvanced.fingerprintsOf(spark, docs).count()
      assert(fps == n, s"fingerprint per doc: expected $n, got $fps")
      val toks = docs.select($"doc_id", $"lang", lit(8L).as("n_tokens"))
      val binned = ops.TrainPrep.packBins(spark, toks,
        capacity = 2048L, shardSize = 100000L).count()
      assert(binned == n, s"packBins row-preserving: expected $n, got $binned")
      val elapsed = (System.nanoTime() - t0) / 1e9
      // the ops cache shared subtrees sized per corpus — release them
      // so the two runs are shaped identically (and later suites
      // aren't memory-squeezed)
      graft.util.Caches.clear(spark)
      elapsed
    }
    val tSmall = run(150000L)
    val tLarge = run(1500000L)
    val slope = tLarge / math.max(tSmall, 0.001)
    info(f"dedup canary: 150k docs in $tSmall%.1fs, 1.5M in " +
      f"$tLarge%.1fs — slope $slope%.1fx for 10x the data")
    // linear ⇒ ~10x (less when fixed overhead pads the small run);
    // O(n²) ⇒ ~100x. 35 = 3.5x linear slack: generous against the
    // measured ±50% per-run noise pulling the two runs apart, still
    // a 3x margin below the quadratic signature this test exists to
    // catch (and a quadratic large run is also absolutely enormous)
    assert(slope < 35.0,
      f"dedup family slope $slope%.1fx over a 10x corpus growth " +
        f"($tSmall%.1fs -> $tLarge%.1fs) — a superlinear plan regression")
  }

  test("plan construction launches zero Spark jobs across the registry") {
    // Generalizes the round-6 embcos fix (a .head() data peek at plan
    // build): building a registry DataFrame must not run Spark jobs —
    // at 100 TB a plan-build job is a hidden full-scan serialization
    // point before the real query even starts. Queries that EXECUTE in
    // the body by design are exempt, each for a stated reason.
    val exempt = Map(
      // roundtrip scans write their own scratch fixture first (the
      // fixtures ship no CSV/ORC/JSONL/text files)
      "q_scan_csv" -> "writes scratch csv", "q_scan_orc" -> "writes scratch orc",
      "q_scan_jsonl" -> "writes scratch jsonl", "q_scan_text" -> "writes scratch text",
      "q_scan_jsonl_corrupt" -> "writes scratch jsonl with planted corrupt lines",
      "q_scan_xlsx" -> "writes scratch xlsx + driver-parses one bounded workbook",
      "q_scan_avro" -> "writes scratch avro + driver-parses one bounded file",
      "q_scan_avro_dist" -> "writes scratch avro distributed (the sink IS the operator)",
      "q_scan_avro_pruned" -> "writes scratch avro distributed (the sink IS the operator)",
      "q_scan_avro_v2write" -> "writes scratch avro via the V2 writer (the sink IS the operator)",
      "q_scan_avro_count" -> "writes scratch avro distributed (the sink IS the operator)",
      "q_scan_avro_skip" -> "writes scratch avro via the V2 writer (the sink IS the operator)",
      "q_scan_avro_skip_ts" -> "writes scratch avro via the V2 writer (the sink IS the operator)",
      "q_scan_avro_groupagg" -> "writes scratch avro via the V2 writer (the sink IS the operator)",
      "q_scan_avro_filteragg" -> "writes scratch avro via the V2 writer (the sink IS the operator)",
      "q_scan_avro_topn" -> "writes scratch avro via the V2 writer (the sink IS the operator)",
      "q_scan_avro_skip_prefix" -> "writes scratch avro via the V2 writer (the sink IS the operator)",
      "q_scan_avro_bloom" -> "writes scratch avro via the V2 writer (the sink IS the operator)",
      "q_scan_xlsx_fleet" -> "writes a scratch workbook fleet (the sink IS the operator)",
      "q_scan_xlsx_dist" -> "writes a scratch workbook fleet distributed (the sink IS the operator)",
      "q_sink_partitioned" -> "the partitioned write IS the operator",
      "q_scan_parquet_fleet" -> "stages a parquet fleet + MOR delete (the columnar tier commit IS the operator)",
      "q_scan_parquet_fleet_skip" -> "stages a parquet fleet + MOR delete (the footer-stats pruned scan IS the operator)",
      "q_scan_parquet_fleet_meta" -> "stages a parquet fleet + MOR delete (the metadata count/minMax tiers ARE the operator)",
      "q_fleet_parquet_changes" -> "stages a parquet fleet + append + MOR delete (the manifest-diff feed IS the operator)",
      // two-phase by design: pair generation materializes to scratch
      // parquet ONCE per JVM (AQE on) so the AQE-off 8-round unroll
      // iterates over a flat scan instead of a tree-expanded subtree
      "q_dedup_clusters" -> "materializes the pair table (once per JVM)",
      "q_dedup_prune" -> "materializes the pair table (once per JVM)",
      // build-once/query-many: the k-means index build lands centroids
      // + cluster-partitioned inverted lists in scratch parquet on the
      // first call; probes read the flat, partition-pruned index
      "q_sim_ann_ivf" -> "materializes the IVF index (once per JVM)",
      "q_sim_ann_ivf_batch" -> "materializes the IVF index (once per JVM)",
      "q_dedup_semantic" -> "materializes the IVF index (once per JVM)",
      "q_dedup_incremental" -> "materializes the fingerprint store (once per JVM)",
      "q_dedup_fuzzy_entities" -> "materializes the fuzzy pair table (once per JVM)",
      // layout/maintenance passes: the rewrite IS the operator
      "q_fleet_compact" -> "writes + compacts a scratch fleet (the rewrite IS the operator)",
      "q_scan_avro_evolve" -> "writes a two-generation scratch fleet (the sink IS the operator)",
      "q_join_bucketed" -> "saveAsTable bucketed staging (the layout IS the operator)",
      "q_join_spj" -> "writes clusterBy fleets (the layout IS the operator)",
      "q_join_spj_partial" -> "writes a clusterBy fleet (the layout IS the operator)",
      "q_catalog_sql_fleet" -> "materializes the catalog root (once per JVM)",
      "q_catalog_alter" -> "stages a fleet + runs DDL/INSERT (the evolution IS the operator)",
      "q_catalog_alter_drop" -> "stages a fleet + runs DDL/INSERT (the drop/widen DDL IS the operator)",
      "q_crud_merge_fleet" -> "writes + COW-merges a scratch fleet (the rewrite IS the operator)",
      "q_sql_delete_fleet" -> "stages a fleet + runs SQL DELETE (the rewrite IS the operator)",
      "q_sql_delete_fleet_meta" -> "stages a fleet + runs metadata-only DELETE (the manifest commit IS the operator)",
      "q_sql_delete_fleet_mor" -> "stages a fleet + merge-on-read DELETE/UPDATE (the deletion-vector commit IS the operator)",
      "q_sql_restore" -> "stages a fleet + DELETE + CALL restore (the rollback commit IS the operator)",
      "q_fleet_changes" -> "stages a fleet + DELETE + UPDATE (the manifest-diff feed IS the operator)",
      "q_fleet_changes_keyed" -> "stages a fleet + DELETE + UPDATE (the keyed net-change feed IS the operator)",
      "q_fleet_changes_stream" -> "runs a streaming query (the change-feed source IS the operator)",
      "q_fleet_changes_stream_keyed" -> "runs a streaming query (the per-batch keyed reconciliation IS the operator)",
      "q_fleet_agg_mor_minmax" -> "stages a fleet + merge-on-read DELETE (the vectored metadata tier IS the operator)",
      "q_fleet_agg_mor_group" -> "stages a fleet + merge-on-read DELETE (the vectored grouped tier IS the operator)",
      "q_fleet_wap" -> "stages a fleet + branch + staged DELETE + fast_forward (the write-audit-publish loop IS the operator)",
      "q_fleet_branch_read" -> "stages a fleet + branch + staged MOR DELETE (the per-read branch compare IS the operator)",
      "q_sql_delete_serializable" -> "stages a fleet + serializable MOR DELETE (the pinned-version commit IS the operator)",
      "q_fleet_purge_vectors" -> "stages a fleet + MOR DELETE + CALL purge_vectors (the targeted rewrite IS the operator)",
      "q_fleet_replicate" -> "stages a fleet + MOR mutations + runs the keyed-feed replication stream (the apply sink IS the operator)",
      "q_fleet_idempotent_write" -> "stages a fleet + token-replayed appends (the at-most-once commit IS the operator)",
      "q_fleet_changes_range" -> "stages a fleet + verbs, then reads the bounded version range (the staged history IS the operator)",
      "q_fleet_changes_range_keyed" -> "stages a fleet + verbs, then nets the bounded range per key (the staged history IS the operator)",
      "q_fleet_check_constraint" -> "stages a fleet + add_check + a failing and a passing append (the write gate IS the operator)",
      "q_fleet_clone" -> "stages a fleet + MOR DELETE + CALL clone + post-clone mutation (the zero-copy clone IS the operator)",
      "q_fleet_mv_minmax" -> "stages a fleet + view + DELETE/INSERT (the extremum refresh IS the operator)",
      "q_fleet_mv" -> "stages a fleet + view build + verbs + incremental refresh (the maintenance IS the operator)",
      "q_fleet_rewrite" -> "stages a fleet + CALL rewrite_files (the in-place compaction IS the operator)",
      "q_sql_update_fleet" -> "stages a fleet + runs SQL UPDATE (the rewrite IS the operator)",
      "q_sql_merge_fleet" -> "stages a fleet + runs SQL MERGE (the rewrite IS the operator)",
      "q_sql_timetravel" -> "stages a fleet + runs SQL UPDATE (the versioned rewrite IS the operator)",
      "q_sql_timetravel_ts" -> "stages a fleet + runs SQL UPDATE (the timestamp-bound read IS the operator)",
      "q_sql_timetravel_tag" -> "stages a fleet + tag + DELETE + retention (the name-pinned read IS the operator)",
      "q_fleet_expire" -> "stages a fleet + COW merge + snapshot GC (the retention pass IS the operator)",
      "q_layout_zorder" -> "writes the z-ordered scratch copy (the rewrite IS the operator)",
      // the replays run a real streaming query to completion
      "q_stream_tumbling_replay" -> "runs a streaming query",
      "q_stream_sliding_replay" -> "runs a streaming query",
      "q_stream_join_replay" -> "runs a streaming query",
      "q_stream_session_replay" -> "runs a streaming query",
      "q_stream_enrich_replay" -> "runs a streaming query",
      "q_stream_dedup_replay" -> "runs a streaming query",
      "q_stream_fleet_sink" -> "runs a streaming query (the fleet sink IS the operator)",
      "q_stream_fleet_source" -> "runs a streaming query (the fleet source IS the operator)",
      "q_stream_fleet_sink_native" -> "runs a streaming query (the native sink IS the operator)",
      // MLlib fit() is an action by contract
      "q_dedup_minhash" -> "MinHashLSH.fit", "q_sim_knn_lsh" -> "BRP-LSH fit",
      // learn-once artifact: a COLD corpus fingerprint triggers the
      // bounded BPE learn loop + artifact write at construction; warm
      // invocations plan job-free
      "q_text_bpe_encode" -> "BPE vocabulary artifact learn (once per corpus)")
    // `spark.read.parquet` itself runs a small footer/schema-inference
    // job per call in Spark 4 — that is source LOADING (bounded, one
    // task, no data scan), not a plan-build data peek; anything else
    // (a .head() probe, a scratch write, a fit) has a different stage
    // callsite and fails the assert.
    val allowedStage = "parquet at Tables.scala"
    val sc = spark.sparkContext
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(q => exempt.contains(q._1))
      .foreach { case (name, fn) =>
        val group = s"planbuild_$name"
        sc.setJobGroup(group, name, interruptOnCancel = false)
        try fn(spark, sfDir) finally sc.clearJobGroup()
        val stageNames = sc.statusTracker.getJobIdsForGroup(group)
          .flatMap(id => sc.statusTracker.getJobInfo(id).toList)
          .flatMap(_.stageIds.toSeq)
          .flatMap(id => sc.statusTracker.getStageInfo(id).toList)
          .map(_.name)
        val offending = stageNames.filterNot(_.contains(allowedStage))
        assert(offending.isEmpty,
          s"$name ran non-source-load work at plan construction: " +
            offending.mkString("; "))
      }
    graft.util.Caches.clear(spark)
  }

  test("native minhash: exact precision, high recall on strong pairs, equi-join plan") {
    import spark.implicits._
    val docs = graft.util.Tables.documents(spark, sfDir)
    // ground truth: uncapped inverted-index Jaccard at the same threshold
    val exact = ops.LlmOps.jaccardPairs(spark, docs, 3, 0.3, 1.0)
      .select($"a_id", $"b_id", $"jaccard").as[(Long, Long, Double)]
      .collect().map { case (a, b, j) => (a, b) -> j }.toMap
    assert(exact.nonEmpty)
    val native = ops.DedupAdvanced.qDedupMinhashNative(spark, sfDir)
    val got = native.select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    // the exact-Jaccard recheck makes precision exact: every emitted
    // pair is a true >= 0.3 pair
    assert(got.subsetOf(exact.keySet),
      s"false positives survived the recheck: ${got -- exact.keySet}")
    // 8 bands x 2 rows: P(candidate) ~ 1-(1-j^2)^8 -> ~0.97 at j=0.6;
    // borderline ~0.3 pairs are the tunable tail, strong pairs must hit
    val strong = exact.filter(_._2 >= 0.6).keySet
    assert(strong.nonEmpty)
    val recall = (strong & got).size.toDouble / strong.size
    assert(recall >= AnnRecallGates.MinhashStrongRecall,
      s"native minhash recall $recall below gate " +
        s"${AnnRecallGates.MinhashStrongRecall}")
    // banding is an equi-join: no all-pairs operator anywhere
    val plan = native.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"native minhash plan degraded to all-pairs:\n$plan")
    graft.util.Caches.clear(spark)
  }

  test("freq_sketch is exact when distinct values fit in k") {
    import spark.implicits._
    val df = (1 to 1000).map(i => s"v${i % 7}").toDF("x")
      .repartition(8) // force partial buffers + merge path
    val got = df.agg(call_function("freq_sketch", $"x", lit(16)))
      .head().getString(0)
    val want = (0 until 7).map { v =>
      s"v$v:${(1 to 1000).count(_ % 7 == v)}"
    }.sorted.mkString("|")
    assert(got == want, s"exact regime diverged: $got vs $want")
  }

  test("freq_sketch keeps heavy hitters within the MG error bound") {
    import spark.implicits._
    // 10_000 rows: one item holds 50%, the rest spread over 500 keys;
    // with k=8 the heavy item must survive with count >= true - n/(k+1)
    val n = 10000
    val rows = (1 to n).map { i =>
      if (i % 2 == 0) "heavy" else s"tail${i % 500}"
    }
    val got = rows.toDF("x").repartition(8)
      .agg(call_function("freq_sketch", $"x", lit(8)))
      .head().getString(0)
    val entries = got.split('|').filter(_.nonEmpty)
      .map { e => val Array(k, v) = e.split(':'); k -> v.toLong }.toMap
    assert(entries.size <= 8, s"state exceeded k: $got")
    val trueHeavy = n / 2
    assert(entries.contains("heavy"),
      s"50% item evicted from the sketch: $got")
    assert(entries("heavy") <= trueHeavy &&
      entries("heavy") >= trueHeavy - n / 9 - 1,
      s"heavy count ${entries("heavy")} outside MG bound vs $trueHeavy")
  }

  test("dot_product is SQL-visible via GraftExtensions") {
    val r = spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head().getDouble(0)
    assert(r == 11.0)
  }

  test("dot_product rejects non-double arrays at analysis time") {
    // without checkInputDataTypes, int arrays would be silently
    // reinterpreted by ArrayData.getDouble and return garbage
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT dot_product(array(1, 2), array(3, 4))").collect()
    }
    assert(e.getMessage.toLowerCase.contains("array<double>"), e.getMessage)
  }

  test("dot_product is NULL when an array element is NULL") {
    val r = spark.sql(
      "SELECT dot_product(array(1.0d, cast(null as double)), array(2.0d, 2.0d)) AS d")
      .head()
    assert(r.isNullAt(0),
      "NULL element must poison the product, not read as 0/garbage")
  }

  test("srp_fingerprint codegen matches the interpreted reference bit-for-bit") {
    import spark.implicits._
    // reference fingerprint computed in plain Scala from the companion's
    // sign() — the single source of truth the generated Java mirrors
    def ref(v: Seq[Double], bits: Int): Long =
      (0 until bits).foldLeft(0L) { (fp, b) =>
        val s = v.zipWithIndex.map { case (x, d) =>
          x * (if (graft.functions.SrpFingerprint.sign(b, d)) 1.0 else -1.0)
        }.sum
        if (s > 0) fp | (1L << b) else fp
      }
    val vecs = Seq(
      Seq(0.3, -0.7, 0.64, 0.1),
      Seq.tabulate(100)(i => math.sin(i + 1.0)),
      Seq(1.0))
    // repartition blocks ConvertToLocalRelation from constant-folding
    // the projection at plan time — the fingerprint must run in the
    // GENERATED code path, which is what this test pins against eval
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v").repartition(1)
      .selectExpr("id", "srp_fingerprint(v, 63) AS fp")
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    vecs.zipWithIndex.foreach { case (v, i) =>
      assert(got(i.toLong) == ref(v, 63),
        s"codegen/interpreted divergence on vector $i")
    }
    // codegen participation: the projection runs inside a WSCG span
    assert("\\*\\(\\d+\\)".r.findFirstIn(
      df.queryExecution.executedPlan.toString).isDefined)
  }

  test("srp_fingerprint rejects bad types and poisons on NULL elements") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT srp_fingerprint(array(1, 2), 8)").collect()
    }
    assert(e.getMessage.contains("array<double>"), e.getMessage)
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT srp_fingerprint(array(1.0d), 65)").collect()
    }
    assert(e2.getMessage.contains("[1, 64]"), e2.getMessage)
    val r = spark.sql(
      "SELECT srp_fingerprint(array(1.0d, cast(null as double)), 8)").head()
    assert(r.isNullAt(0), "NULL element must poison the fingerprint")
  }

  test("IVF probe partition-prunes the persisted inverted lists") {
    // the build-once index's scale claim: the probe joins the lists on
    // their PARTITION column through a broadcast of the nprobe winning
    // clusters, so Spark must plan DYNAMIC partition pruning on the
    // lists scan — without it every probe re-reads all k inverted
    // lists and the index buys nothing at 100 TB
    val df = ops.LlmOps.qSimAnnIvf(spark, sfDir)
    df.collect() // finalize the AQE plan (DPP subquery is runtime-planned)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruningexpression(cluster_id"),
      s"no dynamic partition pruning on the inverted-lists scan:\n$plan")
  }

  test("batched IVF probes still partition-prune; fan-out stays per-cluster") {
    import spark.implicits._
    // many probes, ONE pass: the union of winning clusters must reach
    // the lists scan as a dynamic partition filter (not a full read),
    // and each probe's results must match running that probe alone
    val df = ops.LlmOps.qSimAnnIvfBatch(spark, sfDir)
    val rows = df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruningexpression(cluster_id"),
      s"no dynamic partition pruning on the batched lists scan:\n$plan")
    val probeIds = rows.map(_.getLong(0)).distinct.sorted
    val expectedProbes = graft.util.Tables.embeddings(spark, sfDir)
      .filter($"vec_id" % 100 === 0).select($"vec_id")
      .as[Long].collect().sorted
    assert(probeIds.toSeq == expectedProbes.toSeq,
      "every probe in the batch must produce results")
    // per-probe: exactly 3 neighbors, ranked 1..3, never the probe itself
    rows.groupBy(_.getLong(0)).foreach { case (pid, rs) =>
      assert(rs.map(_.getLong(4)).sorted.toSeq == Seq(1L, 2L, 3L), s"probe $pid")
      assert(rs.forall(_.getLong(1) != pid), s"probe $pid returned itself")
    }
  }

  test("rewriting the embeddings fixture invalidates the cached IVF index") {
    import spark.implicits._
    // a private corpus dir this test owns: the index cache key carries
    // the embeddings data fingerprint, so an IN-PLACE rewrite within
    // one JVM must rebuild, not serve the stale index
    val corpus = graft.util.Scratch.dir("ivf_stale_corpus")
    def plant(n: Int): Unit = {
      graft.util.Tables.embeddings(spark, sfDir)
        .filter($"vec_id" < n).coalesce(1)
        .write.mode("overwrite").parquet(s"$corpus/embeddings.parquet")
      // the standard Spark contract after an in-place rewrite: drop
      // cached plans over the path (embD caches the normalized scan)
      spark.catalog.refreshByPath(s"$corpus/embeddings.parquet")
    }
    plant(64)
    val (_, lists1) = ops.LlmOps.buildIvfIndex(spark, corpus)
    assert(lists1.count() == 64)
    plant(32)
    val (_, lists2) = ops.LlmOps.buildIvfIndex(spark, corpus)
    assert(lists2.count() == 32,
      "stale IVF index served after the fixture was rewritten")
  }

  test("incremental IVF: appends assign to existing centroids with zero rebuild; measured drift past the threshold reclusters") {
    import spark.implicits._
    val corpus = graft.util.Scratch.dir("ivf_incr_corpus")
    val embDir = s"$corpus/embeddings.parquet"
    def plant(lo: Int, hi: Int, mode: String): Unit = {
      graft.util.Tables.embeddings(spark, sfDir)
        .filter($"vec_id" >= lo && $"vec_id" < hi).coalesce(1)
        .write.mode(mode).parquet(embDir)
      spark.catalog.refreshByPath(embDir)
    }
    def seedsOf(c: org.apache.spark.sql.DataFrame) =
      c.collect().map(r => r.getLong(0) ->
        r.getSeq[Double](1).toVector).sortBy(_._1).toSeq
    plant(0, 300, "overwrite")
    val (c1, l1, m1) = ops.LlmOps.maintainIvfIndex(spark, corpus)
    assert(m1.mode == "rebuild" && l1.count() == 300)
    val seeds1 = seedsOf(c1)
    // a 10% append (30/300, under the 0.25 default threshold):
    // INCREMENTAL — delta assigned to the existing centroids, lists
    // grow, centroids BYTE-IDENTICAL (no rebuild ran)
    plant(300, 330, "append")
    val (c2, l2, m2) = ops.LlmOps.maintainIvfIndex(spark, corpus)
    assert(m2.mode == "incremental" && m2.appended == 30L,
      s"expected an incremental assign: $m2")
    assert(l2.count() == 330)
    assert(seedsOf(c2) == seeds1,
      "an incremental append must not move the centroids")
    // and a repeat call is a fingerprint hit — zero work
    assert(ops.LlmOps.maintainIvfIndex(spark, corpus)._3.mode == "current")
    // the appended entries are the RIGHT entries: each new vector sits
    // in its true nearest-centroid list (brute-force assignment parity
    // over the persisted centroids — the recall contract of the
    // incremental path is exactly assignment correctness)
    graft.functions.VectorExprs.register(spark)
    val newEmb = spark.read.parquet(embDir)
      .filter($"vec_id" >= 300)
      .select($"vec_id", $"embedding".cast("array<double>").as("e0"))
      .withColumn("nrm",
        sqrt(aggregate($"e0", lit(0.0), (acc, x) => acc + x * x)))
      .select($"vec_id", transform($"e0", x => x / $"nrm").as("emb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"vec_id").orderBy($"scos".desc, $"seed_id")
    val expected = newEmb.crossJoin(broadcast(c1))
      .withColumn("scos", round(expr(
        "dot_product(emb, seed_emb) / (sqrt(dot_product(emb, emb)) * " +
          "sqrt(dot_product(seed_emb, seed_emb)))"), 6))
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"vec_id", $"seed_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = l2.filter($"vec_id" >= 300)
      .select($"vec_id", $"cluster_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected,
      s"appended vectors must index under their nearest centroid")
    // the probe query stays within the standing recall bound on the
    // GROWN corpus (same gate as the OperatorSpec recall test)
    val bf = ops.LlmOps.qSimCosineTopk(spark, corpus)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val ivf = ops.LlmOps.qSimAnnIvf(spark, corpus)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert((bf & ivf).size >= 8,
      s"post-append recall@10 below 0.8: ${(bf & ivf).size}/10")
    // a 45% append (150/330) exceeds the threshold: MEASURED drift
    // forces the recluster — and the rebuilt index covers everything
    plant(330, 480, "append")
    val (_, l3, m3) = ops.LlmOps.maintainIvfIndex(spark, corpus)
    assert(m3.mode == "rebuild",
      s"drift past the threshold must recluster: $m3")
    assert(l3.count() == 480)
    // a SHRINK (non-append change) rebuilds too, as before
    plant(0, 64, "overwrite")
    val (_, l4, m4) = ops.LlmOps.maintainIvfIndex(spark, corpus)
    assert(m4.mode == "rebuild" && l4.count() == 64)
  }

  test("dot_product participates in whole-stage codegen") {
    import spark.implicits._
    val df = graft.util.Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding".cast("array<double>").as("e"))
      .selectExpr("vec_id", "dot_product(e, e) AS n2")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert("\\*\\(\\d+\\)".r.findFirstIn(plan).isDefined,
      s"no codegen span around dot_product:\n$plan")
  }

  test("small V2 fleet dims auto-broadcast in unhinted joins") {
    import spark.implicits._
    // a small graft-avro dimension fleet joined to a fact table: the
    // scan's SupportsReportStatistics must put its real byte size in
    // the plan so Catalyst picks BroadcastHashJoin on its own — without
    // stats, DSv2 reports defaultSizeInBytes (Long.MaxValue) and the
    // user gets a sort-merge join unless they hand-hint broadcast()
    val dir = graft.util.Scratch.dir("avro_stats_dim")
    graft.sources.Avro.writeDistributed(spark, s"$dir/nation.avro",
      graft.util.Tables.nation(spark, sfDir)
        .select($"n_nationkey", $"n_name"))
    val dim = spark.read.format("graft-avro").load(s"$dir/nation.avro")
    val fact = graft.util.Tables.customer(spark, sfDir)
    val j = fact.join(dim, col("c_nationkey") === col("n_nationkey"))
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"small avro fleet did not auto-broadcast:\n$plan")
    assert(j.count() == fact.count())

    // same contract for the xlsx connector
    val xdir = graft.util.Scratch.dir("xlsx_stats_dim")
    graft.sources.Xlsx.write(spark, s"$xdir/r0.xlsx", Seq("region" ->
      graft.util.Tables.region(spark, sfDir)
        .select($"r_regionkey", $"r_name")))
    val xdim = spark.read.format("graft-xlsx").option("sheet", "region")
      .load(s"$xdir/*.xlsx")
    val xj = graft.util.Tables.nation(spark, sfDir)
      .join(xdim, col("n_regionkey") === col("r_regionkey"))
    val xplan = xj.queryExecution.executedPlan.toString
    assert(xplan.contains("BroadcastHashJoin"),
      s"small xlsx fleet did not auto-broadcast:\n$xplan")
    assert(xj.count() == graft.util.Tables.nation(spark, sfDir).count())
  }

  test("V2 fleet stats scale with the projected-column fraction") {
    import spark.implicits._
    val dir = graft.util.Scratch.dir("avro_stats_frac")
    graft.sources.Avro.writeDistributed(spark, s"$dir/n.avro",
      graft.util.Tables.nation(spark, sfDir)
        .select($"n_nationkey", $"n_name", $"n_regionkey",
          concat($"n_name", lit(" comment")).as("n_comment")))
    def scanStats(df: org.apache.spark.sql.DataFrame): BigInt = {
      val o = df.queryExecution.optimizedPlan
      o.collectFirst {
        case s: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
          s.stats.sizeInBytes
      }.getOrElse(fail(s"no V2 scan relation in:\n$o"))
    }
    val full = spark.read.format("graft-avro").load(s"$dir/n.avro")
    val all = scanStats(full.filter($"n_nationkey" >= 0))
    val two = scanStats(full.select($"n_nationkey", $"n_name"))
    assert(all > 0 && all < Long.MaxValue / 4, s"stats not reported: $all")
    // 2 of 4 projected columns → roughly half the bytes (exactly, by
    // the fraction formula), and strictly less than the full scan
    assert(two * 2 == all, s"fraction scaling off: two=$two all=$all")
  }
}
