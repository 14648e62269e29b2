package graft

import org.apache.spark.sql.functions._
import graft.ops._

/** Per-operator behavior checks on sf0.001 (the oracle gate covers
  * value-parity at sf0.01; these lock in SEMANTICS and plan shape). */
class OperatorSpec extends SparkSpec {

  test("every registered query runs and returns rows on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      val n = df.count()
      assert(n > 0, s"$name returned an empty result — degenerate query")
      assert(df.columns.nonEmpty, s"$name has no columns")
    }
  }

  test("entry returns rows > 0 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query key") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracle SQL without query: $dangling")
  }

  test("no-oracle set is exactly the documented hash-model/stub queries") {
    // tripwire: silently losing an oracleSql entry would demote a query
    // to the weaker rows-only gate without anyone noticing
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val expected = Set("q_agg_approx_distinct", "q_agg_percentile_approx",
      "q_dedup_minhash",
      "q_dedup_minhash_native", "q_dedup_simhash", "q_dedup_simhash_pairs",
      "q_sim_knn_lsh", "q_dedup_embcos_lsh",
      // encode over a LEARNED vocabulary: each merge rank depends on
      // re-tokenizing under all previous ranks, which one static SQL
      // statement cannot iterate — gated by TextBpeSpec instead
      // (artifact == direct learn, lossless round trip)
      "q_text_bpe_encode")
    assert(noOracle == expected,
      s"no-oracle drift: unexpected=${noOracle -- expected} missing=${expected -- noOracle}")
  }

  test("broadcast join plan uses BroadcastHashJoin") {
    val plan = Joins.qJoinBroadcast(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("bucketed join pays no key shuffle and re-runs idempotently") {
    val df = Joins.qJoinBucketed(spark, sfDir)
    val n = df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"),
      s"merge hint must hold on the bucketed sides:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed layout must satisfy join AND agg distribution " +
        s"without reshuffling:\n$plan")
    // Bench runs every query cold+warm in one session: the overwrite
    // saveAsTable must be re-runnable without duplicating rows
    assert(Joins.qJoinBucketed(spark, sfDir).count() == n)
  }

  test("pairwise stats plan is pair-free (no cartesian/BNLJ)") {
    val qe = LlmOps.qSimPairwiseStats(spark, sfDir).queryExecution
    val plan = qe.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"moment-based pairwise stats must not materialize pairs:\n$plan")
  }

  test("theta join plan is range-bucketed (no cartesian/BNLJ)") {
    val qe = Joins.qJoinTheta(spark, sfDir).queryExecution
    val plan = qe.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"theta join must stay bucketed/equi:\n$plan")
  }

  test("partitioned sink read-back prunes partitions at file listing") {
    val df = Relational.qSinkPartitioned(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("(o_orderstatus"),
      s"status filter must resolve as a partition filter, not a scan:\n$plan")
  }

  test("top-n lowers to TakeOrderedAndProject (no global sort)") {
    val plan = Relational.qLimitTopn(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("filters are pushed to the parquet scan") {
    val plan = Relational.qFilterCompound(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull") &&
      plan.contains("GreaterThanOrEqual(l_quantity"), plan)
  }

  test("projection prunes parquet columns (ReadSchema is narrow)") {
    val plan = Aggregates.qAggGroup(spark, sfDir).queryExecution.executedPlan.toString
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_suppkey") && !readSchema.contains("l_partkey"),
      s"scan reads unneeded columns: $readSchema")
  }

  test("dedup is idempotent") {
    val once = Relational.qDistinct(spark, sfDir)
    assert(once.distinct().count() == once.count())
  }

  test("exact dedup keeps min doc_id per content hash") {
    val kept = LlmOps.qDedupExact(spark, sfDir)
    val total = kept.agg(sum("n_copies")).head().getLong(0)
    val docs = graft.util.Tables.documents(spark, sfDir).count()
    assert(total == docs, s"n_copies must partition the corpus: $total != $docs")
  }

  test("cosine is in [-1,1] and cos(v,v)≈1") {
    val topk = LlmOps.qSimCosineTopk(spark, sfDir).collect()
    assert(topk.forall(r => math.abs(r.getAs[Double]("cos")) <= 1.0))
    val self = LlmOps.qSimPairwiseStats(spark, sfDir).collect()
    assert(self.forall(r => math.abs(r.getAs[Double]("mean_cos")) <= 1.0))
  }

  test("media decode: real PNG round trip recovers planted pixels exactly") {
    val f = ops.Multimodal.extractFeatures(spark, sfDir).collect()
    assert(f.nonEmpty)
    val imageDocs = graft.util.Tables.documents(spark, sfDir)
      .filter("doc_id % 3 = 0").count()
    assert(f.length == imageDocs)
    f.foreach { r =>
      val (w, h) = ops.Multimodal.plantedDims(r.doc_id)
      assert(r.width == w && r.height == h,
        s"doc ${r.doc_id}: codec dims ${r.width}x${r.height} != planted ${w}x$h")
      assert(r.n_bytes > 0) // a real PNG container, not an empty blob
      val (ra, ga, ba) = ops.Multimodal.plantedColorA(r.doc_id)
      val (rb, gb, bb) = ops.Multimodal.plantedColorB(r.doc_id)
      val nEven = ((w + 1) / 2) * ((h + 1) / 2) + (w / 2) * (h / 2)
      val nOdd = w * h - nEven
      assert(r.sum_r == nEven.toLong * ra + nOdd.toLong * rb, s"doc ${r.doc_id} R")
      assert(r.sum_g == nEven.toLong * ga + nOdd.toLong * gb, s"doc ${r.doc_id} G")
      assert(r.sum_b == nEven.toLong * ba + nOdd.toLong * bb, s"doc ${r.doc_id} B")
    }
  }

  test("ANN IVF recall@10 meets the named gate vs brute-force top-k") {
    val bf = LlmOps.qSimCosineTopk(spark, sfDir).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val ivf = LlmOps.qSimAnnIvf(spark, sfDir).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    // a REAL k-means index admits bounded misses: a true neighbor
    // assigned to a non-probed cluster is the honest nprobe/k recall
    // trade (measured 9/10 at sf0.01, nprobe 2 of k=8 — the former
    // 10/10 was an artifact of raw-vector seed "centroids")
    val recall = (bf & ivf).size.toDouble / bf.size
    assert(recall >= AnnRecallGates.IvfRecallAt10,
      s"IVF recall@10 $recall below gate " +
        s"${AnnRecallGates.IvfRecallAt10} ($ivf vs $bf)")
  }

  test("the recall gates have teeth: broken LSH geometry and scrambled IVF assignments fail them") {
    import spark.implicits._
    // LSH with a deliberately broken geometry (bucketLength 1/70th of
    // the tuned value, foreign seed): neighbors hash to different
    // narrow buckets, the candidate join starves, and the SAME recall
    // measurement the positive spec gates on collapses below the gate
    val exact = LlmOps.qSimKnnJoin(spark, sfDir)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val broken = LlmOps.knnLshWith(spark, sfDir,
      seed = 9999L, bucketLength = 0.01)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val lshRecall = (exact & broken).size.toDouble / exact.size
    assert(lshRecall < AnnRecallGates.LshKnnRecall,
      s"broken-geometry LSH still passed the gate ($lshRecall) — " +
        "the gate does not discriminate")
    // IVF with SCRAMBLED list assignments (hash-random cluster ids
    // under the true centroids): probing the 'nearest' clusters reads
    // arbitrary vectors — recall@10 falls under the gate
    val (seeds, lists) = LlmOps.buildIvfIndex(spark, sfDir)
    val scrambled = lists.withColumn("cluster_id",
      pmod(xxhash64($"vec_id"), lit(8)).cast("long"))
    val bf = LlmOps.qSimCosineTopk(spark, sfDir).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val got = LlmOps.probeIvf(spark, sfDir, seeds, scrambled)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val ivfRecall = (bf & got).size.toDouble / bf.size
    assert(ivfRecall < AnnRecallGates.IvfRecallAt10,
      s"scrambled IVF assignments still passed the gate ($ivfRecall)")
  }

  test("approx percentile tracks exact within one quantity step") {
    val exact = Aggregates.qAggPercentile(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val approx = Aggregates.qAggPercentileApprox(spark, sfDir).collect()
    assert(approx.length == exact.size && approx.nonEmpty)
    approx.foreach { r =>
      val (e25, e50, e75) = exact(r.getString(0))
      // quantities are an integer grid; the sketch returns an actual
      // element while exact interpolates — one step is the max gap at
      // accuracy 10000 over this cardinality
      assert(math.abs(r.getDouble(1) - e25) <= 1.0, s"p25: $r vs $e25")
      assert(math.abs(r.getDouble(2) - e50) <= 1.0, s"p50: $r vs $e50")
      assert(math.abs(r.getDouble(3) - e75) <= 1.0, s"p75: $r vs $e75")
    }
  }

  test("approx_count_distinct within 5% of exact") {
    import spark.implicits._
    val joined = Aggregates.qAggApproxDistinct(spark, sfDir)
      .join(Aggregates.qAggDistinct(spark, sfDir), "l_returnflag")
    joined.select($"and_part", $"nd_part").collect().foreach { r =>
      val (approx, exact) = (r.getLong(0), r.getLong(1))
      assert(math.abs(approx - exact).toDouble / exact < 0.05,
        s"HLL error too big: $approx vs $exact")
    }
  }

  test("simhash: planted near-dups (shingle jaccard >= 0.9) get close fingerprints") {
    import spark.implicits._
    val fps = DedupAdvanced.qDedupSimhash(spark, sfDir)
      .select("doc_id", "simhash").as[(Long, String)].collect().toMap
    // ground truth from the oracle-checked exact shingle-jaccard op
    val gt = LlmOps.qDedupNgramJaccard(spark, sfDir)
      .filter($"jaccard" >= 0.9)
      .select("a_id", "b_id").as[(Long, Long)].collect()
    assert(gt.nonEmpty, "fixture should contain planted shingle-level near-dups")
    val hams = gt.map { case (x, y) =>
      fps(x).zip(fps(y)).count { case (c1, c2) => c1 != c2 }
    }
    val mean = hams.sum.toDouble / hams.length
    assert(mean <= 12.0, s"mean hamming of near-dups too high: $mean")
  }

  test("minhash finds the planted near-dups the exact jaccard op finds") {
    import spark.implicits._
    val exact = LlmOps.qDedupNgramJaccard(spark, sfDir)
      .filter($"jaccard" >= 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val approx = DedupAdvanced.qDedupMinhash(spark, sfDir)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"minhash recall too low: $recall")
  }

  test("embcos LSH twin recovers >= 0.9 of the exact embcos pairs at sf0.01") {
    import spark.implicits._
    // sf0.01 per the round-2 verdict contract for this recall bound;
    // the exact query is label-blocked, the LSH twin is unblocked, so
    // the exact pair set is a subset universe — containment is the
    // right recall measure.
    val dir01 = "/root/testdata/sf0.01"
    val exact = LlmOps.qDedupEmbcos(spark, dir01)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val approx = LlmOps.qDedupEmbcosLsh(spark, dir01)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"embcos LSH recall too low: $recall")
  }

  test("embcos LSH plan is banded (no cartesian/BNLJ)") {
    val plan = LlmOps.qDedupEmbcosLsh(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"banded LSH must not materialize all pairs:\n$plan")
  }

  test("embcos LSH fingerprints any embedding width correctly") {
    import spark.implicits._
    // planted identical pairs whose signal lives ENTIRELY in components
    // >= 64 (the fixture width), plus an anti-aligned foil — a
    // fingerprint clamped at 64 dims would project all three vectors
    // identically (zero sums) and fail. Run at 100 dims AND at 2000
    // dims: the (bit << 32 | dim) plane seed is collision-free at any
    // width, so the former 1024-dim stride cap is gone — wide
    // embeddings must WORK, not raise.
    def vec(dim: Int, sign: Double): Seq[Double] = {
      val v = Seq.tabulate(dim)(i => if (i < 64) 0.0 else sign)
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    graft.functions.VectorExprs.register(spark)
    for (dim <- Seq(100, 2000)) {
      val e = Seq((1L, vec(dim, 1.0)), (2L, vec(dim, 1.0)),
        (3L, vec(dim, -1.0))).toDF("vec_id", "emb")
      val pairs = LlmOps.embcosLshPairs(spark, e,
        nBits = 64, bandBits = 4, minCos = 0.9)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet
      assert(pairs === Set((1L, 2L)),
        s"dim=$dim: expected exactly the planted duplicate pair, got $pairs")
    }
  }

  test("LSH knn join recovers most of the exact knn pairs") {
    import spark.implicits._
    val exact = LlmOps.qSimKnnJoin(spark, sfDir)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val approx = LlmOps.qSimKnnLsh(spark, sfDir)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= AnnRecallGates.LshKnnRecall,
      s"LSH knn recall $recall below gate ${AnnRecallGates.LshKnnRecall}")
  }

  test("pii redaction leaves nothing matchable and counts every injection") {
    import org.apache.spark.sql.functions.col
    val out = ops.TextOps.qTextPii(spark, sfDir)
    val n = out.count()
    assert(n > 0)
    // nothing email- or phone-shaped survives redaction
    assert(out.filter(col("redacted")
      .rlike("@|[0-9]{3}-[0-9]{4}")).count() == 0)
    // every doc got its injected email+phone counted; even ids got two
    assert(out.filter(col("n_phones") === 1).count() == n)
    assert(out.filter(col("n_emails") ===
      org.apache.spark.sql.functions.when(col("doc_id") % 2 === 0, 2L)
        .otherwise(1L)).count() == n)
  }

  test("text chunks tile each document: exact slices, stride starts, full coverage") {
    import spark.implicits._
    val docs = graft.util.Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    val byDoc = ops.TextOps.qTextChunks(spark, sfDir).collect()
      .groupBy(_.getLong(0))
    assert(byDoc.keySet == docs.keySet)
    byDoc.foreach { case (id, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      val words = docs(id).split(" ", -1)
      sorted.foreach { r =>
        val start = r.getLong(2).toInt
        val ntok = r.getLong(3).toInt
        assert(r.getString(4) == words.slice(start, start + ntok).mkString(" "),
          s"doc $id chunk ${r.getLong(1)} is not the exact token slice")
        assert(ntok == math.min(32, words.length - start))
      }
      assert(sorted.map(_.getLong(2)).toSeq ==
        sorted.indices.map(_ * 24L), s"doc $id starts are not stride multiples")
      val last = sorted.last
      assert(last.getLong(2) + last.getLong(3) == words.length,
        s"doc $id chunks do not reach the last token")
    }
  }

  test("audio decode: real WAV round trip recovers planted samples exactly") {
    val rows = ops.Multimodal.qMediaAudio(spark, sfDir).collect()
    val audioDocs = graft.util.Tables.documents(spark, sfDir)
      .filter("doc_id % 3 = 1").count()
    assert(rows.length == audioDocs && rows.nonEmpty)
    rows.foreach { r =>
      val d = r.getLong(0)
      val planted = ops.Multimodal.plantedSamples(d).map(_.toLong)
      assert(r.getLong(1) == planted.length, s"doc $d sample count")
      assert(r.getLong(2) == 8000L, s"doc $d rate")
      assert(r.getLong(3) == planted.sum, s"doc $d sum")
      assert(r.getLong(4) == planted.min, s"doc $d min")
      assert(r.getLong(5) == planted.max, s"doc $d max")
    }
  }

  test("multimodal feature extraction is deterministic and batch-shaped") {
    val f1 = ops.Multimodal.extractFeatures(spark, sfDir).collect()
    val f2 = ops.Multimodal.extractFeatures(spark, sfDir).collect()
    assert(f1.length == f2.length && f1.length > 0)
    val m1 = f1.map(r => r.doc_id -> r).toMap
    f2.foreach { r =>
      val a = m1(r.doc_id)
      assert((a.width, a.height, a.sum_r, a.sum_g, a.sum_b) ==
        (r.width, r.height, r.sum_r, r.sum_g, r.sum_b),
        s"nondeterministic features for ${r.doc_id}")
    }
  }

  test("dup clusters: components get the min-id label and exact sizes") {
    import spark.implicits._
    // a 21-node path (diameter 20, exactly the rounds=20 reach) plus a
    // disjoint 2-node component; all path nodes must land on label 0.
    // Ids fed in a_id-descending order so convergence can't ride on
    // input ordering.
    val pairs = ((0L until 20L).map(i => (i, i + 1)).reverse ++
      Seq((200L, 201L))).toDF("a_id", "b_id")
    val out = LlmOps.clustersFromPairs(pairs, rounds = 20)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out.size == 23)
    assert(out == out.sortBy(_._1), "output must be doc_id-ordered")
    assert(out.filter(_._1 < 200L).forall(r => r._2 == 0L && r._3 == 21L),
      "path component must collapse to cluster 0 of size 21")
    assert(out.filter(_._1 >= 200L).forall(r => r._2 == 200L && r._3 == 2L))
  }

  test("boilerplate list: planted hot gram surfaces with exact df and spans") {
    import spark.implicits._
    // 6 docs share the template gram (one doc repeats it), 3 docs of
    // unique text, 1 short doc (< window) — unique and short must NOT
    // surface at minDf 5; the template must, with df=6 and 7 spans
    val docs = (
      (0L until 5L).map(i => (i, s"begin legal boiler plate end u$i")) ++
      Seq((5L, "legal boiler plate and again legal boiler plate")) ++
      (6L until 9L).map(i => (i, s"wholly distinct text number $i here")) ++
      Seq((9L, "tiny doc"))
    ).toDF("doc_id", "text")
    val out = LlmOps.boilerplateGrams(spark, docs, 3, 5)
      .as[(String, Long, Long)].collect().toSeq
    assert(out.map(_._1) == out.map(_._1).sorted, "gram-ordered output")
    assert(out.contains(("legal boiler plate", 6L, 7L)),
      s"expected the planted gram with df=6, spans=7; got $out")
    assert(out.forall(_._2 >= 5L))
    assert(!out.exists(_._1.contains("distinct")), "unique text leaked in")
    assert(!out.exists(_._1 == "tiny doc"), "short doc leaked in")
  }

  test("boilerplate strip removes exactly the hot spans, keeps the rest") {
    import spark.implicits._
    // same planted corpus as the list test: "legal boiler plate" is hot
    // (df=6); overlapping occurrences in doc 5 must merge their covered
    // positions, unique docs must pass through untouched (lowercased)
    val docs = (
      (0L until 5L).map(i => (i, s"begin legal boiler plate end u$i")) ++
      Seq((5L, "legal boiler plate and again legal boiler plate")) ++
      (6L until 9L).map(i => (i, s"Wholly distinct TEXT number $i here")) ++
      Seq((9L, "tiny doc"))
    ).toDF("doc_id", "text")
    val out = LlmOps.stripBoilerplate(spark, docs, 3, 5)
      .as[(Long, String, Long)].collect().toSeq
    assert(out.size == 10 && out.map(_._1) == (0L until 10L))
    // template docs lose the WHOLE shared prefix: every 3-gram of
    // "begin legal boiler plate end" reaches df=5, so their covered
    // spans union to positions 0..4 and only the unique tail survives
    (0 until 5).foreach { i =>
      assert(out(i)._2 == s"u$i" && out(i)._3 == 5L, out(i).toString)
    }
    // both occurrences in doc 5 strip; the connective words survive
    assert(out(5)._2 == "and again" && out(5)._3 == 6L, out(5).toString)
    // unique docs: zero stripped, text intact modulo lowercasing
    (6 until 9).foreach { i =>
      assert(out(i)._2 == s"wholly distinct text number $i here" &&
        out(i)._3 == 0L, out(i).toString)
    }
    assert(out(9)._2 == "tiny doc" && out(9)._3 == 0L)
    // a hot SHORT doc strips entirely (includeShort composition rule)
    val shortHot = ((0L until 5L).map(i => (i, "copy me")) ++
      Seq((9L, "other words here")))
      .toDF("doc_id", "text")
    val so = LlmOps.stripBoilerplate(spark, shortHot, 3, 5)
      .as[(Long, String, Long)].collect().toSeq
    assert(so.take(5).forall(r => r._2 == "" && r._3 == 2L), so.toString)
    assert(so(5)._2 == "other words here" && so(5)._3 == 0L)
  }

  test("int8 quantization: bounded codes, half-step dequant error") {
    import spark.implicits._
    val raw = graft.util.Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap
    val out = LlmOps.qEmbQuantize(spark, sfDir)
      .as[(Long, Double, String)].collect()
    assert(out.length == raw.size)
    out.foreach { case (id, scale, q8) =>
      val q = q8.split(",").map(_.toLong)
      val x = raw(id)
      assert(q.length == x.length)
      assert(q.forall(v => v >= -127 && v <= 127), s"vec $id code out of range")
      // scale in the dump is r6-rounded; half-step bound plus that slack
      val maxErr = q.zip(x).map { case (qi, xi) =>
        math.abs(xi - qi * scale) }.max
      assert(maxErr <= scale / 2 + 1e-4,
        s"vec $id dequant error $maxErr exceeds half a step ($scale)")
    }
  }

  test("near-dup prune keeps exactly the cluster survivors") {
    import spark.implicits._
    val clusters = LlmOps.qDedupClusters(spark, sfDir)
      .select("doc_id", "cluster_id").as[(Long, Long)].collect()
    val losers = clusters.filter(r => r._1 != r._2).map(_._1).toSet
    assert(losers.nonEmpty, "fixture should contain near-dup losers")
    val docs = graft.util.Tables.documents(spark, sfDir)
      .select("doc_id").as[Long].collect().toSet
    val kept = LlmOps.qDedupPrune(spark, sfDir)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == docs -- losers, "prune must drop exactly the losers")
    assert(clusters.map(_._2).toSet.subsetOf(kept),
      "every cluster canonical must survive the prune")
  }

  test("substring overlap matches a driver-side brute force") {
    import spark.implicits._
    val docs = graft.util.Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect()
    val grams = docs.map { case (id, text) =>
      id -> text.toLowerCase.split(" ", -1).toSeq.sliding(20)
        .filter(_.size == 20).map(_.mkString(" ")).toSet
    }.toMap
    val df = grams.values.flatten.groupBy(identity).view
      .mapValues(_.size).toMap
    val kept = grams.view.mapValues(_.filter(g =>
      df(g) >= 2 && df(g) <= 10)).toMap
    val ids = docs.map(_._1).sorted
    val expected = (for {
      (a, i) <- ids.zipWithIndex; b <- ids.drop(i + 1)
      shared = (kept(a) & kept(b)).size if shared > 0
    } yield (a, b) -> shared.toLong).toMap
    val got = LlmOps.qDedupSubstring(spark, sfDir)
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got == expected,
      s"mismatch: extra=${got.keySet -- expected.keySet} " +
        s"missing=${expected.keySet -- got.keySet}")
    assert(expected.nonEmpty, "fixture should contain verbatim overlaps")
  }

  test("dup clusters: an undersized unroll fails loudly, never splits") {
    import spark.implicits._
    val chain = (0L until 99L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val e = intercept[Exception] {
      LlmOps.clustersFromPairs(chain, rounds = 1).collect()
    }
    val msgs = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString("\n")
    assert(msgs.contains("not converged"),
      s"expected the in-plan convergence guard, got: $msgs")
  }

  test("fuzzy blocking: first-word key catches a last-word typo the single-key scheme misses") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val names = Seq(
      ("navy steel", 3L, 10L),
      ("navy stel", 2L, 11L), // typo IN the last word — blocks differ there
      ("red shiny blue", 1L, 12L),
      ("red shiney blue", 1L, 13L), // shares BOTH keys — dedup must keep one
      ("mint green", 1L, 14L)
    ).toDF("p_name", "n_rows", "repr_key")
    val matched = graft.ops.DedupAdvanced.fuzzyCandidatePairs(names)
      .withColumn("dist", levenshtein($"name_a", $"name_b"))
      .filter($"dist" <= 3)
      .select($"name_a", $"name_b").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(matched.toSet == Set(
      ("navy steel", "navy stel"),
      ("red shiney blue", "red shiny blue")),
      s"got ${matched.toSeq}")
    // the double-blocked pair appears exactly once (deduped pre-scoring)
    assert(matched.length == 2, s"duplicate candidates: ${matched.toSeq}")
    // and the r13 single-key (last word) blocking provably misses the
    // last-word-typo pair — the hole this second key exists to close
    val lastKeyed = names.withColumn("noun",
      element_at(split($"p_name", " "), -1))
    val single = lastKeyed.select($"p_name".as("name_a"), $"noun")
      .join(lastKeyed.select($"p_name".as("name_b"), $"noun".as("noun_b")),
        $"noun" === $"noun_b" && $"name_a" < $"name_b")
      .filter(levenshtein($"name_a", $"name_b") <= 3)
      .select($"name_a", $"name_b").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(!single.contains(("navy steel", "navy stel")),
      "single-key blocking was supposed to miss the last-word typo")
  }
}
