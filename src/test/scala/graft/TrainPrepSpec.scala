package graft

import org.apache.spark.sql.functions._

/** Semantics tests for the training-set preparation operators
  * (ops/TrainPrep.scala); the DuckDB oracle covers exact parity, these
  * pin the invariants a refactor could silently break. */
class TrainPrepSpec extends SparkSpec {
  private val dir = sfDir

  test("decontaminate: eval docs excluded, overlap counts bounded by doc shingles") {
    val out = ops.TrainPrep.qDecontaminate(spark, dir).cache()
    // the eval split (doc_id % 20 == 0) must not appear in the output
    assert(out.filter(pmod(col("doc_id"), lit(20)) === 0).count() === 0)
    // contaminated <=> n_overlap > 0, and some of each exist at sf0.001
    assert(out.filter(col("contaminated") =!= (col("n_overlap") > 0)).count() === 0)
    assert(out.filter(col("contaminated")).count() > 0)
    // n_overlap can never exceed the doc's own distinct shingle count
    val sh = util.Shingles
      .tokDistinct(spark, util.Tables.documents(spark, dir), 3)
      .groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    assert(out.join(sh, Seq("doc_id"))
      .filter(col("n_overlap") > col("n_sh")).count() === 0)
    out.unpersist()
  }

  test("stratified sample: rates differ by stratum and rows honor their threshold") {
    val docs = util.Tables.documents(spark, dir)
    val out = ops.TrainPrep.qSampleStratified(spark, dir).cache()
    // every sampled row is below its stratum threshold
    val bad = out.withColumn("thresh",
      when(col("lang") === "en", "80").when(col("lang") === "zh", "40")
        .otherwise("1a"))
      .filter(col("hpfx") >= col("thresh"))
    assert(bad.count() === 0)
    // en keeps a visibly larger share than the 10% strata
    val n = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val k = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val enRate = k.getOrElse("en", 0L).toDouble / n("en")
    val deRate = k.getOrElse("de", 0L).toDouble / n("de")
    assert(enRate > deRate)
    out.unpersist()
  }

  test("pack greedy: bins are contiguous from 0 and fill within capacity+max_doc") {
    val out = ops.TrainPrep.qPackGreedy(spark, dir).cache()
    // per lang: bin ids start at 0 and are contiguous
    val bins = out.groupBy("lang").agg(min("bin").as("mn"),
      max("bin").as("mx"), countDistinct("bin").as("nd"))
    assert(bins.filter(col("mn") =!= 0 || col("nd") =!= col("mx") + 1)
      .count() === 0)
    // a bin's token load can overshoot capacity only by its last doc:
    // load <= capacity + max single-doc tokens in that bin
    val load = out.groupBy("lang", "bin")
      .agg(sum("n_tokens").as("load"), max("n_tokens").as("mx"))
    assert(load.filter(col("load") > lit(2048L) + col("mx")).count() === 0)
    out.unpersist()
  }

  test("train-prep plans: no all-pairs joins; packing windows are sharded") {
    // decontamination must stay an inverted-index equi-join (broadcast
    // eval shingle set), never doc×doc
    val decon = ops.TrainPrep.qDecontaminate(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!decon.contains("CartesianProduct") &&
      !decon.contains("BroadcastNestedLoopJoin"),
      s"decontaminate must not materialize all pairs:\n$decon")
    assert(decon.contains("BroadcastHashJoin"),
      "eval shingle set should broadcast at fixture scale")
    // greedy packing: the doc-scale window (the one ordering by doc_id)
    // must partition by BOTH lang and shard — a lang-only partition puts
    // an entire language's running sum on one task at corpus scale
    val pack = ops.TrainPrep.qPackGreedy(spark, dir)
      .queryExecution.executedPlan.toString
    val docWindow =
      """windowspecdefinition\(lang#\d+, shard#\d+L?, doc_id#\d+L? ASC""".r
    assert(docWindow.findFirstIn(pack).isDefined,
      s"doc-scale window must partition by (lang, shard):\n$pack")
    // the offset join must broadcast the tiny per-shard frame, never
    // shuffle the doc side or go nested-loop
    assert(pack.contains("BroadcastHashJoin"),
      s"shard offsets should broadcast:\n$pack")
    assert(!pack.contains("SortMergeJoin") &&
      !pack.contains("CartesianProduct") &&
      !pack.contains("BroadcastNestedLoopJoin"),
      s"packing must not shuffle-join the doc side:\n$pack")
  }

  test("pack greedy: sharded core is shard-size-invariant") {
    import spark.implicits._
    val toks = util.Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    // shardSize larger than any doc_id = the unsharded single-window
    // definition; tiny and odd shard sizes must agree with it exactly
    val want = ops.TrainPrep.packBins(spark, toks, 2048L, 1L << 40)
      .orderBy("doc_id").collect().toSeq
    for (sz <- Seq(1L, 7L, 128L)) {
      val got = ops.TrainPrep.packBins(spark, toks, 2048L, sz)
        .orderBy("doc_id").collect().toSeq
      assert(got == want, s"shardSize=$sz diverged from single-window")
    }
  }

  test("quota sample takes exactly min(K, group) per lang via WindowGroupLimit") {
    import spark.implicits._
    val got = graft.ops.TrainPrep.qSampleQuota(spark, sfDir)
    val perLang = got.groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val avail = graft.util.Tables.documents(spark, sfDir)
      .groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    avail.foreach { case (lang, n) =>
      assert(perLang.getOrElse(lang, 0L) == math.min(50L, n),
        s"$lang quota: got ${perLang.get(lang)}, avail $n")
    }
    // the rank<=K filter must lower to WindowGroupLimit: map tasks
    // pre-filter to their local top-K BEFORE the shuffle, so the
    // window moves O(tasks*K) rows per group at any corpus size
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank filter should trigger WindowGroupLimit:\n$plan")
  }

  test("mix weights: shares sum to 1 and weights invert the shares") {
    val out = ops.TrainPrep.qMixWeights(spark, dir).cache()
    val ncells = out.count()
    val shareSum = out.agg(sum("share")).head().getDouble(0)
    assert(math.abs(shareSum - 1.0) < 1e-3)
    // weight ~ (1/ncells) / share for every cell
    val bad = out.filter(
      abs(col("weight") - lit(1.0) / (lit(ncells) * col("share"))) > 0.01)
    assert(bad.count() === 0)
    out.unpersist()
  }
}
