package graft

import org.apache.spark.sql.functions._

/** BPE subword tokenizer (TextOps.bpeLearn / bpeEncodeExpr): vocabulary
  * learning pinned on a hand-counted corpus, deterministic tie-breaks,
  * and the lossless encode round trip. */
class TextBpeSpec extends SparkSpec {

  test("bpeLearn reproduces the hand-counted merge sequence") {
    import spark.implicits._
    // word freqs: the:4, cat:1, hat:1
    // round 1 pairs: (t,h):4 (h,e):4 (c,a):1 (a,t):2 (h,a):1
    //   → tie 4/4, pair-asc tie-break: "h e" < "t h" → merge (h, e)
    // round 2: (t,he):4 (c,a):1 (a,t):2 (h,a):1 → (t, he)
    // round 3: (a,t):2 wins → (a, t)
    // round 4: every remaining pair is count 1 → dry stop
    val docs = Seq("the the the cat", "the hat").toDF("text")
    val merges = graft.ops.TextOps.bpeLearn(docs, "text", numMerges = 10)
    assert(merges == Seq("h" -> "e", "t" -> "he", "a" -> "t"),
      s"got $merges")
  }

  test("learned merges drive the per-word encode (learn's own unit)") {
    import spark.implicits._
    val docs = Seq("the the the cat", "the hat").toDF("text")
    val merges = graft.ops.TextOps.bpeLearn(docs, "text", numMerges = 10)
    val enc = docs
      .select(explode(split($"text", " ")).as("w")).distinct()
      .select($"w", graft.ops.TextOps.bpeEncodeExpr($"w", merges)
        .as("toks"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(enc == Map("the" -> "the", "cat" -> "c at", "hat" -> "h at"),
      enc.toString)
  }

  test("each rank merges every occurrence, including adjacent ones") {
    import spark.implicits._
    // the r15 single-space encoding consumed the shared boundary
    // space: "abab" under merge (a,b) came out "ab a b" — the second
    // adjacent occurrence was skipped (round-16 ADVICE). The
    // double-space separator keeps matches disjoint, so one pass per
    // rank is exhaustive, like standard BPE.
    val enc = Seq("abab", "ababab", "xabab").toDF("t")
      .select($"t", graft.ops.TextOps.bpeEncodeExpr($"t",
        Seq("a" -> "b")).as("toks"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(enc == Map("abab" -> "ab ab", "ababab" -> "ab ab ab",
      "xabab" -> "x ab ab"), enc.toString)
    // learn sees the fixed corpus the same way: "abab" has pair
    // (a,b) twice, merges once, then goes dry ((ab,ab) is count 1)
    val merges = graft.ops.TextOps.bpeLearn(
      Seq("abab").toDF("text"), "text", numMerges = 10)
    assert(merges == Seq("a" -> "b"), merges.toString)
  }

  test("vocabulary artifact: learned once, artifact-backed, consistent") {
    val direct = graft.ops.TextOps.bpeLearn(
      graft.util.Tables.documents(spark, sfDir), "text", numMerges = 24)
    val viaArtifact = graft.ops.TextOps.bpeVocabulary(spark, sfDir, 24)
    assert(viaArtifact == direct,
      s"artifact ranks drifted from a direct learn: $viaArtifact")
    // second call must be the CACHED artifact read, not a re-learn:
    // computeIfAbsent returns the same instance iff no rebuild ran
    val again = graft.ops.TextOps.bpeVocabulary(spark, sfDir, 24)
    assert(again eq viaArtifact, "second call re-ran the learn loop")
  }

  test("batched learn reproduces the sequential merge table exactly; rounds stay bounded") {
    // r20 (r19 verdict #7): the sequential loop is one driver-paced
    // job per merge — unacceptable at a 32k production vocabulary.
    // The batched learner counts once per ROUND and accepts the
    // maximal symbol-disjoint prefix of the ranked candidates; on the
    // fixture it must reproduce the sequential table EXACTLY.
    val docs = graft.util.Tables.documents(spark, sfDir)
    def countJobs(body: => Seq[(String, String)])
        : (Seq[(String, String)], Int) = {
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        val r = body
        // the listener bus is async; each learn round blocks on
        // collect so starts are posted — a short settle drains delivery
        Thread.sleep(500)
        (r, jobs.get())
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    val (sequential, seqJobs) =
      countJobs(graft.ops.TextOps.bpeLearn(docs, "text", 24))
    val (batched, batchJobs) = countJobs(
      graft.ops.TextOps.bpeLearnBatched(docs, "text", 24, batchSize = 8))
    assert(batched == sequential,
      s"batched learn diverged:\n batched   $batched\n sequential $sequential")
    // bounded rounds: batching must pay measurably fewer Spark jobs
    // than one-counting-pass-per-merge (the 32k-vocab posture)
    assert(batchJobs * 3 <= seqJobs * 2,
      s"batched learn ran $batchJobs jobs vs sequential's $seqJobs — " +
        "not meaningfully batched")
    // hand-counted corpus: same table through the batched path too
    import spark.implicits._
    val tiny = Seq("the the the cat", "the hat").toDF("text")
    assert(graft.ops.TextOps.bpeLearnBatched(tiny, "text", 10,
      batchSize = 4) == Seq("h" -> "e", "t" -> "he", "a" -> "t"))
  }

  test("hash-sampled learn: fraction 1.0 is exact; a sampled learn still yields a usable table") {
    val docs = graft.util.Tables.documents(spark, sfDir)
    val full = graft.ops.TextOps.bpeLearnBatched(docs, "text", 12,
      batchSize = 4, sampleFraction = 1.0)
    assert(full == graft.ops.TextOps.bpeLearn(docs, "text", 12))
    // a 50% hash sample (deterministic, no rand()) learns a table the
    // encode path can consume losslessly — the production posture:
    // vocabulary statistics concentrate; exactness is per-sample
    val sampled = graft.ops.TextOps.bpeLearnBatched(docs, "text", 12,
      batchSize = 4, sampleFraction = 0.5)
    assert(sampled.nonEmpty && sampled.size <= 12)
    import spark.implicits._
    val prefix = regexp_replace(lower(substring($"text", 1, 120)),
      "[^a-z]", "")
    val bad = docs.select(prefix.as("in"),
        graft.ops.TextOps.bpeEncodeExpr(prefix, sampled).as("toks"))
      .filter(regexp_replace($"toks", " ", "") =!= $"in").count()
    assert(bad == 0,
      s"$bad documents failed the sampled-vocab round trip")
    // determinism: the same sample reproduces the same table
    assert(sampled == graft.ops.TextOps.bpeLearnBatched(docs, "text",
      12, batchSize = 4, sampleFraction = 0.5))
  }

  test("encode-only query round-trips under the learned vocabulary") {
    import spark.implicits._
    val out = graft.ops.TextOps.qTextBpeEncode(spark, sfDir)
    val prefix = regexp_replace(lower(substring($"text", 1, 120)),
      "[^a-z]", "")
    val expected = graft.util.Tables.documents(spark, sfDir)
      .select($"doc_id", prefix.as("in"))
    val bad = out.join(expected, "doc_id")
      .filter(regexp_replace($"tokens", " ", "") =!= $"in")
      .count()
    assert(bad == 0, s"$bad documents failed the learned-vocab round trip")
  }

  test("encode round-trips losslessly over the documents corpus") {
    import spark.implicits._
    val docs = graft.util.Tables.documents(spark, sfDir)
    val prefix = regexp_replace(lower(substring($"text", 1, 200)),
      "[^a-z]", "")
    val bad = docs.select(prefix.as("in"),
        graft.ops.TextOps.bpeEncodeExpr(prefix,
          graft.ops.TextOps.BpeCanonicalMerges).as("toks"))
      .filter(regexp_replace($"toks", " ", "") =!= $"in")
      .count()
    assert(bad == 0, s"$bad documents failed the concat-tokens round trip")
  }
}
