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
