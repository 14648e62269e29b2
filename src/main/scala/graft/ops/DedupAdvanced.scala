package graft.ops

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables._
import graft.util.Determinism._

/** Approximate dedup at scale (SURVEY.md §2.J): MinHash-LSH and SimHash.
  * No DuckDB oracle — both are hash-model-dependent (pinned seeds make
  * them deterministic run-to-run); ScalaTest checks planted near-dups
  * are found and precision holds vs exact Jaccard.
  *
  * Scale: these ARE the scale paths for near-dup detection. MinHash-LSH
  * candidate generation is an equi-join on (band, bucket) keys — shuffle
  * O(docs × bands), never all-pairs. SimHash banding likewise turns
  * Hamming-radius search into 8 equi-joins on 8-bit band keys.
  */
object DedupAdvanced {

  /** Word-3-gram shingle SETS per doc (the discriminative unit on this
    * corpus: raw word sets are saturated — most doc pairs share most
    * vocabulary). Built from the codegen'd tokenizer, collected only for
    * the HashingTF array interface. */
  private def shingled(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.util.Shingles.tokDistinct(s, documents(s, dir), 3)
      .groupBy($"doc_id").agg(collect_list($"shingle").as("shingles"))
  }

  /** §2.J MinHash-LSH near-dup pairs via spark.ml (seeded, jaccard
    * distance ≤ 0.7 on binary shingle-set vectors). */
  def qDedupMinhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tf = new HashingTF().setInputCol("shingles").setOutputCol("features")
      .setNumFeatures(1 << 18).setBinary(true)
    // cached: approxSimilarityJoin self-joins this subtree (both sides)
    val fdf = tf.transform(shingled(s, dir)).cache()
    val mh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(2).setSeed(42L)
    val model = mh.fit(fdf)
    model.approxSimilarityJoin(fdf, fdf, 0.7, "jacc_dist")
      .select(
        col("datasetA.doc_id").as("a_id"),
        col("datasetB.doc_id").as("b_id"),
        r6(col("jacc_dist")).as("jacc_dist"))
      .filter($"a_id" < $"b_id")
      .orderBy($"a_id", $"b_id")
  }

  /** §2.J MinHash near-dup, SQL-native codegen twin of `q_dedup_minhash`:
    * the same banded-LSH shape with zero MLlib overhead (no sparse
    * vectors, no model fit, no plan-build jobs). k=16 signature slots —
    * slot j is min(xxhash64(j, shingle)) over the doc's distinct
    * shingles, all 16 mins in ONE map-side-combined hash aggregate —
    * banded 8×2; candidates share a band value (equi-join, never
    * all-pairs); then an EXACT Jaccard recheck on candidates only via
    * `array_intersect` of the per-doc sorted shingle-hash sets, so
    * precision is exact and banding is purely a recall knob (pairs with
    * true Jaccard ≥ 0.3 emitted; recall-vs-exact test in ScaleSpec).
    *
    * Scale: the signature agg is O(docs·shingles·k) scan-side work with
    * O(docs) shuffle; band self-join shuffles O(docs·bands) keys; the
    * recheck touches candidate pairs only, and its per-doc hash arrays
    * are bounded by document length. No model broadcast, no fit action:
    * plan construction launches zero jobs (pinned by the registry-wide
    * plan-hygiene test, which the MLlib twin must be exempted from). */
  def qDedupMinhashNative(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val k = 16
    val rowsPerBand = 2
    val nBands = k / rowsPerBand
    val tok = graft.util.Shingles.tokDistinct(s, documents(s, dir), 3)
      .withColumn("hk", xxhash64($"shingle"))
    val sigCols = (0 until k)
      .map(j => min(xxhash64(lit(j), $"shingle")).as(s"h$j"))
    val sig = tok.groupBy($"doc_id").agg(sigCols.head, sigCols.tail: _*)
    val bandVals = (0 until nBands).map { b =>
      xxhash64((b * rowsPerBand until (b + 1) * rowsPerBand)
        .map(j => col(s"h$j")): _*)
    }
    // cached: the banding self-join reads this subtree from both sides
    val banded = sig.select($"doc_id",
      posexplode(array(bandVals: _*)).as(Seq("band", "bv"))).cache()
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
    // exact recheck on the surviving candidates only: per-doc sorted
    // shingle-hash sets (tokDistinct ⇒ hk sets; xxhash64 collisions at
    // doc scale are negligible for a near-dup *measure*, and both sides
    // of the intersection use the same hashes)
    val sets = tok.groupBy($"doc_id")
      .agg(sort_array(collect_list($"hk")).as("hks"),
        count(lit(1)).as("sz"))
    cand
      .join(sets.select($"doc_id".as("a_id"), $"hks".as("a_hks"),
        $"sz".as("a_sz")), Seq("a_id"))
      .join(sets.select($"doc_id".as("b_id"), $"hks".as("b_hks"),
        $"sz".as("b_sz")), Seq("b_id"))
      .withColumn("common",
        size(array_intersect($"a_hks", $"b_hks")).cast("long"))
      .withColumn("jac", $"common" / ($"a_sz" + $"b_sz" - $"common"))
      .filter($"jac" >= 0.3)
      .select($"a_id", $"b_id", r6($"jac").as("jaccard"))
      .orderBy($"a_id", $"b_id")
  }

  /** 63-bit SimHash fingerprints: classic formulation — ONE xxhash64 per
    * shingle, bit b of the fingerprint = sign of Σ(±1) votes from bit b
    * of each shingle hash. Shaped as explode → hash → single
    * HashAggregate with 63 codegen'd conditional sums → Horner packing
    * (63 bits keeps the long positive: no ANSI overflow). The earlier
    * nested higher-order-function version was NOT codegen-able
    * (interpreted lambdas) and was ~100× slower at sf0.1.
    * Hamming distance downstream is one XOR + bit_count. */
  private[graft] def fingerprints(s: SparkSession, dir: String): DataFrame =
    fingerprintsOf(s, documents(s, dir))

  /** Same, over any (doc_id, text) frame — the scale-canary entry point. */
  private[graft] def fingerprintsOf(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    val tok = graft.util.Shingles.tokDistinct(s, docs, 3)
      .withColumn("h", xxhash64($"shingle"))
    val votes = (0 until 63).map(b =>
      sum(when(shiftright($"h", b).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"b$b")) :+ count(lit(1)).as("n_sh")
    val voted = tok.groupBy($"doc_id").agg(votes.head, votes.tail: _*)
    val fp = (0 until 63).foldLeft(lit(0L)) { (acc, b) =>
      acc * 2 + when(col(s"b$b") > 0, 1L).otherwise(0L)
    }
    voted.select($"doc_id", fp.as("fp"), $"n_sh")
  }

  /** §2.J SimHash fingerprints over shingles (long + display bit string). */
  def qDedupSimhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    fingerprints(s, dir)
      .join(documents(s, dir).select($"doc_id", $"lang"), "doc_id")
      .select($"doc_id", $"lang", $"fp",
        lpad(bin($"fp"), 64, "0").as("simhash"))
      .orderBy($"doc_id")
  }

  /** The 16 band keys per doc from the RAW fingerprint long: 8 8-bit
    * bands (two chars of the hex form, zero-padded HERE — unpadded
    * hex() drops leading zeros and misaligns every band, the exact bug
    * this helper's extraction fixed) × both adjacent length buckets so
    * near-dups straddling a bucket boundary still collide. Shared with
    * the profiler so production and measurement can't drift. */
  private[graft] def bandKeys(fp: org.apache.spark.sql.Column,
      lenb: org.apache.spark.sql.Column) = {
    val fpHex = lpad(hex(fp), 16, "0")
    transform(sequence(lit(0), lit(15)),
      k => concat(pmod(k, lit(8)).cast("string"), lit(":"),
        (lenb + when(k >= 8, 1).otherwise(0)).cast("string"), lit(":"),
        fpHex.substr(pmod(k, lit(8)) * 2 + 1, lit(2))))
  }

  /** §2.J SimHash banding: candidate pairs share one of 8 8-bit bands
    * (the Hamming-space LSH); confirmed at bit_count(xor) ≤ 16.
    * Word-soup fingerprints are correlated, so raw 8-bit buckets skew
    * huge; the band key also carries a shingle-count bucket (near-dups
    * have near-equal length) which splits the hot buckets without
    * hurting recall. */
  def qDedupSimhashPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // cached: the banding self-join reads this subtree from both sides
    val fp = fingerprints(s, dir)
      .withColumn("lenb", ($"n_sh" / 16).cast("int")).cache()
    val banded = fp.select($"doc_id", $"fp",
      explode(bandKeys($"fp", $"lenb")).as("band"))
    banded.as("a")
      .join(banded.as("b"), Seq("band"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        col("a.fp").as("a_fp"), col("b.fp").as("b_fp"))
      .distinct()
      .withColumn("hamming",
        expr("bit_count(a_fp ^ b_fp)").cast("long"))
      .filter($"hamming" <= 16)
      .select($"a_id", $"b_id", $"hamming")
      .orderBy($"a_id", $"b_id")
  }

  /** Candidate name pairs under TWO blocking keys — the name's FIRST
    * word and its LAST word, unioned (via one explode) and deduped
    * BEFORE any scoring. Single-key blocking has a silent recall hole:
    * a typo inside the key itself ("…steel" vs "…stel") lands the two
    * names in different blocks and the pair is never scored. With two
    * independent keys a pair is only lost if BOTH its first and last
    * words are corrupted — the standard multi-pass blocking fix, still
    * an equi-join, never a cartesian. Input dictionary schema:
    * (p_name, n_rows, repr_key); output one row per unordered
    * candidate pair with both sides' carried attributes. */
  private[graft] def fuzzyCandidatePairs(names: DataFrame): DataFrame = {
    val keyed = names.withColumn("bkey", explode(array(
      element_at(split(col("p_name"), " "), 1),
      element_at(split(col("p_name"), " "), -1))))
    val a = keyed.select(col("p_name").as("name_a"), col("n_rows").as("n_a"),
      col("repr_key").as("key_a"), col("bkey"))
    val b = keyed.select(col("p_name").as("name_b"), col("n_rows").as("n_b"),
      col("repr_key").as("key_b"), col("bkey").as("bkey_b"))
    a.join(b, col("bkey") === col("bkey_b") && col("name_a") < col("name_b"))
      // a pair blocked by BOTH keys appears twice — dedup before the
      // (comparatively expensive) edit-distance pass, not after
      .dropDuplicates("name_a", "name_b")
      .select(col("name_a"), col("name_b"), col("n_a"), col("n_b"),
        col("key_a"), col("key_b"))
  }

  /** §2.J FUZZY (edit-distance) entity matching — the name-resolution
    * step of record linkage, built the way it scales: (1) collapse rows
    * to the DISTINCT-NAME DICTIONARY first (a fuzzy join over raw rows
    * squares duplicate-heavy data — this fixture has ~600 copies of
    * some part names, 3.1M within-block row pairs at sf0.1 vs a few
    * hundred dictionary pairs); (2) block dictionary entries on TWO
    * cheap deterministic keys (first word ∪ last word —
    * [[fuzzyCandidatePairs]]) so candidate generation is an equi-join,
    * never a cartesian, and a typo inside one key cannot silently drop
    * a pair; (3) score only the deduped candidates with codegen'd
    * `levenshtein`. Output: matched name pairs with their row
    * multiplicities — what an MDM pipeline feeds to a reviewer or a
    * cluster resolver (`q_dedup_clusters` downstream if transitive
    * closure is wanted). Exact same semantics in DuckDB (its
    * levenshtein agrees on these ASCII names), so fully
    * oracle-checked. */
  def qDedupFuzzy(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val names = part(s, dir)
      .groupBy($"p_name").agg(
        count(lit(1)).as("n_rows"),
        min($"p_partkey").as("repr_key"))
    fuzzyCandidatePairs(names)
      .withColumn("dist", levenshtein($"name_a", $"name_b"))
      .filter($"dist" <= 3)
      .select($"name_a", $"name_b", $"n_a", $"n_b", $"key_a", $"key_b",
        $"dist".cast("long").as("dist"))
      .orderBy($"name_a", $"name_b")
  }

  private val fuzzyPairCache = new java.util.concurrent.ConcurrentHashMap[
    String, (String, org.apache.spark.sql.types.StructType)]()

  /** The fuzzy pair table materialized ONCE per (dir, fixture
    * generation) to scratch parquet — the same two-phase recipe as
    * content dedup's `materializedPairs`: without it the 8-round label
    * unroll re-expands the pair subtree per round and the composed
    * plan balloons to ~2,500 exchanges (measured via ExplainAll);
    * iterating over the flat scan keeps every round's subtree one
    * parquet read. */
  private def fuzzyPairsMaterialized(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val p = new org.apache.hadoop.fs.Path(s"$dir/part.parquet")
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    val root = fs.getFileStatus(p)
    val files = if (root.isDirectory) fs.listStatus(p).toSeq.filter(_.isFile)
      else Seq(root)
    val cacheKey = s"$dir@${files.size}_${files.map(_.getLen).sum}_" +
      s"${files.map(_.getModificationTime).max}"
    val (path, schema) = fuzzyPairCache.computeIfAbsent(cacheKey, _ => {
      val names = part(s, dir)
        .groupBy($"p_name").agg(
          count(lit(1)).as("n_rows"),
          min($"p_partkey").as("repr_key"))
      val pairs = fuzzyCandidatePairs(names)
        .filter(levenshtein($"name_a", $"name_b") <= 3)
        .select($"key_a".as("a_id"), $"key_b".as("b_id"))
      val key = dir.replaceAll("[^A-Za-z0-9._-]", "-").takeRight(32) + "_" +
        java.security.MessageDigest.getInstance("MD5")
          .digest(cacheKey.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val out = graft.util.Scratch.dir(s"fuzzy_pairs_$key")
      pairs.write.mode("overwrite").parquet(out)
      (out, pairs.schema)
    })
    s.read.schema(schema).parquet(path)
  }

  /** §2.J entity RESOLUTION end-to-end: the fuzzy pair table resolved
    * into connected components (re-using `LlmOps.clustersFromPairs` —
    * the same fixed-round min-label propagation with an in-plan
    * convergence guard that backs content dedup), then joined back so
    * EVERY dictionary name gets an entity id (singletons label
    * themselves). Output per name: its entity, how many name variants
    * the entity spans, and how many underlying rows it covers — the
    * canonical-entity table an MDM pipeline publishes. Fully
    * oracle-checked via the recursive-CTE flood. */
  def qDedupFuzzyEntities(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // two-phase like content dedup's clustersCore: materialize pairs
    // with AQE ON (parent session), run the fixed-round unroll with
    // AQE OFF over the flat scan (per-stage replanning buys nothing on
    // a dictionary-sized label table and costs planning time per round)
    fuzzyPairsMaterialized(s, dir)
    val s2 = s.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    val names = part(s2, dir)
      .groupBy($"p_name").agg(
        count(lit(1)).as("n_rows"),
        min($"p_partkey").as("repr_key"))
    val labels = LlmOps.clustersFromPairs(fuzzyPairsMaterialized(s2, dir),
        rounds = 8)
      .select($"doc_id".as("node"), $"cluster_id")
    val ent = names.join(labels, $"repr_key" === $"node", "left")
      .select($"p_name", $"n_rows", $"repr_key",
        coalesce($"cluster_id", $"repr_key").as("entity_id"))
    val sizes = ent.groupBy($"entity_id").agg(
      count(lit(1)).as("entity_names"), sum($"n_rows").as("entity_rows"))
    ent.join(sizes, Seq("entity_id"))
      .select($"p_name".as("name"), $"repr_key", $"n_rows",
        $"entity_id", $"entity_names", $"entity_rows")
      .orderBy($"name")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_minhash" -> qDedupMinhash _,
    "q_dedup_minhash_native" -> qDedupMinhashNative _,
    "q_dedup_simhash" -> qDedupSimhash _,
    "q_dedup_simhash_pairs" -> qDedupSimhashPairs _,
    "q_dedup_fuzzy" -> qDedupFuzzy _,
    "q_dedup_fuzzy_entities" -> qDedupFuzzyEntities _
  )

  /** Hash-model-dependent ops get the driver's rows-only check
    * (SparkEntry.scala contract) + ScalaTest coverage; the fuzzy
    * matcher is engine-neutral and carries a full oracle. */
  val oracleSql: Map[String, String] = Map(
    "q_dedup_fuzzy" ->
      """WITH names AS (
        |  SELECT p_name, count(*) AS n_rows, min(p_partkey) AS repr_key
        |  FROM part GROUP BY p_name),
        |keyed AS (
        |  SELECT p_name, n_rows, repr_key,
        |    unnest([split_part(p_name, ' ', 1),
        |            split_part(p_name, ' ', -1)]) AS bkey
        |  FROM names),
        |cand AS (
        |  SELECT DISTINCT a.p_name AS name_a, b.p_name AS name_b,
        |    a.n_rows AS n_a, b.n_rows AS n_b,
        |    a.repr_key AS key_a, b.repr_key AS key_b
        |  FROM keyed a JOIN keyed b
        |    ON a.bkey = b.bkey AND a.p_name < b.p_name)
        |SELECT name_a, name_b, n_a, n_b, key_a, key_b,
        |  CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist
        |FROM cand
        |WHERE levenshtein(name_a, name_b) <= 3
        |ORDER BY name_a, name_b""".stripMargin,
    "q_dedup_fuzzy_entities" ->
      """WITH RECURSIVE names AS (
        |  SELECT p_name, count(*) AS n_rows, min(p_partkey) AS repr_key
        |  FROM part GROUP BY p_name),
        |keyed AS (
        |  SELECT p_name, repr_key,
        |    unnest([split_part(p_name, ' ', 1),
        |            split_part(p_name, ' ', -1)]) AS bkey
        |  FROM names),
        |pairs AS (
        |  SELECT DISTINCT a.repr_key AS a_id, b.repr_key AS b_id
        |  FROM keyed a JOIN keyed b
        |    ON a.bkey = b.bkey AND a.p_name < b.p_name
        |  WHERE levenshtein(a.p_name, b.p_name) <= 3),
        |edges AS (SELECT a_id AS u, b_id AS v FROM pairs
        |          UNION ALL SELECT b_id, a_id FROM pairs),
        |cc AS (
        |  SELECT u AS node, u AS label FROM edges
        |  UNION
        |  SELECT e.v, cc.label FROM cc JOIN edges e ON cc.node = e.u),
        |fin AS (SELECT node, min(label) AS entity_id FROM cc GROUP BY node),
        |ent AS (
        |  SELECT n.p_name, n.n_rows, n.repr_key,
        |    coalesce(f.entity_id, n.repr_key) AS entity_id
        |  FROM names n LEFT JOIN fin f ON n.repr_key = f.node),
        |sizes AS (SELECT entity_id, count(*) AS entity_names,
        |    CAST(sum(n_rows) AS BIGINT) AS entity_rows
        |  FROM ent GROUP BY entity_id)
        |SELECT e.p_name AS name, e.repr_key, e.n_rows,
        |  e.entity_id, s.entity_names, s.entity_rows
        |FROM ent e JOIN sizes s USING (entity_id)
        |ORDER BY name""".stripMargin
  )
}
