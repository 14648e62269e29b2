package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.Tables._

/** Incremental corpus maintenance (SURVEY.md §2.J extension).
  *
  * A production training-data pipeline never re-deduplicates the whole
  * corpus per ingest — it keeps a FINGERPRINT STORE (one row per known
  * content hash) and checks only the new batch against it. This file
  * implements that shape at its 100 TB layout: the store is a BUCKETED
  * table — `bucketBy(8, hash_prefix, content_hash)`, sorted the same
  * way, one file per bucket — materialized once per corpus generation
  * (build-once/query-many, same pattern as the IVF index). Each
  * "ingest" is then
  *   (1) ONE shuffle of the batch into the store's bucket layout
  *       (`repartition(8, hash_prefix, content_hash)`), which serves
  *       BOTH the in-batch winner-pick window and the anti-join,
  *   (2) a sort-merge LEFT ANTI against the store in which the store
  *       side moves NOTHING: its bucketed scan already reports the
  *       join's exact HashPartitioning and per-bucket sort order, so
  *       the plan has zero exchanges and zero sorts over the store —
  *       the billions-row side at 100 TB (plan-pinned in
  *       GraphIncrementalSpec).
  *
  * The join key leads with `hash_prefix` = xxhash64(content_hash), an
  * 8-byte long derived FROM the hash (so any holder of a content_hash
  * can compute it): bucket routing hashes a long, and the merge join
  * compares the full 64-char sha256 string only on prefix ties —
  * lexicographic (prefix, hash) order does exactly what the scaladoc
  * promises ("the full hash is only compared on prefix hits"). The
  * prefix adds no semantics — pairs equal on content_hash are equal on
  * its xxhash too — so the DuckDB oracle stays the plain
  * content_hash anti-join.
  *
  * The batch split (doc_id % 4 == 0 = "new arrivals") is a fixture
  * convention mirrored exactly by the oracle.
  */
object IncrementalOps {

  private[graft] val StoreBuckets = 8

  /** Listing-level fingerprint of documents.parquet (same staleness
    * signal as the IVF index cache): an in-place fixture rewrite within
    * one JVM rebuilds the store instead of serving a stale one. */
  private def docsFingerprint(s: SparkSession, dir: String): String = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/documents.parquet")
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    val root = fs.getFileStatus(p)
    val files =
      if (root.isDirectory) fs.listStatus(p).toSeq.filter(_.isFile)
      else Seq(root)
    s"${files.size}_${files.map(_.getLen).sum}_" +
      s"${files.map(_.getModificationTime).max}"
  }

  private val stores =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The persisted fingerprint store: distinct content hashes of the
    * EXISTING corpus (doc_id % 4 != 0) with their 8-byte xxhash
    * prefix, written ONCE per (dir, fixture-generation) as a bucketed
    * + sorted table (pre-`repartition`ed on the bucket keys so every
    * bucket is ONE file and the scan reports both the partitioning
    * and the sort). Later ingests join against the flat bucketed scan
    * and pay zero store-side shuffle. */
  private[graft] def fingerprintStore(s: SparkSession, dir: String): DataFrame = {
    val cacheKey = s"$dir@${docsFingerprint(s, dir)}"
    val table = stores.computeIfAbsent(cacheKey, _ => {
      import s.implicits._
      val store = documents(s, dir)
        .filter(pmod($"doc_id", lit(4)) =!= 0)
        .select(sha2(lower(trim($"text")), 256).as("content_hash"))
        .distinct()
        .select(xxhash64($"content_hash").as("hash_prefix"), $"content_hash")
      val name = "graft_fp_store_" +
        java.security.MessageDigest.getInstance("MD5")
          .digest(cacheKey.getBytes("UTF-8")).map("%02x".format(_)).mkString
      store.repartition(StoreBuckets, $"hash_prefix", $"content_hash")
        .write.mode("overwrite")
        .option("path", graft.util.Scratch.dir(name))
        .bucketBy(StoreBuckets, "hash_prefix", "content_hash")
        .sortBy("hash_prefix", "content_hash")
        .saveAsTable(name)
      name
    })
    s.table(table)
  }

  /** The ingest batch keyed for the store layout: in-batch winner-pick
    * (lowest doc_id per content hash) computed INSIDE the store's
    * bucket partitioning, so the explicit `repartition` is the
    * batch's only shuffle — the window's clustering requirement and
    * the anti-join's distribution are both satisfied by it, and the
    * window's (prefix, hash, doc_id) sort already prefixes the merge
    * join's (prefix, hash) order. */
  private def keyedBatch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    documents(s, dir)
      .filter(pmod($"doc_id", lit(4)) === 0)
      .select($"doc_id", sha2(lower(trim($"text")), 256).as("content_hash"))
      .select($"doc_id", xxhash64($"content_hash").as("hash_prefix"),
        $"content_hash")
      .repartition(StoreBuckets, $"hash_prefix", $"content_hash")
      .withColumn("rn", row_number().over(
        Window.partitionBy($"hash_prefix", $"content_hash")
          .orderBy($"doc_id")))
      .filter($"rn" === 1)
      .drop("rn")
  }

  /** §2.J incremental dedup: admit only new-batch docs whose content is
    * (a) the first occurrence WITHIN the batch (lowest doc_id wins) and
    * (b) absent from the fingerprint store. Output is the admitted
    * docs — exactly the rows a production ingest would append to both
    * the corpus and the store. */
  def qDedupIncremental(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    keyedBatch(s, dir)
      .join(fingerprintStore(s, dir),
        Seq("hash_prefix", "content_hash"), "left_anti")
      .select($"doc_id", $"content_hash")
      .orderBy($"doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_incremental" -> qDedupIncremental _
  )

  val oracleSql: Map[String, String] = Map(
    "q_dedup_incremental" ->
      """WITH batch AS (
        |  SELECT doc_id, sha256(lower(trim(text))) AS content_hash,
        |    row_number() OVER (PARTITION BY sha256(lower(trim(text)))
        |                       ORDER BY doc_id) AS rn
        |  FROM documents WHERE doc_id % 4 = 0),
        |store AS (
        |  SELECT DISTINCT sha256(lower(trim(text))) AS content_hash
        |  FROM documents WHERE doc_id % 4 <> 0)
        |SELECT b.doc_id, b.content_hash
        |FROM batch b
        |WHERE b.rn = 1
        |  AND NOT EXISTS (SELECT 1 FROM store s
        |                  WHERE s.content_hash = b.content_hash)
        |ORDER BY b.doc_id""".stripMargin
  )
}
