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
  * implements that shape: the store is materialized once per corpus
  * generation to scratch parquet (build-once/query-many, same pattern
  * as the IVF index), and each "ingest" is
  *   (1) in-batch winner-pick (keep the lowest doc_id per hash), then
  *   (2) one anti-join against the store.
  *
  * Scale: the anti-join shuffles on the content hash — a uniformly
  * distributed key, so no skew by construction. At 100 TB the store is
  * billions of rows; the refinements that keep the check cheap are
  * (a) BUCKET the store by hash so each ingest shuffles only the batch
  * side (the store side is pre-bucketed — see `q_join_bucketed` for the
  * mechanism), and (b) store the 64-bit xxhash prefix alongside the
  * full sha256 so the join key is an 8-byte long and the full hash is
  * only compared on prefix hits. Both change layout, not semantics.
  *
  * The batch split (doc_id % 4 == 0 = "new arrivals") is a fixture
  * convention mirrored exactly by the oracle.
  */
object IncrementalOps {

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

  private val stores = new java.util.concurrent.ConcurrentHashMap[
    String, (String, org.apache.spark.sql.types.StructType)]()

  /** The persisted fingerprint store: distinct content hashes of the
    * EXISTING corpus (doc_id % 4 != 0), one scratch-parquet write per
    * (dir, fixture-generation). Later ingests read the flat store scan
    * and pay zero rebuild work. */
  private[graft] def fingerprintStore(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cacheKey = s"$dir@${docsFingerprint(s, dir)}"
    val (path, schema) = stores.computeIfAbsent(cacheKey, _ => {
      val store = documents(s, dir)
        .filter(pmod($"doc_id", lit(4)) =!= 0)
        .select(sha2(lower(trim($"text")), 256).as("content_hash"))
        .distinct()
      val key = dir.replaceAll("[^A-Za-z0-9._-]", "-").takeRight(32) + "_" +
        java.security.MessageDigest.getInstance("MD5")
          .digest(cacheKey.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val out = graft.util.Scratch.dir(s"fp_store_$key")
      store.write.mode("overwrite").parquet(out)
      (out, store.schema)
    })
    s.read.schema(schema).parquet(path)
  }

  /** §2.J incremental dedup: admit only new-batch docs whose content is
    * (a) the first occurrence WITHIN the batch (lowest doc_id wins) and
    * (b) absent from the fingerprint store. Output is the admitted
    * docs — exactly the rows a production ingest would append to both
    * the corpus and the store. */
  def qDedupIncremental(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val batch = documents(s, dir)
      .filter(pmod($"doc_id", lit(4)) === 0)
      .select($"doc_id", sha2(lower(trim($"text")), 256).as("content_hash"))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"content_hash").orderBy($"doc_id")))
      .filter($"rn" === 1)
      .drop("rn")
    batch.join(fingerprintStore(s, dir), Seq("content_hash"), "left_anti")
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
