package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables._
import graft.util.Determinism._

/** One row of the multimodal table: an opaque binary payload plus typed
  * metadata — the 100 TB layout for image/audio/video corpora (payload
  * stays columnar-compressed in parquet; metadata prunes without
  * touching blobs). */
case class MediaRow(doc_id: Long, media_type: String, blob: Array[Byte],
    width: Int, height: Int, lang: String)

/** Extracted features for one media row. */
case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Long,
    features: Array[Float])

/** Multimodal-column operators (SURVEY.md §2.J).
  *
  * Design: media = `binary` column + typed metadata struct. The fixture
  * has no real image bytes (and this container has no codec libraries),
  * so `mediaTable` synthesizes blobs from document text bytes — the
  * SPARK-SIDE PLUMBING (schema, binary handling, partitioned typed
  * mapPartitions decode, batch shape) is real and tested; only the codec
  * call inside `decodeStub` is a deterministic fake.
  *
  * Scale: decode runs via `mapPartitions` so any per-partition init
  * (a real codec context) happens once per partition, not per row;
  * metadata-only queries never deserialize blobs (parquet column
  * pruning drops the binary column at scan time).
  */
object Multimodal {

  /** Synthesize the multimodal table from `documents` (deterministic). */
  def mediaTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    documents(s, dir).select(
      $"doc_id",
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod($"doc_id", lit(3)) + 1).cast("int")).as("media_type"),
      $"text".cast("binary").as("blob"),
      (pmod($"doc_id", lit(64)) * 16 + 64).cast("int").as("width"),
      (pmod($"doc_id", lit(48)) * 16 + 48).cast("int").as("height"),
      $"lang")
  }

  /** STUB — stands in for a real image/audio decode (codec libs absent
    * in this container). Deterministic: 8 pseudo-features from byte
    * sums over 8 stripes of the blob. A real implementation swaps ONLY
    * this function body for e.g. a JNI codec call; the surrounding
    * partition-wise pipeline is production-shaped. */
  private[ops] def decodeStub(blob: Array[Byte]): Array[Float] = {
    val k = 8
    val out = new Array[Float](k)
    if (blob.nonEmpty) {
      var i = 0
      while (i < blob.length) {
        out(i % k) += (blob(i) & 0xff) / 255.0f
        i += 1
      }
      var j = 0
      while (j < k) { out(j) = out(j) / blob.length * k; j += 1 }
    }
    out
  }

  /** Feature-extraction pipeline: typed mapPartitions over the media
    * table — the real decode shape (per-partition codec init, streaming
    * iterator, no driver collection). Used by tests and `entry`-level
    * smoke; not oracle-checkable (DuckDB can't run the stub). */
  def extractFeatures(s: SparkSession, dir: String): Dataset[MediaFeatures] = {
    import s.implicits._
    mediaTable(s, dir)
      .select($"doc_id", $"media_type", $"blob")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // real impl: init codec context here, once per partition
        rows.map { case (id, mt, blob) =>
          MediaFeatures(id, mt, blob.length.toLong, decodeStub(blob))
        }
      }
  }

  /** §2.J multimodal column query: metadata projection + size guards +
    * blob digests — everything EXCEPT decode, which is exactly the part
    * that is oracle-checkable. */
  def qMultimodal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTable(s, dir)
      .withColumn("meta", struct($"width", $"height", $"lang"))
      .select(
        $"doc_id", $"media_type",
        octet_length($"blob").cast("long").as("blob_len"),
        md5($"blob").as("blob_md5"),
        $"meta".getField("width").cast("long").as("w"),
        $"meta".getField("height").cast("long").as("h"),
        ($"meta".getField("width") * $"meta".getField("height") >= 64 * 48)
          .as("size_ok"),
        $"meta".getField("lang").as("lang"))
      .orderBy($"doc_id")
  }

  /** §2.J feature extraction as a registry op (rows-only gate: the
    * decode stub is not expressible in DuckDB). Features serialized as
    * scaled longs — the repo-wide no-raw-arrays discipline. */
  def qMediaFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    extractFeatures(s, dir).toDF()
      .select($"doc_id", $"media_type", $"n_bytes",
        concat_ws("|", transform($"features",
          x => round(x.cast("double") * lit(1000000.0), 0)
            .cast("long").cast("string"))).as("features_q"))
      .orderBy($"doc_id")
  }

  /** §2.J video frame sampling (every 4th synthetic 256-byte "frame"):
    * frame count and byte extents derive from the blob length, so the
    * SAMPLING arithmetic is fully oracle-checked via octet_length;
    * the frame bytes themselves stay Spark-side (binary substr), as a
    * real codec would consume them. Generator-based — one output row
    * per sampled frame, no driver involvement. */
  def qMediaFrameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val fsize = 256L
    val stride = 4L
    mediaTable(s, dir)
      .filter($"media_type" === "video")
      .withColumn("blob_len", octet_length($"blob").cast("long"))
      .filter($"blob_len" > 0)
      .withColumn("n_frames",
        ceil($"blob_len" / lit(fsize.toDouble)).cast("long"))
      .withColumn("frame_idx",
        explode(sequence(lit(0L), $"n_frames" - 1, lit(stride))))
      .select($"doc_id", $"blob_len", $"n_frames", $"frame_idx",
        least(lit(fsize), $"blob_len" - $"frame_idx" * fsize)
          .as("frame_bytes"))
      .orderBy($"doc_id", $"frame_idx")
  }

  /** §2.J image resize planning (fit into 224×224, preserve aspect):
    * pure metadata arithmetic — exactly the part that is
    * oracle-checkable; pixel resampling would live in the decode stub. */
  def qMediaResize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val target = 224.0
    mediaTable(s, dir)
      .filter($"media_type" === "image")
      .withColumn("scale",
        least(lit(target) / $"width", lit(target) / $"height"))
      .select($"doc_id",
        $"width".cast("long").as("w"), $"height".cast("long").as("h"),
        floor($"width" * $"scale").cast("long").as("out_w"),
        floor($"height" * $"scale").cast("long").as("out_h"),
        r6($"scale").as("scale"))
      .orderBy($"doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal" -> qMultimodal _,
    "q_media_features" -> qMediaFeatures _,
    "q_media_frame_sample" -> qMediaFrameSample _,
    "q_media_resize" -> qMediaResize _
  )

  val oracleSql: Map[String, String] = Map(
    "q_multimodal" ->
      """SELECT doc_id,
        |  ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS blob_len,
        |  md5(text) AS blob_md5,
        |  CAST(doc_id % 64 * 16 + 64 AS BIGINT) AS w,
        |  CAST(doc_id % 48 * 16 + 48 AS BIGINT) AS h,
        |  (doc_id % 64 * 16 + 64) * (doc_id % 48 * 16 + 48) >= 64 * 48 AS size_ok,
        |  lang
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_media_frame_sample" ->
      """WITH v AS (
        |  SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS blob_len
        |  FROM documents WHERE doc_id % 3 = 2 AND octet_length(encode(text)) > 0),
        |f AS (SELECT doc_id, blob_len,
        |        CAST(ceil(blob_len / 256.0) AS BIGINT) AS n_frames FROM v)
        |SELECT doc_id, blob_len, n_frames,
        |  unnest(range(0, n_frames, 4)) AS frame_idx,
        |  least(256, blob_len - unnest(range(0, n_frames, 4)) * 256) AS frame_bytes
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,
    "q_media_resize" ->
      """WITH img AS (
        |  SELECT doc_id,
        |    CAST(doc_id % 64 * 16 + 64 AS BIGINT) AS w,
        |    CAST(doc_id % 48 * 16 + 48 AS BIGINT) AS h
        |  FROM documents WHERE doc_id % 3 = 0),
        |sc AS (SELECT doc_id, w, h, least(224.0 / w, 224.0 / h) AS scale FROM img)
        |SELECT doc_id, w, h,
        |  CAST(floor(w * scale) AS BIGINT) AS out_w,
        |  CAST(floor(h * scale) AS BIGINT) AS out_h,
        |  round(scale, 6) AS scale
        |FROM sc ORDER BY doc_id""".stripMargin
  )
}
