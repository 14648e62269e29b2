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

/** Extracted features for one decoded image: true codec-reported
  * dimensions plus EXACT per-channel pixel sums (integers, so the
  * oracle compare has no float hazard). */
case class MediaFeatures(doc_id: Long, n_bytes: Long, width: Int,
    height: Int, sum_r: Long, sum_g: Long, sum_b: Long)

/** Multimodal-column operators (SURVEY.md §2.J).
  *
  * Design: media = `binary` column + typed metadata struct. The fixture
  * ships no image bytes, so `imageTable` PLANTS real PNGs — encoded
  * with the pure-JDK `javax.imageio` codec from a checkerboard pattern
  * derived arithmetically from `doc_id` — and `extractFeatures` decodes
  * them back with the same codec. Both halves are REAL image I/O; the
  * planted pattern exists so DuckDB can recompute the decoded
  * width/height/channel sums in closed form (see `oracleSql`), making
  * the decode itself hash-checkable.
  *
  * Scale: decode runs via `mapPartitions` so per-partition codec init
  * (`ImageIO.setUseCache(false)` here; a JNI context for exotic codecs)
  * happens once per partition, not per row; the blobs stream through a
  * lazy iterator with no driver collection; metadata-only queries never
  * deserialize blobs (parquet column pruning drops the binary column at
  * scan time). In production the encode half disappears — blobs arrive
  * from storage — and the decode half is unchanged.
  */
object Multimodal {

  /** Planted-image parameters for doc `d` — the single source of truth
    * shared by the Spark encoder and the DuckDB oracle. Checkerboard of
    * two doc-derived colors: pixel (x,y) gets `colorA` when (x+y) is
    * even, else `colorB`. Dims stay small (≤ 23×19) so planting is
    * cheap at any SF. */
  private[graft] def plantedDims(d: Long): (Int, Int) =
    ((d % 16 + 8).toInt, (d % 12 + 8).toInt)
  private[graft] def plantedColorA(d: Long): (Int, Int, Int) =
    (((d * 31 + 7) % 256).toInt, ((d * 57 + 13) % 256).toInt,
      ((d * 89 + 19) % 256).toInt)
  private[graft] def plantedColorB(d: Long): (Int, Int, Int) =
    (((d * 101 + 23) % 256).toInt, ((d * 67 + 29) % 256).toInt,
      ((d * 43 + 37) % 256).toInt)

  /** Encode doc `d`'s planted checkerboard as a REAL PNG via
    * `javax.imageio` (pure JDK, lossless — decode recovers the exact
    * pixel values the oracle predicts). */
  private[ops] def encodePng(d: Long): Array[Byte] = {
    import java.awt.image.BufferedImage
    val (w, h) = plantedDims(d)
    val (ra, ga, ba) = plantedColorA(d)
    val (rb, gb, bb) = plantedColorB(d)
    val rgbA = (ra << 16) | (ga << 8) | ba
    val rgbB = (rb << 16) | (gb << 8) | bb
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, if (((x + y) & 1) == 0) rgbA else rgbB)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Decode one PNG blob and reduce it to exact features: codec-reported
    * dims + per-channel pixel sums. This is the production decode —
    * nothing about it knows the blob was planted. */
  private[ops] def decodeImage(blob: Array[Byte]): (Int, Int, Long, Long, Long) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob))
    require(img != null, "undecodable image blob")
    val (w, h) = (img.getWidth, img.getHeight)
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
        x += 1
      }
      y += 1
    }
    (w, h, sr, sg, sb)
  }

  /** The planted-image corpus: one real PNG per image-typed doc
    * (`doc_id % 3 == 0`, matching `mediaTable`'s media_type cycle).
    * Executor-side generation, no driver involvement. */
  def imageTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    documents(s, dir)
      .filter(pmod($"doc_id", lit(3)) === 0)
      .select($"doc_id").as[Long]
      .mapPartitions { ids =>
        javax.imageio.ImageIO.setUseCache(false) // per-partition codec init
        ids.map(d => (d, encodePng(d)))
      }
      .toDF("doc_id", "blob")
  }

  /** Planted-audio parameters for doc `d` — PCM16 mono at 8 kHz, 20-69
    * samples following a closed-form ramp the DuckDB oracle mirrors. */
  private[graft] def plantedSamples(d: Long): Array[Short] = {
    val n = (d % 50 + 20).toInt
    Array.tabulate(n)(i => ((d * 7 + i.toLong * 13) % 2001 - 1000).toShort)
  }

  /** Encode doc `d`'s planted samples as a REAL WAV container via
    * `javax.sound.sampled` (pure JDK — the audio twin of `encodePng`).
    * PCM is lossless, so decode recovers the exact sample values. */
  private[ops] def encodeWav(d: Long): Array[Byte] = {
    import javax.sound.sampled._
    val samples = plantedSamples(d)
    val bytes = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) { // little-endian PCM16
      bytes(2 * i) = (samples(i) & 0xff).toByte
      bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Decode one WAV blob to exact features: (samples, rate, sum, min,
    * max). Nothing about it knows the blob was planted; it reads the
    * container's own declared format. */
  private[ops] def decodeWav(blob: Array[Byte])
      : (Long, Long, Long, Long, Long) = {
    import javax.sound.sampled._
    val ais = AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(blob))
    val fmt = ais.getFormat
    require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
      !fmt.isBigEndian && fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED,
      s"unsupported audio format: $fmt")
    val raw = ais.readAllBytes()
    val n = raw.length / 2
    var (sum, mn, mx) = (0L, Long.MaxValue, Long.MinValue)
    var i = 0
    while (i < n) {
      val s = ((raw(2 * i + 1).toInt << 8) | (raw(2 * i) & 0xff))
      sum += s; if (s < mn) mn = s; if (s > mx) mx = s
      i += 1
    }
    (n.toLong, fmt.getSampleRate.toLong, sum,
      if (n == 0) 0L else mn, if (n == 0) 0L else mx)
  }

  /** The planted-audio corpus: one real WAV per audio-typed doc
    * (`doc_id % 3 == 1`, matching `mediaTable`'s media_type cycle). */
  def audioTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    documents(s, dir)
      .filter(pmod($"doc_id", lit(3)) === 1)
      .select($"doc_id").as[Long]
      .mapPartitions(ids => ids.map(d => (d, encodeWav(d))))
      .toDF("doc_id", "blob")
  }

  /** §2.J audio feature extraction — REAL codec round trip, fully
    * oracle-checked exactly like `qMediaFeatures`: every column is an
    * exact integer DuckDB recomputes from the planted-sample closed
    * form (PCM is lossless). */
  def qMediaAudio(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    audioTable(s, dir)
      .select($"doc_id", $"blob")
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, blob) =>
          val (n, rate, sum, mn, mx) = decodeWav(blob)
          (id, n, rate, sum, mn, mx)
        }
      }
      .toDF("doc_id", "n_samples", "sample_rate", "sum_s", "min_s", "max_s")
      .orderBy($"doc_id")
  }

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

  /** Feature-extraction pipeline: typed mapPartitions over the planted
    * image corpus, REAL `javax.imageio` decode per blob (per-partition
    * codec init, streaming iterator, no driver collection). */
  def extractFeatures(s: SparkSession, dir: String): Dataset[MediaFeatures] = {
    import s.implicits._
    imageTable(s, dir)
      .select($"doc_id", $"blob")
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false) // per-partition codec init
        rows.map { case (id, blob) =>
          val (w, h, sr, sg, sb) = decodeImage(blob)
          MediaFeatures(id, blob.length.toLong, w, h, sr, sg, sb)
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

  /** §2.J feature extraction as a registry op — REAL codec round trip,
    * fully oracle-checked: every projected column is an exact integer
    * DuckDB recomputes from the planted-pattern arithmetic (PNG is
    * lossless, so decoded sums match the closed form bit-for-bit).
    * `n_bytes` stays out of the projection: the PNG container size is
    * encoder-internal, not part of the decode contract. */
  def qMediaFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    extractFeatures(s, dir).toDF()
      .select($"doc_id",
        $"width".cast("long").as("w"), $"height".cast("long").as("h"),
        $"sum_r", $"sum_g", $"sum_b")
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
    "q_media_audio" -> qMediaAudio _,
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
    // Closed-form twin of the codec round trip: a w×h checkerboard has
    // ceil(w/2)*ceil(h/2) + floor(w/2)*floor(h/2) cells with (x+y)
    // even (colorA), the rest colorB — channel sums follow exactly.
    "q_media_features" ->
      """WITH img AS (
        |  SELECT doc_id,
        |    CAST(doc_id % 16 + 8 AS BIGINT) AS w,
        |    CAST(doc_id % 12 + 8 AS BIGINT) AS h
        |  FROM documents WHERE doc_id % 3 = 0),
        |cnt AS (
        |  SELECT doc_id, w, h,
        |    ((w + 1) // 2) * ((h + 1) // 2) + (w // 2) * (h // 2) AS n_even,
        |    w * h - (((w + 1) // 2) * ((h + 1) // 2) + (w // 2) * (h // 2)) AS n_odd
        |  FROM img)
        |SELECT doc_id, w, h,
        |  n_even * ((doc_id * 31 + 7) % 256) + n_odd * ((doc_id * 101 + 23) % 256) AS sum_r,
        |  n_even * ((doc_id * 57 + 13) % 256) + n_odd * ((doc_id * 67 + 29) % 256) AS sum_g,
        |  n_even * ((doc_id * 89 + 19) % 256) + n_odd * ((doc_id * 43 + 37) % 256) AS sum_b
        |FROM cnt ORDER BY doc_id""".stripMargin,
    // Closed-form twin of the WAV round trip: sample i of doc d is
    // (d*7 + i*13) % 2001 - 1000 over n = d%50+20 samples at 8 kHz.
    "q_media_audio" ->
      """WITH a AS (
        |  SELECT doc_id, CAST(doc_id % 50 + 20 AS BIGINT) AS n
        |  FROM documents WHERE doc_id % 3 = 1),
        |s AS (SELECT doc_id, n, unnest(range(n)) AS i FROM a),
        |v AS (SELECT doc_id, n,
        |        (doc_id * 7 + i * 13) % 2001 - 1000 AS smp FROM s)
        |SELECT doc_id, n AS n_samples, CAST(8000 AS BIGINT) AS sample_rate,
        |  CAST(sum(smp) AS BIGINT) AS sum_s,
        |  CAST(min(smp) AS BIGINT) AS min_s,
        |  CAST(max(smp) AS BIGINT) AS max_s
        |FROM v GROUP BY doc_id, n ORDER BY doc_id""".stripMargin,
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
