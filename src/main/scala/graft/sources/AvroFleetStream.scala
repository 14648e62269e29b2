package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.StructType

import graft.util.SerializableHadoopConf

/** The fleet as a STREAMING SOURCE
  * (`spark.readStream.format("graft-avro").load(dir)`): each
  * micro-batch is the set of container files that appeared since the
  * last offset — the natural dual of the `foreachBatch` fleet sink, so
  * a fleet landing zone feeds a downstream streaming job directly
  * (land → stream → transform → land, all on the same directory
  * contract).
  *
  * Offsets: a [[FleetSourceOffset]] is the ordered list of file paths
  * the stream has admitted — file sets difference cleanly, recovery is
  * exact (the offset log replays the same batch from the same file
  * list), and admission order is deterministic ((mtime, path) sort, so
  * a restart discovers files in the order they landed, ties by name).
  * Past `offsetInlineLimit` files (default 1000) the list COMPACTS to
  * a content-addressed MANIFEST under the query's own checkpoint
  * directory and the logged offset becomes a pointer — the seen-files
  * log Spark's FileStreamSource keeps, so the offset log stays O(1)
  * per batch at any fleet size. The manifest is keyed by the MD5 of
  * its content, so re-serializing the same offset (or replaying a
  * batch) rewrites the identical file — idempotent by construction —
  * and offset EQUALITY always compares the resolved file list, never
  * the representation.
  *
  * Discovery contract: a file is admitted once its FINAL name exists
  * (the V2 committer's task-commit rename is atomic); the batch-side
  * `_SUCCESS` gate is deliberately not required — a streaming tail
  * reads a LIVE directory, where job-level completeness is never
  * available. Files are assumed immutable once named (the fleet
  * protocol) and never admitted twice.
  *
  * Column pruning reaches the per-file readers exactly as in batch
  * (the stream is built from the pruned scan); pushed filters
  * row-filter inside the reader. AvailableNow snapshots the listing
  * ONCE at query start ([[SupportsTriggerAvailableNow]]) so a bounded
  * replay cannot chase late arrivals.
  */
private[sources] class AvroFleetMicroBatchStream(tableSchema: StructType,
    columns: Array[String], path: String, maxFileBytes: Long,
    filters: Array[org.apache.spark.sql.sources.Filter],
    conf: SerializableHadoopConf,
    maxFilesPerTrigger: Option[Int] = None,
    evolve: Boolean = false,
    checkpointLocation: String = "",
    offsetInlineLimit: Int = 1000)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private val store: Option[FleetSourceOffset.ManifestStore] =
    if (checkpointLocation.isEmpty) None
    else Some(new FleetSourceOffset.ManifestStore(checkpointLocation,
      offsetInlineLimit, conf))

  private def fs = new org.apache.hadoop.fs.Path(path)
    .getFileSystem(conf.value)

  /** Live listing, tolerant of a not-yet-created directory, in
    * deterministic (mtime, path) admission order. */
  private def listNow(): Seq[org.apache.hadoop.fs.FileStatus] = {
    val p = new org.apache.hadoop.fs.Path(path)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".avro") &&
        !st.getPath.getName.startsWith(".") &&
        !st.getPath.getName.startsWith("_"))
      .sortBy(st => (st.getModificationTime, st.getPath.toString))
  }

  @volatile private var availableNowCap: Option[Seq[String]] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(listNow().map(_.getPath.toString))

  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(ReadLimit.maxFiles).getOrElse(
      ReadLimit.allAvailable())

  override def initialOffset(): Offset =
    FleetSourceOffset(Seq.empty, store)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-controlled source: latestOffset(start, limit) is used")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val seen = FleetSourceOffset.of(start, store).files
    val now = availableNowCap.getOrElse(listNow().map(_.getPath.toString))
    val fresh = now.filterNot(seen.toSet)
    val admitted = limit match {
      case mf: org.apache.spark.sql.connector.read.streaming.ReadMaxFiles =>
        fresh.take(mf.maxFiles())
      case _ => fresh
    }
    FleetSourceOffset(seen ++ admitted, store)
  }

  override def reportLatestOffset(): Offset =
    FleetSourceOffset(listNow().map(_.getPath.toString), store)

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val before = FleetSourceOffset.of(start, store).files.toSet
    val batch = FleetSourceOffset.of(end, store).files.filterNot(before)
    val f = fs
    // tolerate files unlinked AFTER admission (metadata-only DELETE,
    // TRUNCATE, compaction run on the same live directory): a missing
    // admitted file must skip with a warning, not wedge the stream —
    // replaying the same offset range would hit the same missing file
    // forever (FileStreamSource's ignoreMissingFiles posture)
    val statuses = batch.flatMap { p =>
      try Some(f.getFileStatus(new org.apache.hadoop.fs.Path(p)))
      catch {
        case _: java.io.FileNotFoundException =>
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"admitted fleet file vanished before read, skipping: $p")
          None
      }
    }
    AvroFleetScan.planSplits(statuses, maxFileBytes)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new AvroFleetReaderFactory(tableSchema, columns, None, filters, conf,
      evolve = evolve)

  override def deserializeOffset(json: String): Offset =
    FleetSourceOffset.fromJson(json, store)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

/** Epoch-keyed streaming sink commit — see the `toStreaming` scaladoc
  * in [[AvroFleetWriteBuilder]]. The per-epoch commit is the batch
  * commit's shape (sidecar stats merged, `_SUCCESS` re-marked last);
  * abort deletes the epoch's tag-matched files so a failed epoch
  * leaves the previous generations complete, and the epoch's retry
  * re-lands them. */
private[sources] class AvroFleetStreamingWrite(schemaJson: String,
    schema: StructType, dir: String, codec: String)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {

  import org.apache.spark.sql.connector.write.{PhysicalWriteInfo, WriterCommitMessage}

  private def fleetFs = new org.apache.hadoop.fs.Path(dir)
    .getFileSystem(SparkSession.active.sessionState.newHadoopConf())

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.streaming
        .StreamingDataWriterFactory = {
    val conf = new SerializableHadoopConf(
      SparkSession.active.sessionState.newHadoopConf())
    fleetFs.mkdirs(new org.apache.hadoop.fs.Path(dir))
    val names = schema.fields.map(_.name)
    val types = schema.fields.map(_.dataType)
    val sj = schemaJson
    val d = dir
    val c = codec
    new org.apache.spark.sql.connector.write.streaming
        .StreamingDataWriterFactory {
      override def createWriter(partitionId: Int, taskId: Long,
          epochId: Long)
          : org.apache.spark.sql.connector.write.DataWriter[
            org.apache.spark.sql.catalyst.InternalRow] =
        new AvroFleetDataWriter(sj, names, types, d, partitionId,
          taskId, s"e$epochId", conf, c, strictExisting = true)
    }
  }

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    AvroFleetCommits.commitFleet(fleetFs,
      new org.apache.hadoop.fs.Path(dir), messages)

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    // exact epoch tag: "-e1" must not match "-e10"/"-e12"
    AvroFleetCommits.abortFleet(fleetFs,
      new org.apache.hadoop.fs.Path(dir),
      n => n.contains(s"-e$epochId.avro") ||
        n.contains(s"-e$epochId-attempt"))
}

/** Offset = the ordered list of admitted file paths. Serializes as an
  * inline JSON array up to the inline limit; beyond it the list lands
  * in a content-addressed manifest file (idempotent: same content →
  * same name) and the logged JSON is a pointer — see the stream
  * scaladoc. Equality/hashCode are on the RESOLVED list only, so the
  * two representations of one offset compare equal. */
private[sources] class FleetSourceOffset(val files: Seq[String],
    store: Option[FleetSourceOffset.ManifestStore] = None)
    extends Offset {

  override def json(): String = store match {
    case Some(st) if files.size > st.inlineLimit => st.write(files)
    case _ =>
      org.json4s.jackson.JsonMethods.compact(
        org.json4s.jackson.JsonMethods.render(
          org.json4s.JArray(files.map(org.json4s.JString(_)).toList)))
  }

  override def equals(o: Any): Boolean = o match {
    case f: FleetSourceOffset => f.files == files
    case _ => false
  }
  override def hashCode(): Int = files.hashCode()
}

private[sources] object FleetSourceOffset {

  def apply(files: Seq[String],
      store: Option[ManifestStore] = None): FleetSourceOffset =
    new FleetSourceOffset(files, store)

  /** Content-addressed seen-files manifests under the query's own
    * checkpoint directory (they share the checkpoint's lifetime). */
  final class ManifestStore(checkpointLocation: String,
      val inlineLimit: Int,
      hconf: SerializableHadoopConf) {
    private def dirPath = new org.apache.hadoop.fs.Path(
      checkpointLocation, "graft-manifests")
    private def mfs = dirPath.getFileSystem(hconf.value)

    /** Write (idempotently) and return the pointer JSON. */
    def write(files: Seq[String]): String = {
      val body = files.mkString("\n")
      val tag = java.security.MessageDigest.getInstance("MD5")
        .digest(body.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      val f = mfs
      f.mkdirs(dirPath)
      val dest = new org.apache.hadoop.fs.Path(dirPath, s"$tag.list")
      if (!f.exists(dest)) {
        val tmp = new org.apache.hadoop.fs.Path(dirPath, s".$tag.list.tmp")
        val out = f.create(tmp, true)
        try out.write(body.getBytes("UTF-8")) finally out.close()
        if (!f.rename(tmp, dest) && !f.exists(dest))
          throw new java.io.IOException(s"manifest commit failed: $dest")
      }
      org.json4s.jackson.JsonMethods.compact(
        org.json4s.jackson.JsonMethods.render(org.json4s.JObject(
          "manifest" -> org.json4s.JString(dest.toString),
          "n" -> org.json4s.JInt(files.size))))
    }

    def read(manifestPath: String): Seq[String] = {
      val f = mfs
      val in = f.open(new org.apache.hadoop.fs.Path(manifestPath))
      val body = try new String(in.readAllBytes(), "UTF-8")
        finally in.close()
      if (body.isEmpty) Seq.empty else body.split("\n").toSeq
    }
  }

  def fromJson(json: String,
      store: Option[ManifestStore]): FleetSourceOffset =
    org.json4s.jackson.JsonMethods.parse(json) match {
      case org.json4s.JArray(vs) =>
        FleetSourceOffset(
          vs.collect { case org.json4s.JString(s) => s }, store)
      case obj: org.json4s.JObject =>
        (obj \ "manifest") match {
          case org.json4s.JString(path) =>
            val st = store.getOrElse(throw new IllegalStateException(
              s"manifest offset without a checkpoint-backed store: $json"))
            FleetSourceOffset(st.read(path), store)
          case _ => throw new IllegalArgumentException(
            s"malformed fleet stream offset: $json")
        }
      case _ => throw new IllegalArgumentException(
        s"malformed fleet stream offset: $json")
    }

  def of(o: Offset, store: Option[ManifestStore] = None)
      : FleetSourceOffset = o match {
    case f: FleetSourceOffset => f
    case other => fromJson(other.json(), store)
  }
}
