package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.json4s.{JArray, JInt, JObject, JString}
import org.json4s.jackson.JsonMethods

/** Positional DELETION VECTORS — the merge-on-read half of the fleet's
  * row-level story (SURVEY.md §1.1; the copy-on-write half is
  * [[FleetMerge]] / [[AvroFleetRowLevel]]).
  *
  * A deletion vector is a tiny sidecar under `_dv/` marking ROWS of
  * one data file as deleted without touching the file: a DELETE that
  * hits 10 rows of a 1 GB container writes kilobytes instead of
  * rewriting the container (the Delta deletion-vector / Iceberg
  * position-delete posture). The manifest snapshot carries the
  * file→vector binding ([[FleetManifest.Snapshot.dvs]]) so
  *
  *  - the binding commits ATOMICALLY with everything else in the
  *    generation (no second marker a crash can split),
  *  - it is VERSIONED for free: `VERSION AS OF` a pre-delete
  *    generation has no `dvs` entry and reads the full file, and
  *  - retiring a file (COW rewrite, compaction, DROP) retires its
  *    vector with it — [[FleetManifest.commit]] inherits `dvs`
  *    forward minus retired files.
  *
  * ROW POSITION = (block sync position, ordinal within block). A
  * reader serving any byte RANGE of a container observes the same
  * (sync, ordinal) for the same record — `sync(start)` aligns to the
  * identical block boundary a sequential read passes — so positions
  * are stable under splitting, which an absolute row ordinal is not
  * (a split reader cannot know how many rows precede its range
  * without reading them). FleetDvSpec pins full-read == split-read
  * position identity.
  *
  * Vector files are IMMUTABLE and content-unique (uuid-suffixed): a
  * delete on an already-vectored file writes a NEW merged vector and
  * swaps the binding in one manifest commit with a compare-and-set on
  * the old binding ([[FleetManifest.commit]] `requireDvs`) — two
  * racing merge-on-read deletes on the same file produce one winner
  * and one loud retryable conflict, never a lost delete. Old vectors
  * remain referenced by old snapshots until retention GCs them with
  * their versions.
  */
private[graft] object FleetDv {

  val DirName = "_dv"

  /** In-memory deleted-position set for ONE data file: block sync
    * position → sorted distinct ordinals within that block. */
  final case class Deleted(positions: Map[Long, Array[Long]]) {
    /** Total deleted rows — lets count-style fast paths stay
      * metadata-only (file row count − deleted). */
    lazy val count: Long = positions.valuesIterator.map(_.length.toLong).sum

    def contains(sync: Long, ordinal: Long): Boolean =
      positions.get(sync).exists(a =>
        java.util.Arrays.binarySearch(a, ordinal) >= 0)

    /** Bag-union with another vector over the same file (positions are
      * sets — a position deleted twice is deleted once). */
    def union(other: Deleted): Deleted = Deleted(
      (positions.keySet ++ other.positions.keySet).iterator.map { s =>
        val merged = (positions.getOrElse(s, Array.empty[Long]) ++
          other.positions.getOrElse(s, Array.empty[Long])).distinct.sorted
        s -> merged
      }.toMap)

    def isEmpty: Boolean = positions.isEmpty
  }

  object Deleted {
    val empty: Deleted = Deleted(Map.empty)

    def of(entries: Iterable[(Long, Long)]): Deleted = Deleted(
      entries.groupBy(_._1).map { case (s, es) =>
        s -> es.map(_._2).toArray.distinct.sorted
      })
  }

  private def dvDir(fleet: Path) = new Path(fleet, DirName)

  /** Write a new immutable vector file for `dataFileName`; returns the
    * vector's name RELATIVE to the fleet directory (the spelling the
    * manifest `dvs` map stores). Content lands complete before the
    * name is ever referenced — the referencing manifest commit is the
    * only publication point, so no torn-read window exists. */
  def write(fs: FileSystem, fleet: Path, dataFileName: String,
      d: Deleted): String = {
    require(!d.isEmpty, s"refusing to write an empty deletion vector " +
      s"for $dataFileName — clear the binding instead")
    val name = s"$DirName/$dataFileName." +
      s"${java.util.UUID.randomUUID().toString.take(8)}.dv.json"
    val dest = new Path(fleet, name)
    fs.mkdirs(dvDir(fleet))
    val json = JObject(
      "file" -> JString(dataFileName),
      "count" -> JInt(BigInt(d.count)),
      "deleted" -> JObject(d.positions.toList.sortBy(_._1).map {
        case (sync, ords) =>
          sync.toString -> (JArray(ords.toList.map(o =>
            JInt(BigInt(o)): org.json4s.JValue)): org.json4s.JValue)
      }))
    val out = fs.create(dest, false)
    try out.write(JsonMethods.compact(JsonMethods.render(json))
      .getBytes("UTF-8"))
    finally out.close()
    name
  }

  /** Read a vector by its manifest-stored relative name. Read/parse
    * failures PROPAGATE (the [[FleetSchemaMarker]] posture: silently
    * resurrecting deleted rows beats nothing — never the reverse). */
  def read(fs: FileSystem, fleet: Path, relName: String): Deleted =
    readPath(fs, new Path(fleet, relName))

  /** Absolute-path read — what a task does with the full vector path
    * its [[AvroFilePartition]] carries. */
  def readPath(fs: FileSystem, p: Path): Deleted = {
    val in = fs.open(p)
    val text = try new String(in.readAllBytes(), "UTF-8")
      finally in.close()
    JsonMethods.parse(text) \ "deleted" match {
      case o: JObject => Deleted(o.obj.map {
        case (sync, JArray(vs)) =>
          sync.toLong -> vs.collect { case JInt(n) => n.toLong }
            .toArray.sorted
        case (sync, other) => throw new java.io.IOException(
          s"malformed deletion vector $p: block $sync = $other")
      }.toMap)
      case other => throw new java.io.IOException(
        s"malformed deletion vector $p: deleted = $other")
    }
  }

  /** Deletion-vector bindings for every transactional-fleet DIRECTORY
    * in a (possibly multi-glob) load path, as FULL data-file path →
    * FULL vector path under the `versionAsOf` (None = current)
    * snapshot. Explicit FILE paths contribute nothing — a surgical
    * per-file load (the CDC image reads) is a RAW read by design. */
  def forPath(s: org.apache.spark.sql.SparkSession, glob: String,
      versionAsOf: Option[Long]): Map[String, String] =
    Avro.splitGlobs(glob).toSeq.flatMap { g =>
      val p = new Path(g)
      val fs = p.getFileSystem(s.sessionState.newHadoopConf())
      Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
        .filter(_.isDirectory).flatMap { d =>
          FleetManifest.snapshotFor(fs, d.getPath, versionAsOf).toSeq
            .flatMap(_.dvs.toSeq.map { case (f, dvRel) =>
              fs.makeQualified(new Path(d.getPath, f)).toString ->
                fs.makeQualified(new Path(d.getPath, dvRel)).toString
            })
        }
    }.toMap

  /** Just the deleted-row count — one tiny JSON read; lets driver-side
    * count math avoid materializing position arrays. */
  def readCount(fs: FileSystem, fleet: Path, relName: String): Long = {
    val in = fs.open(new Path(fleet, relName))
    val text = try new String(in.readAllBytes(), "UTF-8")
      finally in.close()
    JsonMethods.parse(text) \ "count" match {
      case JInt(n) => n.toLong
      case other => throw new java.io.IOException(
        s"malformed deletion vector $relName: count = $other")
    }
  }
}
