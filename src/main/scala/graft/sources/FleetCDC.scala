package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.lit

/** Change-data-feed over a transactional fleet — the manifest DIFF
  * read (SURVEY.md §2.A; the Delta CDF / Iceberg changelog-scan shape
  * at the fleet's natural granularity). Because every
  * [[FleetManifest]] generation is a complete file set and data files
  * are immutable, the NET changes between two committed versions are
  * exactly a set difference over file NAMES:
  *
  *  - files in `to` but not `from` → their rows are the range's
  *    INSERTS (`_change_type = 'insert'`) — appends, plus the
  *    post-image of every copy-on-write rewrite;
  *  - files in `from` but not `to` → their rows are the range's
  *    DELETES (`_change_type = 'delete'`) — metadata-retired files,
  *    plus the pre-image of every rewrite.
  *
  * An UPDATE therefore surfaces as delete(pre-image) + insert
  * (post-image) of the touched FILES — file-granular CDC, the honest
  * contract for a format without per-row lineage: carried-over
  * survivors in a rewritten file appear on both sides with equal
  * images, and a downstream consumer that keys on the row identity
  * reconciles them to no-ops. Changes are NET across the range: a
  * file added and retired strictly inside (fromVersion, toVersion]
  * contributes nothing, by construction of the endpoint diff.
  *
  * Scale: the driver holds O(changed files) names — the DELTA, never
  * the fleet; the two reads are ordinary distributed fleet scans
  * (sidecar skipping, column pruning, and split planning all apply),
  * so "what changed since yesterday" costs the changed bytes, not a
  * table scan. Both generations must still be on disk: run consumers
  * before [[FleetCompact.expireVersions]] retires the `from` side (a
  * GC'd file fails the read loudly — silent loss is never an option).
  */
object FleetCDC {

  val ChangeTypeCol = "_change_type"

  /** The file-name set difference between two committed versions:
    * (added, removed), each sorted. One manifest read per side —
    * shared by [[changes]] and [[FleetMV.refresh]] so a maintenance
    * step computes the diff (and fetches its manifests) exactly
    * once. */
  def fileDiff(s: SparkSession, dir: String, fromVersion: Long,
      toVersion: Long): (Seq[String], Seq[String]) = {
    require(fromVersion < toVersion,
      s"changes need fromVersion < toVersion (got $fromVersion, $toVersion)")
    val p = new Path(dir)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    def snap(v: Long) = FleetManifest.snapshotAt(fs, p, v).getOrElse(
      throw new IllegalArgumentException(
        s"no manifest version $v at $dir (available: " +
          s"${FleetManifest.versions(fs, p).mkString(", ")})"))
    val from = snap(fromVersion).files.toSet
    val to = snap(toVersion).files.toSet
    ((to -- from).toSeq.sorted, (from -- to).toSeq.sorted)
  }

  /** NET row changes from `fromVersion` (exclusive) to `toVersion`
    * (inclusive), as the fleet schema plus a trailing
    * `_change_type` ∈ ('insert','delete') column. */
  def changes(s: SparkSession, dir: String, fromVersion: Long,
      toVersion: Long): DataFrame = {
    val (added, removed) = fileDiff(s, dir, fromVersion, toVersion)
    changesOf(s, dir, added, removed)
  }

  /** The diff read for an already-computed (added, removed) pair. */
  private[sources] def changesOf(s: SparkSession, dir: String,
      added: Seq[String], removed: Seq[String]): DataFrame = {
    // ONE table schema governs both sides — resolved from the whole
    // fleet (schema marker preferred, else the merge of every
    // generation's writer schema), then imposed on the per-file reads
    // so a schema-EVOLVED fleet diffs cleanly: pre-ALTER generations
    // null-fill added columns and answer renamed ones through the
    // alias chain, exactly as a full-fleet read would
    val schema = s.read.format("graft-avro")
      .option("mergeSchema", "true").load(dir).schema
    def side(files: Seq[String], tag: String): DataFrame =
      if (files.isEmpty)
        s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          schema).withColumn(ChangeTypeCol, lit(tag))
      else
        // explicit file paths reach the V2 source as a multi-path load
        // (names never contain commas — the committer's contract), so
        // the diff read IS a normal fleet scan over just those files
        s.read.format("graft-avro")
          .option("mergeSchema", "true").schema(schema)
          .load(files.map(n => s"$dir/$n").mkString(","))
          .withColumn(ChangeTypeCol, lit(tag))
    side(added, "insert").unionByName(side(removed, "delete"))
  }
}
