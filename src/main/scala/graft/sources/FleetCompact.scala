package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Fleet compaction — the small-file maintenance pass every long-lived
  * 100 TB fleet needs (SURVEY.md §2.A). Streaming sinks and frequent
  * appends leave a directory of many small object-container files;
  * each costs a task, a file-open, and a sidecar entry, so scan
  * parallelism degrades into scheduling overhead. Compaction rewrites
  * the fleet into ~`targetBytes` files RANGE-CLUSTERED on a key, which
  * does two things at once:
  *
  *  - restores scan granularity (ceil(total/target) right-sized files
  *    instead of thousands of shards), and
  *  - re-establishes skipping power: range partitioning gives every
  *    output file a disjoint `clusterBy` interval, so the sidecar
  *    `_stats.json` written by the V2 commit proves point/range
  *    predicates against whole files again (append-order fleets
  *    interleave keys and their min/max proofs go useless).
  *
  * The rewrite is an immutable copy to `out` (never in-place): at
  * scale the old fleet stays readable until the swap, and a failed
  * compaction leaves nothing half-rewritten. The plan is one range
  * shuffle (`repartitionByRange` samples the key, the scale-standard
  * way to get equal-sized sorted shards) + a per-partition sort, then
  * the normal arbitrated V2 commit (attempt temps, rename-if-absent,
  * sidecar merge, `_SUCCESS` last).
  */
object FleetCompact {

  /** The LIVE bytes of the fleet at `p` — manifest-resolved (current
    * generation only), raw listing for manifest-less dirs. Shard
    * sizing was a raw listing before r22: retired generations kept
    * for `versionAsOf` inflated `totalBytes`, so a re-compaction of a
    * versioned fleet chose ceil(ALL generations / target) shards —
    * profiled as +24 output tasks per warm lap on `q_fleet_compact`,
    * and at 100 TB a maintenance pass sized on dead bytes (the exact
    * thing retention hasn't reclaimed yet). The scan below always read
    * manifest-current; only the sizing disagreed. */
  private def liveBytes(s: SparkSession, p: Path): Long = {
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    FleetManifest.resolve(fs, p, None)
      .getOrElse(fs.listStatus(p).toSeq.filter { st =>
        val n = st.getPath.getName
        st.isFile && !n.startsWith("_") && !n.startsWith(".")
      }).iterator.map(_.getLen).sum
  }

  /** Compact the `graft-avro` fleet at `in` into `out`. Returns the
    * number of output shards chosen (= ceil(live input data bytes /
    * `targetBytes`), floor 1). */
  def compact(s: SparkSession, in: String, out: String,
      targetBytes: Long, clusterBy: String): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    val totalBytes = liveBytes(s, new Path(in))
    val shards = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes)
      .toInt
    s.read.format("graft-avro").load(in)
      .repartitionByRange(shards, col(clusterBy))
      .sortWithinPartitions(clusterBy)
      .write.format("graft-avro").mode("overwrite").save(out)
    shards
  }

  /** Compact while PRESERVING the storage-partitioned layout: a
    * `clusterBy`-written fleet accumulates one file per (task, key)
    * per ingest — compaction must not let keys interleave within a
    * file or the sidecar min==max proof (and with it every
    * exchange-free join) is lost. Same shard sizing, but a hash
    * shuffle ON THE KEY plus the clustered V2 write, so the output is
    * at most (shards × keys-per-shard) files, each still provably
    * single-key; the fleet stays SPJ-able across its whole maintenance
    * lifecycle (SpjSpec pins the post-compaction exchange-free join). */
  def compactClustered(s: SparkSession, in: String, out: String,
      targetBytes: Long, clusterBy: String): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    val totalBytes = liveBytes(s, new Path(in))
    val shards = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes)
      .toInt
    s.read.format("graft-avro").option("clusterBy", clusterBy).load(in)
      .repartition(shards, col(clusterBy))
      .write.format("graft-avro").option("clusterBy", clusterBy)
      .mode("overwrite").save(out)
    shards
  }

  /** What one retention pass removed: the expired manifest versions
    * and the data files no retained generation references anymore. */
  final case class ExpireResult(expiredVersions: Seq[Long],
      deletedFiles: Seq[String])

  /** Snapshot retention for a TRANSACTIONAL fleet ([[FleetManifest]]):
    * keep the newest `keepLast` manifest versions, drop the older
    * version files, and unlink every data file that only expired
    * generations referenced. `versionAsOf` reads of retained versions
    * keep working; reads of expired ones fail with the documented
    * missing-version error. Deletion is precise, not a sweep —
    * candidates are (∪ expired generations' files) − (∪ retained
    * generations' files) — so an in-flight job's task-committed (not
    * yet manifest-committed) files are never touched, at any
    * concurrency. Order matters for crash safety: expired MANIFESTS
    * are removed first, then the newly-unreferenced data files — a
    * crash in between leaves harmless orphans, never a readable
    * version with missing files. */
  def expireVersions(s: SparkSession, dir: String, keepLast: Int)
      : ExpireResult = {
    require(keepLast >= 1, "keepLast must be >= 1")
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(s.sessionState.newHadoopConf())
    // under the manifest commit lock: a concurrent restore/commit
    // must not land between the retained-version scan and the deletes
    // (a restore re-pointing at an expired generation would otherwise
    // leave a CURRENT version whose files this pass just unlinked)
    FleetManifest.withCommitLock(fs, dirPath) {
      val vs = FleetManifest.versions(fs, dirPath)
      // TAGGED versions are pinned: retention keeps them (and their
      // files/vectors) regardless of keepLast — a named ref must stay
      // readable until dropped
      val tagged = FleetManifest.tags(fs, dirPath).map(_._2).toSet
      if (vs.size <= keepLast) ExpireResult(Seq.empty, Seq.empty)
      else {
        val (expirable, keptTail) = vs.splitAt(vs.size - keepLast)
        val (pinned, expired) = expirable.partition(tagged)
        val kept = pinned ++ keptTail
        // BRANCH versions pin their references like tags: a staged
        // write-audit-publish pass must survive main retention until
        // published or dropped
        val keptSnaps = kept.flatMap(v =>
          FleetManifest.snapshotAtMain(fs, dirPath, v).toSeq) ++
          FleetManifest.branchSnapshots(fs, dirPath)
        val expiredSnaps = expired.flatMap(v =>
          FleetManifest.snapshotAtMain(fs, dirPath, v).toSeq)
        val keptFiles = keptSnaps.flatMap(_.files).toSet
        val candidates = expiredSnaps.flatMap(_.files)
          .distinct.filterNot(keptFiles)
        // deletion-vector files GC exactly like data files: a vector
        // referenced only by expired snapshots goes with them (a
        // retained snapshot's binding — even to a retired file's old
        // vector — keeps serving VERSION AS OF). References expand
        // through CHAIN nodes transitively: a kept chain keeps every
        // parent leaf alive, and an expired chain's parents are only
        // candidates when nothing kept reaches them either
        val keptDvs = FleetDv.expandRefs(fs, dirPath,
          keptSnaps.flatMap(_.dvs.values).toSet)
        val dvCandidates = FleetDv.expandRefs(fs, dirPath,
          expiredSnaps.flatMap(_.dvs.values).toSet)
          .toSeq.filterNot(keptDvs)
        // DELTA-chain repair first (r22): a retained version file may
        // be a delta whose base is about to expire — rewrite those as
        // full snapshots (same logical content) BEFORE any deletion,
        // ascending so a kept base materializes before its dependents
        // are examined. Still under the commit lock; a cross-process
        // reader racing this retries its version file once and sees
        // the materialized form.
        val keptSet = kept.toSet
        kept.sorted.foreach(v =>
          FleetManifest.materializeIfChainBroken(fs, dirPath, keptSet, v))
        expired.foreach { v =>
          fs.delete(FleetManifest.versionFilePath(dirPath, v), false)
        }
        val deleted = (candidates ++ dvCandidates).filter { n =>
          val t = new Path(dirPath, n)
          // a columnar-tier deletion vector is a DIRECTORY (one
          // parquet partition per binding), wholly owned by its
          // binding — it GCs recursively; plain files (avro tier
          // data/vectors) keep the non-recursive guard
          if (fs.isDirectory(t)) fs.delete(t, true)
          else fs.delete(t, false)
        }
        ExpireResult(expired, deleted)
      }
    }
  }
}
