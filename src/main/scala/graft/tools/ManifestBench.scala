package graft.tools

import org.apache.spark.sql.SparkSession

/** Manifest COMMIT-COST growth curve (r22, the r21 verdict's #3): how
  * does the cost of one append-commit scale with the number of files
  * already in the fleet? Pre-r22, every version file was a FULL
  * snapshot — rendering + writing O(total files) JSON per commit, so a
  * 10k-file fleet's appends were ~linearly slower than its first.
  * With delta version files the per-append cost must be FLAT.
  *
  * Pure driver-side measurement (manifest commits launch no jobs):
  * grows one fleet to `files` via 1-file append commits and reports
  * the mean commit latency per 1k-file window, plus the bytes of the
  * newest version file. Run both postures:
  *
  *   sbt "runMain graft.tools.ManifestBench 10000"
  *   sbt -Dgraft.manifest.delta=false "runMain graft.tools.ManifestBench 10000"
  *
  * (The JVM prop rides sbt's fork; window means are robust to GC
  * blips at these sub-ms scales.) */
object ManifestBench {
  def main(args: Array[String]): Unit = {
    val files = if (args.length > 0) args(0).toInt else 10000
    val window = 1000
    val spark = graft.util.GraftSession.defaults(SparkSession.builder()
      .master("local[2]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = graft.util.Scratch.dir("manifest_bench")
    val dir = new org.apache.hadoop.fs.Path(s"$root/t.avro")
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(dir)
    val delta = System.getProperty("graft.manifest.delta", "true")
    println(s"[manifestbench] delta=$delta files=$files window=$window")
    var i = 0
    var winNanos = 0L
    while (i < files) {
      val name = f"part-$i%08d.avro"
      val t0 = System.nanoTime()
      graft.sources.FleetManifest.commit(fs, dir,
        base => base :+ name, bootstrap = Seq.empty)
      winNanos += System.nanoTime() - t0
      i += 1
      if (i % window == 0) {
        val vf = graft.sources.FleetManifest.versionFilePath(dir, i.toLong)
        println(f"[manifestbench] files=$i%6d mean_commit_ms=" +
          f"${winNanos / 1e6 / window}%8.3f newest_vfile_bytes=" +
          f"${fs.getFileStatus(vf).getLen}%8d")
        winNanos = 0L
      }
    }
    // one cold full-history probe: the reconstruction cost a fresh
    // process pays for the newest snapshot (chain length bounded by
    // the checkpoint cadence)
    graft.sources.FleetManifest.clearSnapshotCache()
    val t0 = System.nanoTime()
    val cur = graft.sources.FleetManifest.mainCurrent(fs, dir).get
    println(f"[manifestbench] cold current() read: " +
      f"${(System.nanoTime() - t0) / 1e6}%.2f ms " +
      f"(v${cur.version}, ${cur.files.size} files)")

    // the stats-plane twin: sidecar write cost per 1-file commit as
    // the entry count grows (pre-r22: read-merge-rewrite of ONE
    // _stats.json, O(total) per commit; now sharded past 512 entries)
    val sdir = new org.apache.hadoop.fs.Path(s"$root/stats")
    fs.mkdirs(sdir)
    i = 0
    winNanos = 0L
    while (i < files) {
      val entry = Map(f"part-$i%08d.avro" ->
        graft.sources.FleetStats.PartStats(i.toLong, 1L, Map(
          "id" -> graft.sources.FleetStats.ColStat(
            Some(i.toLong), Some(i.toLong), 0L))))
      val t1 = System.nanoTime()
      graft.sources.FleetStats.write(fs, sdir, entry)
      winNanos += System.nanoTime() - t1
      i += 1
      if (i % window == 0) {
        println(f"[manifestbench] stats entries=$i%6d mean_write_ms=" +
          f"${winNanos / 1e6 / window}%8.3f")
        winNanos = 0L
      }
    }
    val t2 = System.nanoTime()
    val n = graft.sources.FleetStats.read(fs, sdir).size
    println(f"[manifestbench] stats full read: " +
      f"${(System.nanoTime() - t2) / 1e6}%.2f ms ($n entries)")
    spark.stop()
  }
}
