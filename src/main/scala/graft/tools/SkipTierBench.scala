package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** MEASURED file-skipping comparison for the columnar fleet tier
  * (r20): `ParquetFleet.scan` (sidecar footer-stats pruning BEFORE the
  * read) vs `ParquetFleet.read().filter(...)` (Spark's own pushdown —
  * every file opened, row groups pruned from in-file footers). The
  * SURVEY §8 note argues the tier's value from these numbers plus the
  * structural point they can't show locally: on an object store the
  * unpruned path pays a per-file open + footer round-trip that the
  * sidecar path never issues, so the local ratio is the FLOOR of the
  * win, not its ceiling.
  *
  * Method: replicate lineitem sf0.1 ×N into a committed parquet fleet
  * range-clustered on l_orderkey (one clustered compaction — also
  * timed, it's the maintenance cost that buys the layout), then time a
  * selective key-range agg through both paths, warm min-of-iters,
  * interleaved. Reports pruned/total files alongside the seconds.
  *
  * Usage: runMain graft.tools.SkipTierBench [sfDir] [replicas] [iters] */
object SkipTierBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val replicas = if (args.length > 1) args(1).toInt else 10
    val iters = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.util.GraftSession.defaults(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.sources.ParquetFleet

    val root = graft.util.Scratch.dir("skip_tier_bench")
    val fleet = s"$root/lineitem.parquet"
    val p = new org.apache.hadoop.fs.Path(fleet)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(p, true)

    val base = graft.util.Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_partkey", $"l_suppkey",
        $"l_quantity", $"l_extendedprice", $"l_discount")
    val wide = (0 until replicas).map(i =>
      base.withColumn("l_orderkey",
        $"l_orderkey" + lit(i.toLong * 100000000L))).reduce(_ union _)

    // arrival-order ingest, then the clustered compaction that buys
    // the skip-effective layout (timed: it's the amortized cost)
    ParquetFleet.overwrite(wide.repartition(cpus.toInt), fleet)
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val compactSec = time(ParquetFleet.compact(spark, fleet,
      clusterBy = Seq($"l_orderkey"), numFiles = Some(cpus.toInt)))

    // a selective range: one replica's first ~2% of keys
    val pred = $"l_orderkey" >= 300000000L &&
      $"l_orderkey" <= 300120000L
    val snap = {
      val pp = new org.apache.hadoop.fs.Path(fleet)
      graft.sources.FleetManifest.current(
        pp.getFileSystem(spark.sessionState.newHadoopConf()), pp).get
    }
    val (kept, pruned) = ParquetFleet.pruneFiles(spark, fleet, snap, pred)

    def viaScan() = ParquetFleet.scan(spark, fleet, pred)
      .agg(sum($"l_extendedprice"), count(lit(1))).collect()
    def viaFilter() = ParquetFleet.read(spark, fleet).filter(pred)
      .agg(sum($"l_extendedprice"), count(lit(1))).collect()

    viaScan(); viaFilter() // cold, interleaved
    var sBest = Double.MaxValue
    var fBest = Double.MaxValue
    (1 to iters).foreach { _ =>
      sBest = math.min(sBest, time(viaScan()))
      fBest = math.min(fBest, time(viaFilter()))
    }
    val rows = ParquetFleet.count(spark, fleet)
    println(f"""{"metric":"skip_tier_bench","rows":$rows,""" +
      f""""files":${kept.size + pruned.size},"pruned":${pruned.size},""" +
      f""""compact_sec":$compactSec%.3f,"scan_sec":$sBest%.3f,""" +
      f""""filter_sec":$fBest%.3f,"filter_over_scan":${
        fBest / sBest}%.2f}""")

    // second layout: MANY small files — the object-store regime where
    // per-file opens/footers/tasks dominate; file-level pruning's
    // structural advantage should show even on local disk
    ParquetFleet.compact(spark, fleet,
      clusterBy = Seq($"l_orderkey"), numFiles = Some(256))
    val snap2 = {
      val pp = new org.apache.hadoop.fs.Path(fleet)
      graft.sources.FleetManifest.current(
        pp.getFileSystem(spark.sessionState.newHadoopConf()), pp).get
    }
    val (k2, p2) = ParquetFleet.pruneFiles(spark, fleet, snap2, pred)
    viaScan(); viaFilter()
    var sBest2 = Double.MaxValue
    var fBest2 = Double.MaxValue
    (1 to iters).foreach { _ =>
      sBest2 = math.min(sBest2, time(viaScan()))
      fBest2 = math.min(fBest2, time(viaFilter()))
    }
    println(f"""{"metric":"skip_tier_bench_manyfiles","rows":$rows,""" +
      f""""files":${k2.size + p2.size},"pruned":${p2.size},""" +
      f""""scan_sec":$sBest2%.3f,"filter_sec":$fBest2%.3f,""" +
      f""""filter_over_scan":${fBest2 / sBest2}%.2f}""")
    spark.stop()
  }
}
