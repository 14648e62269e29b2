package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** COLUMNAR (Parquet) DATA-FILE TIER for transactional fleets — the
  * r19 verdict's #2 prototype, driven by a measured gap
  * ([[graft.tools.ScanTierBench]] at 6M-row lineitem, local[32], warm
  * min-of-3: wide 8-col agg 2.5×, narrow 2-col sum 3.4×, filtered scan
  * 3.6× FASTER on Spark's vectorized parquet reader than on the
  * avro-OCF tier's skip-decode path — SURVEY §8 note):
  *
  *  - SAME manifest: every generation is a [[FleetManifest]] commit
  *    (the `_manifest/` protocol, version files, commit lock, CAS
  *    machinery, snapshot pin guard — nothing re-invented). Appends
  *    stage parquet part files under job-tagged names and land as ONE
  *    commit; a crash strands unreferenced files, never a torn read.
  *  - VECTORIZED SCANS: reads resolve the snapshot's file list and go
  *    straight to `spark.read.parquet(files…)` — whole-stage codegen,
  *    column pruning, predicate pushdown, row-group skipping all free.
  *  - MERGE-ON-READ deletes by FILE ROW-INDEX: Spark's parquet reader
  *    exposes `_metadata.row_index` (a stable per-file ordinal), so a
  *    deletion vector is just a parquet file of deleted ordinals per
  *    data file, bound through the manifest's existing `dvs` map with
  *    the same compare-and-set (a racing MOR writer conflicts loudly)
  *    and the same inheritance/retirement rules. A vectored read
  *    LEFT-ANTI-joins the deleted (file, ordinal) set — O(deleted
  *    rows) on the build side, AQE broadcasts it in the typical
  *    surgical-delete regime.
  *  - TIME TRAVEL for free: `read(…, versionAsOf)` resolves any
  *    retained generation with its as-of bindings.
  *
  * PROTOTYPE scope (deliberate): a library-level API (`append` /
  * `overwrite` / `delete` / `read`), not a second DSv2 format — the
  * avro tier keeps the full surface (streams, CDC, SQL row-level,
  * checks, branches); this tier is the scan-optimized data plane a
  * 100 TB analytics fleet would migrate its cold columnar data onto.
  * Each delete writes per-file vectors via ONE distributed
  * `partitionBy(file)` job (positions never collect to the driver). */
private[graft] object ParquetFleet {

  private def fsp(s: SparkSession, dir: String) = {
    val p = new Path(dir)
    (p.getFileSystem(s.sessionState.newHadoopConf()), p)
  }

  private def tag(): String = java.util.UUID.randomUUID().toString
    .replace("-", "").take(8)

  /** Stage `df` as parquet part files inside the fleet directory under
    * job-tagged final names, then publish them as one manifest commit
    * (append or reset). The stage-then-commit shape matches the avro
    * tier: files are invisible until the commit lands. */
  private def write(df: DataFrame, dir: String, reset: Boolean): Unit = {
    val s = df.sparkSession
    val (fs, p) = fsp(s, dir)
    // appends must match the fleet's schema exactly: parquet reads
    // take the first footer's schema, so a silently-divergent append
    // would DROP the new columns (or null the old) on every read —
    // loud beats silent (overwrite replaces the schema wholesale)
    if (!reset) FleetManifest.current(fs, p)
      .filter(_.files.nonEmpty).foreach { cur =>
        val existing = s.read.parquet(s"$dir/${cur.files.head}").schema
        val shape = (st: org.apache.spark.sql.types.StructType) =>
          st.fields.map(f => (f.name, f.dataType)).toSeq
        require(shape(df.schema) == shape(existing),
          s"parquet fleet append schema mismatch at $dir: fleet has " +
            s"${existing.simpleString}, append carries " +
            s"${df.schema.simpleString} — align the columns or " +
            "overwrite to replace the schema")
      }
    fs.mkdirs(p)
    val t = tag()
    val staging = new Path(p, s".staging-$t")
    df.write.parquet(staging.toString)
    val parts = fs.listStatus(staging).toSeq
      .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
      .sortBy(_.getPath.getName)
    val names = parts.zipWithIndex.map { case (st, i) =>
      val n = f"part-$i%05d-$t.parquet"
      if (!fs.rename(st.getPath, new Path(p, n)))
        throw new java.io.IOException(
          s"cannot stage ${st.getPath} as $n in $dir")
      n
    }
    FleetManifest.commit(fs, p,
      update = base => if (reset) names else base ++ names,
      bootstrap = Seq.empty,
      props = if (reset) Map(FleetManifest.SchemaProp -> "") else Map.empty)
    fs.delete(staging, true)
    ()
  }

  def append(df: DataFrame, dir: String): Unit =
    write(df, dir, reset = false)

  def overwrite(df: DataFrame, dir: String): Unit =
    write(df, dir, reset = true)

  private def resolve(s: SparkSession, dir: String,
      versionAsOf: Option[Long]): FleetManifest.Snapshot = {
    val (fs, p) = fsp(s, dir)
    versionAsOf match {
      case Some(v) => FleetManifest.snapshotAt(fs, p, v).getOrElse(
        throw new IllegalArgumentException(
          s"parquet fleet at $dir has no retained version $v"))
      case None => FleetManifest.current(fs, p).getOrElse(
        throw new IllegalArgumentException(
          s"no parquet fleet at $dir (no manifest)"))
    }
  }

  /** The snapshot read: vectorized parquet over the generation's file
    * list, minus its deletion vectors' (file, row-index) positions. */
  def read(s: SparkSession, dir: String,
      versionAsOf: Option[Long] = None): DataFrame = {
    val snap = resolve(s, dir, versionAsOf)
    require(snap.files.nonEmpty,
      s"parquet fleet at $dir v${snap.version} holds no files")
    val paths = snap.files.sorted.map(n => s"$dir/$n")
    val base = s.read.parquet(paths: _*)
    if (snap.dvs.isEmpty) base
    else {
      val withMeta = base
        .withColumn("__file", col("_metadata.file_name"))
        .withColumn("__ridx", col("_metadata.row_index"))
      val dels = snap.dvs.toSeq.sorted.map { case (f, vec) =>
        s.read.parquet(s"$dir/$vec")
          .select(lit(f).as("__file"), col("ridx").as("__ridx"))
      }.reduce(_ union _)
      // left-anti on (file, ordinal): the delete side is O(deleted
      // rows); AQE broadcasts it when small (the surgical regime)
      withMeta.join(dels, Seq("__file", "__ridx"), "left_anti")
        .drop("__file", "__ridx")
    }
  }

  /** MERGE-ON-READ delete: matched rows' (file, row-index) identities
    * land as per-file parquet vectors — data files stay byte-identical,
    * cost tracks the matched rows, history time-travels. One
    * distributed `partitionBy(file)` job writes every touched file's
    * vector (existing bindings union in-plan); the commit swaps
    * bindings under the manifest's per-file compare-and-set. */
  def delete(s: SparkSession, dir: String, condition: Column): Unit = {
    val (fs, p) = fsp(s, dir)
    val snap = resolve(s, dir, None)
    val paths = snap.files.sorted.map(n => s"$dir/$n")
    val withMeta = s.read.parquet(paths: _*)
      .withColumn("__file", col("_metadata.file_name"))
      .withColumn("__ridx", col("_metadata.row_index"))
    // the condition applies to LIVE rows only (already-deleted rows
    // must not re-match; harmless here — re-deleting is idempotent —
    // but the union below must not duplicate ordinals)
    val hits = withMeta.filter(condition)
      .select(col("__file"), col("__ridx"))
    val existing = snap.dvs.toSeq.sorted.map { case (f, vec) =>
      s.read.parquet(s"$dir/$vec")
        .select(lit(f).as("__file"), col("ridx").as("__ridx"))
    }
    val all = (existing :+ hits).reduce(_ union _).distinct()
    if (all.isEmpty) return
    val t = tag()
    val gen = s"$DvDir/gen-$t"
    all.select(col("__file"), col("__ridx").as("ridx"))
      .repartition(col("__file"))
      .write.partitionBy("__file").parquet(s"$dir/$gen")
    // one binding per touched file: the partition directory IS the
    // vector (readable alone); untouched files keep their binding
    val touched = fs.listStatus(new Path(p, gen)).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.startsWith("__file="))
      .map(d => java.net.URLDecoder.decode(
        d.stripPrefix("__file="), "UTF-8") -> s"$gen/$d")
    if (touched.isEmpty) { fs.delete(new Path(p, gen), true); return }
    FleetManifest.commit(fs, p,
      update = identity,
      bootstrap = Seq.empty,
      dvUpdate = touched.map { case (f, v) => f -> Option(v) }.toMap,
      // CAS: the bindings this delete READ (absence included) — a
      // racing MOR delete that swapped a vector conflicts loudly
      requireDvs = touched.map { case (f, _) =>
        f -> snap.dvs.get(f) }.toMap)
    ()
  }

  /** COMPACTION — the `rewrite_files` analog: materialize the bound
    * deletion vectors into DENSE files. Reads the current MOR view,
    * rewrites it as fresh part files, and swaps generations in ONE
    * commit (every old data file out, the dense set in — retired
    * files drop their bindings with them; prior versions keep reading
    * until retention). `requireInBase` + the binding compare-and-set
    * make a concurrent writer or MOR delete conflict loudly instead
    * of losing rows/deletes under the swap. No-op on a vector-less
    * fleet. */
  def compact(s: SparkSession, dir: String): Unit = {
    val (fs, p) = fsp(s, dir)
    val snap = resolve(s, dir, None)
    if (snap.dvs.isEmpty) return
    val t = tag()
    val staging = new Path(p, s".staging-$t")
    read(s, dir).write.parquet(staging.toString)
    val parts = fs.listStatus(staging).toSeq
      .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
      .sortBy(_.getPath.getName)
    val names = parts.zipWithIndex.map { case (st, i) =>
      val n = f"part-$i%05d-$t.parquet"
      if (!fs.rename(st.getPath, new Path(p, n)))
        throw new java.io.IOException(
          s"cannot stage ${st.getPath} as $n in $dir")
      n
    }
    val oldFiles = snap.files.toSet
    FleetManifest.commit(fs, p,
      update = base => base.filterNot(oldFiles) ++ names,
      bootstrap = Seq.empty,
      requireInBase = oldFiles,
      requireDvs = snap.files.map(f => f -> snap.dvs.get(f)).toMap)
    fs.delete(staging, true)
    ()
  }

  val DvDir = "_dv_parquet"
}
