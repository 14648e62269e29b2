package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained MATERIALIZED aggregate views — the
  * consumer the change feed exists for (SURVEY.md §2.A; the classic
  * incremental-view-maintenance shape for SUM/COUNT-decomposable
  * aggregates). A view is itself a transactional fleet holding
  * `keys… , cnt, sum_<col>…` plus an `_mv.json` marker recording the
  * SOURCE manifest version it reflects:
  *
  *  - [[create]] runs the one full aggregation and stamps the source
  *    version;
  *  - [[refresh]] reads ONLY the manifest diff since the stamp
  *    ([[FleetCDC.changes]]): inserts contribute +1/+value, deletes
  *    −1/−value, and one small union-aggregate folds the signed delta
  *    into the stored groups (a fully-deleted group's cnt reaches 0
  *    and drops out). The view update lands as a single manifest SWAP
  *    (append + `manifestSwapRemove`), so view readers see the old or
  *    the new state, never both, and the update never self-reads a
  *    truncated directory.
  *
  * Scale: refresh cost is O(changed bytes) + O(view), never a source
  * re-scan — "maintain yesterday's per-key revenue rollup" on a
  * 100 TB fleet costs the day's delta. COUNT/SUM (and anything
  * derivable: AVG = sum/cnt) are exactly the self-maintainable
  * aggregates; MIN/MAX are not (a deleted extremum needs a re-scan by
  * definition) and are deliberately out of scope. Doubles fold
  * associatively only approximately — an incremental sum can differ
  * from a cold recompute in the last ulps, which is inherent to IVM
  * on floats (round at presentation, as the registry queries do). */
object FleetMV {

  val MarkerFile = "_mv.json"

  /** One maintenance step's cost surface: the version span folded in
    * and how many changed files the diff read touched. */
  final case class RefreshResult(fromVersion: Long, toVersion: Long,
      changedFiles: Int)

  private def fsOf(s: SparkSession, dir: String): (Path, FileSystem) = {
    val p = new Path(dir)
    (p, p.getFileSystem(s.sessionState.newHadoopConf()))
  }

  private def sourceVersion(fs: FileSystem, p: Path): Long =
    FleetManifest.current(fs, p).map(_.version).getOrElse(
      throw new IllegalArgumentException(
        s"FleetMV needs a TRANSACTIONAL source fleet (committed " +
          s"_manifest) at $p — legacy raw-listing fleets have no " +
          "change feed to maintain from"))

  private def readStamp(fs: FileSystem, viewP: Path): Option[Long] = {
    val m = new Path(viewP, MarkerFile)
    if (!fs.exists(m)) None
    else {
      val in = fs.open(m)
      val text = try new String(in.readAllBytes(), "UTF-8")
        finally in.close()
      (org.json4s.jackson.JsonMethods.parse(text) \ "sourceVersion") match {
        case org.json4s.JInt(v) => Some(v.toLong)
        case _ => None
      }
    }
  }

  private def writeStamp(fs: FileSystem, viewP: Path, v: Long): Unit = {
    val tmp = new Path(viewP, s".$MarkerFile.tmp")
    val out = fs.create(tmp, true)
    try out.write(org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(org.json4s.JObject(
        "sourceVersion" -> org.json4s.JInt(v)))).getBytes("UTF-8"))
    finally out.close()
    val dest = new Path(viewP, MarkerFile)
    fs.delete(dest, false)
    if (!fs.rename(tmp, dest)) { fs.delete(tmp, false); () }
  }

  private def aggShape(df: DataFrame, keys: Seq[String],
      sumCols: Seq[String], sign: org.apache.spark.sql.Column)
      : DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(sum(sign).as("cnt"),
        sumCols.map(c => sum(sign * col(c)).as(s"sum_$c")): _*)

  /** Full build: aggregate the CURRENT source snapshot and stamp its
    * version. */
  def create(s: SparkSession, srcDir: String, viewDir: String,
      keys: Seq[String], sumCols: Seq[String]): RefreshResult = {
    require(keys.nonEmpty, "a view needs at least one group key")
    val (srcP, fs) = fsOf(s, srcDir)
    val v = sourceVersion(fs, srcP)
    val full = aggShape(s.read.format("graft-avro").load(srcDir),
      keys, sumCols, lit(1L))
    full.write.format("graft-avro").mode("overwrite").save(viewDir)
    writeStamp(fs, new Path(viewDir), v)
    RefreshResult(v, v, 0)
  }

  /** Incremental maintenance: fold the manifest diff since the last
    * stamp into the stored groups. No-op when the source hasn't
    * advanced. */
  def refresh(s: SparkSession, srcDir: String, viewDir: String,
      keys: Seq[String], sumCols: Seq[String]): RefreshResult = {
    val (srcP, fs) = fsOf(s, srcDir)
    val (viewP, _) = fsOf(s, viewDir)
    val v0 = readStamp(fs, viewP).getOrElse(
      throw new IllegalStateException(
        s"no $MarkerFile at $viewDir — create() the view first"))
    val v1 = sourceVersion(fs, srcP)
    if (v1 == v0) return RefreshResult(v0, v1, 0)
    require(v1 > v0, s"source went backwards? view at $v0, source $v1")
    val from = FleetManifest.snapshotAt(fs, srcP, v0).getOrElse(
      throw new IllegalStateException(
        s"view stamp $v0 expired at the source — too-aggressive " +
          "retention (expireVersions) outran refresh; rebuild with " +
          "create()")).files.toSet
    val to = FleetManifest.snapshotAt(fs, srcP, v1).get.files.toSet
    val changedFiles = ((to -- from) ++ (from -- to)).size
    val delta = FleetCDC.changes(s, srcDir, v0, v1)
    val sign = when(col(FleetCDC.ChangeTypeCol) === "insert", lit(1L))
      .otherwise(lit(-1L))
    val deltaAgg = aggShape(delta, keys, sumCols, sign)
    val old = s.read.format("graft-avro").load(viewDir)
    val merged = old.unionByName(deltaAgg)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("cnt")).as("cnt"),
        sumCols.map(c => sum(col(s"sum_$c")).as(s"sum_$c")): _*)
      .filter(col("cnt") =!= 0L)
    // the view update is itself a transactional swap: append the new
    // generation and retire every old view file in ONE manifest
    // commit (the rewrite_files pattern — no self-read of a truncated
    // directory, no reader window over both states)
    val oldNames = FleetManifest.resolve(fs, viewP, None)
      .getOrElse(AvroFleetCommits.dataFileStatuses(fs, viewP))
      .map(_.getPath.getName)
    merged.write.format("graft-avro").mode("append")
      .option("manifestSwapRemove", oldNames.mkString(","))
      .save(viewDir)
    writeStamp(fs, viewP, v1)
    RefreshResult(v0, v1, changedFiles)
  }
}
