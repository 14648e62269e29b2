package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source => V1Source}
import org.apache.spark.sql.types.StructType

/** DECLARATIVE keyed change-feed stream (r18, the r17 verdict's #4):
  *
  * {{{
  * spark.readStream.format("graft-avro")
  *   .option("readChangeFeed", "true")
  *   .option("cdcKeyCols", "id")           // ← this source
  *   .load(dir)
  * }}}
  *
  * Each micro-batch is [[FleetCDC.reconcileKeyed]] applied to the
  * version-range endpoint diff — NET per-key changes (`insert` /
  * `delete` / `update_preimage` / `update_postimage`, carried-over
  * rewrite survivors suppressed) — so a PLAIN `writeStream` sink
  * consumes what previously needed the foreachBatch + reconcileKeyed
  * recipe. Exactly-once rides the same manifest-version offsets as the
  * file-granular feed.
  *
  * WHY V1: the reconciliation is a per-batch JOIN (pre-images against
  * post-images on the key), which no DSv2 scan can express — a scan
  * only produces partitions. Spark's V1 `Source.getBatch` returns a
  * DataFrame, the escape hatch its own FileStreamSource uses; the
  * provider advertises it by DROPPING the MICRO_BATCH_READ capability
  * when `cdcKeyCols` is set, and the analyzer's documented fallback
  * routes the query here. Per-batch cost is the diff read plus one
  * keyed shuffle of the CHANGED rows — O(changed bytes), never the
  * fleet — identical to what the foreachBatch recipe paid.
  *
  * Offsets are manifest versions (`{"cdcVersion": N}`), binary-
  * compatible with [[FleetCdcOffset]]; a fresh checkpoint starts at
  * the CURRENT version, `startingVersion` replays history, and an
  * expired pending range fails loudly exactly like the file-granular
  * feed (same snapshot resolution underneath). */
private[sources] class AvroFleetCdcKeyedSource(sqlContext: SQLContext,
    path: String, keyCols: Seq[String], declaredSchema: StructType,
    startingVersion: Option[Long], branch: Option[String])
    extends V1Source {

  require(keyCols.nonEmpty, "cdcKeyCols needs at least one column")

  private def p = new Path(path)
  private def fs = p.getFileSystem(
    sqlContext.sparkSession.sessionState.newHadoopConf())

  override def schema: StructType = declaredSchema

  private def currentVersion(): Long = branch match {
    case Some(b) =>
      FleetManifest.branchHead(fs, p, b).map(_.version).getOrElse(
        throw new IllegalStateException(
          s"readChangeFeed: no branch '$b' at $path (published or " +
            "dropped?) — a branch feed ends with its branch"))
    case None =>
      val vs = FleetManifest.versions(fs, p)
      if (vs.isEmpty) throw new IllegalStateException(
        s"readChangeFeed: fleet at $path has no manifest history — " +
          "only transactionally-committed fleets have a change feed")
      vs.last
  }

  // a fresh checkpoint starts at the CURRENT version (only future
  // commits stream) unless startingVersion replays history — resolved
  // once so repeated offset calls cannot slide the start forward
  private lazy val initialVersion: Long =
    startingVersion.getOrElse(currentVersion())

  /** Latest available = the current manifest version. Under
    * `Trigger.AvailableNow` the engine's V1 fallback snapshots this
    * once and runs a single draining batch — exactly the per-version
    * endpoint-diff semantics this feed wants (a version range nets in
    * one diff regardless of batching). */
  override def getOffset: Option[V1Offset] = {
    val cur = math.max(currentVersion(), initialVersion)
    Some(org.apache.spark.sql.execution.streaming.runtime
      .SerializedOffset(FleetCdcOffset(cur).json()))
  }

  private def versionOf(o: V1Offset): Long =
    FleetCdcOffset.fromJson(o.json()).version

  override def getBatch(start: Option[V1Offset], end: V1Offset)
      : DataFrame = {
    val v0 = start.map(versionOf).getOrElse(initialVersion)
    val v1 = versionOf(end)
    val s = sqlContext.sparkSession
    val net =
      if (v1 <= v0)
        FleetCDC.reconcileKeyed(
          s.createDataFrame(s.sparkContext
            .emptyRDD[org.apache.spark.sql.Row],
            StructType(declaredSchema.filterNot(
              _.name == FleetCDC.ChangeTypeCol)))
            .withColumn(FleetCDC.ChangeTypeCol,
              org.apache.spark.sql.functions.lit("insert")), keyCols)
      else {
        val snapAt = (v: Long) =>
          if (v == 0L) None
          else Some(FleetManifest.snapshotAtRef(fs, p, v, branch)
            .getOrElse(throw new IllegalStateException(
              s"readChangeFeed: manifest version $v at $path was " +
                "expired by retention while the stream was down — " +
                "re-seed the consumer from a full scan")))
        val fromS = snapAt(v0)
        val toS = snapAt(v1)
        val from = fromS.map(_.files.toSet).getOrElse(Set.empty)
        val to = toS.map(_.files.toSet).getOrElse(Set.empty)
        val dvFrom = fromS.map(_.dvs).getOrElse(Map.empty)
        val dvTo = toS.map(_.dvs).getOrElse(Map.empty)
        val (grown, shrunk) = (fromS, toS) match {
          case (Some(f0), Some(t0)) => FleetCDC.routeDvChanges(fs, p,
            f0, t0, from.intersect(to),
            s"readChangeFeed at $path v$v0..v$v1")
          case _ => (Nil, Nil)
        }
        FleetCDC.reconcileKeyed(
          FleetCDC.changesOf(s, path, (to -- from).toSeq.sorted,
            (from -- to).toSeq.sorted, dvFrom, dvTo, grown, shrunk),
          keyCols)
      }
    // V1 contract: the per-batch plan must carry isStreaming — see
    // GraftStreamingShim (the FileStreamSource stamp)
    org.apache.spark.sql.GraftStreamingShim.asStreamingBatch(net)
  }

  override def commit(end: V1Offset): Unit = ()

  override def stop(): Unit = ()
}
