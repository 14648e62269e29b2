package graft

import org.apache.spark.sql.functions._

/** Columnar (parquet) data-file tier over the fleet manifest
  * (ParquetFleet, r20): committed appends/overwrites, vectorized
  * snapshot reads, merge-on-read deletes by `_metadata.row_index`
  * vectors, time travel, binding merge across deletes, and the
  * concurrent-delete compare-and-set. */
class ParquetFleetSpec extends SparkSpec {
  import graft.sources.ParquetFleet

  private def stage(tagName: String): String = {
    import spark.implicits._
    val root = graft.util.Scratch.dir(s"pqfleet_$tagName")
    val dir = s"$root/t.parquet"
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(p, true)
    ParquetFleet.overwrite(
      spark.range(100).select($"id", ($"id" * 2).as("v"))
        .repartitionByRange(4, $"id"), dir)
    dir
  }

  private def manifest(dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    graft.sources.FleetManifest.current(
      p.getFileSystem(spark.sessionState.newHadoopConf()), p).get
  }

  test("append and overwrite are manifest commits; reads resolve the snapshot") {
    import spark.implicits._
    val dir = stage("commits")
    assert(manifest(dir).version == 1L)
    assert(ParquetFleet.read(spark, dir).count() == 100)
    ParquetFleet.append(
      spark.range(100, 120).select($"id", ($"id" * 2).as("v")), dir)
    assert(manifest(dir).version == 2L)
    assert(ParquetFleet.read(spark, dir).count() == 120)
    // time travel: v1 still reads the pre-append set
    assert(ParquetFleet.read(spark, dir, Some(1L)).count() == 100)
    // overwrite resets wholesale; history keeps serving
    ParquetFleet.overwrite(
      spark.range(5).select($"id", ($"id" * 2).as("v")), dir)
    assert(ParquetFleet.read(spark, dir).count() == 5)
    assert(ParquetFleet.read(spark, dir, Some(2L)).count() == 120)
  }

  test("append refuses a divergent schema loudly; overwrite replaces it") {
    import spark.implicits._
    val dir = stage("schema")
    val e = intercept[IllegalArgumentException] {
      ParquetFleet.append(
        spark.range(3).select($"id", lit("x").as("note")), dir)
    }
    assert(e.getMessage.contains("schema mismatch"), e.getMessage)
    assert(ParquetFleet.read(spark, dir).count() == 100,
      "a refused append must land nothing")
    ParquetFleet.overwrite(
      spark.range(3).select($"id", lit("x").as("note")), dir)
    assert(ParquetFleet.read(spark, dir).columns.toSeq ==
      Seq("id", "note"))
  }

  test("MOR delete: zero data files touched, row-index vectors bound, exact rows, history travels") {
    import spark.implicits._
    val dir = stage("mor")
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    def dataFiles() = fs.listStatus(p)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(st => st.getPath.getName -> (st.getModificationTime, st.getLen))
      .toMap
    val before = dataFiles()
    ParquetFleet.delete(spark, dir, $"id" % 7 === 3)
    assert(dataFiles() == before,
      "a MOR delete must not touch, add, or remove data files")
    val snap = manifest(dir)
    assert(snap.version == 2L && snap.dvs.nonEmpty,
      s"expected bound vectors: $snap")
    val got = ParquetFleet.read(spark, dir).select($"id")
      .as[Long].collect().toSet
    assert(got == (0L until 100L).filter(_ % 7 != 3).toSet)
    // the pre-delete generation reads FULL
    assert(ParquetFleet.read(spark, dir, Some(1L)).count() == 100)
    // a SECOND delete merges per-file bindings (union, not loss)
    ParquetFleet.delete(spark, dir, $"id" === 0L)
    val got2 = ParquetFleet.read(spark, dir).select($"id")
      .as[Long].collect().toSet
    assert(got2 == (1L until 100L).filter(_ % 7 != 3).toSet,
      s"second delete lost or resurrected rows: ${got2.toSeq.sorted}")
    // re-running a delete is idempotent
    ParquetFleet.delete(spark, dir, $"id" % 7 === 3)
    assert(ParquetFleet.read(spark, dir).count() == got2.size)
  }

  test("concurrent MOR deletes: the binding compare-and-set makes the loser loud") {
    import spark.implicits._
    val dir = stage("race")
    // both deletes plan against v1's (empty) bindings; the first
    // commit binds vectors, so the second's requireDvs mismatches
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val snap1 = graft.sources.FleetManifest.current(fs, p).get
    ParquetFleet.delete(spark, dir, $"id" === 1L)
    // emulate the racer: re-issue a commit claiming snap1's bindings
    val e = intercept[graft.sources.FleetCommitConflictException] {
      graft.sources.FleetManifest.commit(fs, p,
        update = identity, bootstrap = Seq.empty,
        dvUpdate = Map(snap1.files.head -> Some("_dv_parquet/bogus")),
        requireDvs = Map(snap1.files.head ->
          snap1.dvs.get(snap1.files.head)))
    }
    assert(e.getMessage.contains("vector"), e.getMessage)
  }

  test("compact materializes vectors into dense files; history keeps serving; stale compactions conflict") {
    import spark.implicits._
    val dir = stage("compact")
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    ParquetFleet.delete(spark, dir, $"id" % 7 === 3)      // v2 (MOR)
    val snapMor = manifest(dir)
    assert(snapMor.dvs.nonEmpty)
    val expected = (0L until 100L).filter(_ % 7 != 3).toSet
    ParquetFleet.compact(spark, dir)                      // v3 (dense)
    val snap = manifest(dir)
    assert(snap.version == 3L && snap.dvs.isEmpty,
      s"compaction must retire every binding: $snap")
    assert(snap.files.toSet.intersect(snapMor.files.toSet).isEmpty,
      "compaction must swap out every vectored generation file")
    assert(ParquetFleet.read(spark, dir).select($"id")
      .as[Long].collect().toSet == expected)
    // the dense read carries NO anti-join (pure vectorized scan)
    val q = ParquetFleet.read(spark, dir)
    q.collect()
    assert(!q.queryExecution.executedPlan.toString.toLowerCase
      .contains("leftanti"), "a dense fleet must read join-free")
    // prior generations still time-travel (files stay until retention)
    assert(ParquetFleet.read(spark, dir, Some(1L)).count() == 100)
    assert(ParquetFleet.read(spark, dir, Some(2L)).select($"id")
      .as[Long].collect().toSet == expected)
    // a vector-less compact is a no-op commit-wise
    ParquetFleet.compact(spark, dir)
    assert(manifest(dir).version == 3L)
    // a compaction planned against a superseded generation conflicts
    // loudly (requireInBase: its inputs were swapped away)
    val e = intercept[graft.sources.FleetCommitConflictException] {
      graft.sources.FleetManifest.commit(fs, p,
        update = identity, bootstrap = Seq.empty,
        requireInBase = snapMor.files.toSet)
    }
    assert(e.getMessage.contains("no longer in"), e.getMessage)
  }

  test("vectorized reads: parquet scan with pushdown survives the DV anti-join") {
    import spark.implicits._
    val dir = stage("plan")
    ParquetFleet.delete(spark, dir, $"id" === 5L)
    val q = ParquetFleet.read(spark, dir).filter($"v" > 100).agg(sum($"v"))
    val expected = (0L until 100L).filter(i => i != 5L && i * 2 > 100)
      .map(_ * 2).sum
    assert(q.head.getLong(0) == expected)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    // the data scan stays Spark's columnar parquet reader with the
    // filter pushed; the deleted set joins as the anti side
    assert(plan.contains("PushedFilters: [IsNotNull(v), GreaterThan(v,100)]"),
      s"filter not pushed to the parquet scan:\n$plan")
    assert(plan.toLowerCase.contains("leftanti"),
      s"expected the DV anti-join:\n$plan")
  }
}
