package graft

import org.apache.spark.sql.functions._

/** Transactional manifest commits (FleetManifest): snapshot-isolated
  * reads, the copy-on-write generation swap's crash windows, time
  * travel, retention GC, and committer races. */
class FleetManifestSpec extends SparkSpec {

  private def fsOf(dir: String) = new org.apache.hadoop.fs.Path(dir)
    .getFileSystem(spark.sessionState.newHadoopConf())

  private def stage(tag: String, n: Int = 200): String = {
    import spark.implicits._
    val root = graft.util.Scratch.dir(s"manifest_$tag")
    val dir = s"$root/t.avro"
    spark.range(0, n, 1, 4).select($"id", ($"id" * 2).as("v"))
      .write.format("graft-avro").mode("overwrite").save(dir)
    dir
  }

  test("V2 commits publish a manifest; uncommitted files are invisible") {
    val dir = stage("vis")
    val fs = fsOf(dir)
    val p = new org.apache.hadoop.fs.Path(dir)
    val snap = graft.sources.FleetManifest.current(fs, p)
    assert(snap.exists(_.version == 1L), s"want manifest v1, got $snap")
    assert(spark.read.format("graft-avro").load(dir).count() == 200)

    // the crash window an appender leaves when it dies between its
    // task commits and its job (manifest) commit: complete-looking
    // part files on disk that no manifest references — readers must
    // not see them (pre-manifest, a racing reader saw half a job)
    val donor = fs.listStatus(p).filter(st =>
      st.isFile && st.getPath.getName.endsWith(".avro")).head.getPath
    val orphan = new org.apache.hadoop.fs.Path(p, "part-99999-dead.avro")
    org.apache.hadoop.fs.FileUtil.copy(fs, donor, fs, orphan, false,
      spark.sessionState.newHadoopConf())
    assert(spark.read.format("graft-avro").load(dir).count() == 200,
      "task-committed file of a crashed job leaked into a read")

    // the next successful commit must not resurrect the orphan either
    // (bootstrap only applies to manifest-less dirs)
    import spark.implicits._
    spark.range(200, 210, 1, 1).select($"id", ($"id" * 2).as("v"))
      .write.format("graft-avro").mode("append").save(dir)
    assert(spark.read.format("graft-avro").load(dir).count() == 210)
  }

  test("delta version files: exact reconstruction, checkpoints, expiry materialization") {
    import graft.sources.FleetManifest
    val root = graft.util.Scratch.dir("manifest_delta")
    val dir = s"$root/t.avro"
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = fsOf(dir)
    fs.mkdirs(p)
    def raw(v: Long): String = {
      val vp = FleetManifest.versionFilePath(p, v)
      val in = fs.open(vp)
      try new String(in.readAllBytes(), "UTF-8") finally in.close()
    }
    // a mixed 20-commit history driven through the public commit API:
    // appends, a COW swap, dv bind/swap/unbind, props — the shapes the
    // delta encoding must replay exactly
    FleetManifest.commit(fs, p, _ => Seq("a0", "a1"), Seq.empty)   // v1
    (2 to 9).foreach(i => FleetManifest.commit(fs, p,
      base => base :+ s"f$i", Seq.empty,
      props = Map("who" -> s"append$i")))                          // ..v9
    FleetManifest.commit(fs, p,                                    // v10
      base => base.filterNot(_ == "f3") :+ "f3r",
      Seq.empty, requireInBase = Set("f3"))
    FleetManifest.commit(fs, p, identity, Seq.empty,               // v11
      dvUpdate = Map("f4" -> Some("dv_f4_1")),
      dvMetaUpdate = Map("f4" -> FleetManifest.DvMeta(3L,
        Some(Map("id" -> FleetManifest.DvColStat(1L, 9L, 3L))),
        Some(42L))))
    FleetManifest.commit(fs, p, identity, Seq.empty,               // v12
      dvUpdate = Map("f4" -> Some("dv_f4_2"), "f5" -> Some("dv_f5_1")),
      dvMetaUpdate = Map("f4" -> FleetManifest.DvMeta(5L, None, None)))
    FleetManifest.commit(fs, p, identity, Seq.empty,               // v13
      dvUpdate = Map("f4" -> None))
    (14 to 20).foreach(i => FleetManifest.commit(fs, p,
      base => base :+ s"g$i", Seq.empty))                          // ..v20
    // shape: deltas everywhere except v1 (bootstrap full) and the
    // CheckpointEvery-th version (16)
    assert(!raw(1).contains("\"base\""), "v1 must be full (bootstrap)")
    assert(raw(2).contains("\"base\":1"), s"v2 must delta on v1: ${raw(2)}")
    assert(!raw(16).contains("\"base\""), "v16 must be a full checkpoint")
    assert(raw(17).contains("\"base\":16"))
    assert(raw(10).contains("\"removed\":[\"f3\"]"), raw(10))
    // capture every snapshot warm, then force cold-process reads:
    // reconstruction from disk must agree bit-for-bit
    val warm = (1L to 20L).map(v =>
      FleetManifest.snapshotAt(fs, p, v).get)
    FleetManifest.clearSnapshotCache()
    val cold = (1L to 20L).map(v =>
      FleetManifest.snapshotAt(fs, p, v).get)
    assert(warm == cold, "delta reconstruction diverged from warm reads")
    def at(v: Long) = cold(v.toInt - 1)
    assert(at(20).files ==
      Seq("a0", "a1", "f2", "f4", "f5", "f6", "f7", "f8", "f9", "f3r") ++
        (14 to 20).map(i => s"g$i"),
      s"file order not preserved: ${at(20).files}")
    assert(at(11).dvs == Map("f4" -> "dv_f4_1") &&
      at(12).dvs == Map("f4" -> "dv_f4_2", "f5" -> "dv_f5_1") &&
      at(12).dvMeta.get("f4").contains(FleetManifest.DvMeta(5L)) &&
      at(13).dvs == Map("f5" -> "dv_f5_1"),
      "dv delta chain wrong")
    // retention across a delta boundary: keepLast=3 retains v18..v20
    // (all deltas chaining through expired versions) — they must be
    // materialized, still equal, and readable cold after the chain
    // below them is gone
    val res = graft.sources.FleetCompact.expireVersions(spark, dir,
      keepLast = 3)
    assert(res.expiredVersions == (1L to 17L))
    assert(!raw(18).contains("\"base\""),
      "retained v18 must be materialized full (its base expired)")
    assert(raw(19).contains("\"base\":18") && raw(20).contains("\"base\":19"),
      "v19/v20 chain within the retained set and must stay deltas")
    FleetManifest.clearSnapshotCache()
    val after = (18L to 20L).map(v =>
      FleetManifest.snapshotAt(fs, p, v).get)
    assert(after == warm.slice(17, 20),
      "materialized snapshots diverged from their pre-expiry content")
  }

  test("mergeCow swaps generations atomically: no window shows both") {
    import spark.implicits._
    val dir = stage("swap")
    val base = spark.read.format("graft-avro").load(dir)
    assert(base.select(countDistinct($"id")).head.getLong(0) == 200)

    // merge: double v for id < 50 — post-merge count must stay 200 and
    // the manifest at every version must also resolve to exactly 200
    // distinct ids (a both-generations window would show duplicates)
    val res = graft.sources.FleetMerge.mergeCow(spark, dir, "id",
      spark.range(0, 50).select($"id".as("k")),
      touched => touched.withColumn("v",
        when($"id" < 50, $"id" * 4).otherwise($"v")),
      retainOld = true)
    assert(res.touched.nonEmpty && res.written.nonEmpty)

    val fs = fsOf(dir)
    val p = new org.apache.hadoop.fs.Path(dir)
    val versions = graft.sources.FleetManifest.versions(fs, p)
    versions.foreach { v =>
      val cnt = spark.read.format("graft-avro")
        .option("versionAsOf", v.toString).load(dir)
        .select(countDistinct($"id"), count(lit(1))).head
      assert(cnt.getLong(0) == 200 && cnt.getLong(1) == 200,
        s"version $v shows ${cnt.getLong(1)} rows / ${cnt.getLong(0)} " +
          "distinct ids — generation swap leaked")
    }
    // current generation carries the merge result
    val doubled = spark.read.format("graft-avro").load(dir)
      .filter($"id" < 50).agg(sum($"v")).head.getLong(0)
    assert(doubled == (0L until 50L).map(_ * 4).sum)
    // pre-merge snapshot (retainOld) still serves the ORIGINAL values
    val orig = spark.read.format("graft-avro")
      .option("versionAsOf", versions.head.toString).load(dir)
      .filter($"id" < 50).agg(sum($"v")).head.getLong(0)
    assert(orig == (0L until 50L).map(_ * 2).sum)
  }

  test("SQL time travel through the catalog: VERSION AS OF") {
    import spark.implicits._
    val root = graft.util.Scratch.dir("manifest_tt")
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    s2.conf.set("spark.sql.catalog.graft.root", root)
    spark.range(0, 100, 1, 2).select($"id", ($"id" % 7).as("m"))
      .write.format("graft-avro").mode("overwrite").save(s"$root/ev.avro")
    s2.sql("INSERT INTO graft.ev SELECT id, id % 7 AS m FROM range(100, 150)")
    assert(s2.sql("SELECT count(*) AS c FROM graft.ev").head.getLong(0) == 150)
    assert(s2.sql("SELECT count(*) AS c FROM graft.ev VERSION AS OF 1")
      .head.getLong(0) == 100)
    val e = intercept[Exception] {
      s2.sql("SELECT * FROM graft.ev VERSION AS OF 99").collect()
    }
    assert(e.getMessage.contains("no such manifest version"), e.getMessage)
  }

  test("expireVersions GCs only files no retained generation references") {
    import spark.implicits._
    val dir = stage("gc")
    graft.sources.FleetMerge.mergeCow(spark, dir, "id",
      spark.range(0, 50).select($"id".as("k")),
      touched => touched.withColumn("v",
        when($"id" < 50, $"id" * 4).otherwise($"v")),
      retainOld = true)
    val fs = fsOf(dir)
    val p = new org.apache.hadoop.fs.Path(dir)
    // a crashed job's orphan: referenced by NO generation — precise GC
    // must leave it alone (it may be an in-flight job's task commit)
    val donor = fs.listStatus(p).filter(st =>
      st.isFile && st.getPath.getName.endsWith(".avro")).head.getPath
    val orphan = new org.apache.hadoop.fs.Path(p, "part-88888-live.avro")
    org.apache.hadoop.fs.FileUtil.copy(fs, donor, fs, orphan, false,
      spark.sessionState.newHadoopConf())

    val before = graft.sources.FleetManifest.versions(fs, p)
    assert(before.size >= 2)
    val res = graft.sources.FleetCompact.expireVersions(spark, dir,
      keepLast = 1)
    assert(res.expiredVersions == before.dropRight(1))
    assert(res.deletedFiles.nonEmpty,
      "retained pre-merge generation should have GC'd its replaced files")
    assert(fs.exists(orphan), "GC deleted an unreferenced orphan")
    // current read unaffected; expired version now unreadable
    assert(spark.read.format("graft-avro").load(dir).count() == 200)
    val e = intercept[Exception] {
      spark.read.format("graft-avro")
        .option("versionAsOf", before.head.toString).load(dir).collect()
    }
    assert(e.getMessage.contains("no such manifest version"), e.getMessage)
  }

  test("racing committers serialize: every append lands exactly once") {
    import spark.implicits._
    val dir = stage("race", n = 0)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    val jobs = (0 until 6).map { i =>
      Future {
        spark.range(i * 100, (i + 1) * 100, 1, 2)
          .select($"id", ($"id" * 2).as("v"))
          .write.format("graft-avro").mode("append").save(dir)
      }
    }
    Await.result(Future.sequence(jobs), 120.seconds)
    val got = spark.read.format("graft-avro").load(dir)
      .select(count(lit(1)), countDistinct($"id")).head
    assert(got.getLong(0) == 600 && got.getLong(1) == 600,
      s"lost or duplicated a concurrent append: $got")
    val fs = fsOf(dir)
    val p = new org.apache.hadoop.fs.Path(dir)
    val snap = graft.sources.FleetManifest.current(fs, p).get
    assert(snap.files.distinct.size == snap.files.size)
  }

  test("overwrite resets the manifest to exactly the new generation") {
    import spark.implicits._
    val dir = stage("reset")
    val fs = fsOf(dir)
    val p = new org.apache.hadoop.fs.Path(dir)
    val oldFiles = graft.sources.FleetManifest.current(fs, p).get.files
    spark.range(0, 10, 1, 1).select($"id", ($"id" * 3).as("v"))
      .write.format("graft-avro").mode("overwrite").save(dir)
    assert(spark.read.format("graft-avro").load(dir).count() == 10)
    val snap = graft.sources.FleetManifest.current(fs, p).get
    val onDisk = fs.listStatus(p).filter(st =>
      st.isFile && st.getPath.getName.endsWith(".avro"))
      .map(_.getPath.getName).toSet
    // the reset commit references ONLY the new generation…
    assert(snap.files.toSet.subsetOf(onDisk) &&
      snap.files.forall(!oldFiles.contains(_)),
      s"reset manifest ${snap.files} must be the new generation only")
    // …but deletes NOTHING: the retired generation stays on disk
    // (readers mid-overwrite and VERSION AS OF keep working; cleanup
    // belongs to expireVersions/remove_orphans)
    assert(oldFiles.forall(onDisk.contains),
      s"overwrite must not physically delete the old generation")
    assert(spark.read.format("graft-avro").option("versionAsOf", 1)
      .load(dir).count() == 200,
      "VERSION AS OF must still serve the pre-overwrite fleet")
  }

  test("concurrent COW rewrites of one file: one winner, loud conflict") {
    import spark.implicits._
    val dir = stage("conflict")
    val fs = fsOf(dir)
    val p = new org.apache.hadoop.fs.Path(dir)
    val victim = graft.sources.FleetManifest.current(fs, p).get.files.head
    // writer A stages its rewrite of `victim` (reads it, writes a
    // post-image file) but has not committed yet…
    spark.range(1000, 1010, 1, 1).select($"id", ($"id" * 2).as("v"))
      .write.format("graft-avro").mode("append").save(dir)
    // …meanwhile writer B's rewrite of the SAME file commits first
    graft.sources.FleetManifest.commit(fs, p,
      base => base.filterNot(_ == victim) :+ "rewrite-b.avro",
      bootstrap = Seq.empty, requireInBase = Set(victim))
    // writer A's swap must now CONFLICT, not silently re-apply: a
    // no-op remove plus its own add would land BOTH post-images and
    // duplicate the file's surviving rows
    val e = intercept[graft.sources.FleetCommitConflictException] {
      graft.sources.FleetManifest.commit(fs, p,
        base => base.filterNot(_ == victim) :+ "rewrite-a.avro",
        bootstrap = Seq.empty, requireInBase = Set(victim))
    }
    assert(e.getMessage.contains(victim))
    val files = graft.sources.FleetManifest.current(fs, p).get.files
    assert(files.contains("rewrite-b.avro") &&
      !files.contains("rewrite-a.avro") && !files.contains(victim),
      s"exactly one rewrite may win: $files")
    // an append racing the same window is NOT a conflict (nothing it
    // retires went missing) — it serializes and lands
    graft.sources.FleetManifest.commit(fs, p,
      base => base :+ "append-c.avro", bootstrap = Seq.empty)
    assert(graft.sources.FleetManifest.current(fs, p).get.files
      .contains("append-c.avro"))
  }

  test("expectedVersion gives strict snapshot isolation") {
    val root = graft.util.Scratch.dir("manifest_expected")
    val p = new org.apache.hadoop.fs.Path(s"$root/t.avro")
    val fs = fsOf(p.toString)
    fs.mkdirs(p)
    val s1 = graft.sources.FleetManifest.commit(fs, p,
      _ => Seq("a.avro"), bootstrap = Seq.empty)
    // lands only on exactly the expected base version…
    val s2 = graft.sources.FleetManifest.commit(fs, p,
      base => base :+ "b.avro", bootstrap = Seq.empty,
      expectedVersion = Some(s1.version))
    assert(s2.version == s1.version + 1 &&
      s2.files == Seq("a.avro", "b.avro"))
    // …and ANY intervening commit (even a pure append) conflicts
    val e = intercept[graft.sources.FleetCommitConflictException] {
      graft.sources.FleetManifest.commit(fs, p,
        base => base :+ "c.avro", bootstrap = Seq.empty,
        expectedVersion = Some(s1.version))
    }
    assert(e.getMessage.contains(s"expected version ${s1.version}"))
    assert(graft.sources.FleetManifest.current(fs, p).get == s2)
  }

  test("commit metadata round-trips and legacy prop-less manifests parse") {
    val root = graft.util.Scratch.dir("manifest_props")
    val p = new org.apache.hadoop.fs.Path(s"$root/t.avro")
    val fs = fsOf(p.toString)
    fs.mkdirs(p)
    val s1 = graft.sources.FleetManifest.commit(fs, p,
      _ => Seq("a.avro"), bootstrap = Seq.empty,
      props = Map("mv.sourceVersion" -> "7", "who" -> "spec"))
    // caller props ride the commit; the committer adds its commit.ts
    assert(s1.props - graft.sources.FleetManifest.CommitTsProp ==
      Map("mv.sourceVersion" -> "7", "who" -> "spec"))
    assert(s1.props.get(graft.sources.FleetManifest.CommitTsProp)
      .flatMap(_.toLongOption).exists(_ > 0L),
      s"commit must stamp a wall-clock commit.ts: ${s1.props}")
    val back = graft.sources.FleetManifest.current(fs, p).get
    assert(back.props == s1.props && back.files == Seq("a.avro"))
    // a commit WITHOUT props does not inherit the previous ones —
    // metadata belongs to exactly the commit that declared it
    val s2 = graft.sources.FleetManifest.commit(fs, p,
      base => base :+ "b.avro", bootstrap = Seq.empty)
    assert(s2.props.keySet ==
      Set(graft.sources.FleetManifest.CommitTsProp))
    // legacy version files (no "props" key) parse as empty metadata
    val legacy = new org.apache.hadoop.fs.Path(p,
      "_manifest/v00000000000000000003.json")
    val out = fs.create(legacy, true)
    out.write("""{"version":3,"files":["c.avro"]}""".getBytes("UTF-8"))
    out.close()
    val s3 = graft.sources.FleetManifest.current(fs, p).get
    assert(s3.version == 3L && s3.files == Seq("c.avro") &&
      s3.props.isEmpty)
  }

  test("TIMESTAMP index binds to commit.ts and survives a fleet copy") {
    import spark.implicits._
    val dir = stage("tsprops", n = 20)
    spark.range(20, 30, 1, 1).select($"id", ($"id" * 2).as("v"))
      .write.format("graft-avro").mode("append").save(dir)          // v2
    val fs = fsOf(dir)
    val p = new org.apache.hadoop.fs.Path(dir)
    val t1 = 1500000000000L
    val t2 = t1 + 60000L
    graft.sources.FleetManifest.restampCommitTs(fs, p, 1L, t1)
    graft.sources.FleetManifest.restampCommitTs(fs, p, 2L, t2)
    assert(graft.sources.FleetManifest.versionsWithTimes(fs, p) ==
      Seq(1L -> t1, 2L -> t2))
    // a distcp-style migration rewrites every file's mtime — the
    // commit-time index must ride the snapshots themselves
    val copied = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(dir).getParent, "moved.avro")
    org.apache.hadoop.fs.FileUtil.copy(fs, p, fs, copied, false,
      spark.sessionState.newHadoopConf())
    val vfile = graft.sources.FleetManifest.versionFilePath(copied, 1L)
    assert(fs.getFileStatus(vfile).getModificationTime != t1,
      "copy staging failed: mtime unexpectedly equals the pinned stamp")
    assert(graft.sources.FleetManifest.versionsWithTimes(fs, copied) ==
      Seq(1L -> t1, 2L -> t2),
      "a copied fleet must keep its time-travel index")
    // a legacy (pre-commit.ts) version file falls back to its mtime
    val snap = graft.sources.FleetManifest.snapshotAt(fs, copied, 2L).get
    val out = fs.create(
      graft.sources.FleetManifest.versionFilePath(copied, 2L), true)
    out.write(org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(org.json4s.JObject(
        "version" -> org.json4s.JInt(2),
        "files" -> org.json4s.JArray(
          snap.files.map(org.json4s.JString(_)).toList))))
      .getBytes("UTF-8"))
    out.close()
    val times = graft.sources.FleetManifest.versionsWithTimes(fs, copied)
    assert(times.head == (1L -> t1) && times(1)._2 != t2,
      s"legacy version must fall back to mtime: $times")
  }

  test("FleetCDC diffs manifests: appends are inserts; in-range churn nets out") {
    import spark.implicits._
    val dir = graft.util.Scratch.dir("manifest_cdc") + "/t.avro"
    spark.range(0, 50).select($"id").coalesce(1)
      .write.format("graft-avro").mode("overwrite").save(dir)         // v1
    spark.range(50, 80).select($"id").coalesce(1)
      .write.format("graft-avro").mode("append").save(dir)            // v2
    val ins = graft.sources.FleetCDC.changes(spark, dir, 1L, 2L)
    assert(ins.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("insert" -> 30L))
    assert(ins.agg(org.apache.spark.sql.functions.min($"id"))
      .head.getLong(0) == 50L)
    // retire the appended file (extent-decidable DELETE): v1→v3 nets
    // to NOTHING — the churn lived strictly inside the range
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    s2.conf.set("spark.sql.catalog.graft.root",
      new java.io.File(dir).getParent)
    val tbl = new java.io.File(dir).getName.stripSuffix(".avro")
    s2.sql(s"DELETE FROM graft.$tbl WHERE id >= 50")                  // v3
    assert(graft.sources.FleetCDC.changes(spark, dir, 1L, 3L).count() == 0)
    // and v2→v3 sees exactly the retirement as deletes
    val del = graft.sources.FleetCDC.changes(spark, dir, 2L, 3L)
    assert(del.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("delete" -> 30L))
    intercept[IllegalArgumentException] {
      graft.sources.FleetCDC.changes(spark, dir, 1L, 99L)
    }
    intercept[IllegalArgumentException] {
      graft.sources.FleetCDC.changes(spark, dir, 2L, 2L)
    }
  }

  test("FleetCDC diffs an ALTERed fleet: both sides read under the marker schema") {
    val root = graft.util.Scratch.dir("manifest_cdc_evolve")
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    s2.conf.set("spark.sql.catalog.graft.root", root)
    s2.sql("CREATE TABLE graft.e AS SELECT id, concat('a', id) AS v " +
      "FROM range(0, 20)")                                   // v1 + v2
    s2.sql("ALTER TABLE graft.e ADD COLUMN note STRING")     // v3: the
    // metadata-only DDL lands a SCHEMA COMMIT (r19 versioned schemas)
    s2.sql("INSERT INTO graft.e SELECT id, concat('b', id), " +
      "concat('n', id) FROM range(20, 25)")                  // v4
    val dir = s"$root/e.avro"
    // pre-ALTER generation on the DELETE side of a diff must null-fill
    // the added column instead of failing the union
    val d12 = graft.sources.FleetCDC.changes(s2, dir, 1L, 2L)
    assert(d12.schema.fieldNames.contains("note"))
    assert(d12.where("_change_type = 'insert'").count() == 20)
    assert(d12.where("note IS NOT NULL").count() == 0)
    // the ALTER's schema commit changes NO file: its span is empty
    assert(graft.sources.FleetCDC.changes(s2, dir, 2L, 3L).count() == 0)
    val d34 = graft.sources.FleetCDC.changes(s2, dir, 3L, 4L)
    assert(d34.where("_change_type = 'insert' AND note IS NOT NULL")
      .count() == 5)
  }

  test("FleetMV refreshes from the delta only; no-op and expiry edges hold") {
    import spark.implicits._
    val root = graft.util.Scratch.dir("manifest_mv")
    val src = s"$root/src.avro"
    val view = s"$root/view.avro"
    // 4 single-key files (clustered): deltas stay file-scoped
    spark.range(0, 400).select($"id", ($"id" % 4).as("k"),
        ($"id" * 2).cast("double").as("v"))
      .repartition(4, $"k")
      .write.format("graft-avro").option("clusterBy", "k")
      .mode("overwrite").save(src)
    graft.sources.FleetMV.create(spark, src, view, Seq("k"), Seq("v"))
    // no-op refresh: source unchanged
    val r0 = graft.sources.FleetMV.refresh(spark, src, view,
      Seq("k"), Seq("v"))
    assert(r0.changedFiles == 0 && r0.fromVersion == r0.toVersion)
    // metadata DELETE of one whole shard: the diff is ONE file
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    s2.conf.set("spark.sql.catalog.graft.root", root)
    s2.sql("DELETE FROM graft.src WHERE k = 2")
    val r1 = graft.sources.FleetMV.refresh(spark, src, view,
      Seq("k"), Seq("v"))
    // the k=2 container plus at most an empty container the decidable
    // DELETE opportunistically retired (rows==0 files are always
    // droppable) — never the untouched shards
    assert(r1.changedFiles <= 2,
      s"a one-shard delete must refresh from its file(s) only: $r1")
    val rows = spark.read.format("graft-avro").load(view)
      .collect().map(r => r.getAs[Long]("k") ->
        (r.getAs[Long]("cnt"), r.getAs[Double]("sum_v"))).toMap
    assert(!rows.contains(2L), "fully-deleted group must drop out")
    assert(rows(1L)._1 == 100L)
    assert(rows(1L)._2 ==
      (0L until 400L).filter(_ % 4 == 1).map(_ * 2.0).sum)
    // view readers always see one complete state, and the SOURCE
    // VERSION STAMP rides the same commit (atomic with the swap — a
    // crash can never leave refreshed data with a stale stamp)
    val viewP = new org.apache.hadoop.fs.Path(view)
    val vfs = fsOf(view)
    val viewSnap = graft.sources.FleetManifest.current(vfs, viewP).get
    assert(viewSnap.props.get(graft.sources.FleetMV.StampProp)
      .contains(r1.toVersion.toString),
      s"stamp must ride the view commit: ${viewSnap.props}")
    // source retention outrunning the stamp fails loudly
    s2.sql("DELETE FROM graft.src WHERE k = 0")
    graft.sources.FleetCompact.expireVersions(spark, src, keepLast = 1)
    val e = intercept[IllegalStateException] {
      graft.sources.FleetMV.refresh(spark, src, view, Seq("k"), Seq("v"))
    }
    assert(e.getMessage.contains("rebuild"), e.getMessage)
  }

  test("FleetMV min/max: inserts fold; deleted extrema recompute only affected groups") {
    import spark.implicits._
    val root = graft.util.Scratch.dir("manifest_mv_minmax")
    val dir = s"$root/t.avro"
    def gen(ids: Seq[Long]): Unit = ids.toDF("id")
      .select(($"id" % 4).as("k"), $"id".as("x"))
      .coalesce(1).write.format("graft-avro").mode("append").save(dir)
    gen(0L until 40L)                                          // v1
    val viewDir = s"$root/view.avro"
    graft.sources.FleetMV.create(spark, dir, viewDir,
      keys = Seq("k"), sumCols = Seq("x"), minMaxCols = Seq("x"))

    def viewRows() = spark.read.format("graft-avro").load(viewDir)
      .select("k", "cnt", "sum_x", "min_x", "max_x").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    def coldRows() = spark.read.format("graft-avro").load(dir)
      .groupBy($"k").agg(count(lit(1)).as("cnt"), sum($"x").as("sum_x"),
        min($"x").as("min_x"), max($"x").as("max_x")).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap

    // INSERT-only delta: extrema fold with least/greatest — NO group
    // may recompute (the no-rescan path is the 100 TB contract)
    gen(40L until 48L)                                         // v2
    val r1 = graft.sources.FleetMV.refresh(spark, dir, viewDir,
      keys = Seq("k"), sumCols = Seq("x"), minMaxCols = Seq("x"))
    assert(r1.recomputedGroups == 0L,
      s"insert-only refresh must not rescan: $r1")
    assert(viewRows() == coldRows())

    // DELETE one group's stored MIN (x=3 is group 3's minimum):
    // exactly that group recomputes, the other three pay nothing
    graft.sources.FleetMerge.mergeCow(spark, dir, "x",
      Seq(3L).toDF("q"),
      t => t.filter($"x" =!= 3L), retainOld = true)            // v3
    spark.sparkContext.setJobGroup("mv_minmax_r2", "recompute refresh")
    val r2 = graft.sources.FleetMV.refresh(spark, dir, viewDir,
      keys = Seq("k"), sumCols = Seq("x"), minMaxCols = Seq("x"))
    spark.sparkContext.clearJobGroup()
    // the recompute refresh runs WITHOUT a dedicated affected-count
    // job — ONE collect feeds both the count and the rescan's
    // broadcast build (r16 verdict #7). Status store updates are
    // async: poll until the group's job count is stable, then pin.
    def jobsIn: Int = spark.sparkContext.statusTracker
      .getJobIdsForGroup("mv_minmax_r2").length
    var seen = jobsIn; var stable = 0
    while (stable < 3) {
      Thread.sleep(100)
      val m = jobsIn
      if (m == seen) stable += 1 else { seen = m; stable = 0 }
    }
    // 12 measured with the fused collect (AQE runs a job per query
    // stage, so the floor is well above the logical action count); +1
    // since r21's cached-plan AQE partitioning (canChangeCachedPlan
    // OutputPartitioning=true lets AQE insert a right-sizing stage when
    // materializing the per-refresh persists — A/B attributed: 12 with
    // the conf off, 13 on, deterministic). The r16 shape with the
    // dedicated affected.count() action ran more than either — a creep
    // past this pin means an extra action entered refresh
    assert(seen <= 13,
      s"min/max recompute refresh ran $seen jobs — an extra action " +
        "(the r16 dedicated affected-count shape) crept back in")
    assert(r2.recomputedGroups == 1L,
      s"exactly the extremum-losing group recomputes: $r2")
    val after = viewRows()
    assert(after == coldRows())
    assert(after(3L)._3 == 7L,
      s"group 3's min must recompute to 7: ${after(3L)}")

    // DELETE rows that are NOT a stored extremum: no recompute at all
    graft.sources.FleetMerge.mergeCow(spark, dir, "x",
      Seq(17L, 18L).toDF("q"),
      t => t.filter($"x" =!= 17L && $"x" =!= 18L),
      retainOld = true)                                        // v4
    val r3 = graft.sources.FleetMV.refresh(spark, dir, viewDir,
      keys = Seq("k"), sumCols = Seq("x"), minMaxCols = Seq("x"))
    assert(r3.recomputedGroups == 0L,
      s"interior deletes must not rescan: $r3")
    assert(viewRows() == coldRows())
  }

  test("metadata-only DELETE retires files through the manifest first") {
    import spark.implicits._
    val dir = stage("metadel")
    // clustered layout: shard = id % 4, fully decidable DELETE
    spark.range(0, 100, 1, 2)
      .select($"id", ($"id" % 4).as("shard"))
      .repartition(4, $"shard")
      .write.format("graft-avro").option("clusterBy", "shard")
      .mode("overwrite").save(dir)
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    s2.conf.set("spark.sql.catalog.graft.root",
      new java.io.File(dir).getParent)
    s2.sql("DELETE FROM graft.t WHERE shard = 3")
    assert(s2.sql("SELECT count(*) AS c FROM graft.t").head.getLong(0) == 75)
    val fs = fsOf(dir)
    val p = new org.apache.hadoop.fs.Path(dir)
    val snap = graft.sources.FleetManifest.current(fs, p).get
    snap.files.foreach { n =>
      assert(fs.exists(new org.apache.hadoop.fs.Path(p, n)),
        s"manifest references unlinked file $n")
    }
  }

  test("fast_forward re-runs idempotently across a crashed partial publish") {
    import spark.implicits._
    import graft.sources.{FleetManifest, FleetCommitConflictException}
    val root = graft.util.Scratch.dir("ff_crash")
    val dir = s"$root/t.avro"
    spark.range(30).select($"id").coalesce(1)
      .write.format("graft-avro").mode("overwrite").save(dir)
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    FleetManifest.createBranch(fs, p, "stage")
    val base = FleetManifest.branchBase(fs, p, "stage").get
    // two staged branch commits
    val sb = spark.newSession()
    sb.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    sb.conf.set("spark.sql.catalog.graft.root", root)
    sb.conf.set("spark.graft.branch", "stage")
    sb.sql("DELETE FROM graft.t WHERE id < 5")
    sb.sql("INSERT INTO graft.t VALUES (777)")
    // SIMULATED CRASH mid-publish: the first staged version already
    // adopted into main, the ref still present
    val vFirst = base + 1
    val branchFile = new org.apache.hadoop.fs.Path(p,
      f"_manifest/branches/stage/v$vFirst%020d.json")
    org.apache.hadoop.fs.FileUtil.copy(fs,
      fs.getFileStatus(branchFile), fs,
      FleetManifest.versionFilePath(p, vFirst), false, false,
      spark.sessionState.newHadoopConf())
    assert(FleetManifest.mainCurrent(fs, p).get.version == vFirst)
    // the re-run completes the publish instead of conflicting
    val head = FleetManifest.fastForward(fs, p, "stage")
    assert(head == base + 2)
    val rows = spark.read.format("graft-avro").load(dir)
      .select($"id").as[Long].collect().toSet
    assert(rows == ((5L until 30L).toSet + 777L), s"$rows")
    assert(FleetManifest.branches(fs, p).isEmpty)
    // ...but a FOREIGN commit at an overlapping number still conflicts
    FleetManifest.createBranch(fs, p, "stage2")
    val sb2 = spark.newSession()
    sb2.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    sb2.conf.set("spark.sql.catalog.graft.root", root)
    sb2.conf.set("spark.graft.branch", "stage2")
    sb2.sql("DELETE FROM graft.t WHERE id = 7")
    // a concurrent MAIN commit lands at the number the branch staged
    val mainS = spark.newSession()
    mainS.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    mainS.conf.set("spark.sql.catalog.graft.root", root)
    mainS.sql("INSERT INTO graft.t VALUES (888)")
    val e = intercept[FleetCommitConflictException] {
      FleetManifest.fastForward(fs, p, "stage2")
    }
    assert(e.getMessage.contains("different content") ||
      e.getMessage.contains("main is at"), e.getMessage)
  }

  test("writer idempotence: a txnAppId/txnVersion replay lands at most once") {
    import spark.implicits._
    import graft.sources.FleetManifest
    val dir = stage("txn") // v1: 200 rows
    val fs = fsOf(dir)
    val p = new org.apache.hadoop.fs.Path(dir)
    def count() = spark.read.format("graft-avro").load(dir).count()
    def version() = FleetManifest.current(fs, p).get.version
    def nDataFiles() = fs.listStatus(p).count { st =>
      val n = st.getPath.getName
      st.isFile && n.endsWith(".avro") && !n.startsWith("_") &&
        !n.startsWith(".")
    }
    def write(lo: Long, hi: Long, app: String, v: Long,
        mode: String = "append"): Unit =
      spark.range(lo, hi, 1, 1).select($"id", ($"id" * 2).as("v"))
        .write.format("graft-avro").mode(mode)
        .option("txnAppId", app).option("txnVersion", v.toString)
        .save(dir)

    write(200, 210, "etl", 1)
    assert(count() == 210 && version() == 2L)
    val filesAfterV1 = nDataFiles()
    // the REPLAY: an orchestrator re-runs the same logical job — the
    // ledger skips it, the manifest version holds, and the replay's
    // own staged files are reaped (no unreferenced finals left behind)
    write(200, 210, "etl", 1)
    assert(count() == 210, "a replayed append doubled its rows")
    assert(version() == 2L, "a skipped replay must not commit")
    assert(nDataFiles() == filesAfterV1,
      "a skipped replay left staged files behind")
    // the next version lands; a STALE replay after it still skips
    // (the ledger is monotonically maxed, not last-writer)
    write(210, 220, "etl", 2)
    assert(count() == 220 && version() == 3L)
    write(200, 210, "etl", 1)
    assert(count() == 220 && version() == 3L)
    // a different appId is an independent ledger entry
    write(220, 230, "other", 1)
    assert(count() == 230)
    // the ledger INHERITS across a reset: an overwrite lands once...
    write(0, 5, "etl", 3, mode = "overwrite")
    assert(count() == 5)
    spark.range(5, 8, 1, 1).select($"id", ($"id" * 2).as("v"))
      .write.format("graft-avro").mode("append").save(dir)
    assert(count() == 8)
    // ...and its replay must NOT reset the fleet again
    write(0, 5, "etl", 3, mode = "overwrite")
    assert(count() == 8, "a replayed overwrite reset the fleet twice")
    // half a token fails loudly at plan time
    def messages(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString("; ")
    val e1 = intercept[Throwable] {
      spark.range(1).select($"id", $"id".as("v"))
        .write.format("graft-avro").mode("append")
        .option("txnAppId", "etl").save(dir)
    }
    assert(messages(e1).contains("txnVersion"), messages(e1))
    val e2 = intercept[Throwable] {
      spark.range(1).select($"id", $"id".as("v"))
        .write.format("graft-avro").mode("append")
        .option("txnVersion", "9").save(dir)
    }
    assert(messages(e2).contains("txnAppId"), messages(e2))
  }

  test("option(timestampAsOf): the DataFrame spelling of TIMESTAMP AS OF") {
    import spark.implicits._
    import graft.sources.FleetManifest
    val dir = stage("ts_asof") // v1: 200 rows
    val fs = fsOf(dir)
    val p = new org.apache.hadoop.fs.Path(dir)
    spark.range(200, 210, 1, 1).select($"id", ($"id" * 2).as("v"))
      .write.format("graft-avro").mode("append").save(dir) // v2
    FleetManifest.restampCommitTs(fs, p, 1L, 1000L)
    FleetManifest.restampCommitTs(fs, p, 2L, 2000L)
    def cnt(ts: String): Long = spark.read.format("graft-avro")
      .option("timestampAsOf", ts).load(dir).count()
    assert(cnt("1500") == 200L, "between commits binds the older one")
    assert(cnt("2000") == 210L, "at-or-before includes the boundary")
    assert(cnt("1970-01-01T00:00:02Z") == 210L, "ISO instant spelling")
    def messages(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString("; ")
    val e1 = intercept[Throwable] { cnt("500") }
    assert(messages(e1).contains("predates the first commit"),
      messages(e1))
    val e2 = intercept[Throwable] {
      spark.read.format("graft-avro").option("timestampAsOf", "1500")
        .option("versionAsOf", "1").load(dir).count()
    }
    assert(messages(e2).contains("mutually exclusive"), messages(e2))
  }

  test("racing writers with the SAME txn token: exactly one lands") {
    import spark.implicits._
    import java.util.concurrent.{CountDownLatch, Executors}
    val dir = stage("txnrace")
    // 6 concurrent jobs all claiming (racer, 1) with DIFFERENT
    // power-of-two sizes — whichever lands, the ledger admits exactly
    // one, so the delta must be a single power of two (any sum of two
    // or more distinct powers is not one)
    val pool = Executors.newFixedThreadPool(6)
    val start = new CountDownLatch(1)
    val results = (0 to 5).map(1 << _).map { n =>
      pool.submit(new java.util.concurrent.Callable[Boolean] {
        override def call(): Boolean = {
          start.await()
          try {
            spark.range(1000L * n, 1000L * n + n, 1, 1)
              .select($"id", ($"id" * 2).as("v"))
              .write.format("graft-avro").mode("append")
              .option("txnAppId", "racer").option("txnVersion", "1")
              .save(dir)
            true
          } catch { case _: Throwable => false }
        }
      })
    }
    start.countDown()
    val landedFlags = results.map(_.get())
    pool.shutdown()
    val total = spark.read.format("graft-avro").load(dir).count()
    val delta = total - 200L
    assert(Set(1L, 2L, 4L, 8L, 16L, 32L).contains(delta),
      s"exactly one racer's slice must land (got delta $delta)")
    // every job reported success (a skipped replay is a success, not
    // an error — the transaction IS committed)
    assert(landedFlags.forall(identity), landedFlags.toString)
    // and nothing staged by the losers survives on disk
    val fs = fsOf(dir)
    val p = new org.apache.hadoop.fs.Path(dir)
    val snapFiles = graft.sources.FleetManifest.current(fs, p)
      .get.files.toSet
    val onDisk = fs.listStatus(p).filter(st => st.isFile &&
      st.getPath.getName.endsWith(".avro") &&
      !st.getPath.getName.startsWith("_") &&
      !st.getPath.getName.startsWith(".")).map(_.getPath.getName).toSet
    assert(onDisk == snapFiles,
      s"losers left staged files: ${(onDisk -- snapFiles).toSeq.sorted}")
  }
}
