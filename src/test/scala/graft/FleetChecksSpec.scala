package graft

import org.apache.spark.sql.functions._

/** Write-time CHECK constraints (FleetChecks + the add_check /
  * drop_check / checks procedures): ANSI semantics (FALSE violates,
  * NULL passes), validation at ADD time (expression + existing data),
  * and enforcement across every row-writing path — plain append, SQL
  * INSERT, copy-on-write UPDATE post-images, merge-on-read insert
  * post-images, and the streaming sink. */
class FleetChecksSpec extends SparkSpec {

  private def stage(tag: String): (String, String,
      org.apache.spark.sql.SparkSession) = {
    import spark.implicits._
    val root = graft.util.Scratch.dir(s"checks_$tag")
    val dir = s"$root/t.avro"
    spark.range(0, 20).select($"id", ($"id" * 10).as("bal"))
      .coalesce(2).write.format("graft-avro").mode("overwrite").save(dir)
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    s2.conf.set("spark.sql.catalog.graft.root", root)
    (root, dir, s2)
  }

  private def messages(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString("; ")

  test("add_check validates the expression and the existing data") {
    val (_, _, s2) = stage("add")
    // unresolvable column → loud, names the check and the schema
    val e1 = intercept[Throwable] {
      s2.sql("CALL graft.system.add_check('t', 'bad', 'nope > 0')")
        .collect()
    }
    assert(messages(e1).contains("does not resolve"), messages(e1))
    // non-deterministic → loud
    val e2 = intercept[Throwable] {
      s2.sql("CALL graft.system.add_check('t', 'rnd', 'rand() < 2')")
        .collect()
    }
    assert(messages(e2).contains("non-deterministic"), messages(e2))
    // existing data violates → loud with the row count
    val e3 = intercept[Throwable] {
      s2.sql("CALL graft.system.add_check('t', 'big', 'bal > 50')")
        .collect()
    }
    assert(messages(e3).contains("existing row(s) violate"),
      messages(e3))
    // a satisfiable check lands and lists
    s2.sql("CALL graft.system.add_check('t', 'bal_floor', 'bal >= 0')")
      .collect()
    val listed = s2.sql("CALL graft.system.checks('t')").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(listed == Seq(("bal_floor", "bal >= 0")))
    // duplicate name refuses
    val e4 = intercept[Throwable] {
      s2.sql("CALL graft.system.add_check('t', 'bal_floor', 'bal < 9')")
        .collect()
    }
    assert(messages(e4).contains("already exists"), messages(e4))
  }

  test("appends, SQL INSERT, and clustered writes enforce per row; NULL passes; drop_check lifts") {
    import spark.implicits._
    val (_, dir, s2) = stage("enforce")
    s2.sql(
      "CALL graft.system.add_check('t', 'bal_floor', 'bal >= 0')")
      .collect()
    def count() = spark.read.format("graft-avro").load(dir).count()
    // a violating DataFrame append fails WHOLE and lands nothing
    val e1 = intercept[Throwable] {
      Seq((100L, 5L), (101L, -1L)).toDF("id", "bal")
        .write.format("graft-avro").mode("append").save(dir)
    }
    assert(messages(e1).contains("bal_floor"), messages(e1))
    assert(count() == 20, "a failed write landed rows")
    // SQL INSERT through the catalog enforces identically
    val e2 = intercept[Throwable] {
      s2.sql("INSERT INTO graft.t VALUES (102, -7)")
    }
    assert(messages(e2).contains("bal_floor"), messages(e2))
    assert(count() == 20)
    // NULL passes (ANSI CHECK: only FALSE violates)
    Seq((103L, Option(5L)), (104L, Option.empty[Long]))
      .toDF("id", "bal")
      .write.format("graft-avro").mode("append").save(dir)
    assert(count() == 22)
    // the clustered writer path enforces too
    val e3 = intercept[Throwable] {
      Seq((105L, -9L)).toDF("id", "bal")
        .write.format("graft-avro").option("clusterBy", "id")
        .mode("append").save(dir)
    }
    assert(messages(e3).contains("bal_floor"), messages(e3))
    assert(count() == 22)
    // drop_check lifts enforcement
    s2.sql("CALL graft.system.drop_check('t', 'bal_floor')").collect()
    Seq((106L, -1L)).toDF("id", "bal")
      .write.format("graft-avro").mode("append").save(dir)
    assert(count() == 23)
  }

  test("row-level UPDATE post-images enforce under both COW and MOR") {
    val (_, dir, s2) = stage("rowlevel")
    s2.sql(
      "CALL graft.system.add_check('t', 'bal_floor', 'bal >= 0')")
      .collect()
    def count() = spark.read.format("graft-avro").load(dir).count()
    // copy-on-write: the swap write re-inserts post-images
    val e1 = intercept[Throwable] {
      s2.sql("UPDATE graft.t SET bal = -5 WHERE id = 3")
    }
    assert(messages(e1).contains("bal_floor"), messages(e1))
    assert(count() == 20, "a failed COW update changed the fleet")
    // merge-on-read: insert post-images check in the delta writer
    val sM = spark.newSession()
    sM.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    sM.conf.set("spark.sql.catalog.graft.root",
      s2.conf.get("spark.sql.catalog.graft.root"))
    sM.conf.set("spark.graft.rowLevelMode", "merge-on-read")
    val e2 = intercept[Throwable] {
      sM.sql("UPDATE graft.t SET bal = -5 WHERE id = 4")
    }
    assert(messages(e2).contains("bal_floor"), messages(e2))
    assert(count() == 20, "a failed MOR update changed the fleet")
    // a PASSING mutation under each mode still lands
    s2.sql("UPDATE graft.t SET bal = 999 WHERE id = 3")
    sM.sql("UPDATE graft.t SET bal = 888 WHERE id = 4")
    val got = spark.read.format("graft-avro").load(dir)
      .filter(col("id").isin(3L, 4L))
      .orderBy("id").collect().map(_.getLong(1)).toSeq
    assert(got == Seq(999L, 888L))
  }

  test("a writer that planned before add_check landed loses its commit loudly (requireChecks CAS)") {
    import spark.implicits._
    val (_, dir, s2) = stage("race_writer")
    // land_check fires ONCE from inside the append's task — strictly
    // between the write's plan-time check resolution (no checks) and
    // its manifest commit: the r19 TOCTOU window. The constraint
    // commit it lands is exactly add_check's (props-only, inherited
    // forward); the writer's rows were never validated against it.
    FleetChecksSpec.armConstraint(dir, "bal_floor", "bal >= 0")
    spark.udf.register("land_check",
      (_: Long) => { FleetChecksSpec.landOnce(); true })
    def count() = spark.read.format("graft-avro").load(dir).count()
    val e = intercept[Throwable] {
      // spark.range (not a literal LocalRelation): the optimizer's
      // ConvertToLocalRelation would otherwise fold the UDF at PLAN
      // time, landing the constraint before the write resolves checks
      spark.range(200, 201).select($"id",
        when(expr("land_check(id)"), lit(-1L))
          .otherwise(lit(-2L)).as("bal"))
        .write.format("graft-avro").mode("append")
        .save(dir)
    }
    assert(messages(e).contains("planned before CHECK constraint"),
      messages(e))
    assert(count() == 20,
      "a commit that lost the constraint race landed rows")
    // the constraint itself stands and now gates a re-run loudly at
    // the task (the re-planned write enforces it)
    val e2 = intercept[Throwable] {
      Seq((200L, -1L)).toDF("id", "bal")
        .write.format("graft-avro").mode("append").save(dir)
    }
    assert(messages(e2).contains("bal_floor"), messages(e2))
    assert(count() == 20)
    // and a VALID re-run commits through (drops never conflict; the
    // re-plan adopted the constraint)
    Seq((201L, 7L)).toDF("id", "bal")
      .write.format("graft-avro").mode("append").save(dir)
    assert(count() == 21)
  }

  test("a DROP landing mid-write never conflicts the writer (rows passed a superset)") {
    import spark.implicits._
    val (_, dir, s2) = stage("race_drop")
    s2.sql("CALL graft.system.add_check('t', 'bal_floor', 'bal >= 0')")
      .collect()
    // drop_once fires from inside the (valid) append's task — the
    // writer planned WITH bal_floor, enforced it per row, and commits
    // against a base whose check set SHRANK: requireChecks only flags
    // checks the plan did NOT enforce, so the commit lands
    FleetChecksSpec.armDrop(dir, "bal_floor")
    spark.udf.register("drop_once",
      (_: Long) => { FleetChecksSpec.landOnce(); true })
    spark.range(500, 501).select($"id",
      when(expr("drop_once(id)"), lit(7L)).otherwise(lit(8L)).as("bal"))
      .write.format("graft-avro").mode("append").save(dir)
    val got = spark.read.format("graft-avro").load(dir)
      .filter($"id" === 500L).count()
    assert(got == 1L, "a drop mid-write must not conflict a valid append")
    assert(s2.sql("CALL graft.system.checks('t')").count() == 0)
  }

  test("add_check re-validates when a concurrent commit interleaves; violating rows make it refuse") {
    import spark.implicits._
    val (root, dir, s2) = stage("race_add")
    // a violating container, staged in the fleet directory but NOT in
    // the manifest — the once-firing UDF inside add_check's own
    // validation scan commits it mid-validation, emulating a
    // concurrent writer landing between the scan and the constraint
    // commit. expectedVersion makes add_check lose, re-read, re-scan —
    // and the re-scan finds the violating row: it must refuse.
    val tmpFleet = s"$root/stagesrc.avro"
    Seq((999L, -5L)).toDF("id", "bal").coalesce(1)
      .write.format("graft-avro").mode("overwrite").save(tmpFleet)
    val conf = spark.sessionState.newHadoopConf()
    val tp = new org.apache.hadoop.fs.Path(tmpFleet)
    val tfs = tp.getFileSystem(conf)
    val srcFile = tfs.listStatus(tp).map(_.getPath)
      .filter(q => q.getName.endsWith(".avro") &&
        !q.getName.startsWith("_") && !q.getName.startsWith("."))
      .head
    val planted = new org.apache.hadoop.fs.Path(dir, "planted-neg.avro")
    org.apache.hadoop.fs.FileUtil.copy(tfs, srcFile,
      tfs, planted, false, conf)
    FleetChecksSpec.armAppend(dir, "planted-neg.avro")
    s2.udf.register("sneak_commit",
      (_: Long) => { FleetChecksSpec.landOnce(); true })
    val e = intercept[Throwable] {
      s2.sql("CALL graft.system.add_check('t', 'bal_floor', " +
        "'sneak_commit(bal) AND bal >= 0')").collect()
    }
    assert(messages(e).contains("existing row(s) violate"),
      s"add_check must re-validate after losing the race: ${messages(e)}")
    // no constraint landed — the fleet (with the racer's committed
    // row) stays writable with negatives
    assert(s2.sql("CALL graft.system.checks('t')").count() == 0)
    Seq((300L, -1L)).toDF("id", "bal")
      .write.format("graft-avro").mode("append").save(dir)
  }

  test("checks version with the manifest: AS OF shows each generation's set; clones and resets carry them; legacy sidecars migrate") {
    import spark.implicits._
    val (root, dir, s2) = stage("versioned")
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val preV = graft.sources.FleetManifest.current(fs, p).get.version
    s2.sql("CALL graft.system.add_check('t', 'bal_floor', 'bal >= 0')")
      .collect()
    // the constraint is a manifest commit: version bumped, prop set
    val snap = graft.sources.FleetManifest.current(fs, p).get
    assert(snap.version == preV + 1)
    assert(graft.sources.FleetManifest.checksOf(snap.props) ==
      Map("bal_floor" -> "bal >= 0"))
    // history: the pre-add generation carries no check prop
    val old = graft.sources.FleetManifest.snapshotAt(fs, p, preV).get
    assert(graft.sources.FleetManifest.checksOf(old.props).isEmpty,
      "a pre-add_check generation must show no constraint")
    // a clone carries the constraint (manifest props ride the copy)
    s2.sql("CALL graft.system.clone('t', 't2')").collect()
    val e1 = intercept[Throwable] {
      Seq((400L, -3L)).toDF("id", "bal")
        .write.format("graft-avro").mode("append").save(s"$root/t2.avro")
    }
    assert(messages(e1).contains("bal_floor"), messages(e1))
    // INSERT OVERWRITE replaces data, not governance: the check
    // survives a reset commit
    Seq((1L, 5L)).toDF("id", "bal")
      .write.format("graft-avro").mode("overwrite").save(dir)
    val e2 = intercept[Throwable] {
      Seq((2L, -5L)).toDF("id", "bal")
        .write.format("graft-avro").mode("append").save(dir)
    }
    assert(messages(e2).contains("bal_floor"), messages(e2))
    // LEGACY sidecar fleets enforce as before and migrate on first
    // add/drop (sidecar deleted, content in the manifest)
    val legacyDir = s"$root/legacy.avro"
    spark.range(5).select($"id", ($"id" * 10).as("bal"))
      .coalesce(1).write.format("graft-avro").mode("overwrite")
      .save(legacyDir)
    val lp = new org.apache.hadoop.fs.Path(legacyDir)
    graft.sources.FleetChecks.writeSidecar(fs, lp,
      Map("bal_floor" -> "bal >= 0"))
    val e3 = intercept[Throwable] {
      Seq((10L, -1L)).toDF("id", "bal")
        .write.format("graft-avro").mode("append").save(legacyDir)
    }
    assert(messages(e3).contains("bal_floor"), messages(e3))
    s2.sql("CALL graft.system.add_check('legacy', 'id_pos', 'id >= 0')")
      .collect()
    assert(!fs.exists(new org.apache.hadoop.fs.Path(lp,
      graft.sources.FleetChecks.FileName)),
      "the first add_check must migrate the legacy sidecar away")
    val migrated = graft.sources.FleetManifest.current(fs, lp).get
    assert(graft.sources.FleetManifest.checksOf(migrated.props) ==
      Map("bal_floor" -> "bal >= 0", "id_pos" -> "id >= 0"))
  }

  test("the streaming sink enforces checks per epoch") {
    import spark.implicits._
    val (root, dir, s2) = stage("stream")
    s2.sql(
      "CALL graft.system.add_check('t', 'bal_floor', 'bal >= 0')")
      .collect()
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long)]
    mem.addData((200L, 5L), (201L, -1L))
    val q = mem.toDF().toDF("id", "bal")
      .writeStream.format("graft-avro")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start(dir)
    val e = intercept[Throwable] { q.awaitTermination(120000) }
    assert(messages(e).contains("bal_floor"), messages(e))
    assert(spark.read.format("graft-avro").load(dir).count() == 20,
      "a failed epoch landed rows")
  }
}

/** Once-firing hooks for the constraint-race specs: a task-side UDF
  * lands a FOREIGN manifest commit exactly inside the window under
  * test (same technique as [[MorRowLevelSpec]]'s bump_once). */
object FleetChecksSpec {
  private val target =
    new java.util.concurrent.atomic.AtomicReference[String]()
  private val action =
    new java.util.concurrent.atomic.AtomicReference[
      org.apache.hadoop.fs.Path => Unit]()
  private val pending = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Arm: the next landOnce commits `check:<name>` → expr (what
    * add_check's commit publishes). */
  def armConstraint(fleet: String, name: String, expr: String): Unit = {
    target.set(fleet)
    action.set { p =>
      val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
      graft.sources.FleetManifest.commit(fs, p, identity, Nil,
        props = Map(
          (graft.sources.FleetManifest.CheckPropPrefix + name) -> expr))
      ()
    }
    pending.set(true)
  }

  /** Arm: the next landOnce commits a check DROP (the sentinel
    * spelling drop_check publishes). */
  def armDrop(fleet: String, name: String): Unit = {
    target.set(fleet)
    action.set { p =>
      val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
      graft.sources.FleetManifest.commit(fs, p, identity, Nil,
        props = Map(
          (graft.sources.FleetManifest.CheckPropPrefix + name) -> ""))
      ()
    }
    pending.set(true)
  }

  /** Arm: the next landOnce commits a pre-staged data file into the
    * manifest (a concurrent append landing mid-validation). */
  def armAppend(fleet: String, fileName: String): Unit = {
    target.set(fleet)
    action.set { p =>
      val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
      graft.sources.FleetManifest.commit(fs, p,
        base => base :+ fileName, Nil)
      ()
    }
    pending.set(true)
  }

  def landOnce(): Unit =
    if (pending.compareAndSet(true, false))
      action.get()(new org.apache.hadoop.fs.Path(target.get))
}
