package graft

import org.apache.spark.sql.functions._

/** Sidecar-pruned copy-on-write MERGE over a fleet (FleetMerge): only
  * extent-hit files rewrite; everything else stays byte-identical. */
class CrudFleetSpec extends SparkSpec {

  test("fleet merge rewrites only extent-hit files; the rest keep mtime and bytes") {
    import spark.implicits._
    val root = graft.util.Scratch.dir("crud_fleet_spec")
    val fleetDir = s"$root/customer.avro"
    val base = graft.util.Tables.customer(spark, sfDir)
      .select($"c_custkey", $"c_name", round($"c_acctbal", 4).as("c_acctbal"))
    base.repartitionByRange(8, $"c_custkey")
      .write.format("graft-avro").mode("overwrite").save(fleetDir)

    val p = new org.apache.hadoop.fs.Path(fleetDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    def snapshot() = fs.listStatus(p)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".avro"))
      .map(st => st.getPath.toString ->
        (st.getModificationTime, st.getLen)).toMap
    val before = snapshot()
    assert(before.size >= 4, s"want a multi-file fleet, got ${before.size}")

    // narrow feed: keys < 10 (delete), 10..14 (update), +200000
    // (insert) — on this fixture only the lowest-extent file can hit
    val cust = graft.util.Tables.customer(spark, sfDir)
    val feed = cust.filter($"c_custkey" < 10)
      .select($"c_custkey".as("k"), lit("D").as("op"),
        lit(null).cast("string").as("new_name"),
        lit(null).cast("double").as("new_bal"))
      .unionByName(cust.filter($"c_custkey" >= 10 && $"c_custkey" < 15)
        .select($"c_custkey".as("k"), lit("U").as("op"),
          $"c_name".as("new_name"), round($"c_acctbal" * 2.0, 4).as("new_bal")))
      .unionByName(cust.filter($"c_custkey" < 3)
        .select(($"c_custkey" + 200000).as("k"), lit("I").as("op"),
          concat(lit("Merged#"), $"c_custkey").as("new_name"),
          round(lit(10.0), 4).as("new_bal")))
    val res = graft.sources.FleetMerge.mergeCow(spark, fleetDir,
      "c_custkey", feed.select($"k"),
      touched =>
        graft.ops.Crud.applyMergeClauses(touched, feed).drop("action"))

    // pruning held: most of the fleet was never touched (feed keys are
    // <150 and +200000 — only the low-extent file can hit)
    assert(res.untouched.nonEmpty && res.touched.nonEmpty)
    assert(res.touched.size < before.size,
      s"merge must not rewrite the whole fleet: ${res.touched}")
    val after = snapshot()
    res.untouched.foreach { f =>
      assert(after.get(f) == before.get(f),
        s"untouched $f changed: ${before.get(f)} -> ${after.get(f)}")
    }
    res.touched.foreach { f =>
      assert(!after.contains(f), s"touched $f must be replaced, not kept")
    }
    res.written.foreach { f =>
      assert(after.contains(f), s"written $f missing after merge")
    }

    // semantics: the read-back equals the plain DataFrame MERGE
    val got = spark.read.format("graft-avro").load(fleetDir)
      .collect().map(_.toSeq).toSet
    val want = graft.ops.Crud.applyMergeClauses(base, feed)
      .drop("action").collect().map(_.toSeq).toSet
    assert(got == want,
      s"merged fleet diverged: ${got.size} vs ${want.size} rows")
  }

  test("merge prunes correctly on an INT-typed key (sidecar carriers re-box)") {
    import spark.implicits._
    val root = graft.util.Scratch.dir("crud_fleet_int")
    val fleetDir = s"$root/t.avro"
    spark.range(0, 400).select($"id".cast("int").as("k"),
        concat(lit("v"), $"id").as("v"))
      .repartitionByRange(4, $"k")
      .write.format("graft-avro").mode("overwrite").save(fleetDir)
    val feed = spark.range(0, 10).select($"id".cast("int").as("k"))
    val res = graft.sources.FleetMerge.mergeCow(spark, fleetDir, "k",
      feed, touched => touched.filter($"k" >= 10)) // delete k<10
    assert(res.untouched.nonEmpty && res.touched.nonEmpty,
      s"int-key extents must prune: $res")
    assert(spark.read.format("graft-avro").load(fleetDir).count() == 390)
  }

  test("a merge whose keys miss every extent rewrites nothing") {
    import spark.implicits._
    val root = graft.util.Scratch.dir("crud_fleet_noop")
    val fleetDir = s"$root/customer.avro"
    graft.util.Tables.customer(spark, sfDir)
      .select($"c_custkey", $"c_name", round($"c_acctbal", 4).as("c_acctbal"))
      .repartitionByRange(4, $"c_custkey")
      .write.format("graft-avro").mode("overwrite").save(fleetDir)
    val rows = spark.read.format("graft-avro").load(fleetDir).count()
    // feed keys far beyond every file's extent — only inserts happen
    val feed = spark.range(900000, 900010).toDF("k")
    val res = graft.sources.FleetMerge.mergeCow(spark, fleetDir,
      "c_custkey", feed,
      touched => touched.unionByName(
        feed.select($"k".as("c_custkey"),
          concat(lit("Ins#"), $"k").as("c_name"),
          round(lit(1.0), 4).as("c_acctbal"))))
    assert(res.touched.isEmpty, s"no extent can hit: ${res.touched}")
    val after = spark.read.format("graft-avro").load(fleetDir).count()
    assert(after == rows + 10)
  }
}
