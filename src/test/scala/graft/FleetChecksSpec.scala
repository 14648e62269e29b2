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
