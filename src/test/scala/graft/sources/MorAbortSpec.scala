package graft.sources

import org.apache.spark.sql.functions._

/** The merge-on-read committer's commit/abort boundary (r17 ADVICE):
  * Spark calls `abort(messages)` whenever `commit()` throws — INCLUDING
  * a throw AFTER the manifest commit already published (a failed
  * post-commit reap or `_SUCCESS` write). From that instant the
  * snapshot may reference the job's tag-named files (a directly-bound
  * single partial vector, chain parents, inserted containers), so the
  * tag-matched reaping must become a no-op — deleting them would fail
  * every subsequent read of the fleet. In-package: drives the
  * `private[sources]` write classes directly to interleave at the
  * exact boundary. */
class MorAbortSpec extends graft.SparkSpec {

  private def fsOf(dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  test("abort after a landed manifest commit must not reap the bound partial vector") {
    import spark.implicits._
    val dir = graft.util.Scratch.dir("mor_abort") + "/t.avro"
    spark.range(500).select($"id", ($"id" * 2).as("v"))
      .repartition(1)
      .write.format("graft-avro").mode("overwrite").save(dir)
    val (fs, p) = fsOf(dir)
    val dataFile = FleetManifest.current(fs, p).get.files.head
    val pos = spark.read.format("graft-avro").load(dir)
      .filter($"id" === 7L).select(col("_sync"), col("_ridx"))
      .head()
    val schema = spark.read.format("graft-avro").load(dir).schema
    val jobTag = "deadbeef"
    // the task's side of the protocol: one partial vector, tag-named
    val rel = FleetDv.write(fs, p, dataFile,
      FleetDv.Deleted.of(Seq((pos.getLong(0), pos.getLong(1)))),
      tag = s"$jobTag-p0-t0")
    val msg = AvroFleetDeltaCommitMessage(Seq.empty,
      Seq(AvroFleetDeltaCommitMessage.PartialDv(dataFile, rel, 1L, None, 0L)))
    val bw = new AvroFleetDeltaBatchWrite(
      Avro.toAvroSchema(schema).toString, schema, dir, jobTag)
    bw.commit(Array(msg))
    // single-partial case: the manifest binds the TAG-NAMED partial
    // directly — exactly the file a post-commit abort would reap
    val bound = FleetManifest.current(fs, p).get.dvs(dataFile)
    assert(bound == rel, s"expected the partial bound directly: $bound")
    // Spark's abort-after-commit-throw: must be a strict no-op now
    bw.abort(Array(msg))
    assert(fs.exists(new org.apache.hadoop.fs.Path(p, rel)),
      "abort after a landed commit reaped a manifest-referenced vector")
    assert(spark.read.format("graft-avro").load(dir).count() == 499)
    // and the ordinary PRE-commit abort still rolls back its own tags
    val rel2 = FleetDv.write(fs, p, dataFile,
      FleetDv.Deleted.of(Seq((pos.getLong(0), pos.getLong(1) + 1))),
      tag = s"cafe0000-p0-t0")
    val bw2 = new AvroFleetDeltaBatchWrite(
      Avro.toAvroSchema(schema).toString, schema, dir, "cafe0000")
    bw2.abort(Array(AvroFleetDeltaCommitMessage(Seq.empty,
      Seq(AvroFleetDeltaCommitMessage.PartialDv(dataFile, rel2, 1L, None, 0L)))))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(p, rel2)),
      "pre-commit abort must reap its own partials")
    assert(fs.exists(new org.apache.hadoop.fs.Path(p, rel)),
      "pre-commit abort of another job must not touch foreign tags")
  }
}
