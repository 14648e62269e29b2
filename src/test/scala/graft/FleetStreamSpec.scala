package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The fleet as a streaming SOURCE (AvroFleetMicroBatchStream):
  * readStream over a fleet directory — offsets are admitted-file
  * lists, restarts resume exactly, AvailableNow snapshots once. */
class FleetStreamSpec extends SparkSpec {

  private def writeGen(dir: String, lo: Long, hi: Long): Unit = {
    import spark.implicits._
    spark.range(lo, hi).select($"id", concat(lit("v"), $"id").as("v"))
      .coalesce(2)
      .write.format("graft-avro").mode("append").save(dir)
  }

  // foreachBatch sink: the memory sink cannot recover a checkpoint,
  // and resume-exactness is the point of the first test
  private def drain(dir: String, ckpt: String): Seq[Long] = {
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("graft-avro").load(dir)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= b.select("id").collect().map(_.getLong(0))
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    got.toSeq.sorted
  }

  test("a fleet streams: AvailableNow drains it, a restart reads only new files") {
    val root = graft.util.Scratch.dir("fleet_stream")
    val dir = s"$root/src.avro"
    val ckpt = s"$root/ckpt"
    writeGen(dir, 0, 100)
    assert(drain(dir, ckpt) == (0L until 100L))
    // second generation lands; SAME checkpoint → only the new files
    writeGen(dir, 100, 150)
    val got2 = drain(dir, ckpt)
    assert(got2 == (100L until 150L),
      s"restart must resume from the offset, got ${got2.length} rows")
  }

  test("streaming read prunes columns and applies pushed filters per row") {
    import spark.implicits._
    val root = graft.util.Scratch.dir("fleet_stream_prune")
    val dir = s"$root/src.avro"
    writeGen(dir, 0, 50)
    val q = spark.readStream.format("graft-avro").load(dir)
      .filter($"id" >= 40).select($"v")
      .writeStream.format("memory").queryName("fleet_stream_prune")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val vs = spark.table("fleet_stream_prune").collect()
      .map(_.getString(0)).sorted
    assert(vs.toSeq == (40 until 50).map(i => s"v$i").sorted)
  }

  test("offsets compact to a checkpoint manifest past the inline limit and still resume") {
    val root = graft.util.Scratch.dir("fleet_stream_manifest")
    val dir = s"$root/src.avro"
    val ckpt = s"$root/ckpt"
    writeGen(dir, 0, 30)
    writeGen(dir, 30, 60) // 4 files > inline limit of 2
    def drainWith(limit: Int): Seq[Long] = {
      val got = scala.collection.mutable.ArrayBuffer.empty[Long]
      val q = spark.readStream.format("graft-avro")
        .option("offsetInlineLimit", limit.toString).load(dir)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          got ++= b.select("id").collect().map(_.getLong(0))
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      got.toSeq.sorted
    }
    assert(drainWith(2) == (0L until 60L))
    // the persisted offset is a pointer, not a file list
    val off = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$ckpt/offsets/0")), "UTF-8")
    assert(off.contains("\"manifest\""),
      s"expected a compacted manifest offset, got: ${off.take(300)}")
    val mdir = new java.io.File(s"$ckpt/sources/0/graft-manifests")
    assert(mdir.exists && mdir.list().exists(_.endsWith(".list")),
      s"manifest files expected under ${mdir}")
    // a restart resolves the pointer and reads only NEW files
    writeGen(dir, 60, 80)
    assert(drainWith(2) == (60L until 80L))
  }

  test("native streaming sink: epoch-keyed files, exactly-once, fleet stays readable mid-stream") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = graft.util.Scratch.dir("fleet_stream_sink")
    val out = s"$root/out.avro"
    val mem = MemoryStream[Long]
    val q = mem.toDF().select($"value".as("id"))
      .writeStream.format("graft-avro")
      .option("path", out)
      .option("checkpointLocation", s"$root/ckpt")
      .start()
    mem.addData(0L until 50L: _*)
    q.processAllAvailable()
    val mid = spark.read.format("graft-avro").load(out)
    assert(mid.count() == 50, "fleet must be a valid batch source mid-stream")
    mem.addData(50L until 80L: _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.read.format("graft-avro").load(out)
      .collect().map(_.getLong(0)).sorted
    assert(got.toSeq == (0L until 80L), s"got ${got.length} rows")
    // epoch-keyed names: each batch's files carry its epoch tag
    val p = new org.apache.hadoop.fs.Path(out)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val names = fs.listStatus(p).map(_.getPath.getName)
      .filter(_.endsWith(".avro"))
    assert(names.forall(_.matches("part-\\d{5}-e\\d+\\.avro")),
      s"epoch-keyed names expected: ${names.toSeq}")
    assert(names.map(_.replaceAll(".*-e(\\d+)\\.avro", "$1")).distinct
      .length >= 2, "two epochs expected")
    // restart with the same checkpoint: nothing re-lands (idempotence)
    val q2 = mem.toDF().select($"value".as("id"))
      .writeStream.format("graft-avro")
      .option("path", out)
      .option("checkpointLocation", s"$root/ckpt")
      .start()
    q2.processAllAvailable()
    q2.stop()
    assert(spark.read.format("graft-avro").load(out).count() == 80,
      "restart on a drained checkpoint must not duplicate")
  }

  test("maxFilesPerTrigger batches admission; union equals the fleet") {
    import spark.implicits._
    val root = graft.util.Scratch.dir("fleet_stream_batched")
    val dir = s"$root/src.avro"
    writeGen(dir, 0, 40)
    writeGen(dir, 40, 80) // 4 files total (2 per generation)
    var batches = Vector.empty[(Long, Long)] // (batchId, rows)
    val q = spark.readStream.format("graft-avro")
      .option("maxFilesPerTrigger", "1").load(dir)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        batches :+= (id, b.count())
      }
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(batches.length >= 4,
      s"one file per micro-batch expected, got $batches")
    assert(batches.map(_._2).sum == 80L)
  }
}
