package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming._

/** Structured Streaming tests (SURVEY.md §2.I): MemoryStream-driven
  * graphs with deterministic input, RocksDB state store, late-data
  * drop assertions, and batch/stream agreement. */
class StreamingSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")

  private def startQuery(df: org.apache.spark.sql.DataFrame, name: String,
      mode: OutputMode) = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    df.writeStream.format("memory").queryName(name).outputMode(mode)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory(s"ckpt_$name").toString)
      .start()
  }

  test("tumbling window counts + late row dropped in append mode") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[EventRow]
    val q = startQuery(StreamingOps.tumblingCounts(in.toDF()), "tumbling",
      OutputMode.Append())
    // two full 10-min buckets, then advance watermark far ahead
    in.addData(EventRow(1, ts(1), 1, "click", 1.0),
      EventRow(2, ts(2), 1, "click", 1.0),
      EventRow(3, ts(11), 2, "view", 1.0))
    q.processAllAvailable()
    in.addData(EventRow(4, ts(59), 1, "click", 1.0)) // watermark -> 00:49
    q.processAllAvailable()
    // late event for the long-closed first bucket: must be DROPPED
    in.addData(EventRow(5, ts(1), 9, "click", 99.0))
    q.processAllAvailable()
    in.addData(EventRow(6, ts(59), 1, "click", 1.0)) // nudge another batch
    q.processAllAvailable()
    val out = spark.table("tumbling").collect()
      .map(r => (r.getAs[Timestamp]("bucket").toString, r.getAs[String]("event_type"), r.getAs[Long]("n")))
    q.stop()
    assert(out.contains(("2024-01-01 00:00:00.0", "click", 2L)),
      s"first bucket wrong: ${out.mkString(",")}")
    assert(!out.exists(_._3 == 3L), s"late row was not dropped: ${out.mkString(",")}")
  }

  test("sliding windows assign each event to overlapping buckets") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[EventRow]
    val q = startQuery(StreamingOps.slidingCounts(in.toDF()), "sliding",
      OutputMode.Complete())
    // 00:07 lands in windows [00:00,00:10) and [00:05,00:15)
    in.addData(EventRow(1, ts(7), 1, "click", 1.0))
    q.processAllAvailable()
    val buckets = spark.table("sliding").collect()
      .map(_.getAs[Timestamp]("bucket").toString).sorted
    q.stop()
    assert(buckets.toSeq == Seq("2024-01-01 00:00:00.0", "2024-01-01 00:05:00.0"),
      s"got ${buckets.mkString(",")}")
  }

  test("session windows merge events within the gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[EventRow]
    val q = startQuery(StreamingOps.sessionCounts(in.toDF()), "sessions",
      OutputMode.Complete())
    in.addData(EventRow(1, ts(0), 7, "click", 1.0),
      EventRow(2, ts(10), 7, "click", 1.0),  // same session (gap < 30m)
      EventRow(3, ts(55), 7, "click", 1.0))  // new session
    q.processAllAvailable()
    val out = spark.table("sessions").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n")))
    q.stop()
    assert(out.toSet == Set((7L, 2L), (7L, 1L)), s"got ${out.mkString(",")}")
  }

  test("streaming dedup drops in-watermark duplicate event_ids") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[EventRow]
    val q = startQuery(StreamingOps.dedupStream(in.toDF()), "dedup",
      OutputMode.Append())
    in.addData(EventRow(1, ts(1), 1, "click", 1.0),
      EventRow(1, ts(2), 1, "click", 1.0),  // dup id
      EventRow(2, ts(3), 1, "view", 1.0))
    q.processAllAvailable()
    val n = spark.table("dedup").count()
    q.stop()
    assert(n == 2, s"expected 2 rows after dedup, got $n")
  }

  test("stateful running spend accumulates across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[EventRow]
    val q = StreamingOps.runningSpend(spark, in.toDS()).writeStream
      .format("memory").queryName("spend").outputMode("update")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt_spend").toString)
      .start()
    in.addData(EventRow(1, ts(1), 5, "buy", 10.0))
    q.processAllAvailable()
    in.addData(EventRow(2, ts(2), 5, "buy", 2.5))
    q.processAllAvailable()
    val last = spark.table("spend").collect()
      .filter(_.getAs[Long]("user_id") == 5L)
      .map(r => (r.getAs[Double]("total"), r.getAs[Long]("n"))).last
    q.stop()
    assert(last == (12.5, 2L), s"got $last")
  }

  test("transformWithState running spend accumulates (Spark 4 API)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[EventRow]
    val q = StreamingOps.runningSpendTws(spark, in.toDS()).writeStream
      .format("memory").queryName("spend_tws").outputMode("update")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt_tws").toString)
      .start()
    in.addData(EventRow(1, ts(1), 9, "buy", 4.0))
    q.processAllAvailable()
    in.addData(EventRow(2, ts(2), 9, "buy", 6.0))
    q.processAllAvailable()
    val last = spark.table("spend_tws").collect()
      .filter(_.getAs[Long]("user_id") == 9L)
      .map(r => (r.getAs[Double]("total"), r.getAs[Long]("n"))).last
    q.stop()
    assert(last == (10.0, 2L), s"got $last")
  }

  private def evictionTwinCase(name: String,
      graph: org.apache.spark.sql.Dataset[EventRow] =>
        org.apache.spark.sql.Dataset[StreamingOps.SpendUpdate]): Unit = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[EventRow]
    // RocksDB provider explicitly on for both custom-state APIs
    // (transformWithState requires it; the fMGWS twin runs the same
    // store so the pair is comparable)
    val q = startQuery(graph(in.toDS()).toDF(), name, OutputMode.Update())
    def rows(): Seq[(Long, Double, Long, Boolean)] =
      spark.table(name).collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[Double]("total"), r.getAs[Long]("n"),
        r.getAs[Boolean]("closed"))).toSeq
    try {
      // user 5 active at minutes 1-2; user 6 at minute 2
      in.addData(EventRow(1, ts(1), 5, "buy", 10.0))
      in.addData(EventRow(2, ts(2), 5, "buy", 2.5),
        EventRow(3, ts(2), 6, "buy", 7.0))
      q.processAllAvailable()
      assert(rows().contains((5L, 12.5, 2L, false)))
      assert(rows().contains((6L, 7.0, 1L, false)))
      assert(!rows().exists(_._4), s"nothing evicts yet: ${rows()}")
      // LATE DATA: watermark is ~minute -8 (max 2 - 10); a minute-1
      // event is NOT late yet and folds in
      in.addData(EventRow(4, ts(1), 6, "buy", 1.0))
      q.processAllAvailable()
      assert(rows().contains((6L, 8.0, 2L, false)))
      // advance event time far past gap(30) + watermark(10): minute 50
      // moves the watermark to 40 > 2 + 30 — both idle users EVICT
      // with their final totals, exactly once
      in.addData(EventRow(5, ts(50), 7, "buy", 1.0))
      q.processAllAvailable()
      // eviction fires when the ARMED timer is strictly below the new
      // watermark; one more watermark advance guarantees the firing
      // trigger ran after the move
      in.addData(EventRow(6, ts(51), 7, "buy", 1.0))
      q.processAllAvailable()
      val closed = rows().filter(_._4)
      assert(closed.toSet == Set((5L, 12.5, 2L, true), (6L, 8.0, 2L, true)),
        s"idle users must evict once with final totals: ${rows()}")
      // TIMEOUT CLEARED STATE: a post-eviction event starts FRESH
      in.addData(EventRow(7, ts(52), 5, "buy", 3.0))
      q.processAllAvailable()
      assert(rows().contains((5L, 3.0, 1L, false)),
        s"state must be gone after eviction: ${rows()}")
      // WATERMARK-LATE DATA: minute 1 << watermark (≈42) — the engine
      // drops it before the stateful operator; totals stand
      val before = rows().size
      in.addData(EventRow(8, ts(1), 5, "buy", 100.0))
      q.processAllAvailable()
      assert(rows().size == before,
        s"a dropped late row must emit nothing: ${rows()}")
      assert(!rows().exists(r => r._1 == 5L && r._2 > 100.0),
        s"a watermark-late row must not fold into state: ${rows()}")
    } finally q.stop()
  }

  test("fMGWS eviction twin: event-time timeout evicts idle users once; late data pinned") {
    evictionTwinCase("spend_evict_fmgws",
      ds => StreamingOps.spendWithEviction(spark, ds))
  }

  test("transformWithState eviction twin: registerTimer/handleExpiredTimer matches fMGWS") {
    evictionTwinCase("spend_evict_tws",
      ds => StreamingOps.spendWithEvictionTws(spark, ds))
  }

  test("stream-stream interval join attributes clicks within the window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[EventRow]
    val clks = MemoryStream[EventRow]
    val q = startQuery(StreamingOps.attachClicks(imps.toDF(), clks.toDF()),
      "attrib", OutputMode.Append())
    imps.addData(EventRow(10, ts(1), 1, "view", 1.0),
      EventRow(11, ts(2), 2, "view", 1.0))
    clks.addData(
      EventRow(20, ts(5), 1, "click", 1.0),   // 4 min after imp 10: match
      EventRow(21, ts(30), 2, "click", 1.0),  // 28 min after imp 11: outside
      EventRow(22, ts(3), 7, "click", 1.0))   // no impression for user 7
    q.processAllAvailable()
    // advance both watermarks so matched rows are emitted in append mode
    imps.addData(EventRow(12, ts(59), 9, "view", 1.0))
    clks.addData(EventRow(23, ts(59), 9, "click", 99.0))
    q.processAllAvailable()
    val out = spark.table("attrib").collect()
      .map(r => (r.getAs[Long]("imp_id"), r.getAs[Long]("click_id"))).toSet
    q.stop()
    assert(out.contains((10L, 20L)), s"missing attributed pair: $out")
    assert(!out.contains((11L, 21L)), s"out-of-window click joined: $out")
    assert(!out.exists(_._2 == 22L), s"userless click joined: $out")
  }

  test("stream-static enrich joins the customer dim") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[EventRow]
    val q = startQuery(
      StreamingOps.enrich(in.toDF(), graft.util.Tables.customer(spark, sfDir)),
      "enrich", OutputMode.Append())
    in.addData(EventRow(1, ts(1), 3, "click", 1.0))
    q.processAllAvailable()
    val rows = spark.table("enrich").collect()
    q.stop()
    assert(rows.length == 1 && rows.head.getAs[String]("c_mktsegment") != null)
  }

  /** One single-part parquet file per micro-batch: write via Spark,
    * move the part file to `dir/name`, pin mtime so the file source's
    * (timestamp, path) ordering is deterministic. */
  private def writeSplitFile(rows: Seq[EventRow], dir: java.nio.file.Path,
      name: String, mtime: Long): Unit = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("ss_split_tmp")
    rows.toDF().coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = new java.io.File(tmp.toString).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .get
    java.nio.file.Files.copy(part.toPath, dir.resolve(name))
    assert(dir.resolve(name).toFile.setLastModified(mtime))
    graft.util.Scratch.deleteRecursively(tmp)
  }

  private def runSplitJoin(srcDir: java.nio.file.Path,
      name: String): (Set[(Long, Long)], Int) = {
    import spark.implicits._
    val schema = Seq.empty[EventRow].toDF().schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir.toString)
    val q = StreamingOps.attachClicks(src.filter($"event_type" === "view"),
        src.filter($"event_type" === "click"))
      .writeStream.format("memory").queryName(name).outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory(s"ckpt_$name").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val batches = q.recentProgress.count(_.numInputRows > 0)
    (spark.table(name).select($"imp_id", $"click_id")
      .as[(Long, Long)].collect().toSet, batches)
  }

  test("stream-stream join is exact across multiple micro-batches (in-order)") {
    // The hard part the single-file replay can't stress: ≥2 real
    // micro-batches (split source + maxFilesPerTrigger=1) with a
    // watermark advance between them and a CROSS-BATCH match — a
    // file-2 click attributed to a file-1 impression whose state
    // survived eviction. With in-order arrivals inside the 20-minute
    // watermark delay, append must emit exactly the batch join.
    val srcDir = java.nio.file.Files.createTempDirectory("ss_join_ordered")
    writeSplitFile(Seq(
      EventRow(1, ts(1), 1, "view", 0), EventRow(2, ts(5), 1, "click", 0),
      EventRow(3, ts(20), 2, "view", 0), EventRow(4, ts(29), 2, "click", 0)),
      srcDir, "f1.parquet", 1000000L)
    // batch 2: click 5 @00:25 is a CROSS-BATCH match for view 3 @00:20
    // (click watermark after batch 1 = 00:29 − 20 min = 00:09, so
    // neither the click is late nor view 3's state evicted)
    writeSplitFile(Seq(
      EventRow(5, ts(25), 2, "click", 0),
      EventRow(6, ts(31), 1, "view", 0), EventRow(7, ts(35), 1, "click", 0)),
      srcDir, "f2.parquet", 2000000L)
    val (got, batches) = runSplitJoin(srcDir, "ss_multi_ordered")
    assert(batches >= 2, s"expected a multi-batch run, got $batches batches")
    // the full batch join of the union — including the cross-batch pair
    assert(got == Set((1L, 2L), (3L, 4L), (3L, 5L), (6L, 7L)), got.toString)
  }

  test("stream-stream join drops exactly the watermark-late rows (documented)") {
    // The legitimate divergence from the batch oracle, pinned — with
    // the two semantics this test empirically forced us to document:
    // (1) the GLOBAL watermark is the MIN across all watermarked
    // sources (multipleWatermarkPolicy default), so BOTH sides need a
    // batch-1 driver event to advance it; (2) join state is evicted at
    // END of a batch after the watermark passes it, so a late row in
    // the IMMEDIATELY-next batch can still match (Spark's guarantee is
    // no-false-DROPS, not guaranteed drops) — the guaranteed-drop
    // regime needs an intervening batch whose cleanup ran. Earlier
    // versions of this test missing either ingredient saw the "late"
    // pair emitted.
    val srcDir = java.nio.file.Files.createTempDirectory("ss_join_late")
    writeSplitFile(Seq(
      EventRow(1, ts(1), 1, "view", 0),
      EventRow(2, ts(59), 8, "view", 0),   // imp watermark → 00:39
      EventRow(3, ts(59), 9, "click", 0)), // click watermark → 00:39
      srcDir, "f1.parquet", 1000000L)
    // batch 2 runs with watermark 00:39 and its end-of-batch cleanup
    // evicts view 1 (retained only to imp_ts + 10 min = 00:11)
    writeSplitFile(Seq(EventRow(4, ts(58), 7, "view", 0)),
      srcDir, "f2.parquet", 2000000L)
    // batch 3: click 5 @00:05 would match view 1 in the batch join,
    // but its impression's state is gone and the row is below the
    // watermark — the replay legitimately emits nothing
    writeSplitFile(Seq(EventRow(5, ts(5), 1, "click", 0)),
      srcDir, "f3.parquet", 3000000L)
    val (got, batches) = runSplitJoin(srcDir, "ss_multi_late")
    assert(batches >= 3, s"expected a 3-batch run, got $batches batches")
    // batch join would be {(1,5)}; the replay legitimately emits nothing
    assert(got == Set.empty[(Long, Long)],
      s"late click should have been dropped by the watermark: $got")
  }

  test("batch twin agrees with a foreachBatch streaming replay") {
    import spark.implicits._
    // batch result on sf0.001
    val batch = StreamingOps.qBatchTumbling(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // stream the same parquet through the same window graph
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[EventRow]
    val q = startQuery(
      graft.streaming.StreamingOps.tumblingCounts(in.toDF()), "twin",
      OutputMode.Complete())
    val evs = graft.util.Tables.events(spark, sfDir)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[EventRow].collect()
    in.addData(evs.toIndexedSeq)
    q.processAllAvailable()
    val stream = spark.table("twin").collect()
      .map(r => (r.getAs[Timestamp]("bucket").toString.stripSuffix(".0"),
        r.getAs[String]("event_type"), r.getAs[Long]("n"))).toSet
    q.stop()
    val batchNorm = batch.map { case (b, t, n) => (b.stripSuffix(".0"), t, n) }
    assert(stream == batchNorm,
      s"stream/batch disagree: only-stream=${stream -- batchNorm} only-batch=${batchNorm -- stream}")
  }

  test("fleet sink replays idempotently: a re-written batchId does not duplicate") {
    import spark.implicits._
    // the exactly-once recipe under a simulated post-crash replay: the
    // SAME micro-batch written twice to its batchId-derived dir (what a
    // restarted query does after committing offsets but before marking
    // the batch done) must leave exactly one copy
    val root = graft.util.Scratch.dir("fleet_sink_replay_spec")
    val batch = graft.util.Tables.events(spark, sfDir)
      .select($"event_id", $"ts", $"event_type", $"value")
    val n = batch.count()
    batch.write.format("graft-avro").mode("overwrite").save(s"$root/batch_7.avro")
    batch.write.format("graft-avro").mode("overwrite").save(s"$root/batch_7.avro")
    val got = spark.read.format("graft-avro").load(s"$root/batch_7.avro")
    assert(got.count() == n, "replayed batch must overwrite, not append")
    assert(got.select("event_id").distinct().count() == n)
  }
}
