package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.util.Tables._
import graft.util.Determinism._

/** One event as fed to streaming graphs (mirrors the events table). */
case class EventRow(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double)

/** Per-user running state for the stateful graph. */
case class UserSpend(user_id: Long, total: Double, n: Long)

/** Structured Streaming operators (SURVEY.md §2.I). The graph builders
  * take any streaming (or batch) events DataFrame so tests can drive
  * them with MemoryStream and deterministic replays of events.parquet.
  *
  * Scale: each stateful op keys state by a real partition key (window ×
  * type, user_id) so state shards with the shuffle; watermarks bound
  * state size. In production the RocksDB state store provider
  * (spark.sql.streaming.stateStore.providerClass) keeps per-partition
  * state off-heap; tests flip it on.
  */
object StreamingOps {

  /** Tumbling 10-minute window counts per event type (append mode). */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .count()
      .select(col("window.start").as("bucket"), col("event_type"), col("count").as("n"))

  /** Sliding 10-minute window every 5 minutes. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
      .count()
      .select(col("window.start").as("bucket"), col("event_type"), col("count").as("n"))

  /** Session windows (30-minute gap) per user. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .count()
      .select(col("session_window.start").as("session_start"),
        col("user_id"), col("count").as("n"))

  /** Streaming dedup by event_id within the watermark (NS dedup op). */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Custom state: per-user running spend with processing-time timeout —
    * flatMapGroupsWithState (the stable Spark 4 custom-state API). */
  def runningSpend(s: SparkSession, events: Dataset[EventRow]): Dataset[UserSpend] = {
    import s.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(
        (uid: Long, rows: Iterator[EventRow], state: GroupState[UserSpend]) => {
          val prev = state.getOption.getOrElse(UserSpend(uid, 0.0, 0L))
          var total = prev.total
          var n = prev.n
          rows.foreach { e => total += e.value; n += 1 }
          val next = UserSpend(uid, total, n)
          state.update(next)
          Iterator(next)
        })
  }

  /** Spark 4 `transformWithState` processor: per-user running spend via
    * an explicit ValueState handle — the modern custom-state API (state
    * lives in the per-partition store, sharded by the groupBy key). */
  class SpendProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, EventRow, UserSpend] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode, TimerValues, ValueState}
    import org.apache.spark.sql.Encoders
    @transient private var state: ValueState[UserSpend] = _
    override def init(outputMode: OM, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[UserSpend]("spend",
        Encoders.product[UserSpend], org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[EventRow],
        timers: TimerValues): Iterator[UserSpend] = {
      val prev = Option(state.get()).getOrElse(UserSpend(key, 0.0, 0L))
      var total = prev.total
      var n = prev.n
      rows.foreach { e => total += e.value; n += 1 }
      val next = UserSpend(key, total, n)
      state.update(next)
      Iterator(next)
    }
  }

  /** Per-user running spend on the Spark 4 transformWithState API. */
  def runningSpendTws(s: SparkSession, events: Dataset[EventRow]): Dataset[UserSpend] = {
    import s.implicits._
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode}
    events
      .groupByKey(_.user_id)
      .transformWithState(new SpendProcessor, TimeMode.None(), OM.Update())
  }

  /** One emission of the EVICTING spend graphs: running totals while a
    * user is active; `closed = true` exactly once when the event-time
    * gap expires — after which the user's state is GONE (a later event
    * starts a fresh session). The timeout/eviction/late-data semantics
    * are pinned by twin specs on BOTH custom-state APIs. */
  case class SpendUpdate(user_id: Long, total: Double, n: Long,
      closed: Boolean)

  /** Per-user spend with EVENT-TIME idle eviction —
    * `flatMapGroupsWithState` spelling: accumulate per batch, arm the
    * timeout at (max seen event time + gap); when the WATERMARK passes
    * it, the timed-out group fires once, emits its final total tagged
    * closed, and clears its state. State is bounded by ACTIVE users,
    * not ever-seen users — the property that matters at 100 TB of
    * events. */
  def spendWithEviction(s: SparkSession, events: Dataset[EventRow],
      gapMinutes: Int = 30): Dataset[SpendUpdate] = {
    import s.implicits._
    val gapMs = gapMinutes * 60000L
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(),
        GroupStateTimeout.EventTimeTimeout())(
        (uid: Long, rows: Iterator[EventRow],
            state: GroupState[UserSpend]) => {
          if (state.hasTimedOut) {
            val fin = state.get
            state.remove()
            Iterator(SpendUpdate(uid, fin.total, fin.n, closed = true))
          } else {
            val prev = state.getOption.getOrElse(UserSpend(uid, 0.0, 0L))
            var total = prev.total
            var n = prev.n
            var maxTs = Long.MinValue
            rows.foreach { e =>
              total += e.value; n += 1
              maxTs = math.max(maxTs, e.ts.getTime)
            }
            val next = UserSpend(uid, total, n)
            state.update(next)
            // event-time timeouts must sit at/after the watermark; a
            // straggler batch arriving with the watermark already past
            // its own gap evicts on the next trigger instead of
            // failing the arm call
            state.setTimeoutTimestamp(math.max(maxTs + gapMs,
              state.getCurrentWatermarkMs() + 1L))
            Iterator(SpendUpdate(uid, total, n, closed = false))
          }
        })
  }

  /** The [[spendWithEviction]] TWIN on the Spark 4 transformWithState
    * API: the same accumulate / event-time-timer / evict contract via
    * an explicit ValueState handle plus `registerTimer` +
    * `handleExpiredTimer` (the StatefulProcessor spelling of
    * `setTimeoutTimestamp` + `hasTimedOut`). Timers re-arm per batch:
    * the previous timer is deleted so each user carries exactly one. */
  class SpendEvictProcessor(gapMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, EventRow, SpendUpdate] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode => OM, TimeMode, TimerValues, ValueState}
    import org.apache.spark.sql.Encoders
    @transient private var state: ValueState[UserSpend] = _
    override def init(outputMode: OM, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[UserSpend]("spend",
        Encoders.product[UserSpend],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[EventRow],
        timers: TimerValues): Iterator[SpendUpdate] = {
      val prev = Option(state.get()).getOrElse(UserSpend(key, 0.0, 0L))
      var total = prev.total
      var n = prev.n
      var maxTs = Long.MinValue
      rows.foreach { e =>
        total += e.value; n += 1
        maxTs = math.max(maxTs, e.ts.getTime)
      }
      state.update(UserSpend(key, total, n))
      getHandle.listTimers().foreach(t =>
        getHandle.deleteTimer(t.asInstanceOf[Long]))
      getHandle.registerTimer(math.max(maxTs + gapMs,
        timers.getCurrentWatermarkInMs() + 1L))
      Iterator(SpendUpdate(key, total, n, closed = false))
    }
    override def handleExpiredTimer(key: Long, timers: TimerValues,
        expired: ExpiredTimerInfo): Iterator[SpendUpdate] = {
      val fin = Option(state.get()).getOrElse(UserSpend(key, 0.0, 0L))
      state.clear()
      Iterator(SpendUpdate(key, fin.total, fin.n, closed = true))
    }
  }

  def spendWithEvictionTws(s: SparkSession, events: Dataset[EventRow],
      gapMinutes: Int = 30): Dataset[SpendUpdate] = {
    import s.implicits._
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode}
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .transformWithState(new SpendEvictProcessor(gapMinutes * 60000L),
        TimeMode.EventTime(), OM.Update())
  }

  /** Stream–stream interval join: each click attributed to the same
    * user's impression it followed within 10 minutes. Both sides carry
    * watermarks AND the join condition bounds event time on both sides,
    * so Spark can expire join state: an impression leaves state once
    * the click watermark passes imp_ts + 10 min — bounded state at any
    * scale, keyed by user_id so it shards with the shuffle. */
  def attachClicks(impressions: DataFrame, clicks: DataFrame): DataFrame = {
    val imp = impressions.select(col("event_id").as("imp_id"),
        col("user_id"), col("ts").as("imp_ts"))
      .withWatermark("imp_ts", "20 minutes")
    val clk = clicks.select(col("event_id").as("click_id"),
        col("user_id").as("click_user"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "20 minutes")
    imp.join(clk,
      col("user_id") === col("click_user") &&
        col("click_ts") >= col("imp_ts") &&
        col("click_ts") <= col("imp_ts") + expr("INTERVAL 10 MINUTES"))
      .select(col("imp_id"), col("click_id"), col("user_id"),
        col("imp_ts"), col("click_ts"))
  }

  /** Stream–static enrichment: events joined to the customer dim. */
  def enrich(events: DataFrame, customers: DataFrame): DataFrame =
    events.join(broadcast(customers),
      events("user_id") === customers("c_custkey"), "left_outer")
      .select(events("event_id"), events("user_id"), events("value"),
        customers("c_mktsegment"))

  /** §2.I batch twin (oracle-checked): same tumbling-window aggregation
    * over the batch events table — proves the window semantics that the
    * streaming tests replay. */
  def qBatchTumbling(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    events(s, dir)
      .groupBy(window($"ts", "10 minutes"), $"event_type")
      .agg(count(lit(1)).as("n"), r4(sum($"value")).as("sum_value"))
      .select(tstr($"window.start").as("bucket"), $"event_type", $"n", $"sum_value")
      .orderBy($"bucket", $"event_type")
  }

  /** §2.I streaming replay, ORACLE-CHECKED: the same tumbling-window
    * aggregation as qBatchTumbling executed as a real Structured
    * Streaming query — parquet file source → AvailableNow trigger →
    * complete-mode memory sink — then returned as a batch DataFrame for
    * the DuckDB compare. Proves the source→transform→sink wiring and
    * replay semantics end-to-end, not just via MemoryStream tests.
    * Complete mode (not append) because a bounded replay's watermark
    * never passes the final windows — append would withhold them and
    * diverge from the batch oracle. The memory sink holds only the
    * final (window × type) aggregate — bounded state; a production job
    * writes this graph to a file/Kafka sink with a durable checkpoint
    * (see StreamingSpec's foreachBatch tests). Fresh checkpoint per
    * call: AvailableNow against a reused checkpoint would treat the
    * input as already-processed and emit nothing. */
  /** The streaming events source for replay queries: the same schema-adaptive
    * ts normalization as Tables.events ([[graft.util.Tables.normalizeEventsTs]]),
    * but via readStream — the batch read supplies the on-disk schema, the
    * shared dispatch handles ns-long / NTZ / timestamp fixtures identically
    * in both paths. */
  // the batch schema probe costs ~90 ms per replay (parquet footer job)
  // and every replay over one fixture resolves the same schema — cache
  // it keyed by the file's identity (path + length + mtime), so a
  // driver-side fixture rewrite re-probes instead of serving stale
  private val eventsSchemaCache = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.types.StructType]()

  private def eventsStream(s: SparkSession, dir: String): DataFrame = {
    // nanosAsLong is pinned at session build (GraftSession.defaults) —
    // no conf side-effects in the loader path.
    val p = new org.apache.hadoop.fs.Path(s"$dir/events.parquet")
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    val st = fs.getFileStatus(p)
    val key = s"$p@${st.getLen}@${st.getModificationTime}"
    val rawSchema = eventsSchemaCache.computeIfAbsent(key,
      _ => s.read.option("pathGlobFilter", "events.parquet")
        .parquet(dir).schema)
    graft.util.Tables.normalizeEventsTs(
      s.readStream.schema(rawSchema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))
  }

  /** One checkpoint temp-root per JVM; per-call subdirs are deleted as
    * soon as their replay finishes (the memory sink holds the result),
    * the root on JVM exit — repeated Verify/Bench runs accumulate
    * nothing. */
  private lazy val ckptRoot: java.nio.file.Path = {
    // A bounded replay's checkpoint is pure scratch (deleted the moment
    // the memory sink holds the result), so prefer a RAM-backed tmpfs
    // (/dev/shm) over disk: offset/commit logs and HDFS-state-store
    // delta files are the replays' only I/O besides the source read.
    // Durable-checkpoint semantics stay exercised by StreamingSpec's
    // restart tests, which checkpoint to real disk.
    val shm = java.nio.file.Paths.get("/dev/shm")
    val base =
      if (java.nio.file.Files.isWritable(shm)) shm
      else java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir", "/tmp"))
    val p = java.nio.file.Files.createTempDirectory(base,
      "graft_stream_ckpt_" + ProcessHandle.current().pid())
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try graft.util.Scratch.deleteRecursively(p)
      catch { case _: Throwable => () }))
    p
  }

  /** Run a streaming graph to completion (AvailableNow) into a memory
    * sink and return the sink as a batch DataFrame. Fresh checkpoint
    * per call: AvailableNow against a reused checkpoint would treat the
    * input as already-processed and emit nothing. */
  private def replayToTable(s: SparkSession, mode: String)
      (build: SparkSession => DataFrame): DataFrame = {
    val ckpt = java.nio.file.Files.createTempDirectory(ckptRoot, "q").toString
    val name = "graft_stream_replay_" +
      java.util.UUID.randomUUID().toString.take(8)
    // The replay runs on a CHILD session (shared SparkContext, shared
    // cache/catalog state, same extensions; separate SQLConf and
    // temp-view namespace) so the replay-scoped shuffle-partition
    // override below cannot leak into a batch query that a long-lived
    // application plans concurrently on the caller's session — the
    // graph itself is built against the child via `build`.
    // Partition choice, re-measured r13 at sf0.1 with the progress
    // profiler (tools/ProfileReplay): warm replay ≈ 1.3 s, of which
    // addBatch ≈ 0.76 s is REAL work (100k rows through shuffle, state
    // store, and the complete-mode memory-sink collect) and the rest is
    // bounded machinery (incremental planning ~0.13 s, offset/commit
    // WAL ~0.12 s, sink scan ~0.18 s). 1/2/4/8/32 partitions time
    // within ~15%; 2 edges out 8 on the state-heavy join replay (fewer
    // store instances) and is kept. RocksDB was ALSO measured and is
    // ~5% slower at fixture scale (native init outweighs tiny-state
    // benefit), so replays keep the default provider; the RocksDB
    // posture for real 100 TB state stays exercised in StreamingSpec.
    val s2 = s.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "2")
    // A bounded AvailableNow replay's RESULT never depends on the
    // trailing no-data micro-batch (it exists to advance the watermark
    // for ongoing queries; complete-mode aggs re-emit everything each
    // batch, and append-mode join/dedup rows emit at arrival) — but it
    // costs a full planning/commit cycle per replay. Cross-batch
    // watermark semantics stay pinned by StreamingSpec's multi-batch
    // split-source tests, which run on the caller's session.
    s2.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    val q = build(s2).writeStream.format("memory").queryName(name)
      .outputMode(mode)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // replay is done and the memory sink holds the (bounded) result —
    // the checkpoint is dead weight from here
    graft.util.Scratch.deleteRecursively(java.nio.file.Paths.get(ckpt))
    // the sink's temp view lives in the child's namespace
    s2.table(name)
  }

  def qStreamTumblingReplay(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    replayToTable(s, "complete") { s2 =>
      eventsStream(s2, dir)
        .groupBy(window($"ts", "10 minutes"), $"event_type")
        .agg(count(lit(1)).as("n"), r4(sum($"value")).as("sum_value"))
        .select(tstr($"window.start").as("bucket"), $"event_type", $"n",
          $"sum_value")
    }.orderBy($"bucket", $"event_type")
  }

  /** §2.I streaming SLIDING-window replay, oracle-checked: 10-minute
    * windows sliding every 5 — each event lands in exactly TWO
    * overlapping windows — run as a real complete-mode AvailableNow
    * replay (the `slidingCounts` graph shape, plus the value sum).
    * Oracle: an event's window starts are floor₅(ts) and
    * floor₅(ts) − 5 min, unnested per event in DuckDB. Closes the
    * last batch↔replay asymmetry (tumbling/session/enrich/dedup all
    * have oracle-checked replays). */
  def qStreamSlidingReplay(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    replayToTable(s, "complete") { s2 =>
      eventsStream(s2, dir)
        .groupBy(window($"ts", "10 minutes", "5 minutes"), $"event_type")
        .agg(count(lit(1)).as("n"), r4(sum($"value")).as("sum_value"))
        .select(tstr($"window.start").as("bucket"), $"event_type", $"n",
          $"sum_value")
    }.orderBy($"bucket", $"event_type")
  }

  /** §2.I streaming SESSION-window replay, oracle-checked: real
    * streaming `session_window` (30-minute gap) counts per user,
    * replayed to completion and compared against DuckDB's gap-boundary
    * formulation. Session merge is STRICT overlap — an event exactly
    * gap after the previous one starts a NEW session — so the oracle
    * boundary condition is `ts >= prev_ts + 30 min`, unlike
    * q_sessionize_batch's `>` convention. */
  def qStreamSessionReplay(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    replayToTable(s, "complete") { s2 =>
      eventsStream(s2, dir)
        .groupBy(session_window($"ts", "30 minutes"), $"user_id")
        .agg(count(lit(1)).as("n"))
        .select(tstr($"session_window.start").as("session_start"),
          $"user_id", $"n")
    }.orderBy($"user_id", $"session_start")
  }

  /** §2.I stream–static join replay, oracle-checked: the enrich()
    * graph (stream events ⋈ broadcast customer dim) run as a real
    * append-mode streaming query — joins without aggregation stream
    * through row-by-row, so append needs no watermark here. Lands via
    * `replayToFleet` (foreachBatch → batchId-keyed fleet dirs): the
    * full enriched fact stream stays DISTRIBUTED end-to-end — written
    * by executor tasks, read back by a fleet scan — and the oracle
    * checks the complete read-back table, so a dropped/duplicated
    * batch or a mis-joined row still hash-mismatches. */
  def qStreamEnrichReplay(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    replayToFleet(s, "enrich") { s2 =>
      enrich(eventsStream(s2, dir), customer(s2, dir))
    }.orderBy($"event_id")
  }

  /** §2.I streaming DEDUP replay, oracle-checked: the `dedupStream`
    * graph (`dropDuplicatesWithinWatermark` on event_id) run as a real
    * streaming query over a DOUBLED source — the events stream unioned
    * with a second reader of the same files — so every event_id
    * arrives twice and the per-key dedup state provably suppresses the
    * copy (over the raw unique-id fixture, dedup would be a vacuous
    * pass-through). Output is the surviving (event_id, event_type,
    * user_id) projection: both copies of a row are identical, so WHICH
    * copy survives cannot affect parity. Lands via `replayToFleet` —
    * the deduped stream never touches the driver. Oracle: the plain
    * events projection — exactly one row per id. */
  def qStreamDedupReplay(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    replayToFleet(s, "dedup") { s2 =>
      dedupStream(eventsStream(s2, dir).unionByName(eventsStream(s2, dir)))
        .select($"event_id", $"event_type", $"user_id")
    }.orderBy($"event_id")
  }

  /** §2.I STREAM–STREAM interval-join replay, oracle-checked: the
    * `attachClicks` graph (watermarked both sides, event-time-bounded
    * join, state expires once the click watermark passes
    * imp_ts + 10 min) run as a real append-mode replay — each click
    * attributed to every same-user "view" within the 10 minutes
    * before it. A bounded AvailableNow replay is EXACT here: the
    * single parquet file lands in one micro-batch, watermarks only
    * advance after it, so no join state evicts before matching and
    * append emits precisely the batch join's matches — which is what
    * the DuckDB oracle computes. Closes the last §2.I asymmetry: every
    * streaming graph family (tumbling/sliding/session/enrich/dedup/
    * stream-stream join) now has an oracle-checked replay. Lands via
    * `replayToFleet` — the match stream is a fact stream, so it takes
    * the distributed landing path like enrich/dedup, never a
    * driver-side memory sink. */
  def qStreamJoinReplay(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    replayToFleet(s, "join") { s2 =>
      val ev = eventsStream(s2, dir)
      attachClicks(ev.filter($"event_type" === "view"),
        ev.filter($"event_type" === "click"))
        .select($"imp_id", $"click_id", $"user_id",
          tstr($"imp_ts").as("imp_ts"), tstr($"click_ts").as("click_ts"))
    }.orderBy($"imp_id", $"click_id")
  }

  /** §2.I batch sessionization (the batch twin of `session_window`):
    * a session boundary is a gap > 30 minutes since the user's previous
    * event; session id = running count of boundaries. One shuffle on
    * user_id; the lag + cumulative-sum window pair is the canonical
    * distributed sessionizer at any scale. */
  def qSessionizeBatch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, dir)
      .withColumn("prev_ts", lag($"ts", 1).over(byUser))
      // direct timestamp comparison — exact at each engine's precision;
      // truncating to whole seconds would misclassify gaps in (30m, 30m1s)
      .withColumn("boundary",
        when($"prev_ts".isNull ||
          $"ts" > $"prev_ts" + expr("INTERVAL 30 MINUTES"), 1L)
          .otherwise(0L))
      .withColumn("session_id", sum($"boundary").over(run))
      .groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n_events"),
        tstr(min($"ts")).as("session_start"),
        r4(sum($"value")).as("session_value"))
      .orderBy($"user_id", $"session_id")
  }

  /** §2.I streaming SINK into an avro fleet — the production landing
    * path: a stream's micro-batches appended to a table-like fleet
    * directory with EXACTLY-ONCE semantics. Each micro-batch writes via
    * `foreachBatch` + the V2 `graft-avro` writer in `overwrite` mode
    * into a batchId-derived subdirectory, so a batch REPLAYED after a
    * crash (same batchId — Spark's offset-log contract) overwrites its
    * own output instead of duplicating rows: idempotence via
    * deterministic placement, the same recipe Delta/Iceberg sinks use
    * with (appId, batchId) txn markers. The read-back aggregates the
    * whole fleet and the oracle is the same aggregate over the SOURCE
    * table — a dropped batch, duplicated batch, or partial-batch commit
    * all hash-mismatch.
    *
    * Scale: each micro-batch write is a normal distributed V2 commit
    * (attempt temps, rename-if-absent, `_SUCCESS` last) and the sink
    * accumulates subdirectories per batch — at 100 TB the follow-up is
    * the existing `q_fleet_compact` pass folding small batch dirs into
    * right-sized files; nothing here serializes through the driver. */
  /** Shared replay-through-fleet harness: run a streaming graph to
    * completion (AvailableNow) with `foreachBatch` landing each
    * micro-batch in a batchId-derived `graft-avro` subdirectory
    * (EXACTLY-ONCE: a batch replayed after a crash — same batchId,
    * Spark's offset-log contract — overwrites its own output instead
    * of duplicating rows), then return the DISTRIBUTED read-back of
    * all batch fleets as a batch DataFrame. Nothing materializes on
    * the driver: each micro-batch write is a normal V2 commit and the
    * read-back is a pruned fleet scan — this is the production landing
    * path, so the registered replay shapes ARE the shapes a real
    * pipeline runs (the r13 memory-sink harness put O(events) through
    * the driver for append-mode graphs). Codec deflate-1: a replay
    * fleet is scratch written once and read once — compression speed
    * beats ratio on this path. */
  private def replayToFleet(s: SparkSession, tag: String)
      (build: SparkSession => DataFrame): DataFrame = {
    // write-once/read-once batch fleets are scratch — RAM-backed dir
    val root = graft.util.Scratch.ephemeralDir(s"stream_fleet_$tag")
    // deterministic re-runs within one JVM: clear prior batch dirs so a
    // bench warm lap can't read a stale batch count (the idempotent
    // REPLAY-overwrite path is pinned separately in StreamingSpec)
    graft.util.Scratch.deleteRecursively(java.nio.file.Paths.get(root))
    val ckpt = java.nio.file.Files.createTempDirectory(ckptRoot, "q").toString
    val s2 = s.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "2")
    s2.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    val q = build(s2).writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.write.format("graft-avro").option("codec", "deflate-1")
          .mode("overwrite").save(s"$root/batch_$batchId.avro")
      }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    graft.util.Scratch.deleteRecursively(java.nio.file.Paths.get(ckpt))
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sessionState.newHadoopConf())
    val batchDirs = fs.listStatus(new org.apache.hadoop.fs.Path(root))
      .filter(_.isDirectory).map(_.getPath.toString).sorted
    batchDirs.map(p => s.read.format("graft-avro").load(p))
      .reduce(_ unionByName _)
  }


  /** §2.I the fleet as a STREAMING SOURCE — the read dual of
    * `q_stream_fleet_sink`: `spark.readStream.format("graft-avro")`
    * tails a fleet directory ([[graft.sources.AvroFleetMicroBatchStream]]
    * — offsets are admitted-file lists, AvailableNow snapshots the
    * listing once), here drained through a complete-mode aggregate and
    * oracle-checked against the same aggregate over the source table.
    * A dropped or double-admitted file hash-mismatches. Together with
    * the sink, fleet→stream→transform→fleet pipelines run entirely on
    * the directory contract. */
  def qStreamFleetSource(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // the staged source fleet is written once per fixture generation
    // (the stream is the operator; the landing zone exists)
    val fleet = graft.util.GoldenFixture.dir(s, s"$dir/events.parquet",
      "stream_fleet_src") { root =>
      events(s, dir).select($"event_id", $"event_type", $"value")
        .write.format("graft-avro").option("codec", "deflate-1")
        .mode("overwrite").save(s"$root/events.avro")
    } + "/events.avro"
    replayToTable(s, "complete") { s2 =>
      s2.readStream.format("graft-avro").load(fleet)
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), r4(sum($"value")).as("sum_value"))
    }.orderBy($"event_type")
  }

  def qStreamFleetSink(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    replayToFleet(s, "sink") { s2 =>
      eventsStream(s2, dir)
        .select($"event_id", $"ts", $"event_type", $"value")
    }
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), r4(sum($"value")).as("sum_value"))
      .orderBy($"event_type")
  }

  /** §2.I NATIVE streaming fleet sink — the same landing contract as
    * `q_stream_fleet_sink` but through the connector's own
    * `StreamingWrite` (`writeStream.format("graft-avro")`, no
    * foreachBatch): every task's file is named `part-{pid}-e{epoch}`
    * and the rename-if-absent commit skips existing names, so a
    * replayed epoch lands zero duplicates — exactly-once by
    * deterministic placement, with per-epoch sidecar stats and
    * `_SUCCESS` re-marking keeping the growing fleet a valid source
    * at every instant (FleetStreamSpec pins mid-stream readability
    * and drained-checkpoint restarts). */
  def qStreamFleetSinkNative(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val root = graft.util.Scratch.ephemeralDir("stream_fleet_native")
    graft.util.Scratch.deleteRecursively(java.nio.file.Paths.get(root))
    val ckpt = java.nio.file.Files.createTempDirectory(ckptRoot, "q").toString
    val s2 = s.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "2")
    s2.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    val q = eventsStream(s2, dir)
      .select($"event_id", $"event_type", $"value")
      .writeStream.format("graft-avro")
      .option("path", s"$root/out.avro")
      .option("codec", "deflate-1")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    graft.util.Scratch.deleteRecursively(java.nio.file.Paths.get(ckpt))
    s.read.format("graft-avro").load(s"$root/out.avro")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), r4(sum($"value")).as("sum_value"))
      .orderBy($"event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_batch_tumbling" -> qBatchTumbling _,
    "q_stream_fleet_sink" -> qStreamFleetSink _,
    "q_stream_fleet_sink_native" -> qStreamFleetSinkNative _,
    "q_stream_fleet_source" -> qStreamFleetSource _,
    "q_stream_tumbling_replay" -> qStreamTumblingReplay _,
    "q_stream_sliding_replay" -> qStreamSlidingReplay _,
    "q_stream_join_replay" -> qStreamJoinReplay _,
    "q_stream_session_replay" -> qStreamSessionReplay _,
    "q_stream_enrich_replay" -> qStreamEnrichReplay _,
    "q_stream_dedup_replay" -> qStreamDedupReplay _,
    "q_sessionize_batch" -> qSessionizeBatch _
  )

  val oracleSql: Map[String, String] = Map(
    "q_stream_fleet_sink" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_stream_fleet_source" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_stream_fleet_sink_native" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_batch_tumbling" ->
      """SELECT strftime(time_bucket(INTERVAL '10 minutes', ts),
        |    '%Y-%m-%d %H:%M:%S') AS bucket,
        |  event_type, count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM events
        |GROUP BY bucket, event_type
        |ORDER BY bucket, event_type""".stripMargin,
    "q_stream_tumbling_replay" ->
      """SELECT strftime(time_bucket(INTERVAL '10 minutes', ts),
        |    '%Y-%m-%d %H:%M:%S') AS bucket,
        |  event_type, count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM events
        |GROUP BY bucket, event_type
        |ORDER BY bucket, event_type""".stripMargin,
    // each event unnests into its two overlapping 5-min-slide buckets
    "q_stream_sliding_replay" ->
      """WITH slid AS (
        |  SELECT unnest([time_bucket(INTERVAL '5 minutes', ts),
        |      time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes'])
        |      AS bucket_ts,
        |    event_type, value
        |  FROM events)
        |SELECT strftime(bucket_ts, '%Y-%m-%d %H:%M:%S') AS bucket,
        |  event_type, count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM slid
        |GROUP BY bucket, event_type
        |ORDER BY bucket, event_type""".stripMargin,
    // the bounded replay's single micro-batch evicts no join state
    // before matching, so append emits exactly the batch join
    "q_stream_join_replay" ->
      """SELECT v.event_id AS imp_id, c.event_id AS click_id, v.user_id,
        |  strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS imp_ts,
        |  strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts
        |FROM (SELECT * FROM events WHERE event_type = 'view') v
        |JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON v.user_id = c.user_id AND c.ts >= v.ts
        |  AND c.ts <= v.ts + INTERVAL 10 MINUTE
        |ORDER BY imp_id, click_id""".stripMargin,
    // the streaming query doubles its source then dedups; one row per
    // event_id is exactly the raw projection
    "q_stream_dedup_replay" ->
      """SELECT event_id, event_type, user_id FROM events
        |ORDER BY event_id""".stripMargin,
    "q_stream_session_replay" ->
      """WITH marked AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS boundary
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessions AS (
        |  SELECT user_id, ts,
        |    sum(boundary) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM marked)
        |SELECT strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  user_id, count(*) AS n
        |FROM sessions
        |GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    "q_stream_enrich_replay" ->
      """SELECT e.event_id, e.user_id, e.value, c.c_mktsegment
        |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
        |ORDER BY e.event_id""".stripMargin,
    "q_sessionize_batch" ->
      """WITH marked AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS boundary
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessions AS (
        |  SELECT user_id, ts, value,
        |    CAST(sum(boundary) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS session_id
        |  FROM marked)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  round(sum(value), 4) AS session_value
        |FROM sessions
        |GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin
  )
}
