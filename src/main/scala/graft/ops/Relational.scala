package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables._
import graft.util.Determinism._

/** Relational core (SURVEY.md §2.A scans, §2.B projections/filters,
  * §2.F sorts/limits/top-k, §2.G set ops).
  *
  * Scale notes:
  *  - All filters are column-vs-literal → pushed into the parquet scan
  *    (row-group + page-index pruning at 100 TB).
  *  - Projections select narrow early → parquet column pruning.
  *  - `q_limit_topn` lowers to TakeOrderedAndProject (per-partition heap
  *    + driver merge of k rows — no global sort at any scale).
  *  - `q_topk_pergroup` is a single window over a shuffle by group key;
  *    at 100 TB the rank filter happens stream-wise per group, never
  *    materializing more than one group's run per task.
  *  - Set ops shuffle on the full row hash — acceptable because inputs
  *    are pre-projected to narrow key columns first.
  */
object Relational {

  /** Per-JVM scratch dir for roundtrip scan/sink queries — pid-suffixed
    * against concurrent JVMs and deleted on JVM exit (graft.util.Scratch)
    * so repeated runs don't accumulate temp data. */
  private def scratch(name: String): String = graft.util.Scratch.dir(name)

  /** §2.A full parquet scan (the "load sheet" path of the reference). */
  def qScanParquet(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    nation(s, dir).orderBy($"n_nationkey")
  }

  /** §2.A CSV scan (the reference's conceptual load path): materialize
    * a CSV copy of region inside the query, read it back with
    * header + schema inference; the oracle checks the roundtripped
    * values against the parquet original. Region is a 5-row dimension —
    * the coalesce(1) is a fixture convenience, not a scan pattern. */
  /** §2.A COLUMNAR FLEET — the parquet data-file tier over the same
    * transactional manifest ([[graft.sources.ParquetFleet]], r20): the
    * query stages customer as a committed parquet fleet, lands a
    * MERGE-ON-READ delete as `_metadata.row_index` vectors (data files
    * byte-identical), and reads the survivors through the VECTORIZED
    * parquet scan + DV anti-join; `v1_rows` proves the pre-delete
    * generation still time-travels. The oracle replays the surviving
    * set (and the v1 count) from the base table — a leaked deleted
    * row, a lost survivor, or broken time travel hash-mismatches. At
    * 100 TB this tier is the scan-optimized data plane: ScanTierBench
    * measures 2.5–3.6× over avro-OCF on scan-bound shapes (SURVEY §8). */
  def qScanParquetFleet(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val root = graft.util.Scratch.dir("pqfleet_q")
    val fleet = s"$root/cust.parquet"
    val p = new org.apache.hadoop.fs.Path(fleet)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    fs.delete(p, true)
    graft.sources.ParquetFleet.overwrite(
      customer(s, dir).select($"c_custkey", $"c_name",
        round($"c_acctbal", 4).as("c_acctbal"))
        .repartitionByRange(4, $"c_custkey"), fleet)         // v1
    graft.sources.ParquetFleet.delete(s, fleet,
      $"c_custkey" % 7 === 3)                                // v2 (MOR)
    val v1 = graft.sources.ParquetFleet.read(s, fleet, Some(1L))
      .agg(count(lit(1)).as("v1_rows"))
    graft.sources.ParquetFleet.read(s, fleet)
      .crossJoin(broadcast(v1))
      .orderBy($"c_custkey")
  }

  /** §2.A COLUMNAR FLEET FILE SKIPPING (r20): every `ParquetFleet`
    * commit captures footer-derived min/max/null-count stats (zero
    * data reads — [[graft.sources.ParquetFleetStats]]) into the same
    * `_stats.json` sidecar the avro tier proves skips from; `scan`
    * prunes the range-clustered file list through
    * `FleetStats.neverMatches` BEFORE the vectorized read. The query
    * stages orders range-clustered on o_orderkey, lands a MOR delete,
    * and scans a selective range+prefix predicate — the pruned path
    * must still apply the deletion vectors of the surviving files and
    * re-apply the full predicate, so a wrong skip proof, a dropped
    * DV, or a lost survivor all hash-mismatch. At 100 TB the point is
    * the files NOT read: a key-range predicate over a clustered fleet
    * touches its files and no others, proven from the sidecar alone. */
  def qScanParquetFleetSkip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val root = graft.util.Scratch.dir("pqfleet_skip_q")
    val fleet = s"$root/orders.parquet"
    val p = new org.apache.hadoop.fs.Path(fleet)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    fs.delete(p, true)
    graft.sources.ParquetFleet.overwrite(
      orders(s, dir).select($"o_orderkey", $"o_custkey",
        r4($"o_totalprice").as("o_totalprice"), $"o_orderpriority")
        .repartitionByRange(8, $"o_orderkey"), fleet)        // v1
    graft.sources.ParquetFleet.delete(s, fleet,
      $"o_orderkey" % 10 === 7)                              // v2 (MOR)
    graft.sources.ParquetFleet.scan(s, fleet,
      $"o_orderkey" <= 6000L && $"o_orderpriority".startsWith("1"))
      .orderBy($"o_orderkey")
  }

  /** §2.A COLUMNAR FLEET METADATA TIERS (r20): `count` answers from
    * sidecar rows minus vector cardinalities (no data file opened on
    * the clean path), `minMax` from sidecar bounds for DV-free files
    * with a re-scan of only the DV-bound ones, and the v1 count rides
    * time travel. The staged delete is SURGICAL (first file's key
    * range only) so the extremum answers genuinely split across both
    * tiers: min comes from the re-scanned dirty file (its sidecar
    * bound — key 1 — is deleted, so a sidecar-only answer would be
    * WRONG), max from a clean file's sidecar. A broken vector
    * cardinality, a stale bound, or broken time travel all
    * hash-mismatch against the oracle's replay. */
  def qScanParquetFleetMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val root = graft.util.Scratch.dir("pqfleet_meta_q")
    val fleet = s"$root/cust.parquet"
    val p = new org.apache.hadoop.fs.Path(fleet)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    fs.delete(p, true)
    graft.sources.ParquetFleet.overwrite(
      customer(s, dir).select($"c_custkey")
        .repartitionByRange(6, $"c_custkey"), fleet)         // v1
    graft.sources.ParquetFleet.delete(s, fleet,
      $"c_custkey" <= 5L)                                    // v2 (MOR)
    val live = graft.sources.ParquetFleet.count(s, fleet)
    val (mn, mx) = graft.sources.ParquetFleet.minMax(s, fleet, "c_custkey")
    val v1 = graft.sources.ParquetFleet.count(s, fleet, Some(1L))
    Seq((live, mn.get.asInstanceOf[java.lang.Long].longValue(),
      mx.get.asInstanceOf[java.lang.Long].longValue(), v1))
      .toDF("live_rows", "min_key", "max_key", "v1_rows")
  }

  /** §2.A COLUMNAR FLEET CHANGE FEED (r20): the manifest-diff CDC
    * read on the parquet tier ([[graft.sources.ParquetFleet.changes]])
    * — net across the range: v2's appended files surface as
    * `to`-visible INSERTS (rows the in-range MOR delete removed never
    * appear), and the delete's vector delta on RETAINED v1 files
    * surfaces as row-exact DELETE images. A leaked deleted row, a
    * missed vector delta, or a phantom image hash-mismatches against
    * the oracle's replay of both sides. */
  def qFleetParquetChanges(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val root = graft.util.Scratch.dir("pqfleet_cdc_q")
    val fleet = s"$root/cust.parquet"
    val p = new org.apache.hadoop.fs.Path(fleet)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    fs.delete(p, true)
    val base = customer(s, dir).select($"c_custkey")
    graft.sources.ParquetFleet.overwrite(
      base.filter($"c_custkey" % 3 === 0)
        .repartitionByRange(3, $"c_custkey"), fleet)         // v1
    graft.sources.ParquetFleet.append(
      base.filter($"c_custkey" % 3 =!= 0)
        .repartitionByRange(3, $"c_custkey"), fleet)         // v2
    graft.sources.ParquetFleet.delete(s, fleet,
      $"c_custkey" % 9 === 0 || $"c_custkey" % 9 === 4)      // v3 (MOR)
    graft.sources.ParquetFleet.changes(s, fleet, 1L, 3L)
      .orderBy($"_change_type", $"c_custkey")
  }

  def qScanCsv(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = scratch("csv_region")
    region(s, dir).coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(out)
    s.read.option("header", "true").option("inferSchema", "true").csv(out)
      .select($"r_regionkey".cast("int").as("r_regionkey"), $"r_name")
      .orderBy($"r_regionkey")
  }

  /** §2.A ORC roundtrip: write nation as ORC, scan it back. ORC keeps
    * exact types, so no casts are needed; the oracle checks the
    * roundtripped values against the parquet original. */
  def qScanOrc(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = scratch("orc_nation")
    nation(s, dir).write.mode("overwrite").orc(out)
    s.read.orc(out).orderBy($"n_nationkey")
  }

  /** §2.A JSON-lines roundtrip: write region as JSONL, scan it back
    * with schema inference (integers infer as long — pinned in the
    * oracle with a CAST). */
  def qScanJsonl(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = scratch("jsonl_region")
    region(s, dir).write.mode("overwrite").json(out)
    s.read.json(out)
      .select($"r_regionkey".cast("long").as("r_regionkey"), $"r_name")
      .orderBy($"r_regionkey")
  }

  /** §2.A MALFORMED-INPUT resilience: a JSONL fleet with planted
    * corrupt lines (every n_nationkey ≡ 0 mod 5 nation serialized as
    * broken JSON) — the posture a 100 TB raw-log ingest needs, where
    * one bad line must neither kill the job (FAILFAST) nor vanish
    * silently (DROPMALFORMED): valid rows parse, corrupt lines are
    * counted and quarantined. Parsed via `spark.read.text` +
    * `from_json` (a broken line yields a NULL struct) rather than the
    * json source's `_corrupt_record` column: Spark REJECTS any plan
    * whose referenced columns reduce to only the internal corrupt
    * column ([UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN] —
    * a downstream count() prunes exactly into that shape), while the
    * text+from_json form composes under any pruning. Output = the
    * surviving rows plus the corpus-wide corrupt tally (broadcast
    * 1-row agg); the oracle recomputes both from the planted closed
    * form. */
  def qScanJsonlCorrupt(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = scratch("jsonl_corrupt_nation")
    nation(s, dir)
      .select(when(pmod($"n_nationkey", lit(5)) === 0,
          concat(lit("{\"oops\" broken "), $"n_nationkey"))
        .otherwise(to_json(struct($"n_nationkey", $"n_name")))
        .as("value"))
      .write.mode("overwrite").text(out)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("n_nationkey",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("n_name",
        org.apache.spark.sql.types.StringType)))
    // PERMISSIVE from_json yields an ALL-NULL-FIELDS struct (not a
    // null struct) for a malformed line — corruption is detected via
    // the required key field's null-ness
    val parsed = s.read.text(out)
      .select(from_json($"value", schema).as("j"))
    val nBad = parsed.agg(
      count(when($"j.n_nationkey".isNull, 1)).as("n_corrupt"))
    parsed.filter($"j.n_nationkey".isNotNull)
      .crossJoin(broadcast(nBad))
      .select($"j.n_nationkey".as("n_nationkey"),
        $"j.n_name".as("n_name"), $"n_corrupt")
      .orderBy($"n_nationkey")
  }

  /** §2.A text-source scan: write region as '|'-delimited text lines,
    * read back with spark.read.text and parse with split — the
    * schema-on-read path for raw logs. */
  def qScanText(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = scratch("text_region")
    region(s, dir)
      .select(concat_ws("|", $"r_regionkey", $"r_name").as("value"))
      .write.mode("overwrite").text(out)
    s.read.text(out)
      .select(split($"value", "\\|").as("f"))
      .select($"f".getItem(0).cast("int").as("r_regionkey"),
        $"f".getItem(1).as("r_name"))
      .orderBy($"r_regionkey")
  }

  /** §2.A Excel (.xlsx) roundtrip — the reference's NATIVE format,
    * previously scoped out for lack of a POI jar: write nation as a
    * real xlsx workbook and scan it back through the pure-JDK
    * SpreadsheetML codec (`graft.sources.Xlsx` — zip + StAX, zero new
    * dependencies). Inference reads integer columns back as long, so
    * the oracle pins a CAST like the JSONL roundtrip does. */
  def qScanXlsx(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = scratch("xlsx_nation")
    graft.sources.Xlsx.write(s, s"$out/workbook.xlsx",
      Seq("nation" -> nation(s, dir).orderBy($"n_nationkey")))
    graft.sources.Xlsx.read(s, s"$out/workbook.xlsx")("nation")
      .orderBy($"n_nationkey")
  }

  /** §2.A Avro roundtrip — the other format the survey had scoped out:
    * Spark ships the Apache Avro LIBRARY (only the spark-avro
    * connector is absent), so `graft.sources.Avro` writes/reads real
    * deflate-compressed Object Container Files with zero new jars.
    * Avro preserves exact primitive types (int stays int), so like the
    * ORC roundtrip no casts are needed. */
  def qScanAvro(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = scratch("avro_nation")
    graft.sources.Avro.write(s, s"$out/nation.avro", nation(s, dir))
    graft.sources.Avro.read(s, s"$out/nation.avro")
      .orderBy($"n_nationkey")
  }

  /** §2.A DISTRIBUTED Avro roundtrip over a TEMPORAL table: the
    * events frame (timestamp column carried as the `timestamp-micros`
    * logical type) lands via `Avro.writeDistributed` — one
    * executor-encoded OCF per partition, the scale-safe sink — and
    * reads back through the directory-aware reader. Gates BOTH r8
    * avro additions (distributed sink, typed temporals) in
    * CORRECTNESS, not just in specs. Timestamps compare at second
    * grain (`tstr`), the registry's cross-engine form. */
  def qScanAvroDist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = scratch("avro_events")
    val ev = events(s, dir)
      .select($"event_id", $"ts", $"event_type", $"value")
    graft.sources.Avro.writeDistributed(s, s"$out/events.avro", ev)
    graft.sources.Avro.read(s, s"$out/events.avro")
      .select($"event_id", tstr($"ts").as("ts_s"), $"event_type", $"value")
      .orderBy($"event_id")
  }

  /** §2.A PRUNED fleet scan through the `graft-avro` DataSource V2
    * connector: the events fleet written distributed, read back with a
    * 2-of-4-column projection — Catalyst pushes the projection into
    * the BatchScan (`SupportsPushDownRequiredColumns`), so executors
    * skip-decode the other fields at the byte level. Gates the V2
    * pruning path in CORRECTNESS, not just in specs. */
  def qScanAvroPruned(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = scratch("avro_events_pruned")
    val ev = events(s, dir)
      .select($"event_id", $"ts", $"event_type", $"value")
    graft.sources.Avro.writeDistributed(s, s"$out/events.avro", ev)
    graft.sources.Avro.readDistributed(s, s"$out/events.avro")
      .select($"event_id", $"event_type")
      .orderBy($"event_id")
  }

  /** §2.A V2 WRITER roundtrip: supplier written through
    * `df.write.format("graft-avro")` — the commit-coordinator-
    * arbitrated write path (attempt temps, rename-if-absent,
    * job-tagged part names, `_SUCCESS` last) — then appended to and
    * read back through the same connector. Gates the V2 write path in
    * CORRECTNESS: the oracle is the supplier table itself, so a
    * dropped partition, a double-committed file, or an overwrite that
    * missed stale parts all hash-mismatch. */
  def qScanAvroV2Write(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = scratch("avro_v2_supplier")
    val sup = supplier(s, dir)
      .select($"s_suppkey", $"s_name", $"s_nationkey", r4($"s_acctbal").as("s_acctbal"))
    val (lo, hi) = (sup.filter($"s_suppkey" % 2 === 0),
      sup.filter($"s_suppkey" % 2 === 1))
    lo.repartition(2).write.format("graft-avro")
      .mode("overwrite").save(s"$out/supplier.avro")
    hi.repartition(2).write.format("graft-avro")
      .mode("append").save(s"$out/supplier.avro")
    s.read.format("graft-avro").load(s"$out/supplier.avro")
      .orderBy($"s_suppkey")
  }

  /** §2.A pushed COUNT(*) over an avro fleet: the `graft-avro` scan
    * builder accepts an ungrouped, unfiltered count
    * (`SupportsPushDownAggregates`, partial) and answers it from the
    * OCF BLOCK HEADERS — each task walks its split's block-count
    * varints and skips the raw bytes still compressed, so no record is
    * ever decoded; Spark sums the per-split partials. Gates the
    * aggregate pushdown in CORRECTNESS: a split double-counting a
    * block (or missing one) shifts the total against the oracle. */
  def qScanAvroCount(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = scratch("avro_count_events")
    val ev = events(s, dir)
      .select($"event_id", $"ts", $"event_type", $"value")
    graft.sources.Avro.writeDistributed(s, s"$out/events.avro",
      ev.repartition(4))
    s.read.format("graft-avro").load(s"$out/events.avro")
      .agg(count(lit(1)).as("n"))
  }

  /** §2.A STATS-SKIPPED fleet scan: events land as a RANGE-partitioned
    * fleet through the V2 writer, so each part file's `_stats.json`
    * sidecar records a disjoint `event_id` interval; the range filter
    * on the read side is fully pushed, and the scan's planning-time
    * skip drops every file whose recorded [min, max] proves the filter
    * can't match — most of the fleet is never scheduled (the avro twin
    * of parquet row-group pruning). Gates data skipping in
    * CORRECTNESS: a skip decision that drops a matching file loses
    * rows against the oracle, one that mis-prices a boundary value
    * shifts the hash. */
  def qScanAvroSkip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = scratch("avro_skip_events")
    val ev = events(s, dir)
      .select($"event_id", $"ts", $"event_type", $"value")
    ev.repartitionByRange(6, $"event_id")
      .write.format("graft-avro").mode("overwrite")
      .save(s"$out/events.avro")
    s.read.format("graft-avro").load(s"$out/events.avro")
      .filter($"event_id".between(100, 600))
      .select($"event_id", tstr($"ts").as("ts_s"), $"event_type", $"value")
      .orderBy($"event_id")
  }

  /** §2.A TEMPORAL stats-skipping over a TIME-partitioned fleet — the
    * single most common 100 TB scan pattern (events laid down in time
    * order; every query carries a ts range). The V2 writer records each
    * part's ts bounds as zone-free epoch-µs carrier integers in the
    * sidecar; the read-side range predicate's `Timestamp` literals are
    * normalized to the same µs frame (`FleetFilters.temporalLong`), so
    * the ts conjuncts are ABSORBED (no residual FilterExec) and
    * planning-time skipping drops every file whose recorded window
    * can't overlap the query's — the fleet twin of parquet
    * partition-pruning on a date column. Gates temporal pushdown in
    * CORRECTNESS: a µs-vs-ms slip or a zone-shifted literal loses or
    * duplicates boundary rows against the oracle. */
  def qScanAvroSkipTs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = scratch("avro_skip_ts_events")
    val ev = events(s, dir)
      .select($"event_id", $"ts", $"event_type", $"value")
    ev.repartitionByRange(6, $"ts")
      .write.format("graft-avro").mode("overwrite")
      .save(s"$out/events.avro")
    s.read.format("graft-avro").load(s"$out/events.avro")
      .filter($"ts" >= lit("2024-01-10 00:00:00").cast("timestamp") &&
        $"ts" < lit("2024-01-15 00:00:00").cast("timestamp"))
      .select($"event_id", tstr($"ts").as("ts_s"), $"event_type", $"value")
      .orderBy($"event_id")
  }

  /** §2.A GROUPED aggregate pushdown over an avro fleet: the scan
    * builder accepts group-by + COUNT/MIN/MAX (partial pushdown) — each
    * task aggregates its split DURING the decode and ships one row per
    * group, and any file whose sidecar proves a single group (the
    * range-partitioned layout makes most files so) answers from
    * metadata without being opened. The fleet here is range-partitioned
    * by the group key, so the plan mixes both tiers; Spark's final
    * aggregate merges the partials. Gates grouped pushdown in
    * CORRECTNESS: a split double-counted, a group split across tiers
    * and merged wrong, or a carrier/instant slip in min/max all
    * mismatch the oracle. */
  def qScanAvroGroupAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = scratch("avro_groupagg_events")
    val ev = events(s, dir)
      .select($"event_id", $"ts", $"event_type", $"value")
    ev.repartitionByRange(6, $"event_type")
      .write.format("graft-avro").mode("overwrite")
      .save(s"$out/events.avro")
    s.read.format("graft-avro").load(s"$out/events.avro")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), count($"value").as("n_val"),
        min($"value").as("min_v"), max($"value").as("max_v"),
        min($"ts").as("min_ts"), max($"ts").as("max_ts"))
      .select($"event_type", $"n", $"n_val", $"min_v", $"max_v",
        tstr($"min_ts").as("min_ts_s"), tstr($"max_ts").as("max_ts_s"))
      .orderBy($"event_type")
  }

  /** §2.A FILTERED grouped pushdown — the production rollup shape: a
    * ts-range predicate AND a group-by pushed into ONE fleet scan.
    * Spark absorbs the range into the scan (no residual FilterExec),
    * the scan's skip tier drops every file whose sidecar ts-window
    * misses the range, boundary files decode WITH the filter evaluated
    * before aggregation, and a file both single-group and provably
    * all-inside the range would resolve from metadata alone
    * (`FleetStats.alwaysMatches`). Gates the filter×aggregate
    * composition in CORRECTNESS: a tier disagreement on a boundary
    * instant double-counts or loses rows against the oracle. */
  def qScanAvroFilterAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = scratch("avro_filteragg_events")
    val ev = events(s, dir)
      .select($"event_id", $"ts", $"event_type", $"value")
    ev.repartitionByRange(6, $"ts")
      .write.format("graft-avro").mode("overwrite")
      .save(s"$out/events.avro")
    s.read.format("graft-avro").load(s"$out/events.avro")
      .filter($"ts" >= lit("2024-01-08 00:00:00").cast("timestamp") &&
        $"ts" < lit("2024-01-22 00:00:00").cast("timestamp"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), min($"value").as("min_v"),
        max($"ts").as("max_ts"))
      .select($"event_type", $"n", $"min_v", tstr($"max_ts").as("max_ts_s"))
      .orderBy($"event_type")
  }

  /** §2.F/§2.A TopN pushdown over an avro fleet: `ORDER BY value DESC,
    * event_id LIMIT 20` pushes into the scan (`SupportsPushDownTopN`,
    * partial) — each split folds its decoded rows through a bounded
    * 20-row heap and ships 20 rows, so the driver-side final sort
    * merges |splits|·20 rows instead of the fleet. Gates the heap's
    * ordering (direction, tie-break, catalyst-identical comparator) in
    * CORRECTNESS against the oracle's total order. */
  def qScanAvroTopn(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = scratch("avro_topn_events")
    val ev = events(s, dir)
      .select($"event_id", $"ts", $"event_type", $"value")
    // range-partitioned on the sort key: the sidecar TopN prune then
    // opens only the top file(s) — the time-series top-n layout
    ev.repartitionByRange(4, $"value")
      .write.format("graft-avro").mode("overwrite")
      .save(s"$out/events.avro")
    s.read.format("graft-avro").load(s"$out/events.avro")
      .select($"event_id", $"value")
      .orderBy($"value".desc, $"event_id")
      .limit(20)
  }

  /** §2.A PREFIX-predicate skipping: `LIKE 'cl%'` lowers to
    * `StringStartsWith`, which the fleet connectors now absorb (exact
    * UTF-8/code-point agreement with Catalyst; ill-formed patterns stay
    * residual) and prove skips for via the prefix range [p, succ(p)) —
    * over this event_type-partitioned fleet only the 'click' file(s)
    * open. Gates the string-predicate family in CORRECTNESS. */
  def qScanAvroSkipPrefix(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = scratch("avro_skip_prefix_events")
    val ev = events(s, dir)
      .select($"event_id", $"ts", $"event_type", $"value")
    ev.repartitionByRange(5, $"event_type")
      .write.format("graft-avro").mode("overwrite")
      .save(s"$out/events.avro")
    s.read.format("graft-avro").load(s"$out/events.avro")
      .filter($"event_type".like("cl%"))
      .select($"event_id", $"event_type", $"value")
      .orderBy($"event_id")
  }

  /** §2.A fleet SCHEMA EVOLUTION (`mergeSchema=true`, mirroring the
    * parquet reader's option): a long-lived fleet is never one schema —
    * generation 1 here records a FLOAT measure and predates the `ts`
    * column; generation 2 widened the measure to double and added the
    * column. With the option set, the table schema is the merge of
    * every file's header (distributed header peeks past 64 files) and
    * each file decodes against its own generation: gen-1 rows widen
    * float→double exactly and read NULL for `ts`; lossy promotions and
    * real conflicts fail loudly (SchemaEvolution scaladoc). The oracle
    * recomputes both generations in closed form, so a mis-widened
    * value or a null landing on the wrong generation hash-mismatches. */
  def qScanAvroEvolve(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = scratch("avro_evolve_events")
    val ev = events(s, dir)
      .select($"event_id", $"event_type", $"value", $"ts")
    ev.filter($"event_id" % 2 === 0)
      .select($"event_id", $"event_type",
        $"value".cast("float").as("value"))
      .repartition(2).write.format("graft-avro").mode("overwrite")
      .save(s"$out/fleet/gen1")
    ev.filter($"event_id" % 2 === 1)
      .repartition(2).write.format("graft-avro").mode("overwrite")
      .save(s"$out/fleet/gen2")
    s.read.format("graft-avro").option("mergeSchema", "true")
      .load(s"$out/fleet/gen*")
      .select($"event_id", $"event_type", $"value",
        tstr($"ts").as("ts_s"))
      .orderBy($"event_id")
  }

  /** §2.A SQL-ADDRESSABLE fleet catalog: the events fleet resolved BY
    * NAME through the DSv2 `TableCatalog`
    * ([[graft.sources.GraftCatalog]]) — `SELECT ... FROM graft.events`
    * with no `format()`/`load()` in sight, the reference's
    * workbook-as-database ergonomic. `loadTable` hands Spark the SAME
    * `AvroFleetTable` the `format("graft-avro")` path builds, so the
    * plan is the identical BatchScan with identical pushdown (column
    * pruning, filter skipping, sidecar aggregates — CatalogSpec
    * asserts plan parity and the CREATE-free `SHOW TABLES` listing).
    * Catalog registration rides a child session: per-query conf, no
    * leak into the caller. */
  def qCatalogSqlFleet(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // the staged catalog root is written ONCE per fixture generation
    // (GoldenFixture) — the production shape: the warehouse EXISTS,
    // queries only resolve it
    val root = graft.util.GoldenFixture.dir(s, s"$dir/events.parquet",
      "catalog_root") { r =>
      events(s, dir).select($"event_id", $"event_type", $"value")
        .write.format("graft-avro").mode("overwrite")
        .save(s"$r/events.avro")
    }
    val s2 = s.newSession()
    s2.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    s2.conf.set("spark.sql.catalog.graft.root", root)
    s2.sql(
      """SELECT event_type, count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM graft.events GROUP BY event_type ORDER BY event_type"""
        .stripMargin)
  }

  /** §1.1 SQL DDL schema evolution — `ALTER TABLE graft.ev ADD
    * COLUMN` / `RENAME COLUMN` as METADATA-ONLY operations
    * ([[graft.sources.FleetSchemaMarker]]): the base generation lands
    * by CTAS, the DDL writes only the `_schema.json` marker (zero
    * data files touched — CatalogSpec pins that), the evolved INSERT
    * writes the new spelling, and one read merges both generations:
    * pre-ALTER rows null-fill the added column and answer under the
    * renamed one via per-file alias resolution. At 100 TB this is
    * "add a column to a billion-file table" in O(1). */
  def qCatalogAlter(s: SparkSession, dir: String): DataFrame = {
    // fresh root per invocation: DDL + INSERT accumulate state, and
    // Bench/Verify call a query more than once per JVM
    val root = graft.util.Scratch.dir("catalog_alter_q") + "/" +
      java.util.UUID.randomUUID().toString.take(8)
    val s2 = s.newSession()
    s2.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    s2.conf.set("spark.sql.catalog.graft.root", root)
    s2.read.parquet(s"$dir/events.parquet")
      .createOrReplaceTempView("ev_src")
    s2.sql(
      """CREATE TABLE graft.ev AS
        |SELECT event_id, event_type, value
        |FROM ev_src WHERE event_id % 2 = 0""".stripMargin)
    s2.sql("ALTER TABLE graft.ev ADD COLUMN note STRING")
    s2.sql("ALTER TABLE graft.ev RENAME COLUMN value TO amount")
    s2.sql(
      """INSERT INTO graft.ev
        |SELECT event_id, event_type, value AS amount,
        |  concat('n', event_id) AS note
        |FROM ev_src WHERE event_id % 2 = 1""".stripMargin)
    s2.sql(
      """SELECT event_id, event_type, round(amount, 4) AS amount, note
        |FROM graft.ev ORDER BY event_id""".stripMargin)
  }

  /** §1.1 `ALTER TABLE … DROP COLUMN` + widening `ALTER COLUMN TYPE`
    * — the destructive half of the metadata-only DDL matrix: the
    * fleet lands with an INT key and a `value` column, the DDL drops
    * `value` (its spelling becomes a terminal alias — old files'
    * data under it is ignored, the name can never be reintroduced)
    * and widens the key to BIGINT, and a post-DDL INSERT writes the
    * new schema. The read must resolve PRE-DDL files through the
    * POST-DDL schema — int values promoting to long, dropped-column
    * bytes skipped — and the oracle is the plain union of both
    * halves, so a mis-promoted value, a leaked dropped column, or a
    * null-filled old file hash-mismatches. Still O(1) DDL at any
    * fleet size: one marker write, zero data files touched. */
  def qCatalogAlterDrop(s: SparkSession, dir: String): DataFrame = {
    val root = graft.util.Scratch.dir("catalog_alter_drop_q") + "/" +
      java.util.UUID.randomUUID().toString.take(8)
    val s2 = s.newSession()
    s2.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    s2.conf.set("spark.sql.catalog.graft.root", root)
    s2.read.parquet(s"$dir/events.parquet")
      .createOrReplaceTempView("ev_src")
    s2.sql(
      """CREATE TABLE graft.ev AS
        |SELECT cast(event_id AS INT) AS event_id, event_type, value
        |FROM ev_src WHERE event_id % 2 = 0""".stripMargin)
    s2.sql("ALTER TABLE graft.ev DROP COLUMN value")
    s2.sql("ALTER TABLE graft.ev ALTER COLUMN event_id TYPE BIGINT")
    s2.sql(
      """INSERT INTO graft.ev
        |SELECT event_id, event_type
        |FROM ev_src WHERE event_id % 2 = 1""".stripMargin)
    s2.sql(
      """SELECT event_id, event_type
        |FROM graft.ev ORDER BY event_id""".stripMargin)
  }

  /** §2.A fleet COMPACTION (the 100 TB small-file maintenance pass):
    * events land first as 32 tiny shards — the shape a streaming sink
    * or frequent appends leave behind — then `FleetCompact.compact`
    * rewrites them into ~64 KiB range-clustered files through the same
    * arbitrated V2 commit, regenerating disjoint-interval `_stats.json`
    * sidecars as it goes (append-order fleets interleave keys, so
    * their min/max skip-proofs are useless; compaction restores them).
    * The read-back is oracle-checked against the events table itself,
    * so a dropped shard, a double-committed file, or a row lost in the
    * range shuffle all hash-mismatch. FleetStatsSpec asserts the
    * file-count collapse and the recovered skipping. */
  def qFleetCompact(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = scratch("fleet_compact_events")
    val ev = events(s, dir)
      .select($"event_id", $"ts", $"event_type", $"value")
    ev.repartition(32).write.format("graft-avro").mode("overwrite")
      .save(s"$out/small")
    graft.sources.FleetCompact.compact(s, s"$out/small", s"$out/compacted",
      targetBytes = 64 * 1024, clusterBy = "event_id")
    s.read.format("graft-avro").load(s"$out/compacted")
      .select($"event_id", tstr($"ts").as("ts_s"), $"event_type", $"value")
      .orderBy($"event_id")
  }

  /** §2.A IN-PLACE transactional compaction from SQL — `CALL
    * graft.system.rewrite_files` ([[graft.sources.GraftProcedures]]):
    * the same 24-tiny-shard shape as `q_fleet_compact`, but the
    * rewrite lands IN the live fleet as ONE manifest swap (new
    * range-clustered generation in, every old shard out) instead of a
    * copy to a second directory — concurrent readers see the old or
    * the new generation, never both, and the pre-compaction snapshot
    * stays `VERSION AS OF`-readable until expiry. At 100 TB this is
    * the maintenance verb an operator actually runs: small-file
    * compaction as a SQL statement with no pipeline downtime. The
    * read-back oracle-checks the post-rewrite fleet end-to-end, so a
    * row lost (or doubled) in the swap hash-mismatches. */
  def qFleetRewrite(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val root = scratch("fleet_rewrite_root")
    events(s, dir).select($"event_id", $"ts", $"event_type", $"value")
      .repartition(24)
      .write.format("graft-avro").mode("overwrite").save(s"$root/ev.avro")
    val s2 = s.newSession()
    s2.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    s2.conf.set("spark.sql.catalog.graft.root", root)
    s2.sql(
      "CALL graft.system.rewrite_files('ev', 16777216, 'event_id')")
      .collect()
    s2.sql("SELECT * FROM graft.ev")
      .select(col("event_id"), tstr(col("ts")).as("ts_s"),
        col("event_type"), col("value"))
      .orderBy(col("event_id"))
  }

  /** §2.A BLOOM data skipping — the point-lookup tier: events HASH-
    * distributed on `event_id` into 32 shards (the layout a shuffled
    * sink or bucketed write leaves behind), so every file spans
    * ~the whole id range and min/max bounds can prove nothing for an
    * equality — then a 3-key `IN` lookup. The sidecar blooms
    * (`FleetBloom`, written by the same V2 commit that records the
    * bounds) prove the keys absent from ~29 of the 32 files at
    * PLANNING time; only the holder shards are scheduled. At 100 TB
    * this is the needle-in-haystack path: a key lookup over a hashed
    * fleet costs a sidecar read plus a handful of file opens, not a
    * full-fleet decode. FleetStatsSpec pins the pruning counts and the
    * false-positive-only error direction; here the oracle pins that
    * skipping never loses a row. */
  def qScanAvroBloom(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = scratch("avro_bloom_events")
    events(s, dir)
      .select($"event_id", $"event_type", $"value", $"ts")
      .repartition(32, $"event_id")
      .write.format("graft-avro").mode("overwrite").save(s"$out/fleet")
    s.read.format("graft-avro").load(s"$out/fleet")
      .filter($"event_id".isin(7L, 123L, 911L))
      .select($"event_id", $"event_type", $"value", tstr($"ts").as("ts_s"))
      .orderBy($"event_id")
  }

  /** §2.A xlsx FLEET scan through the `graft-xlsx` DataSource V2
    * connector: nation sliced across three workbooks (the
    * many-small-drops shape the distributed reader exists for), the
    * shared sheet parsed on executors with the schema pinned from the
    * first workbook, and a projection pushed into the scan — only the
    * projected cells are cast and materialized. Gates the fleet reader
    * AND its pruning in CORRECTNESS. */
  def qScanXlsxFleet(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = scratch("xlsx_fleet_nation")
    val n = nation(s, dir)
    (0 until 3).foreach { i =>
      graft.sources.Xlsx.write(s, s"$out/part$i.xlsx",
        Seq("nation" -> n.filter($"n_nationkey" % 3 === i)
          .orderBy($"n_nationkey")))
    }
    graft.sources.Xlsx.readDistributed(s, s"$out/*.xlsx", "nation")
      .select($"n_nationkey", $"n_name")
      .orderBy($"n_nationkey")
  }

  /** §2.A DISTRIBUTED xlsx roundtrip: customer sharded through
    * `Xlsx.writeDistributed` — executor-written part workbooks with
    * the avro sink's commit protocol — and reassembled through the
    * fleet reader. Gates the distributed xlsx writer in CORRECTNESS:
    * a dropped part, duplicate commit, or header drift across parts
    * all hash-mismatch against the customer oracle. (xlsx inference
    * reads integer columns back as long; doubles roundtrip via the
    * repr-exact cell writer.) */
  def qScanXlsxDist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = scratch("xlsx_dist_customer")
    val c = customer(s, dir)
      .select($"c_custkey", $"c_name", $"c_nationkey", r4($"c_acctbal").as("c_acctbal"))
    graft.sources.Xlsx.writeDistributed(s, s"$out/customer.xlsx",
      "customer", c.repartition(3))
    graft.sources.Xlsx.readDistributed(s, s"$out/customer.xlsx", "customer")
      .orderBy($"c_custkey")
  }

  /** §2.A partitioned sink + partition-pruned scan: write orders
    * partitioned by o_orderstatus (the 100 TB posture for any big
    * sink), read ONE partition back via the partition column — the
    * filter resolves at file-listing time, touching only that
    * directory — and aggregate it. */
  def qSinkPartitioned(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = scratch("part_orders")
    orders(s, dir).write.mode("overwrite")
      .partitionBy("o_orderstatus").parquet(out)
    s.read.parquet(out)
      .filter($"o_orderstatus" === "F")
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n"), r4(sum($"o_totalprice")).as("sum_price"))
      .select($"o_orderstatus".cast("string").as("o_orderstatus"),
        $"n", $"sum_price")
      .orderBy($"o_orderstatus")
  }

  /** §2.A workbook introspection (reference PK: sheet list + header
    * rows): every fixture table's name, column count, and '|'-joined
    * header, from Spark's schema metadata (no data scan, no collect) —
    * cross-checked against DuckDB's information_schema view of the SAME
    * tables, so loader-vs-oracle schema drift fails the gate. */
  def qCatalogTables(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rows = graft.util.Tables.all.map { n =>
      val sch = (n match {
        case "events" => events(s, dir)
        case other    => graft.util.Tables.t(s, dir, other)
      }).schema
      (n, sch.length.toLong, sch.map(_.name).mkString("|"))
    }
    rows.toDF("table_name", "n_cols", "cols").orderBy($"table_name")
  }

  /** §2-extension table profiling (the ANALYZE/data-quality verb a
    * reference user runs before trusting a sheet): per-column row
    * count, null count, exact distinct count, and min/max — for a
    * representative column set of lineitem — in ONE scan. All measures
    * ride a single `agg` (Catalyst plans the multi-countDistinct via
    * one Expand: 4 streams over one pass, map-side partials, no
    * per-column jobs) and the wide row is unpivoted with `stack`, so
    * the plan is scan → partial agg → final agg → generate — two
    * shuffle-free stages plus one exchange.
    *
    * Scale: exact distinct is kept here because the DuckDB oracle must
    * agree bit-for-bit; the 100 TB variant swaps `countDistinct` for
    * `approx_count_distinct` (HLL partials, no Expand blow-up) — the
    * sketch path is exercised by `q_agg_approx_distinct`. min/max are
    * emitted as strings only for fixed-format types (ints, flags,
    * dates) — doubles are excluded since engines disagree on shortest
    * decimal rendering. */
  def qProfileTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = lineitem(s, dir)
    // Pass 1 — typed min/max + counts, Expand-free (min over the TYPED
    // column, cast after: string min of '100' vs '99' would be wrong).
    val basic = li.agg(
        count(lit(1)).as("n_rows"),
        min($"l_orderkey").cast("string").as("ok_min"),
        max($"l_orderkey").cast("string").as("ok_max"),
        min($"l_linenumber").cast("string").as("ln_min"),
        max($"l_linenumber").cast("string").as("ln_max"),
        min($"l_returnflag").as("rf_min"),
        max($"l_returnflag").as("rf_max"),
        min(dstr($"l_shipdate")).as("sd_min"),
        max(dstr($"l_shipdate")).as("sd_max"))
      .selectExpr(
        """stack(4,
          |  'l_orderkey',   n_rows, ok_min, ok_max,
          |  'l_linenumber', n_rows, ln_min, ln_max,
          |  'l_returnflag', n_rows, rf_min, rf_max,
          |  'l_shipdate',   n_rows, sd_min, sd_max
          |) AS (col_name, n_rows, min_val, max_val)
          |""".stripMargin)
    // Pass 2 — distinct/null counts by UNPIVOTING FIRST, then a
    // two-level aggregate: the multi-countDistinct form lowers to one
    // Expand (|cols|+1 copies of every row) pushed through a WIDE
    // shuffle — measured 5.6-8.4 s at sf0.1; unpivot-then-group
    // shuffles only the map-side-deduped (col, value) pairs (bounded
    // by Σ per-column cardinality, not row count) and runs ~10×
    // faster on the same data. Both passes prune to the 4 profiled
    // columns, so the extra scan is columnar-cheap at any scale.
    val dn = li.selectExpr(
        """stack(4,
          |  'l_orderkey',   CAST(l_orderkey AS STRING),
          |  'l_linenumber', CAST(l_linenumber AS STRING),
          |  'l_returnflag', l_returnflag,
          |  'l_shipdate',   date_format(l_shipdate, 'yyyy-MM-dd')
          |) AS (col_name, val)
          |""".stripMargin)
      .groupBy($"col_name", $"val").agg(count(lit(1)).as("cnt"))
      .groupBy($"col_name").agg(
        count(when($"val".isNotNull, 1)).as("n_distinct"),
        coalesce(sum(when($"val".isNull, $"cnt")), lit(0L)).as("n_nulls"))
    basic.join(dn, Seq("col_name"))
      .select($"col_name", $"n_rows", $"n_nulls", $"n_distinct",
        $"min_val", $"max_val")
      .orderBy($"col_name")
  }

  /** §1.1 data-quality constraint suite (Deequ-style validation — the
    * gate a 100 TB ingest runs before publishing a snapshot): declared
    * expectations (minimum size, completeness, key uniqueness, numeric
    * ranges, value domain) evaluated in ONE aggregate over ONE scan —
    * violations are counted with conditional sums inside the same
    * aggregation, never one pass per constraint, so checking 6 or 60
    * constraints costs a single job. The uniqueness check is the only
    * exact-distinct (Expand) participant; swap it for
    * `approx_count_distinct` when an HLL bound suffices. Output is one
    * row per constraint: (constraint_name, metric, passed). */
  def qQualityConstraints(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    lineitem(s, dir)
      .agg(
        count(lit(1)).as("n_rows"),
        count($"l_shipdate").as("sd_nn"),
        countDistinct(struct($"l_orderkey", $"l_linenumber")).as("key_nd"),
        sum(when($"l_quantity".between(1, 50), 0).otherwise(1)).as("qty_bad"),
        sum(when($"l_discount".between(0.0, 0.1), 0).otherwise(1)).as("disc_bad"),
        sum(when($"l_returnflag".isin("A", "N", "R"), 0).otherwise(1)).as("rf_bad"))
      .select(expr(
        """stack(6,
          |  'completeness_l_shipdate', round(sd_nn / CAST(n_rows AS DOUBLE), 6), sd_nn = n_rows,
          |  'domain_l_returnflag',     CAST(rf_bad AS DOUBLE),                   rf_bad = 0,
          |  'range_l_discount',        CAST(disc_bad AS DOUBLE),                 disc_bad = 0,
          |  'range_l_quantity',        CAST(qty_bad AS DOUBLE),                  qty_bad = 0,
          |  'size_min_1000',           CAST(n_rows AS DOUBLE),                   n_rows >= 1000,
          |  'unique_l_orderkey_l_linenumber', round(key_nd / CAST(n_rows AS DOUBLE), 6), key_nd = n_rows
          |) AS (constraint_name, metric, passed)""".stripMargin))
      .orderBy($"constraint_name")
  }

  /** §2-extension time-spine densification (gap filling): a dense
    * (customer × month) grid over the orders table's full month range,
    * zero-filled where a customer had no orders — the standard
    * pre-processing for time-series models and month-over-month
    * reports, which silently break on sparse group-by output. The
    * spine is generated IN-PLAN (`sequence` over a broadcast 1-row
    * min/max agg — no driver-side date math, no hard-coded range) and
    * cross-joined against the dimension slice; the fact side then
    * LEFT-joins in. Scale: the spine is |months| rows (tiny, always
    * broadcast); the cross product is |dim|×|months| — the op's
    * intrinsic output size — and the fact join is a plain keyed join;
    * nothing here is quadratic in the fact table. */
  def qTimeSpineFill(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = orders(s, dir)
    val monthly = o.filter($"o_custkey" < 100)
      .groupBy($"o_custkey",
        date_trunc("month", $"o_orderdate").as("m_month"))
      .agg(count(lit(1)).as("n"), r4(sum($"o_totalprice")).as("spend"))
    val spine = o
      .agg(date_trunc("month", min($"o_orderdate")).as("lo"),
        date_trunc("month", max($"o_orderdate")).as("hi"))
      .select(explode(sequence($"lo", $"hi", expr("interval 1 month")))
        .as("month"))
    customer(s, dir).filter($"c_custkey" < 100).select($"c_custkey")
      .crossJoin(broadcast(spine))
      .join(monthly,
        $"c_custkey" === $"o_custkey" && $"month" === $"m_month", "left")
      .select($"c_custkey", dstr($"month").as("month"),
        coalesce($"n", lit(0L)).as("n_orders"),
        r4(coalesce($"spend", lit(0.0))).as("spend"))
      .orderBy($"c_custkey", $"month")
  }

  /** §2.B select / derive / rename (reference: column access + computed cells). */
  def qProject(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    part(s, dir)
      .select(
        $"p_partkey",
        concat_ws("/", $"p_brand", $"p_type").as("brand_type"),
        upper($"p_name").as("name_uc"),
        round($"p_retailprice" * lit(0.9), 4).as("sale_price"),
        ($"p_size" + lit(1)).as("size_plus"))
      .orderBy($"p_partkey")
  }

  /** §2.B key lookup (reference: row by primary key). */
  def qFilterPoint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    orders(s, dir)
      .filter($"o_orderkey" === lit(42L))
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice",
        dstr($"o_orderdate").as("o_date"))
  }

  /** §2.B compound predicate algebra. */
  def qFilterCompound(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    lineitem(s, dir)
      .filter($"l_quantity".between(10, 20) &&
        $"l_discount" > lit(0.03) &&
        $"l_returnflag".isin("A", "R") &&
        $"l_tax".isNotNull &&
        !($"l_linestatus" <=> lit("X")))
      .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_discount",
        $"l_returnflag")
      .orderBy($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_discount",
        $"l_returnflag")
  }

  /** §2.B pattern predicates (LIKE / prefix / suffix / regex). */
  def qFilterLike(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    part(s, dir)
      .filter($"p_name".like("%red%") ||
        ($"p_type".startsWith("PRO") && $"p_brand".endsWith("3")))
      .select($"p_partkey", $"p_name", $"p_type", $"p_brand",
        $"p_name".rlike("^(red|blue)").as("re_primary"))
      .orderBy($"p_partkey")
  }

  /** §2.B IN-subquery as a left-semi join (what Catalyst lowers IN to). */
  def qFilterInSubquery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val building = customer(s, dir)
      .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    orders(s, dir)
      .join(broadcast(building), $"o_custkey" === $"c_custkey", "left_semi")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_orderkey")
  }

  /** §2.F global total-order sort (reference: sheet sort). */
  def qSortGlobal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    orders(s, dir)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice",
        dstr($"o_orderdate").as("o_date"))
      .orderBy($"o_totalprice".desc, $"o_orderkey")
  }

  /** §2.F top-N → TakeOrderedAndProject (no global sort at scale). */
  def qLimitTopn(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    orders(s, dir)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(20)
  }

  /** §2.F pagination: rows 101–150 of the price-ranked orders.
    * Spark plans offset+limit as a single GlobalLimitAndOffset over the
    * sort — executors keep only the first offset+limit rows per
    * partition, so pagination never materializes the full sort. The
    * final orderBy re-asserts the emitted total order for the dump. */
  def qLimitOffset(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    orders(s, dir)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .offset(100).limit(50)
      .orderBy($"o_totalprice".desc, $"o_orderkey")
  }

  /** §2.F top-k per group via ranked window (QUALIFY pattern). */
  def qTopkPergroup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    orders(s, dir)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter($"rn" <= 3)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rn")
      .orderBy($"o_custkey", $"rn")
  }

  /** §2.G bag union (reference: append rows/sheets), name-resolved. */
  def qSetUnion(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = orders(s, dir)
    val open = o.filter($"o_orderstatus" === "O")
      .select($"o_orderkey", $"o_totalprice", lit("open").as("bucket"))
    val done = o.filter($"o_orderstatus" === "F")
      .select($"o_orderkey", $"o_totalprice", lit("done").as("bucket"))
    open.unionByName(done).orderBy($"o_orderkey")
  }

  /** §2.G set intersection (distinct semantics both engines). */
  def qSetIntersect(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = orders(s, dir)
    val y1995 = o.filter($"o_orderdate" < lit("1996-01-01").cast("timestamp"))
      .select($"o_custkey")
    val y2000 = o.filter($"o_orderdate" >= lit("2000-01-01").cast("timestamp"))
      .select($"o_custkey")
    y1995.intersect(y2000).orderBy($"o_custkey")
  }

  /** §2.G set minus: customers that never placed a finished order. */
  def qSetExcept(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = orders(s, dir)
    o.select($"o_custkey")
      .except(o.filter($"o_orderstatus" === "F").select($"o_custkey"))
      .orderBy($"o_custkey")
  }

  /** §2.G row dedup (reference + NS exact-dedup primitive). */
  def qDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    customer(s, dir)
      .select($"c_nationkey", $"c_mktsegment")
      .distinct()
      .orderBy($"c_nationkey", $"c_mktsegment")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_scan_parquet" -> qScanParquet _,
    "q_scan_parquet_fleet" -> qScanParquetFleet _,
    "q_scan_parquet_fleet_skip" -> qScanParquetFleetSkip _,
    "q_scan_parquet_fleet_meta" -> qScanParquetFleetMeta _,
    "q_fleet_parquet_changes" -> qFleetParquetChanges _,
    "q_scan_csv" -> qScanCsv _,
    "q_scan_orc" -> qScanOrc _,
    "q_scan_jsonl" -> qScanJsonl _,
    "q_scan_text" -> qScanText _,
    "q_scan_xlsx" -> qScanXlsx _,
    "q_scan_avro" -> qScanAvro _,
    "q_scan_avro_dist" -> qScanAvroDist _,
    "q_scan_avro_pruned" -> qScanAvroPruned _,
    "q_scan_avro_v2write" -> qScanAvroV2Write _,
    "q_scan_avro_count" -> qScanAvroCount _,
    "q_scan_avro_skip" -> qScanAvroSkip _,
    "q_scan_avro_skip_ts" -> qScanAvroSkipTs _,
    "q_scan_avro_groupagg" -> qScanAvroGroupAgg _,
    "q_scan_avro_filteragg" -> qScanAvroFilterAgg _,
    "q_scan_avro_topn" -> qScanAvroTopn _,
    "q_scan_avro_skip_prefix" -> qScanAvroSkipPrefix _,
    "q_scan_avro_evolve" -> qScanAvroEvolve _,
    "q_fleet_compact" -> qFleetCompact _,
    "q_fleet_rewrite" -> qFleetRewrite _,
    "q_catalog_sql_fleet" -> qCatalogSqlFleet _,
    "q_catalog_alter" -> qCatalogAlter _,
    "q_catalog_alter_drop" -> qCatalogAlterDrop _,
    "q_scan_avro_bloom" -> qScanAvroBloom _,
    "q_scan_xlsx_fleet" -> qScanXlsxFleet _,
    "q_scan_xlsx_dist" -> qScanXlsxDist _,
    "q_sink_partitioned" -> qSinkPartitioned _,
    "q_catalog_tables" -> qCatalogTables _,
    "q_profile_table" -> qProfileTable _,
    "q_quality_constraints" -> qQualityConstraints _,
    "q_scan_jsonl_corrupt" -> qScanJsonlCorrupt _,
    "q_time_spine_fill" -> qTimeSpineFill _,
    "q_project" -> qProject _,
    "q_filter_point" -> qFilterPoint _,
    "q_filter_compound" -> qFilterCompound _,
    "q_filter_like" -> qFilterLike _,
    "q_filter_in_subquery" -> qFilterInSubquery _,
    "q_sort_global" -> qSortGlobal _,
    "q_limit_topn" -> qLimitTopn _,
    "q_limit_offset" -> qLimitOffset _,
    "q_topk_pergroup" -> qTopkPergroup _,
    "q_set_union" -> qSetUnion _,
    "q_set_intersect" -> qSetIntersect _,
    "q_set_except" -> qSetExcept _,
    "q_distinct" -> qDistinct _
  )

  val oracleSql: Map[String, String] = Map(
    "q_scan_parquet" ->
      "SELECT * FROM nation ORDER BY n_nationkey",
    "q_scan_parquet_fleet" ->
      """SELECT c_custkey, c_name, round(c_acctbal, 4) AS c_acctbal,
        |  (SELECT count(*) FROM customer) AS v1_rows
        |FROM customer WHERE c_custkey % 7 <> 3
        |ORDER BY c_custkey""".stripMargin,
    "q_scan_parquet_fleet_skip" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 4) AS o_totalprice,
        |  o_orderpriority
        |FROM orders
        |WHERE o_orderkey <= 6000 AND o_orderpriority LIKE '1%'
        |  AND o_orderkey % 10 <> 7
        |ORDER BY o_orderkey""".stripMargin,
    "q_scan_parquet_fleet_meta" ->
      """SELECT
        |  CAST(count(*) AS BIGINT) AS live_rows,
        |  CAST(min(c_custkey) AS BIGINT) AS min_key,
        |  CAST(max(c_custkey) AS BIGINT) AS max_key,
        |  (SELECT CAST(count(*) AS BIGINT) FROM customer) AS v1_rows
        |FROM customer WHERE c_custkey > 5""".stripMargin,
    "q_fleet_parquet_changes" ->
      """SELECT * FROM (
        |  SELECT c_custkey, 'insert' AS _change_type FROM customer
        |  WHERE c_custkey % 3 <> 0 AND c_custkey % 9 <> 4
        |  UNION ALL
        |  SELECT c_custkey, 'delete' AS _change_type FROM customer
        |  WHERE c_custkey % 3 = 0 AND c_custkey % 9 = 0
        |) ORDER BY _change_type, c_custkey""".stripMargin,
    "q_scan_csv" ->
      """SELECT CAST(r_regionkey AS INTEGER) AS r_regionkey, r_name
        |FROM region ORDER BY r_regionkey""".stripMargin,
    "q_scan_orc" ->
      "SELECT * FROM nation ORDER BY n_nationkey",
    "q_scan_jsonl" ->
      """SELECT CAST(r_regionkey AS BIGINT) AS r_regionkey, r_name
        |FROM region ORDER BY r_regionkey""".stripMargin,
    "q_scan_text" ->
      """SELECT CAST(r_regionkey AS INTEGER) AS r_regionkey, r_name
        |FROM region ORDER BY r_regionkey""".stripMargin,
    "q_scan_xlsx" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
        |  CAST(n_regionkey AS BIGINT) AS n_regionkey
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "q_scan_avro" ->
      "SELECT * FROM nation ORDER BY n_nationkey",
    "q_scan_avro_dist" ->
      """SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
        |  event_type, value
        |FROM events ORDER BY event_id""".stripMargin,
    // gen-1 rows went through a float cast and predate ts; DuckDB
    // recomputes both generations in closed form
    "q_scan_avro_evolve" ->
      """SELECT event_id, event_type,
        |  CAST(CAST(value AS REAL) AS DOUBLE) AS value,
        |  CAST(NULL AS VARCHAR) AS ts_s
        |FROM events WHERE event_id % 2 = 0
        |UNION ALL
        |SELECT event_id, event_type, value,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
        |FROM events WHERE event_id % 2 = 1
        |ORDER BY event_id""".stripMargin,
    // compaction is a physical rewrite; the oracle is the table itself
    "q_fleet_compact" ->
      """SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
        |  event_type, value
        |FROM events ORDER BY event_id""".stripMargin,
    "q_fleet_rewrite" ->
      """SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
        |  event_type, value
        |FROM events ORDER BY event_id""".stripMargin,
    "q_scan_avro_bloom" ->
      """SELECT event_id, event_type, value,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
        |FROM events WHERE event_id IN (7, 123, 911)
        |ORDER BY event_id""".stripMargin,
    "q_scan_avro_pruned" ->
      """SELECT event_id, event_type
        |FROM events ORDER BY event_id""".stripMargin,
    "q_scan_avro_v2write" ->
      """SELECT s_suppkey, s_name, s_nationkey,
        |  round(s_acctbal, 4) AS s_acctbal
        |FROM supplier ORDER BY s_suppkey""".stripMargin,
    "q_scan_avro_count" ->
      "SELECT count(*) AS n FROM events",
    "q_scan_avro_skip" ->
      """SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
        |  event_type, value
        |FROM events WHERE event_id BETWEEN 100 AND 600
        |ORDER BY event_id""".stripMargin,
    "q_scan_avro_skip_ts" ->
      """SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
        |  event_type, value
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-15 00:00:00'
        |ORDER BY event_id""".stripMargin,
    "q_scan_avro_groupagg" ->
      """SELECT event_type, count(*) AS n, count(value) AS n_val,
        |  min(value) AS min_v, max(value) AS max_v,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS min_ts_s,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS max_ts_s
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_scan_avro_filteragg" ->
      """SELECT event_type, count(*) AS n, min(value) AS min_v,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS max_ts_s
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-22 00:00:00'
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_scan_avro_topn" ->
      """SELECT event_id, value FROM events
        |ORDER BY value DESC, event_id LIMIT 20""".stripMargin,
    "q_scan_avro_skip_prefix" ->
      """SELECT event_id, event_type, value FROM events
        |WHERE event_type LIKE 'cl%' ORDER BY event_id""".stripMargin,
    // xlsx inference reads integer columns back as long (the
    // q_scan_xlsx convention)
    "q_scan_xlsx_fleet" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "q_scan_xlsx_dist" ->
      """SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
        |  CAST(c_nationkey AS BIGINT) AS c_nationkey,
        |  round(c_acctbal, 4) AS c_acctbal
        |FROM customer ORDER BY c_custkey""".stripMargin,
    // name resolution is catalog plumbing; semantics are the aggregate
    "q_catalog_sql_fleet" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // ALTER is metadata-only: the merged read = all events, odd ids
    // carrying the evolved note column, value answering as `amount`
    "q_catalog_alter" ->
      """SELECT event_id, event_type, round(value, 4) AS amount,
        |  CASE WHEN event_id % 2 = 1
        |       THEN 'n' || CAST(event_id AS VARCHAR) END AS note
        |FROM events ORDER BY event_id""".stripMargin,
    // DROP COLUMN + widening are metadata-only: old int-keyed files
    // promote to bigint and skip the dropped column at decode
    "q_catalog_alter_drop" ->
      """SELECT event_id, event_type
        |FROM events ORDER BY event_id""".stripMargin,
    "q_catalog_tables" ->
      """SELECT table_name, CAST(count(*) AS BIGINT) AS n_cols,
        |  string_agg(column_name, '|' ORDER BY ordinal_position) AS cols
        |FROM information_schema.columns
        |WHERE table_name IN ('region', 'nation', 'customer', 'supplier',
        |  'part', 'orders', 'lineitem', 'events', 'documents', 'embeddings')
        |GROUP BY table_name ORDER BY table_name""".stripMargin,
    "q_profile_table" ->
      """WITH a AS (
        |  SELECT count(*) AS n_rows,
        |    count(l_orderkey) AS ok_nn,
        |    count(DISTINCT l_orderkey) AS ok_nd,
        |    CAST(min(l_orderkey) AS VARCHAR) AS ok_min,
        |    CAST(max(l_orderkey) AS VARCHAR) AS ok_max,
        |    count(l_linenumber) AS ln_nn,
        |    count(DISTINCT l_linenumber) AS ln_nd,
        |    CAST(min(l_linenumber) AS VARCHAR) AS ln_min,
        |    CAST(max(l_linenumber) AS VARCHAR) AS ln_max,
        |    count(l_returnflag) AS rf_nn,
        |    count(DISTINCT l_returnflag) AS rf_nd,
        |    min(l_returnflag) AS rf_min,
        |    max(l_returnflag) AS rf_max,
        |    count(l_shipdate) AS sd_nn,
        |    count(DISTINCT strftime(l_shipdate, '%Y-%m-%d')) AS sd_nd,
        |    min(strftime(l_shipdate, '%Y-%m-%d')) AS sd_min,
        |    max(strftime(l_shipdate, '%Y-%m-%d')) AS sd_max
        |  FROM lineitem)
        |SELECT col_name, n_rows, n_nulls, n_distinct, min_val, max_val
        |FROM (
        |  SELECT 'l_orderkey' AS col_name, n_rows, n_rows - ok_nn AS n_nulls,
        |    ok_nd AS n_distinct, ok_min AS min_val, ok_max AS max_val FROM a
        |  UNION ALL
        |  SELECT 'l_linenumber', n_rows, n_rows - ln_nn, ln_nd, ln_min, ln_max
        |  FROM a
        |  UNION ALL
        |  SELECT 'l_returnflag', n_rows, n_rows - rf_nn, rf_nd, rf_min, rf_max
        |  FROM a
        |  UNION ALL
        |  SELECT 'l_shipdate', n_rows, n_rows - sd_nn, sd_nd, sd_min, sd_max
        |  FROM a)
        |ORDER BY col_name""".stripMargin,
    "q_quality_constraints" ->
      """WITH a AS (
        |  SELECT count(*) AS n_rows,
        |    count(l_shipdate) AS sd_nn,
        |    count(DISTINCT (l_orderkey, l_linenumber)) AS key_nd,
        |    sum(CASE WHEN l_quantity BETWEEN 1 AND 50 THEN 0 ELSE 1 END) AS qty_bad,
        |    sum(CASE WHEN l_discount BETWEEN 0.0 AND 0.1 THEN 0 ELSE 1 END) AS disc_bad,
        |    sum(CASE WHEN l_returnflag IN ('A','N','R') THEN 0 ELSE 1 END) AS rf_bad
        |  FROM lineitem)
        |SELECT constraint_name, metric, passed FROM (
        |  SELECT 'completeness_l_shipdate' AS constraint_name,
        |    round(sd_nn / CAST(n_rows AS DOUBLE), 6) AS metric,
        |    sd_nn = n_rows AS passed FROM a
        |  UNION ALL
        |  SELECT 'domain_l_returnflag', CAST(rf_bad AS DOUBLE), rf_bad = 0 FROM a
        |  UNION ALL
        |  SELECT 'range_l_discount', CAST(disc_bad AS DOUBLE), disc_bad = 0 FROM a
        |  UNION ALL
        |  SELECT 'range_l_quantity', CAST(qty_bad AS DOUBLE), qty_bad = 0 FROM a
        |  UNION ALL
        |  SELECT 'size_min_1000', CAST(n_rows AS DOUBLE), n_rows >= 1000 FROM a
        |  UNION ALL
        |  SELECT 'unique_l_orderkey_l_linenumber',
        |    round(key_nd / CAST(n_rows AS DOUBLE), 6), key_nd = n_rows FROM a)
        |ORDER BY constraint_name""".stripMargin,
    "q_scan_jsonl_corrupt" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
        |  (SELECT count(*) FROM nation WHERE n_nationkey % 5 = 0)
        |    AS n_corrupt
        |FROM nation WHERE n_nationkey % 5 <> 0
        |ORDER BY n_nationkey""".stripMargin,
    "q_time_spine_fill" ->
      """WITH b AS (
        |  SELECT date_trunc('month', min(o_orderdate)) AS lo,
        |    date_trunc('month', max(o_orderdate)) AS hi
        |  FROM orders),
        |sp AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS month
        |       FROM b),
        |cu AS (SELECT c_custkey FROM customer WHERE c_custkey < 100),
        |m AS (SELECT o_custkey, date_trunc('month', o_orderdate) AS m_month,
        |        count(*) AS n, round(sum(o_totalprice), 4) AS spend
        |      FROM orders WHERE o_custkey < 100
        |      GROUP BY o_custkey, date_trunc('month', o_orderdate))
        |SELECT cu.c_custkey, strftime(sp.month, '%Y-%m-%d') AS month,
        |  coalesce(m.n, 0) AS n_orders,
        |  round(coalesce(m.spend, 0), 4) AS spend
        |FROM cu CROSS JOIN sp
        |LEFT JOIN m ON cu.c_custkey = m.o_custkey AND sp.month = m.m_month
        |ORDER BY cu.c_custkey, month""".stripMargin,
    "q_sink_partitioned" ->
      """SELECT o_orderstatus, count(*) AS n,
        |  round(sum(o_totalprice), 4) AS sum_price
        |FROM orders WHERE o_orderstatus = 'F'
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_project" ->
      """SELECT p_partkey,
        |  concat_ws('/', p_brand, p_type) AS brand_type,
        |  upper(p_name) AS name_uc,
        |  round(p_retailprice * 0.9, 4) AS sale_price,
        |  p_size + 1 AS size_plus
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_filter_point" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_date
        |FROM orders WHERE o_orderkey = 42""".stripMargin,
    "q_filter_compound" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
        |FROM lineitem
        |WHERE l_quantity BETWEEN 10 AND 20
        |  AND l_discount > 0.03
        |  AND l_returnflag IN ('A', 'R')
        |  AND l_tax IS NOT NULL
        |  AND NOT (l_linestatus IS NOT DISTINCT FROM 'X')
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag""".stripMargin,
    "q_filter_like" ->
      """SELECT p_partkey, p_name, p_type, p_brand,
        |  regexp_matches(p_name, '^(red|blue)') AS re_primary
        |FROM part
        |WHERE p_name LIKE '%red%'
        |   OR (p_type LIKE 'PRO%' AND p_brand LIKE '%3')
        |ORDER BY p_partkey""".stripMargin,
    "q_filter_in_subquery" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |WHERE o_custkey IN
        |  (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |ORDER BY o_orderkey""".stripMargin,
    "q_sort_global" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_date
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey""".stripMargin,
    "q_limit_topn" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,
    "q_limit_offset" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 50 OFFSET 100""".stripMargin,
    "q_topk_pergroup" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER
        |    (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |FROM orders
        |QUALIFY rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,
    "q_set_union" ->
      """SELECT * FROM (
        |  SELECT o_orderkey, o_totalprice, 'open' AS bucket
        |  FROM orders WHERE o_orderstatus = 'O'
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice, 'done' AS bucket
        |  FROM orders WHERE o_orderstatus = 'F'
        |) ORDER BY o_orderkey""".stripMargin,
    "q_set_intersect" ->
      """SELECT o_custkey FROM orders
        |WHERE o_orderdate < TIMESTAMP '1996-01-01'
        |INTERSECT
        |SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '2000-01-01'
        |ORDER BY o_custkey""".stripMargin,
    "q_set_except" ->
      """SELECT o_custkey FROM orders
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey""".stripMargin,
    "q_distinct" ->
      """SELECT DISTINCT c_nationkey, c_mktsegment
        |FROM customer ORDER BY c_nationkey, c_mktsegment""".stripMargin
  )
}
