package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The user-facing workbook surface (SURVEY.md §1.1): the reference's
  * spreadsheet-as-database verbs — load a directory of sheets, read a
  * sheet, insert / update / remove / upsert rows, introspect headers,
  * save — as one thin facade over the same plans the query registry
  * exercises (`ops.Crud` for the CRUD shapes, `ops.Relational`'s
  * catalog query for introspection). A user of the reference switches
  * engines by swapping `Workbook.load(path)` for this class; everything
  * downstream is an ordinary immutable `DataFrame`.
  *
  * Semantics are copy-on-write, matching the CRUD registry queries: no
  * verb mutates storage. A `Workbook` is an immutable map of named
  * lazy frames; every verb returns a NEW workbook holding the derived
  * plans, and nothing touches disk until `save`. That is also the
  * 100 TB posture — each sheet is a plan, not a materialized table, so
  * a load → filter → upsert → save pipeline runs as one distributed
  * job per sheet with full pushdown/pruning, never a driver-side copy.
  * Laziness extends to the interchange formats: `load` defers each
  * avro/xlsx sheet's parse to first access (memoized, shared across
  * the copy-on-write lineage), so loading a wide directory costs only
  * the sheets actually touched.
  */
final class Workbook private (
    val spark: SparkSession,
    private val sheets: Map[String, () => DataFrame]) {

  def sheetNames: Seq[String] = sheets.keys.toSeq.sorted

  /** The sheet's frame. Interchange sheets (avro/xlsx) loaded via
    * `load` parse LAZILY on first access — memoized once per loaded
    * file and SHARED across workbooks derived with the verbs below, so
    * a 50-sheet directory costs only the sheets a pipeline touches. */
  def sheet(name: String): DataFrame =
    sheets.getOrElse(name, throw new NoSuchElementException(
      s"no sheet '$name'; workbook has: ${sheetNames.mkString(", ")}"))()

  /** Sheet list + header rows (the reference's workbook introspection;
    * same shape as the oracle-checked `q_catalog_tables`): name, column
    * count, '|'-joined header — from schema metadata, no data scan.
    * (Interchange sheets must be PARSED for their schema — xlsx infers
    * types from cells — so introspecting a lazily-loaded workbook
    * forces every sheet's one-time parse.) */
  def introspect: DataFrame = {
    import spark.implicits._
    sheetNames
      .map { n =>
        val sch = sheet(n).schema
        (n, sch.length.toLong, sch.map(_.name).mkString("|"))
      }
      .toDF("table_name", "n_cols", "cols")
      .orderBy($"table_name")
  }

  /** Add or replace a sheet wholesale (the primitive every verb below
    * derives from). */
  def withSheet(name: String, df: DataFrame): Workbook =
    new Workbook(spark, sheets + (name -> (() => df)))

  def dropSheet(name: String): Workbook = {
    // fail fast on unknown names — a key check, not a force: dropping
    // a lazy sheet must not parse it first
    require(sheets.contains(name),
      s"no sheet '$name'; workbook has: ${sheetNames.mkString(", ")}")
    new Workbook(spark, sheets - name)
  }

  /** INSERT: append rows (matched by column name, so caller column
    * order is free). */
  def insert(name: String, rows: DataFrame): Workbook =
    withSheet(name, sheet(name).unionByName(rows))

  /** UPDATE ... SET ... WHERE: conditional recompute (`ops.Crud`'s
    * update shape). All assignments evaluate against the PRE-update
    * row simultaneously — one select, so a swap like
    * `Map("a" -> col("b"), "b" -> col("a"))` is well-defined — and
    * unmatched rows pass through unchanged. */
  def update(name: String, condition: Column,
      set: Map[String, Column]): Workbook = {
    val df = sheet(name)
    val unknown = set.keySet -- df.columns.toSet
    require(unknown.isEmpty,
      s"update targets unknown column(s) ${unknown.mkString(", ")} on '$name'")
    val cols = df.columns.toSeq.map { c =>
      set.get(c)
        .map(v => when(condition, v).otherwise(col(c)).as(c))
        .getOrElse(col(c))
    }
    withSheet(name, df.select(cols: _*))
  }

  /** DELETE WHERE: the surviving relation (negative filter; NULL
    * predicate rows survive, matching SQL DELETE semantics where only
    * TRUE-matching rows are removed). */
  def remove(name: String, condition: Column): Workbook =
    withSheet(name, sheet(name).filter(!coalesce(condition, lit(false))))

  /** UPSERT: insert-or-update by key — updates win over base rows on
    * key collision (`ops.Crud`'s keyed precedence-window merge; at
    * 100 TB this is the standard shuffle-on-key merge, identical in
    * shape to MERGE INTO on a table format). Within `updates`,
    * duplicate keys are resolved arbitrarily — deduplicate upstream if
    * the update set can carry conflicts. */
  def upsert(name: String, updates: DataFrame, keys: Seq[String]): Workbook = {
    require(keys.nonEmpty, "upsert needs at least one key column")
    val base = sheet(name).withColumn("__is_update", lit(0))
    val ups = updates.withColumn("__is_update", lit(1))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__is_update").desc)
    val merged = base.unionByName(ups)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__is_update", "__rn")
    withSheet(name, merged)
  }

  /** MERGE: apply a change feed carrying a per-row op column in ONE
    * pass (`ops.Crud.qCrudMerge`'s dataflow — the MERGE INTO verb):
    * matched `D` deletes, matched `U` updates every non-key column
    * from the feed, unmatched `I` inserts, unmatched `U`/`D` are
    * no-ops, and base rows without a feed match pass through. The feed
    * must carry the key columns, `opCol`, and every base column
    * (update/insert need full rows). One full-outer join on the keys —
    * the same shuffle shape a transactional table format executes.
    * Duplicate keys within the feed are rejected nowhere — resolve
    * upstream, same caveat as `upsert`. */
  def merge(name: String, feed: DataFrame, keys: Seq[String],
      opCol: String = "op"): Workbook = {
    require(keys.nonEmpty, "merge needs at least one key column")
    val base = sheet(name)
    val missing = (base.columns.toSet + opCol) -- feed.columns.toSet
    require(missing.isEmpty,
      s"merge feed is missing columns: ${missing.toSeq.sorted.mkString(", ")}")
    val f = feed.columns.foldLeft(feed)((d, c) => d.withColumnRenamed(c, s"__f_$c"))
    val cond = keys.map(k => base(k) === f(s"__f_$k")).reduce(_ && _)
    val joined = base.join(f, cond, "full_outer")
    val matched = keys.map(k => base(k).isNotNull).reduce(_ && _)
    val op = f(s"__f_$opCol")
    val merged = joined
      .filter(!matched || op.isNull || op =!= "D") // matched delete (3VL-safe)
      .filter(matched || op === "I") // unmatched U/D no-op
      .select(base.columns.map { c =>
        val fc = f(s"__f_$c")
        if (keys.contains(c)) coalesce(base(c), fc).as(c)
        else when(matched && op === "U", fc)
          .when(!matched, fc)
          .otherwise(base(c)).as(c)
      }.toSeq: _*)
    withSheet(name, merged)
  }

  /** ADD COLUMN: a computed column appended to the sheet (the
    * spreadsheet "new column from a formula" verb; `value` may
    * reference any existing columns). */
  def addColumn(name: String, column: String, value: Column): Workbook = {
    val df = sheet(name)
    require(!df.columns.contains(column),
      s"sheet '$name' already has column '$column'")
    withSheet(name, df.withColumn(column, value))
  }

  /** RENAME COLUMN (header edit; fails on unknown source column). */
  def renameColumn(name: String, from: String, to: String): Workbook = {
    val df = sheet(name)
    require(df.columns.contains(from),
      s"no column '$from' on sheet '$name' (has: ${df.columns.mkString(", ")})")
    withSheet(name, df.withColumnRenamed(from, to))
  }

  /** DROP COLUMN (fails on unknown column — silent drops hide typos). */
  def dropColumn(name: String, column: String): Workbook = {
    val df = sheet(name)
    require(df.columns.contains(column),
      s"no column '$column' on sheet '$name' (has: ${df.columns.mkString(", ")})")
    withSheet(name, df.drop(column))
  }

  /** Register every sheet as a (global-conflict-free, session-local)
    * temp view so `spark.sql` — and therefore the whole SQL surface of
    * the engine — works over workbook sheets by name. Sheet names come
    * from FILE names, which need not be SQL identifiers ("sales-2024");
    * non-identifier characters are sanitized to '_' so one oddly-named
    * sheet cannot break queries that never touch it. The returned list
    * is the ACTUAL view names, in sheet order. */
  def createViews(prefix: String = ""): Seq[String] = {
    val views = sheetNames.map { n =>
      n -> (prefix + n.map(c =>
        if (c.isLetterOrDigit || c == '_') c else '_'))
    }
    // distinct sheet names can collapse onto one sanitized view name
    // ('sales-2024' and 'sales 2024'); createOrReplaceTempView would
    // silently clobber the first and later sql() reads the WRONG
    // sheet — fail fast instead (same stance as the xlsx dup check).
    // View names are case-insensitive in Spark, so compare folded.
    val collide = views.groupBy(_._2.toLowerCase).filter(_._2.size > 1)
    require(collide.isEmpty,
      "sheet names collide after view-name sanitization: " +
        collide.map { case (v, ss) =>
          ss.map("'" + _._1 + "'").mkString(", ") + s" -> $v"
        }.mkString("; ") + " — rename the sheets to distinct SQL-safe names")
    views.map { case (n, view) =>
      sheet(n).createOrReplaceTempView(view)
      view
    }
  }

  /** SQL over the workbook's sheets (views registered on the fly). */
  def sql(query: String): DataFrame = {
    createViews()
    spark.sql(query)
  }

  /** Save every sheet as `dir/<name>.parquet` (the same layout `load`
    * reads, so save → load roundtrips). `partitionCols` opts individual
    * sheets into a partitioned layout — the 100 TB posture for any big
    * sheet, giving partition-pruned scans on reload. `format` may be
    * "csv" for a per-sheet interchange layout (header row written),
    * "xlsx" for the reference's NATIVE format — ONE real
    * `dir/workbook.xlsx` holding every sheet (pure-JDK SpreadsheetML
    * writer, `graft.sources.Xlsx`; bounded by the format's own
    * 1,048,576-row sheet cap; date/timestamp columns are written as
    * ISO STRINGS, not Excel date serials, and read back as string —
    * `date_format` upstream to control the form) — or "avro" for
    * per-sheet Object
    * Container Files (`graft.sources.Avro`, exact primitive types
    * preserved; multi-partition sheets land as a DIRECTORY of
    * per-partition OCFs written on executors, which `load` reads back
    * transparently). Parquet remains the scale path — the
    * interchange formats have no pushdown, stats, or column pruning.
    * Do NOT save onto a directory a lazy sheet of THIS workbook was
    * loaded from: frames are lazy, and overwrite-while-reading is
    * undefined in any engine. */
  def save(dir: String,
      partitionCols: Map[String, Seq[String]] = Map.empty,
      format: String = "parquet"): Unit = {
    require(Set("parquet", "csv", "xlsx", "avro").contains(format),
      s"unsupported workbook format: $format")
    require(partitionCols.isEmpty || format == "parquet" || format == "csv",
      s"partitionCols is not supported for the $format interchange " +
        "format — silently ignoring it would hide the loss of " +
        "partition-pruned reloads")
    if (format == "xlsx") {
      // single-partition sheets share ONE workbook file (the
      // interchange-friendly layout); multi-partition sheets shard to
      // a per-sheet FLEET directory of part workbooks written on
      // executors — the same single-vs-distributed split as the avro
      // path, so a big sheet neither bottlenecks on the driver stream
      // nor trips the format's single-sheet row cap
      val (fleet, single) = sheetNames.partition(n =>
        Workbook.staticNumPartitions(sheet(n)) > 1)
      fleet.foreach(n =>
        sources.Xlsx.writeDistributed(spark, s"$dir/$n.xlsx", n, sheet(n)))
      if (single.nonEmpty || fleet.isEmpty)
        sources.Xlsx.write(spark, s"$dir/workbook.xlsx",
          single.map(n => n -> sheet(n)))
    }
    else if (format == "avro")
      sheetNames.foreach { n =>
        val df = sheet(n)
        // multi-partition sheets take the executor-side per-partition
        // sink (no driver bottleneck — avro has no format row cap to
        // bound a driver-streamed write); single-partition sheets stay
        // one interchange file. Probe via staticNumPartitions — see
        // its scaladoc for why NOT queryExecution.toRdd here.
        if (Workbook.staticNumPartitions(df) > 1)
          sources.Avro.writeDistributed(spark, s"$dir/$n.avro", df)
        else sources.Avro.write(spark, s"$dir/$n.avro", df)
      }
    else sheetNames.foreach { n =>
      val w0 = sheet(n).write.mode("overwrite")
      val w = partitionCols.get(n).filter(_.nonEmpty)
        .fold(w0)(cs => w0.partitionBy(cs: _*))
      if (format == "csv") w.option("header", "true").csv(s"$dir/$n.csv")
      else w.parquet(s"$dir/$n.parquet")
    }
  }
}

object Workbook {

  /** Partition count of the NON-adaptive physical plan, computed
    * without running any job. `queryExecution.toRdd` would hand back
    * AQE's final RDD, and AdaptiveSparkPlanExec materializes every
    * upstream query stage EAGERLY just to finalize the plan — the save
    * path would then execute the sheet's shuffles twice (once for this
    * count, once for the write, which plans its own execution).
    *
    * `sparkPlan` is the planner output BEFORE `QueryExecution
    * .preparations` (no EnsureRequirements, no PlanSubqueries, no
    * columnar transitions), so `.execute()` on it is only legal for
    * plan shapes that need none of those: scans, per-row narrow ops,
    * and explicit coalesce/repartition. Join/aggregate/sort shapes
    * would throw (a broadcast build side that is not yet a
    * BroadcastExchange, or an SMJ zipping children with unequal
    * partition counts) — those are probed STRUCTURALLY as
    * multi-partition, which only ever flips a sheet to the
    * DISTRIBUTED writer, the scale-safe side of the fork. Any
    * surprise during the safe-shape probe falls back the same way. */
  private[graft] def staticNumPartitions(df: DataFrame): Int = {
    import org.apache.spark.sql.execution._
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val plan = df.queryExecution.sparkPlan
    val probeSafe = plan.collect { case p => p }.forall {
      case _: LeafExecNode => true
      case _: ProjectExec | _: FilterExec | _: CoalesceExec => true
      case _: SerializeFromObjectExec | _: DeserializeToObjectExec => true
      case _: MapPartitionsExec | _: MapElementsExec => true
      case _: ShuffleExchangeExec => true // repartition(n): static count
      case _ => false
    }
    if (!probeSafe) Int.MaxValue
    else scala.util.Try(plan.execute().getNumPartitions)
      .getOrElse(Int.MaxValue)
  }


  /** An in-memory workbook over existing frames (the programmatic
    * entry; `load` is the storage entry). */
  def apply(spark: SparkSession, sheets: Map[String, DataFrame]): Workbook =
    new Workbook(spark, sheets.map { case (n, df) => n -> (() => df) })

  /** Memoize a sheet thunk: the underlying parse runs at most once,
    * and — because derived workbooks share the closure — at most once
    * across the whole copy-on-write lineage. */
  private def memo(f: () => DataFrame): () => DataFrame = {
    lazy val v = f(); () => v
  }

  /** Load a directory of sheets: every `<name>.parquet` and
    * `<name>.csv` entry (file or partitioned directory — the readers
    * handle both) becomes sheet `<name>`, and every `*.xlsx` workbook
    * contributes its INTERNAL sheets under their own names (the
    * reference's native format, via the pure-JDK `sources.Xlsx`
    * codec). On a name collision parquet wins over csv over xlsx (the
    * save format's primary first). CSV/xlsx sheets read with a header
    * row and schema inference (a one-off data scan; convert big sheets
    * to parquet via `save` for footer-only loads and pushdown).
    * Listing uses the Hadoop FS of the path, so `dir` may live on any
    * configured filesystem (local, HDFS, object store).
    *
    * Load is LAZY about sheet CONTENT: listing, xlsx sheet-name
    * discovery, and the cross-workbook collision check run here, but
    * the per-sheet parse/scan is deferred to first access and memoized
    * once per loaded file (all sheets of one workbook share its single
    * parse). A directory of 50 interchange sheets costs only the
    * sheets a pipeline touches — the price is that a CORRUPT sheet
    * file surfaces at first access, not at load. */
  def load(spark: SparkSession, dir: String): Workbook = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(path), s"workbook dir does not exist: $dir")
    val entries = fs.listStatus(path).toSeq.map(_.getPath.getName)
    def sheets(suffix: String, read: String => DataFrame) = entries
      .filter(_.endsWith(suffix)).map(_.stripSuffix(suffix))
      .map(n => n -> memo(() => read(s"$dir/$n$suffix"))).toMap
    // xlsx sheet NAMES are read structurally at load (workbook.xml
    // only — needed for the sheet map and the collision check); the
    // cell parse is deferred, one memoized parse per FILE shared by
    // every sheet in it
    val allStatus = fs.listStatus(path).toSeq
    // a *.xlsx DIRECTORY is a writeDistributed sheet fleet: sheet name
    // = entry name, parsed on executors via the distributed reader
    val xlsxFleets = allStatus
      .filter(st => st.isDirectory && st.getPath.getName.endsWith(".xlsx"))
      .map(_.getPath.getName.stripSuffix(".xlsx"))
    val fleetSheets = xlsxFleets.map(n =>
      n -> memo(() =>
        sources.Xlsx.readDistributed(spark, s"$dir/$n.xlsx", n))).toMap
    val xlsxFiles = entries.filter(_.endsWith(".xlsx"))
      .filter(f => allStatus.exists(st =>
        st.getPath.getName == f && st.isFile)).sorted
    val xlsxPairs = xlsxFiles.flatMap { f =>
      val in = fs.open(new org.apache.hadoop.fs.Path(s"$dir/$f"))
      val bytes = try in.readAllBytes() finally in.close()
      sources.Xlsx.sheetNames(bytes).map(n => (f, n))
    }
    // a name colliding ACROSS workbook files would silently last-win in
    // a toMap — fail fast instead (same stance as dropColumn: silent
    // drops hide mistakes)
    val dupXlsx = xlsxPairs.groupBy(_._2).filter(_._2.size > 1)
    require(dupXlsx.isEmpty,
      s"sheet name(s) appear in multiple .xlsx workbooks: " +
        dupXlsx.map { case (n, fs) =>
          s"'$n' in ${fs.map(_._1).mkString(", ")}" }.mkString("; "))
    val parseFile: Map[String, () => Map[String, DataFrame]] =
      xlsxFiles.map { f =>
        f -> { lazy val m = sources.Xlsx.read(spark, s"$dir/$f"); () => m }
      }.toMap
    val xlsx = xlsxPairs
      .map { case (f, n) => n -> (() => parseFile(f)()(n)) }.toMap
    val dupFleet = xlsxFleets.toSet
      .intersect(xlsxPairs.map(_._2).toSet)
    require(dupFleet.isEmpty,
      s"sheet name(s) appear both as a fleet directory and inside a " +
        s"workbook file: ${dupFleet.mkString(", ")}")
    val avro = sheets(".avro", p => sources.Avro.read(spark, p))
    val csv = sheets(".csv", p => spark.read
      .option("header", "true").option("inferSchema", "true").csv(p))
    val parquet = sheets(".parquet", spark.read.parquet(_))
    require(avro.nonEmpty || xlsx.nonEmpty || fleetSheets.nonEmpty ||
      csv.nonEmpty || parquet.nonEmpty,
      s"no *.parquet, *.csv, *.xlsx, or *.avro sheets under: $dir")
    new Workbook(spark, avro ++ xlsx ++ fleetSheets ++ csv ++ parquet)
  }
}
