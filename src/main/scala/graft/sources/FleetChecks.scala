package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BasePredicate, BindReferences, EqualNullSafe, Expression, Literal, Predicate => CatalystPredicate}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation}
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.connector.write.{DataWriter, DataWriterFactory, WriterCommitMessage}
import org.apache.spark.sql.types.{DataType, StructType}
import org.json4s.{JObject, JString}
import org.json4s.jackson.JsonMethods

/** WRITE-TIME CHECK CONSTRAINTS (r19) — the table-format quality gate:
  *
  * {{{
  * CALL graft.system.add_check('t', 'bal_floor', 'c_acctbal >= 0')
  * INSERT INTO graft.t ...            -- violating rows FAIL the job
  * CALL graft.system.checks('t')      -- list
  * CALL graft.system.drop_check('t', 'bal_floor')
  * }}}
  *
  * Semantics are ANSI CHECK (the public Delta/constraint posture): a
  * row violates only when the expression evaluates to FALSE — NULL
  * passes (enforce non-null with an explicit `x IS NOT NULL` check).
  * `add_check` validates the expression against the fleet's declared
  * schema AND scans the existing rows once — a constraint never lands
  * on data that already violates it, so every committed generation of
  * a checked fleet satisfies its checks.
  *
  * ENFORCEMENT is task-side and codegen'd: the expression is parsed,
  * analyzed, and bound on the DRIVER at plan time (a typo or a column
  * the write lacks fails before any task launches), then each task
  * compiles it to a [[BasePredicate]] and evaluates per row inside
  * the existing write loop — one predicate call per row, no extra
  * pass, no shuffle, distributed by construction. Every row-writing
  * path shares the decorator: plain/clustered batch appends,
  * INSERT OVERWRITE, copy-on-write row-level post-images (SQL
  * UPDATE/MERGE re-insert through the swap write), merge-on-read
  * insert post-images, and the streaming sink.
  *
  * Storage (r20 — TRANSACTIONAL): checks are MANIFEST PROPERTIES
  * (`check:<name>` → expr, [[FleetManifest.CheckPropPrefix]]),
  * inherited forward by every commit like the txn ledger. That closes
  * the r19 TOCTOU hole: `add_check` lands as a manifest commit under
  * `expectedVersion` (its validation scan is serializable against
  * concurrent writers), and every row-writing commit carries a
  * `requireChecks` compare-and-set stating the set its tasks
  * enforced — a constraint landing mid-write makes exactly one of the
  * two lose loudly. Checks version with the fleet (AS OF shows each
  * generation's check set), ride clones, and survive resets. Legacy
  * pre-r20 `_checks.json` sidecars are honored read-side until the
  * first add/drop migrates them into the manifest. */
private[graft] object FleetChecks {
  val FileName = "_checks.json"

  /** The ENFORCED check set for new writes at `dir`: the current
    * manifest's `check:` props; a fleet whose manifest carries none
    * falls back to the legacy sidecar (pre-r20). The returned map is
    * also the writer's `requireChecks` compare-and-set payload. */
  def read(fs: FileSystem, dir: Path): Map[String, String] = {
    val fromManifest = FleetManifest.current(fs, dir)
      .map(s => FleetManifest.checksOf(s.props)).getOrElse(Map.empty)
    if (fromManifest.nonEmpty) fromManifest else readSidecar(fs, dir)
  }

  /** The legacy sidecar (pre-r20 storage) — consulted only when the
    * manifest carries no check props; deleted by the first add/drop
    * that migrates its content. */
  def readSidecar(fs: FileSystem, dir: Path): Map[String, String] = {
    val f = new Path(dir, FileName)
    if (!fs.exists(f)) Map.empty
    else {
      val in = fs.open(f)
      val text = try new String(in.readAllBytes(), "UTF-8")
        finally in.close()
      JsonMethods.parse(text) \ "checks" match {
        case JObject(fields) => fields.collect {
          case (k, JString(v)) => k -> v
        }.toMap
        case other => throw new java.io.IOException(
          s"malformed $f: expected {\"checks\": {name: expr}}, got $other")
      }
    }
  }

  def clearSidecar(fs: FileSystem, dir: Path): Unit = {
    fs.delete(new Path(dir, FileName), false); ()
  }

  /** Spell a full check set as manifest props (add/drop commits state
    * the set in full so a legacy sidecar migrates on first touch);
    * `dropped` rides as the empty-string sentinel that clears the
    * inherited entry. */
  def toProps(checks: Map[String, String],
      dropped: Option[String] = None): Map[String, String] =
    checks.map { case (k, v) =>
      (FleetManifest.CheckPropPrefix + k) -> v } ++
      dropped.map(n => (FleetManifest.CheckPropPrefix + n) -> "")

  /** Write a LEGACY sidecar (pre-r20 storage spelling) — kept for
    * migration tests; production add/drop commits to the manifest. */
  private[graft] def writeSidecar(fs: FileSystem, dir: Path,
      checks: Map[String, String]): Unit = {
    val f = new Path(dir, FileName)
    if (checks.isEmpty) { fs.delete(f, false); () }
    else {
      val json = JsonMethods.compact(JsonMethods.render(
        JObject("checks" -> JObject(
          checks.toList.sortBy(_._1).map { case (k, v) =>
            k -> JString(v) }))))
      val tmp = new Path(dir, s".$FileName.tmp")
      val out = fs.create(tmp, true)
      try out.write(json.getBytes("UTF-8")) finally out.close()
      fs.delete(f, false)
      if (!fs.rename(tmp, f)) {
        fs.delete(tmp, false)
        throw new java.io.IOException(s"cannot publish $f")
      }
    }
  }

  /** One constraint bound to a write schema: `violation` evaluates
    * TRUE exactly when the row violates (`expr <=> false` — NULL
    * passes, the ANSI CHECK rule). The expression is fully bound
    * (BoundReferences only), so it serializes to tasks. */
  final case class Bound(name: String, sql: String,
      violation: Expression) extends Serializable

  /** Parse + analyze + bind every check against `schema` on the
    * driver. Loud when a check references a column the write lacks or
    * fails analysis — named, with the remedy. */
  def bind(s: SparkSession, checks: Map[String, String],
      schema: StructType): Seq[Bound] =
    checks.toSeq.sortBy(_._1).map { case (name, sql) =>
      Bound(name, sql, bindOne(s, name, sql, schema))
    }

  private def bindOne(s: SparkSession, name: String, sql: String,
      schema: StructType): Expression = {
    val attrs = DataTypeUtils.toAttributes(schema)
    val analyzed =
      try {
        val parsed = s.sessionState.sqlParser.parseExpression(sql)
        s.sessionState.analyzer.executeAndCheck(
          Filter(parsed, LocalRelation(attrs)),
          new org.apache.spark.sql.catalyst.QueryPlanningTracker)
      } catch {
        case e: org.apache.spark.sql.AnalysisException =>
          throw new IllegalArgumentException(
            s"CHECK constraint '$name' ($sql) does not resolve " +
              s"against the write schema (${schema.fieldNames
                .mkString(", ")}): ${e.getMessage}")
        case e: org.apache.spark.sql.catalyst.parser.ParseException =>
          throw new IllegalArgumentException(
            s"CHECK constraint '$name' is not a valid SQL boolean " +
              s"expression ($sql): ${e.getMessage}")
      }
    val cond = analyzed match {
      case Filter(c, _) => c
      case other => throw new IllegalStateException(
        s"unreachable: analyzed Filter became $other")
    }
    require(cond.deterministic,
      s"CHECK constraint '$name' ($sql) is non-deterministic — a " +
        "retried task would admit different rows")
    EqualNullSafe(BindReferences.bindReference(cond, attrs),
      Literal(false))
  }

  /** Render a violating row for the error message — values in schema
    * order, bounded, driver-legible. */
  def renderRow(row: InternalRow, names: Array[String],
      types: Array[DataType]): String =
    names.indices.map { i =>
      val v = if (row.isNullAt(i)) "NULL"
        else String.valueOf(row.get(i, types(i))).take(64)
      s"${names(i)}=$v"
    }.mkString(", ")

  /** The loud, actionable violation error — one spelling for every
    * write path. */
  def violationError(c: Bound, row: InternalRow, names: Array[String],
      types: Array[DataType]): Nothing =
    throw new IllegalStateException(
      s"CHECK constraint '${c.name}' violated: (${c.sql}) is false " +
        s"for row [${renderRow(row, names, types)}] — the write " +
        "failed whole (no partial data lands); fix the pipeline or " +
        s"CALL drop_check to lift the constraint")
}

/** Per-row enforcement decorator over any [[DataWriter]] — compiles
  * each bound check to a codegen'd predicate once per task and
  * evaluates inside the write loop. */
private[sources] class CheckedDataWriter(
    inner: DataWriter[InternalRow], checks: Seq[FleetChecks.Bound],
    names: Array[String], types: Array[DataType], pid: Int)
    extends DataWriter[InternalRow] {

  private val preds: Array[BasePredicate] = checks.map { c =>
    val p = CatalystPredicate.create(c.violation)
    p.initialize(pid)
    p
  }.toArray

  private def check(row: InternalRow): Unit = {
    var i = 0
    while (i < preds.length) {
      if (preds(i).eval(row))
        FleetChecks.violationError(checks(i), row, names, types)
      i += 1
    }
  }

  override def write(row: InternalRow): Unit = {
    check(row); inner.write(row)
  }

  override def write(metadata: InternalRow, row: InternalRow): Unit = {
    check(row); inner.write(metadata, row)
  }

  override def commit(): WriterCommitMessage = inner.commit()
  override def abort(): Unit = inner.abort()
  override def close(): Unit = inner.close()
}

/** Factory decorator: wraps every task writer when the fleet carries
  * checks; zero-cost pass-through otherwise (callers skip wrapping on
  * empty checks). */
private[sources] class CheckedWriterFactory(inner: DataWriterFactory,
    checks: Seq[FleetChecks.Bound], names: Array[String],
    types: Array[DataType]) extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new CheckedDataWriter(inner.createWriter(partitionId, taskId),
      checks, names, types, partitionId)
}
