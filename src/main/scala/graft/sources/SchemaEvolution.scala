package graft.sources

import org.apache.spark.sql.types._

/** Schema evolution for avro fleets (`mergeSchema=true` on the
  * `graft-avro` reader — the option name mirrors Spark's parquet
  * reader). A long-lived 100 TB fleet is never one schema: columns get
  * added, measures get widened, and the files already on disk are
  * immutable. With the option set, the table schema is the MERGE of
  * every file's writer schema and each file decodes against its own
  * generation:
  *
  *  - a column a file predates reads as NULL for its rows;
  *  - a column a file recorded narrower is widened at decode through
  *    the EXACT promotions only (int→long, float→double — the
  *    value-preserving half of Avro's resolution lattice; long→double
  *    style lossy promotions are refused so two generations can never
  *    disagree about a value);
  *  - any other same-name type conflict fails loudly at merge time.
  *
  * Without the option the connector keeps its strict posture: a
  * mixed-schema fleet fails per file instead of mis-decoding
  * (AvroFleetSource scaladoc). Pushed filters and sidecar skip-proofs
  * stay sound across generations because `FleetFilters.cmp` already
  * widens mixed numeric carriers the same way the decode does. */
/** The `_schema.json` TABLE-SCHEMA marker an `ALTER TABLE` lays down
  * (SQL DDL through [[GraftCatalog.alterTable]]): the fleet's
  * declared schema plus a rename-alias map (`logical new name →
  * physical name in pre-rename files`). Data files stay immutable —
  * ADD COLUMN null-fills older generations through the evolve decode
  * path, RENAME COLUMN resolves the alias per file — so the DDL is a
  * metadata-only marker write, O(1) at any fleet size. Readers prefer
  * the marker over the header peek wherever it exists; a TRUNCATE
  * (overwrite) clears it along with the layout marker. */
private[graft] object FleetSchemaMarker {
  val FileName = "_schema.json"

  /** `aliases` is the full historical CHAIN per current column name,
    * newest spelling first — files written between two renames carry
    * an intermediate name, so one original-physical entry is not
    * enough for a column renamed twice. `dropped` is every TERMINAL
    * spelling retired by `DROP COLUMN` (the dropped name plus its
    * whole alias chain): files on disk still carry data under those
    * names, so none may ever be reintroduced — a resurrected spelling
    * would rebind old files' values to the new logical column. */
  final case class Marker(schema: StructType,
      aliases: Map[String, Seq[String]],
      dropped: Seq[String] = Seq.empty)

  def write(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path, m: Marker): Unit =
    writeAt(fs, dir, new org.apache.hadoop.fs.Path(dir, FileName), m)

  /** The marker's canonical JSON body — the on-disk spelling AND the
    * value of the manifest [[FleetManifest.SchemaProp]] (versioned
    * declared schemas, r19). */
  def toJsonString(m: Marker): String =
    org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(org.json4s.JObject(
        "schema" -> org.json4s.jackson.JsonMethods.parse(m.schema.json),
        "aliases" -> org.json4s.JObject(m.aliases.toList.map {
          case (k, vs) => k -> (org.json4s.JArray(
            vs.map(org.json4s.JString(_)).toList): org.json4s.JValue)
        }),
        "dropped" -> org.json4s.JArray(
          m.dropped.map(org.json4s.JString(_)).toList))))

  def fromJsonString(text: String): Marker = parseBody(text)

  private def writeAt(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path,
      dest: org.apache.hadoop.fs.Path, m: Marker): Unit = {
    val body = toJsonString(m)
    val tmp = new org.apache.hadoop.fs.Path(dest.getParent,
      s".${dest.getName}.tmp")
    fs.mkdirs(dest.getParent)
    val out = fs.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    // rename OVER the destination first (POSIX rename clobbers
    // atomically — no window with no marker at all); only a
    // filesystem that refuses an existing destination falls back to
    // the delete-then-rename with its brief no-marker window
    if (!fs.rename(tmp, dest)) {
      fs.delete(dest, false)
      if (!fs.rename(tmp, dest)) { fs.delete(tmp, false); () }
    }
  }

  // ---- branch-STAGED markers (write-audit-publish evolution, r19) --
  //
  // An ALTER under an active branch session must not change what MAIN
  // readers resolve — the whole point of staging is that main is
  // untouched until fast_forward. The staged marker lives INSIDE the
  // branch's version directory (`_manifest/branches/<name>/_schema
  // .json` — version listing ignores non-`v*.json` names, and
  // drop_branch / expire_branches delete the directory recursively, so
  // an abandoned staged evolution vanishes with its fork), and
  // fast_forward publishes it to the fleet-root marker atomically
  // with the version adoption it completes.

  private def stagedPath(dir: org.apache.hadoop.fs.Path,
      branch: String): org.apache.hadoop.fs.Path = {
    val vdir = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(dir, "_manifest"), "branches"),
      branch)
    new org.apache.hadoop.fs.Path(vdir, FileName)
  }

  def writeStaged(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path, branch: String,
      m: Marker): Unit =
    writeAt(fs, dir, stagedPath(dir, branch), m)

  def readStaged(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path,
      branch: String): Option[Marker] =
    readPath(fs, stagedPath(dir, branch))

  /** The marker a reader of `branch` (None = main) resolves: the
    * branch's staged marker when one exists, else the fleet-root
    * marker (a fork without staged evolution reads main's declared
    * schema — fork-point inheritance). */
  def resolve(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path,
      branch: Option[String]): Option[Marker] =
    branch.flatMap(readStaged(fs, dir, _)).orElse(read(fs, dir))

  /** VERSIONED resolution (r19): a `VERSION AS OF` / `TIMESTAMP AS
    * OF` / branch-versioned read resolves the declared schema from
    * the target snapshot's [[FleetManifest.SchemaProp]] — the schema
    * THAT generation had (a pre-DROP version shows the dropped column
    * with its data; a mid-evolution version its intermediate shape).
    * A snapshot without the prop predates the first stamped ALTER (or
    * the whole fleet predates stamping): fall back to [[resolve]] —
    * exact for never-altered fleets, the documented pre-r19 behavior
    * for legacy histories. */
  def resolveAt(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path,
      branch: Option[String],
      version: Option[Long]): Option[Marker] =
    version.flatMap { v =>
      (branch match {
        case Some(b) => FleetManifest.snapshotAtRef(fs, dir, v, Some(b))
        case None => FleetManifest.snapshotAt(fs, dir, v)
      }).flatMap(_.props.get(FleetManifest.SchemaProp))
        .map(fromJsonString)
    }.orElse(resolve(fs, dir, branch))

  /** Publish a branch's staged marker to the fleet root (fast_forward
    * body; no-op when the branch staged no evolution). The staged
    * copy is left for the caller's recursive vdir delete. */
  def publishStaged(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path, branch: String): Unit =
    readStaged(fs, dir, branch).foreach(write(fs, dir, _))

  def read(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Option[Marker] =
    readPath(fs, new org.apache.hadoop.fs.Path(dir, FileName))

  private def readPath(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Option[Marker] = {
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val text = try new String(in.readAllBytes(), "UTF-8")
        finally in.close()
      Some(parseBody(text))
    }
  }

  private def parseBody(text: String): Marker = {
    {
      val obj = org.json4s.jackson.JsonMethods.parse(text)
      val schema = DataType.fromJson(
        org.json4s.jackson.JsonMethods.compact(
          org.json4s.jackson.JsonMethods.render(obj \ "schema")))
        .asInstanceOf[StructType]
      val aliases = (obj \ "aliases") match {
        case o: org.json4s.JObject => o.obj.collect {
          // legacy single-spelling markers parse as one-element chains
          case (k, org.json4s.JString(v)) => k -> Seq(v)
          case (k, org.json4s.JArray(vs)) =>
            k -> vs.collect { case org.json4s.JString(v) => v }
        }.toMap
        case _ => Map.empty[String, Seq[String]]
      }
      // legacy (pre-DROP) markers carry no dropped list
      val dropped = (obj \ "dropped") match {
        case org.json4s.JArray(vs) =>
          vs.collect { case org.json4s.JString(v) => v }
        case _ => Seq.empty[String]
      }
      Marker(schema, aliases, dropped)
    }
  }

  def clear(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Unit = {
    fs.delete(new org.apache.hadoop.fs.Path(dir, FileName), false)
    ()
  }
}

private[sources] object SchemaEvolution {

  /** Exact, value-preserving widenings the decode path applies. */
  def promotes(from: DataType, to: DataType): Boolean = (from, to) match {
    case (IntegerType, LongType)  => true
    case (FloatType, DoubleType)  => true
    case _                        => false
  }

  private def widen(a: DataType, b: DataType): Option[DataType] =
    if (a == b) Some(a)
    else if (promotes(a, b)) Some(b)
    else if (promotes(b, a)) Some(a)
    else None

  /** Merge writer schemas by field NAME: first-seen field order (the
    * stable choice for a fleet listed in path order), types widened
    * through the exact lattice, anything else a loud failure naming
    * the column. Every merged field is nullable — an added column is
    * null for every pre-existing file. */
  def merge(schemas: Seq[StructType]): StructType = {
    require(schemas.nonEmpty, "cannot merge zero schemas")
    val order = scala.collection.mutable.LinkedHashMap.empty[String, DataType]
    schemas.foreach(_.foreach { f =>
      order.get(f.name) match {
        case None => order.update(f.name, f.dataType)
        case Some(t) => order.update(f.name, widen(t, f.dataType).getOrElse(
          throw new IllegalArgumentException(
            s"cannot merge fleet schemas: column ${f.name} is " +
              s"${t.catalogString} in one generation and " +
              s"${f.dataType.catalogString} in another (only exact " +
              "int->bigint / float->double widenings are supported)")))
      }
    })
    StructType(order.iterator.map { case (n, t) =>
      StructField(n, t, nullable = true)
    }.toSeq)
  }

  /** Can `writer` decode under `table`? Every writer field must be
    * absent from the table (ignored), identical, or exactly
    * promotable. Called per file by the row reader in evolve mode. */
  def compatible(writer: StructType, table: StructType): Boolean = {
    val tableByName = table.map(f => f.name -> f.dataType).toMap
    writer.forall(wf => tableByName.get(wf.name).forall(tt =>
      wf.dataType == tt || promotes(wf.dataType, tt)))
  }

  /** Post-decode widener from a writer type to the table type
    * (identity when they already agree). */
  def promoter(from: DataType, to: DataType): Any => Any =
    (from, to) match {
      case (f, t) if f == t => identity
      case (IntegerType, LongType) => {
        case v: Int => v.toLong
        case v => v
      }
      case (FloatType, DoubleType) => {
        case v: Float => v.toDouble
        case v => v
      }
      case _ => throw new IllegalStateException(
        s"no exact promotion ${from.catalogString} -> ${to.catalogString}")
    }
}
