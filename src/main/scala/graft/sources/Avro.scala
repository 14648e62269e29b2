package graft.sources

import java.io.ByteArrayInputStream

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{CodecFactory, DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.util.Utf8
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro source/sink built directly on the Apache Avro Java library
  * that Spark already ships (`avro-1.12.1.jar` is a core dependency —
  * only the `spark-avro` DataSource CONNECTOR is absent offline), so
  * the survey's last §2.A gap closes with zero new jars: real Avro
  * Object Container Files, deflate-compressed, readable by any Avro
  * tooling.
  *
  * Schema mapping is the flat-record subset the fixture tables (and
  * the reference's sheet model) need: long/int/double/float/boolean/
  * string/binary, each as a `["null", T]` union so Spark nullability
  * roundtrips; date/timestamp columns are stringified by the caller
  * first (the registry discipline stringifies them for the oracle
  * anyway).
  *
  * Scale: one container file per `write` (driver-streamed — the sink
  * twin of a coalesce(1) interchange drop; block-compressed, so the
  * driver never holds more than one row in Avro form), and
  * `readDistributed` parses MANY container files on executors via the
  * binaryFile source, one task per file — the same
  * fleet-of-small-files ingest shape as `Xlsx.readDistributed`, landed
  * to parquet once and scanned columnar thereafter.
  */
object Avro {

  private def avroType(dt: DataType): Schema = dt match {
    case LongType => Schema.create(Schema.Type.LONG)
    case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case other => throw new IllegalArgumentException(
      s"avro sink supports flat primitive columns; got $other " +
        "(stringify dates/timestamps/arrays upstream, per the oracle discipline)")
  }

  private[graft] def toAvroSchema(schema: StructType): Schema = {
    val b = SchemaBuilder.record("row").namespace("graft").fields()
    schema.fields.foreach { f =>
      b.name(f.name).`type`(Schema.createUnion(
        Schema.create(Schema.Type.NULL), avroType(f.dataType))).withDefault(null)
    }
    b.endRecord()
  }

  private def sparkType(s: Schema): DataType = s.getType match {
    case Schema.Type.LONG => LongType
    case Schema.Type.INT => IntegerType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.STRING => StringType
    case Schema.Type.BYTES => BinaryType
    case Schema.Type.UNION =>
      // ["null", T] unions — the only union form this source emits/reads
      val nonNull = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1, s"unsupported avro union: $s")
      sparkType(nonNull.head)
    case other => throw new IllegalArgumentException(
      s"unsupported avro type for a sheet column: $other")
  }

  private[graft] def toSparkSchema(s: Schema): StructType =
    StructType(s.getFields.asScala.toSeq.map(f =>
      StructField(f.name(), sparkType(f.schema()), nullable = true)))

  private def toAvroValue(v: Any): AnyRef = v match {
    case null => null
    case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
    case s: Short => Int.box(s.toInt)
    case b: Byte => Int.box(b.toInt)
    case other => other.asInstanceOf[AnyRef]
  }

  private def fromAvroValue(v: AnyRef): Any = v match {
    case null => null
    case u: Utf8 => u.toString
    case bb: java.nio.ByteBuffer =>
      val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
    case other => other
  }

  /** Write `df` as ONE Avro Object Container File at `path` (any
    * Hadoop-visible filesystem), deflate-compressed. Streams row by
    * row through the block writer — driver memory is O(block). */
  def write(s: SparkSession, path: String, df: DataFrame): Unit = {
    val avroSchema = toAvroSchema(df.schema)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](avroSchema))
      .setCodec(CodecFactory.deflateCodec(6))
      .create(avroSchema, fs.create(p, true))
    try {
      val names = df.schema.fieldNames
      df.toLocalIterator().asScala.foreach { row =>
        val rec = new GenericData.Record(avroSchema)
        names.indices.foreach(i => rec.put(names(i), toAvroValue(row.get(i))))
        w.append(rec)
      }
    } finally w.close()
  }

  private[graft] def parseAll(bytes: Array[Byte]): (Schema, Seq[Seq[Any]]) = {
    val in = new DataFileStream(new ByteArrayInputStream(bytes),
      new GenericDatumReader[GenericRecord]())
    try {
      val schema = in.getSchema
      val fields = schema.getFields.asScala.toSeq.map(_.name())
      val rows = mutable.ArrayBuffer[Seq[Any]]()
      while (in.hasNext) {
        val rec = in.next()
        rows += fields.map(f => fromAvroValue(rec.get(f)))
      }
      (schema, rows.toSeq)
    } finally in.close()
  }

  /** Read one container file as a typed DataFrame (driver-side parse
    * of ONE interchange file; for fleets use `readDistributed`). */
  def read(s: SparkSession, path: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    val in = fs.open(p)
    val bytes = try in.readAllBytes() finally in.close()
    val (schema, rows) = parseAll(bytes)
    s.createDataFrame(
      s.sparkContext.parallelize(rows.map(Row.fromSeq), 1),
      toSparkSchema(schema))
  }

  /** Distributed ingest of MANY container files: binaryFile source
    * (one task per file), Avro-decoded on EXECUTORS. Schema from one
    * driver-side peek at the first file; all files must share it. */
  def readDistributed(s: SparkSession, glob: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val files = s.read.format("binaryFile").load(glob)
      .select(col("content"))
    val firstBytes = files.head().getAs[Array[Byte]](0)
    val (schema, _) = parseAll(firstBytes)
    val schemaJson = schema.toString // avro Schema is not serializable
    val sparkSchema = toSparkSchema(schema)
    val rowRdd = files.rdd.flatMap { r =>
      val expected = new Schema.Parser().parse(schemaJson)
      val (got, rows) = parseAll(r.getAs[Array[Byte]](0))
      require(got == expected,
        s"avro schema mismatch across files: $got vs $expected")
      rows.map(Row.fromSeq)
    }
    s.createDataFrame(rowRdd, sparkSchema)
  }
}
