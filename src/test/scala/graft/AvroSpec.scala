package graft

import org.apache.spark.sql.functions._
import graft.sources.Avro

/** The Avro source/sink built on Spark's bundled avro library:
  * type-exact roundtrips (incl. nulls and binary), workbook-facade
  * save/load, and the distributed many-file read. */
class AvroSpec extends SparkSpec {

  private def tmp(name: String): String = graft.util.Scratch.dir(name)

  test("avro roundtrip preserves exact types, nulls, and binary") {
    import spark.implicits._
    val df = Seq(
      (1, 10L, Some(1.5), Some(2.5f), Some(true), Some("plain"),
        Some(Array[Byte](1, 2, 3))),
      (2, 20L, None, None, None, None, None),
      (3, 30L, Some(-0.25), Some(0.5f), Some(false),
        Some("unicode café ☕ <&>"), Some(Array[Byte]()))
    ).toDF("i", "l", "d", "f", "b", "s", "bin")
    val path = tmp("avro_rt") + "/t.avro"
    Avro.write(spark, path, df)
    val back = Avro.read(spark, path).orderBy($"i")
    assert(back.schema.map(f => (f.name, f.dataType.typeName)) ==
      Seq("i" -> "integer", "l" -> "long", "d" -> "double",
        "f" -> "float", "b" -> "boolean", "s" -> "string",
        "bin" -> "binary"))
    val rows = back.collect()
    assert(rows.length == 3)
    assert(rows(0).getAs[Array[Byte]]("bin").toSeq == Seq[Byte](1, 2, 3))
    assert((2 to 6).forall(rows(1).isNullAt))
    assert(rows(2).getString(5) == "unicode café ☕ <&>")
    assert(rows(2).getAs[Array[Byte]]("bin").isEmpty)
  }

  test("avro rejects non-flat columns with a actionable error") {
    import spark.implicits._
    val df = Seq((1L, Seq(1.0, 2.0))).toDF("id", "vec")
    val e = intercept[IllegalArgumentException] {
      Avro.write(spark, tmp("avro_bad") + "/t.avro", df)
    }
    assert(e.getMessage.contains("flat primitive columns"))
  }

  test("workbook facade saves and reloads avro sheets") {
    import spark.implicits._
    val dir = tmp("avro_wb")
    val wb = Workbook(spark, Map(
      "nation" -> graft.util.Tables.nation(spark, sfDir)))
    wb.save(dir, format = "avro")
    val back = Workbook.load(spark, dir)
    assert(back.sheetNames == Seq("nation"))
    // avro preserves exact types — schemas must be identical
    assert(back.sheet("nation").schema == wb.sheet("nation").schema)
    val o = wb.sheet("nation").orderBy($"n_nationkey").collect().toSeq
    val b = back.sheet("nation").orderBy($"n_nationkey").collect().toSeq
    assert(o == b)
  }

  test("empty frame roundtrips with its exact schema") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("id", "name")
    val path = tmp("avro_empty") + "/t.avro"
    Avro.write(spark, path, empty)
    val back = Avro.read(spark, path)
    // avro carries the schema in the file header, so unlike xlsx the
    // types survive even with zero rows (columns come back nullable —
    // every field is written as a ["null", T] union by design)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      empty.schema.map(f => (f.name, f.dataType)))
    assert(back.schema.forall(_.nullable))
    assert(back.count() == 0)
  }

  test("distributed read decodes many container files on executors") {
    import spark.implicits._
    val dir = tmp("avro_fleet")
    (0 until 3).foreach { i =>
      val part = spark.range(i * 10, i * 10 + 10)
        .select($"id", concat(lit("n"), $"id").as("name"))
      Avro.write(spark, s"$dir/part$i.avro", part)
    }
    val all = Avro.readDistributed(spark, s"$dir/*.avro")
    assert(all.schema.map(_.name) == Seq("id", "name"))
    assert(all.count() == 30)
    assert(all.agg(sum($"id")).head().getLong(0) == (0 until 30).sum)
  }
}
