package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Source/sink coverage (SURVEY.md §2.A): CSV with header+inference
  * (the reference's spreadsheet-load path), JSON lines, partitioned
  * parquet writes. Excel itself is unbuildable offline (no POI jar) —
  * CSV is the stand-in for the spreadsheet format. */
class SourcesSpec extends SparkSpec {

  test("csv roundtrip: header + inferSchema reproduces the table") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("csv_rt").toString
    val nation = graft.util.Tables.nation(spark, sfDir)
    nation.write.mode("overwrite").option("header", "true").csv(s"$tmp/nation")
    val back = spark.read
      .option("header", "true").option("inferSchema", "true")
      .csv(s"$tmp/nation")
    assert(back.schema.fieldNames.toSeq == nation.schema.fieldNames.toSeq)
    assert(back.count() == nation.count())
    val a = nation.orderBy($"n_nationkey").collect().map(_.toSeq)
    val b = back.orderBy($"n_nationkey").collect().map(_.toSeq)
    assert(a.zip(b).forall { case (x, y) =>
      x.zip(y).forall { case (u, v) => u.toString == v.toString } })
  }

  test("csv options: delimiter, quote, nullValue honored") {
    val tmp = Files.createTempDirectory("csv_opt").toString
    Files.writeString(java.nio.file.Paths.get(s"$tmp/t.csv"),
      "a|b|c\n1|\"x|y\"|NULLY\n2|z|w\n")
    val df = spark.read.option("header", "true").option("delimiter", "|")
      .option("quote", "\"").option("nullValue", "NULLY")
      .option("inferSchema", "true").csv(s"$tmp/t.csv")
    val rows = df.orderBy(col("a")).collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("b") == "x|y")
    assert(rows(0).isNullAt(2))
  }

  test("json lines scan infers schema") {
    val tmp = Files.createTempDirectory("jsonl").toString
    Files.writeString(java.nio.file.Paths.get(s"$tmp/e.json"),
      """{"id": 1, "tags": ["a","b"], "m": {"k": 2}}""" + "\n" +
        """{"id": 2, "tags": [], "m": {"k": 5}}""" + "\n")
    val df = spark.read.json(s"$tmp/e.json")
    assert(df.count() == 2)
    assert(df.select(col("m.k")).collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 5L))
  }

  test("orc roundtrip preserves schema and values") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("orc_rt").toString
    val nation = graft.util.Tables.nation(spark, sfDir)
    nation.write.mode("overwrite").orc(s"$tmp/nation")
    val back = spark.read.orc(s"$tmp/nation")
    assert(back.schema == nation.schema)
    assert(back.orderBy($"n_nationkey").collect().map(_.toSeq).toSeq ==
      nation.orderBy($"n_nationkey").collect().map(_.toSeq).toSeq)
  }

  test("partitioned parquet write prunes partitions on read") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("part_w").toString
    graft.util.Tables.lineitem(spark, sfDir)
      .write.mode("overwrite").partitionBy("l_returnflag").parquet(s"$tmp/li")
    // partition dirs exist
    val dirs = new java.io.File(s"$tmp/li").listFiles().map(_.getName).filter(_.startsWith("l_returnflag="))
    assert(dirs.length >= 2, dirs.mkString(","))
    // partition filter prunes: only one partition's files are read
    val scan = spark.read.parquet(s"$tmp/li").filter($"l_returnflag" === "A")
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(l_returnflag"), plan)
    val expected = graft.util.Tables.lineitem(spark, sfDir)
      .filter($"l_returnflag" === "A").count()
    assert(scan.count() == expected)
  }

  test("sortWithinPartitions keeps partition-local order") {
    import spark.implicits._
    val df = graft.util.Tables.orders(spark, sfDir)
      .repartition(4, $"o_custkey")
      .sortWithinPartitions($"o_custkey", $"o_orderkey")
    val ok = df.mapPartitions { it =>
      val keys = it.map(r => (r.getAs[Long]("o_custkey"), r.getAs[Long]("o_orderkey"))).toSeq
      Iterator(keys == keys.sorted)
    }.collect()
    assert(ok.forall(identity))
  }
}
