package graft

import org.apache.spark.sql.functions._

/** The user-facing facade (SURVEY.md §1.1): load a directory of sheets,
  * CRUD them copy-on-write, introspect, SQL over views, save, reload —
  * the reference's workbook surface end to end on real fixture data. */
class WorkbookSpec extends SparkSpec {

  private def fixtureWb: Workbook = Workbook(spark, Map(
    "customer" -> graft.util.Tables.customer(spark, sfDir),
    "nation" -> graft.util.Tables.nation(spark, sfDir)))

  test("save -> load roundtrips sheets bit-for-bit") {
    val dir = graft.util.Scratch.dir("wb_roundtrip")
    fixtureWb.save(dir)
    val wb = Workbook.load(spark, dir)
    assert(wb.sheetNames == Seq("customer", "nation"))
    val orig = fixtureWb.sheet("customer")
      .orderBy("c_custkey").collect().toSeq
    val loaded = wb.sheet("customer")
      .orderBy("c_custkey").collect().toSeq
    assert(loaded == orig)
  }

  test("introspect lists every sheet with its header") {
    val rows = fixtureWb.introspect.collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("customer", "nation"))
    val nat = rows.find(_.getString(0) == "nation").get
    assert(nat.getLong(1) == 3L)
    assert(nat.getString(2) == "n_nationkey|n_name|n_regionkey")
  }

  test("update recomputes matching cells simultaneously from old values") {
    import spark.implicits._
    val wb = fixtureWb.update("customer",
      $"c_custkey" < 10,
      Map("c_acctbal" -> ($"c_acctbal" + 500.0),
        "c_name" -> concat(lit("bal:"), $"c_acctbal".cast("string"))))
    val before = fixtureWb.sheet("customer")
      .filter($"c_custkey" < 10)
      .select($"c_custkey", $"c_acctbal").as[(Long, Double)]
      .collect().toMap
    val after = wb.sheet("customer").filter($"c_custkey" < 10)
      .select($"c_custkey", $"c_acctbal", $"c_name")
      .collect()
    assert(after.nonEmpty)
    after.foreach { r =>
      val k = r.getLong(0)
      assert(r.getDouble(1) == before(k) + 500.0)
      // the comment assignment saw the PRE-update balance
      assert(r.getString(2) == s"bal:${before(k)}")
    }
    // unmatched rows untouched
    val untouchedBefore = fixtureWb.sheet("customer")
      .filter($"c_custkey" >= 10).orderBy("c_custkey").collect().toSeq
    val untouchedAfter = wb.sheet("customer")
      .filter($"c_custkey" >= 10).orderBy("c_custkey").collect().toSeq
    assert(untouchedAfter == untouchedBefore)
  }

  test("update rejects unknown target columns") {
    import spark.implicits._
    val e = intercept[IllegalArgumentException] {
      fixtureWb.update("customer", lit(true), Map("no_such" -> lit(1)))
    }
    assert(e.getMessage.contains("no_such"))
  }

  test("remove deletes exactly the matching rows") {
    import spark.implicits._
    val n0 = fixtureWb.sheet("customer").count()
    val nDel = fixtureWb.sheet("customer")
      .filter($"c_mktsegment" === "BUILDING").count()
    assert(nDel > 0)
    val wb = fixtureWb.remove("customer", $"c_mktsegment" === "BUILDING")
    assert(wb.sheet("customer").count() == n0 - nDel)
    assert(wb.sheet("customer")
      .filter($"c_mktsegment" === "BUILDING").count() == 0)
  }

  test("insert appends rows matched by name regardless of column order") {
    import spark.implicits._
    val extra = Seq((900001L, "ZED", 9L))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .select("n_name", "n_regionkey", "n_nationkey")
    val wb = fixtureWb.insert("nation", extra)
    assert(wb.sheet("nation").count() ==
      fixtureWb.sheet("nation").count() + 1)
    val r = wb.sheet("nation").filter($"n_nationkey" === 900001L).head()
    assert(r.getAs[String]("n_name") == "ZED" &&
      r.getAs[Long]("n_regionkey") == 9L)
  }

  test("upsert: updates win on key collision, new keys append") {
    import spark.implicits._
    val base = fixtureWb.sheet("nation")
    val ups = base.filter($"n_nationkey" < 3)
      .withColumn("n_name", lit("UPDATED"))
      .unionByName(Seq((800001L, "NEWLAND", 0L))
        .toDF("n_nationkey", "n_name", "n_regionkey"))
    val wb = fixtureWb.upsert("nation", ups, Seq("n_nationkey"))
    val out = wb.sheet("nation")
    assert(out.count() == base.count() + 1)
    assert(out.filter($"n_nationkey" < 3 && $"n_name" === "UPDATED")
      .count() == 3)
    assert(out.filter($"n_nationkey" === 800001L).count() == 1)
    // columns unchanged by the merge machinery (no __is_update leak)
    assert(out.columns.toSeq == base.columns.toSeq)
  }

  test("merge applies D/U/I clauses and passes untouched rows through") {
    import spark.implicits._
    val base = fixtureWb.sheet("nation")
    val feed = base.filter($"n_nationkey" < 3)
      .withColumn("op", lit("D"))
      .unionByName(base.filter($"n_nationkey" >= 3 && $"n_nationkey" < 6)
        .withColumn("n_name", lit("MERGED")).withColumn("op", lit("U")))
      .unionByName(Seq((900001L, "INSERTLAND", 0L, "I"))
        .toDF("n_nationkey", "n_name", "n_regionkey", "op"))
      .unionByName(Seq((900002L, "IGNORED", 0L, "U"))
        .toDF("n_nationkey", "n_name", "n_regionkey", "op")) // unmatched U
    val out = fixtureWb.merge("nation", feed, Seq("n_nationkey"))
      .sheet("nation")
    assert(out.filter($"n_nationkey" < 3).count() == 0) // deleted
    assert(out.filter($"n_nationkey" >= 3 && $"n_nationkey" < 6 &&
      $"n_name" =!= "MERGED").count() == 0) // updated
    assert(out.filter($"n_nationkey" === 900001L).count() == 1) // inserted
    assert(out.filter($"n_nationkey" === 900002L).count() == 0) // no-op
    assert(out.count() == base.count() - 3 + 1)
    // untouched rows identical, schema unchanged (no op/rename leak)
    assert(out.columns.toSeq == base.columns.toSeq)
    val untouchedIn = base.filter($"n_nationkey" >= 6).collect().toSet
    val untouchedOut = out.filter($"n_nationkey" >= 6 &&
      $"n_nationkey" < 900000L).collect().toSet
    assert(untouchedIn == untouchedOut)
  }

  test("merge rejects a feed missing base columns") {
    import spark.implicits._
    val feed = Seq((1L, "X")).toDF("n_nationkey", "op")
    val e = intercept[IllegalArgumentException] {
      fixtureWb.merge("nation", feed, Seq("n_nationkey"))
    }
    assert(e.getMessage.contains("n_name"))
  }

  test("sql queries sheets through on-the-fly views") {
    val n = fixtureWb
      .sql("SELECT count(*) AS n FROM nation WHERE n_regionkey = 0")
      .head().getLong(0)
    import spark.implicits._
    val direct = fixtureWb.sheet("nation")
      .filter($"n_regionkey" === 0).count()
    assert(n == direct && n > 0)
  }

  test("full verb-chain pipeline survives a save/reload cycle") {
    import spark.implicits._
    val d1 = graft.util.Scratch.dir("wb_chain_a")
    val d2 = graft.util.Scratch.dir("wb_chain_b")
    fixtureWb.save(d1)
    val wb = Workbook.load(spark, d1)
      .update("customer", $"c_custkey" === 1L,
        Map("c_acctbal" -> lit(1234.5)))
      .remove("customer", $"c_custkey" === 2L)
      .insert("nation", Seq((700001L, "XANADU", 1L))
        .toDF("n_nationkey", "n_name", "n_regionkey"))
    wb.save(d2, partitionCols = Map("customer" -> Seq("c_mktsegment")))
    val back = Workbook.load(spark, d2)
    assert(back.sheet("customer").filter($"c_custkey" === 1L)
      .head().getAs[Double]("c_acctbal") == 1234.5)
    assert(back.sheet("customer").filter($"c_custkey" === 2L).count() == 0)
    assert(back.sheet("nation").filter($"n_nationkey" === 700001L)
      .count() == 1)
    // the partitioned sheet reloads with the same row set (column order
    // differs — partition column moves last — so compare by-name maps)
    val want = wb.sheet("customer").collect()
      .map(r => r.getAs[Long]("c_custkey") -> r.getValuesMap[Any](r.schema.fieldNames))
      .toMap
    val got = back.sheet("customer").collect()
      .map(r => r.getAs[Long]("c_custkey") -> r.getValuesMap[Any](r.schema.fieldNames))
      .toMap
    assert(got == want)
  }

  test("csv sheets load with header + inferred schema and mix with parquet") {
    import spark.implicits._
    val dir = graft.util.Scratch.dir("wb_csv")
    // nation as csv, customer as parquet — one workbook, two formats
    Workbook(spark, Map("nation" -> fixtureWb.sheet("nation")))
      .save(dir, format = "csv")
    Workbook(spark, Map("customer" -> fixtureWb.sheet("customer")))
      .save(dir)
    val wb = Workbook.load(spark, dir)
    assert(wb.sheetNames == Seq("customer", "nation"))
    val nat = wb.sheet("nation")
    assert(nat.columns.toSeq == Seq("n_nationkey", "n_name", "n_regionkey"))
    assert(nat.count() == fixtureWb.sheet("nation").count())
    // inferred schema is numeric (not all-strings), so predicates work
    assert(nat.schema("n_nationkey").dataType.typeName != "string")
    val want = fixtureWb.sheet("nation")
      .select($"n_nationkey".cast("long"), $"n_name").orderBy("n_nationkey")
      .collect().toSeq
    val got = nat
      .select($"n_nationkey".cast("long"), $"n_name").orderBy("n_nationkey")
      .collect().toSeq
    assert(got == want)
  }

  test("column verbs: add computes, rename preserves data, drop removes") {
    import spark.implicits._
    val wb = fixtureWb
      .addColumn("customer", "bal_tier",
        when($"c_acctbal" >= 0, "pos").otherwise("neg"))
      .renameColumn("nation", "n_name", "nation_name")
      .dropColumn("customer", "c_mktsegment")
    val cust = wb.sheet("customer")
    assert(cust.columns.contains("bal_tier") &&
      !cust.columns.contains("c_mktsegment"))
    assert(cust.filter($"bal_tier" === "pos").count() ==
      fixtureWb.sheet("customer").filter($"c_acctbal" >= 0).count())
    val nat = wb.sheet("nation")
    assert(nat.columns.toSeq ==
      Seq("n_nationkey", "nation_name", "n_regionkey"))
    assert(nat.select("nation_name").orderBy("nation_name").collect().toSeq ==
      fixtureWb.sheet("nation").select("n_name").orderBy("n_name").collect().toSeq)
    // all three fail fast on bad column names
    intercept[IllegalArgumentException] {
      wb.addColumn("customer", "bal_tier", lit(1))
    }
    intercept[IllegalArgumentException] {
      wb.renameColumn("nation", "ghost", "x")
    }
    intercept[IllegalArgumentException] {
      wb.dropColumn("customer", "ghost")
    }
  }

  test("unknown sheet access fails fast with the available names") {
    val e = intercept[NoSuchElementException] { fixtureWb.sheet("ghost") }
    assert(e.getMessage.contains("customer"))
  }

  test("sql works when a sheet name is not a SQL identifier") {
    import org.apache.spark.sql.functions.lit
    val wb = Workbook(spark, Map(
      "sales-2024" -> graft.util.Tables.region(spark, sfDir),
      "nation" -> graft.util.Tables.nation(spark, sfDir)))
    // the oddly-named sheet must not break a query that ignores it...
    assert(wb.sql("SELECT count(*) AS n FROM nation").head().getLong(0) ==
      graft.util.Tables.nation(spark, sfDir).count())
    // ...and is itself queryable under its sanitized view name
    val views = wb.createViews()
    assert(views.contains("sales_2024"), views.mkString(", "))
    assert(wb.sql("SELECT count(*) AS n FROM sales_2024").head().getLong(0) ==
      graft.util.Tables.region(spark, sfDir).count())
  }

  test("xlsx save demotes date/timestamp columns to ISO strings (pinned contract)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq("2024-01-15", "2024-12-31").toDF("ds")
      .select($"ds", to_date($"ds").as("d"),
        to_timestamp(concat($"ds", lit(" 10:30:00"))).as("ts"))
    val dir = graft.util.Scratch.dir("wb_dates")
    Workbook(spark, Map("t" -> df)).save(dir, format = "xlsx")
    val back = Workbook.load(spark, dir).sheet("t").orderBy($"ds")
    // xlsx has no typed date cell we emit — the documented contract is
    // ISO strings in, strings back (format upstream to control them)
    assert(back.schema("d").dataType.typeName == "string")
    assert(back.schema("ts").dataType.typeName == "string")
    val r = back.collect()
    assert(r(0).getString(1) == "2024-01-15", r(0).toString)
    assert(r(0).getString(2).startsWith("2024-01-15 10:30:00"), r(0).toString)
  }

  test("sql fails fast when sanitized view names collide") {
    val wb = Workbook(spark, Map(
      "sales-2024" -> graft.util.Tables.region(spark, sfDir),
      "sales 2024" -> graft.util.Tables.nation(spark, sfDir)))
    val e = intercept[IllegalArgumentException] {
      wb.sql("SELECT 1 AS one")
    }
    assert(e.getMessage.contains("sales_2024"), e.getMessage)
    assert(e.getMessage.contains("sales-2024") &&
      e.getMessage.contains("sales 2024"), e.getMessage)
  }

  test("save rejects partitionCols for interchange formats") {
    val wb = Workbook(spark, Map(
      "nation" -> graft.util.Tables.nation(spark, sfDir)))
    val e = intercept[IllegalArgumentException] {
      wb.save(graft.util.Scratch.dir("wb_badpart"),
        partitionCols = Map("nation" -> Seq("n_regionkey")),
        format = "avro")
    }
    assert(e.getMessage.contains("partitionCols"))
  }

  test("load precedence on a name collision: parquet > csv > xlsx > avro") {
    import org.apache.spark.sql.functions.lit
    val dir = graft.util.Scratch.dir("wb_prec")
    def tagged(tag: String) = graft.util.Tables.region(spark, sfDir)
      .select(lit(tag).as("src"))
    tagged("parquet").write.mode("overwrite").parquet(s"$dir/t.parquet")
    tagged("csv").write.mode("overwrite")
      .option("header", "true").csv(s"$dir/t.csv")
    graft.sources.Xlsx.write(spark, s"$dir/wb.xlsx",
      Seq("t" -> tagged("xlsx"), "only_xlsx" -> tagged("xlsx")))
    graft.sources.Avro.write(spark, s"$dir/t.avro", tagged("avro"))
    val wb = Workbook.load(spark, dir)
    assert(wb.sheet("t").head().getString(0) == "parquet",
      "primary format must win the collision")
    assert(wb.sheet("only_xlsx").head().getString(0) == "xlsx",
      "non-colliding sheets from lower-precedence formats must load")
  }

  test("load fails fast when two xlsx workbooks collide on a sheet name") {
    val dir = graft.util.Scratch.dir("wb_dupxlsx")
    val n = graft.util.Tables.nation(spark, sfDir)
    graft.sources.Xlsx.write(spark, s"$dir/a.xlsx", Seq("data" -> n))
    graft.sources.Xlsx.write(spark, s"$dir/b.xlsx", Seq("data" -> n))
    val e = intercept[IllegalArgumentException] { Workbook.load(spark, dir) }
    assert(e.getMessage.contains("multiple .xlsx workbooks") &&
      e.getMessage.contains("a.xlsx") && e.getMessage.contains("b.xlsx"))
  }

  test("interchange sheets parse lazily and memoize across the lineage") {
    import spark.implicits._
    val dir = graft.util.Scratch.dir("wb_lazy")
    graft.sources.Avro.write(spark, s"$dir/nation.avro",
      graft.util.Tables.nation(spark, sfDir))
    // a corrupt sibling: with EAGER loading this load would throw; the
    // lazy contract is load-succeeds, corrupt-sheet-fails-on-ACCESS
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "bad.avro"),
      Array[Byte](1, 2, 3, 4))
    val wb = Workbook.load(spark, dir)
    assert(wb.sheetNames == Seq("bad", "nation"))
    val n = wb.sheet("nation").count()
    assert(n > 0)
    intercept[Exception] { wb.sheet("bad").count() }
    // memoized + shared across derived workbooks: delete the backing
    // file after the first force — a re-parse anywhere in the lineage
    // would now fail, so surviving proves the single-parse contract
    java.nio.file.Files.delete(java.nio.file.Paths.get(dir, "nation.avro"))
    val wb2 = wb.dropSheet("bad")
      .addColumn("nation", "tag", lit("x"))
    assert(wb2.sheet("nation").count() == n)
  }

  test("xlsx save shards multi-partition sheets to a workbook fleet") {
    import spark.implicits._
    val dir = graft.util.Scratch.dir("wb_xlsx_fleet")
    val big = spark.range(0, 400, 1, 4)
      .select($"id", concat(lit("n"), $"id").as("name"))
    val small = Seq((1L, "x"), (2L, "y")).toDF("k", "s").coalesce(1)
    Workbook(spark, Map("big" -> big, "small" -> small))
      .save(dir, format = "xlsx")
    // multi-partition sheet → fleet DIRECTORY of part workbooks
    // (executor-written, _SUCCESS-committed); single-partition sheets
    // stay in the one interchange workbook file
    assert(new java.io.File(s"$dir/big.xlsx").isDirectory)
    assert(new java.io.File(s"$dir/big.xlsx/_SUCCESS").isFile)
    assert(new java.io.File(s"$dir/workbook.xlsx").isFile)
    val back = Workbook.load(spark, dir)
    assert(back.sheetNames == Seq("big", "small"))
    assert(back.sheet("big").count() == 400)
    assert(back.sheet("big").agg(sum($"id")).head().getLong(0) ==
      (0L until 400L).sum)
    assert(back.sheet("small").orderBy($"k").collect().map(_.getString(1))
      .toSeq == Seq("x", "y"))
  }

  test("save handles join/aggregate-shaped sheets in every format") {
    // Regression: staticNumPartitions used to .execute() the
    // UNPREPARED sparkPlan — a broadcast-join sheet threw (build side
    // not yet a BroadcastExchange) and an SMJ sheet threw on zipping
    // children with unequal partition counts. The probe is now
    // structural: join/agg shapes route to the distributed writer
    // without touching execute().
    import spark.implicits._
    val cust = graft.util.Tables.customer(spark, sfDir)
    val nat = graft.util.Tables.nation(spark, sfDir)
    val bcastJoin = cust.join(broadcast(nat),
        $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"n_name")
    val smj = cust.repartition(4, $"c_nationkey")
      .join(nat.repartition(2, $"n_nationkey")
          .withColumnRenamed("n_nationkey", "k"),
        $"c_nationkey" === $"k")
      .groupBy($"n_name").agg(count("*").as("cnt"))
    for (fmt <- Seq("xlsx", "avro", "parquet", "csv")) {
      val dir = graft.util.Scratch.dir(s"wb_joinsave_$fmt")
      Workbook(spark, Map("bc" -> bcastJoin, "sm" -> smj))
        .save(dir, format = fmt)
      val back = Workbook.load(spark, dir)
      assert(back.sheet("bc").count() == cust.count(), fmt)
      assert(back.sheet("sm").count() == nat.count(), fmt)
    }
  }
}
