package graft

import org.apache.spark.sql.functions._

/** §2.H functions deliberately excluded from the DuckDB oracle
  * (engine-divergent or absent there): soundex, banker's rounding,
  * fractional months_between. Pinned here so the surface stays covered. */
class ScalarEdgeSpec extends SparkSpec {

  test("chunk_spans generator matches explode+slice on edge shapes") {
    import spark.implicits._
    graft.functions.VectorExprs.register(spark)
    // consecutive spaces (empty tokens), multi-byte UTF-8 (é, 😀),
    // single token, and empty text — the split-on-" " contract
    val docs = Seq((1L, "a  b c"), (2L, "héllo 😀 wörld x y"),
      (3L, "one"), (4L, "")).toDF("doc_id", "text")
    def composed = docs
      .select($"doc_id", split($"text", " ").as("w"))
      .withColumn("n", size($"w"))
      .select($"doc_id", $"w", $"n",
        explode(sequence(lit(0), $"n" - 1, lit(2))).as("start"))
      .select($"doc_id",
        expr("start div 2").cast("long").as("chunk_id"),
        $"start".cast("long").as("start_tok"),
        size(slice($"w", $"start" + 1, lit(3))).cast("long").as("n_tok"),
        array_join(slice($"w", $"start" + 1, lit(3)), " ").as("chunk"))
    val gen = docs.select($"doc_id", expr("chunk_spans(text, 3, 2)"))
    assert(gen.columns.toSeq ==
      Seq("doc_id", "chunk_id", "start_tok", "n_tok", "chunk"))
    val l = gen.orderBy($"doc_id", $"chunk_id").collect().map(_.toSeq)
    val r = composed.orderBy($"doc_id", $"chunk_id").collect().map(_.toSeq)
    assert(l.toSeq == r.toSeq)
    // SQL registration via GraftExtensions
    docs.createOrReplaceTempView("cs_docs")
    assert(spark.sql(
      "SELECT chunk_spans(text, 3, 2) FROM cs_docs WHERE doc_id = 2")
      .count() == 3)
  }

  test("soundex") {
    import spark.implicits._
    val r = Seq("Robert", "Rupert", "Ashcraft").toDF("s")
      .select(soundex($"s")).collect().map(_.getString(0))
    assert(r.toSeq == Seq("R163", "R163", "A261"))
  }

  test("bround is banker's rounding (round-half-even)") {
    import spark.implicits._
    val r = Seq(2.5, 3.5, -2.5).toDF("x")
      .select(bround($"x")).collect().map(_.getDouble(0))
    assert(r.toSeq == Seq(2.0, 4.0, -2.0)) // vs round(): 3, 4, -3
  }

  test("months_between is fractional on partial months") {
    import spark.implicits._
    val r = Seq(1).toDF("i").select(
      months_between(lit("2020-03-15").cast("timestamp"),
        lit("2020-01-15").cast("timestamp")).as("full"),
      round(months_between(lit("2020-03-31").cast("timestamp"),
        lit("2020-02-01").cast("timestamp")), 4).as("frac"))
      .head()
    assert(r.getAs[Double]("full") == 2.0)
    assert(r.getAs[Double]("frac") == 1.9677) // 30/31 of a month, 31-day basis
  }

  test("map_concat / map_from_entries (no DuckDB equivalents)") {
    import spark.implicits._
    val r = Seq(1).toDF("i").select(
      map_concat(map(lit("a"), lit(1)), map(lit("b"), lit(2))).as("m"),
      map_from_entries(array(struct(lit("k1"), lit(10)),
        struct(lit("k2"), lit(20)))).as("me"))
      .head()
    assert(r.getAs[Map[String, Int]]("m") == Map("a" -> 1, "b" -> 2))
    assert(r.getAs[Map[String, Int]]("me") == Map("k1" -> 10, "k2" -> 20))
  }

  test("json_tuple and schema_of_json") {
    import spark.implicits._
    val jt = Seq("""{"k": 7, "t": "x"}""").toDF("js")
      .select(json_tuple($"js", "k", "t")).head()
    assert(jt.getString(0) == "7" && jt.getString(1) == "x")
    val sch = Seq(1).toDF("i")
      .select(schema_of_json(lit("""{"k": 7}"""))).head().getString(0)
    assert(sch.contains("k") && sch.toUpperCase.contains("BIGINT"), sch)
  }

  test("date_sub / add_months / next_day family") {
    import spark.implicits._
    val r = Seq(1).toDF("i").select(
      date_format(date_sub(lit("2020-03-15").cast("date"), 20), "yyyy-MM-dd").as("sub"),
      date_format(add_months(lit("2020-01-31").cast("date"), 1), "yyyy-MM-dd").as("am"),
      date_format(next_day(lit("2020-03-15").cast("date"), "Mon"), "yyyy-MM-dd").as("nd"))
      .head()
    assert(r.getAs[String]("sub") == "2020-02-24")
    assert(r.getAs[String]("am") == "2020-02-29")
    assert(r.getAs[String]("nd") == "2020-03-16")
  }
}
