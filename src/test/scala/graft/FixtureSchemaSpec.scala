package graft

import org.apache.spark.sql.types._

import graft.util.Tables

/** Canary for driver-side fixture regeneration (SURVEY.md §7.5 R2).
  *
  * The driver rewrites `/root/testdata` between rounds and has already
  * drifted shapes once (`events.ts` TIMESTAMP(NANOS) → timestamp[us],
  * which broke 22 of 127 registry queries at ANALYSIS time in round
  * 11, each with an opaque resolution error). This spec pins every
  * schema fact an operator actually relies on, so the next drift fails
  * here FIRST with a message naming the dependent ops and the adaptive
  * pattern to extend (`Tables.normalizeEventsTs`), instead of as a
  * pile of cryptic per-query failures.
  *
  * Assertions run on the POST-loader schema (`Tables.*`), because the
  * loaders are the adaptation point: a new on-disk shape is fine as
  * long as the loader keeps normalizing it to what the ops expect.
  */
class FixtureSchemaSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def dt(df: org.apache.spark.sql.DataFrame, c: String): DataType =
    df.schema(c).dataType

  test("events normalizes to the shape every §2.E/I/J consumer expects") {
    val e = Tables.events(spark, dir)
    assert(dt(e, "ts") == TimestampType,
      "events.ts must normalize to µs TimestampType — windows/as-of " +
        "joins/sessionization/streaming replays all bucket on it; if " +
        "the fixture shape drifted again, extend Tables.normalizeEventsTs")
    assert(dt(e, "props") == StringType,
      "events.props must be a JSON STRING — q_fn_json/q_fn_map parse it " +
        "with get_json_object/from_json and the DuckDB oracle uses " +
        "json_extract; a typed map/struct fixture needs a loader-side " +
        "to_json normalization AND new oracle SQL")
    assert(dt(e, "event_id") == LongType && dt(e, "user_id") == LongType)
    assert(dt(e, "event_type") == StringType)
    assert(dt(e, "value") == DoubleType)
  }

  test("normalizeEventsTs yields identical instants from all three shapes") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // the same three instants spelled as legacy nanos-longs, NTZ, and
    // TimestampType — the shapes the fixture has shipped or could ship.
    // The ns-long branch is DEAD against the current µs fixtures, so
    // only this test keeps it from rotting until the driver flips back.
    val micros = Seq(1704067200000000L, 1704067260123456L, 1704070000999999L)
    val asLong = micros.map(_ * 1000L).toDF("ts") // nanos
    val asTs = micros.toDF("us")
      .select(timestamp_micros($"us").as("ts"))
    val asNtz = asTs.select($"ts".cast(TimestampNTZType).as("ts"))
    def instants(df: org.apache.spark.sql.DataFrame): Seq[Long] = {
      val out = Tables.normalizeEventsTs(df)
      assert(out.schema("ts").dataType == TimestampType)
      out.select(unix_micros($"ts")).as[Long].collect().toSeq.sorted
    }
    assert(instants(asLong) == micros)
    assert(instants(asNtz) == micros)   // value-exact: session TZ is UTC
    assert(instants(asTs) == micros)
    // an unsupported shape fails loudly with the extension pointer
    val err = intercept[IllegalStateException] {
      Tables.normalizeEventsTs(Seq("2024-01-01").toDF("ts"))
    }
    assert(err.getMessage.contains("normalizeEventsTs"))
    // the NTZ cast reinterprets wall-clock fields in the session zone —
    // a non-UTC session must fail loudly, not silently shift instants
    val tzKey = "spark.sql.session.timeZone"
    spark.conf.set(tzKey, "America/New_York")
    try {
      val tzErr = intercept[IllegalArgumentException](instants(asNtz))
      assert(tzErr.getMessage.contains("UTC"))
    } finally spark.conf.set(tzKey, "UTC")
    assert(instants(asNtz) == micros) // restored session still exact
  }

  test("documents carries the text-pipeline columns") {
    val d = Tables.documents(spark, dir)
    assert(dt(d, "doc_id") == LongType)
    assert(dt(d, "text") == StringType,
      "documents.text drives every §2.J dedup/text op")
    assert(dt(d, "lang") == StringType && dt(d, "source") == StringType)
    assert(dt(d, "n_chars") == LongType)
  }

  test("embeddings vector column stays array<float>") {
    val e = Tables.embeddings(spark, dir)
    assert(dt(e, "embedding") == ArrayType(FloatType, containsNull = true) ||
      dt(e, "embedding") == ArrayType(FloatType, containsNull = false),
      "embeddings.embedding must be array<float> — DotProduct/" +
        "SrpFingerprint resolve on ArrayType(FloatType|DoubleType) and " +
        "the similarity family casts from float; a width/type drift " +
        "needs functions/VectorExprs revisited")
    assert(dt(e, "vec_id") == LongType)
  }

  test("relational tables keep the key/measure types the joins rely on") {
    val li = Tables.lineitem(spark, dir)
    assert(dt(li, "l_orderkey") == LongType &&
      dt(li, "l_partkey") == LongType && dt(li, "l_suppkey") == LongType)
    assert(dt(li, "l_quantity") == DoubleType &&
      dt(li, "l_extendedprice") == DoubleType &&
      dt(li, "l_discount") == DoubleType)
    // temporal: any Spark-native temporal type date_truncs fine; what
    // would break queries is a LONG/STRING drift like events.ts had
    assert(Set[DataType](TimestampType, TimestampNTZType, DateType)
        .contains(dt(li, "l_shipdate")),
      "l_shipdate must stay a temporal type (q1-style date filters)")
    val o = Tables.orders(spark, dir)
    assert(dt(o, "o_orderkey") == LongType && dt(o, "o_custkey") == LongType)
    assert(Set[DataType](TimestampType, TimestampNTZType, DateType)
        .contains(dt(o, "o_orderdate")))
    val c = Tables.customer(spark, dir)
    assert(dt(c, "c_custkey") == LongType)
    assert(dt(c, "c_nationkey") == IntegerType,
      "nation keys are int32; join keys cast explicitly where mixed")
    assert(dt(Tables.nation(spark, dir), "n_nationkey") == IntegerType)
    assert(dt(Tables.region(spark, dir), "r_regionkey") == IntegerType)
    // r13 second-wave reliances: the shipping-priority pipeline filters
    // on c_mktsegment and groups by o_orderpriority; the fuzzy matcher
    // blocks on p_name's last word (multi-word names)
    assert(dt(c, "c_mktsegment") == StringType)
    assert(dt(o, "o_orderpriority") == StringType)
    val p = Tables.part(spark, dir)
    assert(dt(p, "p_name") == StringType)
    import org.apache.spark.sql.functions._
    assert(p.filter(size(split(col("p_name"), " ")) < 2).count() == 0,
      "p_name must stay multi-word (fuzzy blocking keys off the last word)")
  }
}
