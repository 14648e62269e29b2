package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet loaders for the fixture tables (TESTDATA.md / FIXTURES.md).
  *
  * Scale note: each table is a single parquet file at test scale; at 100 TB
  * each would be a partitioned directory — `spark.read.parquet` handles both
  * transparently, and all downstream ops rely only on schema, never on
  * single-file-ness. Vectorized parquet scan + predicate pushdown + column
  * pruning come for free via FileSourceScanExec.
  */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "region")
  /** Normalize `events.ts` to a µs `TimestampType` regardless of the
    * fixture's on-disk shape — the driver has regenerated the table across
    * rounds (TIMESTAMP(NANOS) through r10, timestamp[us]/TIMESTAMP_NTZ since
    * r11), so dispatch on the *read* schema rather than hard-coding one:
    *   - `LongType`: legacy-nanos read (`nanosAsLong=true`); convert with
    *     `timestamp_micros(ts DIV 1000)` — integer division is required,
    *     double division loses precision on ~1.7e18 ns values.
    *   - `TimestampNTZType`: cast to `TimestampType`. The session timezone
    *     is pinned UTC, so the cast is value-exact.
    *   - `TimestampType`: already the shape every op and oracle expects.
    * Shared by the batch loader and StreamingOps.eventsStream so the two
    * paths cannot drift.
    */
  def normalizeEventsTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case TimestampNTZType =>
        // NTZ carries no instant; the cast reinterprets the wall-clock
        // fields in the SESSION zone. Value-exact only under UTC — fail
        // loudly rather than silently shift every instant.
        val tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
        require(tz == "UTC",
          s"events.ts is TIMESTAMP_NTZ and its cast to TimestampType is " +
            s"value-exact only under UTC, but spark.sql.session.timeZone " +
            s"is '$tz' — build the session via GraftSession.defaults")
        df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => df
      case other => throw new IllegalStateException(
        s"events.ts has unsupported parquet-read type $other; extend Tables.normalizeEventsTs")
    }
  }

  /** `events.ts` fixture shape has drifted between rounds;
    * [[normalizeEventsTs]] dispatches on whatever schema comes back.
    * PURE: reading ns-typed fixtures needs `nanosAsLong=true` pinned at
    * session BUILD ([[GraftSession.defaults]]) — this loader no longer
    * flips session conf as a side-effect; it only upgrades the error
    * when the flag is missing.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw =
      try t(spark, dir, "events")
      catch {
        case e: Throwable
            if String.valueOf(e.getMessage).contains("NANOS") ||
              String.valueOf(e.getMessage).contains("nanosAsLong") =>
          throw new IllegalStateException(
            "events.parquet is TIMESTAMP(NANOS) and " +
              "spark.sql.legacy.parquet.nanosAsLong is not set — build " +
              "the session via GraftSession.defaults", e)
      }
    normalizeEventsTs(raw)
  }
  def documents(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "embeddings")
}
