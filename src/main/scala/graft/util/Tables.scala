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
  /** `events.ts` is parquet TIMESTAMP(NANOS) which Spark 4 refuses to read
    * ([PARQUET_TYPE_ILLEGAL]); read it as a nanos long via the legacy conf
    * and convert to a µs TimestampType. `DIV 1000` (integer division) is
    * required — double division loses precision on ~1.7e18 ns values.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "embeddings")
}
