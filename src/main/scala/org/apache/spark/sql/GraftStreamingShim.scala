package org.apache.spark.sql

/** The one `private[sql]` doorway graft's V1 streaming surfaces need:
  * `SparkSession.internalCreateDataFrame(rdd, schema, isStreaming)` —
  * the documented stamp Spark's own V1 machinery applies in BOTH
  * directions:
  *
  *  - a V1 `Source.getBatch` must return a DataFrame whose plan
  *    reports `isStreaming = true` (MicroBatchExecution asserts it) —
  *    what FileStreamSource and the historical KafkaSource do. The
  *    keyed change-feed source computes a JOIN per micro-batch
  *    (net-change reconciliation no DSv2 scan can express), so it
  *    rides the V1 Source API and borrows this stamp;
  *  - a V1 `Sink.addBatch` that runs BATCH commands over its input (a
  *    MERGE, a join) must first re-root the streaming-tagged plan as
  *    a batch one, or the command's UnsupportedOperationChecker
  *    rejects it — exactly ForeachBatchSink's mechanism. The
  *    CDC-apply upsert sink borrows the inverse stamp.
  *
  * Everything else about both surfaces is ordinary public-API Spark.
  * Kept to the minimum: two methods (one per direction), no state. */
object GraftStreamingShim {

  /** Re-root `df`'s computed RDD as a streaming-tagged LogicalRDD —
    * the plan executes lazily, exactly once, when the batch runs. */
  def asStreamingBatch(df: DataFrame): DataFrame = {
    val cdf = org.apache.spark.sql.classic.ClassicConversions.castToImpl(df)
    cdf.sparkSession.internalCreateDataFrame(
      cdf.queryExecution.toRdd, cdf.schema, isStreaming = true)
  }

  /** The inverse: re-root a streaming micro-batch DataFrame as a
    * BATCH plan (ForeachBatchSink's stamp), so batch-only commands —
    * the CDC-apply sink's MERGE — accept it. Lazy exactly like the
    * forward direction. */
  def asBatch(df: DataFrame): DataFrame = {
    val cdf = org.apache.spark.sql.classic.ClassicConversions.castToImpl(df)
    cdf.sparkSession.internalCreateDataFrame(
      cdf.queryExecution.toRdd, cdf.schema, isStreaming = false)
  }
}
