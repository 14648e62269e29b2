package org.apache.spark.sql

/** The one `private[sql]` doorway graft's V1 streaming source needs:
  * a V1 `Source.getBatch` must return a DataFrame whose plan reports
  * `isStreaming = true` (MicroBatchExecution asserts it), and the only
  * sanctioned way to stamp that onto an arbitrarily-computed per-batch
  * plan is `SparkSession.internalCreateDataFrame(rdd, schema,
  * isStreaming = true)` — exactly what Spark's own V1 sources
  * (FileStreamSource, the historical KafkaSource) do. The keyed
  * change-feed source computes a JOIN per micro-batch (net-change
  * reconciliation), which no DSv2 scan can express, so it rides the V1
  * Source API and borrows this stamp; everything else about it is
  * ordinary public-API Spark. Kept to the minimum surface: one method,
  * no state. */
object GraftStreamingShim {

  /** Re-root `df`'s computed RDD as a streaming-tagged LogicalRDD —
    * the plan executes lazily, exactly once, when the batch runs. */
  def asStreamingBatch(df: DataFrame): DataFrame = {
    val cdf = org.apache.spark.sql.classic.ClassicConversions.castToImpl(df)
    cdf.sparkSession.internalCreateDataFrame(
      cdf.queryExecution.toRdd, cdf.schema, isStreaming = true)
  }
}
