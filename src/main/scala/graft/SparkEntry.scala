package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` are assembled from the per-category op files
  * under `graft.ops`; each op file co-locates the Spark plan with its
  * DuckDB oracle SQL so the pair evolves together (SURVEY.md §7.1).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Aggregates.qAggGroup(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Aggregates.queries ++ Relational.queries ++ Joins.queries ++
      Windows.queries ++ Scalars.queries ++ LlmOps.queries ++
      TextOps.queries ++ Multimodal.queries ++ DedupAdvanced.queries ++
      graft.streaming.StreamingOps.queries ++ Crud.queries ++
      Pipeline.queries ++ TrainPrep.queries ++ Layout.queries ++
      GraphOps.queries ++ IncrementalOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Aggregates.oracleSql ++ Relational.oracleSql ++ Joins.oracleSql ++
      Windows.oracleSql ++ Scalars.oracleSql ++ LlmOps.oracleSql ++
      TextOps.oracleSql ++ Multimodal.oracleSql ++ DedupAdvanced.oracleSql ++
      graft.streaming.StreamingOps.oracleSql ++ Crud.oracleSql ++
      Pipeline.oracleSql ++ TrainPrep.oracleSql ++ Layout.oracleSql ++
      GraphOps.oracleSql ++ IncrementalOps.oracleSql
}
