package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{AnalyticsOps, CorpusOps, FormatOps, GovernanceOps, LlmOps, Multimodal, PipelineQueries, ProfileOps, RelationalQueries, ScaleOps, TrainingOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps each declared operator from SURVEY.md §2 to a runnable
  * DataFrame program over one scale-factor directory; `oracleSql` holds the
  * DuckDB-equivalent SQL the driver hash-compares against (omitted only for
  * ops DuckDB can't express — those get a rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q1Pricing(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ PipelineQueries.queries ++ LlmOps.queries ++
      Multimodal.queries ++ FormatOps.queries ++ ScaleOps.queries ++
      TrainingOps.queries ++ AnalyticsOps.queries ++ GovernanceOps.queries ++
      CorpusOps.queries ++ ProfileOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracle ++ PipelineQueries.oracle ++ LlmOps.oracle ++
      Multimodal.oracle ++ FormatOps.oracle ++ ScaleOps.oracle ++
      TrainingOps.oracle ++ AnalyticsOps.oracleSql ++ GovernanceOps.oracleSql ++
      CorpusOps.oracle ++ ProfileOps.oracle
}
