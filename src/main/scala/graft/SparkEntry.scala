package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one entry per implemented operator from SURVEY.md §2;
  * `oracleSql` holds the DuckDB-equivalent SQL for the driver's correctness
  * gate. Column names and types are kept identical on both sides (the driver
  * sorts columns by name before hashing values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The star-join rollup — the engine's full dimension-chain path. */
  def entry(spark: SparkSession): DataFrame =
    queries("q13_star_join")(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ExtractQueries.defs ++ JoinAggQueries.defs ++ LlmQueries.defs ++
      RasterQueries.defs ++ StreamQueries.defs ++ MiscQueries.defs ++
      CurationQueries.defs ++ TrainQueries.defs ++ AnalyticsQueries.defs ++
      SelectionQueries.defs ++ ScaleQueries.defs ++ RetrievalQueries.defs ++
      StatQueries.defs ++ ProfilingQueries.defs ++ LakehouseQueries.defs ++
      EntityQueries.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ExtractQueries.oracle ++ JoinAggQueries.oracle ++ LlmQueries.oracle ++
      RasterQueries.oracle ++ StreamQueries.oracle ++ MiscQueries.oracle ++
      CurationQueries.oracle ++ TrainQueries.oracle ++ AnalyticsQueries.oracle ++
      SelectionQueries.oracle ++ ScaleQueries.oracle ++ RetrievalQueries.oracle ++
      StatQueries.oracle ++ ProfilingQueries.oracle ++ LakehouseQueries.oracle ++
      EntityQueries.oracle
}
