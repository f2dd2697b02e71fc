package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query (SURVEY.md §7.2) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("mapindex_group")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    MapIndexQueries.queries ++ RelationalQueries.queries ++
      PipelineQueries.queries ++ SimilarityQueries.queries ++
      MultimodalQueries.queries ++ LayoutQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    MapIndexQueries.oracle ++ RelationalQueries.oracle ++
      PipelineQueries.oracle ++ SimilarityQueries.oracle ++
      MultimodalQueries.oracle ++ LayoutQueries.oracle
}
