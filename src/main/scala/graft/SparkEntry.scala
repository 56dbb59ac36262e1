package graft

import graft.queries.{AdvancedQueries, AnnMediaQueries, CoverageQueries, Declared, EventLogQueries, DedupQueries, ExtendedQueries, FormatQueries, PipelineQueries, RelationalQueries, SqlQueries, StatefulStreamingQueries, StreamingQueries, TextQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Full declared-query registry (SURVEY.md §2.3). */
  def registry: Seq[Declared] =
    EventLogQueries.all ++ RelationalQueries.all ++ ExtendedQueries.all ++
      StreamingQueries.all ++ TextQueries.all ++ DedupQueries.all ++ AnnMediaQueries.all ++
      AdvancedQueries.all ++ CoverageQueries.all ++ StatefulStreamingQueries.all ++
      SqlQueries.all ++ PipelineQueries.all ++ FormatQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Q-PAGE is the minimum end-to-end slice (SURVEY §7 Phase 1): scan →
    * envelope-bearing log → range agg → clamp filter → ordered page. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_page")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(d => d.name -> d.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(d => d.oracle.map(sql => d.name -> sql)).toMap
}
