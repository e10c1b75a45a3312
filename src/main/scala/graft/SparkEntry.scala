package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{AnalyticsQueries, CoreQueries, CorpusQueries, CurationQueries, GraftQuery, LayoutQueries, PipelineQueries, RelationalQueries, TpchQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * NOTE: sessions running these queries need
  * `spark.sql.legacy.parquet.nanosAsLong=true` (events.parquet stores
  * TIMESTAMP(NANOS) which Spark otherwise refuses); Verify/Bench set it.
  */
object SparkEntry {

  /** Everything the engine declares, with docs + oracles. */
  def registry: Seq[GraftQuery] =
    CoreQueries.all ++ PipelineQueries.all ++ RelationalQueries.all ++
      CurationQueries.all ++ AnalyticsQueries.all ++ TpchQueries.all ++
      LayoutQueries.all ++ CorpusQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Full CDC normalize: replay the change log, latest-version dedup,
    * drop deleted keys — the engine's raison d'être. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.normalizeFinal.run(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
