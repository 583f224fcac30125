package graft

import graft.queries._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY §2 is registered here as a
  * [[graft.queries.QuerySpec]]: a Spark implementation plus, where
  * SQL-expressible, a DuckDB oracle with matching column aliases.
  */
object SparkEntry {

  /** All registered operator queries, in registration order. */
  def specs: Seq[QuerySpec] =
    CoreQueries.all ++ ReaderQueries.all ++ DedupQueries.all ++
      SimilarityQueries.all ++ TextQueries.all ++ MultimodalQueries.all ++
      EventQueries.all ++ AnalyticsQueries.all ++ RelationalQueries.all ++
      EtlQueries.all ++ RetrievalQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q01PricingSummary.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    specs.map(s => s.name -> s.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    specs.flatMap(s => s.sql.map(s.name -> _)).toMap
}
