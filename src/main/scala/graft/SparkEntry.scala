package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.EventSeries
import graft.queries.{AnalyticsQueries, MLQueries, RelationalQueries, SeriesQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory (SURVEY §2 + the training-data
  * pipeline extensions); `oracleSql` holds the DuckDB twin for every
  * SQL-expressible entry. Conventions binding the two sides are documented
  * in graft.queries.RelationalQueries.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The fact model: daily bars → LAG staging → enrichment left-join →
    * move categorization (SURVEY §7.3 minimum end-to-end slice). */
  def entry(spark: SparkSession): DataFrame =
    EventSeries.fctPricesWithSentiment(
      Tables.events(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ SeriesQueries.queries ++
      TextQueries.queries ++ AnalyticsQueries.queries ++ MLQueries.queries

  /** For each key in queries, equivalent SQL runnable by DuckDB on the
    * same parquet tables. Omitted for engine-specific scale paths
    * (LSH/simhash) → driver records a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracle ++ SeriesQueries.oracle ++
      TextQueries.oracle ++ AnalyticsQueries.oracle ++ MLQueries.oracle
}
