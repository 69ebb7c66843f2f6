package graft

import graft.queries.{CoreQueries, ExtQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + §2.11.
  *
  * `queries` is the full declared-operator catalog (SURVEY §2.11 plus the
  * training-data-pipeline extensions); `oracleSql` holds the DuckDB twin of
  * every SQL-expressible query, aliased column-for-column.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H-Q1-shaped grouped aggregation — the A1/A2 centroid/count analogue
    * (SURVEY §7.2 M0).
    */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.queries("q_group_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ ExtQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    CoreQueries.sql ++ ExtQueries.sql
}
