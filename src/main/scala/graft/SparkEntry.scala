package graft

import graft.queries.{CoreQueries, CurationQueries, ExtQueries, SurfaceQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + §2.11.
  *
  * `queries` is the full declared-operator catalog (SURVEY §2.11 plus the
  * training-data-pipeline extensions); `oracleSql` holds the DuckDB twin of
  * every SQL-expressible query, aliased column-for-column.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The composed 6-way local-supplier revenue rollup (TPC-H Q5 shape) —
    * joins, colocation condition, broadcast dims, decimal-exact aggregate
    * in one plan (10 rows at sf0.001, verified).
    */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.queries("q_flagship_nation_rev")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ ExtQueries.queries ++ SurfaceQueries.queries ++
      CurationQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    CoreQueries.sql ++ ExtQueries.sql ++ SurfaceQueries.sql ++
      CurationQueries.sql
}
