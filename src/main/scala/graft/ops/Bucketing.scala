package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table utilities: pre-shuffle once at write time so repeated
  * joins/aggregations on the bucket key run with NO exchange (SURVEY §7.1 /
  * the 100 TB playbook: a fact table joined on its FK every day should not
  * shuffle every day).
  */
object Bucketing {

  /** Persist `df` as a bucketed, sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  /** Join two tables bucketed on the same key with the same bucket count —
    * planner elides both exchanges (verify with
    * `df.queryExecution.executedPlan` containing no `Exchange`).
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
