package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Write-time layout utilities: pre-shuffle (bucket) or pre-sort (range
  * layout) ONCE at ingest so every downstream read pays less — the 100 TB
  * playbook (SURVEY §7.1): a fact table joined on its FK every day should
  * not shuffle every day, and a fact table filtered on its time column
  * every day should not scan every row group every day.
  */
object Bucketing {

  /** Range-partition + sort `df` on `sortCol` and write it as parquet —
    * the ingest layout that turns parquet row-group/page min-max stats
    * into real skipping for range predicates on `sortCol`. Measured in
    * `tools/LayoutBench` (and pinned in BucketingSpec): a 1% time-window
    * query over the same rows decodes ~51x fewer rows from this layout
    * than from arrival (hash) order, and that decode ratio IS the cost
    * ratio of the query at 100 TB. Reference anchor: the engine's own
    * step-sorted columnar snapshots (`Output/MLSOut*.bin`, SURVEY D11) —
    * sorted-on-write so range reads stay sub-linear.
    *
    * `partitions <= 0` keeps the session's `spark.sql.shuffle.partitions`.
    * `options` passes writer options through (e.g. `parquet.block.size`
    * to shrink row groups when files are small relative to the default
    * 128 MiB groups).
    */
  def writeSorted(df: DataFrame, path: String, sortCol: String,
                  partitions: Int = 0,
                  options: Map[String, String] = Map.empty): Unit = {
    val ranged =
      if (partitions > 0) df.repartitionByRange(partitions, col(sortCol))
      else df.repartitionByRange(col(sortCol))
    ranged.sortWithinPartitions(sortCol)
      .write.options(options).mode("overwrite").parquet(path)
  }

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
