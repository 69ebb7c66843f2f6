package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession}

/** Minimal accessor for the `private[sql]` Dataset.ofRows — the supported
  * way for extension libraries to materialize a DataFrame from a custom
  * LogicalPlan (here: graft.plans.AsOfJoin). Lives under
  * org.apache.spark.sql.* solely for package visibility; no Spark
  * internals are modified.
  */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark, plan)

  /** Release the cached blocks behind a `localCheckpoint()`ed frame.
    * Iterative algorithms (graft.ops.Graph) checkpoint per round; without
    * an explicit unpersist the superseded rounds' blocks pin executor
    * storage until ContextCleaner happens to GC them — at scale that
    * accumulates. Only call once nothing references the frame: a local
    * checkpoint has no lineage to recompute from.
    */
  def unpersistLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
