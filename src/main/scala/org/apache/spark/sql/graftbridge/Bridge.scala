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
}
