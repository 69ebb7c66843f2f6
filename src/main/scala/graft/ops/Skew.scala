package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling utilities (SURVEY §7.1: "salting for skew, AQE for runtime
  * re-plan"). AQE's skew-join split handles sort-merge joins out of the box;
  * explicit salting is for the cases AQE can't re-plan — aggregations with
  * a hot key, and joins where one side must stay a shuffle hash join.
  */
object Skew {

  /** Salted two-phase aggregation: count/sum-style partial aggs over
    * (key, salt) then a final merge over key. Turns one hot-key reducer
    * into `salts` parallel partials. The generic contract: `partialAggs`
    * must be mergeable by `finalAggs` (sum→sum, count→sum, min→min, ...).
    *
    * WHEN TO USE: only for aggregates whose partial state is itself large
    * per key — collect_list/collect_set, exact percentile, large typed
    * buffers — where one hot key's state must be split across reducers.
    * For algebraic aggs (count/sum/min/max/avg) Spark's map-side partial
    * aggregation ALREADY spreads hot-key work across mappers; salting
    * those just adds an extra shuffle for nothing.
    */
  def saltedCount(df: DataFrame, keyCol: String, salts: Int): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id(), lit(salts)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(keyCol))
      .agg(sum("__partial").as("cnt"))

  /** Salted broadcast-free join of a skewed fact side against a smaller
    * (but not broadcastable) dim side: the fact side gets a random salt in
    * [0, salts); the dim side replicates `salts` times; the join key becomes
    * (key, salt) — hot keys spread over `salts` reducers. Seeded for
    * determinism.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 salts: Int, seed: Long = 42L): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      (rand(seed) * salts).cast("int"))
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(replicatedDim, Seq(key, "__salt")).drop("__salt")
  }
}
