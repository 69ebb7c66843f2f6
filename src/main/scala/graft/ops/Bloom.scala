package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join pruning — the standard 100 TB trick for
  * "scan a huge fact table, keep only rows whose key exists in a
  * (filtered) dimension": build a bloom filter over the dim keys (one
  * small aggregate), broadcast the resulting bytes, and pre-filter the
  * fact SCAN with `might_contain` BEFORE any shuffle. False positives
  * pass the pre-filter and are removed by the exact join that follows,
  * so the composition is exactly the semi-join — but the exchange now
  * carries ~selectivity × facts instead of all facts. Spark's own
  * runtime-filter optimization injects the same shape when it can; this
  * is the explicit, always-on form for pipelines that know their dims
  * (and the registry pattern mirrors graft.functions.KllF).
  *
  * Rides Spark's native codegen'd `BloomFilterAggregate` /
  * `BloomFilterMightContain` expressions over xxhash64 of the key.
  */
object Bloom {
  private val AggName = "graft_bloom_agg"
  private val MightName = "graft_bloom_might_contain"

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(AggName, exprs =>
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        exprs(0), exprs(1).eval().asInstanceOf[Long]).toAggregateExpression(),
      "built-in")
    reg.createOrReplaceTempFunction(MightName, exprs =>
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        exprs(0), exprs(1)), "built-in")
  }

  /** Bloom bytes over `keys` (one column; long-hashable). One row out. */
  def buildAgg(spark: SparkSession, key: Column, expectedNdv: Long): Column = {
    register(spark)
    call_function(AggName, xxhash64(key), lit(expectedNdv))
  }

  /** `facts` rows whose `factKey` might be in `dimKeys` (exact join still
    * required downstream — this is the scan-side prefilter). `dimKeys`
    * must be a single-column frame (enforced — a multi-column frame would
    * silently bloom the wrong column).
    *
    * EAGER-SNAPSHOT semantics: the bloom aggregate over `dimKeys` runs at
    * CALL time, so the returned frame filters against the dim keys as of
    * this call, not as of the downstream action — re-call after mutating
    * the dim side.
    *
    * `might_contain` requires its bloom operand to be a CONSTANT (or
    * scalar subquery) — Spark's own runtime-filter rule materializes the
    * bloom through a subquery exchange for the same reason. Here the
    * bloom aggregate is collected to ONE bounded row (bytes sized by
    * `expectedNdv`, ~8 bits/key — a dim-bounded artifact like the IVF
    * centroid table, never fact-sized; the documented bounded-collect
    * exception class) and embedded as a literal, so the fact scan's
    * filter is a pure codegen'd probe with zero joins added to the plan.
    */
  def prefilter(facts: DataFrame, factKey: Column, dimKeys: DataFrame,
                expectedNdv: Long): DataFrame = {
    val spark = facts.sparkSession
    register(spark)
    require(dimKeys.columns.length == 1,
      s"prefilter needs a single-column dim frame, got ${dimKeys.columns.toSeq}")
    val keyCol = col(dimKeys.columns.head)
    val bytes = dimKeys.agg(buildAgg(spark, keyCol, expectedNdv).as("__bloom"))
      .head().getAs[Array[Byte]]("__bloom")
    facts.filter(call_function(MightName, lit(bytes), xxhash64(factKey)))
  }
}
