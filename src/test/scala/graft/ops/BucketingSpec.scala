package graft.ops

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Bucketed co-located join: both sides pre-bucketed on the key ⇒ the
  * joined plan contains NO shuffle Exchange — the pay-once-shuffle-never
  * pattern for repeated fact joins at scale.
  */
class BucketingSpec extends SparkTestBase {

  test("join of two tables bucketed on the key plans without Exchange") {
    // (managed tables land in ./spark-warehouse — dropped in the cleanup)
    // disable auto-broadcast so an un-bucketed join WOULD shuffle
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(
        Tables.lineitem(spark, Sf0001).select("l_orderkey", "l_quantity"),
        "li_b", "l_orderkey", buckets = 8)
      Bucketing.writeBucketed(
        Tables.orders(spark, Sf0001)
          .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice")),
        "o_b", "l_orderkey", buckets = 8)
      val joined = Bucketing.bucketedJoin(spark, "li_b", "o_b", "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      // and it still returns the right rows
      val want = Tables.lineitem(spark, Sf0001)
        .join(Tables.orders(spark, Sf0001),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() === want)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
    }
  }
}
