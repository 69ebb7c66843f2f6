package graft.functions

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bounded map-side top-k per group vs the rank-window formulation: the
  * two routes must agree row-for-row (value DESC, id ASC tie-break),
  * under any partitioning, including heavy value ties — the equivalence
  * that licenses swapping the full-sort window for the k-bounded
  * aggregate at 100 TB.
  */
class TopKAggSpec extends SparkTestBase {

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "o_orderkey")
      .collect().map(_.toSeq).toSeq
  }

  private def aggTopK(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val agg = udaf(new TopKPerGroupAgg(k))
    df.groupBy(col("o_custkey"))
      .agg(agg(col("o_totalprice"), col("o_orderkey")).as("topk"))
      .select(col("o_custkey"), explode(col("topk")).as("t"))
      .select(col("o_custkey"), col("t._2").as("o_orderkey"),
        col("t._1").as("o_totalprice"))
      .orderBy("o_custkey", "o_orderkey")
      .collect().map(_.toSeq).toSeq
  }

  test("aggregator top-k == window top-k on real orders, k in {1, 3, 10}") {
    val orders = Tables.orders(spark, Sf0001)
    Seq(1, 3, 10).foreach { k =>
      assert(aggTopK(orders, k) === windowTopK(orders, k), s"k=$k diverged")
    }
  }

  test("partitioning-independent: 2-partition and 13-partition runs agree") {
    val orders = Tables.orders(spark, Sf0001)
    assert(aggTopK(orders.repartition(2), 3) === aggTopK(orders.repartition(13), 3))
  }

  test("value ties resolve by id ASC, exactly like the window") {
    import spark.implicits._
    // every value duplicated across ids; groups smaller and larger than k
    val df = Seq(
      (1L, 10L, 5.0), (1L, 11L, 5.0), (1L, 12L, 5.0), (1L, 13L, 5.0),
      (2L, 20L, 1.0), (2L, 21L, 2.0),
      (3L, 30L, 7.0))
      .toDF("o_custkey", "o_orderkey", "o_totalprice")
    assert(aggTopK(df, 3) === windowTopK(df, 3))
    // the saturated-buffer short-circuit must not drop a better tie:
    // top-3 of group 1 is ids 10, 11, 12 (id ASC among equal values)
    assert(aggTopK(df, 3).filter(_.head == 1L).map(_(1)) === Seq(10L, 11L, 12L))
  }
}
