package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The band-join rule must (a) keep results identical to the naive cross
  * product, (b) actually remove the nested-loop join from the plan, and
  * (c) leave joins it doesn't own (equi conjunct present) untouched.
  */
class BandJoinRewriteSpec extends SparkTestBase {

  private def withRule[T](f: => T): T = {
    spark.experimental.extraOptimizations = Seq(BandJoinRewrite)
    try f finally { spark.experimental.extraOptimizations = Nil }
  }

  import org.apache.spark.sql.DataFrame
  private def pairsDf(): (DataFrame, DataFrame) = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val a = (0 until 300).map(i => (i.toLong, rnd.nextDouble() * 20)).toDF("id_a", "v_a")
    val b = (0 until 300).map(i => (i.toLong, rnd.nextDouble() * 20)).toDF("id_b", "v_b")
    (a, b)
  }

  test("band join rewrites to equi-join: same rows, no nested-loop in plan") {
    val (a, b) = pairsDf()
    val eps = 0.05
    val cond = col("id_a") < col("id_b") && abs(col("v_a") - col("v_b")) < eps
    val naive = a.join(b, cond).select("id_a", "id_b")
      .orderBy("id_a", "id_b").collect().map(_.toSeq)
    val (rewritten, plan) = withRule {
      val df = a.join(b, cond).select("id_a", "id_b")
      (df.orderBy("id_a", "id_b").collect().map(_.toSeq),
        df.queryExecution.executedPlan.toString)
    }
    assert(rewritten.toSeq === naive.toSeq)
    assert(naive.nonEmpty)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"expected equi-join plan, got:\n$plan")
    assert(plan.contains("Generate") || plan.contains("explode"))
  }

  test("joins with an equality conjunct are left to Spark") {
    val (a, b) = pairsDf()
    withRule {
      val df = a.join(b,
        col("id_a") === col("id_b") && abs(col("v_a") - col("v_b")) < 5.0)
      val plan = df.queryExecution.optimizedPlan.toString
      assert(!plan.contains("__band_pbin"), s"should not rewrite:\n$plan")
      assert(df.count() > 0)
    }
  }

  test("negative values and bin edges: rewrite == naive") {
    import spark.implicits._
    val vals = Seq(-1.0, -0.05, -0.049999, 0.0, 0.049999, 0.05, 0.1, 1.0)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val a = vals.toDF("id_a", "v_a")
    val b = vals.map { case (i, v) => (i + 100, v) }.toDF("id_b", "v_b")
    val cond = abs(col("v_a") - col("v_b")) < 0.05
    val naive = a.join(b, cond).select("id_a", "id_b")
      .orderBy("id_a", "id_b").collect().map(_.toSeq)
    val got = withRule {
      a.join(b, cond).select("id_a", "id_b")
        .orderBy("id_a", "id_b").collect().map(_.toSeq)
    }
    assert(got.toSeq === naive.toSeq)
  }
}
