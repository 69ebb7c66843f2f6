package graft.plans

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** The custom as-of physical operator must match the window-based as-of
  * (already oracle-verified through q_asof_curve) on real data, handle the
  * no-prior-curve-point case with nulls, and actually plan as AsOfJoinExec.
  */
class AsOfJoinSpec extends SparkTestBase {

  test("AsOfJoinExec == window-based asofCurveLookup on sf0.001 events") {
    val e = Tables.events(spark, Sf0001)
    val probes = e.select(col("event_id"), col("user_id"), col("ts"))
    val curve = e.filter(col("event_type") === "signup")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("ts_ms").as("c_ms"), col("value").as("c_val"))
    val joined = AsOfJoinOps.asof(probes, curve, "user_id", "c_user", "ts", "c_ts")
      .select(col("event_id"), col("c_ms").as("asof_ms"), col("c_val").as("asof_val"))
      .orderBy("event_id")
    val want = graft.ops.TimeOps.asofCurveLookup(e).orderBy("event_id")
    assert(joined.collect().map(_.toSeq).toSeq === want.collect().map(_.toSeq).toSeq)
  }

  test("plans through AsOfJoinExec (not a generic join)") {
    val e = Tables.events(spark, Sf0001)
    val probes = e.select(col("event_id"), col("user_id"), col("ts"))
    val curve = e.filter(col("event_type") === "signup")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"), col("value").as("c_val"))
    val df = AsOfJoinOps.asof(probes, curve, "user_id", "c_user", "ts", "c_ts")
    val plan = df.queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix; also check the co-cluster
    // + sort scaffolding EnsureRequirements inserted for us
    assert(plan.contains("AsOfJoin"), plan)
    assert(plan.contains("Exchange hashpartitioning(user_id"), plan)
    assert(plan.contains("Sort [c_user"), plan)
    assert(df.count() === probes.count()) // left-outer semantics: every probe kept
  }

  test("nulls before the first curve point; exact hit at a curve timestamp") {
    import spark.implicits._
    val probes = Seq((1L, 5L), (1L, 10L), (1L, 25L), (2L, 100L))
      .toDF("k", "t")
    val curve = Seq((1L, 10L, 1.5), (1L, 20L, 2.5))
      .toDF("ck", "ct", "cv")
    val got = AsOfJoinOps.asof(probes, curve, "k", "ck", "t", "ct")
      .orderBy("k", "t").collect()
    assert(got(0).isNullAt(3))                 // t=5: before any curve point
    assert(got(1).getDouble(4) === 1.5)        // t=10: inclusive hit
    assert(got(2).getDouble(4) === 2.5)        // t=25: latest <= t
    assert(got(3).isNullAt(3))                 // key 2: no curve at all
  }

  test("builder rejects non-long keys with a clear error") {
    import spark.implicits._
    val l = Seq((1.0, 1L)).toDF("k", "t")
    val r = Seq((1.0, 1L, 2.0)).toDF("ck", "ct", "cv")
    val ex = intercept[IllegalArgumentException] {
      AsOfJoinOps.asof(l, r, "k", "ck", "t", "ct")
    }
    assert(ex.getMessage.contains("LongType"))
  }
}
