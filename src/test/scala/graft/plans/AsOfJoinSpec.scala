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

  test("forward / nearest / tolerance on a closed-form fixture") {
    import spark.implicits._
    val probes = Seq((1L, 10L), (1L, 20L), (1L, 35L), (2L, 5L)).toDF("k", "t")
    val curve = Seq((1L, 12L, 12.0), (1L, 30L, 30.0), (2L, 100L, 100.0))
      .toDF("ck", "ct", "cv")
    def vals(direction: String, tol: Long = Long.MaxValue): Seq[Any] =
      AsOfJoinOps.asof(probes, curve, "k", "ck", "t", "ct", direction, tol)
        .orderBy("k", "t").collect().toSeq
        .map(r => if (r.isNullAt(4)) null else r.getDouble(4))
    // backward: last ct <= t
    assert(vals("backward") === Seq(null, 12.0, 30.0, null))
    // forward: first ct >= t
    assert(vals("forward") === Seq(12.0, 30.0, null, 100.0))
    // nearest: t=20 -> 12 (d8) beats 30 (d10); t=35 -> 30 (d5)
    assert(vals("nearest") === Seq(12.0, 12.0, 30.0, 100.0))
    // tolerance drops far matches: forward within 50 loses (2,5)->100 (d95)
    assert(vals("forward", tol = 50L) === Seq(12.0, 30.0, null, null))
    // backward within 5: t=20 (d8) drops, t=35 (d5) survives
    assert(vals("backward", tol = 5L) === Seq(null, null, 30.0, null))
    // nearest within 7: t=10 -> 12 (d2), t=20 -> null (d8/d10), t=35 -> 30
    assert(vals("nearest", tol = 7L) === Seq(12.0, null, 30.0, null))
  }

  test("forward with an exact-time curve point returns that point") {
    import spark.implicits._
    val probes = Seq((1L, 10L), (1L, 11L)).toDF("k", "t")
    val curve = Seq((1L, 10L, 1.0), (1L, 40L, 4.0)).toDF("ck", "ct", "cv")
    val got = AsOfJoinOps.asof(probes, curve, "k", "ck", "t", "ct", "forward")
      .orderBy("t").collect()
    assert(got(0).getDouble(4) === 1.0) // rt == lt serves forward
    assert(got(1).getDouble(4) === 4.0)
  }

  test("forward == backward-on-negated-times on sf0.001 events (duality)") {
    // forward(t) over curve C == backward(-t) over C with times negated:
    // a second, independent implementation path through the SAME operator
    val e = Tables.events(spark, Sf0001)
    val probes = e.select(col("event_id"), col("user_id"), col("ts"))
    val curve = e.filter(col("event_type") === "signup")
      .groupBy(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .agg(max(col("value")).as("c_val"))
    val fwd = AsOfJoinOps.asof(probes, curve, "user_id", "c_user", "ts", "c_ts",
        "forward")
      .select(col("event_id"), col("c_ts"), col("c_val"))
      .orderBy("event_id").collect().map(_.toSeq)
    val neg = AsOfJoinOps.asof(
        probes.withColumn("nts", -col("ts")),
        curve.withColumn("nc_ts", -col("c_ts")),
        "user_id", "c_user", "nts", "nc_ts")
      .select(col("event_id"), col("c_ts"), col("c_val"))
      .orderBy("event_id").collect().map(_.toSeq)
    assert(fwd.toSeq === neg.toSeq)
  }

  test("nearest with an exact match on the LAST right row (buffer exhausted)") {
    // Regression: the nearest tie-break used to eval rBuf.head's time
    // unguarded. With the exact-match row being the final right row, the
    // buffer is empty at tie-break time — this crashed with
    // NoSuchElementException before the `fwd eq back` short-circuit.
    import spark.implicits._
    val probes = Seq((1L, 30L)).toDF("k", "t")
    val curve = Seq((1L, 30L, 3.0)).toDF("ck", "ct", "cv")
    val got = AsOfJoinOps.asof(probes, curve, "k", "ck", "t", "ct", "nearest")
      .collect()
    assert(got.length === 1)
    assert(got(0).getDouble(4) === 3.0)
  }

  test("nearest exact match does not read the NEXT key's buffered row") {
    // Same unguarded eval, second failure mode: the buffer head belongs to
    // key 2 when key 1's probe hits exactly — the answer must come from the
    // held row, and key 2's own probe must still resolve correctly after.
    import spark.implicits._
    val probes = Seq((1L, 30L), (2L, 7L)).toDF("k", "t")
    val curve = Seq((1L, 30L, 3.0), (2L, 5L, 5.0), (2L, 8L, 8.0))
      .toDF("ck", "ct", "cv")
    val got = AsOfJoinOps.asof(probes, curve, "k", "ck", "t", "ct", "nearest")
      .orderBy("k").collect()
    assert(got(0).getDouble(4) === 3.0) // exact hit, held row
    assert(got(1).getDouble(4) === 8.0) // d1 forward beats d2 backward
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
