package graft

/** Catalog sanity: every declared query analyzes and executes at sf0.001,
  * every oracle key has a Spark twin, and the flagship entry returns rows.
  * (Value-level correctness is the driver's DuckDB gate — locally mirrored
  * by `tools/check.py`.)
  */
class QueriesSpec extends SparkTestBase {

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q_approx_top_k exactness preconditions hold in the generated data") {
    // Spark's approx_top_k ignores NULLs while the DuckDB oracle's GROUP BY
    // would emit a NULL group, and the sketch is exact only while
    // distinct(lang) stays at or under the k=100 asked of it — pin both so
    // a data-generator change can't silently turn the sketch approximate
    // or desync the NULL handling (ADVICE r4).
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, Sf0001)
    assert(docs.filter(col("lang").isNull).count() === 0,
      "documents.lang contains NULLs: approx_top_k would drop them, oracle would group them")
    val card = docs.select("lang").distinct().count()
    assert(card <= 50, s"lang cardinality $card approaches sketch capacity k=100")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name executes at sf0.001") {
      val df = fn(spark, Sf0001)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }

  // Integer-verdict queries promise constant-1 verdict columns to the
  // oracle; the gate only sees sf0.01, so pin the verdicts at sf0.001 too
  // (small-n is the HARDER case for the statistical ones).
  test("q_weibull_strength: every moment verdict is 1 at sf0.001") {
    import org.apache.spark.sql.functions.col
    val bad = SparkEntry.queries("q_weibull_strength")(spark, Sf0001)
      .filter(col("mean_ok") =!= 1 || col("cv_ok") =!= 1 || col("min_pos") =!= 1)
    assert(bad.count() === 0, bad.collect().mkString(", "))
  }

  test("q_tokenize_stats: serve_ok is 1 for every document at sf0.001") {
    import org.apache.spark.sql.functions.col
    val bad = SparkEntry.queries("q_tokenize_stats")(spark, Sf0001)
      .filter(col("serve_ok") =!= 1)
    assert(bad.count() === 0, bad.collect().mkString(", "))
  }
}
