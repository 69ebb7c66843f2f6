package graft.ops

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Scale-path operators: salting equivalence, HLL approx-distinct bounds
  * (the A4 scale variant), and the parquet snapshot sink's partition
  * pruning.
  */
class ScaleOpsSpec extends SparkTestBase {

  test("saltedCount == plain groupBy count on a skewed key") {
    import spark.implicits._
    // 90% of rows share one hot key
    val df = (0 until 10000).map(i => (if (i % 10 == 0) i.toLong else 7L, i))
      .toDF("k", "v")
    val plain = df.groupBy("k").agg(count(lit(1)).as("cnt"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1)))
    val salted = Skew.saltedCount(df, "k", salts = 8)
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(salted.toSeq === plain.toSeq)
  }

  test("saltedJoin == plain join (same multiset of matches)") {
    import spark.implicits._
    val fact = (0 until 5000).map(i => (i % 7L, i)).toDF("k", "v")
    val dim = (0L until 7L).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = fact.join(dim, Seq("k")).groupBy("name").count()
      .orderBy("name").collect().map(r => (r.getString(0), r.getLong(1)))
    val salted = Skew.saltedJoin(fact, dim, "k", salts = 4).groupBy("name").count()
      .orderBy("name").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(salted.toSeq === plain.toSeq)
  }

  test("A4 scale path: approx_count_distinct within rsd of exact") {
    val li = Tables.lineitem(spark, Sf0001)
    val r = li.agg(
      countDistinct("l_partkey").as("exact"),
      approx_count_distinct("l_partkey", 0.02).as("approx")).head()
    val exact = r.getLong(0).toDouble
    assert(math.abs(r.getLong(1) - exact) / exact < 0.1)
  }

  test("A6 scale path: approx_percentile within bounded error of exact percentile") {
    // exact `percentile` buffers every value per group (the oracle path,
    // q_percentile); the 100 TB path is the mergeable approx_percentile
    // sketch (constant state, map-side combinable) — same pairing as
    // countDistinct/HLL above
    val li = Tables.lineitem(spark, Sf0001)
    val r = li.agg(
      expr("percentile(cast(l_extendedprice as double), 0.5)").as("exact_p50"),
      expr("approx_percentile(cast(l_extendedprice as double), 0.5, 1000)").as("apx_p50"),
      expr("percentile(cast(l_extendedprice as double), 0.9)").as("exact_p90"),
      expr("approx_percentile(cast(l_extendedprice as double), 0.9, 1000)").as("apx_p90"))
      .head()
    val (e50, a50, e90, a90) =
      (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(math.abs(a50 - e50) / e50 < 0.05, s"p50 $a50 vs $e50")
    assert(math.abs(a90 - e90) / e90 < 0.05, s"p90 $a90 vs $e90")
  }

  test("S8 parquet snapshot sink: step partition pruning serves step filters") {
    import graft.formats.SoABin
    import spark.implicits._
    val df = (0 until 4).flatMap(s => (0 until 100).map(i =>
      (s.toLong * 250, i.toLong, i * 0.1f, 0.0f, 0.0f, 1.0f)))
      .toDF("step", "particle_id", "ux", "uy", "uz", "flag")
    val dir = java.nio.file.Files.createTempDirectory("snaps").toString + "/out"
    SoABin.writeParquetSnapshots(df, dir)
    val back = spark.read.parquet(dir)
    assert(back.count() === 400)
    val one = back.filter(col("step") === 500)
    assert(one.count() === 100)
    // partition pruning: the step predicate lands in PartitionFilters
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("step"))
    assert(back.inputFiles.length >= 4)
  }
}
