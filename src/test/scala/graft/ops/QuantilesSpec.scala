package graft.ops

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** The sort-based exact percentile must equal Spark's buffering
  * `percentile` aggregate (which the DuckDB oracle already matches).
  */
class QuantilesSpec extends SparkTestBase {

  test("exactPercentiles == percentile() on the lineitem fixture") {
    val li = Tables.lineitem(spark, Sf0001)
    val want = li.groupBy(col("l_returnflag").as("g"))
      .agg(expr("percentile(cast(l_extendedprice as double), 0.5)").as("p0"),
        expr("percentile(cast(l_extendedprice as double), 0.9)").as("p1"),
        expr("percentile(cast(l_extendedprice as double), 0.0)").as("p2"),
        expr("percentile(cast(l_extendedprice as double), 1.0)").as("p3"))
      .orderBy("g").collect().map(_.toSeq)
    val got = Quantiles.exactPercentiles(li, "l_returnflag", "l_extendedprice",
      Seq(0.5, 0.9, 0.0, 1.0))
      .orderBy("g").collect().map(_.toSeq)
    assert(got.toSeq === want.toSeq)
  }

  test("exactPercentiles handles tiny and single-value groups") {
    import spark.implicits._
    val df = Seq(("a", 10.0), ("b", 1.0), ("b", 2.0), ("b", 4.0)).toDF("k", "x")
    val got = Quantiles.exactPercentiles(df, "k", "x", Seq(0.5))
      .orderBy("g").collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(got.toSeq === Seq(("a", 10.0), ("b", 2.0)))
    // interpolated case: 0.25 over {1,2,4} -> pos 1.5 -> 1 + (2-1)*0.5
    val q = Quantiles.exactPercentiles(df.filter(col("k") === "b"), "k", "x", Seq(0.25))
      .head().getDouble(1)
    assert(q === 1.5)
  }

  test("exactPercentilesGlobal == percentile() with no single-partition sort") {
    val li = Tables.lineitem(spark, Sf0001)
    val ps = Seq(0.0, 0.25, 0.5, 0.9, 0.99, 1.0)
    val want = li.agg(
      expr(s"percentile(cast(l_extendedprice as double), array(${ps.mkString(",")}))"))
      .head().getSeq[Double](0)
    val got = Quantiles.exactPercentilesGlobal(li, "l_extendedprice", ps, numParts = 7)
      .head().toSeq.map(_.asInstanceOf[Double])
    assert(got === want) // bit-identical, every partition holds only a slice
  }

  test("exactPercentilesGlobal: empty input, single value, tie storm") {
    import spark.implicits._
    val empty = Seq.empty[Double].toDF("x")
    assert(Quantiles.exactPercentilesGlobal(empty, "x", Seq(0.5)).count() === 0)
    val one = Seq(42.0).toDF("x")
    assert(Quantiles.exactPercentilesGlobal(one, "x", Seq(0.0, 0.5, 1.0))
      .head().toSeq === Seq(42.0, 42.0, 42.0))
    val rnd = new scala.util.Random(11)
    val ties = (0 until 4000).map(_ => rnd.nextInt(4).toDouble).toDF("x")
    val want = ties.agg(expr("percentile(x, array(0.5, 0.73))")).head().getSeq[Double](0)
    val got = Quantiles.exactPercentilesGlobal(ties, "x", Seq(0.5, 0.73), numParts = 5)
      .head().toSeq.map(_.asInstanceOf[Double])
    assert(got === want)
  }

  test("ranked grouped route == windowed twin, independent of partitioning") {
    val li = Tables.lineitem(spark, Sf0001)
    val ps = Seq(0.0, 0.25, 0.5, 0.9, 1.0)
    val want = Quantiles.exactPercentilesWindowed(li, "l_returnflag", "l_extendedprice", ps)
      .orderBy("g").collect().map(_.toSeq)
    // the default (ranked) route must be bit-identical across partition
    // layouts of the input — rank arithmetic can't depend on where the
    // range sampler happens to cut
    for (parts <- Seq(1, 3, 11)) {
      val got = Quantiles.exactPercentiles(
          li.repartition(parts), "l_returnflag", "l_extendedprice", ps)
        .orderBy("g").collect().map(_.toSeq)
      assert(got.toSeq === want.toSeq, s"input repartition($parts)")
    }
  }

  test("ranked grouped route: every sort partition holds a slice, not a group") {
    // 2 groups x 20k rows into 4 shuffle partitions: if the ranked route
    // partitioned by group alone, two partitions would hold 20k rows each;
    // range-partitioning on (g, v) must cap every partition near n/parts.
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val df = (0 until 40000).map(i => (s"g${i % 2}", rnd.nextDouble() * 1e6)).toDF("k", "x")
    val base = df.select(col("k").as("g"), col("x").cast("double").as("v"))
      .filter(col("v").isNotNull)
    val sizes = base
      .repartitionByRange(spark.sessionState.conf.numShufflePartitions, col("g"), col("v"))
      .sortWithinPartitions("g", "v")
      .rdd.mapPartitions(it => Iterator(it.size)).collect()
    assert(sizes.max <= 40000 / sizes.length * 2,
      s"partition sizes ${sizes.toSeq} must be ~n/parts, not n/groups")
    // and the answer on that same shape is still exact
    val want = df.groupBy(col("k").as("g"))
      .agg(expr("percentile(x, 0.5)").as("p0")).orderBy("g").collect().map(_.toSeq)
    val got = Quantiles.exactPercentiles(df, "k", "x", Seq(0.5))
      .orderBy("g").collect().map(_.toSeq)
    assert(got.toSeq === want.toSeq)
  }

  test("exactPercentiles == percentile() on adversarial tie-heavy values") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val df = (0 until 5000)
      .map(_ => (rnd.nextInt(3).toString, rnd.nextInt(5).toDouble)) // tie storm
      .toDF("k", "x")
    val want = df.groupBy(col("k").as("g"))
      .agg(expr("percentile(x, 0.5)").as("p0"), expr("percentile(x, 0.73)").as("p1"))
      .orderBy("g").collect().map(_.toSeq)
    val got = Quantiles.exactPercentiles(df, "k", "x", Seq(0.5, 0.73))
      .orderBy("g").collect().map(_.toSeq)
    assert(got.toSeq === want.toSeq)
  }

  test("double group keys: -0.0 and 0.0 are ONE group (ranked == windowed == percentile)") {
    import spark.implicits._
    // Spark's groupBy normalizes -0.0 into 0.0 while raw sorted rows keep
    // the sign bit; the ranked route's driver-side run maps must agree
    // (r12 review: un-normalized keys threw NoSuchElementException here)
    val rows = Seq.tabulate(40)(i =>
      (if (i % 2 == 0) -0.0 else 0.0, i.toDouble)) ++
      Seq.tabulate(10)(i => (1.5, 100.0 + i))
    val df = rows.toDF("k", "x").repartition(7)
    val got = Quantiles.exactPercentiles(df, "k", "x", Seq(0.25, 0.9))
      .orderBy("g").collect().map(_.toSeq)
    val want = df.groupBy(col("k").as("g"))
      .agg(expr("percentile(x, 0.25)").as("p0"), expr("percentile(x, 0.9)").as("p1"))
      .orderBy("g").collect().map(_.toSeq)
    assert(got.length === 2) // one zero group + the 1.5 group
    assert(got.toSeq === want.toSeq)
  }
}
