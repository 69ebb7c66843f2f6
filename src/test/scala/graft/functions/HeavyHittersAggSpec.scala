package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class HeavyHittersAggSpec extends SparkTestBase {

  test("skewed stream: true heavy hitters surface with bounded undercount") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    // 3 hot keys at ~20/15/10% of 40k items + a long uniform tail
    val n = 40000
    val rows = (0 until n).map { _ =>
      val r = rnd.nextDouble()
      if (r < 0.20) "hot_a" else if (r < 0.35) "hot_b"
      else if (r < 0.45) "hot_c" else s"tail_${rnd.nextInt(5000)}"
    }
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val agg = udaf(new HeavyHittersAgg(capacity = 64, k = 3))
    val got = rows.toDF("tok").repartition(16)
      .agg(agg(col("tok")).as("hh")).head()
      .getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.map(_._1).toSet === Set("hot_a", "hot_b", "hot_c"))
    // Misra-Gries bound: undercount <= n / capacity, never overcount more
    // than the merge cut allows (estimates stay <= true count)
    got.foreach { case (key, est) =>
      val t = truth(key)
      assert(est <= t, s"$key overcounted: $est > $t")
      assert(t - est <= n / 64 + 1, s"$key undercount ${t - est} > ${n / 64}")
    }
  }

  test("deterministic on re-run and insensitive to partitioning") {
    import spark.implicits._
    val rows = (0 until 5000).map(i => if (i % 3 == 0) "x" else s"t$i")
    val agg = udaf(new HeavyHittersAgg(capacity = 32, k = 1))
    def run(parts: Int) = rows.toDF("tok").repartition(parts)
      .agg(agg(col("tok")).as("hh")).head()
      .getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getString(0))
    assert(run(4).head === "x")
    assert(run(13).head === "x")
  }
}
