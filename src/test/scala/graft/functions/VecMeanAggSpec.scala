package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class VecMeanAggSpec extends SparkTestBase {

  private def vecMean = udaf(VecMeanAgg)

  test("grouped vector mean matches the naive per-dimension average") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val dim = 8
    val rows = (0 until 500).map { i =>
      (i % 5, Array.fill(dim)(rnd.nextFloat() * 2 - 1))
    }
    val df = rows.toDF("g", "v")
    val got = df.groupBy("g").agg(vecMean(col("v")).as("m"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Float](1).toArray).toMap
    val want = rows.groupBy(_._1).map { case (g, vs) =>
      g -> Array.tabulate(dim)(d => (vs.map(_._2(d).toDouble).sum / vs.size).toFloat)
    }
    want.foreach { case (g, w) =>
      got(g).zip(w).foreach { case (a, b) =>
        assert(math.abs(a - b) <= 1e-6f, s"group $g: $a vs $b")
      }
    }
  }

  test("result is partitioning-independent (partial merge correctness)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (0 until 300).map(i => (i % 3, Array.fill(4)(rnd.nextFloat())))
    def mean(parts: Int): Map[Int, Seq[Float]] =
      rows.toDF("g", "v").repartition(parts)
        .groupBy("g").agg(vecMean(col("v")).as("m"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Float](1)).toMap
    val a = mean(1)
    val b = mean(17)
    a.keys.foreach { g =>
      a(g).zip(b(g)).foreach { case (x, y) =>
        assert(math.abs(x - y) <= 1e-6f, s"group $g differs across partitionings")
      }
    }
  }

  test("nulls are skipped; ragged input dimensions throw") {
    import spark.implicits._
    val withNull = Seq((0, Some(Array(1f, 3f))), (0, None), (0, Some(Array(3f, 5f))))
      .toDF("g", "v")
    val m = withNull.groupBy("g").agg(vecMean(col("v")).as("m"))
      .head().getSeq[Float](1)
    assert(m === Seq(2f, 4f))
    val ragged = Seq((0, Array(1f, 2f)), (0, Array(1f, 2f, 3f))).toDF("g", "v")
    val e = intercept[Exception] {
      ragged.coalesce(1).groupBy("g").agg(vecMean(col("v")).as("m")).collect()
    }
    assert(e.getMessage != null)
  }
}
