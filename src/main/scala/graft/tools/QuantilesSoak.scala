package graft.tools

import org.apache.spark.sql.functions._

/** Soak for the range-partitioned grouped percentile route (r11 verdict
  * item 2): replicate lineitem REPLICAS× (key-shifted), run the ranked
  * grouped route, and print (a) wall, (b) the sort-stage partition-size
  * distribution vs n/parts — the claim under test is that no partition
  * holds more than ~n/parts rows even though there are only 3 groups.
  *
  *   SOAK_REPLICAS=10 sbt "runMain graft.tools.QuantilesSoak"
  */
object QuantilesSoak {
  def main(args: Array[String]): Unit = {
    val replicas = sys.env.getOrElse("SOAK_REPLICAS", "10").toInt
    val d = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = graft.Tables.lineitem(spark, d)
      .crossJoin(spark.range(replicas).select(col("id").as("rep")))
      .select(col("l_returnflag"), col("l_extendedprice"))
    val n = li.count()
    val parts = spark.sessionState.conf.numShufflePartitions
    // the exact sort shape the ranked route builds
    val sizes = li
      .select(col("l_returnflag").as("g"), col("l_extendedprice").cast("double").as("v"))
      .repartitionByRange(parts, col("g"), col("v")).sortWithinPartitions("g", "v")
      .rdd.mapPartitions(it => Iterator(it.size)).collect()
    (1 to 2).foreach(_ => graft.ops.Quantiles.exactPercentiles(
      li, "l_returnflag", "l_extendedprice", Seq(0.5, 0.9)).collect())
    val times = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      graft.ops.Quantiles.exactPercentiles(
        li, "l_returnflag", "l_extendedprice", Seq(0.5, 0.9)).collect()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"QUANTILES_SOAK replicas=$replicas n=$n parts=$parts " +
      f"maxPartRows=${sizes.max} nOverParts=${n / parts} " +
      f"ratio=${sizes.max.toDouble / (n.toDouble / parts)}%.2f " +
      f"wall=${times.map(t => f"$t%.2f").mkString(" ")} s")
    spark.stop()
  }
}
