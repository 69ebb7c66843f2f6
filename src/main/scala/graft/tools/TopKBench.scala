package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Where the bounded top-k aggregator beats the rank window — measured.
  * Two group shapes on the orders corpus (optionally replicated 10×):
  *
  *   - many small groups (per o_custkey): the window's per-group sorts
  *     are tiny; both routes are cheap, the window's codegen usually
  *     wins on constant factors.
  *   - few huge groups (per o_orderstatus, 3 groups): the window must
  *     shuffle every row into 3 partitions and sort them (the 100 TB
  *     cliff, reproduced in miniature); the aggregator's map-side
  *     partial top-k sends k rows per (group, partition) instead.
  *
  * The catalog pins equivalence (q_topk_agg oracle = window SQL); this
  * records the wall-clock crossover that justifies having both routes.
  */
object TopKBench {
  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR")).getOrElse("/root/testdata/sf0.1")
    val cpus = graft.Bench.parseCpus(
      args.lift(1).orElse(sys.env.get("SPARK_GRAFT_CPUS")).getOrElse("32")).toString
    val reps = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val orders = graft.Tables.orders(spark, srcDir)
      .crossJoin(spark.range(reps.toLong).select(col("id").as("__r")))
      .withColumn("o_orderkey", col("o_orderkey") * reps + col("__r"))
      .select("o_custkey", "o_orderkey", "o_totalprice", "o_orderstatus")
      .localCheckpoint()
    println(s"corpus: ${orders.count()} orders (${reps}x $srcDir)")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def windowRoute(key: String): Unit = {
      val w = Window.partitionBy(key)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      orders.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .select(key, "o_orderkey", "o_totalprice")
        .write.format("noop").mode("overwrite").save()
    }
    def aggRoute(key: String): Unit = {
      val agg = udaf(new graft.functions.TopKPerGroupAgg(3))
      orders.groupBy(col(key))
        .agg(agg(col("o_totalprice"), col("o_orderkey")).as("topk"))
        .select(col(key), explode(col("topk")).as("t"))
        .write.format("noop").mode("overwrite").save()
    }
    Seq("o_custkey" -> "many small groups", "o_orderstatus" -> "3 huge groups")
      .foreach { case (key, label) =>
        // warm both, then measure
        windowRoute(key); aggRoute(key)
        val wSec = time(windowRoute(key))
        val aSec = time(aggRoute(key))
        println(f"$label%-18s ($key): window=$wSec%6.2fs  agg=$aSec%6.2fs  (${wSec / aSec}%4.1fx)")
      }
    spark.stop()
  }
}
