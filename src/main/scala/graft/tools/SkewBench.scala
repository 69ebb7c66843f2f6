package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Planted-skew soak for the salted join (VERDICT r5 #3): `q_salted_join`
  * proves SEMANTICS (vs the plain-join oracle) and round-5 measured the
  * uniform-key COST (1.7× at 100×); this measures the BENEFIT — the one
  * claim in SCALE.md §Joins that still rested on argument.
  *
  * Corpus: 10× sf0.1 lineitem (key-shifted replicas, Soak's scheme), then
  * ~20% of fact rows REMAPPED to one hot order key — a single reducer owns
  * a fifth of the table in the plain shuffle join. The dim side (10×
  * orders) stays above the broadcast threshold, which is the scenario the
  * salted join exists for (broadcast solves skew trivially when the dim
  * fits; salting is for when it doesn't).
  *
  * Three shapes, each wall-timed with the straggler metric that actually
  * shows the problem (max single-task duration):
  *   1. plain sort-merge join, AQE skew split OFF — the naive baseline
  *   2. plain join, AQE skew split ON — Spark's built-in runtime answer
  *   3. `Skew.saltedJoin` — the explicit rewrite (works even where AQE
  *      can't re-plan, e.g. shuffle-hash or non-last-stage joins)
  * All three aggregate to the same tiny result, asserted equal.
  */
object SkewBench {
  private val Stride = 100000000L

  private final class TaskListener extends SparkListener {
    @volatile var maxTaskMs = 0L
    @volatile var taskCount = 0L
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      if (t.taskInfo != null) {
        maxTaskMs = math.max(maxTaskMs, t.taskInfo.duration)
        taskCount += 1
      }
    }
    def reset(): Unit = { maxTaskMs = 0; taskCount = 0 }
  }

  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR")).getOrElse("/root/testdata/sf0.1")
    val cpus = graft.Bench.parseCpus(
      args.lift(1).orElse(sys.env.get("SPARK_GRAFT_CPUS")).getOrElse("32")).toString
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.autoBroadcastJoinThreshold", -1) // dim must NOT broadcast
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // fact replicates 50x but FOLDS onto a `fold`-replica dim key space:
    // the scenario is a FACT much larger than its dim. fold=10 gives a dim
    // at 5% of fact rows; fold=1 a dim at 0.5% — both forced off broadcast
    // (modeling dims that are GBs at production scale).
    def rep(df: DataFrame, keys: Seq[String], replicas: Int, fold: Int): DataFrame = {
      val withR = df.crossJoin(
        spark.range(replicas.toLong).select((col("id") % fold).as("__r")))
      keys.foldLeft(withR)((d, c) => d.withColumn(c, col(c) + col("__r") * Stride))
        .drop("__r")
    }
    val hotKey = 7L // an order key present at replica 0
    def corpus(fold: Int): (DataFrame, DataFrame) = {
      val fact0 = rep(
        graft.Tables.lineitem(spark, srcDir)
          .select(col("l_orderkey").as("okey"), col("l_extendedprice").as("price")),
        Seq("okey"), replicas = 50, fold)
        .withColumn("__dup", monotonically_increasing_id())
      // remap ~20% of fact rows (hash-selected, deterministic) to the hot key
      val fact = fact0.withColumn("okey",
          when(pmod(xxhash64(col("okey"), col("price"), col("__dup")), lit(5L)) === 0,
            lit(hotKey)).otherwise(col("okey")))
        .drop("__dup")
        .repartition(cpus.toInt).localCheckpoint()
      val dim = rep(
        graft.Tables.orders(spark, srcDir)
          .select(col("o_orderkey").as("okey"), col("o_orderpriority").as("prio")),
        Seq("okey"), replicas = fold, fold)
        .repartition(cpus.toInt).localCheckpoint()
      (fact, dim)
    }

    val listener = new TaskListener
    spark.sparkContext.addSparkListener(listener)
    def run(label: String, aqe: Boolean, skewSplit: Boolean)
           (join: => DataFrame): Seq[(String, Long, Double)] = {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewSplit)
      // forceOptimizeSkewedJoin: we deliberately keep shuffle.partitions at
      // cpu count, and without it AQE declines the split when it would add
      // partitions beyond the original plan's count
      spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", skewSplit)
      // scale the skew-detection thresholds to this heap: the defaults
      // (256 MB partition threshold) are sized for production executors —
      // the planted hot partition here is ~120 MB, which at a 1000-executor
      // SF would be multi-GB and trip the default thresholds on its own
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        if (skewSplit) "16m" else "256m")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        if (skewSplit) "8m" else "64m")
      (1 to 3).map { attempt =>
        listener.reset()
        val t0 = System.nanoTime()
        val res = join.groupBy("prio")
          .agg(count(lit(1)).as("cnt"),
            sum(col("price").cast("double")).cast("long").as("rev"))
          .orderBy("prio").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"$label%-28s attempt $attempt: $sec%6.1fs  maxTask=${listener.maxTaskMs / 1000.0}%5.1fs  tasks=${listener.taskCount}")
        (s"$label#$attempt", res.hashCode.toLong, sec)
      }
    }

    for (fold <- Seq(10, 1)) {
      val (fact, dim) = corpus(fold)
      val hot = fact.filter(col("okey") === hotKey).count()
      println(s"== fold=$fold: fact=${fact.count()} rows, hot key owns $hot " +
        s"(${100 * hot / fact.count()}%), dim=${dim.count()} ==")
      val r1 = run("plain SMJ, skew split OFF", aqe = true, skewSplit = false)(
        fact.join(dim, Seq("okey")))
      val r2 = run("plain SMJ, AQE skew split", aqe = true, skewSplit = true)(
        fact.join(dim, Seq("okey")))
      val r3 = run("saltedJoin(salts=8)", aqe = true, skewSplit = false)(
        graft.ops.Skew.saltedJoin(fact, dim, "okey", salts = 8))
      val r4 = run("saltedJoin(salts=16)", aqe = true, skewSplit = false)(
        graft.ops.Skew.saltedJoin(fact, dim, "okey", salts = 16))
      val hashes = (r1 ++ r2 ++ r3 ++ r4).map(_._2).distinct
      println(s"result agreement across shapes: ${if (hashes.size == 1) "OK" else s"MISMATCH $hashes"}")
      fact.unpersist(); dim.unpersist()
    }
    spark.stop()
  }
}
