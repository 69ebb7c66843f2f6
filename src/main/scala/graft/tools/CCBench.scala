package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object CCBench {
  def main(args: Array[String]): Unit = {
    // data dir / parallelism from args or env (defaults preserved), so the
    // diagnostic runs on any machine or layout — mirrors Bench's handling
    val sfDir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR")).getOrElse("/root/testdata/sf0.1")
    val cpus = graft.Bench.parseCpus(
      args.lift(1).orElse(sys.env.get("SPARK_GRAFT_CPUS")).getOrElse("32")).toString
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val edges = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("src"), (-col("l_partkey") - 1).as("dst"))
    // warm the input
    edges.write.format("noop").mode("overwrite").save()
    for (attempt <- 1 to 2) {
      val t0 = System.nanoTime()
      val r = graft.ops.Graph.connectedComponentsResult(edges, maxIter = 20,
        localFinishEdges = 0L, verbose = true)
      r.labels.write.format("noop").mode("overwrite").save()
      println(f"forced-distributed total(run $attempt): ${(System.nanoTime() - t0) / 1e9}%.2fs rounds=${r.rounds} converged=${r.converged}")
    }
    spark.stop()
  }
}
