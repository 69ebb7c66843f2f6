package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Epsilon-termination payoff for PageRank (r9 verdict #6): a fixed
  * `iters` ceiling does work proportional to configuration; `tol` does
  * work proportional to convergence. This measures both on the same
  * order-part bipartite graph CCBench uses (sf0.1: ~75k nodes / 600k
  * edges), so SCALE.md can record rounds-saved with walls attached.
  * Bipartite graphs like this one oscillate slowly under damping 0.85,
  * so a loose business tolerance (1e-2/node-mass here) is the realistic
  * dashboard setting; tighter tolerances show the cost curve.
  */
object PageRankBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR")).getOrElse("/root/testdata/sf0.1")
    val cpus = graft.Bench.parseCpus(
      args.lift(1).orElse(sys.env.get("SPARK_GRAFT_CPUS")).getOrElse("32")).toString
    val ceiling = args.lift(2).map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val edges = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("src"), (-col("l_partkey") - 1).as("dst"))
    edges.write.format("noop").mode("overwrite").save() // warm input
    val n = edges.selectExpr("src as v").unionAll(edges.selectExpr("dst as v"))
      .distinct().count()
    println(s"graph: $n nodes, ceiling=$ceiling rounds")
    def run(tol: Double): Unit = {
      val t0 = System.nanoTime()
      val (ranks, rounds) =
        graft.ops.Graph.pageRankWithRounds(edges, iters = ceiling, tol = tol)
      ranks.write.format("noop").mode("overwrite").save()
      println(f"tol=$tol%8.0e: rounds=$rounds%2d  wall=${(System.nanoTime() - t0) / 1e9}%6.2fs")
    }
    run(0.0)                    // fixed-iters baseline: always `ceiling`
    Seq(1e-2 * n, 1e-3 * n, 1e-6).foreach(run) // per-node-mass tolerances
    spark.stop()
  }
}
