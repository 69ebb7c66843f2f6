package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cost measurement for the >256-cell `IvfIndex.assign` fallback (VERDICT
  * r5 #5): above `maxUnrolledCells` the assign becomes
  * `crossJoin(broadcast(centroids)) → groupBy(vec_id).agg(max_by)` — the
  * Exchange stays one row per vector (map-side combine), but the map-side
  * partial aggregation evaluates corpus × nlist scored rows. At
  * nlist = 2¹⁴ that pre-combine inflation could dominate; this tool
  * measures it at nlist ∈ {256, 1024, 4096} on the 10× planted corpus
  * (and the unrolled path at 256 as the baseline), so the
  * two-level-assign decision rests on a datapoint, not an argument.
  *
  * Centroids are synthesized directly (deterministic hash vectors) — the
  * fallback's cost shape depends only on corpus × nlist × dim, not on
  * centroid quality, and training 4096 centroids on 20k vectors would be
  * statistically meaningless anyway.
  */
object IvfAssignBench {

  /** `n` deterministic unit vectors of dimension `dim`, id-keyed — same
    * hash-noise construction as IvfRecallBench's replicas.
    */
  def hashVectors(spark: SparkSession, n: Long, dim: Int,
                  idCol: String, vecCol: String, seed: Long): DataFrame = {
    val raw = transform(sequence(lit(0), lit(dim - 1)), j =>
      pmod(xxhash64(col(idCol), lit(seed), j), lit(2001L))
        .cast("double") / 1000.0 - 1.0)
    val norm = sqrt(aggregate(raw, lit(0.0), (acc, v) => acc + v * v))
    spark.range(n).select(col("id").as(idCol),
      transform(raw, v => (v / norm).cast("float")).as(vecCol))
  }

  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR")).getOrElse("/root/testdata/sf0.1")
    val cpus = graft.Bench.parseCpus(
      args.lift(1).orElse(sys.env.get("SPARK_GRAFT_CPUS")).getOrElse("32")).toString
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = graft.Tables.embeddings(spark, srcDir).select("vec_id", "embedding")
    val corpus = IvfRecallBench.planted10x(base, cpus.toInt)
    val n = corpus.count()
    println(s"corpus: $n vectors (10x planted), dim=64")

    def time(label: String, df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$label%-34s $s%7.2fs")
      s
    }

    // warm
    corpus.write.format("noop").mode("overwrite").save()

    // production cell counts (VERDICT r12 #6): at 100 TB nlist is
    // 10⁴–10⁵; sweep past the 4096 default guard with packed FORCED
    // (maxPackedCells = nlist) to find where the plan-literal route stops
    // being compute-bound — cold-vs-warm separates the per-query
    // planning/codegen cost (paid once per job) from per-row throughput
    for (nlist <- Seq(16, 64, 128, 256, 1024, 4096, 8192, 16384)) {
      val cents = hashVectors(spark, nlist.toLong, 64, "cell", "centroid", seed = 7L)
        .localCheckpoint()
      // run twice: first pays expression planning + literal embedding,
      // second is steady state — both matter (the first is per-QUERY cost,
      // which a 100 TB job pays once; the second is per-row cost)
      time(s"nlist=$nlist packed cold",
        graft.ops.IvfIndex.assign(corpus, cents, maxPackedCells = nlist))
      time(s"nlist=$nlist packed warm",
        graft.ops.IvfIndex.assign(corpus, cents, maxPackedCells = nlist))
      time(s"nlist=$nlist max_by fallback",
        graft.ops.IvfIndex.assign(corpus, cents, maxPackedCells = 0))
      // the production-nlist route: coarse-quantized two-level assign —
      // cold includes clustering the centroid table itself
      if (nlist >= 4096) {
        time(s"nlist=$nlist coarse cold",
          graft.ops.IvfIndex.assignCoarse(corpus, cents))
        time(s"nlist=$nlist coarse warm",
          graft.ops.IvfIndex.assignCoarse(corpus, cents))
        // quality vs exact: cell-identity agreement is tie-dominated on
        // RANDOM centroids (zero cluster structure — the adversarial
        // worst case for coarse pruning), so also record the SCORE GAP:
        // how much worse the chosen centroid's similarity is than the
        // true max (what cell quality actually costs)
        val cmap = cents.select(col("cell"), col("centroid"))
        def scored(a: org.apache.spark.sql.DataFrame) = a
          .select(col("vec_id"), col("cell"), col("embedding"))
          .join(broadcast(cmap), "cell")
          .select(col("vec_id"), col("cell"),
            expr("graft_dot_f(embedding, centroid)").as("s"))
        val exact = scored(graft.ops.IvfIndex.assign(corpus, cents, maxPackedCells = nlist))
          .withColumnRenamed("cell", "cell_x").withColumnRenamed("s", "s_x")
        val q = scored(graft.ops.IvfIndex.assignCoarse(corpus, cents))
          .join(exact, "vec_id")
          .agg(avg((col("cell") === col("cell_x")).cast("double")).as("agree"),
            avg(col("s_x") - col("s")).as("gap_mean"),
            expr("percentile(s_x - s, 0.99)").as("gap_p99"),
            avg(col("s_x")).as("exact_mean"))
          .head()
        println(f"  coarse-vs-exact: agree=${q.getDouble(0)}%.4f " +
          f"gapMean=${q.getDouble(1)}%.4f gapP99=${q.getDouble(2)}%.4f " +
          f"exactScoreMean=${q.getDouble(3)}%.4f")
      }
      println(f"  scored rows (corpus x nlist): ${n * nlist}%,d; " +
        f"centroid literal ${nlist * 64 * 4}%,d bytes")
    }

    // realistic regime: centroids TRAINED on the corpus (Lloyd), so the
    // coarse clustering has real structure to exploit — nlist=1024 is the
    // ceiling a 20k corpus supports (~20 rows/cell)
    val trained = graft.ops.IvfIndex.build(corpus, nlist = 1024, iters = 3,
      maxTrainRows = Long.MaxValue)
    val tc = trained.centroids.localCheckpoint()
    val cmapT = tc.select(col("cell"), col("centroid"))
    def scoredT(a: org.apache.spark.sql.DataFrame) = a
      .select(col("vec_id"), col("cell"), col("embedding"))
      .join(broadcast(cmapT), "cell")
      .select(col("vec_id"), col("cell"),
        expr("graft_dot_f(embedding, centroid)").as("s"))
    val exactT = scoredT(graft.ops.IvfIndex.assign(corpus, tc, maxPackedCells = 1024))
      .withColumnRenamed("cell", "cell_x").withColumnRenamed("s", "s_x")
    for (w <- Seq(2, 4, 8)) {
      val qt = scoredT(graft.ops.IvfIndex.assignCoarse(corpus, tc,
          nCoarse = 64, wProbe = w))
        .join(exactT, "vec_id")
        .agg(avg((col("cell") === col("cell_x")).cast("double")).as("agree"),
          avg(col("s_x") - col("s")).as("gap_mean"),
          expr("percentile(s_x - s, 0.99)").as("gap_p99"))
        .head()
      println(f"  TRAINED nlist=1024 nCoarse=64 w=$w: agree=${qt.getDouble(0)}%.4f " +
        f"gapMean=${qt.getDouble(1)}%.4f gapP99=${qt.getDouble(2)}%.4f")
    }

    // end-to-end BUILD through the route surface: the Lloyd rounds and the
    // final full-corpus assignment all take the coarse path
    for (route <- Seq("flat" -> graft.ops.IvfIndex.FlatAssign,
        "coarse" -> graft.ops.IvfIndex.CoarseAssign())) {
      val t0 = System.nanoTime()
      graft.ops.IvfIndex.build(corpus, nlist = 1024, iters = 2,
          maxTrainRows = Long.MaxValue, route = route._2)
        .assignments.write.format("noop").mode("overwrite").save()
      println(f"  build nlist=1024 iters=2 route=${route._1}%-6s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
    }
    spark.stop()
  }
}
