package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Recall-vs-nprobe sweep for IVF ANN (VERDICT r5 #2 — the ANN analogue of
  * LshRecallBench's S-curve table): `q_ivf_topk` is oracle-gated only at
  * nprobe = nlist (provably exact), so the actual ANN operating points —
  * partial probing — need a measured recall@10 / cost curve.
  *
  * Two corpora:
  *  1. the native sf embeddings table with the catalog's `q_ivf_topk`
  *     config (nlist=16), and
  *  2. a 10× PLANTED corpus (the embedding analogue of LshRecallBench's
  *     mutated replicas): replica r of each base vector is
  *     `normalize(v + α_r · noise(vec_id, r))` with deterministic
  *     hash-derived noise, α_r spanning cosine ≈ 0.98 .. ≈ 0.5 — so probe
  *     neighborhoods contain known near-duplicates across the whole
  *     similarity spectrum, not just organic random vectors. nlist=128
  *     (≈√N for the 20k corpus).
  *
  * Ground truth is batched brute force over the same corpus (one
  * broadcast-probe cross join + per-probe window top-k — bit-identical
  * contract to [[graft.ops.Similarity.cosineTopK]]). Recall@10 averages
  * |IVF∩exact|/10 over probes; cost is the scanned-candidate fraction
  * (rows of probed cells / corpus, off the SAME probedCells table the
  * search joins on) plus wall time for the whole probe batch.
  */
object IvfRecallBench {
  private val Stride = 10000000L

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
    val probeIds = (0L until 64L).toSeq

    // optional scale knob: replicas=99 -> a 100x corpus (200k vectors)
    val replicas = args.lift(2).map(_.toInt).getOrElse(9)
    if (replicas == 9) {
      sweep(spark, "native-1x", base, probeIds, nlist = 16, iters = 2,
        nprobes = Seq(1, 2, 4, 8, 16))
      sweep(spark, "planted-10x", planted(base, cpus.toInt, 9), probeIds,
        nlist = 128, iters = 3,
        nprobes = Seq(1, 2, 4, 8, 16, 32, 64, 128))
    } else {
      sweep(spark, s"planted-${replicas + 1}x", planted(base, cpus.toInt, replicas),
        probeIds, nlist = 512, iters = 3,
        nprobes = Seq(1, 4, 16, 64, 256, 512))
    }
    spark.stop()
  }

  /** Replicas 1..9 of every base vector, perturbed with deterministic
    * per-(vec_id, replica, element) hash noise in [-1, 1] at amplitude
    * α_r = 0.04·r, then re-normalized to unit length (so dot == cosine, the
    * invariant every search path assumes). α spans cos ≈ 0.98 (r=1) down
    * to ≈ 0.5 (r=9) for 64-dim vectors: |α·noise| ≈ α·√(dim/3).
    */
  def planted10x(base: DataFrame, parts: Int): DataFrame =
    planted(base, parts, 9)

  def planted(base: DataFrame, parts: Int, nReplicas: Int): DataFrame = {
    val replicas = (1 to nReplicas).map { r =>
      val alpha = 0.04 * (1 + (r - 1) % 9) // spectrum repeats past 10x
      val noisy = transform(col("embedding"), (x, j) =>
        x.cast("double") + lit(alpha) *
          (pmod(xxhash64(col("vec_id"), lit(r.toLong), j), lit(2001L))
            .cast("double") / 1000.0 - 1.0))
      val norm = sqrt(aggregate(noisy, lit(0.0), (acc, v) => acc + v * v))
      base.select(
        (col("vec_id") + lit(r * Stride)).as("vec_id"),
        transform(noisy, v => (v / norm).cast("float")).as("embedding"))
    }
    replicas.foldLeft(base)(_ unionByName _).repartition(parts).localCheckpoint()
  }

  /** Batched exact ground truth: identical scoring/ordering contract to
    * cosineTopK (4dp rounding, vec_id tie-break), all probes in one job.
    */
  def bruteTopK(corpus: DataFrame, probeIds: Seq[Long], k: Int): DataFrame = {
    graft.functions.DotProductF.register(corpus.sparkSession)
    val probes = corpus.filter(col("vec_id").isInCollection(probeIds))
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_emb"))
    corpus.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        round(expr("graft_dot_f(embedding, probe_emb)"), 4).as("cos_sim"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy("probe_id").orderBy(col("cos_sim").desc, col("vec_id"))))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  private def sweep(spark: SparkSession, label: String, corpus: DataFrame,
                    probeIds: Seq[Long], nlist: Int, iters: Int,
                    nprobes: Seq[Int]): Unit = {
    val n = corpus.count()
    println(s"== $label: $n vectors, nlist=$nlist, ${probeIds.size} probes ==")
    val t0 = System.nanoTime()
    val model = graft.ops.IvfIndex.build(corpus, nlist, iters)
    model.assignments.write.format("noop").mode("overwrite").save()
    println(f"build: ${(System.nanoTime() - t0) / 1e9}%.1fs")
    val truth = bruteTopK(corpus, probeIds, 10).localCheckpoint()
    val denom = probeIds.size * 10.0
    println("nprobe  recall@10  scanned_frac  batch_sec")
    nprobes.foreach { np =>
      val t1 = System.nanoTime()
      val got = graft.ops.IvfIndex.searchTopKBatch(model, probeIds, 10, np)
        .localCheckpoint()
      got.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t1) / 1e9
      val hits = got.join(truth, Seq("probe_id", "vec_id")).count()
      val scanned = model.assignments.join(
          graft.ops.IvfIndex.probedCells(model, probeIds, np).select("cell", "probe_id"),
          Seq("cell")).count()
      println(f"$np%6d  ${hits / denom}%9.3f  ${scanned / (n.toDouble * probeIds.size)}%12.3f  $sec%9.2f")
    }
  }
}
