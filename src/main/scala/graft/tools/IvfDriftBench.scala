package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Index staleness, measured — the missing number in the IVF lifecycle
  * (offline `build`+`save`, online `append`/`appendStream`, offline
  * retrain): HOW BAD do frozen centroids get as appended data drifts away
  * from the trained distribution, and what does a retrain buy back?
  *
  * Setup: the base embeddings corpus trains a quantizer (nlist=64). An
  * equal-sized "arrival" batch is the base shifted by `β · d` for a fixed
  * hash-derived UNIT direction d then re-normalized — β=0 is
  * in-distribution arrival, β=0.5 mild drift, β=2 a new modality.
  * Arrivals are assigned with the FROZEN base centroids (exactly what
  * [[graft.ops.IvfIndex.append]] does) vs a RETRAINED quantizer on
  * base+arrivals. Per model: the max cell's share of the corpus (cell
  * balance is what partition-pruned serving cost rests on), recall@10 and
  * scanned-candidate fraction at nprobe=8/64 for probes drawn from the
  * ARRIVALS (the worst-served side).
  *
  * Measured regimes (SCALE.md r7 table): in-distribution appends are
  * free (frozen == retrained on every metric); at MILD drift the frozen
  * index silently loses RECALL (the drifted region straddles stale cell
  * boundaries, so a probe's true neighbors spread into cells it doesn't
  * rank) and a retrain buys it back; at STRONG drift recall holds either
  * way but the new modality's mass funnels into a few hot cells and the
  * scanned fraction blows up — and a same-nlist retrain does NOT fix the
  * balance (a tight coherent cluster is one k-means cell; rebalancing
  * needs more centroids in the new region, not fresher ones). That fix
  * is [[graft.ops.IvfIndex.refine]] — iterated hot-cell splitting on the
  * frozen index — measured here as the `refined`/`refined@4np` rows: it
  * is a no-op in-distribution, matches retrain at equal scan budget
  * under mild drift, and under a modality shift restores balance and
  * revives the nprobe↔cost dial that the hot cell had pinned at a third
  * of the corpus. Retrain trigger needs BOTH monitors: recall probes for
  * mild drift (occupancy looks healthy there), cell-occupancy skew for
  * modality shifts (refine is the cheap first response).
  */
object IvfDriftBench {
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

    val base = graft.Tables.embeddings(spark, srcDir)
      .select("vec_id", "embedding").localCheckpoint()
    val nlist = 64
    val nprobe = 8
    val m0 = graft.ops.IvfIndex.build(base, nlist, iters = 3)
    val probeIds = (0L until 32L).map(_ + Stride)

    def ckpt(df: DataFrame) =
      org.apache.spark.sql.graftbridge.Bridge.dropCheckpointConstraints(
        df.localCheckpoint())

    // fixed hash-derived UNIT drift direction (same shift for every
    // vector → the arrivals form a coherent new region, the hard case for
    // a frozen quantizer; per-vector noise would just be more base data).
    // The direction is normalized so β is a real mix ratio against the
    // unit-norm vectors — an unnormalized 64-dim hash direction has norm
    // ~4.6 and already collapses the arrivals into a near-degenerate
    // point mass at β=0.5, which no quantizer can (or should) split
    def drifted(beta: Double): DataFrame = {
      val raw = (0 until 64).map(j =>
        (Math.floorMod(scala.util.hashing.MurmurHash3.productHash((777, j)), 2001)
          / 1000.0) - 1.0)
      val dNorm = math.sqrt(raw.map(x => x * x).sum)
      val dir = raw.map(_ / dNorm)
      val noisy = transform(col("embedding"), (x, j) =>
        x.cast("double") + lit(beta) * element_at(typedlit(dir), (j + 1).cast("int")))
      val norm = sqrt(aggregate(noisy, lit(0.0), (acc, v) => acc + v * v))
      base.select((col("vec_id") + lit(Stride)).as("vec_id"),
        transform(noisy, v => (v / norm).cast("float")).as("embedding"))
    }

    println(s"base=${base.count()} vectors, nlist=$nlist, nprobe=$nprobe, " +
      s"probes=32 (drawn from arrivals)")
    println("beta  model      max_cell_share  recall@10  scanned_frac")
    for (beta <- Seq(0.0, 0.5, 2.0)) {
      val full = ckpt(base.unionByName(drifted(beta)).repartition(cpus.toInt))
      val n = full.count().toDouble
      val truth = IvfRecallBench.bruteTopK(full, probeIds, 10).localCheckpoint()
      val frozen = graft.ops.IvfIndex.Model(m0.centroids,
        ckpt(graft.ops.IvfIndex.assign(full, m0.centroids)))
      val retrained = graft.ops.IvfIndex.build(full, nlist, iters = 3)
      // the drift-study fix: split cells holding >2x the balanced share
      // (IvfIndex.refine) on the FROZEN index — no retrain at all. A tight
      // cluster splits unevenly, so iterate to the threshold (refine is a
      // cheap no-op once nothing is hot)
      var refined = frozen
      for (_ <- 0 until 4)
        refined = graft.ops.IvfIndex.refine(refined,
          maxCellRows = (2 * n / nlist).toLong, splitInto = 4)
      def row(label: String, m: graft.ops.IvfIndex.Model, np: Int): Unit = {
        val cellMax = m.assignments.groupBy("cell").count()
          .agg(max("count")).head().getLong(0)
        val got = graft.ops.IvfIndex.searchTopKBatch(m, probeIds, 10, np)
        val hits = got.join(truth, Seq("probe_id", "vec_id")).count()
        val scanned = m.assignments.join(
          graft.ops.IvfIndex.probedCells(m, probeIds, np)
            .select("cell", "probe_id"), Seq("cell")).count()
        println(f"$beta%4.1f  $label%-11s  ${cellMax / n}%14.3f  " +
          f"${hits / 320.0}%9.3f  ${scanned / (n * 32)}%12.4f")
      }
      row("frozen", frozen, nprobe)
      row("retrained", retrained, nprobe)
      row("refined", refined, nprobe)
      // equal-scan-budget comparison: the refined index has ~4x the cells,
      // so 4x the nprobe buys back recall at roughly the scan cost the
      // frozen index pays at nprobe=8
      row("refined@4np", refined, nprobe * 4)
    }
    println("IvfDriftBench OK")
    spark.stop()
  }
}
