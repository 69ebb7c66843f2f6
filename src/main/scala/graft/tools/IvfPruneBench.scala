package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Bytes-off-disk check for the persisted IVF index: IvfIndexSpec pins
  * that a search over a [[graft.ops.IvfIndex.save]]d index PLANS dynamic
  * partition pruning — this measures that the pruning actually bounds
  * physical reads. The inverted file (10× planted corpus, nlist=128) is
  * saved cell-partitioned and searched at increasing nprobe with a small
  * probe batch; task input metrics give bytes read per search. The read
  * fraction must track the UNION of probed cells (probes × nprobe draws
  * over nlist cells), not the corpus size.
  */
object IvfPruneBench {

  private final class BytesListener extends SparkListener {
    @volatile var bytes = 0L
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
      if (t.taskMetrics != null) bytes += t.taskMetrics.inputMetrics.bytesRead
    def reset(): Unit = bytes = 0
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
    val model = graft.ops.IvfIndex.build(corpus, nlist = 128, iters = 3)
    val dir = java.nio.file.Files.createTempDirectory("ivf_prune").toString
    graft.ops.IvfIndex.save(model, dir)
    val loaded = graft.ops.IvfIndex.load(spark, dir)
    val probeIds = Seq(0L, 1L, 2L, 3L)
    // serving shape: the caller holds the probe vectors (no inverted-file
    // lookup scan); here they come from the in-memory corpus
    val probeVecs = corpus.filter(col("vec_id").isInCollection(probeIds))
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_emb"))
      .localCheckpoint()

    val listener = new BytesListener
    spark.sparkContext.addSparkListener(listener)
    // full-scan reference: read every cell directory once
    listener.reset()
    loaded.assignments.write.format("noop").mode("overwrite").save()
    val fullBytes = listener.bytes
    println(f"full inverted-file scan: ${fullBytes / 1024.0 / 1024.0}%.1f MB")
    println("nprobe  cells_probed  bytes_MB  frac_of_full")
    for (np <- Seq(1, 2, 8, 32, 128)) {
      val cells = graft.ops.IvfIndex.probedCells(loaded, probeVecs, np)
        .select("cell").distinct().count()
      listener.reset()
      // probeVecs come from the corpus here, so self-exclusion applies
      graft.ops.IvfIndex.searchTopKBatch(loaded, probeVecs, 10, np, excludeSelf = true)
        .write.format("noop").mode("overwrite").save()
      val b = listener.bytes
      println(f"$np%6d  $cells%12d  ${b / 1024.0 / 1024.0}%8.1f  ${b.toDouble / fullBytes}%12.2f")
    }
    spark.stop()
  }
}
