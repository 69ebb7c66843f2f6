package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prints per-probe partial-probe recall (nprobe=4 of nlist=16, k=10)
  * against exact full-probe results at every local SF — the calibration
  * evidence behind `q_ann_recall`'s verdict threshold (the build is
  * seeded, so these are deterministic facts; re-run after any IVF
  * change).
  */
object AnnRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val probes = (0L until 10L).toSeq
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val emb = graft.Tables.embeddings(spark, s"/root/testdata/$sf")
      val model = graft.ops.IvfIndex.build(emb, nlist = 16, iters = 1)
      val exact = graft.ops.IvfIndex.searchTopKBatch(model, probes, k = 10, nprobe = 16)
        .select(col("probe_id"), col("vec_id"))
      val part = graft.ops.IvfIndex.searchTopKBatch(model, probes, k = 10, nprobe = 4)
        .select(col("probe_id"), col("vec_id"))
      val hits = exact.join(part, Seq("probe_id", "vec_id"))
        .groupBy("probe_id").agg(count(lit(1)).as("n_hit"))
      val rec = exact.groupBy("probe_id").agg(count(lit(1)).as("n_exact"))
        .join(hits, Seq("probe_id"), "left")
        .select(col("probe_id"), col("n_exact"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"))
        .orderBy("probe_id").collect()
      val recalls = rec.map(r => r.getLong(2).toDouble / r.getLong(1))
      println(s"$sf: per-probe recall@10 = ${recalls.map(x => f"$x%.2f").mkString(" ")} min=${recalls.min}")
    }
    spark.stop()
  }
}
