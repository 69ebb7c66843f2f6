package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** BPE training scaling curve (r9 verdict #7; r11 verdict #7 rebuilt the
  * default trainer) on the sf1-equivalent soak corpus (Soak convention:
  * 10x sf0.1 documents under distinct ids — 50k docs). Measures BOTH
  * routes at each point: the incremental+speculative default
  * (event-local deltas via BpeDeltasF, batched disjoint speculation with
  * exact argmax verification, lazy corpus materialization) and the
  * full-recount reference twin — and asserts their merge lists are
  * IDENTICAL, so the bench doubles as a full-scale equivalence run. The
  * r12 curve: 2.5x at 8 merges rising to 7.3x at 64 (SCALE.md table);
  * super-linear bends in either route mean lineage or corpus
  * accumulation (the localCheckpoint/unpersist hygiene exists to prevent
  * exactly that).
  */
object BpeScaleBench {
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
    val docs = graft.Tables.documents(spark, srcDir)
      .crossJoin(spark.range(reps.toLong).select(col("id").as("__r")))
      .withColumn("doc_id", col("doc_id") * reps + col("__r"))
      .drop("__r").localCheckpoint()
    println(s"corpus: ${docs.count()} documents (${reps}x $srcDir)")
    // both routes at every point: `inc` is the maintained-pair-count
    // default (r11 verdict #7), `rec` the full-recount reference twin —
    // the ratio IS the deliverable (the merge lists must also agree,
    // asserted here so the bench doubles as a full-scale equivalence run)
    Seq(8, 16, 32, 64).foreach { m =>
      val t0 = System.nanoTime()
      val (mi, _) = graft.ops.TextOps.trainPhraseMerges(
        docs, "doc_id", "text", nMerges = m)
      val tInc = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val (mr, _) = graft.ops.TextOps.trainPhraseMergesRecount(
        docs, "doc_id", "text", nMerges = m)
      val tRec = (System.nanoTime() - t1) / 1e9
      require(mi == mr, s"trainer divergence at m=$m: $mi vs $mr")
      println(f"merges=$m%2d: trained=${mi.size}%2d  inc=$tInc%6.1fs  rec=$tRec%6.1fs  speedup=${tRec / tInc}%4.2fx")
    }
    spark.stop()
  }
}
