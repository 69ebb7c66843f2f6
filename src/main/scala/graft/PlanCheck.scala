package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the formatted physical plan of selected catalog
  * queries so the scale checklist can be eyeballed — parquet column
  * pruning (`ReadSchema`), filter pushdown (`PushedFilters`), broadcast
  * joins for dims, WholeStageCodegen coverage, TakeOrderedAndProject for
  * sort+limit.
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq else Seq(
      "q_scan_project", "q_range_filter", "q_broadcast_join", "q_fk_join",
      "q_sort_limit", "q_group_agg", "q_approx_dedup", "q_minhash_lsh",
      "q_embedding_topk", "q_range_join")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", graft.ops.FsUtil.localFsImpl)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
