package graft.tools
import org.apache.spark.sql.SparkSession

/** Prints per-batch (picked, verified) speculation stats for the batched
  * BPE trainer on the real documents corpus — the diagnosis tool behind
  * the batch-size default (see SCALE.md r12).
  */
object BpeSpecProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.lift(1).map(_.toInt).getOrElse(64)
    val batch = args.lift(2).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(spark, dir)
    val t0 = System.nanoTime()
    val (m, _, stats) = graft.ops.TextOps.trainPhraseMergesWithStats(
      docs, "doc_id", "text", n, batch)
    val wall = (System.nanoTime() - t0) / 1e9
    println(s"trained=${m.size} wall=${"%.1f".format(wall)}s batches=${stats.size}")
    println(s"stats (picked,verified): ${stats.mkString(" ")}")
    val wasted = stats.map { case (p, v) => p - v }.sum
    println(s"speculated=${stats.map(_._1).sum} verified=${stats.map(_._2).sum} wasted=$wasted")
    spark.stop()
  }
}
