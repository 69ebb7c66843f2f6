package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot diagnostic: print a persisted index's top cell occupancies,
  * run [[graft.ops.IvfIndex.refineInPlace]] at the given cap and seed,
  * print them again. Used to reproduce the driftflood stuck-cell
  * finding (a cell the fixed-seed sub-Lloyd re-splits identically on
  * every call) and verify the escalation fix.
  */
object RefineProbe {
  def main(args: Array[String]): Unit = {
    val path = args(0)
    val cap = args.lift(1).map(_.toLong).getOrElse(2500L)
    val seed = args.lift(2).map(_.toLong).getOrElse(43L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def top(): Seq[(Long, Long)] = graft.ops.IvfIndex.load(spark, path)
      .assignments.groupBy("cell").count()
      .orderBy(col("count").desc).limit(5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    println(s"before: ${top()}")
    graft.ops.IvfIndex.refineInPlace(spark, path, cap, splitInto = 2,
      iters = 3, seed = seed)
    println(s"after (seed=$seed): ${top()}")
    spark.stop()
  }
}
