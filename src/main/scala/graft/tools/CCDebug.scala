package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling harness for the connected-components rework. */
object CCDebug {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.lineitem(spark, sfDir).write.format("noop").mode("overwrite").save()
    val aqeOff = sys.env.get("CC_AQE_OFF").contains("1")
    if (aqeOff) spark.conf.set("spark.sql.adaptive.enabled", "false")
    val t0 = System.nanoTime()
    val edges = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("src"), (-col("l_partkey") - 1).as("dst"))
    val localFinish = sys.env.getOrElse("CC_LOCAL_FINISH", "0").toLong
    val r = graft.ops.Graph.connectedComponentsResult(edges,
      localFinishEdges = localFinish, verbose = true)
    val t1 = System.nanoTime()
    val out = r.labels.groupBy("component").agg(count(lit(1)).as("n_nodes"))
    out.write.format("noop").mode("overwrite").save()
    val t2 = System.nanoTime()
    println(f"cc total ${(t1 - t0) / 1e9}%.2fs rounds=${r.rounds} " +
      f"converged=${r.converged} labelagg ${(t2 - t1) / 1e9}%.2fs")
    spark.stop()
  }
}
