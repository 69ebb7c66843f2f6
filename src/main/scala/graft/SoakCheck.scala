package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Soak check (SCALE.md evidence): derive a ~10× sf0.1 dataset (≈6M-row
  * lineitem) by unioning key-shifted copies — DERIVED data, testdata is
  * never modified — and run representative catalog queries against it.
  * Prints per-query seconds; the point is that plans hold their shape as
  * data grows (no spills, no cross products, no driver blowups).
  */
object SoakCheck {
  def main(args: Array[String]): Unit = {
    val copies = if (args.nonEmpty) args(0).toInt else 10
    val src = "/root/testdata/sf0.1"
    val out = "/tmp/graft_soak"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def amplify(name: String, keyCols: Seq[String], shift: Long): Unit = {
      val base = Tables.table(spark, src, name)
      val frames = (0 until copies).map { i =>
        keyCols.foldLeft(base) { (df, k) => df.withColumn(k, col(k) + i * shift) }
      }
      frames.reduce(_ unionAll _)
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
    }
    val t0 = System.nanoTime()
    amplify("lineitem", Seq("l_orderkey"), 10000000L)
    amplify("orders", Seq("o_orderkey", "o_custkey"), 10000000L)
    amplify("customer", Seq("c_custkey"), 10000000L)
    // small dims copied once
    Seq("region", "nation", "supplier", "part", "documents", "embeddings").foreach { t =>
      Tables.table(spark, src, t).write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.table(spark, src, "events").write.mode("overwrite").parquet(s"$out/events.parquet")
    println(f"amplify ${copies}x: ${(System.nanoTime() - t0) / 1e9}%.1f s, " +
      s"lineitem rows = ${spark.read.parquet(s"$out/lineitem.parquet").count()}")

    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q_group_agg", "q_fk_join", "q_topk_per_group",
        "q_self_join_pairs", "q_exact_dedup", "q_running_sum", "q_doc_dedup")
    names.foreach { n =>
      val t1 = System.nanoTime()
      val cnt = SparkEntry.queries(n)(spark, out).count()
      println(f"SOAK $n: ${(System.nanoTime() - t1) / 1e9}%.2f s ($cnt rows)")
    }
    spark.stop()
  }
}
