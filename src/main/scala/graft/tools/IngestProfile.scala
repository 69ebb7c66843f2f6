package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Section timings for the q_dedup_incremental shape at sf0.1 — where do
  * the seconds go after the r14 bucketed-layout change?
  */
object IngestProfile {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label%-24s ${(System.nanoTime() - t0) / 1e9}%6.2fs"); r
    }
    (1 to 3).foreach { i =>
      println(s"iter $i")
      val docs = graft.Tables.documents(spark, d)
      val history = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
      val arrivals = docs.filter(pmod(col("doc_id"), lit(2)) === 1)
      val dir = java.nio.file.Files.createTempDirectory("prof").toString + "/idx"
      t("append(history)") { graft.ops.Dedup.bandIndexAppend(dir, history, "doc_id", "text") }
      val probe = t("probe plan (ckpt+touch)") {
        graft.ops.Dedup.bandIndexProbe(dir, arrivals, "doc_id", "text") }
      t("candidates collect") { probe.orderBy("doc_a", "doc_b").collect() }
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(dir).getParentFile)
    }
    spark.stop()
  }
}
