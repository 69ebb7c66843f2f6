package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures what `Dedup.bandIndexCompact` exists for: a long ingest
  * appends one small parquet file group per batch, and the per-batch
  * probe degrades with file count. Drives N micro-ingests of the sf0.1
  * documents (round-robin split), times the incremental probe against
  * the fragmented index, compacts, re-times the identical probe, and
  * prints file counts + walls.
  */
object BandIndexBench {
  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR")).getOrElse("/root/testdata/sf0.1")
    val cpus = graft.Bench.parseCpus(
      args.lift(1).orElse(sys.env.get("SPARK_GRAFT_CPUS")).getOrElse("32")).toString
    val nBatches = args.lift(2).map(_.toInt).getOrElse(60)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.Tables.documents(spark, srcDir).localCheckpoint()
    val dir = java.nio.file.Files.createTempDirectory("band_bench").toString + "/idx"
    val t0 = System.nanoTime()
    (0 until nBatches).foreach { i =>
      graft.ops.Dedup.bandIndexIngest(dir,
          docs.filter(pmod(col("doc_id"), lit(nBatches)) === i),
          "doc_id", "text")
        .write.format("noop").mode("overwrite").save()
    }
    println(f"$nBatches ingests: ${(System.nanoTime() - t0) / 1e9}%.1fs total")
    // r14 bucketed layout: data files live under bkt= partition dirs
    def files(): Int = {
      def walk(f: java.io.File): Int =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.endsWith(".parquet")) 1 else 0
      walk(new java.io.File(dir))
    }
    val probeBatch = docs.filter(pmod(col("doc_id"), lit(nBatches)) === 0)
    def timeProbe(label: String): Double = {
      val t = System.nanoTime()
      graft.ops.Dedup.bandIndexProbe(dir, probeBatch, "doc_id", "text")
        .write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t) / 1e9
      println(f"$label%-28s files=${files()}%4d  probe=${s}%6.2fs")
      s
    }
    timeProbe("fragmented (warm-up)")
    val frag = timeProbe("fragmented")
    val tc = System.nanoTime()
    graft.ops.Dedup.bandIndexCompact(spark, dir)
    println(f"compact wall: ${(System.nanoTime() - tc) / 1e9}%.2fs")
    timeProbe("compacted (warm-up)")
    val comp = timeProbe("compacted")
    println(f"probe speedup from compaction: ${frag / comp}%.2fx")
    spark.stop()
  }
}
