package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** File-count decay from micro-batch appends, measured — the failure mode
  * [[graft.ops.IvfIndex.compact]] exists for. A streamed inverted file
  * accumulates one file batch per cell per micro-batch; at 100 TB that is
  * thousands of tiny files per cell, and every probe pays
  * open + footer-parse + seek PER FILE where a compacted cell pays one.
  * This tool builds an index on the sf0.1 embeddings, drips the corpus in
  * as N micro-appends (the appendStream shape), then reports file counts
  * and probe-batch search wall before/after compaction, with search
  * results asserted identical.
  *
  * The wall-clock effect at this corpus size is footer/open overhead only
  * (the data fits in page cache); the FILE COUNT ratio is the number that
  * scales — it is the per-probe metadata cost multiplier a 1000-executor
  * cluster pays on every search.
  */
object CompactBench {

  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR")).getOrElse("/root/testdata/sf0.1")
    val cpus = graft.Bench.parseCpus(
      args.lift(1).orElse(sys.env.get("SPARK_GRAFT_CPUS")).getOrElse("32")).toString
    val nAppends = args.lift(2).map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.IvfIndex

    val emb = graft.Tables.embeddings(spark, srcDir).localCheckpoint()
    val n = emb.count()
    val dir = java.nio.file.Files.createTempDirectory("compact_bench").toString
    // seed the index with the first slice, stream the rest in
    val m0 = IvfIndex.build(emb.filter(col("vec_id") % nAppends === 0),
      nlist = 16, iters = 1)
    IvfIndex.save(m0, dir)
    (1 until nAppends).foreach { i =>
      IvfIndex.append(spark, dir, emb.filter(col("vec_id") % nAppends === i))
    }

    def countFiles(): Int = {
      val root = new org.apache.hadoop.fs.Path(s"$dir/assignments")
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(root).filter(_.isDirectory).map { d =>
        fs.listStatus(d.getPath).count { st =>
          val nm = st.getPath.getName
          st.isFile && !nm.startsWith("_") && !nm.startsWith(".")
        }
      }.sum
    }

    val probes = (0L until 64L).toSeq
    def searchWall(): (Double, Seq[Seq[Any]]) = {
      val loaded = IvfIndex.load(spark, dir)
      val df = IvfIndex.searchTopKBatch(loaded, probes, k = 10, nprobe = 16)
      df.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      (sec, df.orderBy("probe_id", "vec_id").collect().map(_.toSeq).toSeq)
    }

    val filesBefore = countFiles()
    val (wallBefore, resBefore) = searchWall()
    val (cellsDone, fb, fa) = IvfIndex.compact(spark, dir, maxFilesPerCell = 4)
    require(fb == filesBefore, s"accounting: $fb vs $filesBefore")
    val filesAfter = countFiles()
    require(fa == filesAfter, s"accounting: $fa vs $filesAfter")
    val (wallAfter, resAfter) = searchWall()
    require(resBefore == resAfter, "search results must be identical post-compact")

    println(f"corpus: $n%,d vectors, $nAppends micro-appends, 16 cells")
    println(f"files: $filesBefore before -> $filesAfter after ($cellsDone cells compacted, ${filesBefore.toDouble / filesAfter}%.1fx)")
    println(f"probe-batch search wall (64 probes, full probe): $wallBefore%.2fs before, $wallAfter%.2fs after")
    println("CompactBench OK (results identical)")
    spark.stop()
  }
}
