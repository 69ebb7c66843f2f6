package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** VERDICT r13 #2: the production index build COMPOSED — coarse-routed
  * build at nlist 8192/16384 on the 10× planted corpus, then SQ8 / PQ
  * quantized persistence, then a load + ADC search pass. The r13 sweep
  * measured the pieces (assign routes; quantized serving at nlist=16);
  * this measures the pipeline a 100 TB corpus would actually run, and
  * surfaces any cliff hiding between the pieces (e.g. the
  * partitionBy(cell) writer at 16k cells).
  */
object IvfProdBench {
  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR")).getOrElse("/root/testdata/sf0.1")
    val cpus = graft.Bench.parseCpus(
      args.lift(1).orElse(sys.env.get("SPARK_GRAFT_CPUS")).getOrElse("32")).toString
    val nlists = args.lift(2).map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(8192, 16384))
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = graft.Tables.embeddings(spark, srcDir).select("vec_id", "embedding")
    val corpus = IvfRecallBench.planted10x(base, cpus.toInt)
    println(s"corpus: ${corpus.count()} vectors, dim=64")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label%-30s ${(System.nanoTime() - t0) / 1e9}%7.2fs"); r
    }
    def countFiles(p: String): Int = {
      def walk(f: java.io.File): Int =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.endsWith(".parquet")) 1 else 0
      walk(new java.io.File(p))
    }

    for (nlist <- nlists) {
      println(s"== nlist=$nlist (CoarseAssign route) ==")
      val route = graft.ops.IvfIndex.CoarseAssign()
      val model = t("build(coarse, iters=2)") {
        graft.ops.IvfIndex.build(corpus, nlist, iters = 2, route = route) }
      val dir = java.nio.file.Files.createTempDirectory(s"ivfprod_$nlist").toString
      val params = graft.ops.Quantize.fitSq8(model.assignments, "embedding")
      t("saveQuantized (SQ8)") {
        graft.ops.IvfIndex.saveQuantized(model, s"$dir/sq8", params) }
      println(s"  sq8 files=${countFiles(s"$dir/sq8")}")
      t("saveQuantizedBucketed (SQ8)") {
        graft.ops.IvfIndex.saveQuantizedBucketed(model, s"$dir/sq8b", params) }
      println(s"  sq8b files=${countFiles(s"$dir/sq8b")}")
      val pq = t("Pq.fit (m=8)") { graft.ops.Pq.fit(corpus, m = 8, iters = 2) }
      t("saveQuantizedPq (m=8)") {
        graft.ops.IvfIndex.saveQuantizedPq(model, s"$dir/pq", pq) }
      println(s"  pq files=${countFiles(s"$dir/pq")}")
      t("saveQuantizedPqBucketed") {
        graft.ops.IvfIndex.saveQuantizedPqBucketed(model, s"$dir/pqb", pq) }
      println(s"  pqb files=${countFiles(s"$dir/pqb")}")
      val probes = corpus.limit(64).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
      for ((lay, p) <- Seq("per-cell" -> s"$dir/pq", "bucketed" -> s"$dir/pqb")) {
        t(s"ADC search cold ($lay)") {
          graft.ops.IvfIndex.searchTopKBatchAdc(spark, p,
              probes, k = 10, nprobe = 16)
            .write.format("noop").mode("overwrite").save() }
        t(s"ADC search warm ($lay)") {
          graft.ops.IvfIndex.searchTopKBatchAdc(spark, p,
              probes, k = 10, nprobe = 16)
            .write.format("noop").mode("overwrite").save() }
      }
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(dir))
    }
    spark.stop()
  }
}
