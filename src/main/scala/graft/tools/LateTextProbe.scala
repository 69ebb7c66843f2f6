package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Wall/job attribution of the late-TEXT correction composition
  * (q_unified_late_text's phases) — the FlowProfile listener pointed at
  * the r17 pass while it is dieted.
  */
object LateTextProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          starts.put(j.jobId, (System.nanoTime(),
            Option(j.properties)
              .flatMap(p => Option(p.getProperty("spark.job.description")))
              .getOrElse("?")))
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val s = starts.remove(j.jobId)
          if (s != null) jobs.add((System.nanoTime() - s._1, s._2))
        }
      })
    def profile(label: String)(work: => Unit): Unit = {
      jobs.clear()
      val t0 = System.nanoTime()
      work
      org.apache.spark.sql.graftbridge.Bridge
        .awaitListenerBusEmpty(spark.sparkContext)
      val wall = (System.nanoTime() - t0) / 1e9
      import scala.jdk.CollectionConverters._
      val js = jobs.asScala.toSeq
      println(f"$label%-22s wall=$wall%6.2fs jobs=${js.size}%3d " +
        f"jobwall=${js.map(_._1).sum / 1e9}%6.2fs")
      js.groupBy(_._2).toSeq
        .map { case (site, g) => (site, g.size, g.map(_._1).sum / 1e9) }
        .sortBy(-_._3).take(12)
        .foreach { case (site, n, s) =>
          println(f"    $n%3d jobs $s%6.2fs  $site")
        }
    }

    val docs = graft.Tables.documents(spark, d)
    val emb = graft.Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding"))
    val bench = graft.ops.CurationFlow.benchShingles(docs)
    bench.count()
    val dir = java.nio.file.Files.createTempDirectory("ltp").toString + "/c"
    val base = docs.join(emb.withColumnRenamed("vec_id", "doc_id"),
      Seq("doc_id"), "left")
      .select(col("doc_id"), col("text"), col("n_chars"), col("embedding"))
    val pending = col("embedding").isNotNull &&
      pmod(col("doc_id"), lit(10)) === 0
    val w1in = base.filter(pmod(col("doc_id"), lit(16)) === 0)
      .withColumn("n_chars",
        when(pending, lit(null).cast("long")).otherwise(col("n_chars")))
      .withColumn("text",
        when(pending, lit(null).cast("string")).otherwise(col("text")))
    var c = 0L
    profile("w1 ingest") {
      c = graft.ops.UnifiedFlow.ingest(dir, w1in, bench, 0L,
        prio = 1L).cursor
    }
    val twins = base
      .filter(pmod(col("doc_id"), lit(16)) === 0 && pending)
      .select((col("doc_id") * 100 + 3000001L).as("doc_id"),
        concat(col("text"), lit(" tdup99")).as("text"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("embedding", lit(null).cast("array<float>"))
      .select(col("doc_id"), col("text"), col("n_chars"), col("embedding"))
    val w2in = base.filter(pmod(col("doc_id"), lit(16)) === 4)
      .unionByName(twins)
    var w1kept: org.apache.spark.sql.DataFrame = null
    profile("w2 ingest") {
      val r = graft.ops.UnifiedFlow.ingest(dir, w2in, bench, c, prio = 2L)
      c = r.cursor
      w1kept = r.decisions // placeholder; real late feed reads w1's below
    }
    val late = docs.select(col("doc_id"), col("text"), col("n_chars"))
      .filter(pmod(col("doc_id"), lit(16)) === 0 &&
        pmod(col("doc_id"), lit(10)) === 0)
      .withColumn("prio", lit(1L))
    var staged: graft.ops.UnifiedFlow.LateTextStaged = null
    profile("lateTextDecide") {
      staged = graft.ops.UnifiedFlow.lateTextDecide(dir, late, bench, c)
    }
    profile("corrections eval") {
      staged.corrections.write.format("noop").mode("overwrite").save()
    }
    profile("lateTextCommit") {
      graft.ops.UnifiedFlow.lateTextCommit(dir, staged)
    }
    spark.stop()
  }
}
