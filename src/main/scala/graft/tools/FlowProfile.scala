package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Job-count + wall profile of the two continuous-build gate keys
  * (q_curation_incremental / q_vector_curation) — both are
  * fixed-job-overhead dominated at gate scale, so the diet target is
  * the JOB COUNT per ingest, not any one job's work (r14 verdict #2;
  * r15 item #3). Prints per-wave wall and the Spark job tally, then a
  * per-job breakdown of the slowest jobs.
  */
object FlowProfile {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val which = args.lift(1).getOrElse("both")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", graft.ops.FsUtil.localFsImpl)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String)]()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          starts.put(j.jobId, (System.nanoTime(),
            Option(j.properties)
              .flatMap(p => Option(p.getProperty("spark.job.description")))
              .orElse(Option(j.properties)
                .flatMap(p => Option(p.getProperty("callSite.short"))))
              .getOrElse("?")))
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val s = starts.remove(j.jobId)
          if (s != null) jobs.add((j.jobId, System.nanoTime() - s._1, s._2))
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
      println(f"$label%-28s wall=$wall%6.2fs jobs=${js.size}%3d " +
        f"jobwall=${js.map(_._2).sum / 1e9}%6.2fs")
      js.groupBy(_._3).toSeq
        .map { case (site, g) => (site, g.size, g.map(_._2).sum / 1e9) }
        .sortBy(-_._3)
        .foreach { case (site, n, s) =>
          println(f"    $n%3d jobs $s%6.2fs  $site")
        }
    }

    if (which != "vector") {
      val docs = graft.Tables.documents(spark, d)
      val bench = graft.ops.CurationFlow.benchShingles(docs)
      bench.count() // warm
      val dir = java.nio.file.Files.createTempDirectory("fp_t").toString + "/idx"
      var cursor = 0L
      var staged: graft.ops.CurationFlow.Staged = null
      profile("text w1 decide") {
        staged = graft.ops.CurationFlow.decide(dir,
          docs.filter(pmod(col("doc_id"), lit(2)) === 0), bench, 0L)
        cursor = staged.cursor
      }
      profile("text w1 decisions eval") {
        staged.decisions.write.format("noop").mode("overwrite").save()
      }
      profile("text w1 commit") {
        graft.ops.CurationFlow.commit(dir, staged.kept,
          keptBands = Some(staged.keptBands))
      }
      profile("text w2 decide") {
        staged = graft.ops.CurationFlow.decide(dir,
          docs.filter(pmod(col("doc_id"), lit(2)) === 1), bench, cursor)
      }
      profile("text w2 decisions eval") {
        staged.decisions.write.format("noop").mode("overwrite").save()
      }
      profile("text w2 commit") {
        graft.ops.CurationFlow.commit(dir, staged.kept,
          keptBands = Some(staged.keptBands))
      }
    }
    if (which == "unified") {
      val docs = graft.Tables.documents(spark, d)
      val emb = graft.Tables.embeddings(spark, d)
        .select(col("vec_id").as("doc_id"), col("embedding"))
      val base = docs.join(emb, Seq("doc_id"), "left")
        .select(col("doc_id"), col("text"), col("n_chars"), col("embedding"))
      val bench = graft.ops.CurationFlow.benchShingles(docs)
      bench.count()
      val dir = java.nio.file.Files.createTempDirectory("fp_u").toString + "/c"
      var cursor = 0L
      var staged: graft.ops.UnifiedFlow.Staged = null
      profile("uni w1 decide") {
        staged = graft.ops.UnifiedFlow.decide(dir,
          base.filter(pmod(col("doc_id"), lit(2)) === 0), bench, 0L)
        cursor = staged.cursor
      }
      profile("uni w1 decisions eval") {
        staged.decisions.write.format("noop").mode("overwrite").save()
      }
      profile("uni w1 commit") {
        graft.ops.UnifiedFlow.commit(dir, staged)
      }
      profile("uni w2 decide") {
        staged = graft.ops.UnifiedFlow.decide(dir,
          base.filter(pmod(col("doc_id"), lit(2)) === 1), bench, cursor)
      }
      profile("uni w2 decisions eval") {
        staged.decisions.write.format("noop").mode("overwrite").save()
      }
      profile("uni w2 commit") {
        graft.ops.UnifiedFlow.commit(dir, staged)
      }
    }
    if (which != "text" && which != "unified") {
      val emb = graft.Tables.embeddings(spark, d).select("vec_id", "embedding")
      emb.count() // warm
      val dir = java.nio.file.Files.createTempDirectory("fp_v").toString + "/idx"
      val p = graft.ops.VectorFlow.Params(minCos = 0.99)
      var cursor = 0L
      profile("vector w1 decide+eval+commit") {
        val r = graft.ops.VectorFlow.ingest(dir,
          emb.filter(pmod(col("vec_id"), lit(2)) === 0), 0L, p)
        r.decisions.write.format("noop").mode("overwrite").save()
        cursor = r.cursor
      }
      profile("vector wave 2 (odd)") {
        graft.ops.VectorFlow.ingest(dir,
          emb.filter(pmod(col("vec_id"), lit(2)) === 1), cursor, p)
          .decisions.write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
