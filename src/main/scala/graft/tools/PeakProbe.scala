package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Attributes peak task execution memory to STAGES for a named catalog
  * key — written to locate q_dedup_incremental's 1,264 MB peak task
  * (VERDICT r13 #1): is it the pair-distinct, or a shared upstream
  * stage? Prints per-stage peak/task-count/name.
  */
object PeakProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf10")
    val key = args.lift(1).getOrElse("q_dedup_incremental_bounded")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val peaks = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int)]()
    val names = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        names.put(s.stageInfo.stageId, s.stageInfo.name.take(120))
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) peaks.merge(t.stageId, (m.peakExecutionMemory, 1),
          (a, b) => (math.max(a._1, b._1), a._2 + b._2))
      }
    })
    import org.apache.spark.sql.functions._
    if (key == "LOCAL_BOUNDED" || key == "LOCAL_EXACT") {
      // experiment: the row-local band derivation (no explode→aggregate)
      // in place of the grouped form, both incremental variants
      val docs = graft.Tables.documents(spark, dir)
      val history = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
      val arrivals = docs.filter(pmod(col("doc_id"), lit(2)) === 1)
      val sb = graft.ops.Dedup.lshBandTableLocal(history, "doc_id", "text")
      val nb = graft.ops.Dedup.lshBandTableLocal(arrivals, "doc_id", "text")
      val out =
        if (key == "LOCAL_BOUNDED")
          graft.ops.Dedup.lshIncrementalCandidatesBounded(sb, nb, 2).pairs
        else graft.ops.Dedup.lshIncrementalCandidates(sb, nb)
      out.write.format("noop").mode("overwrite").save()
    } else
      graft.SparkEntry.queries(key)(spark, dir)
        .write.format("noop").mode("overwrite").save()
    Thread.sleep(500)
    org.apache.spark.sql.graftbridge.Bridge.awaitListenerBusEmpty(spark.sparkContext)
    import scala.jdk.CollectionConverters._
    peaks.asScala.toSeq.sortBy(-_._2._1).take(12).foreach { case (sid, (pk, n)) =>
      println(f"stage $sid%4d peak=${pk / 1048576.0}%8.1fMB tasks=$n%4d  ${names.getOrDefault(sid, "?")}")
    }
    spark.stop()
  }
}
