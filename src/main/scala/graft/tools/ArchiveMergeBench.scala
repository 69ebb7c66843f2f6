package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures VERDICT r13 #4: the SCD2 late-correction merge against a
  * key-bucketed archive (planning-time pruned read) vs the flat archive
  * (runtime broadcast semi join over every file). Late batch = ~1% of
  * users; reports walls plus the archive scan's file/partition counts.
  */
object ArchiveMergeBench {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/tmp/graft_sf1")
    val mod = args.lift(1).map(_.toInt).getOrElse(101)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = graft.Tables.events(spark, src).select(
      col("user_id"), col("ts_ms"), col("event_id"), col("event_type"))
    val late = e.filter(pmod(col("user_id"), lit(mod)) === 3).localCheckpoint()
    val onTime = e.filter(pmod(col("user_id"), lit(mod)) =!= 3)
    val dir = java.nio.file.Files.createTempDirectory("arch_bench").toString
    val flatDir = s"$dir/flat"; val bktDir = s"$dir/bkt"
    onTime.write.parquet(flatDir)
    graft.ops.TimeOps.writeKeyBucketedArchive(onTime, bktDir)
    val existing = graft.ops.TimeOps.stateRuns(onTime).localCheckpoint()
    println(s"events=${e.count()} late=${late.count()} " +
      s"lateUsers=${late.select("user_id").distinct().count()}")
    def time(label: String)(f: => Unit): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime(); f
        println(f"  $label run$i: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    time("flat merge (semi join)") {
      graft.ops.TimeOps.stateRunsMerge(existing,
          spark.read.parquet(flatDir), late)
        .write.format("noop").mode("overwrite").save()
    }
    time("bucketed merge (pruned)") {
      graft.ops.TimeOps.stateRunsMergeBucketed(existing, bktDir, late)
        .write.format("noop").mode("overwrite").save()
    }
    // scan evidence: partitions/files touched by the pruned read
    val merged = graft.ops.TimeOps.stateRunsMergeBucketed(existing, bktDir, late)
    merged.write.format("noop").mode("overwrite").save()
    val plan = merged.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
        if s.relation.location.rootPaths.exists(_.toString.contains("bkt")) =>
        println(s"pruned scan: partitions=${s.selectedPartitions.partitionCount} " +
          s"files=${s.selectedPartitions.totalNumberOfFiles} of " +
          new java.io.File(bktDir).listFiles().count(_.getName.startsWith("ubkt=")))
    }
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(dir))
    spark.stop()
  }
}
