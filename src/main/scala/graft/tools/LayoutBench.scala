package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

/** Data-layout pruning, measured: at 100 TB the dominant cost of a
  * time-range query is bytes off disk, and that is a WRITE-TIME property —
  * a fact table range-partitioned and sorted on its filter column turns
  * parquet min/max stats into file- and row-group-level skipping, while
  * the same rows written in arrival (hash) order force a full scan for
  * any range. This tool writes the identical 10× events corpus (1M rows)
  * both ways, runs the same narrow time-window aggregate, and reports
  * ROWS DECODED BY THE SCAN (the scan node's numOutputRows SQL metric —
  * rows surviving parquet row-group/page skipping, the direct measure of
  * stats-based pruning; task bytesRead under-reports on this shape) plus
  * wall per layout — the measured basis for the "sort your fact tables
  * on the dominant filter column" ingest guidance in SCALE.md. Small
  * parquet blocks (1 MiB) make row-group granularity visible at test
  * scale; at real scale the default 128 MiB blocks give the same ratio
  * against TB-sized files.
  */
object LayoutBench {

  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR")).getOrElse("/root/testdata/sf0.1")
    val cpus = graft.Bench.parseCpus(
      args.lift(1).orElse(sys.env.get("SPARK_GRAFT_CPUS")).getOrElse("32")).toString
    val reps = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // 1 MiB row groups: surfaces row-group skipping at 1M-row scale
      .config("parquet.block.size", (1 << 20).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = graft.Tables.events(spark, srcDir)
      .select("event_id", "ts_ms", "user_id", "event_type", "value")
    val events = base
      .crossJoin(spark.range(reps.toLong).select(col("id").as("__r")))
      .withColumn("event_id", col("event_id") + col("__r") * 10000000L)
      .drop("__r")

    val dir = java.nio.file.Files.createTempDirectory("layout").toString
    // layout A — arrival order: a hash repartition scatters every time
    // window across every file (what unmanaged ingest produces)
    events.repartition(32, col("event_id"))
      .write.mode("overwrite").parquet(s"$dir/hash")
    // layout B — range-partitioned + sorted on the filter column: each
    // file (and row group) covers a disjoint time slice (the productized
    // ingest helper; BucketingSpec pins the ratio as a regression)
    graft.ops.Bucketing.writeSorted(events, s"$dir/range", "ts_ms", partitions = 32)

    val Seq(tsMin, tsMax) = events.agg(min("ts_ms"), max("ts_ms"))
      .head().toSeq.map(_.asInstanceOf[Long])
    // a 1% time window in the middle of the range
    val lo = tsMin + (tsMax - tsMin) * 45 / 100
    val hi = lo + (tsMax - tsMin) / 100

    // AQE materializes exchanges as QueryStageExec LEAVES — a plain
    // collect() never reaches the scan inside the shuffle map stage
    def allScans(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
      case s: FileSourceScanExec => Seq(s)
      case q: QueryStageExec => allScans(q.plan)
    }.flatten

    def run(path: String): (Long, Double, Long) = {
      def query() = spark.read.parquet(path)
        .filter(col("ts_ms") >= lo && col("ts_ms") < hi)
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).as("sv"))
      query().collect() // warm (footer caches, codegen) on a separate plan
      val df = query() // fresh plan: metrics accumulate per plan instance
      val t0 = System.nanoTime()
      val n = df.collect().head.getLong(0)
      val sec = (System.nanoTime() - t0) / 1e9
      val plan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      // rows the scan DECODED (post row-group/page skip, pre re-check)
      val scanned = allScans(plan).map(_.metrics("numOutputRows").value).sum
      (scanned, sec, n)
    }

    val total = events.count()
    println(f"corpus: $total%,d rows, window=1%% of time range")
    val (hScan, hs, hn) = run(s"$dir/hash")
    val (rScan, rs, rn) = run(s"$dir/range")
    require(hn == rn, s"layouts must agree: hash=$hn range=$rn")
    println(f"hash-order layout : rows decoded=$hScan%,10d  wall=$hs%.2fs  rows out=$hn%,d")
    println(f"range+sort layout : rows decoded=$rScan%,10d  wall=$rs%.2fs  rows out=$rn%,d")
    println(f"decode ratio hash/range = ${hScan.toDouble / rScan}%.1fx")
    require(rScan.toDouble <= hScan.toDouble / 4,
      s"sorted layout must prune at least 4x on a 1% window: hash=$hScan range=$rScan")
    println("LayoutBench OK")
    spark.stop()
  }
}
