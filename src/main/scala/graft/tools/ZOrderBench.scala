package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

/** Multi-dimensional layout pruning, measured — the follow-on question to
  * `LayoutBench`: sorting on ONE column makes that column's range queries
  * sub-linear, but a 100 TB workload rarely filters one axis. The
  * reference's own flagship predicate is a 3-D box (`TestInsideBox`,
  * SURVEY P2); an events workload filters time AND user. This tool writes
  * the identical corpus three ways — arrival (hash) order, ts-sorted
  * (`Bucketing.writeSorted`), and Z-ordered on (ts, user)
  * (`Bucketing.writeZOrdered`) — and runs three predicate shapes:
  *
  *   - a 1% time window        (the 1-D sort's home game),
  *   - a 10% user window       (the 1-D sort's blind spot: ts-sorted files
  *                              carry every user in every row group),
  *   - a 10% x 10% time x user box (the multi-dim case both care about).
  *
  * Reported per (layout, query): rows decoded by the scan (the scan node's
  * numOutputRows — rows surviving parquet row-group/page skipping) and
  * wall. The expected shape, pinned loosely here and exactly in
  * BucketingSpec: Z loses a constant factor on the pure-ts window (its
  * time runs are chopped into 2^bits grid slabs), wins ~an order of
  * magnitude on the user-only window, and wins multiples on the box —
  * i.e. Z-order trades a little best-case for a bounded worst-case, which
  * is the right trade whenever more than one axis is ever filtered.
  */
object ZOrderBench {

  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR")).getOrElse("/root/testdata/sf0.1")
    val cpus = graft.Bench.parseCpus(
      args.lift(1).orElse(sys.env.get("SPARK_GRAFT_CPUS")).getOrElse("32")).toString
    val reps = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // 256 KiB row groups / 32 KiB pages: ~100+ granules at 1M-row
      // scale, enough resolution for a 1% box (at real scale TB-sized
      // files against 128 MiB groups have far MORE granules than this)
      .config("parquet.block.size", (256 << 10).toString)
      .config("parquet.page.size", (32 << 10).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = graft.Tables.events(spark, srcDir)
      .select("event_id", "ts_ms", "user_id", "event_type", "value")
    val events = base
      .crossJoin(spark.range(reps.toLong).select(col("id").as("__r")))
      .withColumn("event_id", col("event_id") + col("__r") * 10000000L)
      .drop("__r")

    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    events.repartition(32, col("event_id"))
      .write.mode("overwrite").parquet(s"$dir/hash")
    graft.ops.Bucketing.writeSorted(events, s"$dir/ts", "ts_ms", partitions = 32)
    graft.ops.Bucketing.writeZOrdered(events, s"$dir/z", Seq("ts_ms", "user_id"),
      bits = 12, partitions = 32)

    val b = events.agg(min("ts_ms"), max("ts_ms"), min("user_id"), max("user_id"))
      .head()
    val (tsMin, tsMax, uMin, uMax) =
      (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    def tsWin(pctLo: Int, pctW: Int): Column = {
      val lo = tsMin + (tsMax - tsMin) * pctLo / 100
      col("ts_ms") >= lo && col("ts_ms") < lo + (tsMax - tsMin) * pctW / 100
    }
    def uWin(pctLo: Int, pctW: Int): Column = {
      val lo = uMin + (uMax - uMin) * pctLo / 100
      col("user_id") >= lo && col("user_id") < lo + (uMax - uMin) * pctW / 100 + 1
    }
    val queries: Seq[(String, Column)] = Seq(
      "ts 1% window" -> tsWin(45, 1),
      "user 10% window" -> uWin(45, 10),
      "10% x 10% box" -> (tsWin(45, 10) && uWin(45, 10)))

    def allScans(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
      case s: FileSourceScanExec => Seq(s)
      case q: QueryStageExec => allScans(q.plan)
    }.flatten

    def run(path: String, pred: Column): (Long, Double, Long) = {
      def query() = spark.read.parquet(path).filter(pred)
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).as("sv"))
      query().collect() // warm footers/codegen on a separate plan
      val df = query()
      val t0 = System.nanoTime()
      val n = df.collect().head.getLong(0)
      val sec = (System.nanoTime() - t0) / 1e9
      val plan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val scanned = allScans(plan).map(_.metrics("numOutputRows").value).sum
      (scanned, sec, n)
    }

    println(f"corpus: ${events.count()}%,d rows; layouts: hash / ts-sort / z(ts,user)")
    for ((name, pred) <- queries) {
      val (hS, hT, hN) = run(s"$dir/hash", pred)
      val (tS, tT, tN) = run(s"$dir/ts", pred)
      val (zS, zT, zN) = run(s"$dir/z", pred)
      require(hN == tN && tN == zN, s"layouts must agree on '$name': $hN/$tN/$zN")
      println(f"$name%-16s rows=$hN%,9d | decoded hash=$hS%,10d ts=$tS%,10d z=$zS%,10d" +
        f" | wall hash=$hT%.2fs ts=$tT%.2fs z=$zT%.2fs" +
        f" | z-vs-ts ${tS.toDouble / zS}%.1fx")
    }
    println("ZOrderBench OK")
    spark.stop()
  }
}
