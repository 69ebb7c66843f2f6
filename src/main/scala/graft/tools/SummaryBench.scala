package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Incremental summary maintenance vs re-aggregating history — the cost
  * model `ops.Sketches.maintain` exists for, measured. A 10x events
  * corpus (1M rows) arrives as 10 equal batches; after each arrival the
  * dashboard needs count/sum/min/max + HLL distinct users + a 100-bin
  * value histogram per event type. Two strategies:
  *
  *   - rescan:   re-aggregate ALL facts seen so far (what a naive
  *               pipeline does every day) — cost grows linearly with
  *               history;
  *   - maintain: summarize the DELTA, merge with the stored summary
  *               (O(delta + summary); the summary is key-bounded, here
  *               5 rows, so effectively O(delta)).
  *
  * Equality of the two results is spec-pinned (SketchesSpec); this tool
  * reports the walls so the flat-vs-growing shape is on record. At
  * 100 TB the rescan column is the one that becomes impossible: day 100
  * rescans 100 days of facts, while maintain still touches one day +
  * a 5-row summary.
  */
object SummaryBench {

  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR")).getOrElse("/root/testdata/sf0.1")
    val cpus = graft.Bench.parseCpus(
      args.lift(1).orElse(sys.env.get("SPARK_GRAFT_CPUS")).getOrElse("32")).toString
    val reps = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = graft.Tables.events(spark, srcDir)
      .select("event_id", "event_type", "value", "user_id")
    val events = base
      .crossJoin(spark.range(reps.toLong).select(col("id").as("__r")))
      .withColumn("event_id", col("event_id") + col("__r") * 10000000L)
      .withColumn("user_id", col("user_id") + col("__r") * 1000000L)
      .drop("__r")
    val total = events.count()

    val dir = java.nio.file.Files.createTempDirectory("summary_bench").toString
    // land the batches as parquet first: both strategies then READ facts
    // from disk, as a real pipeline would
    (0 until reps).foreach { i =>
      events.filter(col("event_id") % reps === i)
        .write.mode("overwrite").parquet(s"$dir/batch_$i")
    }
    val hist = Some(graft.ops.Sketches.HistSpec(0.0, 64.0, 100))
    val keys = Seq("event_type")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    println(f"corpus: $total%,d rows in $reps batches; summary keys: event_type")
    var maintainTotal = 0.0
    var rescanTotal = 0.0
    (0 until reps).foreach { i =>
      val mSec = time {
        graft.ops.Sketches.maintain(spark, s"$dir/summary",
          spark.read.parquet(s"$dir/batch_$i"), keys, "value", "user_id",
          hist = hist, kllK = Some(256))
      }
      val rSec = time {
        val sofar = (0 to i).map(j => spark.read.parquet(s"$dir/batch_$j"))
          .reduce(_ unionByName _)
        graft.ops.Sketches.summarize(sofar, keys, "value", "user_id",
          hist = hist, kllK = Some(256)).collect()
      }
      maintainTotal += mSec; rescanTotal += rSec
      println(f"after batch ${i + 1}%2d: maintain=$mSec%5.2fs  rescan-history=$rSec%5.2fs")
    }
    println(f"totals over $reps arrivals: maintain=$maintainTotal%.1fs  rescan=$rescanTotal%.1fs" +
      f"  (rescan/maintain = ${rescanTotal / maintainTotal}%.1fx)")
    // the maintained summary answers the dashboard without touching facts
    val report = graft.ops.Sketches.report(
      spark.read.parquet(s"$dir/summary"))
    report.show(10, truncate = false)
    // the maintain-then-QUERY path specifically (q_summary_percentiles
    // shape): grouped p50/p90/p99 served from the stored KLL bytes vs the
    // exact sort-based rescan over all facts — the at-scale argument for
    // keeping summaries at all
    val tServe = time {
      graft.ops.Sketches.report(spark.read.parquet(s"$dir/summary")).collect()
    }
    val all = (0 until reps).map(j => spark.read.parquet(s"$dir/batch_$j"))
      .reduce(_ unionByName _)
    val tExact = time {
      graft.ops.Quantiles.exactPercentiles(
        all, "event_type", "value", Seq(0.5, 0.9, 0.99)).collect()
    }
    println(f"quantile read at $reps%dx history: maintained-serve=$tServe%.2fs" +
      f"  exact-rescan=$tExact%.2fs  (${tExact / tServe}%.1fx)")
    println("SummaryBench OK")
    spark.stop()
  }
}
