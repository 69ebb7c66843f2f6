package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** TTL-dedup state soak: `StreamingTtlSpec` proves the eviction contract
  * on a handful of keys; this measures it at state-store scale. A 2M-row
  * digest stream over a ~490k-digest universe (drifting window: chunk j
  * draws 50k rows from digest ids [j·10k, j·10k+100k), so every chunk
  * mixes fresh digests with repeats of recent ones) runs through
  * `streamingDedupTTL` on RocksDB. Claims measured:
  *
  *  1. Dedup exactness at scale: the distinct digests EMITTED equal the
  *     distinct universe FED (every digest passes at least once; repeats
  *     inside a TTL window never mint an extra distinct).
  *  2. Eviction at scale: after the stream idles past the TTL, the sweep
  *     drains the store — final state rows must fall to (near) zero from
  *     a peak in the hundreds of thousands. Dead keys at 100 TB ingest
  *     are the classic unbounded-state poison; this is the measured
  *     counter-evidence.
  *  3. Throughput + batch latency from the progress reports.
  *
  * The spec owns the fine-grained semantics (in-window drop, re-admit);
  * the soak owns the scale numbers. Parquet sink + distributed distinct
  * counts — nothing data-sized lands on the driver.
  */
object TtlSoak {
  def main(args: Array[String]): Unit = {
    val cpus = graft.Bench.parseCpus(
      args.headOption.orElse(sys.env.get("SPARK_GRAFT_CPUS")).getOrElse("32")).toString
    val chunks = args.lift(1).map(_.toInt).getOrElse(40)
    val chunkRows = args.lift(2).map(_.toInt).getOrElse(50000)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      // the 4.1 checksum checkpoint manager wedges under continuous
      // no-input triggers (see StreamingTtlSpec); same workaround here
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      // the drain check sums numInputRows over recentProgress; the default
      // retention (100) would silently under-count past ~100 micro-batches
      .config("spark.sql.streaming.numRecentProgressUpdates", "100000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sc = spark.sqlContext

    val drift = 10000L
    val range = 100000L
    // the distinct digests ACTUALLY fed (random draws don't cover the id
    // space; edge windows draw fewer) — the dedup-exactness oracle
    val fedDistinct = new scala.collection.mutable.HashSet[Long]
    val ttl = java.time.Duration.ofSeconds(5)

    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long)]
    val outDir = java.nio.file.Files.createTempDirectory("ttl_soak_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ttl_soak_ck").toString
    val q = graft.streaming.StreamOps.streamingDedupTTL(mem.toDS(), ttl)
      .toDF("digest", "doc_id")
      .writeStream.outputMode("append").format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("250 milliseconds"))
      .start()

    def inputRows(): Long =
      q.recentProgress.map(_.numInputRows).sum
    def stateRows(): Long = {
      val p = q.lastProgress
      if (p == null || p.stateOperators.isEmpty) -1L
      else p.stateOperators.map(_.numRowsTotal).max
    }
    def awaitTrue(desc: String, timeoutMs: Long)(cond: => Boolean): Unit = {
      val dl = System.currentTimeMillis() + timeoutMs
      while (!cond) {
        require(System.currentTimeMillis() < dl, s"timeout: $desc")
        Thread.sleep(100)
      }
    }

    println(s"feed: $chunks x $chunkRows rows, ttl=${ttl.toMillis}ms")
    val fed = chunks.toLong * chunkRows
    var peak = 0L
    val t0 = System.nanoTime()
    (0 until chunks).foreach { j =>
      // seeded mix of fresh + recent digests; doc_id globally unique
      val rnd = new scala.util.Random(1000L + j)
      mem.addData((0 until chunkRows).map { i =>
        val d = j * drift + (math.abs(rnd.nextLong()) % range)
        fedDistinct += d
        (s"d$d", j.toLong * chunkRows + i)
      })
      peak = math.max(peak, stateRows())
      // backpressure: at most 2 chunks in flight. An unthrottled feed
      // accumulates every pending chunk into ONE giant micro-batch whose
      // serialized MemoryStream data (~90 MB task binary) OOMs executor
      // deserialization — and measures nothing: feed throughput is only
      // meaningful at the stream's own processing rate.
      awaitTrue(s"stream keeps up through chunk $j", 600000L)(
        inputRows() >= (j.toLong - 1) * chunkRows)
    }
    awaitTrue("stream drains the feed", 600000L)(inputRows() >= fed)
    val sec = (System.nanoTime() - t0) / 1e9
    peak = math.max(peak, stateRows())
    val ps = q.recentProgress.map(_.batchDuration).sorted
    println(f"drained: wall=$sec%.1fs rows/s=${fed / sec}%,.0f  batches=${ps.length}  " +
      f"batch p50=${ps(ps.length / 2)}ms max=${ps.last}ms  state peak=$peak%,d rows")

    // dedup exactness at scale: distinct emitted == distinct fed
    val emitted = spark.read.parquet(outDir)
    val emittedRows = emitted.count()
    val emittedDistinct = emitted.select(countDistinct(col("digest"))).head().getLong(0)
    println(f"emitted rows=$emittedRows%,d distinct=$emittedDistinct%,d (fed distinct=${fedDistinct.size}%,d)")
    require(emittedDistinct == fedDistinct.size,
      s"distinct emitted $emittedDistinct != distinct fed ${fedDistinct.size}")
    require(emittedRows < fed / 2,
      s"dedup must drop the repeat majority: emitted $emittedRows of $fed")

    // eviction at scale: idle past the TTL; the sweep must drain the store
    Thread.sleep(ttl.toMillis + 2000)
    awaitTrue("TTL sweep drains the store", 120000L)(
      { val r = stateRows(); r >= 0 && r < math.max(1L, peak / 100) })
    println(f"state after idle TTL sweep: ${stateRows()}%,d rows (peak was $peak%,d)")
    println("TtlSoak OK")
    q.stop()
    spark.stop()
  }
}
