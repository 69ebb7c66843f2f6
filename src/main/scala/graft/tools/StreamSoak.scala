package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming state-store soak at 10× (VERDICT r5 #6): the batch twins of
  * G5/G6 are oracle-gated, and the streaming operators are spec-gated on
  * small MemoryStream feeds — what was untested is the STATE STORE's scale
  * behavior: a million events through RocksDB-backed session state, timers
  * firing as watermarks advance, state actually leaving the store when
  * sessions close.
  *
  * Corpus: 10× sf0.1 events (user-shifted replicas → 10× distinct users,
  * ~954k sessions), fed through a MemoryStream in event-time order in
  * ~50k-row micro-batches (the in-order arrival a log-shipping source
  * provides; watermark delay 0 s). Two session paths:
  *   1. `sessionExpiryTWS` — transformWithState + per-key event-time
  *      timers (state = one (count, last) pair + one timer per OPEN
  *      session; closed sessions must LEAVE the store)
  *   2. `sessionAgg` — the built-in `session_window` aggregate
  * Both drain with a far-future sentinel event that pushes the watermark
  * past every real session, then the emitted sessions are asserted EQUAL
  * to the oracle-gated batch sessionize (q_sessionize semantics) on the
  * identical 10× corpus. Throughput, batch durations, and state-store
  * rows/memory come from the streaming progress reports.
  */
object StreamSoak {
  private val Stride = 1000000L
  private val GapMs = 1800000L

  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR")).getOrElse("/root/testdata/sf0.1")
    val cpus = graft.Bench.parseCpus(
      args.lift(1).orElse(sys.env.get("SPARK_GRAFT_CPUS")).getOrElse("32")).toString
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sc = spark.sqlContext

    // driver-side feed: base (user, ts) in event-time order; replicas are
    // expanded per chunk so arrival stays globally time-ordered
    val base = graft.Tables.events(spark, srcDir)
      .select(col("user_id"), col("ts_ms")).orderBy("ts_ms")
      .as[(Long, Long)].collect()
    val chunks = base.grouped(5000).toSeq
    val maxTs = base.last._2
    println(s"base=${base.length} events, 10x feed=${base.length * 10}, " +
      s"${chunks.size} micro-batches")

    // oracle-gated batch twin on the identical 10x corpus
    val events10x = graft.Tables.events(spark, srcDir)
      .crossJoin(spark.range(10).select(col("id").as("__r")))
      .withColumn("user_id", col("user_id") + col("__r") * Stride)
      .withColumn("event_id", col("event_id") + col("__r") * Stride)
      .drop("__r")
    val want = graft.ops.TimeOps.sessionize(events10x, GapMs)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"), max(col("ts_ms")).as("end_ms"))
      .select(col("user_id"), col("n_events"), col("end_ms"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    println(s"batch sessions: ${want.size}")

    def progressSummary(q: org.apache.spark.sql.streaming.StreamingQuery,
                        sec: Double, fed: Long): Unit = {
      val ps = q.recentProgress
      val so = ps.flatMap(p => Option(p.stateOperators).toSeq.flatten)
      val maxRows = if (so.isEmpty) 0L else so.map(_.numRowsTotal).max
      val maxMem = if (so.isEmpty) 0L else so.map(_.memoryUsedBytes).max
      val batchMs = ps.map(_.batchDuration)
      println(f"  wall=$sec%.1fs  rows/s=${fed / sec}%,.0f  batches=${ps.length}  " +
        f"batch p50=${batchMs.sorted.apply(batchMs.length / 2)}ms max=${batchMs.max}ms")
      println(f"  state peak: $maxRows%,d rows, ${maxMem / 1024.0 / 1024.0}%.1f MB (RocksDB)")
    }

    // ---- path 1: transformWithState + timers ----
    {
      val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]
      val ckpt = java.nio.file.Files.createTempDirectory("soak_tws").toString
      val q = graft.streaming.StreamOps.sessionExpiryTWS(mem.toDS(), GapMs)
        .toDF("user_id", "n_events", "session_end_ms")
        .writeStream.outputMode("append").format("memory")
        .option("checkpointLocation", ckpt).queryName("soak_tws").start()
      println("== sessionExpiryTWS (timers, RocksDB) ==")
      val t0 = System.nanoTime()
      try {
        chunks.foreach { c =>
          mem.addData(c.toIndexedSeq.flatMap { case (u, ts) =>
            (0 until 10).map(r => (u + r * Stride, ts)) })
          q.processAllAvailable()
        }
        // sentinel: close every real session, then a nudge so the advanced
        // watermark is applied and the timers fire
        mem.addData(Seq((-1L, maxTs + GapMs * 3)))
        q.processAllAvailable()
        mem.addData(Seq((-1L, maxTs + GapMs * 3 + 1)))
        q.processAllAvailable()
        val sec = (System.nanoTime() - t0) / 1e9
        progressSummary(q, sec, base.length * 10L)
        val got = spark.table("soak_tws").filter(col("user_id") >= 0)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        println(s"  emitted=${got.size}  stream==batch: ${got == want}")
        require(got == want, s"TWS mismatch: missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
      } finally q.stop()
    }

    // ---- path 2: built-in session_window ----
    {
      val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]
      val ckpt = java.nio.file.Files.createTempDirectory("soak_sw").toString
      val stream = mem.toDF().toDF("user_id", "ts_ms")
        .withColumn("ts_utc", timestamp_millis(col("ts_ms")))
      val q = graft.streaming.StreamOps.sessionAgg(stream, "30 minutes", "0 seconds")
        .writeStream.outputMode("append").format("memory")
        .option("checkpointLocation", ckpt).queryName("soak_sw").start()
      println("== session_window (built-in, RocksDB) ==")
      val t0 = System.nanoTime()
      try {
        chunks.foreach { c =>
          mem.addData(c.toIndexedSeq.flatMap { case (u, ts) =>
            (0 until 10).map(r => (u + r * Stride, ts)) })
          q.processAllAvailable()
        }
        mem.addData(Seq((-1L, maxTs + GapMs * 3)))
        q.processAllAvailable()
        mem.addData(Seq((-1L, maxTs + GapMs * 3 + 1)))
        q.processAllAvailable()
        val sec = (System.nanoTime() - t0) / 1e9
        progressSummary(q, sec, base.length * 10L)
        // session_window's end = last event + gap; map to the batch contract
        val got = spark.table("soak_sw").filter(col("user_id") >= 0)
          .select(col("user_id"), col("n_events"),
            (col("session_end_ms") - GapMs).as("end_ms"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        println(s"  emitted=${got.size}  stream==batch: ${got == want}")
        require(got == want, s"session_window mismatch: missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
      } finally q.stop()
    }
    println("StreamSoak OK")
    spark.stop()
  }
}
