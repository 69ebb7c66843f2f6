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
  * Corpus: N× sf0.1 events (user-shifted replicas → N× distinct users;
  * N = 10 default, 100 for the r7 scale point at ~9.5M events), fed
  * through a MemoryStream in event-time order in time-contiguous
  * micro-batches (the in-order arrival a log-shipping source provides;
  * watermark delay 0 s). Sessions land in a parquet sink and the stream ≡
  * batch check runs distributed (exceptAll), so N never accumulates rows
  * on the driver. Two session paths:
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
    // replica factor: 10 = the r5-prescribed soak; 100 = the r7 scale point
    // (~9.5M events, ~9.5M sessions). Session-set equality is checked in
    // Spark (exceptAll both ways), never via driver-side Sets, so the
    // factor only moves executor work.
    val reps = graft.Bench.parseCpus(
      args.lift(2).orElse(sys.env.get("SPARK_GRAFT_SOAK_X")).getOrElse("10"))
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sc = spark.sqlContext

    // Local-iteration aid: SPARK_GRAFT_SOAK_PATHS=6 (comma list) runs a
    // subset of the paths. The driver never sets it — a bare run soaks
    // all six.
    val runPath: Int => Boolean = sys.env.get("SPARK_GRAFT_SOAK_PATHS")
      .map(_.split(",").map(_.trim.toInt).toSet)
      .map(ks => ks.contains(_: Int)).getOrElse(_ => true)

    // driver-side feed: base (user, ts) in event-time order; replicas are
    // expanded per chunk so arrival stays globally time-ordered
    val base = graft.Tables.events(spark, srcDir)
      .select(col("user_id"), col("ts_ms")).orderBy("ts_ms")
      .as[(Long, Long)].collect()
    val chunks = base.grouped(5000).toSeq
    val maxTs = base.last._2
    println(s"base=${base.length} events, ${reps}x feed=${base.length.toLong * reps}, " +
      s"${chunks.size} micro-batches")

    // oracle-gated batch twin on the identical replicated corpus
    val eventsNx = graft.Tables.events(spark, srcDir)
      .crossJoin(spark.range(reps).select(col("id").as("__r")))
      .withColumn("user_id", col("user_id") + col("__r") * Stride)
      .withColumn("event_id", col("event_id") + col("__r") * Stride)
      .drop("__r")
    val want = graft.ops.TimeOps.sessionize(eventsNx, GapMs)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"), max(col("ts_ms")).as("end_ms"))
      .select(col("user_id"), col("n_events"), col("end_ms"))
      .localCheckpoint()
    val wantN = want.count()
    println(s"batch sessions: $wantN")

    // stream ≡ batch, checked distributed: equal cardinality and an empty
    // symmetric difference — no 9.5M-tuple driver Set at 100×
    def assertStreamEqBatch(gotDf: DataFrame, label: String): Unit = {
      val got = gotDf.select(col("user_id"), col("n_events"), col("end_ms"))
      val gotN = got.count()
      val missing = want.exceptAll(got).count()
      val extra = got.exceptAll(want).count()
      println(s"  emitted=$gotN  stream==batch: ${gotN == wantN && missing == 0 && extra == 0}")
      require(gotN == wantN && missing == 0 && extra == 0,
        s"$label mismatch: batch=$wantN stream=$gotN missing=$missing extra=$extra")
    }

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
    if (runPath(1)) {
      val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]
      val ckpt = java.nio.file.Files.createTempDirectory("soak_tws").toString
      // parquet sink, not memory: the memory sink collects every emitted
      // session onto the driver — ~9.5M rows at 100×
      val outDir = java.nio.file.Files.createTempDirectory("soak_tws_out").toString
      val q = graft.streaming.StreamOps.sessionExpiryTWS(mem.toDS(), GapMs)
        .toDF("user_id", "n_events", "session_end_ms")
        .writeStream.outputMode("append").format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt).start()
      println("== sessionExpiryTWS (timers, RocksDB) ==")
      val t0 = System.nanoTime()
      try {
        chunks.foreach { c =>
          mem.addData(c.toIndexedSeq.flatMap { case (u, ts) =>
            (0 until reps).map(r => (u + r * Stride, ts)) })
          q.processAllAvailable()
        }
        // sentinel: close every real session, then a nudge so the advanced
        // watermark is applied and the timers fire
        mem.addData(Seq((-1L, maxTs + GapMs * 3)))
        q.processAllAvailable()
        mem.addData(Seq((-1L, maxTs + GapMs * 3 + 1)))
        q.processAllAvailable()
        val sec = (System.nanoTime() - t0) / 1e9
        progressSummary(q, sec, base.length.toLong * reps)
        assertStreamEqBatch(spark.read.parquet(outDir).filter(col("user_id") >= 0)
          .withColumnRenamed("session_end_ms", "end_ms"), "TWS")
      } finally q.stop()
    }

    // ---- path 2: built-in session_window ----
    if (runPath(2)) {
      val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]
      val ckpt = java.nio.file.Files.createTempDirectory("soak_sw").toString
      val outDir = java.nio.file.Files.createTempDirectory("soak_sw_out").toString
      val stream = mem.toDF().toDF("user_id", "ts_ms")
        .withColumn("ts_utc", timestamp_millis(col("ts_ms")))
      val q = graft.streaming.StreamOps.sessionAgg(stream, "30 minutes", "0 seconds")
        .writeStream.outputMode("append").format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt).start()
      println("== session_window (built-in, RocksDB) ==")
      val t0 = System.nanoTime()
      try {
        chunks.foreach { c =>
          mem.addData(c.toIndexedSeq.flatMap { case (u, ts) =>
            (0 until reps).map(r => (u + r * Stride, ts)) })
          q.processAllAvailable()
        }
        mem.addData(Seq((-1L, maxTs + GapMs * 3)))
        q.processAllAvailable()
        mem.addData(Seq((-1L, maxTs + GapMs * 3 + 1)))
        q.processAllAvailable()
        val sec = (System.nanoTime() - t0) / 1e9
        progressSummary(q, sec, base.length.toLong * reps)
        // session_window's end = last event + gap; map to the batch contract
        assertStreamEqBatch(spark.read.parquet(outDir).filter(col("user_id") >= 0)
          .select(col("user_id"), col("n_events"),
            (col("session_end_ms") - GapMs).as("end_ms")), "session_window")
      } finally q.stop()
    }
    // ---- path 3 (r13): watermark-honoring SCD2 under OUT-OF-ORDER
    // arrival at scale ----
    // Feed: the full (user, ts, event_id, event_type) log, shuffled
    // WITHIN each micro-batch and with a random 10% of every batch HELD
    // BACK into the next one — real cross-batch lateness, bounded by one
    // chunk's time span (~5 days at this chunk size), under a 7-day
    // allowed lateness so nothing is dropped. State expectation: the
    // RocksDB buffer holds only the not-yet-final suffix (≈ the lateness
    // window) plus one open run per key — NOT the stream's history.
    if (runPath(3)) {
      val baseFull = graft.Tables.events(spark, srcDir)
        .select(col("user_id"), col("ts_ms"), col("event_id"), col("event_type"))
        .orderBy("ts_ms", "event_id")
        .as[(Long, Long, Long, String)].collect()
      val fullChunks = baseFull.grouped(5000).toSeq
      val rnd = new scala.util.Random(20260814L)
      val delayDays = 7L
      val wantRuns = graft.ops.TimeOps.stateRuns(eventsNx)
        .filter(col("valid_to_ms").isNotNull).localCheckpoint()
      val wantRunsN = wantRuns.count()
      println(s"== stateRunsLateTWS (out-of-order, RocksDB) ==  batch closed runs: $wantRunsN")
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long, Long, String)]
      val ckpt = java.nio.file.Files.createTempDirectory("soak_scd2l").toString
      val outDir = java.nio.file.Files.createTempDirectory("soak_scd2l_out").toString
      val q = graft.streaming.StreamOps.stateRunsLateTWS(mem.toDS(),
          delay = s"${delayDays * 86400} seconds")
        .toDF("user_id", "run_id", "state", "valid_from_ms", "valid_to_ms", "n_events")
        .writeStream.outputMode("append").format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt).start()
      val t0 = System.nanoTime()
      try {
        var holdback = Vector.empty[(Long, Long, Long, String)]
        fullChunks.foreach { c =>
          val expanded = c.toIndexedSeq.flatMap { case (u, ts, id, et) =>
            (0 until reps).map(r => (u + r * Stride, ts, id + r * Stride, et)) }
          val (late, now) = expanded.partition(_ => rnd.nextDouble() < 0.1)
          val batch = rnd.shuffle(now ++ holdback)
          holdback = late.toVector
          mem.addData(batch)
          q.processAllAvailable()
        }
        mem.addData(holdback)
        q.processAllAvailable()
        // far-future sentinel advances the watermark past every real
        // event; a nudge batch lets the timers drain every buffer
        val far = maxTs + delayDays * 86400000L * 3
        mem.addData(Seq((-1L, far, -1L, "X")))
        q.processAllAvailable()
        mem.addData(Seq((-1L, far + 1, -2L, "X")))
        q.processAllAvailable()
        val sec = (System.nanoTime() - t0) / 1e9
        progressSummary(q, sec, baseFull.length.toLong * reps)
        val got = spark.read.parquet(outDir).filter(col("user_id") >= 0)
        val gotN = got.count()
        val missing = wantRuns.exceptAll(got).count()
        val extra = got.exceptAll(wantRuns).count()
        println(s"  emitted=$gotN  stream==batch: ${gotN == wantRunsN && missing == 0 && extra == 0}")
        require(gotN == wantRunsN && missing == 0 && extra == 0,
          s"SCD2-late mismatch: batch=$wantRunsN stream=$gotN missing=$missing extra=$extra")
      } finally q.stop()
    }
    // ---- path 4 (r14): late-tolerant SESSIONIZATION under the same
    // out-of-order feed (VERDICT r13 #3) ----
    if (runPath(4)) {
      val rnd = new scala.util.Random(20260814L)
      val delayDays = 7L
      println(s"== sessionLateTWS (out-of-order, RocksDB) ==  batch sessions: $wantN")
      val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]
      val ckpt = java.nio.file.Files.createTempDirectory("soak_sessl").toString
      val outDir = java.nio.file.Files.createTempDirectory("soak_sessl_out").toString
      val q = graft.streaming.StreamOps.sessionLateTWS(mem.toDS(), GapMs,
          delay = s"${delayDays * 86400} seconds")
        .toDF("user_id", "n_events", "session_end_ms")
        .writeStream.outputMode("append").format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt).start()
      val t0 = System.nanoTime()
      try {
        var holdback = Vector.empty[(Long, Long)]
        chunks.foreach { c =>
          val expanded = c.toIndexedSeq.flatMap { case (u, ts) =>
            (0 until reps).map(r => (u + r * Stride, ts)) }
          val (late, now) = expanded.partition(_ => rnd.nextDouble() < 0.1)
          val batch = rnd.shuffle(now ++ holdback)
          holdback = late.toVector
          mem.addData(batch)
          q.processAllAvailable()
        }
        mem.addData(holdback)
        q.processAllAvailable()
        val far = maxTs + delayDays * 86400000L * 3
        mem.addData(Seq((-1L, far)))
        q.processAllAvailable()
        mem.addData(Seq((-1L, far + 1)))
        q.processAllAvailable()
        val sec = (System.nanoTime() - t0) / 1e9
        progressSummary(q, sec, base.length.toLong * reps)
        assertStreamEqBatch(spark.read.parquet(outDir).filter(col("user_id") >= 0)
          .withColumnRenamed("session_end_ms", "end_ms"), "session-late")
      } finally q.stop()
    }

    // ---- path 5 (r14): late-tolerant INTERVAL UNION, same feed ----
    if (runPath(5)) {
      val rnd = new scala.util.Random(20260814L)
      val delayDays = 7L
      val lenMs = 600000L
      val wantIu = graft.ops.TimeOps.intervalUnion(eventsNx, lenMs).localCheckpoint()
      val wantIuN = wantIu.count()
      println(s"== intervalUnionLateTWS (out-of-order, RocksDB) ==  batch users: $wantIuN")
      val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]
      val ckpt = java.nio.file.Files.createTempDirectory("soak_iul").toString
      val outDir = java.nio.file.Files.createTempDirectory("soak_iul_out").toString
      val q = graft.streaming.StreamOps.intervalUnionLateTWS(mem.toDS(), lenMs,
          delay = s"${delayDays * 86400} seconds")
        .toDF("user_id", "s_ms", "e_ms", "n_events")
        .writeStream.outputMode("append").format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt).start()
      val t0 = System.nanoTime()
      try {
        var holdback = Vector.empty[(Long, Long)]
        chunks.foreach { c =>
          val expanded = c.toIndexedSeq.flatMap { case (u, ts) =>
            (0 until reps).map(r => (u + r * Stride, ts)) }
          val (late, now) = expanded.partition(_ => rnd.nextDouble() < 0.1)
          val batch = rnd.shuffle(now ++ holdback)
          holdback = late.toVector
          mem.addData(batch)
          q.processAllAvailable()
        }
        mem.addData(holdback)
        q.processAllAvailable()
        val far = maxTs + delayDays * 86400000L * 3
        mem.addData(Seq((-1L, far)))
        q.processAllAvailable()
        mem.addData(Seq((-1L, far + 1)))
        q.processAllAvailable()
        val sec = (System.nanoTime() - t0) / 1e9
        progressSummary(q, sec, base.length.toLong * reps)
        // every run closed after the sentinel: per-user aggregate over the
        // emissions must equal the oracle-gated batch intervalUnion
        val gotAgg = spark.read.parquet(outDir).filter(col("user_id") >= 0)
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_intervals"),
            sum(col("e_ms") - col("s_ms")).as("covered_ms"))
        val gotN2 = gotAgg.count()
        val missing = wantIu.exceptAll(gotAgg).count()
        val extra = gotAgg.exceptAll(wantIu).count()
        println(s"  users=$gotN2  stream==batch: ${gotN2 == wantIuN && missing == 0 && extra == 0}")
        require(gotN2 == wantIuN && missing == 0 && extra == 0,
          s"interval-late mismatch: batch=$wantIuN stream=$gotN2 missing=$missing extra=$extra")
      } finally q.stop()
    }
    // ---- path 6 (r14): streamed EMBEDDING-INDEX ingest at 1M vectors ----
    // The vector side's continuous-ingest twin (embIndexIngestStream) at
    // the same soak scale as the event paths. No state store — the loop
    // is foreachBatch over the single-writer index — so the numbers that
    // matter are per-batch wall as the index grows and recall through
    // the INDEX on planted twins. Feed is a FILE-SOURCE stream
    // (maxFilesPerTrigger=1), not MemoryStream: 1M × 64-float vectors
    // never materialize on the driver.
    if (runPath(6)) {
      val repsV = 5 * reps // reps=100 → 500 × 2000 base = 1M vectors
      val nB = 10
      val bits = 20 // sized for ~occ 1 at 1M (2^20 bands)
      val baseE = graft.Tables.embeddings(spark, srcDir)
        .select(col("vec_id").as("b"), col("embedding"))
      val repsDf = spark.range(repsV).select(col("id").as("rep"))
      // spread replicas: per-(base, rep, dim) hash noise ±0.5 (sibling
      // cos ~0.4 — realistic inter-document spread, NOT near-dups), with
      // a planted twin layer: rep 1 reuses rep 0's spread noise plus a
      // tiny ±0.005 jitter — exactly one planted near-dup pair per base,
      // usually split across micro-batch files (consecutive vec_ids land
      // in different round-robin partitions)
      val corpus = baseE.crossJoin(repsDf)
        .withColumn("srep",
          when(col("rep") === 1, lit(0L)).otherwise(col("rep")))
        .select((col("b") * repsV + col("rep")).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            (x
              + (pmod(xxhash64(col("b"), col("srep"), i), lit(1000000L))
                  .cast("double") / 1e6 - 0.5)
              + when(col("rep") === 1,
                  pmod(xxhash64(col("b"), lit("twin"), i), lit(10000L))
                    .cast("double") / 1e6 - 0.005).otherwise(lit(0.0)))
            .cast("float")).as("embedding"))
      val feedDir = java.nio.file.Files.createTempDirectory("soak_embf").toString + "/feed"
      corpus.repartition(nB).write.parquet(feedDir)
      val nVec = spark.read.parquet(feedDir).count()
      println(s"== embIndexIngestStream (file source, $nB micro-batches) ==  corpus: $nVec vectors, bits=$bits")
      val idxDir = java.nio.file.Files.createTempDirectory("soak_embi").toString + "/idx"
      val outDir = java.nio.file.Files.createTempDirectory("soak_embo").toString
      val ckpt = java.nio.file.Files.createTempDirectory("soak_embc").toString
      val stream = spark.readStream
        .schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(feedDir)
      val t0 = System.nanoTime()
      val q = graft.streaming.StreamOps.embIndexIngestStream(
        stream, idxDir, outDir, ckpt, bits = bits, dim = 64)
      try {
        q.processAllAvailable()
        val sec = (System.nanoTime() - t0) / 1e9
        val batchMs = q.recentProgress.map(_.batchDuration)
        println(f"  wall=$sec%.1fs  rows/s=${nVec / sec}%,.0f  batches=${batchMs.length}  " +
          f"batch p50=${batchMs.sorted.apply(batchMs.length / 2)}ms max=${batchMs.max}ms")
        val idxRows = spark.read.schema(graft.ops.Dedup.bandSchemaBkt)
          .parquet(idxDir).count()
        val pairs = spark.read.parquet(outDir)
        val nPairs = pairs.count()
        // recall THROUGH the index: each base planted exactly one twin
        // pair (b*repsV, b*repsV+1); the stream must surface ≥95% of
        // them (Hamming≤1 at the ~0.01 rad twin angle, bits=20)
        val twins = baseE.select((col("b") * repsV).as("doc_a"),
          (col("b") * repsV + 1).as("doc_b"))
        val nTwins = twins.count()
        val found = pairs.join(twins, Seq("doc_a", "doc_b")).count()
        println(f"  indexRows=$idxRows%,d  pairs=$nPairs%,d  plantedTwins found=$found%,d/$nTwins%,d")
        require(idxRows == nVec, s"index rows $idxRows != corpus $nVec")
        require(found >= nTwins * 95 / 100,
          s"twin recall through the index too low: $found/$nTwins")
      } finally q.stop()
    }
    println("StreamSoak OK")
    spark.stop()
  }
}
