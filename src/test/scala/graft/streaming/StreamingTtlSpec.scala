package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

/** TTL-bounded keyed state (VERDICT r6 #5): `streamingDedupTTL` must
  * (1) emit the first row per digest and drop in-window repeats,
  * (2) actually shrink the RocksDB store once the TTL passes — evicted
  * keys leave the store rather than lingering as dead rows — and
  * (3) RE-ADMIT a digest after its TTL expired (the observable proof the
  * value left state: a live "seen" row would have suppressed it).
  *
  * The three assertions are split across TWO queries with DIFFERENT TTLs
  * (VERDICT r7 #1): the r7 single-query spec bound all of them to one
  * 3-second TTL, and on a slow container the gap between adjacent
  * micro-batches exceeded 3 s — the repeats LEGITIMATELY expired and
  * re-admitted, failing the "dropped" assertion with behavior that was
  * correct TTL semantics for the elapsed window. The dedup phase now uses
  * a TTL no realistic container can overrun between adjacent batches
  * (10 minutes), and eviction/re-admission run on a separate short-TTL
  * query whose assertions only ever WAIT for expiry (longer elapsed time
  * helps them, never breaks them) — container-speed-independent in both
  * directions by construction.
  *
  * `TimeMode.ProcessingTime` keeps micro-batches firing on the trigger
  * cadence even with no input (that is how TTL sweeps run), which means
  * `processAllAvailable` NEVER returns — the stream never reports
  * "caught up". The spec therefore polls the sink table and the progress
  * reports with deadlines instead.
  */
class StreamingTtlSpec extends SparkTestBase {

  private def stateRows(q: StreamingQuery): Long = {
    val p = q.lastProgress
    if (p == null || p.stateOperators.isEmpty) -1L
    else p.stateOperators.map(_.numRowsTotal).max
  }

  private def awaitTrue(desc: String, timeoutMs: Long = 60000L)(cond: => Boolean): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!cond) {
      if (System.currentTimeMillis() > deadline) fail(s"timeout waiting for: $desc")
      Thread.sleep(200)
    }
  }

  /** RocksDB provider (TTL state requires it) with checkpoint checksums
    * off: under the continuous no-input trigger cadence Spark 4.1's
    * ChecksumCheckpointFileManager wedged its async checksum writes
    * (tasks parked forever in awaitResult — observed via jstack);
    * checksums off + a paced trigger keep the sweep batches healthy.
    */
  private def withTtlSession(body: => Unit): Unit = {
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    val prevChecksum = spark.conf.getOption("spark.sql.streaming.checkpoint.fileChecksum.enabled")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    try body
    finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
      prevChecksum match {
        case Some(p) => spark.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", p)
        case None => spark.conf.unset("spark.sql.streaming.checkpoint.fileChecksum.enabled")
      }
    }
  }

  private def startDedup(mem: MemoryStream[(String, Long)], ttl: java.time.Duration,
                         sink: String): StreamingQuery =
    StreamOps.streamingDedupTTL(mem.toDS(), ttl)
      .toDF("digest", "doc_id")
      .writeStream.outputMode("append").format("memory")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("500 milliseconds"))
      .queryName(sink).start()

  test("streaming dedup TTL: in-window repeats dropped (long TTL — speed-independent)") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    withTtlSession {
      // 10 minutes: adjacent micro-batches on ANY realistic container land
      // well inside the window, so "repeats dropped" can never be broken
      // by a slow batch — the r7 flake mode is structurally impossible
      val mem = MemoryStream[(String, Long)]
      val q = startDedup(mem, java.time.Duration.ofMinutes(10), "dedup_ttl_long")
      try {
        def emitted() = spark.table("dedup_ttl_long").collect()
          .map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
        // batch 1: four digests; "a" arrives twice — smallest doc id wins
        mem.addData(Seq(("a", 7L), ("a", 3L), ("b", 9L), ("c", 4L), ("d", 5L)))
        awaitTrue("first batch emitted")(emitted().size == 4)
        assert(emitted() === Seq(("a", 3L), ("b", 9L), ("c", 4L), ("d", 5L)))
        // in-window repeats: dropped. Await two further batches (the
        // trigger fires regardless of input) and assert nothing new.
        // The sink table fills when the batch COMMITS, slightly before the
        // progress object posts — so emitted()==4 does not imply
        // lastProgress != null yet; wait for it before reading batchId.
        awaitTrue("first progress reported")(q.lastProgress != null)
        val bid = q.lastProgress.batchId
        mem.addData(Seq(("a", 11L), ("b", 12L), ("d", 13L)))
        awaitTrue("two more batches ran")(
          q.lastProgress != null && q.lastProgress.batchId >= bid + 2)
        assert(emitted() === Seq(("a", 3L), ("b", 9L), ("c", 4L), ("d", 5L)),
          "repeats inside the TTL window must be dropped")
        awaitTrue("state holds the 4 live digests")(stateRows(q) >= 4)
      } finally q.stop()
    }
  }

  test("streaming dedup TTL: expired digests leave RocksDB and re-admit (short TTL)") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    withTtlSession {
      // short TTL, but every assertion here only WAITS for expiry — extra
      // elapsed time on a slow container advances the test, never fails it
      val mem = MemoryStream[(String, Long)]
      val q = startDedup(mem, java.time.Duration.ofSeconds(3), "dedup_ttl_short")
      try {
        def emitted() = spark.table("dedup_ttl_short").collect()
          .map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
        mem.addData(Seq(("x", 1L), ("y", 2L)))
        awaitTrue("first batch emitted")(emitted().size == 2)
        assert(emitted() === Seq(("x", 1L), ("y", 2L)))
        awaitTrue("state holds the 2 live digests")(stateRows(q) >= 2)
        // eviction: with no further touches, the TTL sweep must remove the
        // idle rows from RocksDB. Wait for EMPTY, not merely below-peak:
        // both digests share one batch (one expiry), and a partial-evict
        // pass would leave "x" live to suppress the re-admission below.
        awaitTrue("TTL sweep empties the store", 30000L)(stateRows(q) == 0)
        // re-admission: the expired digest passes through again (a live
        // "seen" row would have suppressed it — proof the value left state)
        mem.addData(Seq(("x", 20L)))
        awaitTrue("expired digest re-admitted")(emitted().size == 3)
        assert(emitted() === Seq(("x", 1L), ("x", 20L), ("y", 2L)))
      } finally q.stop()
    }
  }
}
