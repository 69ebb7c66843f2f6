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

  test("streaming dedup TTL: in-window repeats dropped, expired digests evicted and re-admitted") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    val prevChecksum = spark.conf.getOption("spark.sql.streaming.checkpoint.fileChecksum.enabled")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // under the continuous no-input trigger cadence Spark 4.1's
    // ChecksumCheckpointFileManager wedged its async checksum writes
    // (tasks parked forever in awaitResult — observed via jstack);
    // checksums off + a paced trigger keep the sweep batches healthy
    spark.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    try {
      val ttl = java.time.Duration.ofSeconds(3)
      val mem = MemoryStream[(String, Long)]
      val q = StreamOps.streamingDedupTTL(mem.toDS(), ttl)
        .toDF("digest", "doc_id")
        .writeStream.outputMode("append").format("memory")
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("500 milliseconds"))
        .queryName("dedup_ttl_out").start()
      try {
        def emitted() = spark.table("dedup_ttl_out").collect()
          .map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
        // batch 1: four digests; "a" arrives twice — smallest doc id wins
        mem.addData(Seq(("a", 7L), ("a", 3L), ("b", 9L), ("c", 4L), ("d", 5L)))
        awaitTrue("first batch emitted")(emitted().size == 4)
        assert(emitted() === Seq(("a", 3L), ("b", 9L), ("c", 4L), ("d", 5L)))
        // in-window repeats: dropped. Await two further batches (the
        // trigger fires regardless of input) and assert nothing new.
        val bid = q.lastProgress.batchId
        mem.addData(Seq(("a", 11L), ("b", 12L), ("d", 13L)))
        awaitTrue("two more batches ran")(
          q.lastProgress != null && q.lastProgress.batchId >= bid + 2)
        assert(emitted() === Seq(("a", 3L), ("b", 9L), ("c", 4L), ("d", 5L)),
          "repeats inside the TTL window must be dropped")
        awaitTrue("state holds the 4 live digests")(stateRows(q) >= 4)
        val peak = stateRows(q)
        // eviction: with no further touches, the TTL sweep must remove the
        // idle rows from RocksDB — the store shrinks below its peak
        awaitTrue(s"TTL sweep shrinks the store below peak=$peak", 30000L)(
          { val r = stateRows(q); r >= 0 && r < peak })
        // re-admission: the expired digest passes through again
        mem.addData(Seq(("a", 20L)))
        awaitTrue("expired digest re-admitted")(emitted().size == 5)
        assert(emitted() === Seq(("a", 3L), ("a", 20L), ("b", 9L), ("c", 4L), ("d", 5L)))
      } finally q.stop()
    } finally {
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
}
