package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType

/** The `Tables.events` ts contract across testdata generations: the
  * driver's `events.ts` has shipped as parquet `timestamp[ns]` (read as
  * raw ns longs via nanosAsLong — rounds 1-10, still the fuzz-generator
  * shape) and as `timestamp[us]`/NTZ (the round-11 regeneration). Every
  * consumer and every `epoch_ns(ts)` oracle assumes ts = epoch-ns LONG,
  * so the loader must normalize BOTH on-disk types to identical values —
  * pinned here so the next regeneration (or a generator revert) cannot
  * silently shift the contract again.
  */
class TablesSpec extends SparkTestBase {

  test("events loader normalizes ns-long and us-NTZ on-disk ts to one epoch-ns contract") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tables_events").toString
    // us-representable instants (the us generation cannot hold finer), in
    // ns: epoch, 1 ms, 1.5 s, one day, and a 1-us step
    val rows = Seq(0L, 1000000L, 1500000000L, 86400L * 1000000000L,
        86400L * 1000000000L + 1000L)
      .zipWithIndex.map { case (t, i) =>
        (i.toLong, t, (i % 2).toLong, "click", 1.0, "{}")
      }
    val base = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    // shape 1: int64 ns column named ts (rounds 1-10 / tools/fuzz_data.py)
    base.write.mode("overwrite").parquet(s"$dir/long/events.parquet")
    // shape 2: timestamp[us] NTZ (round-11 regeneration) — same instants
    base.withColumn("ts",
        timestamp_micros((col("ts") / 1000L).cast("long")).cast(TimestampNTZType))
      .write.mode("overwrite").parquet(s"$dir/ntz/events.parquet")
    def load(sub: String): Seq[(Long, Long, Long)] =
      Tables.events(spark, s"$dir/$sub")
        .select(col("event_id"), col("ts"), col("ts_ms"))
        .orderBy("event_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val fromLong = load("long")
    val fromNtz = load("ntz")
    assert(fromLong === fromNtz,
      "the two on-disk generations must normalize to identical (ts, ts_ms)")
    // and the contract is literally epoch ns / epoch ms of the instants
    assert(fromLong.map(_._2) === rows.map(_._2))
    assert(fromLong.map(_._3) === rows.map(_._2 / 1000000L))
    // the NTZ branch must be timezone-INDEPENDENT: r11 pinned the session
    // to UTC globally (a side effect on every other computation in the
    // caller's session); r12 converts via to_utc_timestamp(ntz, "UTC"),
    // which must yield the same instants under any session timezone
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      assert(load("ntz") === fromNtz,
        "NTZ normalization depends on spark.sql.session.timeZone")
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }
}
