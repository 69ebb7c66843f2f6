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
    // caller's session); r12 replaced that with ntzWallMicros — epoch-us
    // extracted from the stored wall-clock COMPONENTS (date/hour/minute/
    // fractional second), the one route that never coerces NTZ→LTZ
    // through spark.sql.session.timeZone — which must therefore yield the
    // same instants under any session timezone
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      assert(load("ntz") === fromNtz,
        "NTZ normalization depends on spark.sql.session.timeZone")
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("events loader reads a true timestamp[ns] file without leaking nanosAsLong into the session") {
    // shape 3: genuine parquet timestamp[ns] (pyarrow-written fixture —
    // Spark cannot write this type itself), the exact rounds-1-10 driver
    // shape. Same five instants as the synthetic shapes above.
    val fixture = getClass.getResource("/events_ns").getPath
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    assert(spark.conf.getOption(key).isEmpty || spark.conf.get(key) == "false",
      "precondition: suite session does not carry the legacy flag")
    val got = Tables.events(spark, fixture)
      .select(col("event_id"), col("ts"), col("ts_ms"))
      .orderBy("event_id")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    val wantNs = Seq(0L, 1000000L, 1500000000L, 86400L * 1000000000L,
      86400L * 1000000000L + 1000L)
    assert(got.map(_._1) === wantNs)
    assert(got.map(_._2) === wantNs.map(_ / 1000000L))
    // the flag was scoped to the read: the caller's session is unchanged
    assert(spark.conf.getOption(key).isEmpty || spark.conf.get(key) == "false",
      "Tables.events must not mutate the caller's session conf (VERDICT r12 #2)")
  }

  test("epochMs extracts tz-independent epochs from NTZ date columns") {
    // l_shipdate/o_orderdate surface as TIMESTAMP_NTZ; epochMs must give
    // the same epoch under any session timezone (wall-clock-component
    // route, not the former cast(TimestampType)+unix_millis coercion)
    import spark.implicits._
    val df = Seq(0L, 1500L, 86400000L, 86400000L + 123L, 1755080000123L)
      .toDF("ms")
      .withColumn("ntz", timestamp_millis(col("ms")).cast(TimestampNTZType))
    def eval(): Seq[(Long, Long)] = df.select(col("ms"), Tables.epochMs(col("ntz")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val underDefault = eval()
    assert(underDefault.forall { case (ms, got) => ms == got },
      s"epochMs must equal the source epoch-ms exactly: $underDefault")
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
      assert(eval() === underDefault, "epochMs depends on the session timezone")
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("table() schema memo: identical reads, data stays live, mtime invalidates") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tables_memo").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$dir/t.parquet")
    val first = Tables.table(spark, dir, "t")
    val second = Tables.table(spark, dir, "t")
    assert(second.schema === first.schema)
    assert(second.orderBy("id").collect().map(_.getLong(0)).toSeq === Seq(1L, 2L))
    // the memo caches the SCHEMA only — a rewrite of the table dir (new
    // mtime) must re-infer, and the DATA of every read is the live files
    Thread.sleep(20) // dir-mtime resolution guard
    Seq((3L, "c", 9L)).toDF("id", "v", "extra")
      .write.mode("overwrite").parquet(s"$dir/t.parquet")
    val third = Tables.table(spark, dir, "t")
    assert(third.schema.fieldNames.contains("extra"),
      "schema memo failed to invalidate on a rewritten table dir")
    assert(third.select("id").collect().map(_.getLong(0)).toSeq === Seq(3L))
  }
}
