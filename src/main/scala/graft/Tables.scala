package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loaders for the driver's synthetic star schema
  * (`/root/testdata/sf*`, see TESTDATA.md / FIXTURES.md §1).
  *
  * All persisted data in this engine is Parquet — the reference's
  * column-oriented `.bin` snapshots (SoA float32 arrays,
  * `BrazilSplitTest/Output/MLSOut00007250.bin`) are the same idea; see
  * `graft.formats` for those codecs.
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Epoch milliseconds of a timestamp column. The driver tables' `[ms]`
    * timestamps surface as TIMESTAMP_NTZ; with the session timezone pinned
    * to UTC the NTZ→LTZ cast is epoch-preserving and matches DuckDB's
    * `epoch_ms` on the same naive values.
    */
  def epochMs(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    unix_millis(c.cast(org.apache.spark.sql.types.TimestampType))

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Events loader with a STABLE `ts` contract: epoch nanoseconds as a
    * long, whatever the driver generated on disk. The synthetic `events.ts`
    * has shipped as parquet `timestamp[ns]` (rounds 1-10; Spark's vectorized
    * reader rejects it, so it is read as a raw ns long via
    * `spark.sql.legacy.parquet.nanosAsLong`) and as `timestamp[us]`
    * (round-11 regeneration; surfaces as TIMESTAMP_NTZ). Downstream code and
    * every `epoch_ns(ts)` oracle assume the ns-long form, so both on-disk
    * types normalize to it here:
    *   - `ts`      — epoch nanoseconds (long, exact; safe for ordering/compare)
    *   - `ts_ms`   — epoch milliseconds (long, integer division — exact)
    *   - `ts_utc`  — TimestampType at millisecond precision (for
    *                 window()/session_window aggregations)
    *
    * The NTZ branch interprets naive timestamps as UTC (session timezone is
    * pinned to UTC by Verify/Bench and every spec base), matching DuckDB's
    * `epoch_ns`/`epoch_ms` on the same naive values; `unix_micros * 1000` is
    * exact — no float, no sub-microsecond loss (there is none to lose).
    * Millisecond truncation matches DuckDB's `epoch_ms(ts)` for the oracle.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    // The generator writes `ts` as UTC instants. The NTZ branch extracts
    // epoch-µs from the stored WALL-CLOCK components (date / hour /
    // minute / fractional second) — the only conversion that is
    // timezone-independent BY CONSTRUCTION, like the legacy ns-long
    // branch: every timestamp-function route (cast(TimestampType),
    // to_utc_timestamp, from_utc_timestamp) first coerces NTZ→LTZ
    // through spark.sql.session.timeZone (tools/TzProbe demonstrates all
    // three shifting under a non-UTC session), and r11's global
    // conf.set("...timeZone", "UTC") pin silently changed every other
    // computation in the caller's session (ADVICE r12 review; TablesSpec
    // pins tz-independence under America/New_York).
    def ntzWallMicros(c: org.apache.spark.sql.Column) =
      unix_date(c.cast("date")) * lit(86400000000L) +
        hour(c) * lit(3600000000L) +
        minute(c) * lit(60000000L) +
        (date_part(lit("SECOND"), c) * lit(1000000)).cast("long")
    val tsNs = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => col("ts")
      case _ => ntzWallMicros(col("ts")) * lit(1000L)
    }
    raw.withColumn("ts", tsNs)
      .withColumn("ts_ms", expr("ts DIV 1000000"))
      .withColumn("ts_utc", timestamp_millis(col("ts_ms")))
  }
}
