package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Structured Streaming twins of the batch time-series operators
  * (SURVEY §2.9 G5/G6). The reference's snapshot cadence — one `.bin` every
  * `nOutLoops`=250 steps (`MLS00con.dat:7`) — is exactly a micro-batch
  * trigger; watermarks bound state for late data.
  *
  * Each function takes a STREAMING DataFrame with an event-time column
  * `ts_utc` (TimestampType) and returns the transformed streaming frame;
  * callers pick the sink/trigger. The batch twins in [[graft.ops.TimeOps]]
  * share the aggregation logic so the oracle can check them.
  */
object StreamOps {

  /** G6 — tumbling-window aggregate with watermark; append-mode safe. */
  def tumblingAgg(events: DataFrame, width: String = "1 hour",
                  watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts_utc", watermark)
      .groupBy(window(col("ts_utc"), width), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_val"))
      .select(unix_millis(col("window.start")).as("window_start_ms"),
        col("event_type"), col("cnt"), col("sum_val"))

  /** G5 — gap-based sessionization via the built-in `session_window`
    * (state-store backed; the batch twin derives session ids with windows).
    */
  def sessionAgg(events: DataFrame, gap: String = "30 minutes",
                 watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts_utc", watermark)
      .groupBy(session_window(col("ts_utc"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_millis(col("session_window.start")).as("session_start_ms"),
        unix_millis(col("session_window.end")).as("session_end_ms"),
        col("n_events"))
}
